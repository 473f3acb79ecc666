package graft.ops

import org.apache.spark.sql.DataFrame

/** Scale-adaptive compute spread for per-payload CPU kernels (codecs,
  * hashes, gram tokenizers).
  *
  * A small parquet fixture is ONE row group, which Spark maps to ONE
  * non-empty scan partition — so a `mapPartitions` codec stage (or a
  * heavy projection) over it runs on a single core no matter how many the
  * session has. The per-payload operators here are CPU-bound, not
  * scan-bound: the fix is to widen the input to the session's parallelism
  * BEFORE the expensive stage (optimization guide §2 — partitioning must
  * be scale-adaptive, derived from the environment, never a constant).
  *
  * The widening is conditional: an input that already has at least
  * `defaultParallelism` partitions (the 100 TB shape — thousands of scan
  * partitions) passes through UNTOUCHED, so this never coalesces or adds
  * an exchange where the data is already wide enough. When it does fire,
  * the exchange moves only the narrow pre-kernel relation (ids, raw
  * payload bytes), which is orders of magnitude cheaper than the kernel
  * work it parallelizes.
  *
  * Results are unaffected by placement: every kernel downstream of a
  * spread is row-local (one payload in, its rows out), the fixture
  * arithmetic is integer-exact by design, and every declared query ends
  * in a total ORDER BY — so the oracle hash is partitioning-invariant.
  */
object Spread {
  private[graft] def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // queryExecution.toRdd skips the InternalRow→Row encoder stage that
    // df.rdd would bolt on just to read the partition count (the count is
    // the same; the planning work is roughly halved per spread call)
    if (df.queryExecution.toRdd.getNumPartitions < target)
      df.repartition(target)
    else df
  }
}
