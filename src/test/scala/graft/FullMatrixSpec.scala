package graft

/** Full-matrix regression gate against the REAL driver testdata.
  *
  * Round-6 lesson: the testdata generator changed `events.ts` from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS) parquet and three event queries
  * stopped type-checking at driver time — while every spec stayed green,
  * because no spec executed the query matrix against the real testdata
  * (operator specs use their own synthesized fixtures). The failed queries
  * then silently vanished from the driver's correctness matrix instead of
  * showing red.
  *
  * This spec is the in-repo coverage check the advisor prescribed:
  *  1. every `SparkEntry.queries` entry must build AND fully evaluate
  *     against `/root/testdata/sf0.001` (the driver's own input), and
  *  2. `queries` and `oracleSql` must cover the identical keyset, so a
  *     query can never be half-registered.
  * A type change in regenerated testdata now fails `sbt test` instead of
  * surfacing as a silent hole in CORRECTNESS_r{N}.json.
  */
class FullMatrixSpec extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"

  test("queries and oracleSql cover the same keyset") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q == o, s"only in queries: ${(q -- o).toSeq.sorted}; only in oracleSql: ${(o -- q).toSeq.sorted}")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name evaluates against real sf0.001 testdata") {
      // noop sink: every output column is evaluated, nothing is collected.
      fn(spark, sf).write.mode("overwrite").format("noop").save()
    }
  }
}
