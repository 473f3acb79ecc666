package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Link-graph operators for corpus curation. PageRank here is the
  * host-level authority signal a web-corpus pipeline uses to weight
  * document quality (the CommonCrawl-style host graph), next to
  * [[Dedup.connectedComponents]] for duplicate-group resolution.
  *
  * Arithmetic is EXACT FIXED-POINT on purpose: ranks are integers scaled
  * by `scale`, every division is integer division, and every aggregate is
  * an integer sum — so the result is bit-identical regardless of
  * partitioning, reduction order, or engine (floating-point PageRank is
  * not reproducible across runs because double addition is not
  * associative; a quality weight that changes between cluster runs is a
  * debugging nightmare and an oracle impossibility). The cost is ≤ 1/scale
  * relative quantization error per iteration — irrelevant at scale=1e9
  * for a ranking signal. */
object GraphOps {

  /** Deterministic fixed-point PageRank.
    *
    * Semantics per iteration (all divisions integer, nonnegative):
    * {{{
    *   contrib(v) = Σ_{(u,v) ∈ E} rank(u) DIV outdeg(u)
    *   rank'(v)   = (15 * (scale DIV n) + 85 * contrib(v)) DIV 100
    * }}}
    * i.e. damping 0.85 with uniform teleport, dangling-node mass dropped
    * (the standard simplification; total mass decays slightly rather than
    * being redistributed). Edges are deduplicated; initial rank is
    * `scale DIV n`.
    *
    * Scale shape: each iteration is two shuffles (edges⋈ranks on src —
    * the fact table join — then a hash aggregate by dst); out-degrees are
    * computed once. Every iteration's rank relation is persisted
    * MEMORY_AND_DISK (keeps lineage for executor-loss recovery, unlike a
    * checkpoint) and the predecessor unpersisted, so the plan stays
    * iteration-deep, not run-deep. The only driver-side value is n (one
    * long). */
  def pageRank(edges: DataFrame, iters: Int = 5,
               srcCol: String = "src", dstCol: String = "dst",
               scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count() // one long to the driver
    require(n > 0, "empty graph")
    val init = scale / n
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var rank = nodes.select(col("node"), lit(init).as("rank"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    rank.count()
    var i = 0
    while (i < iters) {
      val contribs = e
        .join(rank.select(col("node").as("src"), col("rank")), "src")
        .join(outDeg, "src")
        .select(col("dst").as("node"), expr("rank DIV outdeg").as("c"))
        .groupBy("node").agg(sum("c").as("contrib"))
      val next = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          expr(s"(15L * ${init}L + 85L * coalesce(contrib, 0L)) DIV 100L").as("rank"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize before dropping the predecessor
      rank.unpersist()
      rank = next
      i += 1
    }
    e.unpersist(); outDeg.unpersist()
    rank
  }
}
