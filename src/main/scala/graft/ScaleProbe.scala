package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Curation, Dedup, Similarity}

/** Dev harness for scale-headroom validation: replicate the sf tables ×N
  * (ids shifted so replicas are near-dups of each other, which is the
  * WORST case for pair-generating operators — every original doc gains
  * N−1 exact twins) and time the heavy operators. A healthy operator
  * scales ~linearly in rows here; a quadratic one explodes immediately.
  *
  * Usage: runMain graft.ScaleProbe [xFactor] [sfDir]
  */
object ScaleProbe {

  private def replicate(df: DataFrame, idCol: String, x: Int): DataFrame = {
    val step = 10000000L
    (0 until x).map(i =>
      df.withColumn(idCol, col(idCol) + lit(i * step)))
      .reduce(_.unionByName(_))
  }

  def main(args: Array[String]): Unit = {
    val x = if (args.length > 0) args(0).toInt else 10
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = replicate(
      spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", x)
    val emb = replicate(
      spark.read.parquet(s"$sfDir/embeddings.parquet"), "vec_id", x)
    System.err.println(s"[probe] x=$x docs=${docs.count()} emb=${emb.count()}")

    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      System.err.println(
        f"[probe] $name%-22s rows=$n%-10d ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    time("dedup_exact")(Dedup.exactGroups(docs).count())
    time("dedup_minhash")(Dedup.minhashPairs(docs, 8, maxBucketSize = 1000).count())
    time("dedup_simhash")(Dedup.simhashPairs(docs, 3, maxBucketSize = 1000).count())
    time("dedup_jaccard_capped")(Dedup.jaccardPairs(docs, 8, maxBlockSize = 1000).count())
    time("dedup_groups") {
      val edges = Dedup.minhashPairs(docs, 8).select("doc_a", "doc_b")
        .unionByName(Dedup.fingerprintEdges(docs))
      Dedup.connectedComponents(edges).groupBy("component").count().count()
    }
    time("srp_neardup")(Similarity.srpNearDupPairs(emb, 0.5).count())
    time("ann_ivf")(Similarity.ivfTopK(emb, 5, 16, 4, col("vec_id") % 20 === 0).count())
    time("repetition")(Curation.repetitionProfile(docs).count())
    spark.stop()
  }
}
