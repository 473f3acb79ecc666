package graft.sink

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Clustering service: z-value interleave correctness, and the layout
  * property that makes it useful — rewritten files carry disjoint sort-key
  * ranges, so min/max file statistics prune on any clustered column. */
class ClusteringSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-cluster").toString

  test("zValue interleaves bits of normalized columns") {
    // 2 columns x 2 bits, identity normalization (values already 0..3):
    // z = x_bit0<<0 | y_bit0<<1 | x_bit1<<2 | y_bit1<<3
    val df = Seq((3L, 0L), (1L, 2L), (0L, 0L), (3L, 3L)).toDF("x", "y")
    val z = df.select(Clustering.zValue(Seq(col("x"), col("y")),
        Seq((0.0, 3.0), (0.0, 3.0)), bits = 2).as("z"))
      .as[Long].collect().toSeq
    assert(z === Seq(5L, 9L, 0L, 15L))
  }

  test("zValue clamps out-of-range and null values instead of corrupting bits") {
    val df = Seq(Some(100L), Some(-5L), None).toDF("x")
    val z = df.select(Clustering.zValue(Seq(col("x")),
        Seq((0.0, 3.0)), bits = 2).as("z")).as[Long].collect().toSeq
    assert(z === Seq(3L, 0L, 0L))
  }

  test("cluster preserves rows and produces files with disjoint z-ranges") {
    val t = LakeTable(tmp(), "t", Seq("id"), "ver")
    // ids laid out so insertion order is maximally uncorrelated with (x, y)
    val data = (0 until 256).map(i => (i.toLong, ((i * 37) % 16).toLong, ((i * 53) % 16).toLong, 1L))
    MergeWriter.append(data.toDF("id", "x", "y", "ver"), t)
    Clustering.cluster(spark, t, Seq("x", "y"), numFiles = 4)

    val back = MergeWriter.readView(spark, t)
      .select("id", "x", "y", "ver").as[(Long, Long, Long, Long)].collect().toSet
    assert(back === data.toSet, "clustering changed table contents")

    // per-file [min,max] of the z-value must not overlap (boundary ties ok)
    val ranges = Seq((0.0, 15.0), (0.0, 15.0))
    val files = new java.io.File(s"${t.path}/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length > 1, "expected multiple clustered files")
    val spans = files.map { f =>
      val r = spark.read.parquet(f)
        .select(Clustering.zValue(Seq(col("x"), col("y")), ranges, 16).as("z"))
        .agg(min("z"), max("z")).as[(Long, Long)].head()
      r
    }.sortBy(_._1)
    spans.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi <= lo,
        s"file z-ranges overlap: $spans")
      case _ => ()
    }
  }
}
