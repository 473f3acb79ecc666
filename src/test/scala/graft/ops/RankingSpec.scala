package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Two-pass range ranking vs the single-partition window form: identical
  * ranks / NTILE / percent_rank / cume_dist, without the global-sort task. */
class RankingSpec extends SparkSuite {

  import spark.implicits._

  // shuffled unique values so range boundaries land mid-stream
  private lazy val df = scala.util.Random.shuffle((1 to 997).toList)
    .map(i => (i.toLong, (i * 7919 % 1000).toLong))
    .toDF("id", "v")

  test("globalRankByRange matches the global window rank") {
    val order = Seq(col("v"), col("id"))
    val expected = df.withColumn("global_rank",
      row_number().over(Window.orderBy(order: _*)).cast("long"))
      .select("id", "global_rank").as[(Long, Long)].collect().toMap
    val got = Ranking.globalRankByRange(df, order, numPartitions = 7)
      .select("id", "global_rank").as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("rankWithTotal: total equals row count") {
    val (_, n) = Ranking.rankWithTotal(df, Seq(col("v"), col("id")), 5)
    assert(n === 997L)
  }

  test("ntileOf / percentRankOf / cumeDistOf match the window functions") {
    val order = Seq(col("v"), col("id"))
    val w = Window.orderBy(order: _*)
    for (k <- Seq(3, 4, 10)) {
      val expected = df.select(col("id"),
        ntile(k).over(w).as("q"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
        .as[(Long, Int, Double, Double)].collect().toSeq.sortBy(_._1)
      val (ranked, n) = Ranking.rankWithTotal(df, order, 7)
      val got = ranked.select(col("id"),
        Ranking.ntileOf(col("global_rank"), n, k).as("q"),
        Ranking.percentRankOf(col("global_rank"), n).as("pr"),
        Ranking.cumeDistOf(col("global_rank"), n).as("cd"))
        .as[(Long, Int, Double, Double)].collect().toSeq.sortBy(_._1)
      assert(got === expected, s"k=$k")
    }
  }

  test("ntileOf degenerate case: fewer rows than buckets") {
    val tiny = Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
    val w = Window.orderBy("v", "id")
    val expected = tiny.select(col("id"), ntile(5).over(w).as("q"))
      .as[(Long, Int)].collect().toMap
    val (ranked, n) = Ranking.rankWithTotal(tiny, Seq(col("v"), col("id")), 3)
    val got = ranked.select(col("id"), Ranking.ntileOf(col("global_rank"), n, 5).as("q"))
      .as[(Long, Int)].collect().toMap
    assert(got === expected)
  }

  test("groupPercentiles matches the exact percentile aggregate bit-for-bit") {
    // groups of co-prime sizes so h = (n-1)p + 1 lands on AND between ranks;
    // duplicated values exercise the tie-break path
    val d = (1 to 500).map(i =>
      (i.toLong, s"g${i % 3}", (i * 7919 % 97).toDouble)).toDF("id", "g", "v")
    val expected = d.groupBy("g").agg(
      expr("percentile(v, 0.25)").as("p25"),
      expr("percentile(v, 0.5)").as("p50"),
      expr("percentile(v, 0.75)").as("p75"),
      expr("percentile(v, 1.0)").as("mx"),
      count(lit(1)).as("n"))
      .as[(String, Double, Double, Double, Double, Long)].collect().toSet
    val got = Ranking.groupPercentiles(d, Seq("g"), col("v"), Seq(col("id")),
      Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "mx" -> 1.0))
      .as[(String, Double, Double, Double, Double, Long)].collect().toSet
    assert(got === expected)
  }

  test("groupPercentiles null semantics match the exact aggregate") {
    // null values ignored; an all-null group emits null percentiles; a
    // null GROUP KEY is an ordinary group — all like percentile()'s output
    val d = Seq(
      (1L, Some("a"), Some(1.0)), (2L, Some("a"), None), (3L, Some("a"), Some(3.0)),
      (4L, Some("b"), None), (5L, Some("b"), None), // all-null group
      (6L, None, Some(5.0)), (7L, None, Some(7.0))) // null group key
      .toDF("id", "g", "v")
    val expected = d.groupBy("g").agg(
      expr("percentile(v, 0.5)").as("p50"),
      count(col("v")).as("n"))
      .as[(Option[String], Option[Double], Long)].collect().toSet
    val got = Ranking.groupPercentiles(d, Seq("g"), col("v"), Seq(col("id")),
      Seq("p50" -> 0.5))
      .as[(Option[String], Option[Double], Long)].collect().toSet
    assert(got === expected)
    assert(got === Set(
      (Some("a"), Some(2.0), 2L), (Some("b"), None, 0L), (None, Some(6.0), 2L)))
  }

  test("groupPercentiles plan has no global window and no percentile buffer") {
    val d = (1 to 100).map(i => (i.toLong, s"g${i % 3}", i.toDouble))
      .toDF("id", "g", "v")
    val plan = Ranking.groupPercentiles(d, Seq("g"), col("v"), Seq(col("id")),
      Seq("p50" -> 0.5)).queryExecution.executedPlan
    val badWindows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(badWindows.isEmpty, s"global (unpartitioned) WindowExec: $badWindows")
    assert(!plan.toString.toLowerCase.contains("percentile"),
      "plan must not contain the buffering percentile aggregate")
  }

  test("plan has no single-partition global-sort window") {
    val (ranked, _) = Ranking.rankWithTotal(df, Seq(col("v"), col("id")), 7)
    // window operators must all be partitioned (partitionBy _pid), never the
    // empty-partition global form that funnels every row into one task
    val bad = ranked.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty, s"global (unpartitioned) WindowExec found: $bad")
  }
}
