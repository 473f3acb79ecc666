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
