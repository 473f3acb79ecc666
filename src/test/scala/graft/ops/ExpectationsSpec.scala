package graft.ops

import graft.SparkSuite
import graft.ops.Expectations._

/** [[Expectations]]: warn/drop/fail routing, null-is-violation
  * semantics, one-aggregate metrics, dead-letter quarantine shape. */
class ExpectationsSpec extends SparkSuite {

  import spark.implicits._

  private val rows = Seq(
    (1L, 10.0, "ok"),       // clean
    (2L, -5.0, "ok"),       // violates positive_amount (drop)
    (3L, 20.0, null),       // violates tagged (warn) — null condition
    (4L, 0.0, "ok"))        // violates positive_amount AND nonzero (warn)
    .toDF("id", "amount", "tag")

  private val rules = Seq(
    Rule("positive_amount", "amount > 0", Drop),
    Rule("tagged", "tag IS NOT NULL", Warn),
    Rule("nonzero", "amount <> 0", Warn))

  test("split: Drop rules gate, Warn rules only annotate") {
    val (passed, quarantined) = split(rows, rules)
    assert(passed.select("id").as[Long].collect().toSeq.sorted ===
      Seq(1L, 3L), "warn-only violations must pass; drop violations must not")
    assert(passed.columns.toSeq === Seq("id", "amount", "tag"),
      "passed rows carry no bookkeeping columns")
    val q = quarantined.orderBy("id")
      .select($"id", $"_violations")
      .as[(Long, Seq[String])].collect().toSeq
    assert(q === Seq(
      (2L, Seq("positive_amount")),
      (4L, Seq("positive_amount", "nonzero"))),
      "quarantine must name EVERY failed rule, warn included")
  }

  test("metrics: one row per rule, null condition counts as violated") {
    val m = metrics(rows, rules).orderBy("rule")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(m === Seq(
      ("nonzero", "warn", 1L, 4L),
      ("positive_amount", "drop", 2L, 4L),
      ("tagged", "warn", 1L, 4L)))
  }

  test("metrics is ONE job / one aggregate (no per-rule scans)") {
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      metrics(rows, rules).collect()
      Thread.sleep(500)
      assert(jobs.get() <= 2,
        s"metrics ran ${jobs.get()} jobs — must be one aggregate pass")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("enforce: Fail rule aborts loudly with rule name and count") {
    val gated = rules :+ Rule("no_negatives", "amount >= 0", Fail)
    val e = intercept[IllegalStateException] { enforce(rows, gated) }
    assert(e.getMessage.contains("no_negatives"))
    assert(e.getMessage.contains("1 rows"))
    // without violations the gate passes and Drop rules filter
    val fine = enforce(rows, Seq(
      Rule("bounded", "amount <= 100", Fail),
      Rule("positive_amount", "amount > 0", Drop)))
    assert(fine.select("id").as[Long].collect().toSeq.sorted === Seq(1L, 3L))
  }

  test("guards: empty and duplicate rule names fail loudly") {
    intercept[IllegalArgumentException] { metrics(rows, Nil) }
    intercept[IllegalArgumentException] {
      metrics(rows, Seq(Rule("a", "id > 0"), Rule("a", "id < 9")))
    }
  }
}
