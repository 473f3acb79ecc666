package graft.ops

import graft.SparkSuite

/** AS-OF join laws: backward match ≤, tie visibility, left-outer nulls,
  * per-key isolation, atomic payload. */
class AsofJoinSpec extends SparkSuite {

  import spark.implicits._

  private val quotes = Seq(
    (1L, 10L, "q10", 100.0),
    (1L, 20L, "q20", 200.0),
    (2L, 15L, "q15", 150.0))
    .toDF("k", "qt", "qid", "px")

  private val probes = Seq(
    (1L, 5L, "p_before_any"),
    (1L, 10L, "p_at_quote"),
    (1L, 25L, "p_after_all"),
    (2L, 14L, "p_before_k2"),
    (3L, 99L, "p_no_quotes"))
    .toDF("k", "pt", "pid")

  test("backward semantics: latest quote at-or-before, per key, outer nulls") {
    val out = AsofJoin.asofBackward(probes, quotes, Seq("k"), "pt", "qt",
        Seq("qid", "px"))
      .select("pid", "qid", "px").as[(String, Option[String], Option[Double])]
      .collect().map { case (k, q, p) => k -> ((q, p)) }.toMap
    assert(out("p_before_any") === ((None, None)))
    assert(out("p_at_quote") === ((Some("q10"), Some(100.0)))) // <= includes ties
    assert(out("p_after_all") === ((Some("q20"), Some(200.0))))
    assert(out("p_before_k2") === ((None, None))) // k2's quote is later
    assert(out("p_no_quotes") === ((None, None))) // key absent on right
  }

  test("payload is atomic: both columns come from the same quote row") {
    val out = AsofJoin.asofBackward(probes, quotes, Seq("k"), "pt", "qt",
        Seq("qid", "px"))
      .filter($"qid".isNotNull)
      .select("qid", "px").as[(String, Double)].collect()
    out.foreach { case (qid, px) =>
      assert(("q" + px.toLong / 10) === qid)
    }
  }
}
