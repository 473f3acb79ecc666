package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Count-min and Bloom sketches: determinism, the one-sided error
  * guarantees, and the scale contracts (tiny broadcastable sketch
  * relations, map-side-combinable builds). */
class SketchesSpec extends SparkSuite {

  import spark.implicits._

  private def occurrences = Seq(
    "a", "a", "a", "b", "b", "c", "d", "e", "f", "g", "h", "i")
    .toDF("token")

  test("count-min estimates are never below the exact counts") {
    val sketch = Sketches.countMin(occurrences, "token", depth = 3, width = 8)
    val exact = occurrences.groupBy("token").agg(count(lit(1)).as("exact"))
    val est = Sketches.countMinEstimate(sketch, exact, "token",
      depth = 3, width = 8)
      .select("token", "exact", "est").as[(String, Long, Long)].collect()
    assert(est.nonEmpty && est.forall { case (_, ex, e) => e >= ex })
    // width 8 over 9 distinct keys MUST collide somewhere in some row;
    // the min over 3 rows may still dodge it, but the sketch total mass
    // per row always equals the corpus size (nothing lost, nothing double)
    val mass = sketch.groupBy("r").agg(sum("c").as("m"))
      .select("m").as[Long].collect()
    assert(mass.toSet === Set(12L))
  }

  test("count-min sketch is at most depth×width cells and deterministic") {
    val s1 = Sketches.countMin(occurrences, "token", depth = 4, width = 16)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val s2 = Sketches.countMin(occurrences.repartition(5), "token",
      depth = 4, width = 16)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(s1 === s2, "sketch must not depend on input partitioning")
    assert(s1.size <= 4 * 16)
  }

  test("bloom has no false negatives; false positives are deterministic") {
    val evalKeys = (1 to 50).map(i => s"eval$i").toDF("token")
    val bloom = Sketches.bloomBits(evalKeys, "token", numHashes = 3, bits = 256)
    val probes = ((1 to 50).map(i => s"eval$i") ++
      (1 to 200).map(i => s"other$i")).toDF("token")
    val out = Sketches.bloomMightContain(bloom, probes, "token",
      numHashes = 3, bits = 256)
      .select("token", "might_contain").as[(String, Boolean)].collect().toMap
    // every member answers true (the one-sided guarantee)
    assert((1 to 50).forall(i => out(s"eval$i")))
    // 256 bits with ~150 set: false positives WILL occur — and the exact
    // same set of them on a re-run (layout determinism, what the DuckDB
    // oracle replays)
    val fp1 = out.filter { case (k, v) => v && k.startsWith("other") }.keySet
    val out2 = Sketches.bloomMightContain(bloom, probes.repartition(7),
      "token", numHashes = 3, bits = 256)
      .select("token", "might_contain").as[(String, Boolean)].collect().toMap
    val fp2 = out2.filter { case (k, v) => v && k.startsWith("other") }.keySet
    assert(fp1 === fp2)
    assert(fp1.nonEmpty, "probe sized to exhibit false positives")
  }

  test("sketch builds broadcast: the probe join plans as a broadcast join") {
    val sketch = Sketches.countMin(occurrences, "token", depth = 4, width = 16)
    val plan = Sketches.countMinEstimate(sketch,
      occurrences.distinct(), "token", depth = 4, width = 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "sketch probe must not shuffle the corpus side")
  }
}
