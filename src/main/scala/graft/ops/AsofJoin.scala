package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — for each left row, the single most recent right row with
  * `rightTime <= leftTime` within the same key group (the time-series /
  * point-in-time-correctness operator Spark SQL lacks; DuckDB ships it as
  * `ASOF JOIN`, which is exactly what the oracle uses).
  *
  * Implementation is the scale-correct union trick, NOT a range join:
  * tag both sides, union them, and run ONE window pass per key ordered by
  * (time, side) taking the last quote payload at or before each probe row.
  * Cost = one hash shuffle on the key + one sort — no
  * O(left × right-in-range) pair blowup, no skew amplification beyond the
  * key's own row count; at 100 TB this is the same shape as any windowed
  * aggregation. A broadcast-range join would explode exactly when it
  * matters (hot keys with long histories). */
object AsofJoin {

  /** @param left       probe side (each row gets ≤1 match appended)
    * @param right      quote side
    * @param keys       equi-join key columns (same names both sides)
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right` (same/castable type)
    * @param payload    right-side columns to append (all null when no quote
    *                   at or before the probe time — LEFT OUTER semantics) */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTime: String, rightTime: String,
                   payload: Seq[String]): DataFrame = {
    val leftRest = left.columns.toSeq.filterNot(keys.contains)
    // the quote payload travels as ONE nullable struct so the window's
    // last() picks an ATOMIC quote row (per-column last() could stitch
    // fields from different quotes when payload columns contain nulls)
    val quoteStruct = struct(payload.map(col): _*)
    val taggedRight = right.select(
      (keys.map(col)
        :+ col(rightTime).as("_t")
        :+ lit(0).as("_side")
        :+ quoteStruct.as("_q"))
        ++ leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      (keys.map(col)
        :+ col(leftTime).cast(right.schema(rightTime).dataType).as("_t")
        :+ lit(1).as("_side")
        :+ lit(null).cast(taggedRight.schema("_q").dataType).as("_q"))
        ++ leftRest.map(col): _*)
    // side 0 (quote) sorts before side 1 (probe) on time ties, so a quote
    // AT the probe time is visible to it (<= backward semantics)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .withColumn("_asof", last(col("_q"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select((keys ++ leftRest).map(col)
        ++ payload.map(c => col(s"_asof.$c").as(c)): _*)
  }
}
