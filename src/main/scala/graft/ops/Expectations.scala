package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative DATA-QUALITY EXPECTATIONS over a batch or micro-batch —
  * the `expect` / `expect_or_drop` / `expect_or_fail` contract of
  * Delta Live Tables, re-expressed as plain Catalyst:
  *
  *  - every rule is a SQL boolean over the row; a row VIOLATES a rule
  *    when the condition is false OR NULL (a null check result is a
  *    data problem, not a pass — DLT's semantics),
  *  - [[metrics]] is ONE map-side aggregate over the input (a
  *    conditional-sum per rule + the row count, reshaped by `stack`) —
  *    no shuffle keyed by data, no second scan per rule,
  *  - [[split]] routes rows: `passed` drops rows violating any
  *    Drop/Fail rule (Warn violations stay — they are observability,
  *    not gates); `quarantined` carries the complement WITH a
  *    `_violations` array naming every failed rule, the
  *    dead-letter-table shape,
  *  - [[enforce]] is the pipeline gate: compute metrics, throw loudly
  *    if any Fail rule has violations (naming rule and count), else
  *    return the passed rows.
  *
  * At 100 TB each call is a single pass over the data per action
  * (metrics one aggregate; split one filter per branch) with every
  * predicate inside whole-stage codegen. */
object Expectations {

  sealed trait Action { private[Expectations] def name: String }
  /** Keep the row, count the violation. */
  case object Warn extends Action { private[Expectations] val name = "warn" }
  /** Drop the row from `passed`, keep it in `quarantined`. */
  case object Drop extends Action { private[Expectations] val name = "drop" }
  /** Abort the batch when violated ([[enforce]]). */
  case object Fail extends Action { private[Expectations] val name = "fail" }

  final case class Rule(name: String, condition: String,
                        action: Action = Warn)

  private def violated(r: Rule): Column =
    !coalesce(expr(r.condition), lit(false))

  private def checkRules(rules: Seq[Rule]): Unit = {
    require(rules.nonEmpty, "at least one expectation rule is required")
    val dup = rules.groupBy(_.name).collect { case (n, rs) if rs.size > 1 => n }
    require(dup.isEmpty, s"duplicate rule names: ${dup.mkString(", ")}")
  }

  /** Input rows + a `_violations` array column naming every failed
    * rule (empty array = clean row). */
  def flag(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    checkRules(rules)
    df.withColumn("_violations", filter(
      array(rules.map(r => when(violated(r), lit(r.name))): _*),
      _.isNotNull))
  }

  /** `(passed, quarantined)`: a row lands in `quarantined` iff it
    * violates at least one Drop/Fail rule; `quarantined` keeps the
    * `_violations` column (ALL failed rules, Warn included — the
    * dead-letter record should explain everything wrong with the row). */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    checkRules(rules)
    val gating = rules.filter(_.action != Warn)
    val gate: Column =
      if (gating.isEmpty) lit(false)
      else gating.map(violated).reduce(_ || _)
    val flagged = flag(df, rules).withColumn("__gated", gate)
    (flagged.where(!col("__gated")).drop("__gated", "_violations"),
      flagged.where(col("__gated")).drop("__gated"))
  }

  /** Per-rule violation counts: `(rule, action, violations, total)` —
    * ONE aggregate over the input, reshaped to long form. */
  def metrics(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    checkRules(rules)
    val sums = rules.map(r =>
      sum(when(violated(r), 1L).otherwise(0L)).as(s"__v_${r.name}")) :+
      count(lit(1)).as("__total")
    val wide = df.agg(sums.head, sums.tail: _*)
    val stackArgs = rules.map(r => s"'${r.name}', `__v_${r.name}`")
      .mkString(", ")
    val long = wide.selectExpr(
      s"stack(${rules.size}, $stackArgs) AS (rule, violations)", "__total")
    val actionOf = rules.foldLeft(lit(null).cast("string")) { (acc, r) =>
      when(col("rule") === r.name, lit(r.action.name)).otherwise(acc)
    }
    long.select(col("rule"), actionOf.as("action"),
      col("violations").cast("long").as("violations"),
      col("__total").cast("long").as("total"))
  }

  /** The pipeline gate: throws `IllegalStateException` naming every
    * violated Fail rule (with counts), else returns the Drop-filtered
    * rows. Two passes total (metrics aggregate + the passed filter). */
  def enforce(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    checkRules(rules)
    val failing = metrics(df, rules)
      .where(col("action") === Fail.name && col("violations") > 0L)
      .select("rule", "violations")
      .collect().map(r => s"${r.getString(0)} (${r.getLong(1)} rows)")
    if (failing.nonEmpty) throw new IllegalStateException(
      s"expectation failure: ${failing.mkString(", ")}")
    split(df, rules)._1
  }
}
