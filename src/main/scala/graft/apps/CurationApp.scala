package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{ConfigLayer, SparkEnv}
import graft.ops.{Curation, TextOps}
import graft.sink.{LakeTable, MergeWriter}

/** Corpus-curation application: the training-data funnel as a CLI app with
  * the same config conventions as the import boxers — documents parquet in,
  * curated keyed lake table out.
  *
  * Pipeline (every stage optional via config, all stages = the same
  * operators the oracle-checked `pipeline_curate` query composes):
  *   lang-ID agreement → repetition/quality filter → exact keep-first
  *   dedup → n-gram decontamination vs an eval set → per-source token
  *   budgets → keyed upsert (doc_id, partitioned as configured).
  *
  * Config surface (`graft.curation.*` + the `hoodie.*` table keys):
  *   - `pii.scrub`           mask emails/IPs/phones before every other
  *                           stage (PII-differing dups then collapse)
  *   - `langid.enable`       drop docs whose predicted lang ≠ labeled lang
  *   - `min.tokens`          quality floor (default 20)
  *   - `repetition.factor`   drop when top_bigram_n * factor > n_tokens
  *                           (default 5 ⇒ >20% boilerplate bigram mass)
  *   - `eval.path`           parquet of eval docs → decontamination on
  *   - `ngram`               decontamination n-gram size (default 8)
  *   - `budget.default` / `budget.<source>`  token budgets (mixWeighted)
  */
object CurationApp {

  val Prefix = "graft.curation."

  def appName(cli: Map[String, String]): String =
    s"graft-curation-${cli.getOrElse("source", "?").split('/').last}"

  /** The funnel, exposed for tests. Returns the curated DataFrame. */
  def curate(spark: SparkSession, docs: DataFrame, conf: ConfigLayer): DataFrame = {
    val minTokens = conf.getOrElse(Prefix + "min.tokens", "20").toInt
    val repFactor = conf.getOrElse(Prefix + "repetition.factor", "5").toInt
    // PII scrub runs FIRST so every later stage (incl. the exact dedup's
    // md5) sees the redacted text — two docs differing only in their PII
    // collapse to one
    val scrubbed =
      if (!conf.getBoolean(Prefix + "pii.scrub", default = false)) docs
      else docs.withColumn("text", TextOps.scrubPii(col("text")))
    val langOk =
      if (!conf.getBoolean(Prefix + "langid.enable", default = false)) scrubbed
      else TextOps.langId(scrubbed)
        .filter(col("lang_pred") === col("lang")).drop("lang_pred")
    val rep = Curation.repetitionProfile(langOk)
      .filter(col("n_tokens") >= minTokens &&
        col("top_bigram_n") * repFactor <= col("n_tokens"))
      .select("doc_id")
    val quality = langOk.join(rep, "doc_id")
    // keep-first election: map-side min aggregate + semi-join back (the
    // Curation.dedupParagraphs pattern). The semi-join keys on (digest,
    // doc_id) — unique per row — so a viral duplicate never concentrates
    // on one task the way a Window.partitionBy(digest) sort would.
    val hashed = quality.withColumn("_dg", md5(col("text")))
    val firsts = hashed.groupBy(col("_dg")).agg(min(col("doc_id")).as("__keep"))
      .select(col("_dg").as("__dg"), col("__keep"))
    val deduped = hashed.join(firsts,
        col("_dg") === col("__dg") && col("doc_id") === col("__keep"), "left_semi")
      .drop("_dg")
    val decontaminated = conf.get(Prefix + "eval.path") match {
      case None => deduped
      case Some(evalPath) =>
        val n = conf.getOrElse(Prefix + "ngram", "8").toInt
        val contaminated = TextOps
          .decontaminate(deduped, spark.read.parquet(evalPath), n)
          .select("doc_id")
        deduped.join(contaminated, Seq("doc_id"), "left_anti")
    }
    val budgets = conf.stripPrefix(Prefix + "budget.")
      .filterNot(_._1 == "default")
      .map { case (k, v) => k -> v.trim.toLong }
    val defaultBudget = conf.get(Prefix + "budget.default").map(_.trim.toLong)
    if (budgets.isEmpty && defaultBudget.isEmpty) decontaminated
    else Curation.mixWeighted(decontaminated, budgets,
      defaultBudget = defaultBudget.getOrElse(Long.MaxValue))
      .drop("nt", "cum_tokens")
  }

  def sync(spark: SparkSession, conf: ConfigLayer, cli: Map[String, String]): Unit = {
    val docs = spark.read.parquet(cli("source"))
    // Materialize the funnel once: the isEmpty probe below would otherwise
    // execute the whole pipeline, and the upsert would recompute it from
    // scratch (same pattern as CurationStream.ingestBatch).
    val curated = curate(spark, docs, conf).localCheckpoint(false)
    if (curated.isEmpty)
      throw new IllegalStateException("[curation] nothing survived the funnel")
    val table = LakeTable.fromConfig(cli("table-path"), conf)
    MergeWriter.upsert(spark, curated, table)
  }

  private val usage =
    """usage: graft.apps.CurationApp
      |  --source <documents parquet> --table-path <lake path>
      |  [--props <file>] [--hoodie-conf k=v]... [--debug] [--help]""".stripMargin

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(usage)
      System.exit(1)
    }
    var cli = Map.empty[String, String]
    var overrides = Vector.empty[String]
    var debug = false
    var i = 0
    def valueOf(flag: String): String = {
      if (i + 1 >= args.length) {
        System.err.println(s"missing value for $flag\n$usage")
        System.exit(1)
      }
      i += 1
      args(i)
    }
    while (i < args.length) {
      args(i) match {
        case "--help" | "-h" => println(usage); System.exit(0)
        case "--debug" => debug = true
        case "--hoodie-conf" => overrides :+= valueOf("--hoodie-conf")
        case flag if flag.startsWith("--") =>
          cli += flag.stripPrefix("--") -> valueOf(flag)
        case other => throw new IllegalArgumentException(s"unrecognized argument: $other")
      }
      i += 1
    }
    Seq("source", "table-path").foreach(f =>
      require(cli.contains(f), s"Missing argument : (--$f)"))
    val conf = ConfigLayer.layered(
      propsFile = cli.get("props"),
      overrides = ConfigLayer.fromPairs(overrides))
    val spark = SparkEnv.appBuilder(appName(cli)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      if (debug) curate(spark, spark.read.parquet(cli("source")), conf)
        .show(10, truncate = false)
      else sync(spark, conf, cli)
    } finally spark.stop()
  }
}
