package graft.core

import org.apache.spark.sql.SparkSession

/** Session construction done right.
  *
  * The reference's `Sparker.buildSparkSession` (boxer-common/src/main/scala/
  * tech/odes/hudi/spark/common/Sparker.scala:25-28) accepts `additionalConfigs`
  * but never applies them — the Kryo defaults only reach Spark via spark-submit
  * `--conf` in the launch scripts. Here every config actually lands on the
  * builder (SURVEY.md H1).
  *
  * Defaults are sized for the harness (local[32], one JVM) but are all
  * overridable; on a real cluster `master` comes from spark-submit and
  * `shuffle.partitions` should be ~2-3x total cores (AQE coalesces down).
  */
object SparkEnv {

  /** Correctness configs the reference always passes via spark-submit
    * (e.g. boxer-jdbc/src/test/resources/script/mysql/mysql-hudi-import.sh:4-6). */
  val defaultConfigs: Map[String, String] = Map(
    "spark.serializer" -> "org.apache.spark.serializer.KryoSerializer",
    "spark.kryoserializer.buffer.max" -> "512m",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.shuffle.partitions" -> "32",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    // dynamic partition overwrite: MergeWriter rewrites only affected
    // partitions of a lake table (COW semantics at 100 TB scale).
    "spark.sql.sources.partitionOverwriteMode" -> "dynamic",
    "spark.sql.parquet.datetimeRebaseModeInRead" -> "CORRECTED",
    // TIMESTAMP(NANOS) parquet is unreadable by Spark 4 otherwise — surfaces
    // as an epoch-nano BIGINT column instead
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.ui.enabled" -> "false",
  )

  def builder(
      appName: String,
      master: Option[String] = None,
      extra: Map[String, String] = Map.empty): SparkSession.Builder = {
    val b = SparkSession.builder().appName(appName)
    val withMaster = master.fold(b)(b.master)
    (defaultConfigs ++ extra).foldLeft(withMaster) {
      case (bb, (k, v)) => bb.config(k, v)
    }
  }

  /** App-entry builder: spark-submit provides `spark.master` via system
    * properties; a bare JVM launch (tests, sbt runMain) falls back to
    * local[*] so the apps run anywhere. */
  def appBuilder(appName: String, extra: Map[String, String] = Map.empty): SparkSession.Builder = {
    val master =
      if (sys.props.contains("spark.master") || sys.env.contains("SPARK_MASTER")) None
      else Some(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
    builder(appName, master, extra)
  }

  /** Local session for tests / the harness. */
  def localSession(
      appName: String = "graft",
      cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      extra: Map[String, String] = Map.empty): SparkSession = {
    val s = builder(appName, Some(s"local[$cores]"),
      Map("spark.sql.shuffle.partitions" -> cores) ++ extra).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
