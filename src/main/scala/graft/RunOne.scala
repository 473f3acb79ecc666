package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: run a single SparkEntry query with timing + plan dump.
  * Usage: runMain graft.RunOne <name> [sfDir] [explain|noexplain|dump <path>]
  * `dump <path>` writes the result parquet for ad-hoc oracle comparison.
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val doExplain = args.length > 2 && args(2) == "explain"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tc = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, sfDir)
    // iterative operators (e.g. connectedComponents) run jobs eagerly here
    println(f"[runone] $name constructed in ${(System.nanoTime() - tc) / 1e9}%.2fs")
    if (doExplain) df.explain("formatted")
    if (args.length > 3 && args(2) == "dump") {
      df.coalesce(1).write.mode("overwrite").parquet(args(3))
      println(s"[runone] $name dumped to ${args(3)}")
      spark.stop(); return
    }
    if (args.length > 2 && args(2).startsWith("noop")) {
      // bench-identical timed action: noop sink, three passes;
      // "noopexplain" additionally prints the POST-execution plan (the
      // AQE-final shape — runtime exchange reuse and join rewrites are
      // invisible in the pre-execution explain)
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[runone] $name noop$i in ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
      if (args(2) == "noopexplain") {
        spark.listenerManager.register(
          new org.apache.spark.sql.util.QueryExecutionListener {
            override def onSuccess(funcName: String,
                qe: org.apache.spark.sql.execution.QueryExecution,
                durationNs: Long): Unit =
              println("[runone] FINAL EXECUTED PLAN:\n" + qe.executedPlan)
            override def onFailure(funcName: String,
                qe: org.apache.spark.sql.execution.QueryExecution,
                exception: Exception): Unit = ()
          })
        df.write.format("noop").mode("overwrite").save()
        Thread.sleep(3000) // listener bus is async
      }
      spark.stop(); return
    }
    // warm + measure twice to split JIT/codegen from steady-state
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[runone] $name run$i rows=$n in ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
