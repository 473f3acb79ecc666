package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Recursive file listing for table roots, EXECUTOR-PARALLEL once the
  * root has more than a handful of top-level directories — the
  * InMemoryFileIndex approach: a 10⁶-file table on object storage takes
  * minutes of serial `listStatus` calls, but one task per top-level
  * directory bounds wall-time by directories/parallelism. Shared by
  * [[HudiRead]] (timeline-aware reads) and the Delta VACUUM service. */
object ParallelListing {

  /** One listed file: root-relative dir, file name, absolute path,
    * and byte length (free from the same listStatus). */
  final case class Listed(rel: String, name: String, path: String,
                          size: Long = -1L)

  /** All files under `root`. Top-level entries (files and directory
    * subtrees) whose name matches `skipTopLevel` are excluded — format
    * metadata like `.hoodie` / `_delta_log` stays untouched. */
  def listFiles(spark: SparkSession, root: String,
                skipTopLevel: String => Boolean, maxFiles: Int): Seq[Listed] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootStatus = fs.listStatus(rootPath)
      .filterNot(st => skipTopLevel(st.getPath.getName))
    val (dirs, files) = rootStatus.partition(_.isDirectory)
    val top = files.map(st =>
      Listed("", st.getPath.getName, st.getPath.toString, st.getLen))

    def walkSerial(p: Path, rel: String,
                   out: scala.collection.mutable.ArrayBuffer[Listed]): Unit =
      fs.listStatus(p).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory) walkSerial(st.getPath, s"$rel/$name".stripPrefix("/"), out)
        else out += Listed(rel, name, st.getPath.toString, st.getLen)
      }

    val nested: Seq[Listed] =
      if (dirs.length <= 8) {
        val out = scala.collection.mutable.ArrayBuffer.empty[Listed]
        dirs.foreach(d => walkSerial(d.getPath, d.getPath.getName, out))
        out.toSeq
      } else {
        // executor-parallel listing: ship the hadoop conf as plain props
        // (Configuration is not serializable) and walk each top-level
        // directory in its own task
        import scala.jdk.CollectionConverters._
        val props = spark.sparkContext.broadcast(
          spark.sparkContext.hadoopConfiguration.iterator().asScala
            .map(e => (e.getKey, e.getValue)).toArray)
        val seeds = dirs.map(d => (d.getPath.toString, d.getPath.getName)).toSeq
        spark.sparkContext
          .parallelize(seeds, math.min(seeds.size,
            spark.sparkContext.defaultParallelism * 2))
          .flatMap { case (dirPath, rel) =>
            val conf = new org.apache.hadoop.conf.Configuration(false)
            props.value.foreach { case (k, v) => conf.set(k, v) }
            val p = new Path(dirPath)
            val efs = p.getFileSystem(conf)
            val out = scala.collection.mutable.ArrayBuffer.empty[Listed]
            def walk(q: Path, r: String): Unit =
              efs.listStatus(q).foreach { st =>
                val name = st.getPath.getName
                if (st.isDirectory) walk(st.getPath, s"$r/$name")
                else out += Listed(r, name, st.getPath.toString, st.getLen)
              }
            walk(p, rel)
            out
          }.collect().toSeq
      }
    val all = top ++ nested
    require(all.size <= maxFiles,
      s"$root lists more than $maxFiles files — raise maxFiles " +
        "(driver memory) or operate on specific partitions")
    all.toSeq
  }
}
