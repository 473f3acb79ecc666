package graft.sources

import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Key-column NDV SKETCHES in the manifest — the cardinality leg of
  * join planning. `sizeInBytes`/`numRows` alone let the optimizer
  * decide broadcast only by BYTES; a wide-but-low-cardinality
  * dimension (200 MB scan, 300 distinct keys) then sort-merges where
  * `GROUP BY key` → join should broadcast. A per-version HLL sketch
  * of the bucket key (`#ndv\t<col>\t<base64>` manifest header) gives
  * [[GraftBucketScan.estimateStatistics]] a `distinctCount` column
  * statistic, which Spark's `transformV2Stats` hands to CBO — the
  * aggregate's output-row estimate collapses to the NDV and the
  * broadcast decision flips on cardinality, not bytes.
  *
  * Maintenance semantics (documented, conservative): the sketch
  * tracks keys WRITTEN since the last full replace — appends and
  * merges UNION their batch in (HLL union is associative, so the fold
  * is one line per commit), full `write()`/`INSERT OVERWRITE` start
  * fresh, compaction/clustering carry the header unchanged (row set
  * unchanged — the fold is EXACT there), and deletes carry it too
  * (HLL cannot subtract; a deleted key leaves an over-estimate, the
  * safe direction for a broadcast decision). lgK=12 / HLL_8: ~1.6%
  * relative error, ≤4 KB per header line — one line per version, not
  * per file, so a 10^6-file manifest pays nothing extra. */
private[sources] object NdvSketch {
  val LgK = 12

  def newSketch(): HllSketch = new HllSketch(LgK, TgtHllType.HLL_8)

  /** One per-type update convention shared by EVERY producer (writer
    * tasks, write()'s read-back, merge's batch fold) — two producers
    * hashing the same logical value differently would double-count. */
  def update(sk: HllSketch, v: Any, dt: DataType): Unit = {
    if (v == null) return
    dt match {
      case LongType => sk.update(v.asInstanceOf[Long])
      case IntegerType | DateType => sk.update(v.asInstanceOf[Int].toLong)
      case ShortType => sk.update(v.asInstanceOf[Short].toLong)
      case ByteType => sk.update(v.asInstanceOf[Byte].toLong)
      case TimestampType | TimestampNTZType =>
        sk.update(v.asInstanceOf[Long])
      case StringType =>
        sk.update(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
          .getBytes)
      case BinaryType => sk.update(v.asInstanceOf[Array[Byte]])
      case BooleanType => sk.update(if (v.asInstanceOf[Boolean]) 1L else 0L)
      case _ => () // unsupported key type: no sketch contribution
    }
  }

  def trackable(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DateType | ShortType | ByteType |
         TimestampType | TimestampNTZType | StringType | BinaryType |
         BooleanType => true
    case _ => false
  }

  def toB64(sk: HllSketch): String =
    java.util.Base64.getEncoder.encodeToString(sk.toCompactByteArray)

  /** A header value is `<b64>[:<nullCount>]` — base64 never contains
    * ':', so the suffix is unambiguous. The null count rides along
    * because CBO's AggregateEstimation requires BOTH distinctCount and
    * nullCount (`hasCountStats`) before it trusts a grouping column —
    * an NDV without nulls prices nothing. */
  def encode(b64: String, nulls: Option[Long]): String =
    b64 + nulls.fold("")(n => s":$n")

  def decode(v: String): (String, Option[Long]) = v.indexOf(':') match {
    case -1 => (v, None)
    case i => (v.substring(0, i), v.substring(i + 1).toLongOption)
  }

  def nullCountOf(v: String): Option[Long] = decode(v)._2

  def estimate(v: String): Option[Long] =
    try Some(math.round(HllSketch.heapify(
      java.util.Base64.getDecoder.decode(decode(v)._1)).getEstimate))
    catch { case _: Exception => None }

  /** Union any number of serialized/byte sketches; None when nothing
    * contributed. */
  def unionAll(b64s: Seq[String], raw: Seq[Array[Byte]]): Option[String] = {
    if (b64s.isEmpty && raw.isEmpty) return None
    val u = new Union(LgK)
    b64s.foreach { s =>
      try u.update(HllSketch.heapify(
        java.util.Base64.getDecoder.decode(decode(s)._1)))
      catch { case _: Exception => () } // corrupt header: drop, not fail
    }
    raw.foreach { b =>
      try u.update(HllSketch.heapify(b))
      catch { case _: Exception => () }
    }
    Some(toB64(u.getResult(TgtHllType.HLL_8)))
  }

  /** Sketch one column of `df` — executor map-side partial sketches,
    * one tiny driver fold (≤ partitions × 4 KB); the shape an
    * `approx_count_distinct` uses, kept on OUR convention so it unions
    * with writer-task sketches. */
  def sketchColumn(df: DataFrame, colName: String): Option[String] = {
    val idx = df.schema.fieldIndex(colName)
    val dt = df.schema.fields(idx).dataType
    if (!trackable(dt)) return None
    val parts = df.select(colName).queryExecution.toRdd
      .mapPartitions { it =>
        val sk = newSketch()
        it.foreach(r => update(sk, if (r.isNullAt(0)) null else r.get(0, dt),
          dt))
        Iterator.single(sk.toCompactByteArray)
      }.collect() // bounded: one ≤4 KB sketch per partition
    unionAll(Nil, parts.toSeq)
  }

  /** Sketch SEVERAL columns in ONE pass over `df`, counting nulls
    * alongside (untrackable columns are silently absent — callers
    * validate up front when absence should be loud). Returns
    * `col -> (b64 sketch, exact null count)`; driver traffic stays
    * bounded: one ≤4 KB sketch + one long per (partition, column). */
  def sketchColumns(df: DataFrame,
                    cols: Seq[String]): Map[String, (String, Long)] = {
    val tracked = cols.distinct.filter(c => trackable(df.schema(c).dataType))
    if (tracked.isEmpty) return Map.empty
    val dts = tracked.map(c => df.schema(c).dataType).toArray
    val n = tracked.length
    val parts = df.select(tracked.map(org.apache.spark.sql.functions.col): _*)
      .queryExecution.toRdd
      .mapPartitions { it =>
        val sks = Array.fill(n)(newSketch())
        val nulls = new Array[Long](n)
        it.foreach { r =>
          var i = 0
          while (i < n) {
            if (r.isNullAt(i)) nulls(i) += 1L
            else update(sks(i), r.get(i, dts(i)), dts(i))
            i += 1
          }
        }
        Iterator.single((sks.map(_.toCompactByteArray), nulls))
      }.collect()
    tracked.zipWithIndex.flatMap { case (c, i) =>
      unionAll(Nil, parts.map(_._1(i)).toSeq)
        .map(b => c -> (b, parts.map(_._2(i)).sum))
    }.toMap
  }
}
