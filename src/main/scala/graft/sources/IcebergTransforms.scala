package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.types._

/** Iceberg PARTITION TRANSFORMS — the published spec's hidden-partitioning
  * functions (Iceberg spec "Partition Transforms" + Appendix B "32-bit
  * Hash Requirements"), implemented from scratch:
  *
  *  - `bucket[N]`: `(murmur3_x86_32(bytes, seed=0) & Int.MaxValue) % N`
  *    where int/long/date/timestamp hash as the 8-byte LITTLE-ENDIAN
  *    long (ints promote to longs so `bucket(34)` == `bucket(34L)`) and
  *    strings hash their UTF-8 bytes. Appendix-B vectors pinned in
  *    IcebergTransformsSpec (34L → 2017239379, "iceberg" → 1210000089).
  *  - `day`/`hour`: floorDiv of the timestamp's epoch micros (negative
  *    timestamps round toward −∞, per the spec); a `date` source is
  *    already epoch days.
  *  - `month`: months from 1970-01 via the proleptic calendar.
  *  - `truncate[W]`: `v - floorMod(v, W)` for integers; the first W
  *    UNICODE characters for strings.
  *
  * The INCLUSIVE PREDICATE PROJECTION (`keeps`) is the scan-planning
  * side: given a file's transformed partition value and a data-column
  * predicate, decide whether the file can hold matching rows. Monotone
  * transforms project range predicates (`ts >= T` → `day >= day(T)`);
  * bucket projects only equality/IN. Unknown shapes keep the file —
  * pruning is an optimization, never a correctness gate. */
object IcebergTransforms {

  // ---- murmur3_x86_32 (public algorithm; Iceberg hashes with seed 0) --

  def murmur3x86_32(data: Array[Byte], seed: Int): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h = seed
    val n = data.length & ~3
    var i = 0
    while (i < n) {
      var k = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      k *= c1
      k = Integer.rotateLeft(k, 15)
      k *= c2
      h ^= k
      h = Integer.rotateLeft(h, 13)
      h = h * 5 + 0xe6546b64
      i += 4
    }
    var k = 0
    val tail = data.length & 3
    if (tail >= 3) k ^= (data(n + 2) & 0xff) << 16
    if (tail >= 2) k ^= (data(n + 1) & 0xff) << 8
    if (tail >= 1) {
      k ^= data(n) & 0xff
      k *= c1
      k = Integer.rotateLeft(k, 15)
      k *= c2
      h ^= k
    }
    h ^= data.length
    h ^= h >>> 16
    h *= 0x85ebca6b
    h ^= h >>> 13
    h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  /** Iceberg's long hash: 8 bytes little-endian, seed 0. */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    murmur3x86_32(b, 0)
  }

  /** Iceberg's string hash: UTF-8 bytes, seed 0. */
  def hashString(s: String): Int = murmur3x86_32(s.getBytes(UTF_8), 0)

  def bucketLong(v: Long, n: Int): Int =
    (hashLong(v) & Int.MaxValue) % n

  def bucketString(s: String, n: Int): Int =
    (hashString(s) & Int.MaxValue) % n

  /** Codegen bridge: hash a UTF8String's bytes directly (its backing
    * bytes ARE the UTF-8 encoding — no String round-trip). */
  def bucketUtf8(s: org.apache.spark.unsafe.types.UTF8String, n: Int): Int =
    (murmur3x86_32(s.getBytes, 0) & Int.MaxValue) % n

  // ---- temporal / truncate transforms ------------------------------

  private val MicrosPerHour = 3600L * 1000000L
  private val MicrosPerDay = 24L * MicrosPerHour

  def dayFromMicros(micros: Long): Int = Math.floorDiv(micros, MicrosPerDay).toInt
  def hourFromMicros(micros: Long): Int = Math.floorDiv(micros, MicrosPerHour).toInt

  def monthFromMicros(micros: Long): Int = {
    val d = java.time.LocalDate.ofEpochDay(Math.floorDiv(micros, MicrosPerDay))
    (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
  }

  def monthFromEpochDay(day: Int): Int = {
    val d = java.time.LocalDate.ofEpochDay(day.toLong)
    (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
  }

  def yearFromMicros(micros: Long): Int =
    java.time.LocalDate.ofEpochDay(Math.floorDiv(micros, MicrosPerDay))
      .getYear - 1970

  def yearFromEpochDay(day: Int): Int =
    java.time.LocalDate.ofEpochDay(day.toLong).getYear - 1970

  def truncateLong(v: Long, w: Long): Long = v - Math.floorMod(v, w)
  def truncateString(s: String, w: Int): String =
    if (s.codePointCount(0, s.length) <= w) s
    else s.substring(0, s.offsetByCodePoints(0, w))

  // ---- transform spec model ----------------------------------------

  /** One partition-spec field: `name` is the tuple field (e.g. `ts_day`),
    * `transform` the spec string (`identity`, `day`, `hour`, `month`,
    * `bucket[16]`, `truncate[4]`), `sourceName`/`sourceType` the schema
    * column it derives from. */
  final case class SpecField(name: String, transform: String,
                             sourceName: String, sourceType: DataType)

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncateRe = """truncate\[(\d+)\]""".r

  /** Is this transform one [[apply]]/[[keeps]] understands? */
  def supported(transform: String, sourceType: DataType): Boolean =
    transform match {
      case "identity" => true
      case "day" | "days" => sourceType == TimestampType || sourceType == DateType
      case "hour" | "hours" => sourceType == TimestampType
      case "month" | "months" => sourceType == TimestampType || sourceType == DateType
      case "year" | "years" => sourceType == TimestampType || sourceType == DateType
      case BucketRe(_) => sourceType == LongType || sourceType == IntegerType ||
        sourceType == StringType || sourceType == DateType ||
        sourceType == TimestampType
      case TruncateRe(_) => sourceType == LongType || sourceType == IntegerType ||
        sourceType == StringType
      case _ => false
    }

  /** Apply `transform` to a CATALYST-INTERNAL source value (micros for
    * timestamps, epoch days for dates, UTF8String for strings). Null in,
    * null out. */
  def apply(transform: String, sourceType: DataType, value: Any): Any = {
    if (value == null) return null
    def asLong: Long = value match {
      case l: Long => l
      case i: Int => i.toLong
      case other => throw new IllegalArgumentException(
        s"unexpected value $other for $sourceType")
    }
    def asString: String = value.toString
    transform match {
      case "identity" => value
      case "day" | "days" =>
        if (sourceType == DateType) asLong.toInt else dayFromMicros(asLong)
      case "hour" | "hours" => hourFromMicros(asLong)
      case "month" | "months" =>
        if (sourceType == DateType) monthFromEpochDay(asLong.toInt)
        else monthFromMicros(asLong)
      case "year" | "years" =>
        if (sourceType == DateType) yearFromEpochDay(asLong.toInt)
        else yearFromMicros(asLong)
      case BucketRe(n) =>
        if (sourceType == StringType) bucketString(asString, n.toInt)
        else bucketLong(asLong, n.toInt)
      case TruncateRe(w) =>
        if (sourceType == StringType) truncateString(asString, w.toInt)
        else if (sourceType == IntegerType)
          truncateLong(asLong, w.toLong).toInt
        else truncateLong(asLong, w.toLong)
      case other => throw new IllegalArgumentException(
        s"unsupported transform $other")
    }
  }

  /** Is `transform` order-preserving on its source (so range predicates
    * project through it)? */
  def monotone(transform: String): Boolean = transform match {
    case "identity" | "day" | "days" | "hour" | "hours" | "month" |
         "months" | "year" | "years" => true
    case TruncateRe(_) => true
    case _ => false
  }

  /** INCLUSIVE projection: can a file whose transformed partition value
    * is `partValue` hold rows satisfying `op(source, literal)`? `op` is
    * one of `=`, `<`, `<=`, `>`, `>=`, `in` (literal then a Seq).
    * Conservative: null partition values and unprojectable shapes keep
    * the file. */
  def keeps(spec: SpecField, partValue: Any, op: String,
            literal: Any): Boolean = {
    if (partValue == null) return true
    // NOTE: no string range projection — Iceberg orders strings by
    // UTF-8 bytes, JVM strings by UTF-16 code units; they disagree on
    // supplementary characters, and a wrong order would WRONGLY prune.
    // `rangeComparable` gates range ops to integer-valued transforms.
    def cmp(a: Any, b: Any): Int = (a, b) match {
      case (x: Int, y: Int) => java.lang.Integer.compare(x, y)
      case (x: Long, y: Long) => java.lang.Long.compare(x, y)
      case (x: Int, y: Long) => java.lang.Long.compare(x.toLong, y)
      case (x: Long, y: Int) => java.lang.Long.compare(x, y.toLong)
      case _ => 0 // incomparable: never prune
    }
    def rangeComparable(v: Any): Boolean =
      v.isInstanceOf[Int] || v.isInstanceOf[Long]
    def norm(v: Any): Any = v match {
      case u: org.apache.spark.unsafe.types.UTF8String => u.toString
      case other => other
    }
    val pv = norm(partValue)
    op match {
      case "in" =>
        val lits = literal.asInstanceOf[Seq[Any]]
        lits.exists(l =>
          l == null || pv == norm(apply(spec.transform, spec.sourceType, l)))
      case "=" =>
        if (literal == null) true
        else pv == norm(apply(spec.transform, spec.sourceType, literal))
      case _ if !monotone(spec.transform) => true
      case _ if literal == null => true
      case "<" | "<=" =>
        // source < T ⇒ t(source) <= t(T): keep iff pv <= t(T)
        val t = norm(apply(spec.transform, spec.sourceType, literal))
        !rangeComparable(pv) || !rangeComparable(t) || cmp(pv, t) <= 0
      case ">" | ">=" =>
        val t = norm(apply(spec.transform, spec.sourceType, literal))
        !rangeComparable(pv) || !rangeComparable(t) || cmp(pv, t) >= 0
      case _ => true
    }
  }
}
