package graft.sources

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** PER-FILE column min/max/null-count statistics for the bucketed
  * lake's manifest — DATA SKIPPING on arbitrary atomic columns, the
  * third pruning axis next to bucket (key) and partition pruning: a
  * range/equality predicate on ANY tracked column drops every file
  * whose `[lo, hi]` window provably holds no match, before a single
  * footer is opened. At 100 TB this is the difference between "open
  * 10⁶ footers to row-group-prune" and "read 10³ files the manifest
  * says can match" (Delta's data-skipping design; reference layouts
  * carry the same idea as Hudi's column-stats index).
  *
  * Values live in ONE canonical comparable space per column type —
  * `Long` (integral + date epoch-day), `Double` (float widened exactly
  * like [[PartPruning.canonical]]), `String`, `Boolean` — shared by
  * the three producers (parquet footers, the V2 writer's inline
  * tracker, compaction's stat merge) and the one consumer
  * ([[FileStats.keep]]). STRICTNESS RULES (a wrong skip silently drops
  * rows, so every doubt resolves to "keep the file"):
  *
  *  - a filter literal whose runtime class does not exactly match the
  *    column type does not prune (same contract as [[PartPruning]]);
  *  - float/double columns drop their stats if ANY value is NaN (NaN
  *    breaks window ordering);
  *  - string stats are kept only for pure-ASCII values ≤ 96 chars —
  *    parquet footer min/max order BYTES while the evaluation orders
  *    `String.compareTo`, and the two agree exactly on ASCII;
  *  - an all-null column keeps an entry with no window (`lo`/`hi`
  *    absent) — equality/range predicates then prune the file, and
  *    `IS NULL` keeps it;
  *  - any column a producer cannot track simply has no entry: no
  *    entry, no pruning. */
object FileStats {

  /** One column's per-file window: `lo`/`hi` in canonical space
    * (absent = the file holds no non-null value), `nulls` (absent =
    * unknown), and `exact` — true iff the window edges are ATTAINED
    * values a writer actually saw ([[Tracker]]); footer-derived
    * windows stay false (a foreign parquet file's binary stats may be
    * truncated: valid BOUNDS for skipping, not values — the
    * MIN/MAX-aggregate pushdown's exactness gate for strings). */
  final case class ColStat(lo: Option[Any], hi: Option[Any],
                           nulls: Option[Long], exact: Boolean = false)

  /** The canonical kind a Spark type's stats live in — `None` =
    * untrackable type (nested, decimal, timestamp, binary, …). */
  private[sources] def trackable(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | ShortType | ByteType | DateType |
         FloatType | DoubleType | BooleanType | StringType => true
    case _ => false
  }

  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: Long, y: Long) => Some(java.lang.Long.compare(x, y))
    case (x: Double, y: Double) => Some(java.lang.Double.compare(x, y))
    case (x: String, y: String) => Some(x.compareTo(y))
    case (x: Boolean, y: Boolean) => Some(java.lang.Boolean.compare(x, y))
    case _ => None
  }

  private val MaxStringStat = 96

  /** A string value's stats admissibility: ASCII-only (byte order ==
    * String.compareTo order) and bounded length. */
  private def statString(s: String): Option[String] =
    if (s.length <= MaxStringStat && s.forall(_ < 0x80)) Some(s) else None

  // ---------------------------------------------------------------- JSON

  private def mapper = DocPushdown.jsonMapper

  /** `{"col":{"lo":..,"hi":..,"n":nulls}}` — one line, no raw tabs
    * (Jackson escapes control characters), so it rides the manifest's
    * tab-separated entry line as the optional 5th field. */
  def encode(stats: Map[String, ColStat]): Option[String] = {
    if (stats.isEmpty) return None
    val root = mapper.createObjectNode()
    stats.toSeq.sortBy(_._1).foreach { case (c, st) =>
      val node = root.putObject(c)
      def put(key: String, v: Any): Unit = v match {
        case l: Long => node.put(key, l): Unit
        case d: Double => node.put(key, d): Unit
        case s: String => node.put(key, s): Unit
        case b: Boolean => node.put(key, b): Unit
        case other => throw new IllegalStateException(
          s"non-canonical stat value $other (${other.getClass})")
      }
      st.lo.foreach(put("lo", _))
      st.hi.foreach(put("hi", _))
      st.nulls.foreach(n => node.put("n", n): Unit)
      if (st.exact) node.put("x", true): Unit
    }
    Some(mapper.writeValueAsString(root))
  }

  /** Decode against the TABLE schema — the column's type decides which
    * canonical kind the JSON numbers restore to. Unknown columns and
    * untrackable types are dropped (schema may have evolved). */
  def decode(json: String, schema: StructType): Map[String, ColStat] = {
    import scala.jdk.CollectionConverters._
    val types = schema.fields.map(f => f.name -> f.dataType).toMap
    val root = DocPushdown.parseJson(json)
    root.fields().asScala.flatMap { e =>
      types.get(e.getKey).filter(trackable).map { dt =>
        val node = e.getValue
        def canon(key: String): Option[Any] = Option(node.get(key)).map { v =>
          dt match {
            case IntegerType | LongType | ShortType | ByteType | DateType =>
              v.asLong()
            case FloatType | DoubleType => v.asDouble()
            case StringType => v.asText()
            case BooleanType => v.asBoolean()
            case other => throw new IllegalStateException(
              s"untrackable type survived the filter: $other")
          }
        }
        e.getKey -> ColStat(canon("lo"), canon("hi"),
          Option(node.get("n")).map(_.asLong()),
          Option(node.get("x")).exists(_.asBoolean()))
      }
    }.toMap
  }

  // ------------------------------------------------------- footer extract

  /** Stats from an ALREADY-OPEN parquet footer (the manifest sweep
    * opens footers for record counts anyway — the stats ride the same
    * read): per tracked column, min/max/nulls aggregated across row
    * groups; any row group with absent/unusable statistics drops the
    * whole column. */
  /** `trusted`: the caller just WROTE these files through Spark's own
    * parquet writer — row-group binary stats are then untruncated
    * values (parquet-mr omits rather than truncates by default, and
    * [[statString]] caps windows at 96 ASCII chars anyway), so the
    * windows are EXACT and string MIN/MAX may answer from them.
    * Adopted/legacy files keep `false`: their producer is unknown. */
  def fromFooter(footer: org.apache.parquet.hadoop.metadata.ParquetMetadata,
                 schema: StructType,
                 trusted: Boolean = false): Map[String, ColStat] = {
    import scala.jdk.CollectionConverters._
    val wanted = schema.fields.filter(f => trackable(f.dataType))
      .map(f => f.name -> f.dataType).toMap
    if (wanted.isEmpty) return Map.empty
    val blocks = footer.getBlocks.asScala.toSeq
    val perCol = scala.collection.mutable.Map[String, ColStat]()
    val poisoned = scala.collection.mutable.Set[String]()
    blocks.foreach { block =>
      block.getColumns.asScala.foreach { chunk =>
        val pathArr = chunk.getPath.toArray
        if (pathArr.length == 1 && wanted.contains(pathArr(0)) &&
            !poisoned.contains(pathArr(0))) {
          val name = pathArr(0)
          val dt = wanted(name)
          val st = chunk.getStatistics
          val usable = st != null && !st.isEmpty
          if (!usable) { poisoned += name; perCol.remove(name): Unit }
          else {
            val nulls =
              if (st.isNumNullsSet) Some(st.getNumNulls) else None
            val window: Option[Option[(Any, Any)]] =
              if (!st.hasNonNullValue) {
                // no non-null value in this row group: an all-null
                // chunk contributes no window — but only when the null
                // count CONFIRMS it (otherwise stats were dropped)
                if (nulls.contains(block.getRowCount)) Some(None)
                else None // unconfirmed: poison
              } else canonFooterValue(
                  st.genericGetMin.asInstanceOf[AnyRef], dt)
                .zip(canonFooterValue(
                  st.genericGetMax.asInstanceOf[AnyRef], dt))
                .map(w => Some(w))
            window match {
              case None => poisoned += name; perCol.remove(name): Unit
              case Some(w) =>
                val prev = perCol.get(name)
                val merged = mergeOne(
                  prev.getOrElse(ColStat(None, None, Some(0L),
                    exact = trusted)),
                  ColStat(w.map(_._1), w.map(_._2), nulls,
                    exact = trusted))
                merged match {
                  case Some(m) => perCol(name) = m
                  case None => poisoned += name; perCol.remove(name): Unit
                }
            }
          }
        }
      }
    }
    perCol.toMap
  }

  /** Parquet footer min/max object → canonical; `None` = cannot use
    * (type surprise, NaN, non-ASCII/oversized string). */
  private def canonFooterValue(v: AnyRef, dt: DataType): Option[Any] =
    (v, dt) match {
      case (i: java.lang.Integer,
            IntegerType | ShortType | ByteType | DateType) =>
        Some(i.longValue)
      case (l: java.lang.Long, LongType) => Some(l.longValue)
      case (f: java.lang.Float, FloatType) =>
        if (f.isNaN) None else Some(f.doubleValue)
      case (d: java.lang.Double, DoubleType) =>
        if (d.isNaN) None else Some(d.doubleValue)
      case (b: java.lang.Boolean, BooleanType) => Some(b.booleanValue)
      case (b: org.apache.parquet.io.api.Binary, StringType) =>
        statString(b.toStringUsingUTF8)
      case _ => None
    }

  // ------------------------------------------------------- writer tracker

  /** Inline tracker for the V2 writer: sees every row it writes anyway,
    * so the stats ride the commit message with ZERO extra IO (the
    * append commit stays read-free). One tracker per OUTPUT FILE. */
  final class Tracker(fields: Array[(Int, String, DataType)]) {
    private val lo = new Array[Any](fields.length)
    private val hi = new Array[Any](fields.length)
    private val nulls = new Array[Long](fields.length)
    private val dead = new Array[Boolean](fields.length)

    def update(row: org.apache.spark.sql.catalyst.InternalRow): Unit = {
      var i = 0
      while (i < fields.length) {
        if (!dead(i)) {
          val (idx, _, dt) = fields(i)
          if (row.isNullAt(idx)) nulls(i) += 1
          else canonCatalyst(row.get(idx, dt), dt) match {
            case None => dead(i) = true
            case Some(v) =>
              if (lo(i) == null || cmp(v, lo(i)).exists(_ < 0)) lo(i) = v
              if (hi(i) == null || cmp(v, hi(i)).exists(_ > 0)) hi(i) = v
          }
        }
        i += 1
      }
    }

    def result(): Option[String] = encode(
      fields.indices.filterNot(dead).map { i =>
        // exact: the writer SAW every value — window edges are attained
        fields(i)._2 -> ColStat(Option(lo(i)), Option(hi(i)),
          Some(nulls(i)), exact = true)
      }.toMap)
  }

  /** The tracked (ordinal, name, type) triple per trackable column —
    * built once per write. */
  def trackerFields(schema: StructType): Array[(Int, String, DataType)] =
    schema.fields.zipWithIndex.collect {
      case (f, i) if trackable(f.dataType) => (i, f.name, f.dataType)
    }

  /** Catalyst value → canonical; `None` poisons the column for this
    * file (NaN, oversized/non-ASCII string). */
  private def canonCatalyst(v: Any, dt: DataType): Option[Any] =
    (v, dt) match {
      case (i: Int, IntegerType | DateType) => Some(i.toLong)
      case (l: Long, LongType) => Some(l)
      case (s: Short, ShortType) => Some(s.toLong)
      case (b: Byte, ByteType) => Some(b.toLong)
      case (f: Float, FloatType) =>
        if (f.isNaN) None else Some(f.toDouble)
      case (d: Double, DoubleType) =>
        if (d.isNaN) None else Some(d)
      case (b: Boolean, BooleanType) => Some(b)
      case (s: org.apache.spark.unsafe.types.UTF8String, StringType) =>
        statString(s.toString)
      case _ => None
    }

  // --------------------------------------------------------------- merge

  /** Merge two files' windows for one column (compaction preserves
    * rows, so merged stats stay EXACT with zero reads) — `None` when
    * null counts are unmergeable (never happens for our producers, but
    * a foreign manifest could omit them). */
  private def mergeOne(a: ColStat, b: ColStat): Option[ColStat] = {
    // Some(merged window edge) — or None for incomparable canonical
    // kinds (a foreign/corrupt manifest): the caller drops the column
    def pick(x: Option[Any], y: Option[Any], want: Int)
        : Option[Option[Any]] = (x, y) match {
      case (Some(p), Some(q)) =>
        cmp(p, q).map(c => Some(if (Integer.signum(c) == want) p else q))
      case (p, q) => Some(p.orElse(q))
    }
    val n = (a.nulls, b.nulls) match {
      case (Some(x), Some(y)) => Some(x + y)
      case _ => None
    }
    for { lo <- pick(a.lo, b.lo, -1); hi <- pick(a.hi, b.hi, 1) }
      yield ColStat(lo, hi, n, a.exact && b.exact)
  }

  /** Compaction's stat merge: the folded file's stats from its inputs'
    * — a column survives only if EVERY input tracked it (a missing
    * input window could hide values outside the merged window). */
  def merge(inputs: Seq[Option[String]], schema: StructType)
      : Option[String] = {
    if (inputs.isEmpty || inputs.exists(_.isEmpty)) return None
    val decoded = inputs.map(s => decode(s.get, schema))
    val shared = decoded.map(_.keySet).reduce(_ intersect _)
    encode(shared.flatMap { c =>
      decoded.map(_(c))
        .foldLeft(Option(ColStat(None, None, Some(0L), exact = true))) {
          case (Some(acc), st) => mergeOne(acc, st)
          case (None, _) => None
        }.map(c -> _)
    }.toMap)
  }

  // ---------------------------------------------------------- evaluation

  /** Whether the file can hold a row matching `f` — `Some(false)` =
    * provably not (SKIP the file), anything undecidable = `None`
    * (keep; every filter stays residual above the scan, so keeping is
    * always correct). `rows` is the file's record count (for
    * IS NOT NULL against the null count). */
  def keep(statsJson: Option[String], rows: Long, schema: StructType,
           f: Filter): Option[Boolean] = {
    val stats = statsJson.map(decode(_, schema)).getOrElse(Map.empty)
    if (stats.isEmpty) return None
    val types = schema.fields.map(fd => fd.name -> fd.dataType).toMap
    def lit(c: String, v: Any): Option[Any] =
      types.get(c).flatMap(PartPruning.canonical(v, _))
    def window(c: String, v: Any, ok: (Int, Int) => Boolean)
        : Option[Boolean] =
      stats.get(c).flatMap { st =>
        lit(c, v).flatMap { cv =>
          (st.lo, st.hi) match {
            case (Some(lo), Some(hi)) =>
              for { cl <- cmp(cv, lo); ch <- cmp(cv, hi) } yield ok(cl, ch)
            case (None, None) => Some(false) // all-null: no value matches
            case _ => None
          }
        }
      }
    def rec(f: Filter): Option[Boolean] = f match {
      // match iff lo <= v <= hi
      case EqualTo(c, v) => window(c, v, (cl, ch) => cl >= 0 && ch <= 0)
      case EqualNullSafe(c, null) => rec(IsNull(c))
      case EqualNullSafe(c, v) => rec(EqualTo(c, v))
      case In(c, vs) =>
        val nonNull = vs.filter(_ != null)
        if (nonNull.isEmpty) Some(false)
        else {
          val each = nonNull.map(v => rec(EqualTo(c, v)))
          if (each.exists(_.contains(true))) Some(true)
          else if (each.forall(_.contains(false))) Some(false)
          else None
        }
      // a match needs some x > v, i.e. hi > v  <=>  cmp(v, hi) < 0
      case GreaterThan(c, v) => window(c, v, (_, ch) => ch < 0)
      case GreaterThanOrEqual(c, v) => window(c, v, (_, ch) => ch <= 0)
      case LessThan(c, v) => window(c, v, (cl, _) => cl > 0)
      case LessThanOrEqual(c, v) => window(c, v, (cl, _) => cl >= 0)
      case IsNull(c) => stats.get(c).flatMap(_.nulls).map(_ > 0)
      case IsNotNull(c) => stats.get(c).flatMap(_.nulls).map(_ < rows)
      case And(a, b) => (rec(a), rec(b)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
      case Or(a, b) => (rec(a), rec(b)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
      case _ => None
    }
    rec(f)
  }
}
