package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text kernels for the dedup/text-analysis operators.
  *
  * The equivalent higher-order-function chains
  * (`array_sort(array_distinct(transform(sequence(...), ...)))`) are
  * interpreted per element — profiled at ~0.1 s/row cold on ~400-shingle
  * docs, which made the LSH pipelines minutes-slow at sf0.1. Each kernel
  * here is ONE expression node doing the whole row's work in tight JVM code,
  * codegen'd via a static-call bridge so whole-stage codegen stays intact.
  *
  * Semantics are bit-identical with the HOF formulation (and hence with the
  * DuckDB oracle SQL): single-space split keeping empty tokens, UTF-8
  * byte-order sort, first-occurrence-insensitive distinct.
  */
object TextKernels {

  /** byte-order comparator — Spark 4.1's `UTF8String.compareTo` probes
    * `System.getenv` per call through an assertion guard
    * (SparkEnvUtils.isTesting), which is catastrophic inside O(n log n)
    * sorts; `binaryCompare` is the guard-free path. */
  private val binaryOrder: java.util.Comparator[UTF8String] =
    (a: UTF8String, b: UTF8String) => a.binaryCompare(b)

  /** lowercased tokens, split on single space, empties kept —
    * byte-compatible with `split(lower(text), ' ')`. */
  def tokens(text: UTF8String): Array[UTF8String] = {
    val lower = text.toLowerCase
    val out = lower.split(UTF8String.fromString(" "), -1)
    out
  }

  /** sorted distinct tokens — `array_sort(array_distinct(split(lower(t),' ')))`. */
  def tokenSet(text: UTF8String): ArrayData = {
    val set = new java.util.TreeSet[UTF8String](binaryOrder)
    tokens(text).foreach(set.add)
    new GenericArrayData(set.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** sorted distinct word k-shingles joined by ' '; empty array below k
    * tokens (matches TextOps.shingles / the oracle's list_transform). */
  def shingleSet(text: UTF8String, k: Int): ArrayData = {
    val toks = tokens(text)
    if (toks.length < k) return new GenericArrayData(Array.empty[AnyRef])
    val set = new java.util.TreeSet[UTF8String](binaryOrder)
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i <= toks.length - k) {
      var sh = toks(i)
      var j = 1
      while (j < k) { sh = UTF8String.concat(sh, space, toks(i + j)); j += 1 }
      set.add(sh)
      i += 1
    }
    new GenericArrayData(set.toArray.asInstanceOf[Array[AnyRef]])
  }

  private def xxh64(s: UTF8String, seed: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(s, seed)

  /** One left-to-right non-overlapping merge pass of rank (a, b) over a
    * token array — the exact token-level image of ONE
    * `replace(s, " a b ", " ab ")` over the space-joined string: after a
    * merge the match consumed the following separator space, so the
    * immediately following pair cannot merge in the same pass (the
    * `blocked` flag). */
  private def bpeMergePass(tokens: java.util.ArrayList[String], a: String,
                           b: String, ab: String): java.util.ArrayList[String] = {
    val n = tokens.size
    val out = new java.util.ArrayList[String](n)
    var i = 0
    var blocked = false
    while (i < n) {
      // a merge needs the separator space before tokens(i) (i >= 1: the
      // element before the first separator can never lead a match) and
      // after tokens(i+1) (i + 1 <= n - 2)
      if (!blocked && i >= 1 && i + 2 < n &&
          tokens.get(i) == a && tokens.get(i + 1) == b) {
        out.add(ab); i += 2; blocked = true
      } else {
        out.add(tokens.get(i)); i += 1; blocked = false
      }
    }
    out
  }

  /** Apply the full rank-ordered BPE merge cascade to a spaced symbol
    * string — SEMANTICS IDENTICAL BY CONSTRUCTION to the nested
    * `replace(replace(s, ' a b ', ' ab '), ' a b ', ' ab ')` per-rank
    * double-replace cascade (see [[graft.ops.TextOps.bpeTokenCount]]'s
    * fixpoint note), simulated at the token level so the string is split
    * and rebuilt ONCE instead of 2x|merges| times. Pinned equal to the
    * string cascade over the full fixture corpus in TextExpressionsSpec. */
  def bpeCascade(text: UTF8String, mergesA: Array[String],
                 mergesB: Array[String], mergesAb: Array[String]): UTF8String = {
    val s = text.toString
    var tokens = new java.util.ArrayList[String](java.util.Arrays.asList(
      s.split(" ", -1): _*))
    var r = 0
    while (r < mergesA.length) {
      tokens = bpeMergePass(tokens, mergesA(r), mergesB(r), mergesAb(r))
      tokens = bpeMergePass(tokens, mergesA(r), mergesB(r), mergesAb(r))
      r += 1
    }
    UTF8String.fromString(String.join(" ", tokens))
  }

  /** `regexp_replace(s, "(.)", "$1 ")` in one pass: every code point is
    * emitted followed by a space, EXCEPT the code points Java's regex
    * `.` does not match (line terminators LF, CR, U+0085, U+2028, U+2029),
    * which pass through unspaced — exactly the regex's output, minus the
    * per-character regex-engine invocation. */
  def charSpace(text: UTF8String): UTF8String = {
    val s = text.toString
    val sb = new java.lang.StringBuilder(s.length * 2)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      sb.appendCodePoint(cp)
      if (cp != '\n' && cp != '\r' && cp != 0x85 && cp != 0x2028 &&
        cp != 0x2029) sb.append(' ')
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  /** Per-script character counts in ONE pass: [latin, digit, cyrillic,
    * greek, arabic, cjk] — exactly the counts of
    * `length(regexp_replace(t, "[^<range>]", ""))` for the six BMP
    * ranges of [[graft.ops.TextOps.scriptProfile]] (each matching char
    * is one UTF-16 code unit; supplementary characters fall in no range
    * either way). Replaces six full regex passes + five string rebuilds
    * per document. */
  def scriptCounts(text: UTF8String): ArrayData = {
    val s = text.toString
    var latin = 0L; var digit = 0L; var cyr = 0L
    var greek = 0L; var arabic = 0L; var cjk = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) latin += 1
      else if (c >= '0' && c <= '9') digit += 1
      else if (c >= 0x0400 && c <= 0x04FF) cyr += 1
      else if (c >= 0x0370 && c <= 0x03FF) greek += 1
      else if (c >= 0x0600 && c <= 0x06FF) arabic += 1
      else if (c >= 0x4E00 && c <= 0x9FFF) cjk += 1
      i += 1
    }
    new GenericArrayData(Array[Long](latin, digit, cyr, greek, arabic, cjk))
  }

  /** 64-bit SimHash over the distinct token set (xxh64 per token, sign
    * accumulation per bit). */
  def simhash64(text: UTF8String): Long = {
    // dedupe only — no ordering needed, and hashing dodges the compareTo
    // getenv guard entirely
    val set = new java.util.HashSet[UTF8String]()
    tokens(text).foreach(set.add)
    val counts = new Array[Int](64)
    val it = set.iterator()
    while (it.hasNext) {
      val h = xxh64(it.next(), 42L)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  /** sorted distinct xxh64 hashes of the word k-shingles — the cheap
    * representation for pairwise set similarity: intersect cardinality over
    * sorted longs is a register-width merge scan (identical i/u counts as
    * the string sets barring 2^-64 hash collisions). */
  def shingleHashes(text: UTF8String, k: Int): ArrayData = {
    val toks = tokens(text)
    if (toks.length < k) return new GenericArrayData(Array.empty[Long])
    val n = toks.length - k + 1
    val hs = new Array[Long](n)
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i < n) {
      var sh = toks(i)
      var j = 1
      while (j < k) { sh = UTF8String.concat(sh, space, toks(i + j)); j += 1 }
      hs(i) = xxh64(sh, 0L)
      i += 1
    }
    java.util.Arrays.sort(hs)
    // dedupe in place
    var w = 0
    var r = 0
    while (r < n) {
      if (w == 0 || hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w))
  }

  /** |a ∩ b| for two sorted long arrays — merge scan. */
  def sortedIntersectSizeLong(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** LSH band hashes from a hashed-shingle array (see [[shingleHashes]]):
    * numBands × rowsPerBand seeded min-hashes via hashLong re-mixing. */
  def minhashBandsFromHashes(hashes: ArrayData, numBands: Int, rowsPerBand: Int): ArrayData = {
    val n = hashes.numElements()
    val numHashes = numBands * rowsPerBand
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val sh = hashes.getLong(i)
      var s = 0
      while (s < numHashes) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(sh, s.toLong)
        if (h < mins(s)) mins(s) = h
        s += 1
      }
      i += 1
    }
    val bandsOut = new Array[Any](numBands)
    var b = 0
    while (b < numBands) {
      var acc = b.toLong
      var r = 0
      while (r < rowsPerBand) {
        acc = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(
          mins(b * rowsPerBand + r), acc)
        r += 1
      }
      bandsOut(b) = acc
      b += 1
    }
    new GenericArrayData(bandsOut)
  }

  /** LSH band hashes from a shingle array: numBands × rowsPerBand seeded
    * min-hashes, each band folded to one long. One pass per seed over the
    * shingles; all in-register. */
  def minhashBands(shingles: ArrayData, numBands: Int, rowsPerBand: Int): ArrayData = {
    val n = shingles.numElements()
    val numHashes = numBands * rowsPerBand
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val sh = shingles.getUTF8String(i)
      var s = 0
      while (s < numHashes) {
        val h = xxh64(sh, s.toLong)
        if (h < mins(s)) mins(s) = h
        s += 1
      }
      i += 1
    }
    val bandsOut = new Array[Any](numBands)
    var b = 0
    while (b < numBands) {
      var acc = b.toLong
      var r = 0
      while (r < rowsPerBand) {
        acc = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(
          mins(b * rowsPerBand + r), acc)
        r += 1
      }
      bandsOut(b) = acc
      b += 1
    }
    new GenericArrayData(bandsOut)
  }

  /** Mojibake SYNTHESIS: the string's UTF-8 bytes re-read as Latin-1 —
    * the classic double-encoding corruption ("é" → "Ã©"). Total: every
    * byte value is a Latin-1 codepoint, so this never fails. */
  def mojibake(text: UTF8String): UTF8String = {
    val bytes = text.getBytes
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.append((bytes(i) & 0xFF).toChar); i += 1 }
    UTF8String.fromString(sb.toString)
  }

  /** Unicode normalization (java.text.Normalizer): NFC for canonical
    * composition (the pre-dedup canonical form — "café" composed and
    * "café" decomposed must hash identically), NFD/NFKC/NFKD for
    * the other forms. ASCII fast path: `Normalizer.isNormalized` is a
    * cheap scan that skips the rebuild for already-normal text (the
    * overwhelming majority of a real corpus). */
  def unicodeNormalize(text: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, form)) text
    else UTF8String.fromString(java.text.Normalizer.normalize(s, form))
  }

  /** ftfy-style mojibake REPAIR (one round): iff (1) every codepoint
    * fits Latin-1 — so the string CAN be a misdecoded byte stream,
    * (2) those codepoints-as-bytes form valid UTF-8, and (3) the
    * reinterpretation strictly SHRINKS the string (real multi-byte
    * sequences collapsed — an all-ASCII string is untouched by
    * construction), return the reinterpretation; otherwise the input
    * unchanged. Already-correct text ("café") fails (2): the 0xE9 byte
    * is a lone continuation byte at the end of its sequence context,
    * never valid UTF-8 — the repair can't damage clean text. */
  def fixMojibake(text: UTF8String): UTF8String = {
    val s = text.toString
    val n = s.length
    val bytes = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c > 0xFF) return text // not Latin-1-representable: clean text
      bytes(i) = c.toByte
      i += 1
    }
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder() // strict
    try {
      val out = dec.decode(java.nio.ByteBuffer.wrap(bytes))
      if (out.length < n) UTF8String.fromString(out.toString) else text
    } catch {
      case _: java.nio.charset.CharacterCodingException => text
    }
  }
}

object SetKernels {
  /** |a ∩ b| for two SORTED distinct string arrays — single merge scan,
    * O(n+m), no per-eval hash-set allocation (array_intersect builds one). */
  def sortedIntersectSize(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val cmp = a.getUTF8String(i).binaryCompare(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }
}

/** sorted_intersect_size(a, b) — intersection cardinality of two sorted
  * distinct string arrays (the shape token_set/shingle_set emit). */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "sorted_intersect_size"
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(_: StringType, _), ArrayType(_: StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> arguments, got $other")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    SetKernels.sortedIntersectSize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SetKernels.sortedIntersectSize($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Static bridge for [[BloomMightContain]]'s codegen (same shape as
  * [[TextKernels]]): the probe math lives in
  * [[graft.sink.BloomIndex.mightContain]]. */
object BloomKernels {
  def mightContain(bloom: Array[Byte], key: UTF8String,
                   m: Int, k: Int): Boolean =
    graft.sink.BloomIndex.mightContain(bloom, key.toString, m, k)
}

/** bloom_might_contain(bloom, key, m_bits, k_hashes) — Kirsch-
  * Mitzenmacher membership probe of a per-file key bloom
  * ([[graft.sink.BloomIndex]]) as a NATIVE codegen'd expression: the
  * index ⋈ keys join's probe stays inside whole-stage codegen instead
  * of boxing through a Scala udf. */
case class BloomMightContain(first: Expression, second: Expression,
                             third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {
  override def prettyName: String = "bloom_might_contain"
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (BinaryType, _: StringType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, string, int, int), got $other")
    }
  override def nullSafeEval(b: Any, s: Any, m: Any, k: Any): Any =
    BloomKernels.mightContain(b.asInstanceOf[Array[Byte]],
      s.asInstanceOf[UTF8String], m.asInstanceOf[Int], k.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, s, m, k) =>
      s"graft.functions.BloomKernels.mightContain($b, $s, $m, $k)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

abstract class StringKernelExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }
}

/** token_set(text) — sorted distinct lowercase whitespace tokens. */
case class TokenSet(child: Expression) extends StringKernelExpression {
  override def prettyName: String = "token_set"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    TextKernels.tokenSet(t.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.tokenSet($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** shingle_set(text, k) — sorted distinct word k-shingles. */
case class ShingleSet(child: Expression, k: Int) extends StringKernelExpression {
  override def prettyName: String = "shingle_set"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    TextKernels.shingleSet(t.asInstanceOf[UTF8String], k)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.shingleSet($c, $k)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** mojibake(text) — the string's UTF-8 bytes re-read as Latin-1 (the
  * deterministic double-encoding corruption, for fixtures/round-trips). */
case class Mojibake(child: Expression) extends StringKernelExpression {
  override def prettyName: String = "mojibake"
  override def dataType: DataType = StringType
  override def nullSafeEval(t: Any): Any =
    TextKernels.mojibake(t.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.mojibake($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** fix_mojibake(text) — one round of ftfy-style double-encoding repair:
  * Latin-1-representable strings whose codepoints-as-bytes are valid
  * (and strictly shrinking) UTF-8 are reinterpreted; everything else —
  * ASCII, clean accented text, genuine Latin-1 — passes untouched. */
case class FixMojibake(child: Expression) extends StringKernelExpression {
  override def prettyName: String = "fix_mojibake"
  override def dataType: DataType = StringType
  override def nullSafeEval(t: Any): Any =
    TextKernels.fixMojibake(t.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.fixMojibake($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** unicode_normalize(text, 'NFC'|'NFD'|'NFKC'|'NFKD') — java.text
  * normalization with an isNormalized fast path. */
case class UnicodeNormalize(child: Expression, form: String)
    extends StringKernelExpression {
  private val jform = java.text.Normalizer.Form.valueOf(form.toUpperCase)
  override def prettyName: String = "unicode_normalize"
  override def dataType: DataType = StringType
  override def nullSafeEval(t: Any): Any =
    TextKernels.unicodeNormalize(t.asInstanceOf[UTF8String], jform)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.unicodeNormalize(" +
      s"$c, java.text.Normalizer.Form.${jform.name})")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** shingle_hashes(text, k) — sorted distinct xxh64 word-k-shingle hashes. */
case class ShingleHashes(child: Expression, k: Int) extends StringKernelExpression {
  override def prettyName: String = "shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    TextKernels.shingleHashes(t.asInstanceOf[UTF8String], k)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.shingleHashes($c, $k)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** sorted_intersect_size_long(a, b) — |a ∩ b| for sorted long arrays. */
case class SortedIntersectSizeLong(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "sorted_intersect_size_long"
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got $other")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.sortedIntersectSizeLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextKernels.sortedIntersectSizeLong($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** minhash_bands_h(hashes, numBands, rowsPerBand) — LSH bands from hashed
  * shingles. */
case class MinHashBandsFromHashes(child: Expression, numBands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  override def prettyName: String = "minhash_bands_h"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }
  override def nullSafeEval(a: Any): Any =
    TextKernels.minhashBandsFromHashes(a.asInstanceOf[ArrayData], numBands, rowsPerBand)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.minhashBandsFromHashes($c, $numBands, $rowsPerBand)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** simhash64(text) — 64-bit SimHash fingerprint of the token set. */
case class SimHash64(child: Expression) extends StringKernelExpression {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType
  override def nullSafeEval(t: Any): Any =
    TextKernels.simhash64(t.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** bpe_cascade(text, 'a b|c d|...') — the full rank-ordered BPE merge
  * cascade in one kernel call (see [[TextKernels.bpeCascade]]); `spec` is
  * the rank-ordered merge table, one "a b" pair per '|' segment. */
case class BpeCascade(child: Expression, spec: String)
    extends StringKernelExpression {
  private lazy val (ma, mb, mab) = {
    val pairs = spec.split('|').map { seg =>
      val i = seg.indexOf(' ')
      (seg.substring(0, i), seg.substring(i + 1))
    }
    (pairs.map(_._1), pairs.map(_._2), pairs.map(p => p._1 + p._2))
  }
  override def prettyName: String = "bpe_cascade"
  override def dataType: DataType = StringType
  override def nullSafeEval(t: Any): Any =
    TextKernels.bpeCascade(t.asInstanceOf[UTF8String], ma, mb, mab)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val maRef = ctx.addReferenceObj("bpeMa", ma, "java.lang.String[]")
    val mbRef = ctx.addReferenceObj("bpeMb", mb, "java.lang.String[]")
    val mabRef = ctx.addReferenceObj("bpeMab", mab, "java.lang.String[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.bpeCascade($c, $maRef, $mbRef, $mabRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** char_space(text) — `regexp_replace(text, "(.)", "$1 ")` as one kernel
  * pass (see [[TextKernels.charSpace]]). */
case class CharSpace(child: Expression) extends StringKernelExpression {
  override def prettyName: String = "char_space"
  override def dataType: DataType = StringType
  override def nullSafeEval(t: Any): Any =
    TextKernels.charSpace(t.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.charSpace($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** script_counts(text) — [latin, digit, cyrillic, greek, arabic, cjk]
  * character counts in one pass (see [[TextKernels.scriptCounts]]). */
case class ScriptCounts(child: Expression) extends StringKernelExpression {
  override def prettyName: String = "script_counts"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    TextKernels.scriptCounts(t.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.scriptCounts($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** minhash_bands(shingles, numBands, rowsPerBand) — LSH band hash array. */
case class MinHashBands(child: Expression, numBands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  override def prettyName: String = "minhash_bands"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
  override def nullSafeEval(a: Any): Any =
    TextKernels.minhashBands(a.asInstanceOf[ArrayData], numBands, rowsPerBand)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.minhashBands($c, $numBands, $rowsPerBand)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TextFunctions {
  import org.apache.spark.sql.{Column, SparkSession}
  import org.apache.spark.sql.functions.{call_function, lit}

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("token_set"),
      new ExpressionInfo(classOf[TokenSet].getName, "token_set"),
      (cs: Seq[Expression]) => TokenSet(cs.head)),
    (FunctionIdentifier("shingle_set"),
      new ExpressionInfo(classOf[ShingleSet].getName, "shingle_set"),
      (cs: Seq[Expression]) => ShingleSet(cs.head,
        cs(1).eval().asInstanceOf[Number].intValue())),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (cs: Seq[Expression]) => SimHash64(cs.head)),
    (FunctionIdentifier("minhash_bands"),
      new ExpressionInfo(classOf[MinHashBands].getName, "minhash_bands"),
      (cs: Seq[Expression]) => MinHashBands(cs.head,
        cs(1).eval().asInstanceOf[Number].intValue(),
        cs(2).eval().asInstanceOf[Number].intValue())),
    (FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName, "sorted_intersect_size"),
      (cs: Seq[Expression]) => SortedIntersectSize(cs.head, cs(1))),
    (FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (cs: Seq[Expression]) => ShingleHashes(cs.head,
        cs(1).eval().asInstanceOf[Number].intValue())),
    (FunctionIdentifier("sorted_intersect_size_long"),
      new ExpressionInfo(classOf[SortedIntersectSizeLong].getName, "sorted_intersect_size_long"),
      (cs: Seq[Expression]) => SortedIntersectSizeLong(cs.head, cs(1))),
    (FunctionIdentifier("minhash_bands_h"),
      new ExpressionInfo(classOf[MinHashBandsFromHashes].getName, "minhash_bands_h"),
      (cs: Seq[Expression]) => MinHashBandsFromHashes(cs.head,
        cs(1).eval().asInstanceOf[Number].intValue(),
        cs(2).eval().asInstanceOf[Number].intValue())),
    (FunctionIdentifier("mojibake"),
      new ExpressionInfo(classOf[Mojibake].getName, "mojibake"),
      (cs: Seq[Expression]) => Mojibake(cs.head)),
    (FunctionIdentifier("fix_mojibake"),
      new ExpressionInfo(classOf[FixMojibake].getName, "fix_mojibake"),
      (cs: Seq[Expression]) => FixMojibake(cs.head)),
    (FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_normalize"),
      (cs: Seq[Expression]) => UnicodeNormalize(cs.head,
        cs(1).eval().toString)),
    (FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
      (cs: Seq[Expression]) => BloomMightContain(cs.head, cs(1), cs(2), cs(3))),
    (FunctionIdentifier("script_counts"),
      new ExpressionInfo(classOf[ScriptCounts].getName, "script_counts"),
      (cs: Seq[Expression]) => ScriptCounts(cs.head)),
    (FunctionIdentifier("bpe_cascade"),
      new ExpressionInfo(classOf[BpeCascade].getName, "bpe_cascade"),
      (cs: Seq[Expression]) => BpeCascade(cs.head, cs(1).eval().toString)),
    (FunctionIdentifier("char_space"),
      new ExpressionInfo(classOf[CharSpace].getName, "char_space"),
      (cs: Seq[Expression]) => CharSpace(cs.head)))

  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    val reg = spark.sessionState.functionRegistry
    registrations.foreach { case (ident, info, builder) =>
      if (!reg.functionExists(ident)) reg.registerFunction(ident, info, builder)
    }
  }

  def tokenSet(text: Column): Column = call_function("token_set", text)
  def shingleSet(text: Column, k: Int): Column =
    call_function("shingle_set", text, lit(k))
  def simhash64(text: Column): Column = call_function("simhash64", text)
  def minhashBands(shingles: Column, numBands: Int, rowsPerBand: Int): Column =
    call_function("minhash_bands", shingles, lit(numBands), lit(rowsPerBand))
  def sortedIntersectSize(a: Column, b: Column): Column =
    call_function("sorted_intersect_size", a, b)
  def shingleHashes(text: Column, k: Int): Column =
    call_function("shingle_hashes", text, lit(k))
  def sortedIntersectSizeLong(a: Column, b: Column): Column =
    call_function("sorted_intersect_size_long", a, b)
  def minhashBandsH(hashes: Column, numBands: Int, rowsPerBand: Int): Column =
    call_function("minhash_bands_h", hashes, lit(numBands), lit(rowsPerBand))
  def mojibake(text: Column): Column = call_function("mojibake", text)
  def fixMojibake(text: Column): Column = call_function("fix_mojibake", text)
  def unicodeNormalize(text: Column, form: String): Column =
    call_function("unicode_normalize", text, lit(form))
  def bloomMightContain(bloom: Column, key: Column,
                        m: Column, k: Column): Column =
    call_function("bloom_might_contain", bloom, key, m, k)
  def scriptCounts(text: Column): Column = call_function("script_counts", text)
  def bpeCascade(text: Column, merges: Seq[(String, String)]): Column =
    call_function("bpe_cascade", text,
      lit(merges.map { case (a, b) => s"$a $b" }.mkString("|")))
  def charSpace(text: Column): Column = call_function("char_space", text)
}
