package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.SparkException

/** Native Catalyst expressions for embedding math.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`) is
  * interpreted per element — measured ~50x slower than generated code on the
  * ANN queries. These expressions participate in whole-stage codegen: one
  * fused loop over the two float arrays, accumulating in double with
  * deterministic left-to-right order (same accumulation DuckDB's
  * list_cosine_similarity uses, so oracle results agree to the ulp).
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, " +
        s"got ${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
}

/** cosine_sim(a, b) = Σaᵢbᵢ / sqrt(Σaᵢ² · Σbᵢ²), one fused pass. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv; i += 1
    }
    dot / math.sqrt(na * nb)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (dot, na, nb, n, i) =
        (ctx.freshName("dot"), ctx.freshName("na"), ctx.freshName("nb"),
          ctx.freshName("n"), ctx.freshName("i"))
      s"""
        double $dot = 0.0, $na = 0.0, $nb = 0.0;
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        for (int $i = 0; $i < $n; $i++) {
          double xv = (double) $a.getFloat($i);
          double yv = (double) $b.getFloat($i);
          $dot += xv * yv; $na += xv * xv; $nb += yv * yv;
        }
        ${ev.value} = $dot / java.lang.Math.sqrt($na * $nb);
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** pq_encode(vec, m, codebook) — per-sub-space argmax-dot codeword ids
  * (array<bigint> of length m). The codebook rides the expression as a
  * reference object (ksub full-dim sampled vectors). */
case class PqEncodeAll(child: Expression, m: Int, cb: Array[Array[Float]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "pq_encode"
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"$prettyName requires array<float>, got ${other.simpleString}")
    }
  override def nullSafeEval(v: Any): Any =
    VectorKernels.pqEncodeAll(v.asInstanceOf[ArrayData], cb, m)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "float[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorKernels.pqEncodeAll($c, $cbRef, $m)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** dot_f32(a, b) = Σaᵢbᵢ in double. */
case class DotProductF32(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "dot_f32"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (dot, n, i) = (ctx.freshName("dot"), ctx.freshName("n"), ctx.freshName("i"))
      s"""
        double $dot = 0.0;
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        for (int $i = 0; $i < $n; $i++) {
          $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
        }
        ${ev.value} = $dot;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** srp_sig(vec, bits, seed) — signed-random-projection LSH signature:
  * bit b = sign(v · h_b) for pseudo-random hyperplanes h_b whose components
  * are derived deterministically from (seed, b, dim) via xxh64 → [-1, 1].
  * Cosine-similar vectors agree on most bits (P[bit match] = 1 − θ/π), so
  * Hamming-banding the signatures yields near-dup candidates without the
  * O(n²) pair scan. */
case class SrpSignature(child: Expression, bits: Int, seed: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(bits >= 1 && bits <= 64, "bits must be in [1, 64]")
  override def prettyName: String = "srp_sig"
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, got ${other.simpleString}")
    }
  override def nullSafeEval(a: Any): Any =
    VectorKernels.srpSignature(a.asInstanceOf[ArrayData], bits, seed)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorKernels.srpSignature($c, $bits, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** i8_quantize(vec) — symmetric int8 scalar quantization: qᵢ =
  * round(vᵢ / max|v| · 127), half away from zero (matching DuckDB/SQL
  * ROUND so the oracle can replay it). A zero vector quantizes to zeros.
  * 4x smaller than float32 — at 100 TB of embeddings that is the
  * difference between a corpus that fits executor memory and one that
  * doesn't; cosine is scale-invariant so ranking needs no scale column. */
case class I8Quantize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "i8_quantize"
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.ByteType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, got ${other.simpleString}")
    }
  override def nullSafeEval(a: Any): Any =
    VectorKernels.quantizeI8(a.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorKernels.quantizeI8($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** i8_cosine(qa, qb) — cosine over int8-quantized vectors with pure
  * integer accumulation (one fused loop, no float math until the final
  * division). Approximation error vs float cosine is bounded by the
  * quantization step; callers rerank a shortlist with exact cosine. */
case class I8Cosine(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "i8_cosine"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(org.apache.spark.sql.types.ByteType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<tinyint> arguments, " +
        s"got ${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosineI8(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorKernels.cosineI8($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** bq_pack(vec) — BINARY quantization: one SIGN BIT per dimension
  * (vᵢ ≥ 0 → 1), packed 64-per-long. 32× smaller than float32 — the
  * billion-scale shortlist representation (a 768-dim embedding becomes
  * 12 longs), scanned with XOR+popcount ([[BqHamming]]). Hamming over
  * sign bits approximates angle (P[bit differs] = θ/π, the SRP bound
  * at one bit per axis-aligned plane); callers rerank a shortlist with
  * exact cosine. */
case class BqPack(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "bq_pack"
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, got ${other.simpleString}")
    }
  override def nullSafeEval(a: Any): Any =
    VectorKernels.bqPack(a.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorKernels.bqPack($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** bq_hamming(a, b) — Hamming distance between [[BqPack]] signatures:
  * XOR + popcount per 64-bit word, no branching. */
case class BqHamming(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "bq_hamming"
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.bqHamming(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorKernels.bqHamming($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorKernels {

  /** PQ encode: for each of the `m` sub-spaces of `vec`, the codeword
    * index maximizing the [[DotProductF32]]-identical dot product
    * (double accumulation, ascending element order), ties broken toward
    * the SMALLEST code via Double total order — exactly
    * `max_by(code, struct(dp, -code))` over the codeword join this
    * replaces (a broadcast join + explode(m·ksub) + a Sort/Exchange/Sort
    * aggregate, now a single map-side expression). */
  def pqEncodeAll(vec: ArrayData, cb: Array[Array[Float]], m: Int):
      org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val dim = vec.numElements()
    val d = dim / m
    val out = new Array[Long](m)
    var s = 0
    while (s < m) {
      var best = 0L
      var bestDp = Double.NegativeInfinity
      var j = 0
      while (j < cb.length) {
        val cw = cb(j)
        var dp = 0.0
        var i = 0
        while (i < d) {
          dp += vec.getFloat(s * d + i).toDouble * cw(s * d + i).toDouble
          i += 1
        }
        // total-order compare (Double.compare), matching Spark's struct
        // ordering in the max_by this kernel replaces
        if (java.lang.Double.compare(dp, bestDp) > 0) { bestDp = dp; best = j }
        j += 1
      }
      out(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Sign bits packed 64-per-long (bit i of word i/64 = vᵢ ≥ 0). */
  def bqPack(vec: ArrayData): ArrayData = {
    val n = vec.numElements()
    val words = new Array[Long]((n + 63) >> 6)
    var i = 0
    while (i < n) {
      if (vec.getFloat(i) >= 0f) words(i >> 6) |= 1L << (i & 63)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(words)
  }

  /** XOR + popcount Hamming over packed sign bits. */
  def bqHamming(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var h = 0L; var i = 0
    while (i < n) {
      h += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    h
  }

  /** Symmetric int8 quantization, ROUND-half-away-from-zero. */
  def quantizeI8(vec: ArrayData): ArrayData = {
    val n = vec.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(vec.getFloat(i).toDouble)
      if (v > maxAbs) maxAbs = v
      i += 1
    }
    val out = new Array[Byte](n)
    if (maxAbs > 0.0) {
      i = 0
      while (i < n) {
        val x = vec.getFloat(i).toDouble / maxAbs * 127.0
        out(i) = (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toByte
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Cosine over int8 arrays: integer dot/norm accumulators. */
  def cosineI8(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0L; var na = 0L; var nb = 0L; var i = 0
    while (i < n) {
      val x = a.getByte(i).toLong
      val y = b.getByte(i).toLong
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0L || nb == 0L) 0.0
    else dot.toDouble / math.sqrt(na.toDouble * nb.toDouble)
  }

  /** hyperplane component in [-1, 1], deterministic in (seed, bit, dim). */
  private def plane(seed: Long, bit: Int, dim: Int): Double = {
    val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(
      (bit.toLong << 32) | (dim.toLong & 0xFFFFFFFFL), seed)
    h.toDouble / Long.MaxValue.toDouble
  }

  def srpSignature(vec: ArrayData, bits: Int, seed: Long): Long = {
    val dim = vec.numElements()
    var sig = 0L
    var b = 0
    while (b < bits) {
      var acc = 0.0
      var d = 0
      while (d < dim) {
        acc += vec.getFloat(d).toDouble * plane(seed, b, d)
        d += 1
      }
      if (acc > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

object VectorFunctions {

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        if (children.size != 2) throw new SparkException("cosine_sim takes 2 arguments")
        CosineSimilarity(children.head, children(1))
      }),
    (FunctionIdentifier("dot_f32"),
      new ExpressionInfo(classOf[DotProductF32].getName, "dot_f32"),
      (children: Seq[Expression]) => {
        if (children.size != 2) throw new SparkException("dot_f32 takes 2 arguments")
        DotProductF32(children.head, children(1))
      }),
    (FunctionIdentifier("srp_sig"),
      new ExpressionInfo(classOf[SrpSignature].getName, "srp_sig"),
      (children: Seq[Expression]) => SrpSignature(children.head,
        children(1).eval().asInstanceOf[Number].intValue(),
        children(2).eval().asInstanceOf[Number].longValue())),
    (FunctionIdentifier("i8_quantize"),
      new ExpressionInfo(classOf[I8Quantize].getName, "i8_quantize"),
      (children: Seq[Expression]) => {
        if (children.size != 1) throw new SparkException("i8_quantize takes 1 argument")
        I8Quantize(children.head)
      }),
    (FunctionIdentifier("i8_cosine"),
      new ExpressionInfo(classOf[I8Cosine].getName, "i8_cosine"),
      (children: Seq[Expression]) => {
        if (children.size != 2) throw new SparkException("i8_cosine takes 2 arguments")
        I8Cosine(children.head, children(1))
      }),
    (FunctionIdentifier("bq_pack"),
      new ExpressionInfo(classOf[BqPack].getName, "bq_pack"),
      (children: Seq[Expression]) => {
        if (children.size != 1) throw new SparkException("bq_pack takes 1 argument")
        BqPack(children.head)
      }),
    (FunctionIdentifier("bq_hamming"),
      new ExpressionInfo(classOf[BqHamming].getName, "bq_hamming"),
      (children: Seq[Expression]) => {
        if (children.size != 2) throw new SparkException("bq_hamming takes 2 arguments")
        BqHamming(children.head, children(1))
      }),
    (FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncodeAll].getName, "pq_encode"),
      (children: Seq[Expression]) => {
        if (children.size != 3) throw new SparkException("pq_encode takes 3 arguments")
        val m = children(1).eval().asInstanceOf[Number].intValue()
        val arr = children(2).eval().asInstanceOf[ArrayData]
        val cb = Array.tabulate(arr.numElements())(i =>
          arr.getArray(i).toFloatArray())
        PqEncodeAll(children.head, m, cb)
      }))

  /** Idempotent per-session registration (also available session-wide via
    * [[graft.GraftExtensions]] and `spark.sql.extensions`). */
  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    val reg = spark.sessionState.functionRegistry
    registrations.foreach { case (ident, info, builder) =>
      if (!reg.functionExists(ident)) reg.registerFunction(ident, info, builder)
    }
  }

  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
  def dotF32(a: Column, b: Column): Column = call_function("dot_f32", a, b)
  def srpSig(vec: Column, bits: Int, seed: Long): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("srp_sig", vec, lit(bits), lit(seed))
  }
  def i8Quantize(vec: Column): Column = call_function("i8_quantize", vec)
  def i8Cosine(a: Column, b: Column): Column = call_function("i8_cosine", a, b)
  def bqPack(vec: Column): Column = call_function("bq_pack", vec)
  def bqHamming(a: Column, b: Column): Column = call_function("bq_hamming", a, b)
  def pqEncode(vec: Column, m: Int, cb: Array[Array[Float]]): Column = {
    import org.apache.spark.sql.functions.{lit, typedlit}
    call_function("pq_encode", vec, lit(m), typedlit(cb.map(_.toSeq).toSeq))
  }
}
