package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.IcebergTransforms

/** `iceberg_bucket(col, N)` — Iceberg's `bucket[N]` partition transform
  * as a NATIVE codegen'd expression (the write path routes rows by it;
  * [[graft.sources.TransformFileIndex]] prunes reads through the same
  * arithmetic). Int/long/date/timestamp hash as the 8-byte
  * little-endian long, strings hash their UTF-8 bytes — murmur3_x86_32
  * seed 0 per the spec's Appendix B, shared with the scan side via
  * [[IcebergTransforms]] so write and prune can never disagree. */
case class IcebergBucket(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"bucket count must be positive, got $n")

  override def prettyName: String = "iceberg_bucket"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | DateType | TimestampType | _: StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName supports long/int/date/timestamp/string, got " +
        other.simpleString)
  }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case _: StringType =>
      IcebergTransforms.bucketUtf8(v.asInstanceOf[UTF8String], n)
    case LongType | TimestampType =>
      IcebergTransforms.bucketLong(v.asInstanceOf[Long], n)
    case IntegerType | DateType =>
      IcebergTransforms.bucketLong(v.asInstanceOf[Int].toLong, n)
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case _: StringType => defineCodeGen(ctx, ev,
        c => s"graft.sources.IcebergTransforms.bucketUtf8($c, $n)")
      case _ => defineCodeGen(ctx, ev,
        c => s"graft.sources.IcebergTransforms.bucketLong((long) $c, $n)")
    }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object IcebergPartitionFunctions {
  import org.apache.spark.SparkException
  import org.apache.spark.sql.{Column, SparkSession}
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  import org.apache.spark.sql.functions.{call_function, lit}

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("iceberg_bucket"),
      new ExpressionInfo(classOf[IcebergBucket].getName, "iceberg_bucket"),
      (children: Seq[Expression]) => {
        if (children.size != 2)
          throw new SparkException("iceberg_bucket takes 2 arguments")
        val n = children(1) match {
          case e if e.foldable => e.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new SparkException(
              s"iceberg_bucket: bucket count must be an integer, got $other")
          }
          case _ => throw new SparkException(
            "iceberg_bucket: bucket count must be a literal")
        }
        IcebergBucket(children.head, n)
      }))

  /** Idempotent per-session registration (also session-wide via
    * [[graft.GraftExtensions]]). */
  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    val reg = spark.sessionState.functionRegistry
    registrations.foreach { case (ident, info, builder) =>
      if (!reg.functionExists(ident)) reg.registerFunction(ident, info, builder)
    }
  }

  def icebergBucket(c: Column, n: Int): Column =
    call_function("iceberg_bucket", c, lit(n))
}

/** Quantile rank of `child` among a driver-computed sorted `cuts`
  * array — the Z-order clustering kernel ([[graft.sources.BucketedLake]]
  * `cluster()`): binary search as a NATIVE codegen'd expression instead
  * of a per-row Scala udf, so the maintenance rewrite's one hot loop
  * stays inside whole-stage codegen. `cuts` elements are
  * `java.lang.Double` or `UTF8String` (matching the child type after
  * the caller's cast); a NULL input ranks 0 (the z-curve's low
  * corner) — output is non-nullable. */
case class RankInCuts(child: Expression, cuts: Array[AnyRef])
    extends UnaryExpression {
  override def prettyName: String = "rank_in_cuts"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName supports double/string, got ${other.simpleString}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0
    else child.dataType match {
      case DoubleType => RankInCuts.rank(cuts, v.asInstanceOf[Double])
      case _ => RankInCuts.rank(cuts, v.asInstanceOf[UTF8String])
    }
  }

  override def doGenCode(ctx: CodegenContext,
                         ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val ref = ctx.addReferenceObj("cuts", cuts, "java.lang.Object[]")
    ev.copy(code = code"""
      ${childGen.code}
      int ${ev.value} = 0;
      if (!${childGen.isNull}) {
        ${ev.value} = graft.functions.RankInCuts.rank($ref, ${childGen.value});
      }""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen
        .FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object RankInCuts {
  def rank(cuts: Array[AnyRef], v: Double): Int =
    rankRef(cuts, java.lang.Double.valueOf(v))
  def rank(cuts: Array[AnyRef], v: UTF8String): Int = rankRef(cuts, v)
  private def rankRef(cuts: Array[AnyRef], v: AnyRef): Int = {
    val i = java.util.Arrays.binarySearch(
      cuts.asInstanceOf[Array[AnyRef]], v)
    if (i >= 0) i + 1 else -(i + 1)
  }
}
