package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Morton (Z-order) interleaving — the data-layout primitive behind
  * multi-dimensional file clustering: rows sorted by the interleaved bits
  * of two key columns land near each other when they are near in EITHER
  * dimension, so per-file min/max statistics prune scans filtered on
  * either key (the Delta/Iceberg OPTIMIZE ZORDER recipe, expressed as a
  * plain deterministic expression + range repartition).
  */
object ZOrder {
  /** Spread the low 32 bits of v over the even bit positions of a long —
    * the standard magic-mask doubling ladder, branch-free. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8))  & 0x00FF00FF00FF00FFL
    x = (x | (x << 4))  & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    x
  }

  /** 64-bit Morton code of two NON-NEGATIVE 32-bit coordinates: x on the
    * even bits, y on the odd bits. */
  def zValue(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)
}

/** z_value(x, y) → LONG Morton code. Inputs are taken modulo 2^32 (the
  * caller buckets real keys into non-negative 32-bit coordinates first —
  * interleaving is only meaningful over bounded grids). */
case class ZValue(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "z_value"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ByteType | ShortType | IntegerType | LongType,
            ByteType | ShortType | IntegerType | LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires integral inputs, got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    def asLong(v: Any): Long = v match {
      case i: Int => i.toLong
      case l: Long => l
      case s: Short => s.toLong
      case b: Byte => b.toLong
    }
    ZOrder.zValue(asLong(a), asLong(b))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrder.zValue((long) $a, (long) $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ZValue = copy(left = l, right = r)
}
