package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._

/** Mergeable SET-ALGEBRA sketches (Apache DataSketches Theta) — the third
  * member of the engine's sketch-artifact family, and the one with a
  * capability the other two lack: set INTERSECTION and DIFFERENCE. HLL
  * answers "how many distinct" and KLL "what is the p95", but only a
  * theta sketch answers "how many users were active in BOTH weeks"
  * (retention), "how many left" (churn), and "how many are new" — from
  * per-slice artifacts alone, the corpora never rescanned.
  *
  * Exactness contract the oracles lean on: below the sketch's nominal
  * entries (2^lgK), a theta sketch is in EXACT mode (θ = 1, every hash
  * retained), and intersections/differences of exact sketches are exact —
  * so at gate scale the estimates hash-compare as exact integers, while
  * at 100 TB the same plan degrades gracefully to ±ε estimates (the
  * published theta error table; the oracle's envelope booleans state it).
  *
  * Shapes mirror [[KllExpressions]]:
  *  - [[ThetaSketchAgg]] — `theta_sketch_agg(x, lgK)`: one sketch per
  *    group from a LONG column; the buffer is a heap Union, so the
  *    per-row hot path is one hash-and-insert, serialization only at
  *    shuffle boundaries.
  *  - [[ThetaUnionAgg]] — `theta_union_agg(sketch, lgK)`: merge BINARY
  *    sketches (slice artifacts).
  *  - [[ThetaIntersect]] / [[ThetaANotB]] — scalar pairwise set ops on
  *    sketch columns (artifact grain — CodegenFallback is irrelevant
  *    there), returning a compact sketch.
  *  - [[ThetaEstimate]] — distinct estimate of a sketch (exact below
  *    2^lgK).
  */
object ThetaExpressions {
  private[functions] def heapify(bytes: Array[Byte]): Sketch =
    Sketch.heapify(Memory.wrap(bytes))

  private[functions] def newUnion(lgK: Int): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  private def e(c: Column): Expression = org.apache.spark.sql.GraftBridge.toExpression(c)
  private def asCol(x: Expression): Column = org.apache.spark.sql.GraftBridge.toColumn(x)

  def thetaSketchAgg(c: Column, lgK: Int = 12): Column =
    asCol(ThetaSketchAgg(e(c), Literal(lgK)).toAggregateExpression())
  def thetaUnionAgg(c: Column, lgK: Int = 12): Column =
    asCol(ThetaUnionAgg(e(c), Literal(lgK)).toAggregateExpression())
  def thetaIntersect(a: Column, b: Column): Column =
    asCol(ThetaIntersect(e(a), e(b)))
  def thetaANotB(a: Column, b: Column): Column = asCol(ThetaANotB(e(a), e(b)))
  def thetaEstimate(c: Column): Column = asCol(ThetaEstimate(e(c)))
}

/** `theta_sketch_agg(x, lgK)` — one theta sketch per group (LONG input). */
case class ThetaSketchAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with BinaryLike[Expression] {

  private lazy val lgK: Int = KllExpressions.intLit(right, "theta lgK")

  override def prettyName: String = "theta_sketch_agg"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, int literal), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union = ThetaExpressions.newUnion(lgK)

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = left.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray
  override def deserialize(storageFormat: Array[Byte]): Union = {
    val u = ThetaExpressions.newUnion(lgK)
    u.union(ThetaExpressions.heapify(storageFormat))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaSketchAgg =
    copy(left = newLeft, right = newRight)
}

/** `theta_union_agg(sketch, lgK)` — union BINARY theta sketches. */
case class ThetaUnionAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with BinaryLike[Expression] {

  private lazy val lgK: Int = KllExpressions.intLit(right, "theta lgK")

  override def prettyName: String = "theta_union_agg"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, int literal), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union = ThetaExpressions.newUnion(lgK)

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = left.eval(input)
    if (v != null) buffer.union(ThetaExpressions.heapify(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray
  override def deserialize(storageFormat: Array[Byte]): Union = {
    val u = ThetaExpressions.newUnion(lgK)
    u.union(ThetaExpressions.heapify(storageFormat))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaUnionAgg =
    copy(left = newLeft, right = newRight)
}

/** `theta_intersect(a, b)` — compact sketch of A ∩ B. */
case class ThetaIntersect(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "theta_intersect"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, binary), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val it = SetOperation.builder().buildIntersection()
    it.intersect(ThetaExpressions.heapify(a.asInstanceOf[Array[Byte]]))
    it.intersect(ThetaExpressions.heapify(b.asInstanceOf[Array[Byte]]))
    it.getResult.toByteArray
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersect =
    copy(left = newLeft, right = newRight)
}

/** `theta_a_not_b(a, b)` — compact sketch of A \ B. */
case class ThetaANotB(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "theta_a_not_b"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, binary), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().buildANotB()
      .aNotB(ThetaExpressions.heapify(a.asInstanceOf[Array[Byte]]),
        ThetaExpressions.heapify(b.asInstanceOf[Array[Byte]]))
      .toByteArray

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaANotB =
    copy(left = newLeft, right = newRight)
}

/** `theta_estimate(sketch)` — distinct estimate (exact below 2^lgK). */
case class ThetaEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "theta_estimate"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${child.dataType.catalogString}")
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(bytes: Any): Any =
    ThetaExpressions.heapify(bytes.asInstanceOf[Array[Byte]]).getEstimate
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}
