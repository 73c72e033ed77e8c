package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._

/** Mergeable QUANTILE sketches (Apache DataSketches KLL, doubles) — the
  * rank/percentile analogue of the engine's additive-artifact family
  * (HLL distinct sketches, bm25 stats row, minhash band table): a standing
  * pipeline keeps ONE small binary KLL sketch per ingested slice and
  * answers "what is the corpus-wide p95?" by UNIONING sketches — never
  * re-scanning history. KLL union is the same compaction algorithm as the
  * streamed build, so a merged sketch carries the identical normalized
  * rank-error guarantee as a single-pass sketch at the same `k`
  * (ε ≈ 1.65 % at k = 200, 99 % confidence — the published KLL table);
  * the sketch answers quantile→value and value→rank both ways.
  *
  * Shapes mirror Spark's own DataSketches HLL integration
  * (`hll_sketch_agg`/`hll_union_agg`/`hll_sketch_estimate`):
  *
  *  - [[KllSketchAgg]] — `kll_sketch_agg(x, k)`: TypedImperativeAggregate
  *    building one sketch per group from a DOUBLE column. The in-memory
  *    buffer is the sketch object; serialization happens only at shuffle
  *    boundaries, so the per-row hot path is one `update(double)` — no
  *    per-row (de)serialization.
  *  - [[KllUnionAgg]] — `kll_union_agg(sketch, k)`: merges BINARY
  *    sketches; O(slices · k log n) total, independent of corpus size.
  *  - [[KllQuantile]] / [[KllRank]] / [[KllCount]] — scalar probes
  *    (CodegenFallback: they run on artifact rows — one per slice — never
  *    on the corpus grain, so codegen is irrelevant there).
  *
  * Null values are skipped (SQL aggregate convention); an empty sketch
  * serializes fine and its quantile/rank probes return NULL.
  */
object KllExpressions {
  private[functions] def intLit(e: Expression, what: String): Int = e.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private[functions] def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  private def e(c: Column): Expression = org.apache.spark.sql.GraftBridge.toExpression(c)
  private def asCol(x: Expression): Column = org.apache.spark.sql.GraftBridge.toColumn(x)

  /** Column builders for the DataFrame API (SQL users get the same
    * functions via [[graft.GraftExtensions]]). */
  def kllSketchAgg(c: Column, k: Int = 200): Column =
    asCol(KllSketchAgg(e(c), Literal(k)).toAggregateExpression())
  def kllUnionAgg(c: Column, k: Int = 200): Column =
    asCol(KllUnionAgg(e(c), Literal(k)).toAggregateExpression())
  def kllQuantile(sketch: Column, rank: Column): Column =
    asCol(KllQuantile(e(sketch), e(rank)))
  def kllRank(sketch: Column, value: Column): Column =
    asCol(KllRank(e(sketch), e(value)))
  def kllCount(sketch: Column): Column = asCol(KllCount(e(sketch)))
}

/** `kll_sketch_agg(x, k)` — one KLL doubles sketch per group. */
case class KllSketchAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with BinaryLike[Expression] {

  private lazy val k: Int = KllExpressions.intLit(right, "kll k")

  override def prettyName: String = "kll_sketch_agg"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, int literal), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = left.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(storageFormat: Array[Byte]): KllDoublesSketch =
    KllExpressions.heapify(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllSketchAgg =
    copy(left = newLeft, right = newRight)
}

/** `kll_union_agg(sketch, k)` — merge BINARY KLL sketches. */
case class KllUnionAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with BinaryLike[Expression] {

  private lazy val k: Int = KllExpressions.intLit(right, "kll k")

  override def prettyName: String = "kll_union_agg"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, int literal), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = left.eval(input)
    if (v != null) buffer.merge(KllExpressions.heapify(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(storageFormat: Array[Byte]): KllDoublesSketch =
    KllExpressions.heapify(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllUnionAgg =
    copy(left = newLeft, right = newRight)
}

/** `kll_quantile(sketch, rank)` — value at normalized rank ∈ [0, 1]
  * (inclusive search criterion); NULL for an empty sketch. */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "kll_quantile"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, double), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def nullSafeEval(bytes: Any, rank: Any): Any = {
    val sk = KllExpressions.heapify(bytes.asInstanceOf[Array[Byte]])
    if (sk.isEmpty) null else sk.getQuantile(rank.asInstanceOf[Double])
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}

/** `kll_rank(sketch, v)` — normalized rank of `v` ∈ [0, 1] (inclusive);
  * NULL for an empty sketch. */
case class KllRank(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "kll_rank"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, double), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def nullSafeEval(bytes: Any, value: Any): Any = {
    val sk = KllExpressions.heapify(bytes.asInstanceOf[Array[Byte]])
    if (sk.isEmpty) null else sk.getRank(value.asInstanceOf[Double])
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllRank =
    copy(left = newLeft, right = newRight)
}

/** `kll_n(sketch)` — number of values the sketch has absorbed (exact). */
case class KllCount(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "kll_n"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(bytes: Any): Any =
    KllExpressions.heapify(bytes.asInstanceOf[Array[Byte]]).getN
  override protected def withNewChildInternal(newChild: Expression): KllCount =
    copy(child = newChild)
}
