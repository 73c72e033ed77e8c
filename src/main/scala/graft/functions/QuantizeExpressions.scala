package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Int8 scalar-quantization kernels (see [[graft.ops.Quantize]] for the
  * operator story). These exist because the HOF formulation —
  * `transform(vec, x -> round(x · 127 / array_max(…)))` — re-evaluates the
  * max-abs subexpression PER ELEMENT (lambda bodies are exempt from
  * subexpression elimination), turning an O(d) encode into O(d²): measured
  * 1.8 s vs 0.1 s on the sf0.1 probe query. One fused loop computes amax
  * then the codes — the same single-pass-kernel fix as [[NearestCentroid]].
  *
  * Rounding is half-away-from-zero via the exact fraction compare (the
  * `SparkEntry.roundAway` derivation: m − floor(m) is exact in IEEE double,
  * so the .5 boundary cannot be crossed by the +0.5 addition hazard),
  * matching DuckDB `round()`'s C semantics — quantized codes hash-compare
  * across engines.
  *
  * Null array → null; null elements read as 0.0 (house vector semantics).
  */
case class Int8Encode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "int8_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"int8_encode requires array<float|double>, got ${t.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val fl = isFloat
    def get(i: Int): Double =
      if (a.isNullAt(i)) 0.0 else if (fl) a.getFloat(i).toDouble else a.getDouble(i)
    var amax = 0.0
    var i = 0
    while (i < n) { val m = math.abs(get(i)); if (m > amax) amax = m; i += 1 }
    val out = new Array[Int](n)
    if (amax != 0.0) {
      val scale = 127.0 / amax
      i = 0
      while (i < n) {
        val ax = get(i) * scale
        val m = math.abs(ax)
        val f = math.floor(m)
        val q = (f + (if (m - f >= 0.5) 1.0 else 0.0)).toInt
        out(i) = if (ax < 0) -q else q
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val amax = ctx.freshName("amax"); val scale = ctx.freshName("scale")
      val out = ctx.freshName("out"); val x = ctx.freshName("x")
      val ax = ctx.freshName("ax"); val m = ctx.freshName("m")
      val f = ctx.freshName("f"); val q = ctx.freshName("q")
      val get = (idx: String) =>
        if (isFloat) s"($a.isNullAt($idx) ? 0.0 : (double) $a.getFloat($idx))"
        else s"($a.isNullAt($idx) ? 0.0 : $a.getDouble($idx))"
      s"""
         |int $n = $a.numElements();
         |double $amax = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = java.lang.Math.abs(${get(i)});
         |  if ($x > $amax) $amax = $x;
         |}
         |int[] $out = new int[$n];
         |if ($amax != 0.0) {
         |  double $scale = 127.0 / $amax;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $ax = ${get(i)} * $scale;
         |    double $m = java.lang.Math.abs($ax);
         |    double $f = java.lang.Math.floor($m);
         |    int $q = (int) ($f + (($m - $f >= 0.5) ? 1.0 : 0.0));
         |    $out[$i] = ($ax < 0) ? -$q : $q;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** int8_dot(a, b) → exact Σ a_i·b_i over the common prefix as LONG — the
  * quantized-scan scoring loop. Integer multiply-add: no accumulation-order
  * sensitivity, |dot| ≤ d·127² so LONG never wraps for any real d. */
case class Int8Dot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "int8_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"int8_dot requires array<int> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0L; var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0L else a.getInt(i).toLong
      val y = if (b.isNullAt(i)) 0L else b.getInt(i).toLong
      dot += x * y; i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $dot = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ($a.isNullAt($i) ? 0L : (long) $a.getInt($i))
         |        * ($b.isNullAt($i) ? 0L : (long) $b.getInt($i));
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
