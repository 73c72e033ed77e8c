package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Native Catalyst expressions for vector math over `array<float>` /
  * `array<double>` embedding columns.
  *
  * The reference stores embeddings as float arrays and its vector index uses
  * l2 distance (reference `index-creation-function/lambda_function.py:74`,
  * `space_type: l2`); cosine is the standard retrieval metric for Titan
  * embeddings. We implement both as codegen'd expressions so distance
  * computation stays inside whole-stage codegen — no UDF boxing, no
  * per-row closure dispatch. At 100 TB the distance kernel is the hot loop
  * of every knn/near-dup query, so this is the one place a custom
  * `Expression` clearly beats composing `aggregate`/`zip_with`.
  *
  * Semantics (all three):
  *  - null array input → null result (`nullIntolerant`).
  *  - null *elements* are treated as 0.0.
  *  - mismatched lengths: the shorter vector is zero-padded (dot products
  *    ignore the tail; norms/l2 include it). Oracle queries always use
  *    equal-dim vectors, so padding is purely defensive.
  */
trait VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  @inline protected final def elemAt(a: ArrayData, isFloat: Boolean, i: Int): Double =
    if (a.isNullAt(i)) 0.0
    else if (isFloat) a.getFloat(i).toDouble
    else a.getDouble(i)

  protected final def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  protected final def rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Java source for "read element i of `arr` as double, null → 0.0". */
  protected final def jGet(arr: String, isFloat: Boolean, i: String): String =
    if (isFloat) s"($arr.isNullAt($i) ? 0.0 : (double) $arr.getFloat($i))"
    else s"($arr.isNullAt($i) ? 0.0 : $arr.getDouble($i))"
}

/** dot(a, b) = Σ a_i * b_i over the common prefix. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "dot_product"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val (af, bf) = (leftIsFloat, rightIsFloat)
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += elemAt(a, af, i) * elemAt(b, bf, i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ${jGet(a, leftIsFloat, i)} * ${jGet(b, rightIsFloat, i)};
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine_sim(a, b) = dot(a,b) / (||a|| * ||b||); 0.0 when either norm is 0. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val (af, bf) = (leftIsFloat, rightIsFloat)
    val na = a.numElements(); val nb = b.numElements()
    val n = math.min(na, nb)
    var dot = 0.0; var qa = 0.0; var qb = 0.0; var i = 0
    while (i < n) {
      val x = elemAt(a, af, i); val y = elemAt(b, bf, i)
      dot += x * y; qa += x * x; qb += y * y; i += 1
    }
    while (i < na) { val x = elemAt(a, af, i); qa += x * x; i += 1 }
    i = n
    while (i < nb) { val y = elemAt(b, bf, i); qb += y * y; i += 1 }
    if (qa == 0.0 || qb == 0.0) 0.0
    else dot / (math.sqrt(qa) * math.sqrt(qb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val dot = ctx.freshName("dot"); val qa = ctx.freshName("qa")
      val qb = ctx.freshName("qb"); val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $n = java.lang.Math.min($na, $nb);
         |double $dot = 0.0; double $qa = 0.0; double $qb = 0.0;
         |int $i = 0;
         |for (; $i < $n; $i++) {
         |  double $x = ${jGet(a, leftIsFloat, i)};
         |  double $y = ${jGet(b, rightIsFloat, i)};
         |  $dot += $x * $y; $qa += $x * $x; $qb += $y * $y;
         |}
         |for (; $i < $na; $i++) {
         |  double $x = ${jGet(a, leftIsFloat, i)}; $qa += $x * $x;
         |}
         |for ($i = $n; $i < $nb; $i++) {
         |  double $y = ${jGet(b, rightIsFloat, i)}; $qb += $y * $y;
         |}
         |${ev.value} = ($qa == 0.0 || $qb == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($qa) * java.lang.Math.sqrt($qb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Late-interaction MaxSim (ColBERT scoring arithmetic — Khattab &
  * Zaharia 2020, public): for multi-vector representations
  * `array<array<float|double>>`, score = Σ over QUERY token vectors of
  * the max over DOC token vectors of cosine similarity. The retrieval-
  * quality rung above single-vector cosine: each query token is free to
  * match its own best doc token instead of one pooled vector having to
  * satisfy all of them.
  *
  * Semantics:
  *  - null outer array → null (`nullIntolerant`);
  *  - a null QUERY token vector contributes 0 to the sum;
  *  - an empty doc (or one with only null token vectors competing at
  *    cosine 0) still takes the max over what exists; an EMPTY doc array
  *    contributes 0 per query token;
  *  - a null DOC token vector competes as cosine 0 (a zero vector);
  *  - per-pair cosine is the [[CosineSimilarity]] kernel verbatim
  *    (sequential accumulation, zero-pad on length mismatch, 0.0 on a
  *    zero norm), so `max_sim([[v]], [[w]]) ≡ cosine_sim(v, w)` exactly —
  *    pinned by VectorExpressionsSpec.
  *
  * Determinism: both engines walk query tokens in array order and doc
  *   tokens in array order with identical double arithmetic, so the
  *   result is bit-reproducible against the DuckDB oracle's unrolled
  *   greatest()/+ replay (q_maxsim).
  * Scale: O(|q|·|d|·dim) per pair — ALWAYS run it on an ANN/exact
  *   shortlist ([[graft.ops.Retrieval.maxSimRerank]]), never corpus ×
  *   queries. */
case class MaxSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "max_sim"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(ArrayType(FloatType | DoubleType, _), _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<array<float|double>> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def innerIsFloat(t: DataType): Boolean =
    t.asInstanceOf[ArrayType].elementType.asInstanceOf[ArrayType]
      .elementType == FloatType
  @inline private def get(a: ArrayData, isFloat: Boolean, i: Int): Double =
    if (a.isNullAt(i)) 0.0
    else if (isFloat) a.getFloat(i).toDouble
    else a.getDouble(i)

  private def cos(q: ArrayData, d: ArrayData, qf: Boolean, df: Boolean): Double = {
    val nq = q.numElements(); val nd = d.numElements()
    val n = math.min(nq, nd)
    var dot = 0.0; var qa = 0.0; var qb = 0.0; var i = 0
    while (i < n) {
      val x = get(q, qf, i); val y = get(d, df, i)
      dot += x * y; qa += x * x; qb += y * y; i += 1
    }
    while (i < nq) { val x = get(q, qf, i); qa += x * x; i += 1 }
    i = n
    while (i < nd) { val y = get(d, df, i); qb += y * y; i += 1 }
    if (qa == 0.0 || qb == 0.0) 0.0 else dot / (math.sqrt(qa) * math.sqrt(qb))
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val (qf, df) = (innerIsFloat(left.dataType), innerIsFloat(right.dataType))
    val nq = a.numElements(); val nd = b.numElements()
    var total = 0.0; var i = 0
    while (i < nq) {
      if (!a.isNullAt(i)) {
        val qv = a.getArray(i)
        var best = 0.0; var any = false; var j = 0
        while (j < nd) {
          val c = if (b.isNullAt(j)) 0.0 else cos(qv, b.getArray(j), qf, df)
          if (!any || c > best) { best = c; any = true }
          j += 1
        }
        if (any) total += best
      }
      i += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (qf, df) = (innerIsFloat(left.dataType), innerIsFloat(right.dataType))
    def jGet(arr: String, isFloat: Boolean, i: String): String =
      if (isFloat) s"($arr.isNullAt($i) ? 0.0 : (double) $arr.getFloat($i))"
      else s"($arr.isNullAt($i) ? 0.0 : $arr.getDouble($i))"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ad = classOf[ArrayData].getName
      val nq = ctx.freshName("nq"); val nd = ctx.freshName("nd")
      val total = ctx.freshName("total"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val qv = ctx.freshName("qv")
      val dv = ctx.freshName("dv"); val best = ctx.freshName("best")
      val any = ctx.freshName("any"); val c = ctx.freshName("c")
      val n = ctx.freshName("n"); val p = ctx.freshName("p")
      val dot = ctx.freshName("dot"); val qa = ctx.freshName("qa")
      val qb = ctx.freshName("qb"); val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $nq = $a.numElements(); int $nd = $b.numElements();
         |double $total = 0.0;
         |for (int $i = 0; $i < $nq; $i++) {
         |  if ($a.isNullAt($i)) continue;
         |  $ad $qv = $a.getArray($i);
         |  double $best = 0.0; boolean $any = false;
         |  for (int $j = 0; $j < $nd; $j++) {
         |    double $c;
         |    if ($b.isNullAt($j)) {
         |      $c = 0.0;
         |    } else {
         |      $ad $dv = $b.getArray($j);
         |      int $n = java.lang.Math.min($qv.numElements(), $dv.numElements());
         |      double $dot = 0.0; double $qa = 0.0; double $qb = 0.0;
         |      int $p = 0;
         |      for (; $p < $n; $p++) {
         |        double $x = ${jGet(qv, qf, p)};
         |        double $y = ${jGet(dv, df, p)};
         |        $dot += $x * $y; $qa += $x * $x; $qb += $y * $y;
         |      }
         |      for (; $p < $qv.numElements(); $p++) {
         |        double $x = ${jGet(qv, qf, p)}; $qa += $x * $x;
         |      }
         |      for ($p = $n; $p < $dv.numElements(); $p++) {
         |        double $y = ${jGet(dv, df, p)}; $qb += $y * $y;
         |      }
         |      $c = ($qa == 0.0 || $qb == 0.0)
         |        ? 0.0 : $dot / (java.lang.Math.sqrt($qa) * java.lang.Math.sqrt($qb));
         |    }
         |    if (!$any || $c > $best) { $best = $c; $any = true; }
         |  }
         |  if ($any) $total += $best;
         |}
         |${ev.value} = $total;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** l2_dist(a, b) = sqrt(Σ (a_i - b_i)^2), shorter vector zero-padded. */
case class L2Distance(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "l2_dist"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val (af, bf) = (leftIsFloat, rightIsFloat)
    val na = a.numElements(); val nb = b.numElements()
    val n = math.min(na, nb)
    var acc = 0.0; var i = 0
    while (i < n) { val d = elemAt(a, af, i) - elemAt(b, bf, i); acc += d * d; i += 1 }
    while (i < na) { val d = elemAt(a, af, i); acc += d * d; i += 1 }
    i = n
    while (i < nb) { val d = elemAt(b, bf, i); acc += d * d; i += 1 }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $n = java.lang.Math.min($na, $nb);
         |double $acc = 0.0; int $i = 0;
         |for (; $i < $n; $i++) {
         |  double $d = ${jGet(a, leftIsFloat, i)} - ${jGet(b, rightIsFloat, i)};
         |  $acc += $d * $d;
         |}
         |for (; $i < $na; $i++) {
         |  double $d = ${jGet(a, leftIsFloat, i)}; $acc += $d * $d;
         |}
         |for ($i = $n; $i < $nb; $i++) {
         |  double $d = ${jGet(b, rightIsFloat, i)}; $acc += $d * $d;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
