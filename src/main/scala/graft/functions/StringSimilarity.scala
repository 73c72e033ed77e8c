package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro / Jaro-Winkler string similarity — the record-linkage scorer the
  * blocking joins pair with (PassJoin/SNM produce candidates; this ranks
  * them). Spark ships levenshtein but neither Jaro metric.
  *
  * Semantics match the public reference implementations (and DuckDB's
  * `jaro_winkler_similarity`, probed empirically as the oracle): UTF-8
  * BYTE comparison (not code points), match window ⌊max(n,m)/2⌋−1,
  * half-transposition counting, Winkler boost `J + ℓ·0.1·(1−J)` with the
  * common-prefix ℓ capped at 4 and applied only when J > 0.7, and 0.0
  * when either side is empty (including both — the engines' convention,
  * not 1.0). One JVM pass per pair, O(n·window) — shared by interpreted
  * eval and generated code. */
object StringSimilarity {

  def jaro(sa: UTF8String, sb: UTF8String): Double = {
    val a = sa.getBytes; val b = sb.getBytes
    val la = a.length; val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val am = new Array[Boolean](la); val bm = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bm(j) && a(i) == b(j)) { am(i) = true; bm(j) = true; m += 1; found = true }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var trans = 0; var k = 0
    i = 0
    while (i < la) {
      if (am(i)) {
        while (!bm(k)) k += 1
        if (a(i) != b(k)) trans += 1
        k += 1
      }
      i += 1
    }
    (m.toDouble / la + m.toDouble / lb + (m - trans / 2.0) / m) / 3.0
  }

  def jaroWinkler(sa: UTF8String, sb: UTF8String): Double = {
    val j = jaro(sa, sb)
    if (j <= 0.7) return j
    val a = sa.getBytes; val b = sb.getBytes
    var l = 0
    val cap = math.min(4, math.min(a.length, b.length))
    while (l < cap && a(l) == b(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }
}

abstract class JaroBase
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got " +
          s"${l.catalogString}, ${r.catalogString}")
    }
}

/** jaro_sim(a, b) → DOUBLE in [0, 1]. */
case class JaroSim(left: Expression, right: Expression) extends JaroBase {
  override def prettyName: String = "jaro_sim"
  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimilarity.jaro(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringSimilarity.jaro($a, $b);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JaroSim = copy(left = l, right = r)
}

/** jaro_winkler(a, b) → DOUBLE in [0, 1] with the prefix boost. */
case class JaroWinklerSim(left: Expression, right: Expression) extends JaroBase {
  override def prettyName: String = "jaro_winkler"
  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimilarity.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringSimilarity.jaroWinkler($a, $b);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JaroWinklerSim = copy(left = l, right = r)
}
