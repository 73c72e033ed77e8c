package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** hyperplane_lsh(vec) → array<long> of `bands` band signatures.
  *
  * Random-hyperplane LSH for cosine similarity: bit j of band b is
  * sign(dot(vec, plane_{b*bitsPerBand+j})). Planes are deterministic
  * (splitmix64-seeded), embedded as a single flat double[] reference —
  * one expression, one loop, instead of bands×bits literal dot products
  * (which overflow the JVM's 64 KB method limit under codegen).
  *
  * Sharing-a-band ⇒ all `bitsPerBand` sign bits agree ⇒ candidate pair for
  * cosine near-dup / ANN probing.
  */
case class HyperplaneLsh(child: Expression, dim: Int, bands: Int, bitsPerBand: Int)
    extends UnaryExpression {
  require(bitsPerBand > 0 && bitsPerBand <= 63, s"bitsPerBand out of range: $bitsPerBand")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_lsh"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_lsh requires array<float|double>, got ${t.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Flat [plane][dim] matrix; plane p, component d at p*dim + d. */
  private lazy val planes: Array[Double] = {
    val out = new Array[Double](bands * bitsPerBand * dim)
    var p = 0
    while (p < bands * bitsPerBand) {
      var d = 0
      while (d < dim) {
        val h = TextHashing.splitmix64(p.toLong * 131071L + d)
        out(p * dim + d) = (h >>> 40).toDouble / (1 << 24).toDouble * 2.0 - 1.0
        d += 1
      }
      p += 1
    }
    out
  }

  override def nullSafeEval(v: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val n = math.min(vec.numElements(), dim)
    val fl = isFloat
    val sig = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0L
      var j = 0
      while (j < bitsPerBand) {
        val p = b * bitsPerBand + j
        var dot = 0.0
        var d = 0
        while (d < n) {
          val x = if (vec.isNullAt(d)) 0.0
            else if (fl) vec.getFloat(d).toDouble else vec.getDouble(d)
          dot += x * planes(p * dim + d)
          d += 1
        }
        if (dot >= 0.0) acc |= (1L << j)
        j += 1
      }
      sig(b) = acc
      b += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pl = ctx.addReferenceObj("lshPlanes", planes, "double[]")
      val sig = ctx.freshName("sig"); val n = ctx.freshName("n")
      val b = ctx.freshName("b"); val j = ctx.freshName("j")
      val p = ctx.freshName("p"); val d = ctx.freshName("d")
      val dot = ctx.freshName("dot"); val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val get = if (isFloat) s"(double) $a.getFloat($d)" else s"$a.getDouble($d)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |long[] $sig = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $acc = 0L;
         |  for (int $j = 0; $j < $bitsPerBand; $j++) {
         |    int $p = $b * $bitsPerBand + $j;
         |    double $dot = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      double $x = $a.isNullAt($d) ? 0.0 : $get;
         |      $dot += $x * $pl[$p * $dim + $d];
         |    }
         |    if ($dot >= 0.0) $acc |= (1L << $j);
         |  }
         |  $sig[$b] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
