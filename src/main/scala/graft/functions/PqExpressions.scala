package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Product-quantization kernels, the compression half of an IVF-PQ vector
  * index (the standard recipe for billion-vector ANN — at 100 TB the float
  * embeddings do not fit the scan budget, their 8-bit PQ codes do).
  *
  * A D-dim vector is split into `m` contiguous subvectors of `dsub = D/m`
  * dims; each subvector is replaced by the index (one byte) of its nearest
  * centroid in that subspace's `ksub ≤ 256`-entry codebook. A 1024-dim
  * float vector (4 KB) becomes `m` bytes — 64 bytes at m=64 — and
  * approximate distances are computed from the codes alone via an
  * asymmetric-distance lookup table (ADC) built once per query.
  *
  * Both kernels are codegen'd expressions (the per-row hot loop of every
  * PQ scan); codebooks/LUTs ride along as flat primitive-array reference
  * objects, the same pattern as [[HyperplaneLsh]]'s plane matrix.
  *
  * Null array input → null result; a vector shorter than D is zero-padded
  * (matching [[VectorBinaryExpression]]'s defensive padding semantics).
  */
case class PqEncode(child: Expression, m: Int, ksub: Int, dsub: Int,
                    codebooks: scala.collection.immutable.ArraySeq[Float])
    extends UnaryExpression {
  require(m > 0 && dsub > 0, s"invalid PQ geometry: m=$m dsub=$dsub")
  require(ksub > 0 && ksub <= 256, s"ksub must fit one byte, got $ksub")
  require(codebooks.length == m * ksub * dsub,
    s"codebook length ${codebooks.length} != m*ksub*dsub = ${m * ksub * dsub}")

  // ArraySeq parameter keeps case-class equality STRUCTURAL (an Array field
  // would compare by reference, defeating Catalyst canonicalization and
  // subexpression elimination); the hot loops read the unwrapped primitive
  // array.
  private lazy val cb: Array[Float] = codebooks.toArray

  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires array<float|double>, got ${t.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val n = vec.numElements()
    val fl = isFloat
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      var best = 0; var bestD = Double.MaxValue
      var j = 0
      while (j < ksub) {
        var d = 0.0; var t = 0
        while (t < dsub) {
          val vi = s * dsub + t
          val x = if (vi >= n || vec.isNullAt(vi)) 0.0
            else if (fl) vec.getFloat(vi).toDouble else vec.getDouble(vi)
          val diff = x - cb((s * ksub + j) * dsub + t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cbRef = ctx.addReferenceObj("pqCodebooks", cb, "float[]")
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val s = ctx.freshName("s"); val j = ctx.freshName("j")
      val t = ctx.freshName("t"); val vi = ctx.freshName("vi")
      val x = ctx.freshName("x"); val diff = ctx.freshName("diff")
      val d = ctx.freshName("d"); val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val get = if (isFloat) s"(double) $a.getFloat($vi)" else s"$a.getDouble($vi)"
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $best = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $j = 0; $j < $ksub; $j++) {
         |    double $d = 0.0;
         |    for (int $t = 0; $t < $dsub; $t++) {
         |      int $vi = $s * $dsub + $t;
         |      double $x = ($vi >= $n || $a.isNullAt($vi)) ? 0.0 : $get;
         |      double $diff = $x - $cbRef[($s * $ksub + $j) * $dsub + $t];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $j; }
         |  }
         |  $out[$s] = (byte) $best;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** nearest_centroid(vec) → index of the nearest (squared-l2) centroid —
  * the IVF coarse-quantizer assignment, one flat-array loop per row.
  *
  * The compositional formulation
  * `array_position(array(l2_dist×k), array_min(array(l2_dist×k)))` inlines
  * 2·k separate distance loops into the fused stage (the distance array is
  * built twice: once for min, once for position); at k=16 the generated
  * method grows past what JIT compiles willingly and the scan runs several
  * times slower than this single kernel. Ties resolve to the lowest cell
  * index (matching array_position-of-first-min). Missing/null tail
  * elements read as 0 ([[VectorBinaryExpression]] padding semantics). */
case class NearestCentroid(child: Expression, nCells: Int, dim: Int,
                           centroids: scala.collection.immutable.ArraySeq[Float])
    extends UnaryExpression {
  require(nCells > 0 && dim > 0, s"invalid quantizer geometry: nCells=$nCells dim=$dim")
  require(centroids.length == nCells * dim,
    s"centroid matrix length ${centroids.length} != nCells*dim = ${nCells * dim}")

  // structural equality, primitive-array hot path — see PqEncode
  private lazy val ct: Array[Float] = centroids.toArray

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires array<float|double>, got ${t.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val n = vec.numElements()
    val fl = isFloat
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < nCells) {
      var d = 0.0; var i = 0
      while (i < dim) {
        val x = if (i >= n || vec.isNullAt(i)) 0.0
          else if (fl) vec.getFloat(i).toDouble else vec.getDouble(i)
        val diff = x - ct(c * dim + i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("ivfCentroids", ct, "float[]")
      val n = ctx.freshName("n"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val x = ctx.freshName("x")
      val diff = ctx.freshName("diff"); val d = ctx.freshName("d")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val get = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |int $best = 0; double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < $nCells; $c++) {
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    double $x = ($i >= $n || $a.isNullAt($i)) ? 0.0 : $get;
         |    double $diff = $x - $ref[$c * $dim + $i];
         |    $d += $diff * $diff;
         |  }
         |  if ($d < $bestD) { $bestD = $d; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** pq_adc(codes) → approximate SQUARED l2 distance to the query the `lut`
  * was built for: Σ_s lut[s*ksub + codes[s]]. The LUT (per-subspace
  * distances from the query subvector to every codebook centroid) is built
  * once per query on the driver — m×ksub doubles — so the per-row work is
  * `m` array lookups, no float vectors touched. */
case class PqAdcScore(child: Expression, m: Int, ksub: Int,
                      lut: scala.collection.immutable.ArraySeq[Double])
    extends UnaryExpression {
  require(lut.length == m * ksub, s"LUT length ${lut.length} != m*ksub = ${m * ksub}")

  // structural equality, primitive-array hot path — see PqEncode
  private lazy val lutArr: Array[Double] = lut.toArray

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_adc requires binary PQ codes, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val codes = v.asInstanceOf[Array[Byte]]
    val n = math.min(codes.length, m)
    var acc = 0.0; var s = 0
    while (s < n) {
      val code = codes(s) & 0xff
      // fail fast instead of reading past this subspace's LUT segment:
      // an out-of-range code means the codes column was encoded with a
      // larger codebook than the one this LUT was built from
      if (code >= ksub) throw new IllegalArgumentException(
        s"PQ code $code >= ksub=$ksub at subspace $s — codes were encoded with a different codebook")
      acc += lutArr(s * ksub + code)
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val lt = ctx.addReferenceObj("pqLut", lutArr, "double[]")
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val s = ctx.freshName("s"); val code = ctx.freshName("code")
      s"""
         |int $n = java.lang.Math.min($a.length, $m);
         |double $acc = 0.0;
         |for (int $s = 0; $s < $n; $s++) {
         |  int $code = $a[$s] & 0xff;
         |  if ($code >= $ksub) throw new IllegalArgumentException(
         |    "PQ code " + $code + " >= ksub=" + $ksub + " at subspace " + $s +
         |    " — codes were encoded with a different codebook");
         |  $acc += $lt[$s * $ksub + $code];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
