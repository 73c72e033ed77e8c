package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SentencePiece-style UNIGRAM-LM tokenizer lattice (Kudo 2018, "Subword
  * Regularization" — public arithmetic): a bounded driver-built vocabulary
  * of pieces with micro-LONG log-probabilities, and the Viterbi
  * segmentation over it. The model rides as a codegen reference object
  * (the [[AcAutomaton]] / NbTrigramArgmax stance — bounded by the
  * vocabulary contract, never per-row data); per-row work is one virtual
  * call into a tight primitive-array DP, inside whole-stage codegen.
  *
  * DETERMINISM CONTRACT (the cross-engine oracle depends on every clause):
  *
  *  - dp(j) for positions j = n..0 is the best total micro-LONG log-prob
  *    of segmenting the suffix starting at char j; dp sums are exact LONG
  *    arithmetic, so "best" has no float ambiguity.
  *  - Reconstruction walks LEFT-TO-RIGHT choosing at each position the
  *    SHORTEST piece whose lp + dp(next) equals dp(here) — ties between
  *    optimal segmentations resolve identically on any engine that can
  *    compare integers.
  *  - Positions are Java chars ≡ SQL characters for BMP text (the corpus
  *    contract shared with the substr-trigram oracles).
  *
  * A word with an uncoverable position (some character outside the
  * vocabulary's single-char floor) segments to NULL — callers filter.
  */
final class UnigramLattice(val pieces: Array[String], val lps: Array[Long],
                           val maxLen: Int) extends Serializable {
  require(pieces.length == lps.length,
    s"${pieces.length} pieces vs ${lps.length} log-probs")
  require(pieces.nonEmpty, "unigram lattice needs at least one piece")
  require(maxLen >= 1, s"maxLen must be >= 1: $maxLen")
  require(pieces.distinct.length == pieces.length,
    "unigram lattice pieces must be distinct") // eager: fail at build, not eval

  // rebuilt lazily per JVM after serialization; read-only thereafter
  @transient private lazy val idx: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), i); i += 1 }
    m
  }
  @transient private lazy val utf8: Array[UTF8String] =
    pieces.map(UTF8String.fromString)

  private val NEG = Long.MinValue / 4

  /** Viterbi over the word's char lattice. Returns null if uncoverable. */
  def segment(w: String): (Array[UTF8String], Long) = {
    val n = w.length
    if (n == 0) return null
    val dp = new Array[Long](n + 1)
    dp(n) = 0L
    var i = n - 1
    while (i >= 0) {
      var best = NEG
      val maxl = math.min(maxLen, n - i)
      var l = 1
      while (l <= maxl) {
        if (dp(i + l) > NEG / 2) {
          val id = idx.get(w.substring(i, i + l))
          if (id != null) {
            val v = lps(id) + dp(i + l)
            if (v > best) best = v
          }
        }
        l += 1
      }
      dp(i) = best
      i -= 1
    }
    if (dp(0) <= NEG / 2) return null
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](n)
    var j = 0
    while (j < n) {
      var l = 1
      var done = false
      val maxl = math.min(maxLen, n - j)
      while (!done && l <= maxl) {
        if (dp(j + l) > NEG / 2) {
          val id = idx.get(w.substring(j, j + l))
          if (id != null && lps(id) + dp(j + l) == dp(j)) {
            out += utf8(id); j += l; done = true
          }
        }
        if (!done) l += 1
      }
      assert(done, s"dp invariant broken at $j of '$w'") // unreachable
    }
    (out.toArray, dp(0))
  }

  /** Row-shaped wrapper shared by interpreted eval and codegen. */
  def segmentRow(u: UTF8String): InternalRow = {
    val r = segment(u.toString)
    if (r == null) null
    else new GenericInternalRow(Array[Any](
      new GenericArrayData(r._1.asInstanceOf[Array[Any]]), r._2))
  }

  // Soft-EM sentinel/threshold — shared VERBATIM with the SQL oracle's
  // forward–backward CTEs (unlike the Viterbi path, whose dp cells never
  // cross engines, α/β cell VALUES enter the posteriors here, so both
  // engines must run the identical sentinel arithmetic): unreachable =
  // −1e15 micro, validity = > −1e14. A real cell is ≥ −(word len)·max|lp|
  // ≈ −1e9 for any plausible token — six orders above the threshold.
  private val SoftSent = -1000000000000000L
  private val SoftThr = -100000000000000L

  /** Log-sum-exp over EXACTLY `cands.length` micro-LONG candidates, the
    * cross-engine cell contract: m = max over all slots (sentinels
    * included), cell = m + round(ln(Σ exp((cᵢ−m)/1e6))·1e6) summed in
    * slot order (SQL's left-associated + chain), half-away-from-zero
    * rounding. Sentinel slots contribute exp(−huge) = 0.0 exactly
    * whenever any real candidate exists; an all-sentinel row lands at
    * SENT + ln(slots)·1e6 — still far below the validity threshold, so
    * unreachability propagates identically on both engines. The only
    * doubles are exp/ln, whose sub-micro engine differences the per-cell
    * rounding absorbs (the lrTrain micro-quantized-trajectory stance). */
  private def lse(cands: Array[Long]): Long = {
    var m = Long.MinValue
    var i = 0
    while (i < cands.length) { if (cands(i) > m) m = cands(i); i += 1 }
    var s = 0.0
    i = 0
    while (i < cands.length) {
      s += math.exp((cands(i) - m).toDouble / 1e6); i += 1
    }
    val v = math.log(s) * 1e6
    m + (if (v >= 0) math.round(v) else -math.round(-v))
  }

  /** Forward–backward EXPECTED piece counts (the soft-EM E-step, Kudo
    * 2018's actual training objective, replacing the hard-EM Viterbi
    * count): α over prefixes, β over suffixes, each cell a micro-LONG
    * [[lse]] over maxLen candidate slots in ascending piece-length
    * order; per in-vocab hit (i, l) the posterior mass is
    * round(exp((α(i)+lp+β(i+l)−Z)/1e6)·1e6), summed per piece within
    * the word. Returns null when the word is uncoverable (Z invalid).
    * Output pairs are sorted by piece id — a canonical order, though
    * consumers only ever sum them. */
  def expectations(w: String): Array[(Int, Long)] = {
    val n = w.length
    if (n == 0) return null
    val cands = new Array[Long](maxLen)
    val alpha = new Array[Long](n + 1)
    alpha(0) = 0L
    var j = 1
    while (j <= n) {
      var l = 1
      while (l <= maxLen) {
        cands(l - 1) = SoftSent
        if (l <= j) {
          val a = alpha(j - l)
          if (a > SoftThr) {
            val id = idx.get(w.substring(j - l, j))
            if (id != null) cands(l - 1) = a + lps(id)
          }
        }
        l += 1
      }
      alpha(j) = lse(cands)
      j += 1
    }
    val z = alpha(n)
    if (z <= SoftThr) return null
    val beta = new Array[Long](n + 1)
    beta(n) = 0L
    var i = n - 1
    while (i >= 0) {
      var l = 1
      while (l <= maxLen) {
        cands(l - 1) = SoftSent
        if (i + l <= n) {
          val b = beta(i + l)
          if (b > SoftThr) {
            val id = idx.get(w.substring(i, i + l))
            if (id != null) cands(l - 1) = b + lps(id)
          }
        }
        l += 1
      }
      beta(i) = lse(cands)
      i -= 1
    }
    val acc = new java.util.TreeMap[Integer, java.lang.Long]()
    i = 0
    while (i < n) {
      if (alpha(i) > SoftThr) {
        var l = 1
        val maxl = math.min(maxLen, n - i)
        while (l <= maxl) {
          if (beta(i + l) > SoftThr) {
            val id = idx.get(w.substring(i, i + l))
            if (id != null) {
              val x = (alpha(i) + lps(id) + beta(i + l) - z).toDouble / 1e6
              val pm = math.round(math.exp(x) * 1e6)
              if (pm > 0)
                acc.merge(id, pm, (a, b) => a + b)
            }
          }
          l += 1
        }
      }
      i += 1
    }
    val out = new Array[(Int, Long)](acc.size())
    val it = acc.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next(); out(k) = (e.getKey.intValue(), e.getValue.longValue()); k += 1
    }
    out
  }

  /** Row-shaped wrapper for [[expectations]]: array<struct<piece string,
    * post long>> or null. */
  def expectationsRow(u: UTF8String): GenericArrayData = {
    val r = expectations(u.toString)
    if (r == null) null
    else new GenericArrayData(r.map { case (id, pm) =>
      new GenericInternalRow(Array[Any](utf8(id), pm))
    }.asInstanceOf[Array[Any]])
  }
}

/** unigram_viterbi(word) → struct(pieces array<string>, lp long) under a
  * driver-built [[UnigramLattice]]; NULL when the word is uncoverable.
  * `lp` is the exact micro-LONG Viterbi total (sum of piece log-probs). */
case class UnigramViterbi(child: Expression, lattice: UnigramLattice)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("pieces", ArrayType(StringType, containsNull = false)),
    StructField("lp", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "unigram_viterbi"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unigram_viterbi requires string, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    lattice.segmentRow(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("unigramLat", lattice,
        classOf[UnigramLattice].getName)
      val r = ctx.freshName("segRow")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $r = $ref.segmentRow($v);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** unigram_expect(word) → array<struct<piece string, post long>> — the
  * word's forward–backward EXPECTED piece counts in micro units under a
  * driver-built [[UnigramLattice]] (the soft-EM E-step); NULL when the
  * word is uncoverable. Same codegen-reference-object discipline as
  * [[UnigramViterbi]]. */
case class UnigramExpect(child: Expression, lattice: UnigramLattice)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("piece", StringType, nullable = false),
    StructField("post", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "unigram_expect"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unigram_expect requires string, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    lattice.expectationsRow(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("unigramLat", lattice,
        classOf[UnigramLattice].getName)
      val r = ctx.freshName("expArr")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $r = $ref.expectationsRow($v);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
