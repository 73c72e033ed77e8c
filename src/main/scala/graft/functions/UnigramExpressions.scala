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
