package graft.functions

import scala.collection.immutable.ArraySeq
import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern automaton (Aho & Corasick 1975) over UTF-8
  * bytes — the one-pass PHRASE-grain sibling of
  * [[graft.ops.TextAnalysis.blocklistFilter]]'s word-grain broadcast join.
  *
  * Word-grain blocklists can't see multi-word or sub-word phrases, and the
  * naive phrase scan (`instr` per pattern) re-reads every document once PER
  * PHRASE — at 100 TB with a 10k-entry lexicon that is 10,000 corpus
  * passes. This automaton reads each document's bytes exactly ONCE
  * regardless of lexicon size: goto edges walk the shared-prefix trie,
  * failure links (longest proper suffix that is also a trie prefix) carry
  * the state across mismatches, and per-state emit lists (own phrases +
  * the failure chain's, flattened at build time) count every match —
  * OVERLAPPING matches included, the textbook semantics ("ushers" vs
  * {he, she, his, hers} → she, he, hers: 3 hits).
  *
  * Matching is on raw UTF-8 bytes; because a valid UTF-8 phrase never
  * starts with a continuation byte, a byte-level match can never start
  * mid-code-point, so byte matching ≡ character matching exactly.
  *
  * Build cost is O(Σ phrase bytes) on the driver; the serialized automaton
  * is a handful of int arrays bounded by the lexicon (BOUNDED by contract,
  * like every broadcast model here — never corpus-sized). The byte walk is
  * amortized O(1) per input byte: trie depth rises by ≤1 per byte and each
  * failure hop strictly decreases it.
  */
final class AcAutomaton private (
    val nPhrases: Int,
    edgeStart: Array[Int],   // state → first edge index (nStates + 1)
    edgeByte: Array[Int],    // unsigned byte per edge, sorted within a state
    edgeTo: Array[Int],      // destination state per edge
    fail: Array[Int],        // failure link per state
    emitStart: Array[Int],   // state → first emit index (nStates + 1)
    emitPhrase: Array[Int])  // flattened (own + failure-chain) phrase ids
    extends Serializable {

  /** Edge lookup: binary search the state's sorted byte slice; -1 if none. */
  private def step(state: Int, ub: Int): Int = {
    var lo = edgeStart(state); var hi = edgeStart(state + 1) - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val b = edgeByte(mid)
      if (b == ub) return edgeTo(mid)
      else if (b < ub) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  /** One pass over `bytes`: returns (total hits, distinct phrases matched).
    * Total hits counts every occurrence, overlaps included. */
  def run(bytes: Array[Byte]): Array[Long] = {
    var hits = 0L
    val seen = new Array[Long]((nPhrases + 63) >>> 6)
    var s = 0
    var i = 0
    while (i < bytes.length) {
      val ub = bytes(i) & 0xff
      var nx = step(s, ub)
      while (nx < 0 && s != 0) { s = fail(s); nx = step(s, ub) }
      s = if (nx >= 0) nx else 0
      var e = emitStart(s)
      val end = emitStart(s + 1)
      while (e < end) {
        hits += 1
        val pid = emitPhrase(e)
        seen(pid >>> 6) |= 1L << (pid & 63)
        e += 1
      }
      i += 1
    }
    var distinct = 0
    var w = 0
    while (w < seen.length) { distinct += java.lang.Long.bitCount(seen(w)); w += 1 }
    Array(hits, distinct.toLong)
  }
}

object AcAutomaton {
  def build(phrases: Seq[String]): AcAutomaton = {
    require(phrases.nonEmpty, "aho-corasick needs at least one phrase")
    require(phrases.distinct.length == phrases.length,
      "duplicate phrases would double-count every match")
    // trie with per-state sorted child maps; state 0 = root
    val children = mutable.ArrayBuffer(mutable.TreeMap.empty[Int, Int])
    val own = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    phrases.zipWithIndex.foreach { case (p, pid) =>
      val bytes = p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      require(bytes.nonEmpty, s"empty phrase at index $pid")
      var s = 0
      bytes.foreach { b =>
        val ub = b & 0xff
        s = children(s).getOrElseUpdate(ub, {
          children += mutable.TreeMap.empty[Int, Int]
          own += mutable.ArrayBuffer.empty[Int]
          children.length - 1
        })
      }
      own(s) += pid
    }
    val n = children.length
    val fail = new Array[Int](n)
    // BFS: fail(v) for depth-1 is root; deeper states extend the parent's
    // failure chain; emit(v) = own(v) ++ emit(fail(v)) — fail(v) is always
    // shallower, so BFS order has it finished first.
    val emit = new Array[Array[Int]](n)
    emit(0) = own(0).toArray
    val queue = mutable.Queue.empty[Int]
    children(0).foreach { case (_, c) =>
      fail(c) = 0; emit(c) = own(c).toArray ++ emit(0); queue += c
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      children(u).foreach { case (ub, v) =>
        var f = fail(u)
        while (f != 0 && !children(f).contains(ub)) f = fail(f)
        // t is strictly shallower than v: f walks u's failure chain (every
        // node there is shallower than u), so depth(t) ≤ depth(u) < depth(v)
        // and children(f)(ub) can never BE v — no self-loop guard needed.
        val t = children(f).getOrElse(ub, 0)
        fail(v) = t
        emit(v) = own(v).toArray ++ emit(fail(v))
        queue += v
      }
    }
    // flatten
    val edgeStart = new Array[Int](n + 1)
    var i = 0
    while (i < n) { edgeStart(i + 1) = edgeStart(i) + children(i).size; i += 1 }
    val edgeByte = new Array[Int](edgeStart(n))
    val edgeTo = new Array[Int](edgeStart(n))
    i = 0
    var k = 0
    while (i < n) {
      children(i).foreach { case (ub, v) => edgeByte(k) = ub; edgeTo(k) = v; k += 1 }
      i += 1
    }
    val emitStart = new Array[Int](n + 1)
    i = 0
    while (i < n) { emitStart(i + 1) = emitStart(i) + emit(i).length; i += 1 }
    val emitPhrase = new Array[Int](emitStart(n))
    i = 0; k = 0
    while (i < n) {
      emit(i).foreach { pid => emitPhrase(k) = pid; k += 1 }
      i += 1
    }
    new AcAutomaton(phrases.length, edgeStart, edgeByte, edgeTo, fail,
      emitStart, emitPhrase)
  }
}

/** ac_count(text) → struct(hits long, phrases int): total overlapping
  * occurrences of ANY lexicon phrase plus the count of distinct phrases
  * that matched, in ONE pass over the UTF-8 bytes via [[AcAutomaton]].
  * The automaton rides as a codegen reference object (the NbTrigramArgmax
  * model stance — bounded by the lexicon contract, never per-row data);
  * the per-row work is one virtual call into its tight primitive-array
  * walk, inside whole-stage codegen. */
case class AhoCorasickCount(child: Expression, phrases: ArraySeq[String])
    extends UnaryExpression {
  require(phrases.nonEmpty, "ac_count needs at least one phrase")

  @transient private lazy val auto: AcAutomaton = AcAutomaton.build(phrases)

  override def dataType: DataType = StructType(Seq(
    StructField("hits", LongType, nullable = false),
    StructField("phrases", IntegerType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ac_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ac_count requires string, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val r = auto.run(v.asInstanceOf[UTF8String].getBytes)
    new GenericInternalRow(Array[Any](r(0), r(1).toInt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("acAuto", auto, classOf[AcAutomaton].getName)
      val r = ctx.freshName("acRes")
      s"""
         |long[] $r = $ref.run($v.getBytes());
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$r[0], (int) $r[1]});
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
