package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE merge APPLICATION kernel — the tokenizer a training pipeline runs
  * per document over merges learned by
  * [[graft.ops.TextAnalysis.bpeMerges]] (Sennrich/Haddow/Birch 2016:
  * "apply the learned operations in the order they were learned"). The
  * engine-side analogue of the reference pipeline's per-request token
  * accounting (reference
  * `flink-bedrock/src/main/java/…/BedRockEmbeddingModelAsyncCustomMessage.java:104-106`,
  * which reads the provider's `inputTextTokenCount`) — here the corpus is
  * tokenized by the engine itself, from the corpus-trained merge table.
  *
  * Shared by interpreted eval and generated code (Scala objects get static
  * forwarders, so Janino links `BpeCodec.encode`).
  */
object BpeCodec {

  /** Encode one word already split into symbols: apply each merge rule in
    * learned priority order as ONE greedy left-to-right pass. A merged
    * symbol never re-matches as the LEFT of the same rule within the pass
    * (scan resumes after the pair) — exactly the semantics of the
    * trainer's `replace(" l  r ", " lr ")` over the double-space symbol
    * encoding, so train-time and encode-time segmentations agree
    * symbol-for-symbol (BpeSpec pins this against the trainer's own
    * vocabulary fold). */
  private def applyMerges(word: Array[UTF8String], nSyms: Int,
                          l: Array[UTF8String], r: Array[UTF8String],
                          m: Array[UTF8String]): Int = {
    var n = nSyms
    var k = 0
    while (k < l.length && n >= 2) {
      val lk = l(k); val rk = r(k); val mk = m(k)
      var i = 0; var w = 0
      while (i < n) {
        if (i + 1 < n && word(i).equals(lk) && word(i + 1).equals(rk)) {
          word(w) = mk; i += 2
        } else {
          word(w) = word(i); i += 1
        }
        w += 1
      }
      n = w
      k += 1
    }
    n
  }

  /** Tokens → flat subword-symbol sequence. Each token splits to code
    * points (the trainer's `split(w, "")` contract — Java regex splits
    * between code points, never inside a surrogate pair), merges apply
    * per word (they were learned per word and never cross a word
    * boundary), and the per-word sequences concatenate in token order.
    * Null tokens are skipped. One JVM pass, no allocation beyond the
    * output: O(nMerges · chars) per row, embarrassingly scan-parallel at
    * any corpus size — the merges ride along as an nMerges-bounded
    * broadcast literal. */
  def encode(tokens: ArrayData, l: Array[UTF8String], r: Array[UTF8String],
             m: Array[UTF8String]): ArrayData = {
    val nTok = tokens.numElements()
    val out = new java.util.ArrayList[UTF8String]()
    var buf = new Array[UTF8String](16)
    var t = 0
    while (t < nTok) {
      if (!tokens.isNullAt(t)) {
        val w = tokens.getUTF8String(t).toString
        if (buf.length < w.length) buf = new Array[UTF8String](w.length)
        var nSyms = 0
        var ci = 0
        while (ci < w.length) {
          val n = Character.charCount(w.codePointAt(ci))
          buf(nSyms) = UTF8String.fromString(w.substring(ci, ci + n))
          nSyms += 1
          ci += n
        }
        val kept = applyMerges(buf, nSyms, l, r, m)
        var q = 0
        while (q < kept) { out.add(buf(q)); q += 1 }
      }
      t += 1
    }
    new GenericArrayData(
      out.toArray.asInstanceOf[Array[AnyRef]].asInstanceOf[Array[Any]])
  }

  /** Parse a merge table passed as data (each element `"left right"`,
    * symbols contain no spaces) into the three kernel arrays. */
  def parseMerges(merges: ArrayData): (Array[UTF8String], Array[UTF8String], Array[UTF8String]) = {
    val n = merges.numElements()
    val l = new Array[UTF8String](n)
    val r = new Array[UTF8String](n)
    val m = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      require(!merges.isNullAt(i), s"bpe_encode: merge $i is null")
      val s = merges.getUTF8String(i).toString
      val sp = s.indexOf(' ')
      require(sp > 0 && sp < s.length - 1,
        s"bpe_encode: merge must be 'left right', got '$s'")
      l(i) = UTF8String.fromString(s.substring(0, sp))
      r(i) = UTF8String.fromString(s.substring(sp + 1))
      m(i) = UTF8String.fromString(s.substring(0, sp) + s.substring(sp + 1))
      i += 1
    }
    (l, r, m)
  }

  /** Non-foldable-merges fallback: parse per row, then encode. */
  def encodeRaw(tokens: ArrayData, merges: ArrayData): ArrayData = {
    val (l, r, m) = parseMerges(merges)
    encode(tokens, l, r, m)
  }
}

/** bpe_encode(array<string> tokens, array<string> merges) → array<string>
  * subword symbols: applies the learned merge table (each element
  * `"left right"`, in learned priority order — [[graft.ops.TextAnalysis.bpeMerges]]
  * output rows joined as `left_sym || ' ' || right_sym`) to every token
  * and concatenates the per-word subword sequences in order.
  *
  * When `merges` is foldable (the production shape: a literal built from
  * the collected nMerges-bounded trainer artifact), the table parses ONCE
  * at plan time and rides into codegen as a reference object — the hot
  * path is a single static call per row. A non-foldable merges column
  * falls back to parse-per-row. */
case class BpeEncode(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string> tokens, array<string> merges), " +
          s"got ${l.catalogString}, ${r.catalogString}")
    }

  @transient private lazy val folded
      : Option[(Array[UTF8String], Array[UTF8String], Array[UTF8String])] =
    if (right.foldable) {
      Option(right.eval(null)).map(v => BpeCodec.parseMerges(v.asInstanceOf[ArrayData]))
    } else None

  override def nullSafeEval(t: Any, m: Any): Any = folded match {
    case Some((l, r, mg)) => BpeCodec.encode(t.asInstanceOf[ArrayData], l, r, mg)
    case None => BpeCodec.encodeRaw(t.asInstanceOf[ArrayData], m.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    folded match {
      case Some((l, r, m)) =>
        val cls = "org.apache.spark.unsafe.types.UTF8String[]"
        val lRef = ctx.addReferenceObj("bpeLeft", l, cls)
        val rRef = ctx.addReferenceObj("bpeRight", r, cls)
        val mRef = ctx.addReferenceObj("bpeMerged", m, cls)
        nullSafeCodeGen(ctx, ev, (t, _) =>
          s"${ev.value} = graft.functions.BpeCodec.encode($t, $lRef, $rRef, $mRef);")
      case None =>
        nullSafeCodeGen(ctx, ev, (t, m) =>
          s"${ev.value} = graft.functions.BpeCodec.encodeRaw($t, $m);")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeEncode =
    copy(left = newLeft, right = newRight)
}
