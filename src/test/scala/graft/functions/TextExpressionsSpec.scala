package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.GraftFunctions._
import graft.ops.TextAnalysis

class TextExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fnv64 is deterministic and matches the Scala reference impl") {
    val texts = Seq("hello world", "", "Hello World", "héllo wörld é")
    val got = texts.toDF("t").select(fnv64($"t")).as[Long].collect()
    val exp = texts.map(TextHashing.fnv64)
    assert(got.toSeq == exp)
  }

  test("fnv64 property: Column result equals direct hash on random strings") {
    val rnd = new scala.util.Random(42)
    val samples = Seq.fill(50)(rnd.alphanumeric.take(rnd.nextInt(40)).mkString) ++
      Seq.fill(10)(List.fill(rnd.nextInt(20))(rnd.nextPrintableChar()).mkString)
    val got = samples.toDF("t").select($"t", fnv64($"t")).as[(String, Long)].collect()
    got.foreach { case (s, h) => assert(h == TextHashing.fnv64(s)) }
  }

  test("token_entropy: hand-computed distributions, determinism, degenerate inputs") {
    def ent(tk: Seq[String]): Double =
      Seq(Tuple1(tk)).toDF("t").select(token_entropy($"t")).as[Double].head()
    assert(ent(Seq("a", "a", "a")) === 0.0)               // constant → 0
    assert(math.abs(ent(Seq("a", "b")) - math.log(2)) < 1e-12)
    assert(math.abs(ent(Seq("a", "b", "c", "d")) - math.log(4)) < 1e-12)
    // 3/4-1/4 split: -(0.75 ln 0.75 + 0.25 ln 0.25)
    val exp = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert(math.abs(ent(Seq("a", "a", "a", "b")) - exp) < 1e-12)
    assert(ent(Seq.empty) === 0.0)
    assert(ent(Seq(null)) === 0.0)                        // nulls skipped
    // low-entropy boilerplate ranks below diverse prose
    assert(ent(Seq.fill(50)("buy") ++ Seq("now")) <
      ent((1 to 51).map(i => s"w$i")))
  }

  test("simhash of near-identical token sets is near in Hamming distance") {
    val base = (1 to 60).map(i => s"token$i")
    val near = base.drop(1) :+ "tokenX"       // 2 tokens differ
    val far = (1 to 60).map(i => s"other$i")
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("id", "toks")
    val rows = df.select($"id", simhash64($"toks").as("h")).orderBy("id")
      .as[(Long, Long)].collect().map(_._2)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(rows(0), rows(1)) <= 12, s"near sets too far: ${ham(rows(0), rows(1))}")
    assert(ham(rows(0), rows(2)) >= 15, s"far sets too close: ${ham(rows(0), rows(2))}")
  }

  test("minhash signature estimates Jaccard similarity") {
    val a = (1 to 100).map(i => s"sh$i")
    val b = (26 to 125).map(i => s"sh$i")    // |A∩B|=75, |A∪B|=125 → J=0.6
    val df = Seq((1L, a), (2L, b)).toDF("id", "toks")
    val sigs = df.select(minhash_sig($"toks", 256)).collect()
      .map(_.getSeq[Long](0))
    val agree = sigs(0).zip(sigs(1)).count { case (x, y) => x == y }
    val est = agree.toDouble / 256
    assert(math.abs(est - 0.6) < 0.12, s"estimate $est too far from 0.6")
  }

  test("minhash codegen equals interpreted") {
    val df = Seq((1L, Seq("a", "b", "c"))).toDF("id", "toks")
    val viaColumn = df.select(minhash_sig($"toks", 16)).head().getSeq[Long](0)
    val expr = MinHashSignature(
      org.apache.spark.sql.GraftBridge.toExpression($"toks"), 16)
    // interpreted path directly
    val direct = expr.nullSafeEval(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Seq("a", "b", "c").map(org.apache.spark.unsafe.types.UTF8String.fromString)))
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    assert(viaColumn.toSeq == direct.toSeq)
  }

  test("NbTrigramArgmax fused ≡ per-class HOF fold at nLangs=16; codegen ≡ interpreted; null under 3 code points") {
    // the r16 formulation this kernel replaces: one aggregate() fold per
    // class over the materialized trigram-bucket array, argmax via
    // array_min over (-tot, classIdx) structs — rebuilt here verbatim as
    // the arithmetic reference (16 classes, the many-language regime
    // where the old form re-walked the array 16× in interpreted lambdas)
    val nLangs = 16; val buckets = 64
    val rnd = new scala.util.Random(7)
    val flat = Array.fill(nLangs * buckets)(-(rnd.nextInt(14000) + 100).toLong)
    val priors = Array.fill(nLangs)(-(rnd.nextInt(3000) + 50).toLong)
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "päivää kaunis maailma"), // multi-byte code points
      (3L, "ab"), // 2 code points -> no trigram -> NULL
      (4L, "ナイーブベイズ"),
      (5L, "zzzz zzz zz"))
    val df = texts.toDF("id", "text")
    val perLang = (0 until nLangs).map { l =>
      val lutCol = typedLit((0 until buckets).map(b => flat(b * nLangs + l)))
      val tot = aggregate(
        trigram_buckets($"text", buckets.toLong), lit(priors(l)),
        (acc, b) => acc + element_at(lutCol, (b + 1).cast("int")))
      struct((-tot).as("_neg"), lit(l).as("_l"))
    }
    val oldForm = df.filter(length($"text") >= 3)
      .select($"id", array_min(array(perLang: _*)).as("w"))
      .select($"id", $"w".getField("_l").as("idx"),
        (-$"w".getField("_neg")).as("tot"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    val fused = df
      .select($"id", nb_trigram_argmax($"text", buckets, flat, priors).as("w"))
      .filter($"w".isNotNull)
      .select($"id", $"w".getField("idx"), $"w".getField("tot"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(fused === oldForm)
    assert(!fused.contains(3L))
    // interpreted eval (no codegen) must agree with the DF (codegen) path
    val expr = NbTrigramArgmax(
      org.apache.spark.sql.GraftBridge.toExpression($"text"), buckets,
      scala.collection.immutable.ArraySeq.unsafeWrapArray(flat),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(priors))
    texts.foreach { case (id, t) =>
      val r = expr.nullSafeEval(org.apache.spark.unsafe.types.UTF8String.fromString(t))
      if (r == null) assert(!fused.contains(id))
      else {
        val row = r.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
        assert((row.getInt(0), row.getLong(1)) === fused(id))
      }
    }
  }

  test("unicode normalization: NFC composes, NFD decomposes, idempotent") {
    val composed = "caf\u00e9"                 // é as one codepoint
    val decomposed = "cafe\u0301"              // e + combining acute
    val df = Seq((composed, decomposed)).toDF("c", "d")
    val r = df.select(
      unicode_norm($"d", "NFC").as("nfc"),
      unicode_norm($"c", "NFD").as("nfd"),
      unicode_norm(unicode_norm($"d", "NFC"), "NFC").as("nfc2")).head()
    assert(r.getString(0) === composed)
    assert(r.getString(1) === decomposed)
    assert(r.getString(2) === composed)
    // the dedup motivation: equivalent strings content-hash equal after norm
    val h = df.select(fnv64(unicode_norm($"c", "NFC")), fnv64(unicode_norm($"d", "NFC"))).head()
    assert(h.getLong(0) === h.getLong(1))
  }

  test("strip_accents folds Latin diacritics, leaves base letters") {
    val df = Seq(("Café crème, naïve piñata — ÀÉÎÕÜ ß")).toDF("t")
    assert(df.select(strip_accents($"t")).head().getString(0) ===
      "Cafe creme, naive pinata — AEIOU ß")
  }

  test("winnow fingerprint: containment detected, disjoint texts differ") {
    val doc = "the quick brown fox jumps over the lazy dog again and again"
    val containing = "PREFIX " + doc + " SUFFIX"
    val other = "completely unrelated content with different characters entirely"
    val df = Seq((1L, doc), (2L, containing), (3L, other)).toDF("id", "t")
    val fps = df.select($"id", winnow_fingerprint($"t", 8, 4).as("fp")).orderBy("id")
      .collect().map(_.getSeq[Long](1).toSet)
    val overlap = fps(0).intersect(fps(1)).size.toDouble / fps(0).size
    assert(overlap > 0.7, s"contained doc should share most fingerprints: $overlap")
    assert(fps(0).intersect(fps(2)).isEmpty)
  }

  test("fleschScore: hand counts, sentence/syllable minimums, empty null") {
    def f(texts: String*): Seq[Option[Double]] =
      texts.toDF("t")
        .select(graft.ops.TextAnalysis.fleschScore(col("t")))
        .as[Option[Double]].collect().toSeq
    // "The cat sat. The dog ran." w=6 s=2 vowel-runs=6 (one per word)
    // F = 206.835 - 1.015*3 - 84.6*1 = 119.19
    val hand = f("The cat sat. The dog ran.").head.get
    assert(math.abs(hand - (206.835 - 1.015 * 3 - 84.6)) < 1e-6)
    // no terminal punctuation -> sentence floor of 1 (w/s = w)
    val noDot = f("the cat sat on a mat").head.get
    assert(math.abs(noDot - (206.835 - 1.015 * 6 - 84.6)) < 1e-6)
    // vowelless tokens pull syllables up to the word floor: "psst grr hmm."
    // w=3 s=1 runs=0 -> syl=3 -> ratio 1
    val dry = f("psst grr hmm.").head.get
    assert(math.abs(dry - (206.835 - 1.015 * 3 - 84.6)) < 1e-6)
    // polysyllabic words score lower than monosyllabic at equal w/s
    val easy = f("the cat sat now.").head.get
    val hard = f("undeniable equivocation materiality hyperbolically.").head.get
    assert(hard < easy)
    // empty / whitespace-only -> null
    assert(f("", "   ") === Seq(None, None))
  }

  test("gopherRules: each rule trips on its planted violation, integer thresholds exact at the boundary") {
    val prose = (1 to 60).map(i => s"word$i").mkString(" ") + " the and of"
    val docs = Seq(
      (1L, prose),                                       // passes everything
      (2L, "too short the and"),                         // wc fails (4 words)
      (3L, prose + " " + Seq.fill(8)("#").mkString(" ")),// 8 syms vs 71 words: 80>71 symbol fails
      (4L, prose + "\n- a\n- b\n- c\n- d\n- e\n- f"),    // 6 bullet lines of 7: fails
      (5L, prose + "\nto be continued..."),              // 1 ellipsis line of 2: 10>6 fails
      (6L, (1 to 63).map(_ => "12345").mkString(" ") + " the and"), // 63 numeric of 65: alpha fails
      (7L, (1 to 60).map(i => s"word$i").mkString(" ") + " the"),   // 1 stop word: fails
      (8L, (1 to 50).map(_ => "supercalifragilistic").mkString(" ") + " the and") // mean len > 10
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    def row(i: Int) = out(i)
    assert(row(0).getAs[Boolean]("gopher_pass"))
    assert(!row(1).getAs[Boolean]("wc_ok") && row(1).getAs[Boolean]("stopword_ok"))
    assert(!row(2).getAs[Boolean]("symbol_ok") && row(2).getAs[Boolean]("wc_ok"))
    assert(!row(3).getAs[Boolean]("bullet_ok") && row(3).getAs[Boolean]("symbol_ok"))
    assert(!row(4).getAs[Boolean]("ellipsis_ok"))
    assert(!row(5).getAs[Boolean]("alpha_ok"))
    assert(!row(6).getAs[Boolean]("stopword_ok") && row(6).getAs[Boolean]("alpha_ok"))
    assert(!row(7).getAs[Boolean]("wordlen_ok"))
    // boundary exactness: exactly 10% symbols passes (10*sym == n), 1 over fails
    val b = Seq((1L, (1 to 54).map(i => s"w$i").mkString(" ") + " the and of # # # # # #"))
      .toDF("doc_id", "text") // 57 words + 6 hashes = 63 tokens? recompute below
    val r = TextAnalysis.gopherRules(b, "doc_id", "text").collect().head
    val nw = r.getAs[Long]("n_words")
    assert(r.getAs[Boolean]("symbol_ok") === (10 * 6 <= nw))
  }

  test("c4CleanLines is idempotent and repartition-invariant; gopherRules repartition-invariant") {
    // surviving lines all end in terminal punct, have >=3 words, carry no
    // boilerplate, and are globally unique — so cleaning a cleaned corpus
    // must be the identity (same kept lines, same order)
    val base = graft.Tables.documents(spark, TestSpark.sf).limit(200)
      .select($"doc_id", concat_ws("\n",
        concat($"text", lit(".")),
        lit("no terminal punct line"),
        lit("Shared footer line across all docs.")).as("text"))
    val once = TextAnalysis.c4CleanLines(base, "doc_id", "text")
    val twice = TextAnalysis.c4CleanLines(
      once.select($"doc_id", $"text_clean".as("text")), "doc_id", "text")
    val a = once.select("doc_id", "n_lines_kept", "text_clean").collect().toSet
    val b = twice.select("doc_id", "n_lines_kept", "text_clean").collect().toSet
    assert(a === b)
    // dedup keeps exactly ONE copy of the planted shared footer
    val foot = once.collect()
      .count(_.getAs[String]("text_clean").contains("Shared footer line"))
    assert(foot === 1)
    // repartition invariance (the window orders by (id, pos) — total order)
    val rep = TextAnalysis.c4CleanLines(base.repartition(13), "doc_id", "text")
      .select("doc_id", "n_lines_kept", "text_clean").collect().toSet
    assert(rep === a)
    val g1 = TextAnalysis.gopherRules(base, "doc_id", "text").collect()
      .map(_.toSeq).toSet
    val g2 = TextAnalysis.gopherRules(base.repartition(13), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    assert(g1 === g2)
  }

  test("distinctNgramRatio and extractLinks: hand-checked counts") {
    // group 1: "a b a b" + "a b" → bigrams [a b, b a, a b] + [a b] = 4
    // occurrences, 2 distinct → 0.5; group 2: all-distinct → 1.0;
    // one-token and null docs contribute nothing
    val docs = Seq(
      (1L, "a b a b"), (1L, "a b"), (2L, "x y z"),
      (3L, "solo"), (4L, null: String)
    ).toDF("grp", "text")
    val got = TextAnalysis.distinctNgramRatio(docs, "text", "grp", n = 2)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, 4L, 2L, 0.5), (2L, 2L, 2L, 1.0)))
    // extractLinks: multiple hrefs per doc, non-anchor text ignored,
    // order preserved within the row explode
    val html = Seq(
      (1L, """<p>x</p><a href="https://a.example.com/1">one</a> <a href="HTTP://B.example.com">two</a>"""),
      (2L, "no links here"),
      (3L, null: String)
    ).toDF("doc_id", "html")
    val links = TextAnalysis.extractLinks(html, "html", "doc_id")
      .as[(Long, String)].collect().toSeq
    assert(links === Seq((1L, "https://a.example.com/1"), (1L, "HTTP://B.example.com")))
  }

  test("tfidfKeywords: hand-checked scores, rank tie-break, k cap") {
    // 3 docs, 4-word vocab: "rare" appears in 1 doc, "mid" in 2, "the" in 3
    val docs = Seq(
      (1L, "the rare rare mid"),
      (2L, "the mid"),
      (3L, "the the")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfKeywords(docs, "text", "doc_id", k = 2)
      .as[(Long, Int, String, Double)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    // N=3. idf: rare ln(4/2)=0.693147, mid ln(4/3)=0.287682, the ln(4/4)=0
    // doc1: rare tf2 → 1.386294; mid 0.287682; the 0.0
    // doc2: mid 0.287682; the 0.0
    // doc3: the tf2 → 0.0
    assert(got === Seq(
      (1L, 1, "rare", 1.386294), (1L, 2, "mid", 0.287682),
      (2L, 1, "mid", 0.287682), (2L, 2, "the", 0.0),
      (3L, 1, "the", 0.0)))
    // single-doc corpus: every idf is ln(2/2) = 0, so all scores tie at
    // 0.0 and the rank order is purely the word-ASC tie-break
    val tie = Seq((1L, "zebra apple zebra apple unique")).toDF("doc_id", "text")
    val t = TextAnalysis.tfidfKeywords(tie, "text", "doc_id", k = 3)
      .as[(Long, Int, String, Double)].collect().sortBy(_._2).map(_._3).toSeq
    assert(t === Seq("apple", "unique", "zebra"))
  }

  test("canonicalizeUrl: equivalent variants collapse, real differences survive") {
    val cases = Seq(
      // uppercase scheme/host + default https port + fragment
      ("HTTPS://Example.COM:443/Path/To?x=1#frag", "https://example.com/Path/To?x=1"),
      // default http port + bare trailing slash
      ("http://example.com:80/", "http://example.com"),
      // NON-default port survives
      ("http://example.com:8080/a", "http://example.com:8080/a"),
      // tracking params drop entirely; trailing slash strips
      ("https://example.com/a/?utm_source=x&utm_medium=y", "https://example.com/a"),
      // surviving params keep their ORDER around dropped ones
      ("https://example.com/a?keep=1&utm_campaign=z&gclid=2&also=3",
        "https://example.com/a?keep=1&also=3"),
      ("https://example.com/a?ref=home", "https://example.com/a"),
      // 'ref' must not prefix-match longer param names
      ("https://example.com/a?reference=1", "https://example.com/a?reference=1"),
      // path case is significant and preserved
      ("https://example.com/A", "https://example.com/A"),
      // no scheme → identity fallback (trim only)
      ("  not a url  ", "not a url"),
      ("https://example.com/a/b/", "https://example.com/a/b")
    ).toDF("url", "expect")
    cases.select(TextAnalysis.canonicalizeUrl($"url").as("got"), $"expect")
      .as[(String, String)].collect()
      .foreach { case (g, e) => assert(g === e) }
    // urlDedup: the three equivalent spellings collapse under min-id keeper;
    // the distinct-path row survives alone (dropped by the n_dups > 1 cut)
    val urls = Seq(
      (1L, "https://dedup.example.com/p"),
      (2L, "HTTPS://DEDUP.EXAMPLE.COM:443/p#x"),
      (3L, "https://dedup.example.com/p/?utm_source=f"),
      (4L, "https://dedup.example.com/p?page=2")
    ).toDF("doc_id", "url")
    val dd = TextAnalysis.urlDedup(urls, "url", "doc_id")
      .as[(String, Long, Long, Seq[Long])].collect().toSeq
    assert(dd === Seq(("https://dedup.example.com/p", 3L, 1L, Seq(1L, 2L, 3L))))
  }

  test("c4CleanLines hot line: corpus-wide duplicate aggregates map-side, no window") {
    // the 100 TB skew case this operator targets: ONE boilerplate line
    // replicated into every document (cookie banner / legal footer). The
    // r14-verdict de-skew replaced the per-line row_number window with a
    // map-side-combined min(struct(id, pos)) keeper aggregate — assert the
    // plan shape (no Window node anywhere) and the exact keeper semantics
    // (minimal (doc_id, pos) owns the line; everyone else loses it).
    val hot = "This exact footer repeats in every single document."
    val docs = (1L to 300L).map { id =>
      (id, Seq(hot, s"Document number $id keeps its own prose line.", hot)
        .mkString("\n"))
    }.toDF("doc_id", "text")
    val out = TextAnalysis.c4CleanLines(docs, "doc_id", "text")
    val hasWindow = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.nonEmpty
    assert(!hasWindow, "hot-line dedup must not route through a window")
    val rows = out.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_lines_kept"), r.getAs[String]("text_clean"))).toMap
    assert(rows.size === 300)
    assert(rows(1L) === ((2L,
      hot + "\nDocument number 1 keeps its own prose line.")))
    (2L to 300L).foreach { id =>
      assert(rows(id) === ((1L, s"Document number $id keeps its own prose line.")))
    }
  }

  test("c4CleanLines: each rule drops its line, cross-doc dedup keeps first, order preserved") {
    val docs = Seq(
      (1L, Seq(
        "This line survives the cleaning pass.",   // kept
        "no terminal punctuation here",            // dropped: rule 1
        "Too short.",                              // dropped: rule 2 (2 words)
        "Please accept our cookie banner policy.", // dropped: rule 3 (boilerplate)
        "Copyright notice. All Rights Reserved.",  // dropped: rule 3
        "Enable JavaScript to view this content.", // dropped: rule 3 (case-folded)
        "var x = { a: 1 };",                       // dropped: rule 3 ('{' = code)
        "A shared boilerplate footer line.",       // kept (first occurrence)
        "The final line also survives!"            // kept
      ).mkString("\n")),
      (2L, Seq(
        "A shared boilerplate footer line.",       // dropped: dedup (doc 1 owns it)
        "Doc two keeps its own prose line."        // kept
      ).mkString("\n")),
      (3L, Seq(
        "no punct", "{ }"                          // nothing survives → doc dropped
      ).mkString("\n"))
    ).toDF("doc_id", "text")
    val out = TextAnalysis.c4CleanLines(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (1L, 3L, Seq(
        "This line survives the cleaning pass.",
        "A shared boilerplate footer line.",
        "The final line also survives!").mkString("\n")),
      (2L, 1L, "Doc two keeps its own prose line.")))
  }
}
