package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Randomized-property tests (seeded → deterministic) pinning the custom
  * kernels to naive reference implementations. */
class PropertySpec extends AnyFunSuite {

  private val words = Array("a", "bb", "ccc", "dog", "cat", "fish", "x")

  private def toArrayData(toks: Seq[String]): ArrayData =
    new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])

  test("WordShingles kernel equals naive sliding-window distinct shingles") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val toks = List.fill(rnd.nextInt(40))(words(rnd.nextInt(words.length)))
      val n = 1 + rnd.nextInt(5)
      val got = TextShingling.wordShingles(toArrayData(toks), n)
      val gotSeq = (0 until got.numElements()).map(got.getUTF8String(_).toString)
      val expected = toks.sliding(n).filter(_.size == n).map(_.mkString(" "))
        .toList.distinct
      assert(gotSeq === expected, s"toks=$toks n=$n")
    }
  }

  test("maxNgramRun kernel equals naive n-gram mode count") {
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 200) {
      val toks = List.fill(rnd.nextInt(40))(words(rnd.nextInt(words.length)))
      val n = 1 + rnd.nextInt(4)
      val got = TextShingling.maxNgramRun(toArrayData(toks), n)
      val grams = toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toList
      val expected = if (grams.isEmpty) 0L
        else grams.groupBy(identity).values.map(_.size).max.toLong
      assert(got === expected, s"toks=$toks n=$n")
    }
  }

  test("TopKByScore equals sort-take under arbitrary reduce/merge splits") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 200) {
      val rows = List.fill(1 + rnd.nextInt(80))(
        ScoredId((rnd.nextInt(201) - 100) / 10.0, rnd.nextInt(20).toLong))
      val k = 1 + rnd.nextInt(8)
      val agg = new TopKByScore(k)
      val (p1, p2) = rows.splitAt(rnd.nextInt(rows.size + 1))
      val b1 = p1.foldLeft(agg.zero)((b, v) => agg.reduce(b, v))
      val b2 = p2.foldLeft(agg.zero)((b, v) => agg.reduce(b, v))
      val got = agg.finish(agg.merge(b1, b2)).map(s => (s.score, s.id))
      val expected = rows.map(s => (s.score, s.id))
        .sortBy { case (score, id) => (-score, id) }.take(k)
      assert(got === expected, s"k=$k rows=${rows.size}")
    }
  }

  test("minhash band hashes are permutation- and duplication-invariant in the token set") {
    val rnd = new scala.util.Random(13)
    def bands(ts: Seq[String]): Seq[Long] = {
      val expr = MinHashBands(
        org.apache.spark.sql.catalyst.expressions.Literal.create(null,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)),
        16, 4)
      val r = expr.nullSafeEval(toArrayData(ts)).asInstanceOf[ArrayData]
      (0 until r.numElements()).map(r.getLong)
    }
    for (_ <- 1 to 100) {
      val toks = List.fill(1 + rnd.nextInt(30))(words(rnd.nextInt(words.length)))
      val shuffled = rnd.shuffle(toks)
      val duplicated = toks ++ toks.take(rnd.nextInt(toks.size + 1))
      assert(bands(toks) === bands(shuffled))
      assert(bands(toks) === bands(duplicated),
        "minhash is a set statistic — duplicate tokens must not change it")
    }
  }

  test("fnv64 kernel equals an independent BigInt FNV-1a reference") {
    val rnd = new scala.util.Random(17)
    def reference(s: String): Long = {
      val mask = BigInt("ffffffffffffffff", 16)
      var h = BigInt("cbf29ce484222325", 16)
      s.getBytes("UTF-8").foreach { b =>
        h = ((h ^ BigInt(b & 0xff)) * BigInt("100000001b3", 16)) & mask
      }
      h.longValue
    }
    val samples = Seq("", "a", "the", "Ünïcødé 文字", "\u0000\u0001") ++
      Seq.fill(100)(rnd.alphanumeric.take(rnd.nextInt(24)).mkString)
    samples.foreach { s =>
      assert(TextHashing.fnv64(s) === reference(s), s"input=$s")
    }
  }

  test("SimHash64 kernel equals a naive per-bit vote reference") {
    val rnd = new scala.util.Random(19)
    def reference(toks: Seq[String]): Long = {
      val votes = new Array[Int](64)
      toks.foreach { t =>
        val h = TextHashing.fnv64(t)
        (0 until 64).foreach(j => votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1))
      }
      (0 until 64).foldLeft(0L)((acc, j) => if (votes(j) > 0) acc | (1L << j) else acc)
    }
    val sim = SimHash64(org.apache.spark.sql.catalyst.expressions.Literal.create(null,
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)))
    for (_ <- 1 to 100) {
      val toks = List.fill(rnd.nextInt(40))(words(rnd.nextInt(words.length)))
      assert(sim.nullSafeEval(toArrayData(toks)) === reference(toks), s"toks=$toks")
    }
  }

  test("Int8Encode/Int8Dot kernels equal the naive quantization reference") {
    val rnd = new scala.util.Random(23)
    def naiveInt8(v: Seq[Double]): Seq[Int] = {
      val amax = if (v.isEmpty) 0.0 else v.map(math.abs).max
      if (amax == 0.0) v.map(_ => 0)
      else v.map { x =>
        val ax = x * (127.0 / amax)
        val m = math.abs(ax); val f = math.floor(m)
        val q = (f + (if (m - f >= 0.5) 1.0 else 0.0)).toInt
        if (ax < 0) -q else q
      }
    }
    for (_ <- 1 to 200) {
      val d = rnd.nextInt(20)
      val a = Seq.fill(d)((rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(5) - 2))
      val b = Seq.fill(d)((rnd.nextDouble() - 0.5) * 2)
      val enc = Int8Encode(org.apache.spark.sql.catalyst.expressions.Literal
        .create(a, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
      val got = enc.eval(null).asInstanceOf[ArrayData]
      val gotSeq = (0 until got.numElements()).map(got.getInt)
      assert(gotSeq === naiveInt8(a), s"v=$a")
      assert(gotSeq.forall(c => math.abs(c) <= 127))
      // dot: kernel vs BigInt reference over independently quantized b
      val qb = naiveInt8(b)
      val dot = Int8Dot(
        org.apache.spark.sql.catalyst.expressions.Literal.create(gotSeq,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType)),
        org.apache.spark.sql.catalyst.expressions.Literal.create(qb,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType)))
        .eval(null).asInstanceOf[Long]
      val expected = gotSeq.zip(qb).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
      assert(BigInt(dot) === expected, s"a=$gotSeq b=$qb")
    }
  }

  test("PqEncode/PqAdcScore kernels equal a naive argmin/lookup reference") {
    val rnd = new scala.util.Random(23)
    for (_ <- 1 to 50) {
      val m = 1 + rnd.nextInt(4)
      val ksub = 1 + rnd.nextInt(8)
      val dsub = 1 + rnd.nextInt(4)
      val dim = m * dsub
      val cb = Array.fill(m, ksub, dsub)(rnd.nextFloat() * 2 - 1)
      val flat = cb.flatten.flatten
      val vec = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
      // naive reference: per-subspace exhaustive argmin over squared l2
      val expCodes = (0 until m).map { s =>
        (0 until ksub).minBy { j =>
          (0 until dsub).map { t =>
            val d = vec(s * dsub + t).toDouble - cb(s)(j)(t); d * d
          }.sum
        }.toByte
      }
      val enc = PqEncode(
        org.apache.spark.sql.catalyst.expressions.Literal.create(vec,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
        m, ksub, dsub, scala.collection.immutable.ArraySeq.unsafeWrapArray(flat))
      val gotCodes = enc.eval(null).asInstanceOf[Array[Byte]]
      assert(gotCodes.toSeq === expCodes, s"m=$m ksub=$ksub dsub=$dsub")
      // ADC against a random query must equal direct LUT summation
      val q = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
      val lut = Array.tabulate(m * ksub) { i =>
        val s = i / ksub; val j = i % ksub
        (0 until dsub).map { t =>
          val d = q(s * dsub + t).toDouble - cb(s)(j)(t); d * d
        }.sum
      }
      val adc = PqAdcScore(
        org.apache.spark.sql.catalyst.expressions.Literal.create(gotCodes,
          org.apache.spark.sql.types.BinaryType),
        m, ksub, scala.collection.immutable.ArraySeq.unsafeWrapArray(lut))
      val expected = (0 until m).map(s => lut(s * ksub + (gotCodes(s) & 0xff))).sum
      assert(adc.eval(null).asInstanceOf[Double] === expected)
    }
  }
  test("sortedIntersectCount kernel equals set intersection on random sorted arrays") {
    val rnd = new scala.util.Random(99)
    for (_ <- 1 to 300) {
      val a = List.fill(rnd.nextInt(30))(words(rnd.nextInt(words.length))).sorted
      val b = List.fill(rnd.nextInt(30))(words(rnd.nextInt(words.length))).sorted
      val got = TextShingling.sortedIntersectCount(toArrayData(a), toArrayData(b))
      // set semantics: duplicates count once per side
      assert(got === (a.toSet intersect b.toSet).size, s"a=$a b=$b")
    }
  }

  test("sorted_intersect_count: codegen and interpreted paths agree through SQL") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq.empty[String], Seq("x")),
      (Seq("m"), Seq("m"))
    ).toDF("a", "b")
    val viaExpr = df.select(
        GraftFunctions.sorted_intersect_count($"a", $"b"))
      .as[Int].collect().toSeq
    assert(viaExpr === Seq(2, 0, 1))
    // interpreted fallback must agree (array_intersect as the reference)
    val ref = df.select(size(array_intersect($"a", $"b"))).as[Int].collect().toSeq
    assert(viaExpr === ref)
  }

}
