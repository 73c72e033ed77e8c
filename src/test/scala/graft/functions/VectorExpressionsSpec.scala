package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.GraftFunctions._

class VectorExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def refCosine(a: Seq[Double], b: Seq[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
  }

  test("cosine_sim matches reference computation on float arrays") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(2.5f, -1.5f), Array(2.5f, -1.5f))).toDF("a", "b")
    val got = df.select(cosine_sim($"a", $"b")).as[Double].collect()
    val exp = Seq(
      refCosine(Seq(1, 2, 3), Seq(4, 5, 6)),
      0.0, 1.0)
    got.zip(exp).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12) }
  }

  test("l2_dist and dot_product basic values") {
    val df = Seq((Array(0.0f, 3.0f), Array(4.0f, 0.0f))).toDF("a", "b")
    assert(df.select(l2_dist($"a", $"b")).as[Double].head() === 5.0)
    assert(df.select(dot_product($"a", $"b")).as[Double].head() === 0.0)
  }

  test("null array yields null; zero vector cosine yields 0.0") {
    val df = Seq(
      (Some(Array(1.0f)), None: Option[Array[Float]]),
      (Some(Array(0.0f, 0.0f)), Some(Array(1.0f, 1.0f)))).toDF("a", "b")
    val got = df.select(cosine_sim($"a", $"b")).collect()
    assert(got(0).isNullAt(0))
    assert(got(1).getDouble(0) === 0.0)
  }

  test("codegen and interpreted paths agree on real embeddings") {
    val e = graft.Tables.embeddings(spark, TestSpark.sf).limit(50).cache()
    val probe = e.orderBy("vec_id").select("embedding").head().getSeq[Float](0).toArray
    val withCg = e.select($"vec_id", cosine_sim($"embedding", typedLit(probe)).as("s"))
      .orderBy("vec_id").as[(Long, Double)].collect()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val noCg = e.select($"vec_id", cosine_sim($"embedding", typedLit(probe)).as("s"))
        .orderBy("vec_id").as[(Long, Double)].collect()
      withCg.zip(noCg).foreach { case ((i1, s1), (i2, s2)) =>
        assert(i1 == i2); assert(s1 === s2)
      }
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("int8 kernels: codegen and interpreted paths agree on real embeddings") {
    val e = graft.Tables.embeddings(spark, TestSpark.sf).limit(50).cache()
    val probe = e.orderBy("vec_id").select("embedding").head().getSeq[Float](0).toArray
    def run(): Array[(Long, Seq[Int], Long)] =
      e.select($"vec_id", int8_encode($"embedding").as("q"),
          int8_dot(int8_encode($"embedding"), int8_encode(typedLit(probe))).as("d"))
        .orderBy("vec_id").as[(Long, Seq[Int], Long)].collect()
    val withCg = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val noCg = run()
      withCg.zip(noCg).foreach { case ((i1, q1, d1), (i2, q2, d2)) =>
        assert(i1 == i2); assert(q1 === q2); assert(d1 === d2)
      }
      assert(withCg.forall(_._2.forall(c => math.abs(c) <= 127)))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("max_sim: hand-computed, degenerate 1-token ≡ cosine_sim, null/empty contracts") {
    // 2 query tokens x 2 doc tokens, hand-checkable axes
    val q = Array(Array(1.0f, 0.0f), Array(0.0f, 1.0f))
    val d = Array(Array(0.6f, 0.8f), Array(1.0f, 0.0f))
    val df = Seq((q, d)).toDF("q", "d")
    // token 1: max(cos([1,0],[0.6,0.8])=0.6, cos([1,0],[1,0])=1.0) = 1.0
    // token 2: max(cos([0,1],[0.6,0.8])=0.8, cos([0,1],[1,0])=0.0) = 0.8
    // 0.6f/0.8f are inexact floats: compare at float precision
    assert(math.abs(df.select(max_sim($"q", $"d")).as[Double].head() - 1.8) < 1e-6)
    // degenerate single-token form IS cosine (theorem pinned on real data)
    val e = graft.Tables.embeddings(spark, TestSpark.sf).limit(30)
    val pairs = e.select($"vec_id", $"embedding")
      .crossJoin(e.select($"embedding".as("e2")).limit(3))
    val both = pairs.select(
      max_sim(array($"embedding"), array($"e2")).as("m"),
      cosine_sim($"embedding", $"e2").as("c")).as[(Double, Double)].collect()
    both.foreach { case (m, c) => assert(m === c, s"$m != $c") }
    // null outer -> null; empty doc array -> 0.0; null doc token = zero vec
    val edge = Seq(
      (Some(q), None: Option[Array[Array[Float]]]),
      (Some(q), Some(Array.empty[Array[Float]])),
      (Some(q), Some(Array(null.asInstanceOf[Array[Float]])))
    ).toDF("q", "d")
    val got = edge.select(max_sim($"q", $"d")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got(0) === None)
    assert(got(1) === Some(0.0))
    assert(got(2) === Some(0.0)) // both tokens' best match is the zero vec
  }

  test("max_sim: codegen and interpreted paths agree on real multi-vector slices") {
    val e = graft.Tables.embeddings(spark, TestSpark.sf).limit(50).cache()
    def mv(c: org.apache.spark.sql.Column) = array(
      slice(c, 1, 16), slice(c, 17, 16), slice(c, 33, 16), slice(c, 49, 16))
    val probe = e.orderBy("vec_id").select("embedding").head().getSeq[Float](0).toArray
    val probeMv = Array(probe.slice(0, 16), probe.slice(16, 32),
      probe.slice(32, 48), probe.slice(48, 64))
    def run(): Array[(Long, Double)] =
      e.select($"vec_id", max_sim(typedLit(probeMv), mv($"embedding")).as("s"))
        .orderBy("vec_id").as[(Long, Double)].collect()
    val withCg = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val noCg = run()
      withCg.zip(noCg).foreach { case ((i1, s1), (i2, s2)) =>
        assert(i1 == i2); assert(s1 === s2)
      }
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    // self-match: every token matches itself at cosine 1 -> maxsim = 4
    val self = e.select(max_sim(mv($"embedding"), mv($"embedding")).as("s"))
      .as[Double].collect()
    self.foreach(v => assert(math.abs(v - 4.0) < 1e-9, s"self maxsim $v"))
  }

  test("maxSimRerank composes with an IVF ANN shortlist — the 100 TB serving shape") {
    import graft.ops.{Knn, Retrieval}
    val e = graft.Tables.embeddings(spark, TestSpark.sf).cache()
    def mv(c: org.apache.spark.sql.Column) = array(
      slice(c, 1, 16), slice(c, 17, 16), slice(c, 33, 16), slice(c, 49, 16))
    val sample = e.orderBy("vec_id").limit(128)
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val centroids = Knn.trainCentroids(sample, nCells = 8)
    val assigned = Knn.ivfAssign(e, "embedding", centroids)
    val qRows = e.filter($"vec_id" < 2).orderBy("vec_id")
      .select($"vec_id", $"embedding").collect()
    // shortlist per query from the CELL-PRUNED scan (never the corpus),
    // then the multi-vector kernel on those pairs only
    val cands = qRows.map { r =>
      Knn.ivfSearch(assigned, "embedding", "vec_id", centroids,
          r.getSeq[Float](1).toArray, k = 8, nProbe = 4)
        .select(lit(r.getLong(0)).as("q_id"), $"vec_id")
    }.reduce(_ unionByName _)
    val qm = e.filter($"vec_id" < 2)
      .select($"vec_id".as("q_id"), mv($"embedding").as("qvecs"))
    val dm = e.select($"vec_id", mv($"embedding").as("dvecs"))
    val got = Retrieval.maxSimRerank(cands, qm, "q_id", "qvecs",
      dm, "vec_id", "dvecs", k = 4)
      .as[(Long, Long, Double, Int)].collect()
    // contract: 4 ranked rows per query, rn dense from 1, scores ordered,
    // every returned doc came from that query's shortlist
    val candSet = cands.as[(Long, Long)].collect().toSet
    assert(got.length === 8)
    got.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq === (1 to 4))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._3 >= b._3; case _ => true })
      sorted.foreach(r => assert(candSet((q, r._2))))
    }
    // the query's own doc is in its shortlist (self-cell always probed at
    // nProbe=4 of 8 here) and MaxSim ranks the exact self-match first
    got.filter(r => r._1 == r._2).foreach(r => assert(r._4 === 1))
  }

  test("SQL registration works") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS s").as[Double].head()
    assert(r === 1.0)
  }

  test("hyperplane_lsh stable and near-identical vectors collide") {
    val v = Array.tabulate(64)(i => math.sin(i).toFloat)
    val vNear = v.clone(); vNear(0) = v(0) + 1e-6f
    val vFar = Array.tabulate(64)(i => math.cos(i * 3 + 1).toFloat)
    val df = Seq((1L, v), (2L, vNear), (3L, vFar)).toDF("id", "vec")
    val sig = graft.ops.Knn.hyperplaneSignature($"vec", 64, 8, 12)
    val rows = df.select($"id", sig.as("sig")).orderBy("id").collect()
    val s1 = rows(0).getSeq[Long](1); val s2 = rows(1).getSeq[Long](1)
    val s3 = rows(2).getSeq[Long](1)
    assert(s1 == s2, "near-identical vectors must share all bands")
    assert(s1 != s3, "distant vectors should differ in at least one band")
  }
}
