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
