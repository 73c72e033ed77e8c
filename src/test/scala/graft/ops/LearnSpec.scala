package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class LearnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // planted 1-D boundary: y = (f1 > 0.5); bias + f1 features
  private lazy val fixture = (0 until 200).map { i =>
    val f1 = i / 199.0
    (i.toLong, 1.0, f1, if (f1 > 0.5) 1.0 else 0.0)
  }.toDF("id", "f_bias", "f1", "y").localCheckpoint(true)

  test("lrTrain recovers a planted boundary: dominant positive weight, monotone loss, high accuracy") {
    val feats = Seq("f_bias", "f1")
    // loss must decrease at EVERY iteration along the trajectory
    val trajectory = (0 to 12).map(k =>
      if (k == 0) Array(0.0, 0.0)
      else Learn.lrTrain(fixture, feats, "y", iters = k, lr = 2.0))
    val losses = trajectory.map(w => Learn.lrLoss(fixture, feats, "y", w))
    losses.sliding(2).foreach { case Seq(a, b) =>
      assert(b < a + 1e-12, s"loss must not increase: $losses")
    case _ => }
    val w = trajectory.last
    // the planted signal is f1: its weight dominates and is positive;
    // the bias opposes it (boundary near f1 = 0.5)
    assert(w(1) > 0 && w(1) > math.abs(w(0)), w.mkString(","))
    // GD approaches the planted boundary slowly (separable data keeps
    // growing the weights); a longer-trained model must recover it
    val wFull = Learn.lrTrain(fixture, feats, "y", iters = 60, lr = 2.0)
    assert(-wFull(0) / wFull(1) > 0.4 && -wFull(0) / wFull(1) < 0.55,
      s"learned boundary off: ${wFull.mkString(",")}")
    val scored = Learn.lrScore(fixture, feats, wFull)
    val acc = scored.filter((col("lr_pred") === (col("y") === 1.0))).count() / 200.0
    assert(acc >= 0.95, s"accuracy $acc with weights ${wFull.mkString(",")}")
  }

  test("micro-quantized GD is deterministic under repartition (sum-order robustness)") {
    val feats = Seq("f_bias", "f1")
    val w1 = Learn.lrTrain(fixture.coalesce(1), feats, "y", iters = 8, lr = 2.0)
    val w7 = Learn.lrTrain(fixture.repartition(7), feats, "y", iters = 8, lr = 2.0)
    assert(w1.toSeq === w7.toSeq)
  }

  test("contracts: zero weights score 0.5/pred true; empty frame throws; weight arity checked") {
    val s0 = Learn.lrScore(fixture, Seq("f_bias", "f1"), Array(0.0, 0.0))
      .select("lr_score", "lr_pred").distinct().collect()
    assert(s0.length === 1 && s0(0).getDouble(0) === 0.5 && s0(0).getBoolean(1))
    intercept[IllegalArgumentException] {
      Learn.lrTrain(fixture.filter(lit(false)), Seq("f1"), "y", iters = 1)
    }
    intercept[IllegalArgumentException] {
      Learn.lrScore(fixture, Seq("f_bias", "f1"), Array(1.0))
    }
  }

  test("lrModelFrame round-trips parquet bit-for-bit and scores identically (r18 verdict item 3)") {
    val feats = Seq("f_bias", "f1")
    val w = Learn.lrTrain(fixture, feats, "y", iters = 8, lr = 2.0)
    val dir = java.nio.file.Files.createTempDirectory("lr-model").toString
    Learn.lrModelFrame(spark, feats, w).write.mode("overwrite").parquet(dir)
    val w2 = Learn.lrWeights(spark.read.parquet(dir), feats)
    // micro-quantized doubles are exactly representable in binary64 only
    // per-value — the claim is bit-for-bit parquet fidelity, so assert
    // raw bit equality, not approximate
    assert(w.map(java.lang.Double.doubleToLongBits).toSeq ===
      w2.map(java.lang.Double.doubleToLongBits).toSeq)
    val a = Learn.lrScore(fixture, feats, w).orderBy("id").collect()
    val b = Learn.lrScore(fixture, feats, w2).orderBy("id").collect()
    assert(a.toSeq === b.toSeq)
    // loader contract: arity and row-count checked
    intercept[IllegalArgumentException] {
      Learn.lrWeights(spark.read.parquet(dir).unionAll(spark.read.parquet(dir)), feats)
    }
  }

  test("null feature/label rows fail loudly instead of silently deflating the gradient") {
    // ADVICE r18: the gradient denominator is count(*) while the numerators
    // are null-skipping sums — without the guard a null row shrinks the
    // step instead of erroring.
    val withNullFeat = fixture.withColumn("f1",
      when(col("id") === 7, lit(null)).otherwise(col("f1")))
    val e1 = intercept[IllegalArgumentException] {
      Learn.lrTrain(withNullFeat, Seq("f_bias", "f1"), "y", iters = 1)
    }
    assert(e1.getMessage.contains("non-null"))
    val withNullLabel = fixture.withColumn("y",
      when(col("id") === 3, lit(null)).otherwise(col("y")))
    val e2 = intercept[IllegalArgumentException] {
      Learn.lrTrain(withNullLabel, Seq("f_bias", "f1"), "y", iters = 1)
    }
    assert(e2.getMessage.contains("non-null"))
  }
}
