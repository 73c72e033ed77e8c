package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class IntervalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select($"lid", $"rid").as[(Long, Long)].collect().toSet

  test("overlap join ≡ brute force on random intervals, across several widths") {
    val rnd = new scala.util.Random(19)
    def mk(n: Int, tag: Long) = (1 to n).map { i =>
      val s = rnd.nextInt(10000).toLong
      (tag * 1000 + i, s, s + 1 + rnd.nextInt(500))
    }
    val l = mk(120, 1L).toDF("lid", "ls", "le")
    val r = mk(150, 2L).toDF("rid", "rs", "re")
    val brute = pairsOf(l.crossJoin(r)
      .filter($"ls" < $"re" && $"rs" < $"le"))
    for (w <- Seq(1L, 7L, 100L, 512L, 1000000L)) {
      val got = pairsOf(Interval.overlapJoin(l, "ls", "le", r, "rs", "re", w))
      assert(got === brute, s"width=$w")
      // exactly-once survival: row count equals pair count, no dup pass
      assert(Interval.overlapJoin(l, "ls", "le", r, "rs", "re", w).count()
        === brute.size.toLong, s"width=$w dup rows")
    }
  }

  test("half-open semantics: touching intervals do not match; empty intervals drop") {
    val l = Seq((1L, 0L, 10L), (2L, 50L, 50L)).toDF("lid", "ls", "le")
    val r = Seq((10L, 10L, 20L), (11L, 9L, 10L), (12L, 45L, 55L)).toDF("rid", "rs", "re")
    // [0,10) touches [10,20) → no; [9,10) overlaps [0,10) at instant 9 → yes
    // (2) is empty ([50,50)) → joins nothing even inside [45,55)
    assert(pairsOf(Interval.overlapJoin(l, "ls", "le", r, "rs", "re", 4L))
      === Set((1L, 11L)))
  }

  test("overlap length is exact and the plan contains no nested loop") {
    val l = Seq((1L, 100L, 200L)).toDF("lid", "ls", "le")
    val r = Seq((9L, 150L, 400L), (8L, 0L, 120L)).toDF("rid", "rs", "re")
    val got = Interval.overlapJoinWithLength(l, "ls", "le", r, "rs", "re", 50L)
      .select($"rid", $"overlap_len").as[(Long, Long)].collect().toMap
    assert(got === Map(9L -> 50L, 8L -> 20L))
    val plan = Interval.overlapJoin(l, "ls", "le", r, "rs", "re", 50L)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
