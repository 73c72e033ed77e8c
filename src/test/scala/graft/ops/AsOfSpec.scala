package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("as-of semantics: latest at-or-before, exact-tie matches, no-prior drops") {
    val left = Seq(
      (1L, 10L, "l-a"),   // after r@5  → matches 5
      (1L, 20L, "l-b"),   // after r@20 → exact tie matches 20
      (1L, 3L, "l-c"),    // before any right row → dropped
      (2L, 50L, "l-d"),   // key 2: after r@49 → matches 49
      (3L, 9L, "l-e")     // key 3 has no right rows at all → dropped
    ).toDF("k", "t", "lv")
    val right = Seq(
      (1L, 5L, "r5"), (1L, 20L, "r20"), (1L, 25L, "r25"),
      (2L, 49L, "r49")
    ).toDF("k", "t", "rv")
    val out = AsOf.asofJoin(left, right, "k", "t")
      .select($"lv", $"asof_t", $"rv").as[(String, Long, String)]
      .collect().toSet
    assert(out === Set(
      ("l-a", 5L, "r5"),
      ("l-b", 20L, "r20"),
      ("l-d", 49L, "r49")))
  }

  test("as-of: null keys/times never match — and never poison real rows") {
    // a null-time right row sorts FIRST under asc ordering; without the
    // up-front null filter it would 'match' every left row that has no
    // real prior right row, inventing pairs the DuckDB ASOF oracle rejects
    val left = Seq(
      (Option(1L), Option(3L), "l-early"),   // before r7, no valid match → dropped
      (Option(1L), Option(10L), "l-late"),   // matches r7
      (Option(1L), None, "l-null-t"),        // null time → dropped
      (None, Option(9L), "l-null-k")         // null key → dropped
    ).toDF("k", "t", "lv")
    val right = Seq(
      (Option(1L), None: Option[Long], "r-null-t"),
      (Option(1L), Option(7L), "r7"),
      (None, Option(1L), "r-null-k")
    ).toDF("k", "t", "rv")
    val out = AsOf.asofJoin(left, right, "k", "t")
      .select($"lv", $"rv").as[(String, String)].collect().toSet
    assert(out === Set(("l-late", "r7")))
  }

  test("as-of join equals an in-memory reference on seeded random data") {
    val rnd = new scala.util.Random(13)
    // small key/time domains force heavy collisions: exact ties, multiple
    // left rows per time, keys with no right rows at all
    val left = Seq.fill(400)((rnd.nextInt(8).toLong, rnd.nextInt(50).toLong, rnd.nextLong()))
    val right0 = Seq.fill(120)((rnd.nextInt(8).toLong, rnd.nextInt(50).toLong, rnd.nextLong()))
    // unique (key, time) on the right — the operator's precondition
    val right = right0.groupBy(t => (t._1, t._2)).values.map(_.maxBy(_._3)).toSeq
    val got = AsOf.asofJoin(
        left.toDF("k", "t", "lv"), right.toDF("k", "t", "rv"), "k", "t")
      .select($"k", $"t", $"lv", $"asof_t", $"rv")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val byKey = right.groupBy(_._1)
    val expected = left.flatMap { case (k, t, lv) =>
      byKey.getOrElse(k, Seq.empty).filter(_._2 <= t) match {
        case Seq() => None
        case ms =>
          val m = ms.maxBy(_._2)
          Some((k, t, lv, m._2, m._3))
      }
    }.toSet
    assert(got === expected)
    assert(expected.nonEmpty)
  }

  test("as-of join equals the brute-force rank formulation on real events") {
    val ev = graft.Tables.events(spark, TestSpark.sf)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id".as("click_id"))
    val purchases = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts")
      .agg(max($"event_id").as("purchase_id"))

    val merge = AsOf.asofJoin(clicks, purchases, "user_id", "ts")
      .select($"click_id", $"purchase_id").as[(Long, Long)].collect().toSet

    // independent formulation: range theta-join + keep the max-time match
    // (the pair-expanding plan the operator exists to avoid — fine at test sf)
    val w = Window.partitionBy($"click_id").orderBy($"pts".desc)
    val brute = clicks
      .join(purchases
          .select($"user_id".as("pu"), $"ts".as("pts"), $"purchase_id"),
        $"user_id" === $"pu" && $"pts" <= $"ts")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"click_id", $"purchase_id").as[(Long, Long)].collect().toSet

    assert(merge === brute)
    assert(merge.nonEmpty)
  }
}
