package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Pins the r17-verdict prior-poisoning guard: a dev-loop SUBSET bench
  * run must never overwrite the full-suite regression prior
  * (`BENCH_SELF.jsonl`) — in r17 a 9-query scratch run replaced it and
  * every later regression flag compared against garbage until the prior
  * was hand-restored. No SparkSession needed: the path decision is a
  * pure function. */
class BenchGuardSpec extends AnyFunSuite {

  private val full = Set("q_a", "q_b", "q_c")

  test("explicit subset run (SPARK_GRAFT_ONLY) redirects to scratch") {
    val out = Bench.resolvedBenchOut("BENCH_SELF.jsonl", "BENCH_SELF.jsonl",
      subsetActive = true, measuredNames = Set("q_a"), priorNames = full)
    assert(out === "BENCH_SELF.jsonl.subset")
  }

  test("shrunken query set vs the prior redirects even without a filter") {
    // e.g. a stale checkout whose SparkEntry lost queries the prior has
    val out = Bench.resolvedBenchOut("BENCH_SELF.jsonl", "BENCH_SELF.jsonl",
      subsetActive = false, measuredNames = Set("q_a", "q_b"), priorNames = full)
    assert(out === "BENCH_SELF.jsonl.subset")
  }

  test("full suite overwrites; query-set GROWTH (new round) overwrites") {
    assert(Bench.resolvedBenchOut("BENCH_SELF.jsonl", "BENCH_SELF.jsonl",
      subsetActive = false, measuredNames = full, priorNames = full)
      === "BENCH_SELF.jsonl")
    assert(Bench.resolvedBenchOut("BENCH_SELF.jsonl", "BENCH_SELF.jsonl",
      subsetActive = false, measuredNames = full + "q_new", priorNames = full)
      === "BENCH_SELF.jsonl")
  }

  test("no prior yet (first round / unparseable file) overwrites") {
    assert(Bench.resolvedBenchOut("BENCH_SELF.jsonl", "BENCH_SELF.jsonl",
      subsetActive = false, measuredNames = Set("q_a"),
      priorNames = Set.empty) === "BENCH_SELF.jsonl")
  }

  test("explicit scratch out path distinct from the prior is untouched by the guard") {
    val out = Bench.resolvedBenchOut("/tmp/dev_bench.jsonl", "BENCH_SELF.jsonl",
      subsetActive = true, measuredNames = Set("q_a"), priorNames = full)
    assert(out === "/tmp/dev_bench.jsonl")
  }

  test("subset run leaves the prior file byte-identical on disk") {
    val dir = Files.createTempDirectory("bench-guard")
    val prior = dir.resolve("BENCH_SELF.jsonl")
    val priorBytes = "{\"metric\":\"warm_detail\",\"queries\":{\"q_a\":1.0,\"q_b\":2.0},\"value\":3.0}\n"
    Files.writeString(prior, priorBytes)
    val out = Bench.resolvedBenchOut(prior.toString, prior.toString,
      subsetActive = true, measuredNames = Set("q_a"),
      priorNames = Set("q_a", "q_b"))
    Files.writeString(java.nio.file.Paths.get(out), "{\"metric\":\"total\"}\n")
    assert(Files.readString(prior) === priorBytes,
      "the full-suite prior must survive a subset run byte-identical")
    assert(out === prior.toString + ".subset")
  }

  test("calibration probe is positive, finite, and repeatable within 3x") {
    val a = Bench.calibrate(); val b = Bench.calibrate()
    assert(a > 0 && b > 0 && a.isFinite && b.isFinite)
    assert(math.max(a, b) / math.min(a, b) < 3.0,
      s"fixed-work probe should be stable on an idle box: $a vs $b")
  }

  // ——— r18 verdict item 1: calib-stamped run history ———

  private def hist(calib: Double, sf: String, qs: (String, Double)*): String =
    s"""{"metric":"history","sf":"$sf","calib":$calib,"load_before":"0.1","load_after":"0.2","reruns":0,"n_queries":${qs.size},"queries":${qs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")},"value":${qs.map(_._2).sum}}"""

  test("parseHistoryLine round-trips calib + query map, and is SF-keyed") {
    val l = hist(0.44, "/root/testdata/sf0.1", "q_a" -> 1.5, "q_b" -> 0.25)
    val parsed = Bench.parseHistoryLine(l, "/root/testdata/sf0.1")
    assert(parsed === Some((0.44, Map("q_a" -> 1.5, "q_b" -> 0.25))))
    // a full-suite dev run at another SF must not enter this SF's prior
    assert(Bench.parseHistoryLine(l, "/root/testdata/sf0.01").isEmpty)
    assert(Bench.parseHistoryLine("not json", "/root/testdata/sf0.1").isEmpty)
  }

  test("selectPrior takes the per-query MIN over clean runs only") {
    val entries = Seq(
      (0.44, Map("q_a" -> 1.5, "q_b" -> 0.30)),
      (0.46, Map("q_a" -> 1.2, "q_b" -> 0.35, "q_new" -> 2.0)),
      // contaminated (calib 1.30 > 1.5 * 0.44): its inflated times and its
      // uniquely-measured query must both be excluded
      (1.30, Map("q_a" -> 5.0, "q_b" -> 1.9, "q_dirty_only" -> 9.9)))
    val p = Bench.selectPrior(entries)
    assert(p === Map("q_a" -> 1.2, "q_b" -> 0.30, "q_new" -> 2.0))
  }

  test("a contaminated full-suite run leaves the effective prior unchanged") {
    // the exact r17-driver scenario: a clean history, then a load-3.13-style
    // full-suite run appends — prior selection must not move
    val clean = Seq((0.44, Map("q_a" -> 1.5)), (0.45, Map("q_a" -> 1.4)))
    val before = Bench.selectPrior(clean)
    val after = Bench.selectPrior(clean :+ ((0.80, Map("q_a" -> 4.2))))
    assert(before === after)
  }

  test("bootstrap: a single (even slow) run defines its own envelope") {
    assert(Bench.selectPrior(Seq((1.3, Map("q_a" -> 4.0)))) === Map("q_a" -> 4.0))
    assert(Bench.selectPrior(Nil) === Map.empty[String, Double])
  }

  test("calib redirect: contaminated run cannot overwrite the last-run artifact") {
    assert(Bench.resolvedBenchOutCalib("BENCH_SELF.jsonl", 0.70, Some(0.44))
      === "BENCH_SELF.jsonl.contaminated")
    assert(Bench.resolvedBenchOutCalib("BENCH_SELF.jsonl", 0.50, Some(0.44))
      === "BENCH_SELF.jsonl")
    // no history yet → nothing to protect, write proceeds
    assert(Bench.resolvedBenchOutCalib("BENCH_SELF.jsonl", 9.9, None)
      === "BENCH_SELF.jsonl")
  }
}
