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
}
