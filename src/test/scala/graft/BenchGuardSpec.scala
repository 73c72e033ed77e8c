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

  private def he(calib: Double, qs: Map[String, Double],
                 par: Option[Double] = None,
                 load: Option[Double] = None): Bench.HistEntry =
    Bench.HistEntry(calib, par, load, qs)

  private def hist(calib: Double, sf: String, qs: (String, Double)*): String =
    s"""{"metric":"history","sf":"$sf","calib":$calib,"load_before":"0.1","load_after":"0.2","reruns":0,"n_queries":${qs.size},"queries":${qs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")},"value":${qs.map(_._2).sum}}"""

  test("parseHistoryLine round-trips calib + query map, and is SF-keyed") {
    val l = hist(0.44, "/root/testdata/sf0.1", "q_a" -> 1.5, "q_b" -> 0.25)
    val parsed = Bench.parseHistoryLine(l, "/root/testdata/sf0.1")
    assert(parsed === Some(Bench.HistEntry(0.44, None, Some(0.2),
      Map("q_a" -> 1.5, "q_b" -> 0.25))))
    // a full-suite dev run at another SF must not enter this SF's prior
    assert(Bench.parseHistoryLine(l, "/root/testdata/sf0.01").isEmpty)
    assert(Bench.parseHistoryLine("not json", "/root/testdata/sf0.1").isEmpty)
  }

  test("parseHistoryLine picks up the r20 calib_par stamp and max loadavg") {
    val l = """{"metric":"history","sf":"/sf0.1","calib":0.45,"calib_par":0.52,"load_before":"3.00 3.07 3.03","load_after":"5.92 3.97 3.44","reruns":0,"n_queries":1,"queries":{"q_a":1.5},"value":1.5}"""
    assert(Bench.parseHistoryLine(l, "/sf0.1") ===
      Some(Bench.HistEntry(0.45, Some(0.52), Some(5.92), Map("q_a" -> 1.5))))
  }

  test("selectPrior takes the per-query MIN over clean runs only") {
    val entries = Seq(
      he(0.44, Map("q_a" -> 1.5, "q_b" -> 0.30)),
      he(0.46, Map("q_a" -> 1.2, "q_b" -> 0.35, "q_new" -> 2.0)),
      // contaminated (calib 1.30 > 1.5 * 0.44): its inflated times and its
      // uniquely-measured query must both be excluded
      he(1.30, Map("q_a" -> 5.0, "q_b" -> 1.9, "q_dirty_only" -> 9.9)))
    val p = Bench.selectPrior(entries)
    assert(p === Map("q_a" -> 1.2, "q_b" -> 0.30, "q_new" -> 2.0))
  }

  test("selectPrior excludes lines dirty on calib_par or loadavg alone") {
    val entries = Seq(
      he(0.44, Map("q_a" -> 1.5), par = Some(0.50), load = Some(4.0)),
      // the r19 driver profile: calib passes (1.15x best) but the run was
      // multicore-contended — par stamp and loadavg each catch it
      he(0.497, Map("q_a" -> 0.9), par = Some(1.10), load = Some(5.0)),
      he(0.497, Map("q_a" -> 0.8), par = Some(0.55), load = Some(10.95)))
    assert(Bench.selectPrior(entries) === Map("q_a" -> 1.5))
    // legacy lines without the new stamps are judged on calib alone
    assert(Bench.selectPrior(Seq(he(0.44, Map("q_a" -> 1.5)))) ===
      Map("q_a" -> 1.5))
  }

  test("a contaminated full-suite run leaves the effective prior unchanged") {
    // the exact r17-driver scenario: a clean history, then a load-3.13-style
    // full-suite run appends — prior selection must not move
    val clean = Seq(he(0.44, Map("q_a" -> 1.5)), he(0.45, Map("q_a" -> 1.4)))
    val before = Bench.selectPrior(clean)
    val after = Bench.selectPrior(clean :+ he(0.80, Map("q_a" -> 4.2)))
    assert(before === after)
  }

  test("bootstrap: a single (even slow) run defines its own envelope") {
    assert(Bench.selectPrior(Seq(he(1.3, Map("q_a" -> 4.0)))) === Map("q_a" -> 4.0))
    assert(Bench.selectPrior(Nil) === Map.empty[String, Double])
  }

  test("calib redirect: contaminated run cannot overwrite the last-run artifact") {
    val hist44 = Seq(he(0.44, Map("q_a" -> 1.5)))
    assert(Bench.resolvedBenchOutCalib("BENCH_SELF.jsonl",
      Bench.contaminationReasons(0.70, 0.70, 2.0, hist44))
      === "BENCH_SELF.jsonl.contaminated")
    assert(Bench.resolvedBenchOutCalib("BENCH_SELF.jsonl",
      Bench.contaminationReasons(0.50, 0.55, 2.0, hist44))
      === "BENCH_SELF.jsonl")
    // no history yet → calib envelope undefined, but the SELF-contained
    // par-vs-single ratio still gates
    assert(Bench.contaminationReasons(9.9, 10.5, 2.0, Nil) === Nil)
    assert(Bench.contaminationReasons(0.45, 1.20, 2.0, Nil) === List("calib_par"))
  }

  test("r19 driver-close profile redirects to .contaminated (verdict item 1)") {
    // the exact profile that slipped through in r19: calib 0.497 = 1.15x
    // the best clean 0.433 (passes the 1.5x gate), loadavg 2.61 -> 10.95,
    // warm totals ~1.5x inflated. The loadavg gate catches it; had the run
    // carried a par stamp, that would too (the synthetic 1.5x-inflated par
    // value below models the measured query inflation).
    val cleanHist = Seq(
      he(0.448, Map("q_a" -> 1.0), par = Some(0.50), load = Some(4.14)),
      he(0.433, Map("q_a" -> 1.1), par = Some(0.52), load = Some(5.38)))
    val reasons = Bench.contaminationReasons(
      runCalib = 0.497, runCalibPar = 0.78 /* 1.5x best par */,
      runLoad1m = 10.95, hist = cleanHist)
    assert(reasons.contains("load"))
    assert(reasons.contains("calib_par"))
    assert(!reasons.contains("calib"), "calib alone must NOT fire at 1.15x — " +
      "that is exactly the blind spot; the other two gates carry it")
    assert(Bench.resolvedBenchOutCalib("BENCH_SELF.jsonl", reasons)
      === "BENCH_SELF.jsonl.contaminated")
  }

  test("parallel calibration probe ~= single-thread probe on this box") {
    val single = Bench.calibrate()
    val par = Bench.calibrateParallel()
    assert(par > 0 && par.isFinite)
    // same fixed work per thread, one hardware thread per core: on an
    // idle/lightly-loaded box par stays well under the 2.0x self-gate
    assert(par / single < 2.0,
      s"all-cores probe should track the 1-thread probe: $par vs $single")
  }
}
