package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench-band regression gate (r3 post-mortem: 25 analysis failures were
  * silently timed as ~0.05 s "successes", so the bench total looked healthy
  * for a round while a third of the surface was broken; r5 post-mortem: a
  * separator-style change made the parser extract zero bands and the gate
  * passed vacuously for a full round).
  *
  * The parse + band logic lives in [[BenchGate]] (shared with [[Bench]]'s
  * re-time-on-miss); this spec (a) runs the real gate over the most recent
  * `bench_full.json` vs the committed `src/test/resources/bench_baseline
  * .json`, and (b) pins the gate's NEGATIVE paths on synthetic inputs, so
  * the gate's bite is proven by tests rather than trusted.
  *
  * Regenerate the baseline after an intended perf change: run Bench on a
  * quiet host, review, then
  * `cp bench_full.json src/test/resources/bench_baseline.json`.
  */
class BenchBandSpec extends AnyFunSuite {

  private def read(p: java.nio.file.Path): String =
    java.nio.file.Files.readString(p)

  test("latest bench run stays inside the committed per-query bands") {
    val basePath = java.nio.file.Paths.get("src/test/resources/bench_baseline.json")
    val runPath = java.nio.file.Paths.get("bench_full.json")
    assert(java.nio.file.Files.exists(basePath), "missing bench_baseline.json")
    if (!java.nio.file.Files.exists(runPath))
      cancel("no bench_full.json in repo root — run graft.Bench first")
    val report = BenchGate.check(read(basePath), read(runPath))
    info(f"host factor (median run/band ratio): ${report.factor}%.2f")
    if (report.gray.nonEmpty)
      info(s"${report.gray.size} queries in the calibrated >1.25x gray zone:\n  ${report.gray.mkString("\n  ")}")
  }

  // ---- negative-path pins on synthetic baseline/run pairs ----

  /** 160 bands of 2.0 s in the `": "` separator style that broke the r5
    * parser, behind a decoy string VALUE "queries" that must not anchor
    * extraction.
    */
  private val names = (0 until 160).map(i => f"q$i%03d")
  private def json(times: Map[String, Double], failed: Seq[String] = Nil,
      sep: String = ": "): String = {
    val qs = times.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\"" + sep + v }.mkString("{", ", ", "}")
    val fl = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    s"""{"metric"$sep"queries", "value"$sep${times.values.sum}, "queries"$sep$qs, "failed"$sep$fl}"""
  }
  private val bands = names.map(_ -> 2.0).toMap
  private val baseJson = json(bands)

  test("gate: ': '-separated JSON with a decoy \"queries\" string value parses every band") {
    val (parsed, failed) = BenchGate.parse(baseJson)
    assert(parsed.size == 160 && parsed("q007") == 2.0 && failed.isEmpty)
    // the legacy compact ":" style must keep parsing too
    assert(BenchGate.parse(json(bands, sep = ":"))._1.size == 160)
  }

  test("gate: uniformly 1.35x-slow host -> empty gray list, no failures") {
    val report = BenchGate.check(baseJson, json(names.map(_ -> 2.7).toMap))
    assert(math.abs(report.factor - 1.35) < 1e-9)
    assert(report.gray.isEmpty, s"uniform host slowdown mis-read as drift: ${report.gray}")
  }

  test("gate: single-query drift on a slow host still warns (calibration) ...") {
    val run = names.map(_ -> 2.7).toMap + ("q007" -> 4.4) // raw 2.2x: inside raw limit
    val report = BenchGate.check(baseJson, json(run))
    assert(report.gray.exists(_.startsWith("q007")),
      s"calibrated 1.63x drift not warned: ${report.gray}")
    assert(report.gray.size == 1, s"gray list should be ONLY the drifting query: ${report.gray}")
  }

  test("gate: sub-second band jitter is NOT gray (absolute-excess floor)") {
    // r13 driver lap: 52 gray entries, nearly all 0.2-0.7 s bands whose
    // calibrated ratio crossed 1.25x on pure scheduler jitter. With the
    // 0.5 s absolute-excess floor the same shape must report clean, while
    // a >0.5 s calibrated excess still warns.
    val smallBands = names.map(_ -> 0.4).toMap
    val base = json(smallBands)
    // every query at 0.4 except q007 at 0.62: raw ratio 1.55x but the
    // calibrated excess is only 0.22 s — jitter, not drift
    val jitterRun = names.map(_ -> 0.4).toMap + ("q007" -> 0.62)
    val r1 = BenchGate.check(base, json(jitterRun))
    assert(r1.gray.isEmpty, s"0.22 s of sub-second jitter mis-read as drift: ${r1.gray}")
    // q007 at 1.0: calibrated excess 0.6 s > 0.5 -> gray (and only it)
    val driftRun = names.map(_ -> 0.4).toMap + ("q007" -> 1.0)
    val r2 = BenchGate.check(base, json(driftRun))
    assert(r2.gray.size == 1 && r2.gray.head.startsWith("q007"),
      s"0.6 s calibrated excess should warn: ${r2.gray}")
  }

  test("gate: ... and a hard out-of-band query FAILS, naming it") {
    val run = names.map(_ -> 2.7).toMap + ("q007" -> 12.0) // raw 6x
    val e = intercept[IllegalArgumentException](BenchGate.check(baseJson, json(run)))
    assert(e.getMessage.contains("q007") && e.getMessage.contains("out of band"))
  }

  test("gate: calibrated-only regression on a FAST host fails too") {
    // uniformly 0.5x host: raw 4.0 is inside the raw limit (5.0) but
    // calibrated it is 8.0 — a 4x regression the fast host was hiding
    val run = names.map(_ -> 1.0).toMap + ("q007" -> 4.0)
    val e = intercept[IllegalArgumentException](BenchGate.check(baseJson, json(run)))
    assert(e.getMessage.contains("q007") && e.getMessage.contains("calibrated"))
  }

  test("gate: a sub-150-band parse FAILS loudly instead of passing vacuously") {
    val tiny = json(names.take(10).map(_ -> 2.0).toMap)
    val e1 = intercept[IllegalArgumentException](BenchGate.check(tiny, json(names.map(_ -> 2.0).toMap)))
    assert(e1.getMessage.contains("parser/format mismatch"))
    val e2 = intercept[IllegalArgumentException](BenchGate.check(baseJson, tiny))
    assert(e2.getMessage.contains("parser/format mismatch"))
  }

  test("gate: a run with many failures reports THEM, not a size-floor mismatch") {
    // 155 failed + 5 timed: the combined count passes the format floor, so
    // the message must list failed queries (ADVICE r6: a failure storm must
    // not masquerade as a parser problem)
    val run = json(names.take(5).map(_ -> 2.0).toMap, failed = names.drop(5))
    val e = intercept[IllegalArgumentException](BenchGate.check(baseJson, run))
    assert(e.getMessage.contains("FAILED queries") && e.getMessage.contains("q155"))
  }

  test("gate: retry candidates are exactly the hard-fail set (Bench re-time path)") {
    assert(BenchGate.retryCandidates(bands, names.map(_ -> 2.7).toMap) == Nil)
    val run = names.map(_ -> 2.7).toMap + ("q007" -> 12.0)
    assert(BenchGate.retryCandidates(bands, run) == Seq("q007"))
    assert(BenchGate.retryCandidates(Map.empty, run) == Nil) // no baseline -> no retries
  }

  test("gate: a baseline query absent from the run FAILS (r3 failure mode)") {
    val run = json((names.toSet - "q042").map(_ -> 2.0).toMap)
    val e = intercept[IllegalArgumentException](BenchGate.check(baseJson, run))
    assert(e.getMessage.contains("q042") && e.getMessage.contains("absent"))
  }
}
