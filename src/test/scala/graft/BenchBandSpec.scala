package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench-band regression gate (r3 post-mortem: 25 analysis failures were
  * silently timed as ~0.05 s "successes", so the bench total looked healthy
  * for a round while a third of the surface was broken).
  *
  * Compares the most recent `bench_full.json` (written by every
  * [[Bench]] run, committed per round) against the committed per-query
  * baseline `src/test/resources/bench_baseline.json`:
  *
  *   - any query in the run's `failed` list → FAIL
  *   - any baseline query missing from the run → FAIL (a query that stops
  *     being timed is exactly the r3 failure mode)
  *   - any query slower than `max(band × 2.5, band + 1 s)` → FAIL (the
  *     documented same-code host-noise spread is ±25%; 2.5× is far outside
  *     it on ANY host, so a hard failure here is a real regression)
  *   - queries in the 1.25×..2.5× gray zone are listed as warnings via
  *     `info()` — visible in CI output, not a failure.
  *
  * Regenerate the baseline after an intended perf change:
  * run Bench on a quiet host, review, then
  * `cp bench_full.json src/test/resources/bench_baseline.json`.
  */
class BenchBandSpec extends AnyFunSuite {

  /** Minimal parser for Bench's flat JSON: {"queries":{"name":sec,...},
    * "failed":["name",...]}. No nesting beyond those two objects, names are
    * `[A-Za-z0-9_]+` by construction, so regex extraction is exact. Both
    * `":"` and `": "` separator styles must parse — the r5 baseline refresh
    * switched styles and the old whitespace-intolerant regex extracted ZERO
    * bands, turning this gate vacuous for a full round. The size floor in
    * the test body is the guard against that ever recurring.
    */
  private def parse(s: String): (Map[String, Double], Seq[String]) = {
    def obj(key: String): String = {
      val i = s.indexOf("\"" + key + "\"")
      if (i < 0) return ""
      val start = s.indexOf(if (key == "failed") '[' else '{', i)
      val end = s.indexOf(if (key == "failed") ']' else '}', start)
      s.substring(start + 1, end)
    }
    val q = """"(\w+)"\s*:\s*([0-9.Ee+-]+)""".r
      .findAllMatchIn(obj("queries"))
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    val f = """"(\w+)"""".r.findAllMatchIn(obj("failed")).map(_.group(1)).toSeq
    (q, f)
  }

  private def read(p: java.nio.file.Path): String =
    java.nio.file.Files.readString(p)

  test("latest bench run stays inside the committed per-query bands") {
    val basePath = java.nio.file.Paths.get("src/test/resources/bench_baseline.json")
    val runPath = java.nio.file.Paths.get("bench_full.json")
    assert(java.nio.file.Files.exists(basePath), "missing bench_baseline.json")
    if (!java.nio.file.Files.exists(runPath))
      cancel("no bench_full.json in repo root — run graft.Bench first")

    val (bands, baseFailed) = parse(read(basePath))
    val (run, runFailed) = parse(read(runPath))
    // Self-check: an empty/near-empty parse means the parser no longer
    // matches the file format — that must be a loud failure, never a
    // vacuous pass (this exact failure disabled the gate for round 5).
    assert(bands.size >= 150,
      s"baseline parsed to only ${bands.size} bands — parser/format mismatch, gate would be vacuous")
    assert(run.size >= 150,
      s"bench run parsed to only ${run.size} queries — parser/format mismatch, gate would be vacuous")
    assert(baseFailed.isEmpty, s"baseline itself records failures: $baseFailed")
    assert(runFailed.isEmpty, s"bench run FAILED queries: ${runFailed.sorted.mkString(", ")}")

    val missing = bands.keySet -- run.keySet
    assert(missing.isEmpty,
      s"queries in baseline but absent from the bench run (r3 failure mode): ${missing.toSeq.sorted.mkString(", ")}")

    val out = bands.toSeq.sorted.flatMap { case (name, band) =>
      val limit = math.max(band * 2.5, band + 1.0)
      if (run(name) > limit) Some(f"$name: ${run(name)}%.2f s > limit ${limit}%.2f s (band ${band}%.2f)")
      else None
    }
    val warn = bands.toSeq.sorted.flatMap { case (name, band) =>
      if (run(name) > band * 1.25 && run(name) <= math.max(band * 2.5, band + 1.0))
        Some(f"$name: ${run(name)}%.2f s vs band ${band}%.2f s")
      else None
    }
    if (warn.nonEmpty) info(s"${warn.size} queries in the >1.25x gray zone:\n  ${warn.mkString("\n  ")}")
    assert(out.isEmpty, s"${out.size} queries out of band:\n  ${out.mkString("\n  ")}")
  }
}
