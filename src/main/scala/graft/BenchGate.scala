package graft

/** Parser + band logic for the bench regression gate, shared by [[Bench]]
  * (re-time-on-miss needs the bands at run time) and `BenchBandSpec` (the CI
  * gate needs the same parse + limits, and its negative-path tests need the
  * logic callable on synthetic baseline/run pairs, not just repo files).
  *
  * Band model: the committed baseline records one duration per query. A run
  * is compared two ways —
  *
  *   - RAW backstop: `t > hardLimit(band)` fails regardless of host speed.
  *     This is deliberately calibration-free: if every query regresses 3×,
  *     the host factor absorbs it and the calibrated check goes blind — the
  *     raw limit is what still fires.
  *   - HOST-CALIBRATED: `t / hostFactor > hardLimit(band)` fails, and
  *     `t / hostFactor > band × grayRatio` warns. The factor is the MEDIAN
  *     run/band ratio, so a uniformly slow (or fast) host cancels out and
  *     the gray list shows only per-query drift — on an r6-style uniformly
  *     ~1.35× host the uncalibrated gate listed 127 gray queries, pure noise
  *     that would bury one real regression.
  *
  * The median is the right center: robust to the handful of genuinely
  * drifting queries the gate exists to find, as long as they are a minority
  * of the 150+ bands (and if a majority drifts, the raw backstop fires).
  */
object BenchGate {

  /** Minimal parser for Bench's flat JSON: `{"queries":{"name":sec,...},
    * "failed":["name",...]}`. No nesting beyond those two objects, names are
    * `[A-Za-z0-9_]+` by construction, so regex extraction is exact. Both
    * `":"` and `": "` separator styles must parse — the r5 baseline refresh
    * switched styles and a whitespace-intolerant regex extracted ZERO bands,
    * turning the gate vacuous for a full round; [[check]]'s size floor
    * guards against that ever recurring. The object anchor requires the
    * colon, so a string VALUE equal to "queries"/"failed" earlier in the
    * JSON cannot mis-anchor extraction.
    */
  def parse(s: String): (Map[String, Double], Seq[String]) = {
    def obj(key: String): String = {
      ("\"" + key + "\"\\s*:").r.findFirstMatchIn(s) match {
        case None => ""
        case Some(m) =>
          val start = s.indexOf(if (key == "failed") '[' else '{', m.end)
          val end = if (start < 0) -1 else s.indexOf(if (key == "failed") ']' else '}', start)
          if (end < 0) "" else s.substring(start + 1, end)
      }
    }
    val q = """"(\w+)"\s*:\s*([0-9.Ee+-]+)""".r
      .findAllMatchIn(obj("queries"))
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    val f = """"(\w+)"""".r.findAllMatchIn(obj("failed")).map(_.group(1)).toSeq
    (q, f)
  }

  /** Hard per-query limit: 2.5× the band (far outside the documented ±25%
    * same-code host spread) with a +1 s absolute floor so sub-second bands
    * don't fail on scheduler jitter.
    */
  def hardLimit(band: Double): Double = math.max(band * 2.5, band + 1.0)

  /** Median run/band ratio over the queries both sides know — the host-speed
    * factor. 1.0 on the baseline host; ~1.35 on an r6-style uniformly slow
    * one.
    */
  def hostFactor(bands: Map[String, Double], run: Map[String, Double]): Double = {
    val ratios = bands.collect {
      case (k, b) if b > 0 && run.contains(k) => run(k) / b
    }.toSeq.sorted
    require(ratios.nonEmpty, "hostFactor: no shared queries between baseline and run")
    val n = ratios.length
    val f = if (n % 2 == 1) ratios(n / 2) else (ratios(n / 2 - 1) + ratios(n / 2)) / 2
    require(f > 0, s"hostFactor: non-positive median ratio $f")
    f
  }

  /** `hardFails` trip the gate; `gray` is the calibrated >grayRatio warning
    * list (informational). `factor` is the host-speed median for the report.
    */
  case class Report(factor: Double, hardFails: Seq[String], gray: Seq[String])

  def evaluate(bands: Map[String, Double], run: Map[String, Double],
      grayRatio: Double = 1.25): Report = {
    val f = hostFactor(bands, run)
    val shared = bands.toSeq.sortBy(_._1).filter { case (k, _) => run.contains(k) }
    val hard = shared.flatMap { case (name, band) =>
      val t = run(name)
      val cal = t / f
      if (t > hardLimit(band))
        Some(f"$name: ${t}%.2f s > raw limit ${hardLimit(band)}%.2f s (band ${band}%.2f)")
      else if (cal > hardLimit(band))
        Some(f"$name: ${cal}%.2f s calibrated (/$f%.2f) > limit ${hardLimit(band)}%.2f s (band ${band}%.2f)")
      else None
    }
    val gray = shared.flatMap { case (name, band) =>
      val cal = run(name) / f
      // ratio alone drowns the signal on sub-second bands (r13 driver lap:
      // 52 gray, nearly all 0.2-0.7 s bands off by scheduler jitter) — a
      // gray entry must ALSO exceed its band by 0.5 s absolute, calibrated,
      // so only drift worth half a second of wall time surfaces. Hard
      // limits are untouched.
      if (cal > band * grayRatio && cal - band > 0.5 &&
          cal <= hardLimit(band) && run(name) <= hardLimit(band))
        Some(f"$name: ${cal}%.2f s calibrated vs band ${band}%.2f s")
      else None
    }
    Report(f, hard, gray)
  }

  /** Queries [[Bench]] should re-time after its two laps: exactly those the
    * gate would hard-fail. Names are extracted from the message head — every
    * [[evaluate]] message starts with `"name: "` by construction.
    */
  def retryCandidates(bands: Map[String, Double], run: Map[String, Double]): Seq[String] =
    if (bands.isEmpty || run.isEmpty) Nil
    else evaluate(bands, run).hardFails.map(_.takeWhile(_ != ':')).sorted

  /** The full gate over raw JSON strings. Throws IllegalArgumentException
    * (with the offending queries in the message) on any violation:
    *
    *   - either side parsing to fewer than `minBands` entries (run counts
    *     parsed times PLUS failed names: a run with many failures must be
    *     reported as failures, not as a parser/format mismatch)
    *   - a failed list on either side
    *   - baseline queries absent from the run (a query that stops being
    *     timed is exactly the r3 failure mode)
    *   - any hard band failure per [[evaluate]]
    *
    * Returns the report (factor + gray list) for the caller to surface.
    */
  def check(baseJson: String, runJson: String, minBands: Int = 150): Report = {
    val (bands, baseFailed) = parse(baseJson)
    val (run, runFailed) = parse(runJson)
    require(bands.size >= minBands,
      s"baseline parsed to only ${bands.size} bands — parser/format mismatch, gate would be vacuous")
    require(run.size + runFailed.size >= minBands,
      s"bench run parsed to only ${run.size} queries + ${runFailed.size} failures — parser/format mismatch, gate would be vacuous")
    require(baseFailed.isEmpty, s"baseline itself records failures: ${baseFailed.sorted.mkString(", ")}")
    require(runFailed.isEmpty, s"bench run FAILED queries: ${runFailed.sorted.mkString(", ")}")
    val missing = bands.keySet -- run.keySet
    require(missing.isEmpty,
      s"queries in baseline but absent from the bench run (r3 failure mode): ${missing.toSeq.sorted.mkString(", ")}")
    val report = evaluate(bands, run)
    require(report.hardFails.isEmpty,
      s"${report.hardFails.size} queries out of band (host factor ${report.factor}):\n  ${report.hardFails.mkString("\n  ")}")
    report
  }
}
