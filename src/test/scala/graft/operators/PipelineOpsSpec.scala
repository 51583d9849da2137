package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** JoinStats / Upsert / Profile — the pipeline-management operators. */
class PipelineOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("join-size estimate: FK->PK and many-to-many uniform cases") {
    import spark.implicits._
    // fact: 1000 keys x 3 rows; dim: the same 1000 keys once -> 3000 rows
    val fact = (0 until 1000).flatMap(k => Seq.fill(3)(k.toLong)).toDF("fk")
    val dim = (0 until 1000).map(_.toLong).toDF("pk")
    val est1 = JoinStats.equiJoinSizeEstimate(fact, "fk", dim, "pk")
      .collect()(0).getLong(0)
    assert(math.abs(est1 - 3000.0) / 3000.0 < 0.1, s"FK->PK estimate $est1 vs 3000")
    // many-to-many: 3 x 2 copies per key -> 6 rows per key
    val b2 = (0 until 1000).flatMap(k => Seq.fill(2)(k.toLong)).toDF("pk")
    val est2 = JoinStats.equiJoinSizeEstimate(fact, "fk", b2, "pk")
      .collect()(0).getLong(0)
    assert(math.abs(est2 - 6000.0) / 6000.0 < 0.1, s"MxN estimate $est2 vs 6000")
    // null keys never join and must not bias the estimate
    val withNulls = fact.union(Seq.fill(500)(None: Option[Long]).toDF("fk"))
    val est3 = JoinStats.equiJoinSizeEstimate(withNulls, "fk", dim, "pk")
      .collect()(0).getLong(0)
    assert(math.abs(est3 - 3000.0) / 3000.0 < 0.1, s"null-key estimate $est3 vs 3000")
  }

  test("upsert: update beats snapshot, insert lands, stale version loses") {
    import spark.implicits._
    val snap = Seq(
      (1L, "a", 5L), (2L, "b", 5L), (3L, "c", 5L)
    ).toDF("id", "v", "ver")
    val delta = Seq(
      (2L, "b2", 5L),  // same version: delta wins the tie
      (3L, "c0", 1L),  // STALE delta: snapshot keeps its newer row
      (4L, "d", 7L)    // brand-new key: insert
    ).toDF("id", "v", "ver")
    val out = Upsert.upsert(snap, delta, Seq("id"), "ver")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "b2", 3L -> "c", 4L -> "d"))
  }

  test("scd2: change points only, intervals chain, null-value transitions detected") {
    import spark.implicits._
    val hist = Seq(
      // key 1: a -> a -> b   (change at v3)
      (1L, Option("a"), 1), (1L, Option("a"), 2), (1L, Option("b"), 3),
      // key 2: never changes
      (2L, Option("x"), 1), (2L, Option("x"), 2), (2L, Option("x"), 3),
      // key 3: null -> y -> null  (null transitions must both count)
      (3L, None: Option[String], 1), (3L, Option("y"), 2), (3L, None: Option[String], 3)
    ).toDF("id", "v", "ver")
    val out = Upsert.scd2(hist, Seq("id"), Seq("v"), "ver")
      .select("id", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) 0 else r.getInt(2), r.getBoolean(3))).toSet
    assert(out == Set(
      (1L, 1, 3, false), (1L, 3, 0, true),
      (2L, 1, 0, true),
      (3L, 1, 2, false), (3L, 2, 3, false), (3L, 3, 0, true)))
  }

  test("scd2 rejects a version column named like an output column") {
    import spark.implicits._
    val hist = Seq((1L, "a", 1)).toDF("id", "v", "valid_from")
    intercept[IllegalArgumentException] {
      Upsert.scd2(hist, Seq("id"), Seq("v"), "valid_from")
    }
  }

  test("snapshot diff: added/removed/changed/unchanged all classified") {
    import spark.implicits._
    val before = Seq(
      (1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0)
    ).toDF("id", "price")
    val after = Seq(
      (1L, 10.0),   // unchanged
      (2L, 25.0),   // changed
      // 3 removed
      (4L, 40.0),   // unchanged
      (5L, 50.0)    // added
    ).toDF("id", "price")
    val out = Upsert.snapshotDiff(before, after, Seq("id"), Seq("price"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("added" -> 1L, "removed" -> 1L, "changed" -> 1L,
      "unchanged" -> 2L))
  }

  test("snapshot delta: exactly the added+changed AFTER rows, null drift included") {
    import spark.implicits._
    val before = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("d"))
    ).toDF("id", "v")
    val after = Seq(
      (1L, Some("a")),   // unchanged -> excluded
      (2L, None),        // value -> null: changed
      (3L, Some("c")),   // null -> value: changed
      // 4 removed -> must NOT appear (delta is after-side only)
      (5L, Some("e"))    // added
    ).toDF("id", "v")
    val out = Upsert.snapshotDelta(before, after, Seq("id"), Seq("v"))
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)), r.getString(2))).toSet
    assert(out == Set(
      (2L, None, "changed"),
      (3L, Some("c"), "changed"),
      (5L, Some("e"), "added")))
  }

  test("incremental rollup equals full rebuild under any batch split") {
    import spark.implicits._
    val raw = (0 until 5000).map(i =>
      (s"k${i % 7}", s"g${i % 3}", i.toLong, (i * 13 % 97).toLong))
      .toDF("k1", "k2", "v1", "v2")
    val full = Upsert.rollup(raw, Seq("k1", "k2"), Seq("v1", "v2"))
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val want = m(full)
    // three different splits, incl. empty delta and delta-only keys
    Seq(
      (col("v1") % 5 =!= 0, col("v1") % 5 === 0),
      (lit(true), lit(false)),
      (col("k1") =!= "k6", col("k1") === "k6") // k6 arrives only via delta
    ).foreach { case (baseCond, deltaCond) =>
      val stored = Upsert.rollup(raw.filter(baseCond), Seq("k1", "k2"), Seq("v1", "v2"))
      val maintained = Upsert.incrementalRollup(
        stored, raw.filter(deltaCond), Seq("k1", "k2"), Seq("v1", "v2"))
      assert(m(maintained) == want, s"split $baseCond diverged")
    }
    // chained increments: fold three deltas one at a time
    val parts = Seq(0, 1, 2).map(r => raw.filter(col("v1") % 3 === r))
    val chained = parts.tail.foldLeft(
      Upsert.rollup(parts.head, Seq("k1", "k2"), Seq("v1", "v2"))) {
      (acc, d) => Upsert.incrementalRollup(acc, d, Seq("k1", "k2"), Seq("v1", "v2"))
    }
    assert(m(chained) == want)
  }

  test("funnel: order matters, out-of-order stages don't count") {
    import spark.implicits._
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"),
      // user 2: purchase BEFORE view/click -> only reaches stage 2
      (2L, 1L, "purchase"), (2L, 2L, "view"), (2L, 3L, "click"),
      // user 3: view only
      (3L, 1L, "view"),
      // user 4: click with no prior view -> reaches nothing
      (4L, 1L, "click"), (4L, 2L, "purchase"),
      // user 5: interleaved noise, still completes
      (5L, 1L, "view"), (5L, 2L, "error"), (5L, 3L, "click"),
      (5L, 4L, "view"), (5L, 5L, "purchase")
    ).map { case (u, t, ty) => (u, new java.sql.Timestamp(t * 1000), ty) }
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(out == Map(0 -> 4L, 1 -> 3L, 2 -> 2L))
    // one exchange on user_id: the chained windows and the per-user rollup
    // must reuse a single hash partitioning
    val plan = Funnel.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("hashpartitioning(user_id"))
    assert(exchanges <= 1, s"funnel must shuffle events once, saw $exchanges:\n$plan")
  }

  test("funnel: a repeated stage type needs two occurrences") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, "click"),                    // one click: reaches stage 0 only
      (2L, 1L, "click"), (2L, 2L, "click")  // two clicks: completes both
    ).map { case (u, t, ty) => (u, new java.sql.Timestamp(t * 1000), ty) }
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.funnel(ev, "user_id", "ts", "event_type",
        Seq("click", "click"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(out == Map(0 -> 2L, 1 -> 1L),
      "a single event must not satisfy two consecutive identical stages")
  }

  test("snapshot diff: null-position shifts between compare columns are 'changed'") {
    import spark.implicits._
    // xxhash64 skips null children — without per-column null flags these
    // two rows would hash identically and misreport 'unchanged'
    val before = Seq((1L, Some("x"), None: Option[String])).toDF("id", "a", "b")
    val after = Seq((1L, None: Option[String], Some("x"))).toDF("id", "a", "b")
    val out = Upsert.snapshotDiff(before, after, Seq("id"), Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("changed" -> 1L))
  }

  test("profile: nulls/min/max exact, distinct estimate tight, single pass") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("x")), (Some(2L), None),
      (Some(2L), Some("y")), (None, Some("x"))
    ).toDF("num", "s")
    val rows = Profile.profile(df, Seq("num", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("num").getLong(1) == 4L)           // n_rows
    assert(rows("num").getLong(2) == 1L)           // n_nulls
    assert(rows("num").getString(3) == "1")        // min_s
    assert(rows("num").getString(4) == "2")        // max_s
    assert(math.abs(rows("num").getDouble(5) - 2.0) < 0.1)
    assert(rows("s").getLong(2) == 1L)
    assert(rows("s").getString(3) == "x" && rows("s").getString(4) == "y")
    assert(math.abs(rows("s").getDouble(5) - 2.0) < 0.1)
    // the point of the HLL profiler: one aggregation, no Expand multiplying
    // the input N-columns-fold before the shuffle
    val plan = Profile.profile(df, Seq("num", "s"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"profile must not plan an Expand:\n$plan")
  }
}
