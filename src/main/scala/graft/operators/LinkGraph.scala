package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Host-level link-graph analytics over crawl outlink edges — the standard
  * Common-Crawl-style seed ranker: a host linked to by many well-linked
  * hosts is a better crawl investment than an orphan, and host centrality
  * is the quality prior every large-scale web corpus curation uses
  * (OPIC/PageRank-family; public formulations in Page et al. '99 and the
  * Common Crawl host-level ranks dataset).
  *
  * Design decisions, all for replayability and scale:
  *
  *  - HOST grain, not URL grain: the same reduction argument as
  *    `tx_frontier_shard` — reduce the 100 TB edge stream to the ~10^8-row
  *    host graph FIRST, then iterate on that. Degree counting and each
  *    rank iteration shuffle host-grain rows only.
  *  - INTEGER arithmetic: ranks are scaled longs (start 1,000,000; damping
  *    as `* 17 div 20` = 0.85; per-edge share as `div out_deg`). Exact in
  *    any engine — the DuckDB oracle replays all iterations bit-for-bit,
  *    which float PageRank cannot promise (sum order changes the answer).
  *  - Bounded iterations with lineage truncation: `iters` is a hard cap
  *    (like `Redirects.resolve`'s maxHops) and the rank state is
  *    `localCheckpoint`ed on a cadence so the iterative plan never
  *    compounds. The edge set is checkpointed ONCE and reused by every
  *    iteration — never re-derived per round.
  *  - Dangling mass is dropped, not redistributed (a host with no
  *    out-edges contributes nothing) — the OPIC-style simplification;
  *    fine for a relative seed ranking, documented so nobody reads these
  *    as calibrated PageRank probabilities.
  */
object LinkGraph {

  /** Per-iteration damped share: rank * 17/20 (integer), split across
    * out-edges by integer division. Exposed for the spec.
    */
  final val InitialRank = 1000000L
  final val BaseRank = 150000L

  /** Rank hosts by `iters` rounds of integer damped contribution passing
    * over the DISTINCT self-loop-free edge set. Returns one row per host:
    * (host, out_deg, in_deg, rank) — degrees of the deduped graph, rank
    * after the final iteration.
    */
  def rankHosts(edges0: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, smallGraphLimit: Long = 1000000L): DataFrame =
    rankedFrom(edges0, srcCol, dstCol, iters, warm = None, smallGraphLimit)

  /** Incremental maintenance of [[rankHosts]] — the daily-crawl shape: a
    * new epoch contributes DELTA edges, and recomputing from the cold
    * `InitialRank` vector every day re-pays the whole convergence run. A
    * WARM start from yesterday's rank vector runs the SAME integer
    * iteration over the merged edge set, so:
    *
    *  - hosts carried over start at their previous rank, brand-new hosts
    *    seed at `InitialRank`, hosts whose edges all vanished drop out;
    *  - the fixed points agree: the damped integer map contracts toward
    *    the same terminal state from any start, so once both runs pass
    *    their convergence horizon, warm-started ranks EQUAL the full
    *    rebuild's — `tx_link_rank_delta`'s oracle IS the cold rebuild,
    *    and the continuation identity (delta with no edge changes ==
    *    the cold run with k more iterations) is spec-pinned exactly;
    *  - what is saved at 10^8 hosts: the page-grain -> host-grain edge
    *    reduction runs over the DELTA only (see [[mergeEdges]] — the
    *    100 TB part of the job), and the warm vector sits near the new
    *    fixed point so far fewer O(E) iteration rounds are needed to
    *    re-converge. Honest bound: each remaining round still touches
    *    every edge — the win is in ROUNDS and in the skipped rebuild of
    *    the edge set, not in per-round cost.
    *
    * CAVEAT (why no iterate-until-unchanged mode exists): integer floors
    * can park the iteration in a tiny limit cycle (period 2, ±1 ulp on a
    * few hosts) instead of a strict fixed point, so "run until unchanged"
    * may never terminate. Iteration counts stay explicit and bounded,
    * like [[rankHosts]] and `Redirects.resolve`.
    */
  def rankDelta(prevRank: DataFrame, hostCol: String, rankCol: String,
      edges0: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, smallGraphLimit: Long = 1000000L): DataFrame =
    rankedFrom(edges0, srcCol, dstCol, iters,
      warm = Some(prevRank.select(
        col(hostCol).as("host"), col(rankCol).cast("long").as("prev_rank"))),
      smallGraphLimit)

  /** Fold an edge delta into a stored edge set: adds are unioned (dedup),
    * removes are anti-joined, all on (src, dst). At 100 TB this is the
    * step that makes [[rankDelta]] incremental — only the DELTA pays the
    * page-grain -> host-grain extraction; the stored host edges (tiny by
    * comparison) fold in one distinct + one anti-join.
    */
  def mergeEdges(prev: DataFrame, adds: DataFrame, removes: DataFrame,
      srcCol: String, dstCol: String): DataFrame = {
    def norm(df: DataFrame) = df.select(col(srcCol), col(dstCol))
    norm(prev).unionByName(norm(adds)).distinct()
      .join(norm(removes), Seq(srcCol, dstCol), "left_anti")
  }

  /** Driver/distributed crossover in EDGES (`smallGraphLimit`), the
    * [[graft.operators.Dedup]] `connectedComponents` pattern (r14, guide
    * §1.2 "the distributed algorithm"): below the limit, `iters` rounds of
    * damped contribution passing cost more in per-round scheduling (2-3
    * exchanges + a lineage checkpoint every second round, each an AQE
    * stage job) than the whole graph costs to collect once — the measured
    * r14 profile had `tx_link_rank_delta` at 88 jobs / 3.6 s wall for 20
    * hosts. The driver path replays the IDENTICAL integer arithmetic
    * (bit-equality asserted against the distributed path in
    * LinkGraphSpec), so results are indistinguishable. At 10^8 hosts the
    * edge count blows the limit and the distributed path below is what
    * runs — the same honest bound as the union-find hybrid.
    */
  private def rankedFrom(edges0: DataFrame, srcCol: String, dstCol: String,
      iters: Int, warm: Option[DataFrame], smallGraphLimit: Long): DataFrame = {
    require(iters >= 1 && iters <= 64, s"rankHosts: iters in [1,64], got $iters")
    // the graph every stage shares: dedup + self-loop drop, materialized
    // once (every iteration and both degree counts re-read it)
    val edges = edges0
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    if (edges.count() <= smallGraphLimit)
      return rankedOnDriver(edges, iters, warm)
    val outDeg = edges.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
    val inDeg = edges.groupBy(col("dst")).agg(count(lit(1)).as("in_deg"))
    val nodes = edges.select(col("src").as("host"))
      .union(edges.select(col("dst").as("host")))
      .distinct()
      .localCheckpoint()
    // every src has out_deg >= 1 by construction (it appears in an edge)
    val edgesDeg = edges.join(outDeg, Seq("src"))
    var rank = warm match {
      case None => nodes.withColumn("rank", lit(InitialRank))
      case Some(prev) =>
        // carried hosts warm-start, new hosts seed cold, gone hosts drop
        // (the join against current nodes). Checkpoint: prev is usually
        // itself the product of an iterative plan — cut that lineage
        // before stacking more iterations on top.
        nodes.join(prev, Seq("host"), "left")
          .select(col("host"),
            coalesce(col("prev_rank"), lit(InitialRank)).as("rank"))
          .localCheckpoint()
    }
    var i = 0
    while (i < iters) {
      val contrib = edgesDeg
        .join(rank.withColumnRenamed("host", "src"), Seq("src"))
        .select(col("dst").as("host"),
          expr(s"(rank * 17 div 20) div out_deg").as("c"))
        .groupBy(col("host")).agg(sum(col("c")).as("contrib"))
      rank = nodes.join(contrib, Seq("host"), "left")
        .select(col("host"),
          (lit(BaseRank) + coalesce(col("contrib"), lit(0L))).as("rank"))
      i += 1
      if (i % 2 == 0 && i < iters) rank = rank.localCheckpoint()
    }
    nodes
      .join(outDeg.withColumnRenamed("src", "host"), Seq("host"), "left")
      .join(inDeg.withColumnRenamed("dst", "host"), Seq("host"), "left")
      .join(rank, Seq("host"))
      .select(col("host"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        col("rank"))
  }

  /** The small-graph driver path: the same dedup'd edge set, the same
    * integer damped-contribution iteration, computed in one collect. Kept
    * EXACTLY parallel to the distributed plan above — every divergence
    * would be a silent wrong answer, so: integer division is plain Long `/`
    * (operands are nonnegative by construction, matching SQL `div`),
    * dangling hosts take BaseRank once contribution passing starts, warm
    * hosts not in the current node set drop, new hosts seed at
    * [[InitialRank]].
    */
  private def rankedOnDriver(edges: DataFrame, iters: Int,
      warm: Option[DataFrame]): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val es = edges.as[(String, String)].collect()
    val outDeg = scala.collection.mutable.HashMap.empty[String, Long]
    val inDeg = scala.collection.mutable.HashMap.empty[String, Long]
    es.foreach { case (s, d) =>
      outDeg.update(s, outDeg.getOrElse(s, 0L) + 1L)
      inDeg.update(d, inDeg.getOrElse(d, 0L) + 1L)
    }
    val nodes: Array[String] = (outDeg.keysIterator ++ inDeg.keysIterator)
      .toSet.toArray
    val warmMap: Map[String, Long] = warm match {
      case None => Map.empty
      case Some(prev) => prev.as[(String, Long)].collect().toMap
    }
    var rank: scala.collection.Map[String, Long] =
      nodes.iterator.map(h => h -> warmMap.getOrElse(h, InitialRank)).toMap
    var i = 0
    while (i < iters) {
      val contrib = scala.collection.mutable.HashMap.empty[String, Long]
      es.foreach { case (s, d) =>
        val c = rank(s) * 17L / 20L / outDeg(s)
        contrib.update(d, contrib.getOrElse(d, 0L) + c)
      }
      rank = nodes.iterator
        .map(h => h -> (BaseRank + contrib.getOrElse(h, 0L))).toMap
      i += 1
    }
    val out = nodes.sorted.toSeq.map(h =>
      (h, outDeg.getOrElse(h, 0L), inDeg.getOrElse(h, 0L), rank(h)))
    spark.createDataset(out).toDF("host", "out_deg", "in_deg", "rank")
  }

  /** Host-grain edges from page-level outlink pairs: (page_url, dst_url) ->
    * distinct (src_host, dst_host) with self-loops dropped — the reduction
    * [[rankHosts]] wants done FIRST at scale.
    */
  def hostEdges(links: DataFrame, srcUrlCol: String, dstUrlCol: String): DataFrame =
    links.select(
        parse_url(col(srcUrlCol), lit("HOST")).as("src_host"),
        parse_url(col(dstUrlCol), lit("HOST")).as("dst_host"))
      .filter(col("src_host").isNotNull && col("dst_host").isNotNull &&
        col("src_host") =!= col("dst_host"))
      .distinct()

  /** Allocate an integer fetch budget of exactly `total` pages across hosts
    * proportionally to a weight column (typically [[rankHosts]]'s rank) —
    * the step that turns a seed RANKING into a crawl PLAN. Deterministic,
    * pure integer arithmetic, and `sum(alloc) == total` exactly, so the
    * plan is replayable by any SQL engine and auditable to the page.
    *
    * Two-level apportionment, shaped for a ~10^8-host table:
    *
    *  1. ACROSS SHARDS (caller-provided `shardCol`, any deterministic
    *     host->shard map; hash at scale, arithmetic in oracles): per-shard
    *     weight sums reduce the problem to `nShards` rows, which get exact
    *     largest-remainder (Hamilton) apportionment — base `total*W_s div
    *     W`, the `total - sum(base)` leftover going to the largest
    *     `(total*W_s) mod W` remainders (ties by shard asc). The only
    *     unpartitioned window runs over these nShards rows — bounded by
    *     construction, never by data.
    *  2. WITHIN EACH SHARD (window partitioned by shard, hosts ordered
    *     asc): cumulative-rounding — `alloc_i = B_s*cum_i div W_s -
    *     B_s*cum_(i-1) div W_s`. The telescoping sum is exactly B_s, and
    *     every host gets the floor or ceiling of its proportional share.
    *
    * Weights must be NONNEGATIVE (ranks are; a negative weight would break
    * the cumulative-rounding monotonicity). Zero-weight hosts (and whole
    * zero-weight shards) allocate 0. Overflow bounds — there are TWO
    * binding products, both guarded in the plan itself (a `raise_error`
    * folded into the budget column, so Catalyst cannot prune the check):
    * level 1 computes `total * W_s` (budget x per-shard weight SUM) and
    * level 2 computes `B_s * cum_i <= B_s * W_s` (per-shard budget x the
    * same sum). With ranks scaled to ~10^6 and ~10^5 hosts per shard,
    * W_s ~ 10^11, so budgets to ~10^7 pages PER SHARD are safe — shard
    * harder (or pre-scale weights down) before raising the budget; the
    * guard turns a silent wrap into a loud per-shard error.
    *
    * Returns (hostCol, shardCol, weightCol, alloc).
    */
  def allocateBudget(hosts: DataFrame, hostCol: String, weightCol: String,
      shardCol: String, total: Long): DataFrame = {
    require(total >= 0, s"allocateBudget: total must be >= 0, got $total")
    val w = org.apache.spark.sql.expressions.Window
    val shardW = hosts
      .groupBy(col(shardCol))
      .agg(sum(col(weightCol)).as("_ws"))
    val grand = shardW.agg(sum(col("_ws")).as("_w")) // single row
    // level-1 guard: `total * _ws` must fit a long. total is a Scala
    // literal, so the per-shard bound is a constant the scan can test.
    val maxWs = if (total > 0) Long.MaxValue / total else Long.MaxValue
    val shardBudget = shardW
      .withColumn("_ws",
        when(col("_ws") > maxWs,
          raise_error(concat(lit(s"allocateBudget: total=$total times shard weight "),
            col("_ws"), lit(" overflows long — shard harder or pre-scale weights")))
            .cast("long"))
          .otherwise(col("_ws")))
      .crossJoin(broadcast(grand)) // single-row stat join
      .withColumn("_base", expr(s"$total * _ws div _w"))
      .withColumn("_rem", expr(s"($total * _ws) % _w"))
      .withColumn("_leftover", lit(total) - sum(col("_base")).over(w.partitionBy()))
      // bounded window: nShards rows by construction, never data-sized
      .withColumn("_pos", row_number().over(
        w.orderBy(col("_rem").desc, col(shardCol).asc)))
      .select(col(shardCol),
        when(col("_ws") === 0, lit(0L))
          .otherwise(col("_base") +
            when(col("_pos") <= col("_leftover"), 1L).otherwise(0L)).as("_bs"),
        col("_ws"))
      // level-2 guard: the within-shard pass computes `_bs * _cum` with
      // `_cum <= _ws`, so `_bs * _ws` fitting a long covers every row.
      // Folded into `_bs` itself (not a dead column) so it survives pruning.
      .withColumn("_bs",
        when(col("_bs") > 0 && col("_ws") > expr(s"${Long.MaxValue}L div _bs"),
          raise_error(concat(lit("allocateBudget: shard budget "), col("_bs"),
            lit(" times shard weight "), col("_ws"),
            lit(" overflows long — shard harder or pre-scale weights")))
            .cast("long"))
          .otherwise(col("_bs")))
    val perShard = w.partitionBy(col(shardCol)).orderBy(col(hostCol))
    hosts
      .join(broadcast(shardBudget), Seq(shardCol))
      .withColumn("_cum", sum(col(weightCol)).over(perShard))
      .withColumn("alloc",
        when(col("_ws") === 0, lit(0L)).otherwise(
          expr("_bs * _cum div _ws") -
            expr(s"_bs * (_cum - `$weightCol`) div _ws")))
      .select(col(hostCol), col(shardCol), col(weightCol), col("alloc"))
  }

  /** Close the politeness-capacity loop: re-apportion the budget a
    * Crawl-Delay cap takes away from slow hosts onto hosts with headroom.
    *
    * [[allocateBudget]] splits a budget by rank; a host's Crawl-Delay then
    * bounds what an epoch can PHYSICALLY fetch (`capacity`), and
    * `effective = least(alloc, capacity)` strands `spill = alloc -
    * effective` pages — without this pass they are simply lost from the
    * epoch. One more exact apportionment round moves
    * `redis = least(sum(spill), sum(headroom))` onto the hosts with
    * `headroom = capacity - effective`, WEIGHTED BY HEADROOM (a host can
    * only absorb what its own delay allows), capped by construction:
    *
    *  - level 1 (largest remainder over per-shard headroom sums): the
    *    per-shard bonus `B_s <= H_s` exactly — `redis <= H` makes the
    *    floor share `< H_s` whenever a `+1` can land, and `redis == H`
    *    zeroes every remainder;
    *  - level 2 (cumulative rounding, weight = headroom): `B_s <= H_s`
    *    bounds every host's bonus by its own headroom.
    *
    * So `bonus <= headroom` per host with NO iteration — one round is
    * final, and `sum(final_alloc) == min(sum(alloc), sum(capacity))`
    * exactly (pages are only unallocated when the whole fleet is at
    * physical capacity). Pure integer arithmetic; every division replays
    * in any SQL engine. Same overflow guards and bounded-window shape as
    * [[allocateBudget]]: the only unpartitioned window runs over nShards
    * rows.
    *
    * Input needs (hostCol, shardCol, allocCol, capacityCol); returns
    * (hostCol, shardCol, alloc, capacity, effective, spill, bonus,
    * final_alloc) with `final_alloc = effective + bonus`.
    */
  def reallocateSpill(capped: DataFrame, hostCol: String, shardCol: String,
      allocCol: String, capacityCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val base = capped.select(col(hostCol), col(shardCol),
        col(allocCol).cast("long").as("alloc"),
        col(capacityCol).cast("long").as("capacity"))
      .withColumn("effective", least(col("alloc"), col("capacity")))
      .withColumn("headroom", col("capacity") - col("effective"))
      .withColumn("spill", col("alloc") - col("effective"))
    val totals = base
      .agg(coalesce(sum(col("spill")), lit(0L)).as("_spill_total"),
        coalesce(sum(col("headroom")), lit(0L)).as("_head_total"))
      .withColumn("_redis", least(col("_spill_total"), col("_head_total")))
    val shardBonus = base
      .groupBy(col(shardCol)).agg(sum(col("headroom")).as("_hs"))
      .crossJoin(broadcast(totals)) // single-row stat join
      // level-1 guard: `_redis * _hs` must fit a long (same discipline as
      // allocateBudget — folded into the live column, not prunable)
      .withColumn("_hs",
        when(col("_redis") > 0 && col("_hs") > expr(s"${Long.MaxValue}L div _redis"),
          raise_error(concat(lit("reallocateSpill: spill "), col("_redis"),
            lit(" times shard headroom "), col("_hs"),
            lit(" overflows long — shard harder")))
            .cast("long"))
          .otherwise(col("_hs")))
      .withColumn("_base", when(col("_head_total") === 0, lit(0L))
        .otherwise(expr("_redis * _hs div _head_total")))
      .withColumn("_rem", when(col("_head_total") === 0, lit(0L))
        .otherwise(expr("(_redis * _hs) % _head_total")))
      .withColumn("_leftover", col("_redis") - sum(col("_base")).over(w.partitionBy()))
      // bounded window: nShards rows by construction, never data-sized
      .withColumn("_pos", row_number().over(
        w.orderBy(col("_rem").desc, col(shardCol).asc)))
      .select(col(shardCol),
        when(col("_hs") === 0, lit(0L))
          .otherwise(col("_base") +
            when(col("_pos") <= col("_leftover"), 1L).otherwise(0L)).as("_bs"),
        col("_hs"))
      // level-2 guard: within-shard pass computes `_bs * _cum <= _bs * _hs`
      .withColumn("_bs",
        when(col("_bs") > 0 && col("_hs") > expr(s"${Long.MaxValue}L div _bs"),
          raise_error(concat(lit("reallocateSpill: shard bonus "), col("_bs"),
            lit(" times shard headroom "), col("_hs"),
            lit(" overflows long — shard harder")))
            .cast("long"))
          .otherwise(col("_bs")))
    val perShard = w.partitionBy(col(shardCol)).orderBy(col(hostCol))
    base
      .join(broadcast(shardBonus), Seq(shardCol))
      .withColumn("_cum", sum(col("headroom")).over(perShard))
      .withColumn("bonus",
        when(col("_hs") === 0, lit(0L)).otherwise(
          expr("_bs * _cum div _hs") - expr("_bs * (_cum - headroom) div _hs")))
      .select(col(hostCol), col(shardCol), col("alloc"), col("capacity"),
        col("effective"), col("spill"), col("bonus"),
        (col("effective") + col("bonus")).as("final_alloc"))
  }
}
