package graftdrive
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object StressDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","64")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // 100M rows, 1000 groups, 10M distinct users: grouped sketch aggregation
    val n = 100000000L
    val df = spark.range(n).select(
      (col("id") % 1000).as("g"),
      concat(lit("u"), (col("id") % 10000000L)).as("v"))
    var t0 = System.nanoTime()
    val rows = df.groupBy("g").agg(
      graft.functions.GraftFunctions.hll_cardinality(col("v"), 4096).as("est"))
      .collect()
    val t1 = (System.nanoTime()-t0)/1e9
    val avgEst = rows.map(_.getDouble(1)).sum / rows.length
    println(f"DRIVE hll-grouped-100M: $t1%.1f s = ${n/t1/1e6}%.1f M rows/s, 1000 groups, avg est $avgEst%.0f (true 10k per group... distinct/group = 10000000/1000 interleaved -> each group sees 10k... actually id%%1000 x id%%1e7 -> each group sees 10000 distinct)")
    // minhash signatures over 1M synthetic docs
    val docs = spark.range(1000000L).select(col("id"),
      concat_ws(" ", (0 until 30).map(i => concat(lit("w"), pmod(col("id") * (i + 7), lit(997)))): _*).as("text"))
    t0 = System.nanoTime()
    val c = docs.select(graft.operators.Dedup.minhashSignature(col("text"), 64, 3).as("sig"))
      .select(element_at(col("sig"), 1)).agg(count(lit(1))).collect()(0).getLong(0)
    val t2 = (System.nanoTime()-t0)/1e9
    println(f"DRIVE minhash-1M-docs: $t2%.1f s = ${1000000/t2/1e3}%.0f K docs/s (n=$c)")
    // single-pass text_stats scoring (quality + langId) over the same 1M docs
    t0 = System.nanoTime()
    val scored = docs
      .withColumn("_ts", graft.operators.TextAnalysis.textStats(col("text")))
      .select(
        graft.operators.TextAnalysis.qualityScoreFrom(col("_ts")).as("q"),
        graft.operators.TextAnalysis.langIdFrom(col("_ts")).as("lang"))
      .agg(avg(col("q")), count(when(col("lang") =!= "und", 1))).collect()(0)
    val t3 = (System.nanoTime()-t0)/1e9
    println(f"DRIVE textstats-1M-docs: $t3%.1f s = ${1000000/t3/1e3}%.0f K docs/s (avg q ${scored.getDouble(0)}%.3f)")
    // sparse wire format: max-precision sketches over many small groups.
    // 10M rows, 100k groups x ~100 distinct each, k=2^18 (dense = 256 KiB):
    // without the sparse format this exchange would carry ~25 GB of buffers.
    t0 = System.nanoTime()
    val sk = spark.range(10000000L).select(
      (col("id") % 100000).as("g"), concat(lit("u"), col("id")).as("v"))
      .groupBy("g")
      .agg(graft.functions.GraftFunctions.hll_sketch_agg(col("v"), 1 << 18).as("sk"))
      .select(avg(length(col("sk"))).as("avg_bytes"), count(lit(1)).as("groups"))
      .collect()(0)
    val t4 = (System.nanoTime()-t0)/1e9
    println(f"DRIVE sparse-sketch-10M-100kgroups: $t4%.1f s, avg serialized sketch ${sk.getDouble(0)}%.0f B (dense would be ${(1 << 18) + 6} B)")
    // PQ at 1M vectors: codebooks from the real table, then encode + ADC
    // top-10 for 5 queries over 1M synthetic 64-dim vectors (deterministic
    // hash-derived components). The scan is (id, 8-byte code) only.
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val cbs = graft.operators.Similarity.fitPqCodebooks(emb, "embedding", "vec_id",
      m = 8, ksub = 16, sampleSize = 500)
    val vecs = spark.range(1000000L).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        i => (pmod(col("id") * (i + 13) + i * i, lit(1997)) - 998).cast("float") / 1000.0f)
        .cast("array<float>").as("embedding"))
    val q5 = vecs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    t0 = System.nanoTime()
    val topk = graft.operators.Similarity.pqTopK(vecs, "vec_id", "embedding",
      q5, "qid", "qvec", cbs, k = 10, refine = 4)
      .agg(count(lit(1))).collect()(0).getLong(0)
    val t5 = (System.nanoTime()-t0)/1e9
    println(f"DRIVE pq-adc-1M-vectors: $t5%.1f s = ${1000000/t5/1e3}%.0f K vec/s encode+scan x 5 queries (rows=$topk)")
    // Count-Min over 100M rows, 1000 groups: constant-size frequency state
    // per group across the exchange (depth 5 x width 2048 x 8 B = 80 KiB)
    t0 = System.nanoTime()
    val cmsRows = df.groupBy("g").agg(
      graft.functions.GraftFunctions.cms_sketch_agg(col("v"), 5, 2048).as("sk"))
      .select(count(lit(1))).collect()(0).getLong(0)
    val t6 = (System.nanoTime()-t0)/1e9
    println(f"DRIVE cms-grouped-100M: $t6%.1f s = ${n/t6/1e6}%.1f M rows/s, $cmsRows groups")
    // GK quantile sketches over 100M doubles, grouped then re-merged
    t0 = System.nanoTime()
    val gkP50 = spark.range(n).select((col("id") % 1000).as("g"),
        (pmod(col("id") * 2654435761L, lit(100000L)) / 100000.0).as("v"))
      .groupBy("g")
      .agg(graft.functions.GraftFunctions.gk_sketch_agg(col("v"), 0.01).as("gk"))
      .agg(graft.functions.GraftFunctions.gk_union_agg(col("gk")).as("gk"))
      .select(graft.functions.GraftFunctions.gk_quantile(col("gk"), lit(0.5)))
      .collect()(0).getDouble(0)
    val t7 = (System.nanoTime()-t0)/1e9
    println(f"DRIVE gk-grouped-100M: $t7%.1f s = ${n/t7/1e6}%.1f M rows/s, merged p50=$gkP50%.4f (true 0.5)")
    // upsert: 10M-row snapshot + 1M-row delta through the single keyed window
    val snap = spark.range(10000000L).select(col("id").as("k"),
      (col("id") % 97).cast("double").as("v"), lit(1L).as("ver"))
    val delta = spark.range(1000000L).select((col("id") * 10).as("k"),
      lit(-1.0).as("v"), lit(2L).as("ver"))
    t0 = System.nanoTime()
    val upCount = graft.operators.Upsert.upsert(snap, delta, Seq("k"), "ver")
      .agg(count(lit(1)), sum(when(col("v") === -1.0, 1L))).collect()(0)
    val t8 = (System.nanoTime()-t0)/1e9
    println(f"DRIVE upsert-10M+1M: $t8%.1f s = ${11000000/t8/1e6}%.1f M rows/s (rows=${upCount.getLong(0)}, updated=${upCount.getLong(1)})")
    // KMV: 100M rows, 1000 groups — <=8 KiB state per group across the
    // exchange; re-merge all 1000 stored sketches into the global estimate
    t0 = System.nanoTime()
    val kmvSk = df.groupBy("g").agg(
      graft.functions.GraftFunctions.kmv_sketch_agg(col("v"), 1024).as("sk"))
      .localCheckpoint()
    val kmvTotal = kmvSk.agg(graft.functions.GraftFunctions.kmv_estimate(
      graft.functions.GraftFunctions.kmv_union_agg(col("sk"))))
      .collect()(0).getDouble(0)
    val t9 = (System.nanoTime()-t0)/1e9
    println(f"DRIVE kmv-grouped-100M: $t9%.1f s = ${n/t9/1e6}%.1f M rows/s, re-merged est $kmvTotal%.0f (true 10000000)")
    // pairwise overlap on 100 stored sketches (4950 pair ops on KiB values;
    // the id%1000 construction makes every pair provably disjoint -> the
    // bottom-k sample structure must report jaccard exactly 0 for all)
    val ka = kmvSk.filter(col("g") < 100).select(col("g").as("ga"), col("sk").as("ska"))
    val kb = kmvSk.filter(col("g") < 100).select(col("g").as("gb"), col("sk").as("skb"))
    t0 = System.nanoTime()
    val ov = ka.join(kb, col("ga") < col("gb"))
      .select(graft.functions.GraftFunctions.kmv_jaccard(col("ska"), col("skb")).as("j"))
      .agg(count(lit(1)), max(col("j"))).collect()(0)
    val t10 = (System.nanoTime()-t0)/1e9
    println(f"DRIVE kmv-overlap-4950-pairs: $t10%.1f s (pairs=${ov.getLong(0)}, max jaccard=${ov.getDouble(1)}%.4f — disjoint by construction)")
    // SCD2 over a 30M-row history: 10M keys x 3 versions, 10%% change at
    // v2, a further 1%% at v3 — one keyed exchange, one shared sort
    val h1 = spark.range(10000000L).select(col("id").as("k"),
      (col("id") % 1000).cast("double").as("v"), lit(1).as("ver"))
    val h2 = h1.withColumn("v",
        when(col("k") % 10 === 0, col("v") + 1.0).otherwise(col("v")))
      .withColumn("ver", lit(2))
    val h3 = h2.withColumn("v",
        when(col("k") % 100 === 0, col("v") + 2.0).otherwise(col("v")))
      .withColumn("ver", lit(3))
    t0 = System.nanoTime()
    val scdN = graft.operators.Upsert.scd2(
        h1.unionByName(h2).unionByName(h3), Seq("k"), Seq("v"), "ver")
      .agg(count(lit(1)), sum(when(col("is_current"), 1L))).collect()(0)
    val t11 = (System.nanoTime()-t0)/1e9
    println(f"DRIVE scd2-30M-history: $t11%.1f s = ${30000000/t11/1e6}%.1f M rows/s (change points=${scdN.getLong(0)}, current=${scdN.getLong(1)})")
    spark.stop()
  }
}
