package graftdrive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-5 (second batch) scale stress: HTML extraction, unicode cleanup,
  * int8 embedding quantization, and the GK/MG wire paths, measured at the
  * sizes where the scale story has to hold (run manually via
  * `sbt 'Test/runMain graftdrive.StressDriveR5b'`; results in BASELINE.md).
  */
object StressDriveR5b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 1. html_to_text at 2M pages (~1.3 KB each): fabricate once, time the
    // map-only extraction (the shape of the first pass over a crawl dump)
    val pages = spark.range(2000000L).select(col("id"),
        concat(
          lit("<html><head><title>p</title><style>body{margin:0}</style></head><body><!-- c -->"),
          lit("<h1>Page "), col("id"), lit("</h1>"),
          lit(("<p>the quick brown fox &amp; seventeen magpies argue about " +
            "parquet footers &lt;inline&gt; while shuffle partitions idle</p>") * 8),
          lit("<script>var x = 1 < 2 && \"</p>\";</script></body></html>")).as("html"))
      .localCheckpoint()
    val htmlBytes = pages.select(sum(length(col("html")))).collect()(0).getLong(0)
    var t0 = System.nanoTime()
    pages.select(graft.operators.TextAnalysis.htmlToText(col("html")).as("t"))
      .write.format("noop").mode("overwrite").save()
    val t1 = (System.nanoTime() - t0) / 1e9
    println(f"DRIVE html-extract-2M: $t1%.1f s = ${2.0e6 / t1 / 1e3}%.1f K pages/s, ${htmlBytes / t1 / 1e6}%.0f MB/s")

    // 2. unicodeClean at 10M strings (mostly already-NFC: the fast path that
    // must not allocate)
    val strs = spark.range(10000000L).select(
        concat(lit("document body segment "), col("id"),
          lit(" café overflow")).as("s"))
      .localCheckpoint()
    t0 = System.nanoTime()
    strs.select(graft.operators.TextAnalysis.unicodeClean(col("s")).as("t"))
      .write.format("noop").mode("overwrite").save()
    val t2 = (System.nanoTime() - t0) / 1e9
    println(f"DRIVE unicode-clean-10M: $t2%.1f s = ${1.0e7 / t2 / 1e6}%.1f M rows/s")

    // 3. int8 quantization at 1M x 64-dim vectors: one-pass calibration
    // aggregate, then map-only quantize+dequantize
    val vecs = spark.range(1000000L).select(col("id"),
        expr("transform(sequence(0, 63), j -> float(sin(id * (j + 1) * 0.37)))").as("v"))
      .localCheckpoint()
    t0 = System.nanoTime()
    val mm = vecs.agg(graft.functions.GraftFunctions.vec_minmax_agg(col("v")).as("r"))
      .localCheckpoint()
    val tCal = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    vecs.crossJoin(broadcast(mm))
      .select(graft.functions.GraftFunctions.vec_quantize8(col("v"), col("r")).as("q"))
      .write.format("noop").mode("overwrite").save()
    val tQ = (System.nanoTime() - t0) / 1e9
    println(f"DRIVE vec-quantize-1M-x64: calibrate $tCal%.1f s, quantize $tQ%.1f s = ${1.0e6 / tQ / 1e3}%.0f K vecs/s (4x smaller)")

    // 4. GK sketch + row wire at 10M rows: grouped build (8 groups), export,
    // import-parity, replayed median in bound — the warehouse path end to end
    val nums = spark.range(10000000L).select((col("id") % 8).as("g"),
        (pow(rand(42), 4.0) * 1000.0).as("x"))
      .localCheckpoint()
    t0 = System.nanoTime()
    val gk = nums.groupBy(col("g"))
      .agg(graft.functions.GraftFunctions.gk_sketch_agg(col("x"), 0.01).as("sk"))
      .withColumn("w", graft.functions.GraftFunctions.gk_export(col("sk")))
      .localCheckpoint()
    val tGk = (System.nanoTime() - t0) / 1e9
    val parity = gk.select(
        (graft.functions.GraftFunctions.gk_import(col("w")) === col("sk")).as("ok"),
        size(col("w.tuples")).as("nt"))
      .agg(min(col("ok")), max(col("nt"))).collect()(0)
    println(f"DRIVE gk-wire-10M: build+export $tGk%.1f s = ${1.0e7 / tGk / 1e6}%.1f M rows/s, " +
      s"roundtrip=${parity.getBoolean(0)}, max ${parity.getInt(1)} tuples/group")

    // 5. MG sketch wire at 10M rows, 1009 distinct keys, capacity 2048
    // (exact regime): stored-binary build + export + exactness
    t0 = System.nanoTime()
    val mg = spark.range(10000000L)
      .select(concat(lit("key"), col("id") % 1009).as("k"))
      .agg(graft.functions.GraftFunctions.topk_export(
        graft.functions.GraftFunctions.topk_sketch_agg(col("k"), 2048)).as("w"))
      .select(size(col("w.entries")).as("n"),
        aggregate(transform(col("w.entries"), e => e.getField("n")),
          lit(0L), (a, b) => a + b).as("total"))
      .collect()(0)
    val tMg = (System.nanoTime() - t0) / 1e9
    println(f"DRIVE topk-wire-10M: $tMg%.1f s = ${1.0e7 / tMg / 1e6}%.1f M rows/s, " +
      s"${mg.getInt(0)} entries, total=${mg.getLong(1)} (exact)")

    // 6. Deep profile at 10M rows: 1 numeric + 2 categorical columns in ONE
    // partial-aggregated scan (HLL + GK + MG state per column, no Expand)
    val wide = spark.range(10000000L).select(
        (rand(7) * 100000.0).as("price"),
        concat(lit("s"), (col("id") % 5)).as("status"),
        concat(lit("p"), (col("id") % 9)).as("prio"))
      .localCheckpoint()
    t0 = System.nanoTime()
    val profRows = graft.operators.Profile.profileDeep(wide,
        numeric = Seq("price"), categorical = Seq("status", "prio"))
      .collect()
    val tProf = (System.nanoTime() - t0) / 1e9
    println(f"DRIVE profile-deep-10M: $tProf%.1f s = ${1.0e7 / tProf / 1e6}%.1f M rows/s (${profRows.length} report rows)")

    // 7. Rendezvous sharding at 10M keys x 16 shards (160M md5s)
    t0 = System.nanoTime()
    spark.range(10000000L)
      .select(graft.operators.Sampling.rendezvousShard(col("id"), 16).as("s"))
      .groupBy("s").count().collect()
    val tHrw = (System.nanoTime() - t0) / 1e9
    println(f"DRIVE rendezvous-10M-x16: $tHrw%.1f s = ${1.0e7 / tHrw / 1e6}%.1f M keys/s")

    // 8. CMS warehouse rollup: 200 stored group sketches union to one —
    // sketch algebra only, no raw-data rescans. Width sized for the MERGED
    // key population (2000 keys into 16384: P(all-rows collide) ~ 1e-5),
    // the sizing rule the union's doc prescribes — an undersized union
    // still honors the 2N/width bound but stops being point-exact.
    val groupSks = spark.range(100000000L)
      .select((col("id") % 200).as("g"), concat(lit("k"), col("id") % 2000).as("k"))
      .groupBy("g")
      .agg(graft.functions.GraftFunctions.cms_sketch_agg(col("k"), 5, 16384).as("sk"))
      .localCheckpoint()
    t0 = System.nanoTime()
    val totalEst = groupSks
      .agg(graft.functions.GraftFunctions.cms_query(
        graft.functions.GraftFunctions.cms_union_agg(col("sk")), lit("k42")).as("q"))
      .collect()(0).getLong(0)
    val tUnion = (System.nanoTime() - t0) / 1e9
    println(f"DRIVE cms-union-200-sketches: $tUnion%.1f s, merged lookup k42 = $totalEst (exact 50000)")

    spark.stop()
  }
}
