package graftdrive

import org.apache.spark.sql.SparkSession

// scratch probe for new round-5 contract queries (run: Test/runMain graftdrive.R5Probe [names...])
object R5Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    if (args.headOption.contains("anndebug")) { annDebug(spark, dir); spark.stop(); return }
    // dump mode: Test/runMain graftdrive.R5Probe dump <outDir> <names...>
    // writes each query's parquet + the matching oracle_sql.json subset so
    // tools/check_oracle.py can gate a SINGLE query without a full Verify lap
    if (args.headOption.contains("dump")) {
      val outDir = args(1)
      val names = args.drop(2).toSeq
      names.foreach { n =>
        graft.SparkEntry.queries(n)(spark, dir)
          .write.mode("overwrite").parquet(s"$outDir/$n")
      }
      val sqls = names.flatMap(n => graft.SparkEntry.oracleSql.get(n).map(n -> _)).toMap
      val json = sqls.map { case (k, v) =>
        "\"" + k + "\": " + com.fasterxml.jackson.databind.json.JsonMapper.builder()
          .build().writeValueAsString(v)
      }.mkString("{", ",\n", "}")
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
        json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      spark.stop(); return
    }
    val names = if (args.nonEmpty) args.toSeq
      else Seq("sim_ivf_refit", "sim_ann_maintain", "hll_kmv_wire_roundtrip", "q_profile_exact")
    names.foreach { n =>
      val t0 = System.nanoTime()
      try {
        val df = graft.SparkEntry.queries(n)(spark, dir)
        println(s"=== $n (${(System.nanoTime() - t0) / 1e9}%.2f s)")
        df.show(50, truncate = false)
      } catch { case e: Throwable =>
        println(s"=== $n FAILED: $e")
        e.printStackTrace()
      }
    }
    spark.stop()
  }

  def annDebug(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val b0 = e.filter(col("vec_id") % 2 === 0).select(col("vec_id"), col("embedding"))
    val b1 = e.filter(col("vec_id") % 2 === 1).select(col("vec_id"), col("embedding"))
    val cents = graft.operators.Similarity.fitCentroids(b0, "embedding", "vec_id",
      nlist = 16, sampleSize = 500)
    graft.operators.Similarity.ivfAppendStats(b0, b1, "embedding", cents)
      .orderBy(desc("share_drift")).show(20, truncate = false)
    val collapsed = b0.limit(200)
      .withColumn("embedding", expr("transform(embedding, x -> float(0.1))"))
    graft.operators.Similarity.ivfAppendStats(b0, collapsed, "embedding", cents)
      .filter(col("n_new") > 0)
      .show(20, truncate = false)
  }
}
