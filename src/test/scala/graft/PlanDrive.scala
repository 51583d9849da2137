package graftdrive
import org.apache.spark.sql.SparkSession
object PlanDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("q_filter_pushdown", "q_revenue_by_nation", "hll_users_total",
        "hll_parts_by_returnflag", "tx_word_topk", "q_funnel", "q_upsert_orders",
        "hll_cms_event_counts", "q_join_size_estimate",
        "hll_kmv_overlap", "tx_sequence_pack",
        "q_bucketed_join", "q_domain_cap", "q_tpch_q21", "tx_vocab_growth",
        "tx_html_extract", "sim_int8_quantize", "hll_gk_wire_roundtrip",
        "mm_flac_features", "mm_ogg_features", "mm_image_resize",
        "mm_audio_resample", "dd_rendezvous_fast",
        "mm_flac_fixed", "mm_media_quarantine",
        "mm_image_dedup", "mm_audio_dedup", "mm_video_dedup",
        "mm_media_pipeline", "mm_media_probe",
        "tx_warc_ingest", "tx_tar_members", "tx_warc_curation",
        "tx_boilerplate", "tx_crawl_plan",
        "tx_budget_replan", "tx_link_rank_delta", "tx_pdf_text",
        "tx_mirror_near", "tx_boilerplate_stop", "tx_recrawl_priority")) {
      println(s"===== $name =====")
      graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
