package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("key dedup drops re-deliveries across micro-batches within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    val stream = MemoryStream[(Long, Long)]
    val events = stream.toDS().toDF("event_id", "tsMillis")
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
    val deduped = StreamingDedup.dedupByKey(events, "eventTime", "10 minutes", Seq("event_id"))
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_keys").start()
    try {
      stream.addData(Seq((1L, base), (2L, base + 1000), (1L, base + 2000)))
      q.processAllAvailable()
      // batch 2 re-delivers event 1 and 2 (inside watermark) and adds 3
      stream.addData(Seq((1L, base + 5000), (2L, base + 6000), (3L, base + 7000)))
      q.processAllAvailable()
      val ids = spark.table("dedup_keys").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L), s"got $ids")
    } finally q.stop()
  }

  test("canonical-url dedup streams: rel=canonical groups collapse, singletons pass") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    // metaPage docs 0,3,150,153 — 0 and 150 share a canonical (id%10 and
    // id%50 equal, both %3==0), 3 and 153 share another; 1 and 2 carry no
    // canonical (dedup key = own url) so both must survive
    val stream = MemoryStream[(Long, Long)]
    val pages = stream.toDS().toDF("doc_id", "tsMillis")
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
      .as[(Long, Long, java.sql.Timestamp)]
      .map { case (id, ts, t) =>
        val (url, html) = graft.operators.Ingest.metaPage(id)
        (id, url, html, t)
      }.toDF("doc_id", "url", "html", "eventTime")
      .withColumn("m", graft.operators.TextAnalysis.htmlMeta(col("html"), col("url")))
      .withColumn("dedup_url", coalesce(col("m.canonical"), col("url")))
      .select("doc_id", "dedup_url", "eventTime")
    val deduped = StreamingDedup.dedupByKey(pages, "eventTime", "10 minutes", Seq("dedup_url"))
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("canon_dedup").start()
    try {
      stream.addData(Seq((0L, base), (3L, base + 100), (1L, base + 200)))
      q.processAllAvailable()
      stream.addData(Seq((150L, base + 300), (153L, base + 400), (2L, base + 500)))
      q.processAllAvailable()
      val kept = spark.table("canon_dedup").select("doc_id")
        .as[Long].collect().sorted
      // 150 and 153 are canonical re-deliveries of 0 and 3; 1 and 2 pass
      assert(kept.toSeq == Seq(0L, 1L, 2L, 3L))
    } finally q.stop()
  }

  test("content dedup keys on the normalized fingerprint, not the raw text") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    val stream = MemoryStream[(Long, String, Long)]
    val docs = stream.toDS().toDF("doc_id", "text", "tsMillis")
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
    val deduped = StreamingDedup.dedupByContent(docs, "eventTime", "10 minutes", "text")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_content").start()
    try {
      stream.addData(Seq(
        (1L, "Hello  World", base),
        (2L, "hello world", base + 1000), // same after normalization -> dropped
        (3L, "different document", base + 2000)))
      q.processAllAvailable()
      stream.addData(Seq(
        (4L, "HELLO\tWORLD", base + 5000), // still a dup of doc 1
        (5L, "brand new content", base + 6000)))
      q.processAllAvailable()
      val out = spark.table("dedup_content")
      val ids = out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 3L, 5L), s"got $ids")
      // the helper fingerprint column must not leak into the output schema
      assert(!out.columns.contains("_fp"))
    } finally q.stop()
  }

  test("audio dedup drops a clip re-delivered in a DIFFERENT container") {
    import graft.operators.Multimodal
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    val pcmA = Multimodal.deterministicPcmMod(1L, 3000, 2)
    val pcmB = Multimodal.deterministicPcmMod(2L, 3000, 2)
    val stream = MemoryStream[(Long, Long, Array[Byte])]
    val clips = stream.toDS().toDF("clip_id", "tsMillis", "content")
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
    val deduped = StreamingDedup.dedupByAudioFingerprint(
      clips, "eventTime", "10 minutes", "content")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_audio").start()
    try {
      stream.addData(Seq((1L, base, graft.operators.WavePcm.writeWav16(pcmA, 16000, 2))))
      q.processAllAvailable()
      // batch 2: the SAME recording as OGG-FLAC (different bytes, same
      // PCM) must drop; a genuinely new clip must pass
      stream.addData(Seq(
        (2L, base + 5000, graft.operators.OggStream.writeOggFlac(pcmA, 16000, 2)),
        (3L, base + 6000, graft.operators.WavePcm.writeWav16(pcmB, 16000, 2))))
      q.processAllAvailable()
      val out = spark.table("dedup_audio")
      val ids = out.select("clip_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 3L), s"got $ids")
      assert(!out.columns.contains("_afp"))
    } finally q.stop()
  }

  test("audio dedup does NOT collide distinct near-silent clips (degenerate fingerprint)") {
    import graft.operators.{Multimodal, WavePcm}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    // all-zero PCM of different durations: the bare energy-delta
    // fingerprint is 0 for BOTH (every window energy ties), so keying on
    // it alone would silently drop clip 2 — the composed key must not
    val silentShort = new Array[Byte](3000 * 2 * 2)
    val silentLong = new Array[Byte](4000 * 2 * 2)
    assert(Multimodal.audioFingerprint64(silentShort, 2) == 0L &&
      Multimodal.audioFingerprint64(silentLong, 2) == 0L)
    val stream = MemoryStream[(Long, Long, Array[Byte])]
    val clips = stream.toDS().toDF("clip_id", "tsMillis", "content")
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
    val deduped = StreamingDedup.dedupByAudioFingerprint(
      clips, "eventTime", "10 minutes", "content")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_audio_degenerate").start()
    try {
      stream.addData(Seq(
        (1L, base, WavePcm.writeWav16(silentShort, 16000, 2)),
        (2L, base + 1000, WavePcm.writeWav16(silentLong, 16000, 2)),
        // a true re-delivery of clip 1 in another container still drops
        (3L, base + 2000, graft.operators.OggStream.writeOggFlac(silentShort, 16000, 2))))
      q.processAllAvailable()
      val ids = spark.table("dedup_audio_degenerate")
        .select("clip_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L), s"got $ids")
    } finally q.stop()
  }
}
