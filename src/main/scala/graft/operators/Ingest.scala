package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Archive ingest — the FIRST batch step of a crawl-derived training
  * pipeline: explode WARC / tar archives (opaque binary payloads) into
  * per-capture / per-member records. Map-only by construction: one
  * archive's bytes are consumed entirely inside its partition and only
  * the exploded fixed-shape rows (plus their text payloads) flow on —
  * at 100 TB the archive column never crosses a shuffle, and
  * `spark.sql.files.maxPartitionBytes` bounds how many archives one task
  * holds. The demo corpora below REBUILD archives from the documents
  * table first (one groupByKey shuffle) — a real crawl starts at the
  * archive files and skips that construction entirely.
  */
object Ingest {

  /** One capture out of a WARC archive. `http_status`/`content_length`
    * describe the nested HTTP response for `response` records; other
    * record types (warcinfo, request, metadata) carry their raw record
    * payload length and no status.
    */
  case class WarcCapture(
      archive_id: Long,
      url: String,
      warc_type: String,
      http_status: Option[Int],
      mime: String,
      content_length: Long,
      body: Array[Byte])

  /** Explode WARC archives (plain or per-record-gzipped) into captures.
    * Strict per archive — a truncated archive fails its task rather than
    * silently dropping records; route through a quarantine stage first
    * if the corpus is known-dirty.
    */
  def ingestWarc(archives: Dataset[Multimodal.MediaRecord]): Dataset[WarcCapture] = {
    import archives.sparkSession.implicits._
    archives.flatMap { r =>
      Warc.readRecords(r.content).map { rec =>
        if (rec.warcType == "response") {
          val (status, _, body) = Warc.parseHttpResponse(rec.content)
          WarcCapture(r.media_id, rec.targetUri, rec.warcType, Some(status),
            rec.contentType, body.length.toLong, body)
        } else
          WarcCapture(r.media_id, rec.targetUri, rec.warcType, None,
            rec.contentType, rec.content.length.toLong, rec.content)
      }
    }
  }

  /** One member out of a tar archive. */
  case class TarMember(
      archive_id: Long,
      name: String,
      size: Long,
      typeflag: String,
      payload: Array[Byte])

  /** Explode tar archives into members — same strictness contract as
    * [[ingestWarc]].
    */
  def ingestTar(archives: Dataset[Multimodal.MediaRecord]): Dataset[TarMember] = {
    import archives.sparkSession.implicits._
    archives.flatMap { r =>
      Tar.readEntries(r.content).map(e =>
        TarMember(r.media_id, e.name, e.size, e.typeflag.toString, e.payload))
    }
  }

  /** Demo WARC corpus: documents grouped 16-to-an-archive (archive count
    * scales WITH the corpus, like a real crawl's file count), each doc as
    * a request+response capture pair behind a warcinfo header record.
    * Every field an oracle needs derives from the doc columns: url
    * `http://corpus.invalid/<source>/<doc_id>`, status 404 iff
    * doc_id % 17 == 0 else 200, body = the UTF-8 text. Odd archives are
    * per-record-gzipped so the contract query exercises the multi-member
    * gunzip path too.
    */
  def warcArchivesFromDocuments(spark: SparkSession, dir: String,
      docsPerArchive: Int = 16): Dataset[Multimodal.MediaRecord] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)]
      .groupByKey(_._1 / docsPerArchive)
      .mapGroups { (aid, it) =>
        val docs = it.toSeq.sortBy(_._1)
        val info = Map(
          "WARC-Type" -> "warcinfo",
          "WARC-Record-ID" -> s"<urn:graft:warcinfo:$aid>",
          "WARC-Date" -> "2026-01-01T00:00:00Z",
          "Content-Type" -> "application/warc-fields") ->
          "software: graft-ingest/1.0\r\n".getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val recs = info +: docs.flatMap { case (id, source, text) =>
          val url = s"http://corpus.invalid/$source/$id"
          val status = if (id % 17 == 0) 404 else 200
          val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          Seq(
            Map(
              "WARC-Type" -> "request",
              "WARC-Target-URI" -> url,
              "WARC-Record-ID" -> s"<urn:graft:req:$id>",
              "WARC-Date" -> "2026-01-01T00:00:00Z",
              "Content-Type" -> "application/http;msgtype=request") ->
              s"GET /$source/$id HTTP/1.1\r\nHost: corpus.invalid\r\n\r\n"
                .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1),
            Map(
              "WARC-Type" -> "response",
              "WARC-Target-URI" -> url,
              "WARC-Record-ID" -> s"<urn:graft:resp:$id>",
              "WARC-Date" -> "2026-01-01T00:00:00Z",
              "Content-Type" -> "application/http;msgtype=response") ->
              Warc.httpResponse(status, "text/html", body))
        }
        val gz = aid % 2 == 1
        Multimodal.MediaRecord(aid,
          s"fake://warc/$aid.warc" + (if (gz) ".gz" else ""),
          "application/warc", Warc.writeWarc(recs, gzipped = gz), Map.empty)
      }
  }

  /** Demo tar corpus: same 16-docs-per-archive grouping, one regular-file
    * member `<source>/<doc_id>.txt` per document with the UTF-8 text as
    * payload.
    */
  def tarArchivesFromDocuments(spark: SparkSession, dir: String,
      docsPerArchive: Int = 16): Dataset[Multimodal.MediaRecord] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)]
      .groupByKey(_._1 / docsPerArchive)
      .mapGroups { (aid, it) =>
        val entries = it.toSeq.sortBy(_._1).map { case (id, source, text) =>
          val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          Tar.TarEntry(s"$source/$id.txt", body.length.toLong, '0', body)
        }
        Multimodal.MediaRecord(aid, s"fake://tar/$aid.tar", "application/x-tar",
          Tar.writeTar(entries), Map.empty)
      }
  }
}
