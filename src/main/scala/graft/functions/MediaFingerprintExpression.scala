package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `audio_fingerprint(content)` -> BIGINT: the 64-bit energy-delta
  * fingerprint of an audio payload, computed from DECODED PCM — so the same
  * recording fingerprints identically out of WAV, FLAC, or OGG-FLAC, which
  * is what cross-container dedup keys on (see
  * [[graft.operators.Multimodal.audioFingerprint64]] for the construction
  * and `MEDIA.md` for which containers decode).
  *
  * A native expression rather than a UDF so the projection stays inside
  * whole-stage codegen (same static-call pattern as [[HrwShard]]); the
  * decode itself is the dominant cost and is identical either way. Strict
  * like the batch feature path: an undecodable payload throws — wrap the
  * COLUMN in a try/divert stage (`resampleAudioSafe`-style) for corpora
  * that may carry garbage, or use `Multimodal.audioFingerprints` which
  * shares this exact code.
  */
case class AudioFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY audio content, got ${dt.sql}")
  }
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    AudioFingerprint.of(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.AudioFingerprint$$.MODULE$$.of($c)")

  override protected def withNewChildInternal(c: Expression): AudioFingerprint = copy(child = c)
  override def prettyName: String = "audio_fingerprint"
}

object AudioFingerprint {
  def of(bytes: Array[Byte]): Long = {
    val (_, channels, pcm) = graft.operators.Multimodal.decodePcm16(bytes)
    graft.operators.Multimodal.audioFingerprint64(pcm, channels)
  }
}

/** `audio_dedup_key(content)` -> BIGINT: [[AudioFingerprint]] composed with
  * the decoded PCM's frame count and channel layout — the STREAMING dedup
  * key. The bare energy-delta fingerprint degenerates on near-silent or
  * very short clips (fewer than 65 PCM frames leave windows empty; flat
  * audio ties every window — both fingerprint 0), so keying on it alone
  * silently drops distinct clips as duplicates. Composing with
  * (frames, channels) separates those: duration and layout are properties
  * of the DECODED PCM, so the cross-container invariant is preserved (the
  * same recording out of WAV/FLAC/OGG-FLAC decodes to identical PCM and
  * keys identically), while two different near-silent clips differ.
  * Single decode — fingerprint and frame count come from one PCM pass.
  */
case class AudioDedupKey(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY audio content, got ${dt.sql}")
  }
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    AudioDedupKey.of(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.AudioDedupKey$$.MODULE$$.of($c)")

  override protected def withNewChildInternal(c: Expression): AudioDedupKey = copy(child = c)
  override def prettyName: String = "audio_dedup_key"
}

object AudioDedupKey {
  def of(bytes: Array[Byte]): Long = {
    val (_, channels, pcm) = graft.operators.Multimodal.decodePcm16(bytes)
    val fp = graft.operators.Multimodal.audioFingerprint64(pcm, channels)
    val frames = pcm.length.toLong / (2 * channels)
    // 64-bit mix of (fingerprint, frames, channels): SplitMix64-style
    // multiply-xor fold — deterministic, engine-portable arithmetic
    var k = fp
    k = (k ^ (frames * 0x9E3779B97F4A7C15L)) * 0xBF58476D1CE4E5B9L
    k = (k ^ (channels * 0x94D049BB133111EBL)) ^ (k >>> 31)
    k
  }
}
