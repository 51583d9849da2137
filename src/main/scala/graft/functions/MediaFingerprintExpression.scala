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
