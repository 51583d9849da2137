package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `hrw_shard(key)` -> INT: fast rendezvous (highest-random-weight) shard
  * assignment — the ingest-path sibling of
  * [[graft.operators.Sampling.rendezvousShard]].
  *
  * Same HRW contract as the md5 form (growing n -> n+1 moves an expected
  * 1/(n+1) of keys, every mover lands on the NEW shard, so elastic
  * resharding is an incremental one-shard move), but built for throughput
  * instead of cross-engine replay: the key is xxhash64'd ONCE, then each
  * shard's weight is a single xxh64 long-mix of (shard, keyHash) — O(1)
  * byte work per key plus one multiply-rotate per shard, vs the md5 form's
  * nShards string concats + full md5 rounds. The per-(key, shard) weights
  * are pairwise-uniform because the mix is itself xxh64 with the shard as
  * seed material.
  *
  * The two forms intentionally produce DIFFERENT assignments (different
  * hash): use the md5 form where a non-JVM engine must reproduce shards
  * byte-for-byte (it DuckDB-replays), this one where assignment sits on a
  * hot ingest path. The HRW *structure* is what both guarantee.
  *
  * Codegen: participates in whole-stage codegen via a static call into
  * [[HrwShard.shardUTF8]]/[[HrwShard.shardBytes]] — the same pattern as
  * Spark's own hash expressions (the generated Java stays one call, the
  * shard loop stays JIT-compiled Scala), so the ingest projection never
  * drops out of the codegen'd stage the way a CodegenFallback would.
  *
  * Ties: resolved toward the lower shard index; with 64-bit weights a tie
  * needs an xxh64 collision across shards of one key (~2^-64 per pair) and
  * any fixed resolution preserves the HRW move property.
  */
case class HrwShard(child: Expression, nShards: Int, seed: Long)
  extends UnaryExpression {

  require(nShards >= 1 && nShards <= 65536,
    s"hrw_shard: nShards must be in [1, 65536], got $nShards")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING or BINARY key, got ${dt.sql}")
  }
  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String => HrwShard.shardUTF8(s, nShards, seed)
    case b: Array[Byte] => HrwShard.shardBytes(b, nShards, seed)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = "graft.functions.HrwShard$.MODULE$"
    val call = child.dataType match {
      case _: StringType => (c: String) => s"$helper.shardUTF8($c, $nShards, ${seed}L)"
      case _ => (c: String) => s"$helper.shardBytes($c, $nShards, ${seed}L)"
    }
    defineCodeGen(ctx, ev, call)
  }

  override protected def withNewChildInternal(c: Expression): HrwShard = copy(child = c)
  override def prettyName: String = "hrw_shard"
}

object HrwShard {

  /** Hash the key bytes ONCE; per-shard weight is a long-mix, not a rehash. */
  def shardUTF8(s: UTF8String, nShards: Int, seed: Long): Int =
    pick(XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed), nShards)

  def shardBytes(b: Array[Byte], nShards: Int, seed: Long): Int =
    pick(XXH64.hashUnsafeBytes(
      b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, seed), nShards)

  private def pick(keyHash: Long, nShards: Int): Int = {
    var best = 0
    var bestH = XXH64.hashLong(0L, keyHash)
    var s = 1
    while (s < nShards) {
      val h = XXH64.hashLong(s.toLong, keyHash)
      // unsigned compare: strictly greater, so ties keep the lower shard
      if (java.lang.Long.compareUnsigned(h, bestH) > 0) { best = s; bestH = h }
      s += 1
    }
    best
  }
}
