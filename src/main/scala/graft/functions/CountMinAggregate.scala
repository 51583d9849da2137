package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch: mergeable frequency estimates for ARBITRARY keys in
  * `depth × width` longs of state — the complement to Misra-Gries
  * ([[TopKSketch]]), which only retains the heavy hitters. Lookup returns
  * the minimum of `depth` counters; estimates NEVER undercount and
  * overcount by at most `2n/width` with probability `1 − 2^−depth`
  * (Cormode & Muthukrishnan 2005). When `width` comfortably exceeds the
  * distinct-key count, collisions are improbable in every row and counts
  * are exact in practice.
  *
  * Counter rows use Kirsch-Mitzenmacher double hashing (`h1 + i·h2`) over
  * two fixed-seed murmur hashes — deterministic across partitions, JVMs,
  * and merges. Merge is element-wise counter addition, so the sketch gets
  * Catalyst partial/final aggregation and stored-sketch re-aggregation
  * exactly like the HLL family.
  */
final class CmsSketch(val depth: Int, val width: Int) extends Serializable {
  val counts = new Array[Long](depth * width)
  var total: Long = 0L

  // the two base hashes are computed ONCE per add/query (that is the point
  // of Kirsch-Mitzenmacher double hashing); force h2 odd so strides cover
  // the table, floorMod keeps each row index in range
  @inline private def row(h1: Long, h2: Long, d: Int): Int =
    java.lang.Math.floorMod(h1 + d.toLong * h2, width.toLong).toInt

  @inline private def hashes(item: String): (Long, Long) = (
    scala.util.hashing.MurmurHash3.stringHash(item, 0x9747b28c).toLong,
    scala.util.hashing.MurmurHash3.stringHash(item, 0x85ebca6b).toLong | 1L)

  def add(item: String, n: Long = 1L): Unit = {
    val (h1, h2) = hashes(item)
    var d = 0
    while (d < depth) { counts(d * width + row(h1, h2, d)) += n; d += 1 }
    total += n
  }

  def query(item: String): Long = {
    val (h1, h2) = hashes(item)
    var est = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = counts(d * width + row(h1, h2, d))
      if (c < est) est = c
      d += 1
    }
    est
  }

  def merge(other: CmsSketch): CmsSketch = {
    require(other.depth == depth && other.width == width,
      s"cannot merge cms($depth,$width) with cms(${other.depth},${other.width})")
    var i = 0
    while (i < counts.length) { counts(i) += other.counts(i); i += 1 }
    total += other.total
    this
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + 8 * counts.length)
    bb.putInt(depth).putInt(width).putLong(total)
    var i = 0
    while (i < counts.length) { bb.putLong(counts(i)); i += 1 }
    bb.array()
  }
}

object CmsSketch {
  def deserialize(bytes: Array[Byte]): CmsSketch = {
    require(bytes.length >= 16, s"cms buffer truncated: ${bytes.length} bytes")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val depth = bb.getInt
    val width = bb.getInt
    // validate the header BEFORE allocating depth*width longs: corrupt
    // bytes must not drive a multi-GB allocation, and the expected-length
    // check runs in long math so it can't wrap
    require(depth >= 1 && depth <= 16 && width >= 2,
      s"cms header out of range: depth=$depth width=$width")
    require(bytes.length.toLong == 16L + 8L * depth * width,
      s"cms buffer length ${bytes.length} != ${16L + 8L * depth * width}")
    val s = new CmsSketch(depth, width)
    s.total = bb.getLong
    var i = 0
    while (i < s.counts.length) { s.counts(i) = bb.getLong; i += 1 }
    s
  }
}

/** `cms_sketch_agg(col, depth, width)` -> BinaryType sketch value. */
case class CmsSketchAgg(
    child: Expression,
    depth: Int = 5,
    width: Int = 2048,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsSketch] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING input, got ${child.dataType.sql}")
    else if (depth < 1 || depth > 16 || width < 2)
      TypeCheckResult.TypeCheckFailure(s"need 1 <= depth <= 16 and width >= 2, got depth=$depth width=$width")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): CmsSketch = new CmsSketch(depth, width)

  override def update(buffer: CmsSketch, input: InternalRow): CmsSketch = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(b1: CmsSketch, b2: CmsSketch): CmsSketch = b1.merge(b2)
  override def eval(buffer: CmsSketch): Any = buffer.serialize()
  override def serialize(buffer: CmsSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): CmsSketch = CmsSketch.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): CmsSketchAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsSketchAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CmsSketchAgg = copy(child = c)
  override def prettyName: String = "cms_sketch_agg"
}

/** `cms_query(sketch, item)` -> LongType frequency estimate (never an
  * undercount). Deserializes the sketch per call — fine for lookup-style
  * use (few rows against a broadcast sketch); for bulk lookups join the
  * exact aggregate instead.
  */
case class CmsQuery(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType || right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BINARY sketch, STRING item), got (${left.dataType.sql}, ${right.dataType.sql})")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType

  override protected def nullSafeEval(sk: Any, item: Any): Any =
    CmsSketch.deserialize(sk.asInstanceOf[Array[Byte]])
      .query(item.asInstanceOf[UTF8String].toString)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsQuery =
    copy(left = l, right = r)
  override def prettyName: String = "cms_query"
}
