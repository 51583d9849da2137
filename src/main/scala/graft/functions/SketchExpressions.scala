package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Tokenization + hashing shared by the text-sketch expressions. Must match
  * TextAnalysis.words / TextAnalysis.shingles semantics exactly (lowercase,
  * split on non-letter runs, n-gram join by single space) so builtin-based
  * exact verification can re-derive the same shingle sets.
  */
object TextSketching {
  def tokenize(text: String): Array[String] =
    text.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty)

  /** 64-bit FNV-1a — deterministic, allocation-free, seed-mixable. */
  def fnv1a64(s: String, seed: Long = 0L): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Word n-gram shingle base-hashes (single pass, one hash per shingle). */
  def shingleHashes(text: String, n: Int): Array[Long] = {
    val ws = tokenize(text)
    if (ws.isEmpty) return Array.emptyLongArray
    if (ws.length < n) return Array(fnv1a64(ws.mkString(" ")))
    val out = new Array[Long](ws.length - n + 1)
    var i = 0
    while (i < out.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(ws(i + j))
        j += 1
      }
      out(i) = fnv1a64(sb.toString)
      i += 1
    }
    out
  }

  /** Multiply-shift permutation family: odd multipliers + offsets from a
    * fixed-seed PRNG (standard universal-hash minhash construction).
    */
  def perms(numHashes: Int): (Array[Long], Array[Long]) = {
    val rnd = new java.util.Random(0x5eed5eedL)
    val a = Array.fill(numHashes)(rnd.nextLong() | 1L)
    val b = Array.fill(numHashes)(rnd.nextLong())
    (a, b)
  }
}

/** `minhash_signature(text, numHashes, shingleSize)` -> Array[Long].
  *
  * One pass over the shingles: base-hash each shingle once, then apply the
  * multiply-shift permutation family and keep column-wise minima. O(shingles
  * x numHashes) multiplies, no allocation per shingle. Pure map work — the
  * scale cost of MinHash dedup lives in the later LSH band join, not here.
  * Empty text -> all-Long.MaxValue signature (matches "no shingles").
  */
case class MinHashSignature(child: Expression, numHashes: Int = 64, shingleSize: Int = 3)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING, got ${child.dataType.sql}")
    else if (numHashes < 1 || numHashes > 1024)
      TypeCheckResult.TypeCheckFailure(s"numHashes must be in [1,1024], got $numHashes")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val (pa, pb) = TextSketching.perms(numHashes)

  override def nullSafeEval(v: Any): Any = {
    val hashes = TextSketching.shingleHashes(v.asInstanceOf[UTF8String].toString, shingleSize)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < hashes.length) {
      val h = hashes(i)
      var j = 0
      while (j < numHashes) {
        val p = pa(j) * h + pb(j)
        if (p < sig(j)) sig(j) = p
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
  override def prettyName: String = "minhash_signature"
}

/** `simhash64(text)` -> Long: 64-bit SimHash over word-unigram hashes
  * (Charikar 2002). Near-duplicate texts land within small Hamming distance.
  */
case class SimHash64(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING, got ${child.dataType.sql}")

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val ws = TextSketching.tokenize(v.asInstanceOf[UTF8String].toString)
    val votes = new Array[Int](64)
    var i = 0
    while (i < ws.length) {
      val h = TextSketching.fnv1a64(ws(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def prettyName: String = "simhash64"
}

/** `shingle_hashes(text, n)` -> sorted distinct Array[Long]: the base
  * shingle-hash *set* used for exact Jaccard verification. Sorted so that
  * [[SortedLongJaccard]] can merge-count in O(n+m) without allocation —
  * orders of magnitude cheaper than array_intersect/array_union on string
  * arrays for the LSH verify step (the per-candidate hot path).
  */
case class ShingleHashes(child: Expression, shingleSize: Int = 3)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val hs = TextSketching.shingleHashes(v.asInstanceOf[UTF8String].toString, shingleSize)
    java.util.Arrays.sort(hs)
    // dedup in place (sorted)
    var n = 0
    var i = 0
    while (i < hs.length) {
      if (n == 0 || hs(i) != hs(n - 1)) { hs(n) = hs(i); n += 1 }
      i += 1
    }
    new GenericArrayData(if (n == hs.length) hs else java.util.Arrays.copyOf(hs, n))
  }

  override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
  override def prettyName: String = "shingle_hashes"
}

/** `sorted_jaccard(a, b)` -> Double: Jaccard of two SORTED distinct long
  * arrays via merge-count. O(n+m), zero allocation.
  */
case class SortedLongJaccard(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    def isLongArray(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (isLongArray(left.dataType) && isLongArray(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> inputs, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    if (nx == 0 && ny == 0) return 0.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    inter.toDouble / (nx + ny - inter).toDouble
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedLongJaccard =
    copy(left = l, right = r)
  override def prettyName: String = "sorted_jaccard"
}

/** `dot_f(a, b)` -> Double: dot product of two float arrays in a tight
  * primitive loop. The interpreted `aggregate(zip_with(...))` builtin chain
  * allocates an intermediate array per row pair and dispatches per element —
  * this is the ANN hot path, so it gets a native expression WITH real
  * codegen (`doGenCode` emits the loop inline into the stage body, keeping
  * the crossJoin+score pipeline inside one WholeStageCodegen span instead of
  * falling back to interpreted eval per row pair).
  */
case class DotProductF(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def isFloatArray(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> inputs, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductF =
    copy(left = l, right = r)
  override def prettyName: String = "dot_f"
}

/** `compression_ratio(text)` -> Double: deflate-compressed size / raw size
  * of the UTF-8 bytes (level 6). Low ratios signal repetitive/boilerplate
  * text, high ratios near-random noise — a standard cheap quality signal for
  * corpus filtering. Deterministic (zlib output is fixed for fixed input and
  * level). Empty text -> 1.0.
  */
case class CompressionRatio(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING, got ${child.dataType.sql}")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(v: Any): Any = {
    val raw = v.asInstanceOf[UTF8String].getBytes
    if (raw.isEmpty) return 1.0
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](1024)
      var compressed = 0L
      while (!d.finished()) compressed += d.deflate(buf)
      compressed.toDouble / raw.length
    } finally d.end()
  }

  override protected def withNewChildInternal(c: Expression): CompressionRatio = copy(child = c)
  override def prettyName: String = "compression_ratio"
}

/** `bloom_might_contain(col)` against a plan-embedded serialized
  * `org.apache.spark.util.sketch.BloomFilter` (built with the public
  * `df.stat.bloomFilter`). Deserialized once per task (lazy), then each row
  * is a hash probe — map-only membership filtering for "seen-set" problems.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING, got ${child.dataType.sql}")

  override def dataType: DataType = BooleanType

  @transient private lazy val filter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(filterBytes))

  override def nullSafeEval(v: Any): Any =
    java.lang.Boolean.valueOf(filter.mightContainString(v.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(c: Expression): BloomMightContain = copy(child = c)
  override def prettyName: String = "bloom_might_contain"
}

/** `winnowing_fingerprint(text, kGram, window)` -> sorted distinct
  * Array[Long]: the MOSS document-fingerprinting scheme (Schleimer,
  * Wilkerson, Aiken, SIGMOD 2003). Rabin-Karp rolling hash over character
  * k-grams of the normalized text, then winnowing: keep the minimum hash of
  * each sliding window (rightmost on ties), guaranteeing any shared
  * substring of length >= window+kGram-1 produces a shared fingerprint.
  * Near-dup detection = fingerprint-set overlap ([[SortedLongJaccard]]).
  */
case class WinnowingFingerprint(child: Expression, kGram: Int = 8, window: Int = 4)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING, got ${child.dataType.sql}")
    else if (kGram < 2 || window < 1)
      TypeCheckResult.TypeCheckFailure(s"need kGram >= 2 and window >= 1, got ($kGram, $window)")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val B = 1000000007L // rolling-hash base

  override def nullSafeEval(v: Any): Any = {
    // normalize like the other text sketches: lowercase, collapse non-letter
    // runs to one space, trim — built in a single pass (equivalent to
    // `.replaceAll("[^\\p{L}]+", " ").trim`, parity-tested, no regex engine
    // or intermediate strings on this map-side hot path)
    val lowered = v.asInstanceOf[UTF8String].toString.toLowerCase
    val sb = new java.lang.StringBuilder(lowered.length)
    var ni = 0
    var pendingSpace = false
    while (ni < lowered.length) {
      val cp = lowered.codePointAt(ni)
      if (Character.isLetter(cp)) {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.appendCodePoint(cp)
      } else pendingSpace = true
      ni += Character.charCount(cp)
    }
    val s = sb.toString
    if (s.length < kGram) return new GenericArrayData(Array.emptyLongArray)
    val n = s.length - kGram + 1
    val gramHashes = new Array[Long](n)
    // Rabin-Karp: h(i+1) = (h(i) - s(i)*B^(k-1)) * B + s(i+k)
    var pow = 1L
    var j = 1
    while (j < kGram) { pow *= B; j += 1 }
    var h = 0L
    var i = 0
    while (i < kGram) { h = h * B + s.charAt(i); i += 1 }
    gramHashes(0) = h
    i = 1
    while (i < n) {
      h = (h - s.charAt(i - 1) * pow) * B + s.charAt(i + kGram - 1)
      gramHashes(i) = h
      i += 1
    }
    // winnowing: min of each window of `window` consecutive gram hashes,
    // rightmost minimum on ties; record each selected position once
    val selected = new java.util.TreeSet[java.lang.Long]()
    var w = 0
    val lastWindow = n - window
    if (lastWindow < 0) {
      var m = gramHashes(0)
      i = 1
      while (i < n) { if (gramHashes(i) <= m) m = gramHashes(i); i += 1 }
      selected.add(m)
    } else {
      while (w <= lastWindow) {
        var minIdx = w
        i = w + 1
        while (i < w + window) {
          if (gramHashes(i) <= gramHashes(minIdx)) minIdx = i
          i += 1
        }
        selected.add(gramHashes(minIdx))
        w += 1
      }
    }
    val out = new Array[Long](selected.size)
    val it = selected.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out) // TreeSet iteration = sorted ascending
  }

  override protected def withNewChildInternal(c: Expression): WinnowingFingerprint = copy(child = c)
  override def prettyName: String = "winnowing_fingerprint"
}

/** `nearest_centroid(vec)` -> Int: argmax dot(vec, centroid) against a
  * plan-embedded centroid matrix (broadcast with the serialized plan).
  * Map-only IVF partition assignment in one pass.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName requires ARRAY<FLOAT>, got ${other.sql}")
  }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val cv = centroids(c)
      val n = math.min(x.numElements(), cv.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getFloat(i).toDouble * cv(i); i += 1 }
      if (s > bestDot) { bestDot = s; best = c }
      c += 1
    }
    java.lang.Integer.valueOf(best)
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroid = copy(child = c)
  override def prettyName: String = "nearest_centroid"
}

/** `hyperplane_bucket(vec)` -> Int: sign-bit LSH bucket from plan-embedded
  * hyperplanes (bit b set iff dot(vec, plane_b) >= 0). One pass, map-only.
  */
case class HyperplaneBucket(child: Expression, planes: Array[Array[Double]])
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName requires ARRAY<FLOAT>, got ${other.sql}")
  }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var bucket = 0
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      val n = math.min(x.numElements(), p.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getFloat(i).toDouble * p(i); i += 1 }
      bucket = (bucket << 1) | (if (s >= 0) 1 else 0)
      b += 1
    }
    java.lang.Integer.valueOf(bucket)
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneBucket = copy(child = c)
  override def prettyName: String = "hyperplane_bucket"
}

/** `pq_encode(vec)` -> Binary: product-quantization code against a
  * plan-embedded codebook matrix `[m][ksub][dsub]`. The vector is split into
  * `m` contiguous subvectors; byte `s` is the index (< ksub <= 256) of the
  * L2-nearest centroid of subspace `s`. Map-only, one pass — this is the
  * compression step that turns a 64-float embedding into `m` bytes, the
  * standard 100 TB ANN storage layout (Jégou et al., TPAMI 2011).
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName requires ARRAY<FLOAT>, got ${other.sql}")
  }

  override def dataType: DataType = BinaryType

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val off = s * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cv = cb(c)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val idx = off + i
          val xi = if (idx < x.numElements()) x.getFloat(idx).toDouble else 0.0
          val diff = xi - cv(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): PqEncode = copy(child = c)
  override def prettyName: String = "pq_encode"
}

/** `pq_lut(qvec)` -> Array[Double]: the per-query ADC lookup table,
  * `lut[s*ksub + c] = dot(qvec_sub(s), codebook(s)(c))`. Evaluated once per
  * (small, broadcast) query row; scoring a corpus code is then `m` table
  * lookups instead of a `d`-element dot product.
  */
case class PqLut(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName requires ARRAY<FLOAT>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val m = codebooks.length
    val ksub = codebooks(0).length
    val dsub = codebooks(0)(0).length
    val out = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val off = s * dsub
      var c = 0
      while (c < ksub) {
        val cv = cb(c)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val idx = off + i
          if (idx < x.numElements()) d += x.getFloat(idx).toDouble * cv(i)
          i += 1
        }
        out(s * ksub + c) = d
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): PqLut = copy(child = c)
  override def prettyName: String = "pq_lut"
}

/** `pq_adc_score(code, lut)` -> Double: asymmetric-distance score
  * `sum_s lut[s*ksub + code[s]]` ~ dot(query, original vector). The hot
  * corpus-scan path (one eval per corpus row x query), so it gets real
  * codegen: `m` array lookups inline in the stage body.
  */
case class PqAdcScore(left: Expression, right: Expression, ksub: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BINARY, ARRAY<DOUBLE>), got ${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val code = a.asInstanceOf[Array[Byte]]
    val lut = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val m = math.min(code.length, lut.numElements() / ksub)
    var s = 0.0
    var i = 0
    while (i < m) {
      s += lut.getDouble(i * ksub + (code(i) & 0xFF))
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    nullSafeCodeGen(ctx, ev, (code, lut) => {
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      s"""
         |int $m = java.lang.Math.min($code.length, $lut.numElements() / $ksub);
         |double $s = 0.0;
         |for (int $i = 0; $i < $m; $i++) {
         |  $s += $lut.getDouble($i * $ksub + ($code[$i] & 0xFF));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcScore =
    copy(left = l, right = r)
  override def prettyName: String = "pq_adc_score"
}

/** `interleave_bits(r1, r2, ...)` -> Long: Morton/Z-order interleave of 2-4
  * `bits`-wide bucket ranks (bit j of rank i lands at position
  * j*n + i). Map-only layout key for [[graft.operators.Layout]].
  */
case class InterleaveBits(children: Seq[Expression], bits: Int)
  extends Expression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.exists(_.dataType != LongType))
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires BIGINT ranks")
    else if (children.length < 2 || children.length > 4)
      TypeCheckResult.TypeCheckFailure(s"$prettyName takes 2-4 ranks, got ${children.length}")
    else if (bits < 1 || children.length * bits > 63)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: ${children.length} ranks x $bits bits exceeds 63 (shift would wrap)")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val n = children.length
    var z = 0L
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      if (v == null) return null
      val r = v.asInstanceOf[Long]
      var j = 0
      while (j < bits) {
        z |= ((r >>> j) & 1L) << (j * n + i)
        j += 1
      }
      i += 1
    }
    java.lang.Long.valueOf(z)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): InterleaveBits =
    copy(children = newChildren)
  override def prettyName: String = "interleave_bits"
}
