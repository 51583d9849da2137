package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `python_str(double)` -> STRING: Python's `str(float)` rendering, for
  * bit-parity with the reference's `str(element)` coercion before hashing
  * (HLL/HyperLogLog.py:110).
  *
  * Spark's `CAST(d AS STRING)` follows Java conventions, which diverge from
  * Python in exactly the ways that change SHA-1 inputs:
  *  - exponent thresholds: Java switches to scientific at >= 1e7 / < 1e-3,
  *    Python at >= 1e16 / < 1e-4 (`12345678.0` vs `1.2345678E7`);
  *  - exponent spelling: Python `1e+16` / `5e-324`, Java `1.0E16` / `4.9E-324`;
  *  - specials: Python `inf` / `-inf` / `nan`, Java `Infinity` / `NaN`;
  *  - digit selection: Python repr is the SHORTEST decimal that round-trips
  *    (correctly rounded); Java 17's historical algorithm occasionally emits
  *    a different digit string (e.g. subnormals).
  *
  * Digits are found exactly as CPython does: the smallest precision p in
  * [1, 17] whose correctly-rounded p-digit scientific form parses back to
  * the original bits, then formatted with Python's placement rules.
  */
object PythonStr {

  /** Python `str(double)`. */
  def render(v: Double): String = {
    if (java.lang.Double.isNaN(v)) return "nan"
    if (v == Double.PositiveInfinity) return "inf"
    if (v == Double.NegativeInfinity) return "-inf"
    if (v == 0.0) return if (1.0 / v < 0) "-0.0" else "0.0"
    val neg = v < 0
    val a = math.abs(v)
    // shortest correctly-rounded digit string via round-trip probing
    var digits: String = null
    var exp = 0
    var p = 1
    while (digits == null && p <= 17) {
      val s = String.format("%." + (p - 1) + "e", Double.box(a))
      if (java.lang.Double.parseDouble(s) == a) {
        val ei = s.indexOf('e')
        exp = Integer.parseInt(s.substring(ei + 1))
        digits = s.substring(0, ei).replace(".", "")
        // trailing zeros from the fixed-precision format are not part of
        // the shortest form ("1.500e+00" -> "15")
        var end = digits.length
        while (end > 1 && digits.charAt(end - 1) == '0') end -= 1
        digits = digits.substring(0, end)
      }
      p += 1
    }
    val sb = new java.lang.StringBuilder(32)
    if (neg) sb.append('-')
    if (exp >= -4 && exp < 16) {
      // positional notation
      if (exp >= digits.length - 1) {
        sb.append(digits)
        var i = digits.length - 1
        while (i < exp) { sb.append('0'); i += 1 }
        sb.append(".0")
      } else if (exp >= 0) {
        sb.append(digits, 0, exp + 1).append('.').append(digits, exp + 1, digits.length)
      } else {
        sb.append("0.")
        var i = -1
        while (i > exp) { sb.append('0'); i -= 1 }
        sb.append(digits)
      }
    } else {
      // scientific notation: 1e+16, 1.5e+20, 5e-324 (>= 2 exponent digits)
      sb.append(digits.charAt(0))
      if (digits.length > 1) sb.append('.').append(digits, 1, digits.length)
      sb.append('e').append(if (exp < 0) '-' else '+')
      val ae = math.abs(exp)
      if (ae < 10) sb.append('0')
      sb.append(ae)
    }
    sb.toString
  }
}

/** Type-dispatching coercion used by every hash-input wrapper: DOUBLE/FLOAT
  * render via [[PythonStr]] (Python `str()` parity, the reference's
  * semantics); every other type keeps Spark's `CAST(x AS STRING)`, which
  * already matches Python for integers and strings (the reference's fixture
  * types). Resolved after analysis, when the input type is known.
  */
case class PyStrCoerce(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override lazy val replacement: Expression = child.dataType match {
    case DoubleType => PythonStr(child)
    case FloatType  => PythonStr(org.apache.spark.sql.catalyst.expressions.Cast(child, DoubleType))
    case _          => org.apache.spark.sql.catalyst.expressions.Cast(child, StringType)
  }

  override protected def withNewChildInternal(c: Expression): PyStrCoerce = copy(child = c)
  override def prettyName: String = "py_str_coerce"
}

case class PythonStr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires DOUBLE (cast floats up first), got ${child.dataType.sql}")

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(PythonStr.render(v.asInstanceOf[Double]))

  override protected def withNewChildInternal(c: Expression): PythonStr = copy(child = c)
  override def prettyName: String = "python_str"
}
