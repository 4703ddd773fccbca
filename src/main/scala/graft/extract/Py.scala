package graft.extract

/** Python string-semantics helpers.
  *
  * The reference pipeline (crawler_system_v3_JSON_LD) is CPython; byte parity
  * of the extracted text depends on Python's definitions of whitespace,
  * str.strip, float(), int(float()) truncation — not Java's. Each helper
  * mirrors the cited CPython behavior.
  */
object Py {

  /** Python `str.isspace()` character predicate (Unicode White_Space plus the
    * ASCII control range 0x1c-0x1f that Python also treats as space).
    */
  def isSpace(c: Char): Boolean = {
    val i = c.toInt
    (i >= 0x09 && i <= 0x0d) || i == 0x20 ||
    (i >= 0x1c && i <= 0x1f) || i == 0x85 || i == 0xa0 ||
    i == 0x1680 || (i >= 0x2000 && i <= 0x200a) ||
    i == 0x2028 || i == 0x2029 || i == 0x202f || i == 0x205f || i == 0x3000
  }

  /** Python `str.strip()` with no arguments. */
  def strip(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && isSpace(s.charAt(i))) i += 1
    while (j > i && isSpace(s.charAt(j - 1))) j -= 1
    s.substring(i, j)
  }

  /** Python `str.strip(chars)`. */
  def strip(s: String, chars: String): String = {
    var i = 0
    var j = s.length
    while (i < j && chars.indexOf(s.charAt(i)) >= 0) i += 1
    while (j > i && chars.indexOf(s.charAt(j - 1)) >= 0) j -= 1
    s.substring(i, j)
  }

  def lstrip(s: String): String = {
    var i = 0
    while (i < s.length && isSpace(s.charAt(i))) i += 1
    s.substring(i)
  }

  def rstrip(s: String, chars: String): String = {
    var j = s.length
    while (j > 0 && chars.indexOf(s.charAt(j - 1)) >= 0) j -= 1
    s.substring(0, j)
  }

  /** Python `str.isdigit()` — true iff non-empty and all chars are digits.
    * (Restricted to Nd category; the exotic isdigit-only codepoints are not
    * in scope for this corpus.)
    */
  def isDigit(s: String): Boolean =
    s.nonEmpty && s.forall(Character.isDigit)

  /** Python `float(s)` — returns None on ValueError. */
  def toFloat(s: String): Option[Double] = {
    val t = strip(s)
    if (t.isEmpty) None
    else
      try {
        // Python accepts inf/infinity/nan (any case) and underscores between
        // digits; underscores and hex floats are out of corpus scope.
        val low = t.toLowerCase
        if (low == "inf" || low == "+inf" || low == "-inf" || low.endsWith("infinity")) None // out of scope
        else Some(java.lang.Double.parseDouble(t))
      } catch { case _: NumberFormatException => None }
  }

  /** Python `int(float(str(val)))` — truncation toward zero; None on error. */
  def intOfFloatStr(s: String): Option[Long] =
    toFloat(s).map(d => d.toLong)

  /** Python `str.split()` with no args: split on runs of whitespace,
    * discarding empties.
    */
  def splitWs(s: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isSpace(c)) {
        if (sb.nonEmpty) { out += sb.toString; sb.clear() }
      } else sb.append(c)
      i += 1
    }
    if (sb.nonEmpty) out += sb.toString
    out.toList
  }

  /** Python `repr(float)` / `str(float)` — shortest roundtrip repr. Java's
    * Double.toString is also shortest-roundtrip but differs in format for
    * exponents and integral values (Python: 1.0 -> "1.0", 1e16 -> "1e+16").
    */
  def reprFloat(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d.isInfinite) return if (d > 0) "inf" else "-inf"
    val j = java.lang.Double.toString(d) // shortest repr, Java format
    // Java: "1.0E16" / "1.23E-7"; Python: "1e+16" / "1.23e-07"
    if (j.contains("E")) {
      val Array(mant0, exp0) = j.split("E")
      val mant = if (mant0.endsWith(".0")) mant0.dropRight(2) else mant0
      val expInt = exp0.toInt
      val sign = if (expInt < 0) "-" else "+"
      val mag = math.abs(expInt)
      val pad = if (mag < 10) f"0$mag" else mag.toString
      s"${mant}e$sign$pad"
    } else j
  }

  /** Python f"{x:f}" — fixed 6 decimal places. */
  def formatF(d: Double): String = {
    val bd = new java.math.BigDecimal(d).setScale(6, java.math.RoundingMode.HALF_EVEN)
    bd.toPlainString
  }
}
