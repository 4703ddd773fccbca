package graft.extract

import scala.collection.mutable

/** Insertion-ordered JSON AST with CPython-compatible parse / serialize /
  * repr semantics.
  *
  * The reference stores `raw_json = json.dumps(job_ld or {}, ensure_ascii=
  * False)` (crawl_service.py:349) — Python dict insertion order and Python
  * string/number formatting are part of the byte-parity surface, so this is
  * a dedicated AST rather than a Spark-native JSON reader.
  */
object Json {

  sealed trait JV
  case object JNull extends JV
  final case class JBool(b: Boolean) extends JV
  final case class JInt(v: BigInt) extends JV
  final case class JFloat(v: Double) extends JV
  final case class JStr(s: String) extends JV
  final case class JArr(items: mutable.ArrayBuffer[JV]) extends JV
  final case class JObj(entries: mutable.LinkedHashMap[String, JV]) extends JV {
    def get(k: String): Option[JV] = entries.get(k)
    def apply(k: String): JV = entries.getOrElse(k, JNull)
    def put(k: String, v: JV): Unit = entries.put(k, v)
    def has(k: String): Boolean = entries.contains(k)
  }

  object JObj { def empty: JObj = JObj(mutable.LinkedHashMap.empty) }
  object JArr { def of(vs: JV*): JArr = JArr(mutable.ArrayBuffer(vs: _*)) }

  /** Python truthiness of a JSON value. */
  def truthy(v: JV): Boolean = v match {
    case JNull => false
    case JBool(b) => b
    case JInt(i) => i != 0
    case JFloat(f) => f != 0.0
    case JStr(s) => s.nonEmpty
    case JArr(a) => a.nonEmpty
    case JObj(e) => e.nonEmpty
  }

  /** Python `str(value)`. */
  def pyStr(v: JV): String = v match {
    case JNull => "None"
    case JBool(b) => if (b) "True" else "False"
    case JInt(i) => i.toString
    case JFloat(f) => Py.reprFloat(f)
    case JStr(s) => s
    case other => pyRepr(other)
  }

  /** Python `repr(value)` (used by str() on dicts/lists). */
  def pyRepr(v: JV): String = v match {
    case JNull => "None"
    case JBool(b) => if (b) "True" else "False"
    case JInt(i) => i.toString
    case JFloat(f) => Py.reprFloat(f)
    case JStr(s) => pyReprStr(s)
    case JArr(a) => a.map(pyRepr).mkString("[", ", ", "]")
    case JObj(e) =>
      e.map { case (k, x) => pyReprStr(k) + ": " + pyRepr(x) }.mkString("{", ", ", "}")
  }

  private def pyReprStr(s: String): String = {
    val useDouble = s.contains('\'') && !s.contains('"')
    val q = if (useDouble) '"' else '\''
    val sb = new StringBuilder
    sb.append(q)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c == q => sb.append('\\').append(c)
      case c if c < 0x20 || c == 0x7f => sb.append(f"\\x${c.toInt}%02x")
      case c => sb.append(c)
    }
    sb.append(q)
    sb.toString
  }

  /** `json.dumps(v, ensure_ascii=False)` with default separators. */
  def dumps(v: JV): String = {
    val sb = new StringBuilder
    def esc(s: String): Unit = {
      sb.append('"')
      s.foreach {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.append('"')
    }
    def go(x: JV): Unit = x match {
      case JNull => sb.append("null")
      case JBool(b) => sb.append(if (b) "true" else "false")
      case JInt(i) => sb.append(i.toString)
      case JFloat(f) =>
        if (f.isNaN) sb.append("NaN")
        else if (f.isInfinite) sb.append(if (f > 0) "Infinity" else "-Infinity")
        else sb.append(Py.reprFloat(f))
      case JStr(s) => esc(s)
      case JArr(a) =>
        sb.append('[')
        var first = true
        a.foreach { e => if (!first) sb.append(", "); first = false; go(e) }
        sb.append(']')
      case JObj(e) =>
        sb.append('{')
        var first = true
        e.foreach { case (k, x2) =>
          if (!first) sb.append(", ")
          first = false
          esc(k); sb.append(": "); go(x2)
        }
        sb.append('}')
    }
    go(v)
    sb.toString
  }

  final class ParseError(msg: String) extends Exception(msg)

  /** `json.loads` — strict RFC 8259 parse preserving key order; duplicate
    * keys keep first position, last value (CPython dict update semantics).
    */
  def parse(input: String): JV = {
    var i = 0
    val n = input.length
    def err(msg: String) = throw new ParseError(s"$msg at $i")
    def ws(): Unit = {
      while (i < n && (input.charAt(i) == ' ' || input.charAt(i) == '\t' ||
             input.charAt(i) == '\n' || input.charAt(i) == '\r')) i += 1
    }
    def parseStr(): String = {
      if (input.charAt(i) != '"') err("expected string")
      i += 1
      val sb = new StringBuilder
      while (true) {
        if (i >= n) err("unterminated string")
        val c = input.charAt(i)
        if (c == '"') { i += 1; return sb.toString }
        else if (c == '\\') {
          i += 1
          if (i >= n) err("bad escape")
          input.charAt(i) match {
            case '"' => sb.append('"'); i += 1
            case '\\' => sb.append('\\'); i += 1
            case '/' => sb.append('/'); i += 1
            case 'b' => sb.append('\b'); i += 1
            case 'f' => sb.append('\f'); i += 1
            case 'n' => sb.append('\n'); i += 1
            case 'r' => sb.append('\r'); i += 1
            case 't' => sb.append('\t'); i += 1
            case 'u' =>
              if (i + 4 >= n) err("bad \\u")
              val hex = input.substring(i + 1, i + 5)
              val cp = try Integer.parseInt(hex, 16) catch { case _: Exception => err("bad hex"); 0 }
              sb.append(cp.toChar) // surrogate pairs concatenate naturally
              i += 5
            case _ => err("bad escape")
          }
        } else if (c < 0x20) err("control char in string") // strict=True
        else { sb.append(c); i += 1 }
      }
      ""
    }
    def parseNum(): JV = {
      val start = i
      if (i < n && input.charAt(i) == '-') i += 1
      while (i < n && input.charAt(i) >= '0' && input.charAt(i) <= '9') i += 1
      var isFloat = false
      if (i < n && input.charAt(i) == '.') {
        isFloat = true; i += 1
        while (i < n && input.charAt(i) >= '0' && input.charAt(i) <= '9') i += 1
      }
      if (i < n && (input.charAt(i) == 'e' || input.charAt(i) == 'E')) {
        isFloat = true; i += 1
        if (i < n && (input.charAt(i) == '+' || input.charAt(i) == '-')) i += 1
        while (i < n && input.charAt(i) >= '0' && input.charAt(i) <= '9') i += 1
      }
      val s = input.substring(start, i)
      if (s.isEmpty || s == "-") err("bad number")
      if (isFloat) JFloat(java.lang.Double.parseDouble(s)) else JInt(BigInt(s))
    }
    def parseVal(): JV = {
      ws()
      if (i >= n) err("unexpected end")
      input.charAt(i) match {
        case '{' =>
          i += 1; ws()
          val m = mutable.LinkedHashMap.empty[String, JV]
          if (i < n && input.charAt(i) == '}') { i += 1; return JObj(m) }
          while (true) {
            ws()
            val k = parseStr()
            ws()
            if (i >= n || input.charAt(i) != ':') err("expected :")
            i += 1
            val v = parseVal()
            m.put(k, v)
            ws()
            if (i >= n) err("unterminated object")
            input.charAt(i) match {
              case ',' => i += 1
              case '}' => i += 1; return JObj(m)
              case _ => err("expected , or }")
            }
          }
          JObj(m)
        case '[' =>
          i += 1; ws()
          val a = mutable.ArrayBuffer.empty[JV]
          if (i < n && input.charAt(i) == ']') { i += 1; return JArr(a) }
          while (true) {
            a += parseVal()
            ws()
            if (i >= n) err("unterminated array")
            input.charAt(i) match {
              case ',' => i += 1
              case ']' => i += 1; return JArr(a)
              case _ => err("expected , or ]")
            }
          }
          JArr(a)
        case '"' => JStr(parseStr())
        case 't' =>
          if (input.startsWith("true", i)) { i += 4; JBool(true) } else err("bad literal")
        case 'f' =>
          if (input.startsWith("false", i)) { i += 5; JBool(false) } else err("bad literal")
        case 'n' =>
          if (input.startsWith("null", i)) { i += 4; JNull } else err("bad literal")
        case 'N' =>
          if (input.startsWith("NaN", i)) { i += 3; JFloat(Double.NaN) } else err("bad literal")
        case 'I' =>
          if (input.startsWith("Infinity", i)) { i += 8; JFloat(Double.PositiveInfinity) }
          else err("bad literal")
        case '-' if input.startsWith("-Infinity", i) =>
          i += 9; JFloat(Double.NegativeInfinity)
        case c if c == '-' || (c >= '0' && c <= '9') => parseNum()
        case _ => err("unexpected char")
      }
    }
    val v = parseVal()
    ws()
    if (i != n) err("trailing data")
    v
  }
}
