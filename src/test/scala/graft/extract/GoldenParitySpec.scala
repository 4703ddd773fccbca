package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/** Byte-parity tests against CPython-generated goldens
  * (tools/gen_goldens.py → src/test/resources/graft/goldens/).
  */
class GoldenParitySpec extends AnyFunSuite {

  /** Decode python `unicode_escape` encoding. */
  def unesc(s: String): String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '\'' => sb.append('\''); i += 2
          case '"' => sb.append('"'); i += 2
          case 'x' =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 4), 16).toChar); i += 4
          case 'u' =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case 'U' =>
            sb.appendCodePoint(Integer.parseInt(s.substring(i + 2, i + 10), 16)); i += 10
          case 'a' => sb.append(7.toChar); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'v' => sb.append(11.toChar); i += 2
          case '0' => sb.append(0.toChar); i += 2
          case other => sb.append('\\').append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def cases(name: String): List[(String, String)] = {
    val in = getClass.getResourceAsStream(s"/graft/goldens/$name")
    require(in != null, s"missing golden $name")
    Source.fromInputStream(in, "UTF-8").getLines().map { l =>
      val Array(a, b) = l.split("\t", 2)
      (unesc(a), unesc(b))
    }.toList
  }

  test("html.unescape parity") {
    for ((input, expected) <- cases("unescape.tsv"))
      assert(Entities.unescape(input) == expected, s"\ninput: $input")
  }

  test("BeautifulSoup get_text(' ', strip=True) parity") {
    for ((input, expected) <- cases("gettext.tsv"))
      assert(HtmlText.getText(input) == expected, s"\ninput: $input")
  }

  test("page title parity") {
    for ((input, expected) <- cases("title.tsv"))
      assert(HtmlText.pageTitle(input) == expected, s"\ninput: $input")
  }

  test("json.loads + dumps(ensure_ascii=False) parity") {
    for ((input, expected) <- cases("json_roundtrip.tsv"))
      assert(Json.dumps(Json.parse(input)) == expected, s"\ninput: $input")
  }
}
