package graft.extract

import scala.io.Source

/** Port of CPython's `html.unescape` (Lib/html/__init__.py).
  *
  * The reference calls `html.unescape` before every description/company-field
  * clean (e.g. jsonld_adapter.py:443, adapter_104.py:37), so byte parity
  * requires the exact HTML5 entity table and the WHATWG invalid-charref
  * replacement map. Both tables are dumped verbatim from CPython into
  * resources (html5_entities.tsv, invalid_charrefs.tsv, invalid_codepoints.tsv).
  */
object Entities {

  private def resLines(name: String): Iterator[String] = {
    val in = getClass.getResourceAsStream(s"/graft/$name")
    require(in != null, s"missing resource $name")
    Source.fromInputStream(in, "UTF-8").getLines()
  }

  /** name (with/without trailing ';') -> expansion */
  val html5: Map[String, String] = resLines("html5_entities.tsv").map { l =>
    val Array(name, cps) = l.split("\t", 2)
    val sb = new java.lang.StringBuilder
    if (cps.nonEmpty) cps.split(" ").foreach(c => sb.appendCodePoint(c.toInt))
    name -> sb.toString
  }.toMap

  private val invalidCharrefs: Map[Int, String] = resLines("invalid_charrefs.tsv").map { l =>
    val parts = l.split("\t", 2)
    val sb = new java.lang.StringBuilder
    if (parts.length > 1 && parts(1).nonEmpty)
      parts(1).split(" ").foreach(c => sb.appendCodePoint(c.toInt))
    parts(0).toInt -> sb.toString
  }.toMap

  private val invalidCodepoints: Set[Int] =
    resLines("invalid_codepoints.tsv").map(_.toInt).toSet

  // CPython: r'&(#[0-9]+;?|#[xX][0-9a-fA-F]+;?|[^\t\n\f <&#;]{1,32};?)'
  private val charref = ("&(#[0-9]+;?|#[xX][0-9a-fA-F]+;?|" +
    "[^\\t\\n\\u000c <&#;]{1,32};?)").r

  private def replace(s: String): String = {
    if (s.charAt(0) == '#') {
      val num =
        try {
          if (s.charAt(1) == 'x' || s.charAt(1) == 'X')
            java.lang.Long.parseLong(Py.rstrip(s.substring(2), ";"), 16)
          else java.lang.Long.parseLong(Py.rstrip(s.substring(1), ";"))
        } catch { case _: NumberFormatException => return "�" }
      if (num > Int.MaxValue) return "�"
      val n = num.toInt
      invalidCharrefs.get(n) match {
        case Some(r) => r
        case None =>
          if ((n >= 0xd800 && n <= 0xdfff) || n > 0x10ffff) "�"
          else if (invalidCodepoints.contains(n)) ""
          else new String(Character.toChars(n))
      }
    } else {
      html5.get(s) match {
        case Some(v) => v
        case None =>
          // longest matching prefix of length >= 2, as CPython does
          var x = s.length - 1
          while (x > 1) {
            html5.get(s.substring(0, x)) match {
              case Some(v) => return v + s.substring(x)
              case None => x -= 1
            }
          }
          "&" + s
      }
    }
  }

  /** `html.unescape(s)` */
  def unescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder
    var last = 0
    for (m <- charref.findAllMatchIn(s)) {
      sb.append(s, last, m.start)
      sb.append(replace(m.group(1)))
      last = m.end
    }
    sb.append(s, last, s.length)
    sb.toString
  }
}
