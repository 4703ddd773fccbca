package graft.extract

import scala.collection.mutable.{ArrayBuffer, ListBuffer}

/** Minimal HTML DOM replicating the observable behavior of
  * `BeautifulSoup(html, "html.parser")` for the operations the reference
  * pipeline performs:
  *
  *   - `.get_text(separator, strip)`  (jsonld_adapter.py:313,445 etc.)
  *   - `.find_all("script", {"type": "application/ld+json"})` and
  *     `.find("script", id="__NEXT_DATA__")` (jsonld_extractor.py:34,41)
  *   - `.title.string` (crawl_service.py:319-320)
  *   - class-based lookups, string search, next-sibling walk, decompose
  *     (adapter_yes123.py:262-345, adapter_yourator.py:146-199,273-300)
  *
  * Tokenization mirrors CPython html.parser with convert_charrefs=True:
  * text outside tags is entity-unescaped; script/style bodies are raw CDATA;
  * comments/declarations/PIs produce no text. bs4 merges adjacent data chunks
  * into one NavigableString, excludes Script/Stylesheet/TemplateString and
  * Comment types from get_text (bs4 >= 4.9 string_containers), and treats
  * HTML void elements as empty-element tags.
  */
object HtmlText {

  sealed trait Node { var parent: Elem = _ }

  /** kind 0 = NavigableString, 1 = Script/Stylesheet/TemplateString container */
  final class Text(var value: String, val kind: Int) extends Node

  final class Elem(val name: String, val attrs: List[(String, String)]) extends Node {
    val children: ArrayBuffer[Node] = ArrayBuffer.empty
    def attr(k: String): Option[String] = attrs.collectFirst { case (n, v) if n == k => v }
    def classes: Set[String] = attr("class").map(v => Py.splitWs(v).toSet).getOrElse(Set.empty)

    def append(n: Node): Unit = { n.parent = this; children += n }

    def descendants: Iterator[Node] = children.iterator.flatMap {
      case e: Elem => Iterator.single(e) ++ e.descendants
      case t => Iterator.single(t)
    }

    /** bs4 get_text(separator, strip): join interesting string descendants. */
    def getText(separator: String = "", strip: Boolean = false): String = {
      val parts = ListBuffer.empty[String]
      descendants.foreach {
        case t: Text if t.kind == 0 =>
          val v = if (strip) Py.strip(t.value) else t.value
          if (!strip || v.nonEmpty) parts += v
        case _ =>
      }
      parts.mkString(separator)
    }

    /** bs4 `.string`: sole string child (recursing through sole tag child). */
    def string: Option[String] = {
      if (children.size != 1) return None
      children.head match {
        case t: Text => Some(t.value)
        case e: Elem => e.string
      }
    }

    def findAll(tagName: String, attrEq: Map[String, String] = Map.empty): List[Elem] =
      descendants.collect {
        case e: Elem
            if e.name == tagName &&
              attrEq.forall { case (k, v) => e.attr(k).contains(v) } =>
          e
      }.toList

    def find(tagName: String, attrEq: Map[String, String] = Map.empty): Option[Elem] =
      descendants.collectFirst {
        case e: Elem
            if e.name == tagName &&
              attrEq.forall { case (k, v) => e.attr(k).contains(v) } =>
          e
      }

    def findByClass(cls: String): Option[Elem] =
      descendants.collectFirst { case e: Elem if e.classes.contains(cls) => e }

    def findAllByTagAndHref(tagName: String, hrefRe: scala.util.matching.Regex): List[Elem] =
      descendants.collect {
        case e: Elem
            if e.name == tagName &&
              e.attr("href").exists(h => hrefRe.findFirstIn(h).isDefined) =>
          e
      }.toList

    /** bs4 find(string=f): first string descendant satisfying f. */
    def findString(pred: String => Boolean): Option[Text] =
      descendants.collectFirst { case t: Text if pred(t.value) => t }

    def findAllStrings(pred: String => Boolean): List[Text] =
      descendants.collect { case t: Text if pred(t.value) => t }.toList

    def findNextSiblingElem: Option[Elem] = {
      if (parent == null) return None
      val idx = parent.children.indexWhere(_ eq this)
      parent.children.drop(idx + 1).collectFirst { case e: Elem => e }
    }

    def decompose(): Unit = {
      if (parent != null) {
        val idx = parent.children.indexWhere(_ eq this)
        if (idx >= 0) parent.children.remove(idx)
      }
    }
  }

  /** HTML void elements (bs4 HTMLTreeBuilder.empty_element_tags core set). */
  private val voidElems = Set("area", "base", "br", "col", "embed", "hr", "img",
    "input", "keygen", "link", "menuitem", "meta", "param", "source", "track", "wbr",
    "basefont", "bgsound", "command", "frame", "image", "isindex", "nextid", "spacer")

  private val cdataElems = Set("script", "style")
  private val containerElems = Set("script", "style", "template")

  private def isTagNameStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** Per-thread memo of the last parse, keyed by string identity: one page's
    * extraction parses the same html String many times (title, LD scripts,
    * field banks, anti-hallucination passes). Trees must be treated as
    * read-only by callers (nothing in this codebase mutates them).
    */
  private val lastParse = new ThreadLocal[(String, Elem)]

  def parseCached(html: String): Elem = {
    val memo = lastParse.get()
    if (memo != null && (memo._1 eq html)) memo._2
    else {
      val root = parse(html)
      lastParse.set((html, root))
      root
    }
  }

  /** Parse to a document root Elem. */
  def parse(html: String): Elem = {
    val root = new Elem("[document]", Nil)
    var stack = List(root)
    def top = stack.head

    val n = html.length
    var i = 0
    var cdataElem: String = null
    val dataBuf = new StringBuilder
    var dataKind = 0

    def flushData(): Unit = {
      if (dataBuf.nonEmpty) {
        val t = new Text(dataBuf.toString, dataKind)
        top.append(t)
        dataBuf.clear()
      }
    }
    def emitData(s: String, kind: Int): Unit = {
      if (s.isEmpty) return
      if (dataBuf.nonEmpty && dataKind != kind) flushData()
      dataKind = kind
      dataBuf.append(s)
    }

    def currentKind: Int = if (cdataElem != null || containerElems.contains(top.name)) 1 else 0

    while (i < n) {
      if (cdataElem != null) {
        // CDATA mode: scan for </ \s* name. Matcher region avoids the
        // O(n^2) remainder copies a substring-per-script would cost.
        val pat = java.util.regex.Pattern.compile(
          "(?i)</\\s*" + java.util.regex.Pattern.quote(cdataElem))
        val m0 = pat.matcher(html)
        m0.region(i, n)
        if (m0.find()) {
          val mStart = m0.start();
          {
            emitData(html.substring(i, mStart), 1)
            i = mStart
            // parse end tag
            val gt = html.indexOf('>', i)
            if (gt < 0) { emitData(html.substring(i), 1); i = n }
            else {
              flushData()
              // pop to matching elem
              cdataElem = null
              val nameEnd = i + 2 + html.substring(i + 2, gt).takeWhile(c => !Py.isSpace(c)).length
              val tag = html.substring(i + 2, nameEnd).toLowerCase
              stack.find(e => e.name == tag) match {
                case Some(e) => stack = stack.dropWhile(x => !(x eq e)).tail match {
                  case Nil => List(root); case s => s
                }
                case None =>
              }
              i = gt + 1
            }
          }
        } else {
          emitData(html.substring(i), 1)
          i = n
        }
      } else {
        val j0 = html.indexOf('<', i)
        val j = if (j0 < 0) n else j0
        if (i < j) emitData(Entities.unescape(html.substring(i, j)), currentKind)
        i = j
        if (i >= n) {} // done
        else if (i + 1 < n && isTagNameStart(html.charAt(i + 1))) {
          // start tag
          var k = i + 1
          while (k < n && !Py.isSpace(html.charAt(k)) && html.charAt(k) != '>' &&
                 html.charAt(k) != '/' ) k += 1
          val name = html.substring(i + 1, k).toLowerCase
          // parse attributes
          val attrs = ListBuffer.empty[(String, String)]
          var selfClosing = false
          var ok = true
          var done = false
          while (!done && ok) {
            while (k < n && (Py.isSpace(html.charAt(k)) ||
                   (html.charAt(k) == '/' && k + 1 < n && html.charAt(k + 1) != '>'))) k += 1
            if (k >= n) { ok = false }
            else if (html.charAt(k) == '>') { done = true; k += 1 }
            else if (html.charAt(k) == '/' && k + 1 < n && html.charAt(k + 1) == '>') {
              selfClosing = true; done = true; k += 2
            } else {
              val ns = k
              while (k < n && !Py.isSpace(html.charAt(k)) && html.charAt(k) != '/' &&
                     html.charAt(k) != '=' && html.charAt(k) != '>') k += 1
              val aname = html.substring(ns, k).toLowerCase
              var avalue = ""
              while (k < n && Py.isSpace(html.charAt(k))) k += 1
              if (k < n && html.charAt(k) == '=') {
                while (k < n && (html.charAt(k) == '=' || Py.isSpace(html.charAt(k)))) k += 1
                if (k < n && (html.charAt(k) == '"' || html.charAt(k) == '\'')) {
                  val q = html.charAt(k)
                  val ve = html.indexOf(q, k + 1)
                  if (ve < 0) { ok = false }
                  else { avalue = html.substring(k + 1, ve); k = ve + 1 }
                } else {
                  val vs = k
                  while (k < n && !Py.isSpace(html.charAt(k)) && html.charAt(k) != '>') k += 1
                  avalue = html.substring(vs, k)
                }
              }
              if (ok && aname.nonEmpty) attrs += (aname -> Entities.unescape(avalue))
            }
          }
          if (!ok) { // incomplete tag at EOF: html.parser close() flushes as data
            emitData(html.substring(i), currentKind)
            i = n
          } else {
            flushData()
            val e = new Elem(name, attrs.toList)
            top.append(e)
            if (!selfClosing && !voidElems.contains(name)) {
              stack = e :: stack
              if (cdataElems.contains(name)) cdataElem = name
            }
            i = k
          }
        } else if (html.startsWith("</", i)) {
          val gt = html.indexOf('>', i)
          if (gt < 0) { emitData(html.substring(i), currentKind); i = n }
          else {
            flushData()
            val tag = html.substring(i + 2, gt).trim.toLowerCase
            stack.find(e => e.name == tag && (e ne root)) match {
              case Some(e) =>
                stack = stack.dropWhile(x => !(x eq e)).tail match {
                  case Nil => List(root); case s => s
                }
              case None => // unmatched end tag: ignored
            }
            i = gt + 1
          }
        } else if (html.startsWith("<!--", i)) {
          flushData() // comment is a sibling node: breaks string merging
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3 // comments produce no text
        } else if (html.startsWith("<?", i)) {
          flushData()
          val e = html.indexOf('>', i + 2)
          i = if (e < 0) n else e + 1
        } else if (html.startsWith("<![CDATA[", i)) {
          flushData()
          val e = html.indexOf("]]>", i + 9)
          i = if (e < 0) n else e + 3 // bs4 CData via html.parser: unknown decl, dropped
        } else if (html.startsWith("<!", i)) {
          flushData()
          val e = html.indexOf('>', i + 2)
          i = if (e < 0) n else e + 1 // doctype/declaration
        } else {
          // lone '<'
          emitData("<", currentKind)
          i += 1
        }
      }
    }
    flushData()
    root
  }

  /** `BeautifulSoup(html, "html.parser").get_text(separator, strip)` */
  def getText(html: String, separator: String = " ", strip: Boolean = true): String =
    parse(html).getText(separator, strip)

  /** getText via the per-thread parse memo (hot path: full-page inputs). */
  def getTextCached(html: String, separator: String = " ", strip: Boolean = true): String = {
    // the (sep=" ", strip=true) full-page text is requested ~5x per page
    // (field banks + anti-hallucination); memoize alongside the parse
    if (separator == " " && strip) {
      val memo = lastText.get()
      if (memo != null && (memo._1 eq html)) return memo._2
      val t = parseCached(html).getText(" ", strip = true)
      lastText.set((html, t))
      t
    } else parseCached(html).getText(separator, strip)
  }

  private val lastText = new ThreadLocal[(String, String)]

  /** get_text after decomposing script/style, as in
    * jsonld_adapter.py:311-313 / adapter_1111.py:31-33.
    * (Script/style text is already excluded from getText, so this is the
    * same operation; kept for intent clarity.)
    */
  def getTextNoScript(html: String, separator: String = " ", strip: Boolean = true): String =
    getTextCached(html, separator, strip)

  /** `soup.title.string.strip() if soup.title else ""` (crawl_service.py:319-320) */
  def pageTitle(html: String): String = {
    val root = parseCached(html)
    root.find("title").flatMap(_.string).map(Py.strip).getOrElse("")
  }
}
