package graft.extract

import graft.extract.Json._
import scala.collection.mutable

/** Port of core/services/jsonld_extractor.py — JSON-LD extraction from HTML
  * (X1-X3 in SURVEY.md §2.8).
  */
object JsonLd {

  // jsonld_extractor.py:48 CDATA wrapper strip
  private val ReCdata = "(?i)^\\s*<!\\[CDATA\\[|\\]\\]>\\s*$".r

  /** jsonld_extractor.py:23-76 `JsonLdExtractor.extract`.
    * Returns the LD objects in document order; `_next_data` (parsed
    * `__NEXT_DATA__` script) is injected into every object when present.
    */
  def extract(html: String): List[JObj] = {
    if (html == null || html.isEmpty) return Nil
    val root = HtmlText.parseCached(html)

    val nextData: Option[JV] =
      root.find("script", Map("id" -> "__NEXT_DATA__")).flatMap(_.string).flatMap { s =>
        try Some(Json.parse(s)) catch { case _: Exception => None }
      }

    val results = mutable.ListBuffer.empty[JObj]
    for (tag <- root.findAll("script", Map("type" -> "application/ld+json"))) {
      tag.string.filter(_.nonEmpty).foreach { str =>
        try {
          val raw = ReCdata.replaceAllIn(Py.strip(str), "")
          val data = Json.parse(raw)
          val extracted = mutable.ListBuffer.empty[JObj]
          data match {
            case JArr(items) =>
              items.foreach { case o: JObj => extracted += o; case _ => }
            case o: JObj =>
              o.get("@graph") match {
                case Some(JArr(items)) =>
                  items.foreach { case g: JObj => extracted += g; case _ => }
                case _ => extracted += o
              }
            case _ => // scalar top-level: Python would append nothing
          }
          nextData.foreach(nd => extracted.foreach(_.put("_next_data", nd)))
          results ++= extracted
        } catch { case _: Exception => /* parse errors skip the tag */ }
      }
    }

    if (results.isEmpty && nextData.isDefined) {
      val o = JObj.empty
      o.put("@type", JStr("NextDataNode"))
      o.put("_next_data", nextData.get)
      results += o
    }
    results.toList
  }

  /** jsonld_extractor.py:79-89 `_walk_objects` — DFS collecting dicts. */
  def walkObjects(data: JV): List[JObj] = {
    val found = mutable.ListBuffer.empty[JObj]
    def go(v: JV): Unit = v match {
      case o: JObj =>
        found += o
        o.entries.valuesIterator.foreach(go)
      case JArr(items) => items.foreach(go)
      case _ =>
    }
    go(data)
    found.toList
  }

  /** jsonld_extractor.py:92-99 `find_by_type` over a list of LD objects. */
  def findByType(ldList: List[JObj], target: String): Option[JObj] = {
    val all = ldList.flatMap(walkObjects)
    all.find { obj =>
      obj.get("@type") match {
        case Some(JStr(t)) => t == target
        case Some(JArr(items)) => items.contains(JStr(target))
        case _ => false
      }
    }
  }

  def findJobPosting(ldList: List[JObj]): Option[JObj] = findByType(ldList, "JobPosting")
  def findOrganization(ldList: List[JObj]): Option[JObj] = findByType(ldList, "Organization")

  /** jsonld_adapter.py:520-528 `_safe_get` — nested dict get, JNull-safe. */
  def safeGet(data: JV, keys: String*): JV = {
    if (data == null) return JNull
    var curr: JV = data
    for (k <- keys) {
      curr match {
        case o: JObj =>
          curr = o.get(k).getOrElse(JNull)
          if (curr == JNull) return JNull
        case _ => return JNull
      }
    }
    curr
  }
}
