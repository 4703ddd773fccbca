package graft.extract

import graft.extract.Json._
import graft.extract.JsonLd.safeGet
import graft.extract.TextClean._
import scala.util.matching.Regex

/** Python `int(x)` as used by adapter_cakeresume.py:56 — int of int/float
  * truncates; int of a string requires an integer literal.
  */
private object PyInt {
  def apply(v: JV): Option[Int] = v match {
    case JInt(i) => Some(i.toInt)
    case JFloat(f) => Some(f.toInt)
    case JStr(s) =>
      val t = Py.strip(s)
      try Some(java.lang.Integer.parseInt(t)) catch { case _: Exception => None }
    case JBool(b) => Some(if (b) 1 else 0)
    case _ => None
  }
}

/** adapter_cakeresume.py */
class AdapterCakeResume extends Adapter {
  override def platform: String = Platforms.CAKE

  /** adapter_cakeresume.py:21-34 — learn_more/view_all JSON leak guard. */
  override def getDescription(ld: JObj): Option[String] = {
    val desc = ld("description")
    if (!truthy(desc)) return None
    val text = Entities.unescape(pyStr(desc))
    if (text.contains("\"learn_more\"") && text.contains("\"view_all\"")) return None
    Some(HtmlText.getText(text))
  }

  override def getUrl(ld: JObj, fallbackUrl: Option[String]): String = {
    val u = ld("url")
    if (truthy(u)) pyStr(u) else fallbackUrl.getOrElse("")
  }

  /** adapter_cakeresume.py:39-41 — last path segment. */
  override def getSourceId(ld: JObj, url: Option[String]): Option[String] = {
    val target = getUrl(ld, url)
    if (target.nonEmpty) Some(target.split("/", -1).last) else None
  }

  override def getSalary(ld: JObj): Parsers.SalaryResult =
    Parsers.parseSalary(ld.get("baseSalary").getOrElse(JObj.empty))

  override def getEducation(ld: JObj): String = {
    val edu = ld("educationRequirements")
    if (!truthy(edu)) "不拘" else mapEducationText(Some(pyStr(edu)))
  }

  /** adapter_cakeresume.py:51-58 — NEXT_DATA min_work_exp_year. */
  override def getExperience(ld: JObj): Option[Int] = {
    val nd = ld("_next_data")
    if (truthy(nd)) {
      val v = safeGet(nd, "props", "pageProps", "job", "min_work_exp_year")
      if (v != JNull) {
        PyInt(v) match {
          case Some(i) => return Some(i)
          case None =>
        }
      }
    }
    val ext = ld("experienceRequirements")
    if (truthy(ext)) Parsers.parseExperience(JStr(pyStr(ext))) else None
  }

  /** adapter_cakeresume.py:63-71 */
  override def getCompanyName(ld: JObj): Option[String] = {
    val nd = ld("_next_data")
    if (truthy(nd)) {
      val n = safeGet(nd, "props", "pageProps", "company", "name")
      if (truthy(n)) return Some(pyStr(n))
    }
    val n = safeGet(ld, "hiringOrganization", "name")
    if (truthy(n)) return Some(pyStr(n))
    if (ld("@type") == JStr("Organization") || ld("@type") == JStr("NextDataNode")) {
      val nm = ld("name")
      return if (truthy(nm)) Some(pyStr(nm)) else None
    }
    None
  }

  /** adapter_cakeresume.py:82-86 */
  private def normalizeUrl(url: String): String = {
    if (url == null || url.isEmpty) return url
    var u = url.replace("www.cakeresume.com", "www.cake.me").replace("cakeresume.com", "cake.me")
    if (u.contains("vertiv-taiwan-co-ltd")) u = u.replace("vertiv-taiwan-co-ltd", "VertivTW")
    u
  }

  /** adapter_cakeresume.py:73-80 */
  override def getCompanyUrl(ld: JObj): Option[String] = {
    val nd = ld("_next_data")
    if (truthy(nd)) {
      val slug = safeGet(nd, "props", "pageProps", "company", "slug")
      if (truthy(slug))
        return Some(normalizeUrl(s"https://www.cake.me/companies/${pyStr(slug)}"))
    }
    var url: JV = safeGet(ld, "hiringOrganization", "url")
    if (!truthy(url)) url = safeGet(ld, "hiringOrganization", "sameAs")
    if (!truthy(url) &&
        (ld("@type") == JStr("Organization") || ld("@type") == JStr("NextDataNode"))) {
      url = ld("url")
      if (!truthy(url)) url = ld("sameAs")
    }
    if (truthy(url)) Some(normalizeUrl(pyStr(url))) else None
  }

  /** adapter_cakeresume.py:88-91 */
  override def getAddress(ld: JObj, html: Option[String]): Option[String] = {
    val district = getDistrict(ld, None)
    val street = cleanTaiwan {
      val v = safeGet(ld, "jobLocation", "address", "streetAddress")
      if (truthy(v)) Some(pyStr(v)) else None
    }
    Some(dedupeAddress(List(district.getOrElse(""), street)))
  }

  override def getCompanyWebsite(ld: JObj): Option[String] =
    filterWebsite(safeGet(ld, "hiringOrganization", "sameAs"))

  override def getCompanySourceId(ld: JObj): Option[String] =
    getCompanyUrl(ld).map(u => Py.rstrip(u, "/").split("/", -1).last)

  /** adapter_cakeresume.py:100-113 */
  override def getCompanyAddress(ld: JObj): Option[String] = {
    val nd = ld("_next_data")
    if (truthy(nd)) {
      val addr = safeGet(nd, "props", "pageProps", "company", "address")
      if (truthy(addr)) return standardizeTaiwanAddress(Some(pyStr(addr)))
    }
    var addrNode = safeGet(ld, "hiringOrganization", "address")
    if (!truthy(addrNode) && ld("@type") == JStr("Organization")) addrNode = ld("address")
    if (!truthy(addrNode)) return None
    addrNode match {
      case JStr(s) => standardizeTaiwanAddress(Some(s))
      case o: JObj =>
        def g(k: String): Option[String] = {
          val v = o(k)
          if (v == JNull) None else Some(pyStr(v))
        }
        val reg = standardizeTaiwanAddress(g("addressRegion"))
        val loc = standardizeTaiwanAddress(g("addressLocality"))
        val strt = standardizeTaiwanAddress(g("streetAddress"))
        val dist = dedupeAddress(List(reg.getOrElse(""), loc.getOrElse("")))
        Some(dedupeAddress(List(dist, strt.getOrElse(""))))
      case other => Some(pyStr(other))
    }
  }

  /** adapter_cakeresume.py:115-127. `_breadcrumbs` is never injected by the
    * pipeline (grep-verified), so the crumb loop is a dead path kept for
    * LD-literal inputs; `get_title` falls back to title-or-name.
    */
  override def getIndustry(ld: JObj): Option[String] = {
    val companyName = getCompanyName(ld)
    ld("_breadcrumbs") match {
      case JArr(crumbs) if crumbs.nonEmpty =>
        val sorted = crumbs.toList.sortBy {
          case o: JObj => PyInt(o("position")).getOrElse(0)
          case _ => 0
        }
        for (item <- sorted.reverse) {
          val name = item match {
            case o: JObj =>
              safeGet(o, "item", "name") match {
                case JStr(s) => s
                case JNull => ""
                case other => pyStr(other)
              }
            case _ => ""
          }
          val skipNames = List("首頁", "找工作", "Job Search", "Home", "Jobs")
          val jobTitle = {
            val t = ld("name")
            val tt = if (truthy(t)) t else ld("title")
            if (truthy(tt)) Some(pyStr(tt)) else None
          }
          val skip = name.isEmpty || skipNames.contains(name) ||
            companyName.exists(cn => cn.contains(name) || name.contains(cn)) ||
            jobTitle.contains(name)
          if (!skip) return Some(name)
        }
        super.getIndustry(ld)
      case _ => super.getIndustry(ld)
    }
  }

  override def getWorkHours(ld: JObj): Option[String] = ld("workHours") match {
    case JArr(items) => Some(items.map(pyStr).mkString(", "))
    case JNull => None
    case other => Some(pyStr(other))
  }

  override def getSkills(ld: JObj): Option[String] = ld("skills") match {
    case JArr(items) => Some(items.map(pyStr).mkString(", "))
    case JNull => None
    case other => Some(pyStr(other))
  }

  /** adapter_cakeresume.py:137-153 */
  override def getCapital(ld: JObj): Option[String] = {
    val nd = ld("_next_data")
    var v: JV = JNull
    if (truthy(nd)) {
      v = safeGet(nd, "props", "pageProps", "company", "capital")
      if (!truthy(v)) v = safeGet(nd, "props", "pageProps", "job", "company", "capital")
    }
    if (!truthy(v)) v = ld("capital")
    validateNumericNoise(v, "capital")
  }

  override def getEmployeeCount(ld: JObj): Option[String] = {
    val nd = ld("_next_data")
    var v: JV = JNull
    if (truthy(nd)) {
      v = safeGet(nd, "props", "pageProps", "company", "numberOfEmployees")
      if (!truthy(v)) v = safeGet(nd, "props", "pageProps", "job", "company", "numberOfEmployees")
    }
    if (!truthy(v)) v = ld("numberOfEmployees")
    validateNumericNoise(v, "employees")
  }
}

/** adapter_yes123.py */
class AdapterYes123 extends Adapter {
  override def platform: String = Platforms.YES123

  /** adapter_yes123.py:24-47 — anti-hallucination over page text. */
  override def mapToCompany(ld: JObj, html: Option[String]): Option[CompanyRow] = {
    super.mapToCompany(ld, html).map { company =>
      html match {
        case Some(h) =>
          var emp = company.employeeCount
          var cap = company.capital
          if (h.contains("員工人數") && h.contains("暫不公開")) {
            val text = HtmlText.getTextNoScript(h)
            if ("(?U)員工人數[:：\\s]*暫不公開".r.findFirstIn(text).isDefined) emp = None
          }
          if (h.contains("資本額") && h.contains("暫不公開")) {
            val text = HtmlText.getTextNoScript(h)
            if ("(?U)資本額[:：\\s]*暫不公開".r.findFirstIn(text).isDefined) cap = None
          }
          company.copy(employeeCount = emp, capital = cap)
        case None => company
      }
    }
  }

  override def getDescription(ld: JObj): Option[String] = {
    val desc = ld("description")
    if (!truthy(desc)) return None
    Some(HtmlText.getText(Entities.unescape(pyStr(desc))))
  }

  /** adapter_yes123.py:66-71 */
  override def getUrl(ld: JObj, fallbackUrl: Option[String]): String = {
    val u0 = ld("url")
    val url = if (truthy(u0)) pyStr(u0) else fallbackUrl.getOrElse("")
    if (url.startsWith("/")) s"https://www.yes123.com.tw$url" else url
  }

  private val RePid: Regex = "(?U)p_id=([^&]+)".r
  private val ReJid: Regex = "(?U)job_id=([^&]+)".r

  /** adapter_yes123.py:73-82 — composite p_id + job_id. */
  override def getSourceId(ld: JObj, url: Option[String]): Option[String] = {
    val target = getUrl(ld, url)
    val p = RePid.findFirstMatchIn(target)
    val j = ReJid.findFirstMatchIn(target)
    (p, j) match {
      case (Some(pm), Some(jm)) => Some(s"${pm.group(1)}_${jm.group(1)}")
      case (Some(pm), None) => Some(pm.group(1))
      case _ => None
    }
  }

  override def getSalary(ld: JObj): Parsers.SalaryResult =
    Parsers.parseSalary(ld.get("baseSalary").getOrElse(JObj.empty))

  /** adapter_yes123.py:96-103 */
  override def getEducation(ld: JObj): String = {
    var edu = ld("educationRequirements")
    edu match { case JArr(a) if a.nonEmpty => edu = a.head; case _ => }
    edu match {
      case o: JObj =>
        val c = o("credentialCategory")
        val n = if (truthy(c)) c else o("name")
        edu = if (truthy(n)) n else JStr(pyRepr(o))
      case _ =>
    }
    mapEducationText(if (truthy(edu)) Some(pyStr(edu)) else None)
  }

  override def getExperience(ld: JObj): Option[Int] =
    Parsers.parseExperience(ld("experienceRequirements"))

  /** adapter_yes123.py:114-129 */
  override def getCompanyName(ld: JObj): Option[String] = {
    val n = safeGet(ld, "hiringOrganization", "name")
    if (truthy(n)) return Some(pyStr(n))
    if (ld("@type") == JStr("Organization")) {
      val nm = ld("name")
      return if (truthy(nm)) Some(pyStr(nm)) else None
    }
    val title = {
      val t = ld("_injected_html_title")
      if (truthy(t)) t else ld("_injected_title")
    }
    if (truthy(title)) {
      val name = Py.strip(pyStr(title).split("-", -1)(0).split("｜", -1)(0).split("\\|", -1)(0))
      if (!name.contains("人力銀行") && name.nonEmpty) return Some(name)
    }
    None
  }

  /** adapter_yes123.py:131-144 */
  override def getCompanyUrl(ld: JObj): Option[String] = {
    val u1 = safeGet(ld, "hiringOrganization", "sameAs")
    if (truthy(u1)) return Some(pyStr(u1))
    val u2 = safeGet(ld, "hiringOrganization", "url")
    if (truthy(u2)) return Some(pyStr(u2))
    if (ld("@type") == JStr("Organization")) {
      val s = ld("sameAs")
      if (truthy(s)) return Some(pyStr(s))
      val u = ld("url")
      if (truthy(u)) return Some(pyStr(u))
      return None
    }
    getCompanySourceId(ld).map(sid =>
      s"https://www.yes123.com.tw/wk_index/comp_info.asp?p_id=$sid")
  }

  override def getSalaryCurrency(ld: JObj): Option[String] = Some("TWD")

  /** adapter_yes123.py:151-172 — overseas-region logic. */
  override def getAddressCountry(ld: JObj): Option[String] = {
    val region = safeGet(ld, "jobLocation", "address", "addressRegion")
    val locality = safeGet(ld, "jobLocation", "address", "addressLocality")
    if (truthy(region)) {
      val r = pyStr(region)
      val overseas = List("亞洲", "美洲", "歐洲", "大洋洲", "非洲", "港澳")
      if (overseas.exists(r.contains)) {
        if (truthy(locality)) {
          val l = pyStr(locality)
          val countries = List("越南", "日本", "美國", "中國", "泰國", "菲律賓", "印尼",
            "馬來西亞", "新加坡", "韓國", "英國", "德國", "法國", "澳洲")
          countries.find(l.contains).foreach(c => return Some(c))
          return Some(l.replace("地區", "").replace("東南亞", "").replace("東北亞", ""))
        }
        return Some(r)
      }
    }
    Some("TW")
  }

  /** adapter_yes123.py:175-181 */
  override def getAddress(ld: JObj, html: Option[String]): Option[String] = {
    val district = getDistrict(ld, None)
    val street = standardizeTaiwanAddress {
      val v = safeGet(ld, "jobLocation", "address", "streetAddress")
      if (truthy(v)) Some(pyStr(v)) else None
    }
    Some(dedupeAddress(List(district.getOrElse(""), street.getOrElse(""))))
  }

  /** adapter_yes123.py:184-186 — reads the (never-populated) company_web key. */
  override def getCompanyWebsite(ld: JObj): Option[String] =
    filterWebsite(ld("company_web"))

  /** adapter_yes123.py:188-209 */
  override def getCompanySourceId(ld: JObj): Option[String] = {
    val inj = {
      val u = ld("_url")
      if (truthy(u)) u else ld("_source_url")
    }
    if (truthy(inj)) {
      RePid.findFirstMatchIn(pyStr(inj)).foreach { m =>
        val sid = m.group(1)
        if (sid.nonEmpty && !sid.toLowerCase.contains("yes123")) return Some(sid)
      }
    }
    val url = {
      val s = safeGet(ld, "hiringOrganization", "sameAs")
      if (truthy(s)) s else safeGet(ld, "hiringOrganization", "url")
    }
    if (truthy(url)) {
      RePid.findFirstMatchIn(pyStr(url)).foreach { m =>
        val sid = m.group(1)
        if (sid.nonEmpty && !sid.toLowerCase.contains("yes123")) return Some(sid)
      }
    }
    None
  }

  /** adapter_yes123.py:211-229 */
  override def getCompanyAddress(ld: JObj): Option[String] = {
    var addrNode = safeGet(ld, "hiringOrganization", "address")
    if (!truthy(addrNode) && ld("@type") == JStr("Organization")) addrNode = ld("address")
    if (!truthy(addrNode)) return None
    addrNode match {
      case JStr(s) => standardizeTaiwanAddress(Some(s)).filter(_.nonEmpty)
      case o: JObj =>
        def g(k: String): Option[String] = {
          val v = o(k)
          if (v == JNull) None else Some(pyStr(v))
        }
        val region = standardizeTaiwanAddress(g("addressRegion"))
        val locality = standardizeTaiwanAddress(g("addressLocality"))
        val street = standardizeTaiwanAddress(g("streetAddress"))
        val district = dedupeAddress(List(region.getOrElse(""), locality.getOrElse("")))
        Some(dedupeAddress(List(district, street.getOrElse("")))).filter(_.nonEmpty)
      case other => Some(pyStr(other))
    }
  }

  override def getWorkHours(ld: JObj): Option[String] = ld("workHours") match {
    case JArr(items) => if (items.nonEmpty) Some(items.map(pyStr).mkString(", ")) else None
    case JNull => None
    case other => if (truthy(other)) Some(pyStr(other)) else None
  }

  override def getSkills(ld: JObj): Option[String] = ld("skills") match {
    case JArr(items) => if (items.nonEmpty) Some(items.map(pyStr).mkString(", ")) else None
    case JNull => None
    case other => if (truthy(other)) Some(pyStr(other)) else None
  }

  override def getCapital(ld: JObj): Option[String] =
    validateNumericNoise(ld("capital"), "capital")

  /** adapter_yes123.py:251-260 */
  override def getEmployeeCount(ld: JObj): Option[String] = {
    val emp = ld("numberOfEmployees")
    val result: JV = emp match {
      case o: JObj =>
        val unit = {
          val u = o("unitText")
          if (o.has("unitText") && u != JNull) pyStr(u) else ""
        }
        JStr(pyStr(o("value")) + unit)
      case JNull => JNull
      case other => if (truthy(other)) JStr(pyStr(other)) else JNull
    }
    validateNumericNoise(result, "employees")
  }

  /** adapter_yes123.py:262-345 — label/sibling DOM walk. Note the 方式-1
    * regex is built with an f-string where `{2,}` evaluates to the literal
    * "(2,)", so it can essentially never match — the sibling walk (方式 2)
    * is the live path. Replicated as-is.
    */
  override def extractCompanyFieldFromHtml(html: String, fieldType: String): Option[String] = {
    val root = HtmlText.parseCached(html)
    val mapping: Map[String, List[String]] = Map(
      "capital" -> List("資本額：", "資本金額：", "本金額：", "資本額", "資本金額", "本金額"),
      "employees" -> List("員工人數：", "員工數：", "員工人數", "員工數"),
      "address" -> List("企業地址：", "公 司 地 址：", "公司地址："),
      "description" -> List("企業簡介", "經營理念", "主要商品", "行業說明", "公司簡介"))

    mapping.get(fieldType) match {
      case None => super.extractCompanyFieldFromHtml(html, fieldType)
      case Some(labels) if fieldType == "description" =>
        val parts = scala.collection.mutable.ListBuffer.empty[String]
        for (label <- labels) {
          root.findString(s => s != null && s.contains(label)).foreach { node =>
            if (node.parent != null) {
              var el = node.parent
              if (el.getText(strip = true).length < label.length + 5 && el.parent != null)
                el = el.parent
              val fullText = el.getText(" ", strip = true)
              if (fullText.contains(label)) {
                val v0 = Py.strip(fullText.split(java.util.regex.Pattern.quote(label), -1).last)
                val v = Py.strip(Py.strip(v0, "："), ":")
                if (v.length > 10 && !v.startsWith("---")) parts += s"【$label】\n$v"
              }
            }
          }
        }
        if (parts.nonEmpty) Some(parts.mkString("\n\n"))
        else super.extractCompanyFieldFromHtml(html, fieldType)
      case Some(labels) =>
        for (label <- labels) {
          val deadRe = (java.util.regex.Pattern.quote(label) +
            "\\s*(?:[:：\\s]|<[^>]+>)*\\s*([^\\s,，|](2,))").r
          for (node <- root.findAllStrings(s => s != null && s.contains(label))) {
            if (node.parent != null) {
              val parentText = node.parent.getText(" ", strip = true)
              deadRe.findFirstMatchIn(parentText) match {
                case Some(m) =>
                  var v = Py.strip(Py.strip(Py.strip(m.group(1)), "："), ":")
                  v = Py.strip("[^\\u4e00-\\u9fa5a-zA-Z0-9_\\-\\s.#（）()]".r.replaceAllIn(v, ""))
                  val isBad = fieldType == "employees" &&
                    List("1", "1人", "0", "0人").contains(v.replace(" ", ""))
                  if (!isBad && v.nonEmpty && v.length < 100) return Some(v)
                case None =>
              }
              node.parent.findNextSiblingElem.foreach { sib =>
                var v = Py.strip(Py.strip(sib.getText(strip = true), "："), ":")
                v = Py.strip("[^\\u4e00-\\u9fa5a-zA-Z0-9_\\-\\s.#（）()]".r.replaceAllIn(v, ""))
                val isBad = fieldType == "employees" &&
                  List("1", "1人", "0", "0人").contains(v.replace(" ", ""))
                if (!isBad && v.nonEmpty && v.length < 100) return Some(v)
              }
            }
          }
        }
        val result = super.extractCompanyFieldFromHtml(html, fieldType)
        result match {
          case Some(r) if fieldType == "employees" &&
              List("1", "1人", "0", "0人").contains(r.replace(" ", "")) => None
          case other => other
        }
    }
  }
}

/** adapter_yourator.py */
class AdapterYourator extends Adapter {
  override def platform: String = Platforms.YOURATOR

  /** adapter_yourator.py:25-44 — keep from 【工作內容】 onward. */
  override def getDescription(ld: JObj): Option[String] = {
    val desc = ld("description")
    if (!truthy(desc)) return None
    val cleanText = HtmlText.getText(Entities.unescape(pyStr(desc)))
    if (cleanText.contains("【工作內容】")) {
      val parts = cleanText.split(java.util.regex.Pattern.quote("【工作內容】"), 2)
      if (parts.length > 1) return Some("【工作內容】" + parts(1))
    }
    Some(cleanText)
  }

  override def getUrl(ld: JObj, fallbackUrl: Option[String]): String = {
    val u = ld("url")
    if (truthy(u)) pyStr(u) else fallbackUrl.getOrElse("")
  }

  private val ReJobsId: Regex = "(?U)jobs/(\\d+)".r

  override def getSourceId(ld: JObj, url: Option[String]): Option[String] =
    ReJobsId.findFirstMatchIn(getUrl(ld, url)).map(_.group(1))

  override def getSalary(ld: JObj): Parsers.SalaryResult =
    Parsers.parseSalary(ld.get("baseSalary").getOrElse(JObj.empty))

  override def getEducation(ld: JObj): String = {
    val edu = ld("educationRequirements")
    if (!truthy(edu)) "不拘" else mapEducationText(Some(pyStr(edu)))
  }

  /** adapter_yourator.py:72-84 — MySQL year clamp. */
  override def getValidThrough(ld: JObj): Option[String] = {
    Parsers.parseIsoDate(ld("validThrough")).map { v =>
      try {
        val year = v.split("-", -1)(0).toInt
        if (year > 9999) "9999-12-31" else v
      } catch { case _: Exception => v }
    }
  }

  override def getExperience(ld: JObj): Option[Int] =
    Parsers.parseExperience(ld("experienceRequirements"))

  /** adapter_yourator.py:95-122 */
  override def getCompanyName(ld: JObj): Option[String] = {
    var name: JV = safeGet(ld, "hiringOrganization", "name")
    if (!truthy(name)) name = ld("name")
    if (truthy(name)) return Some(pyStr(name))
    val title = if (ld.has("title") && ld("title") != JNull) pyStr(ld("title")) else ""
    if (title.contains(" | ")) {
      val parts = title.split(java.util.regex.Pattern.quote(" | "), -1)
      if (parts.length > 1) return Some(Py.strip(parts.last))
    }
    val htmlTitle =
      if (ld.has("_injected_html_title") && ld("_injected_html_title") != JNull)
        pyStr(ld("_injected_html_title"))
      else ""
    if (htmlTitle.nonEmpty) {
      var p1 = Py.strip(htmlTitle.split("｜", -1)(0).split("\\|", -1)(0))
      if (p1.contains("－")) p1 = Py.strip(p1.split("－", -1)(0))
      if (p1.contains("-")) p1 = Py.strip(p1.split("-", -1)(0))
      if (p1.nonEmpty && !p1.contains("Yourator")) return Some(p1)
    }
    None
  }

  private val ReCompanyUrl: Regex = "(?U)(https?://(?:www\\.)?yourator\\.co/companies/[^/]+)".r

  /** adapter_yourator.py:124-140 */
  override def getCompanyUrl(ld: JObj): Option[String] = {
    val jobUrl = {
      val u = ld("_url")
      if (truthy(u)) u else ld("_source_url")
    }
    if (truthy(jobUrl)) {
      ReCompanyUrl.findFirstMatchIn(pyStr(jobUrl)).foreach(m => return Some(m.group(1)))
    }
    val u1 = safeGet(ld, "hiringOrganization", "url")
    if (truthy(u1)) return Some(pyStr(u1))
    val u2 = safeGet(ld, "hiringOrganization", "sameAs")
    if (truthy(u2)) return Some(pyStr(u2))
    if (ld("@type") == JStr("Organization")) {
      val u = ld("url")
      if (truthy(u)) return Some(pyStr(u))
      val s = ld("sameAs")
      if (truthy(s)) return Some(pyStr(s))
    }
    None
  }

  /** adapter_yourator.py:146-154 */
  private def extractLocationBadgeCity(root: HtmlText.Elem): Option[String] = {
    root.findByClass("basic-info__icon--location").flatMap { badge =>
      badge.find("a").flatMap { a =>
        val text = Py.strip(a.getText(strip = true).replace("台灣", "").replace("臺灣", ""))
        extractCityFromText(text)
      }
    }
  }

  private val ReSplitAddr = "[。、,;，；/]".r
  private val ReMapsHref = "google\\.com/maps".r

  /** adapter_yourator.py:156-199 — HTML-driven address assembly. */
  override def getAddress(ld: JObj, html: Option[String]): Option[String] = {
    html match {
      case None => None
      case Some(h) =>
        val root = HtmlText.parseCached(h)
        val cityBadge = extractLocationBadgeCity(root)
        val addresses = scala.collection.mutable.LinkedHashSet.empty[String]
        for (a <- root.findAllByTagAndHref("a", ReMapsHref)) {
          val text = a.getText(strip = true)
          if (text.nonEmpty && text.length >= 5) {
            for (p <- ReSplitAddr.split(text)) {
              var cleanP = standardizeTaiwanAddress(Some(p)).getOrElse("")
              if (cleanP.nonEmpty) {
                if (cityBadge.isDefined && !List("市", "縣").exists(cleanP.contains))
                  cleanP = cityBadge.get + cleanP
                addresses += cleanP
              }
            }
          }
        }
        if (addresses.isEmpty) {
          for (cls <- List("basic-info__address", "simple-info__text")) {
            root.findByClass(cls).foreach { el =>
              val textEl = el.getText(strip = true)
              var cleanText = standardizeTaiwanAddress(Some(textEl)).getOrElse("")
              if (cityBadge.isDefined && !List("市", "縣").exists(cleanText.contains))
                cleanText = cityBadge.get + cleanText
              addresses += cleanText
            }
          }
        }
        if (addresses.nonEmpty) Some(addresses.mkString(" / ")) else None
    }
  }

  override def getCompanyWebsite(ld: JObj): Option[String] =
    filterWebsite(safeGet(ld, "hiringOrganization", "sameAs"))

  private val ReCompaniesId: Regex = "(?U)companies/([^/?#]+)".r

  /** adapter_yourator.py:206-219 */
  override def getCompanySourceId(ld: JObj): Option[String] = {
    var rawUrl: JV = ld("_source_url")
    if (!truthy(rawUrl)) rawUrl = ld("_url")
    if (!truthy(rawUrl)) rawUrl = getCompanyUrl(ld).map(JStr).getOrElse(JNull)
    if (!truthy(rawUrl)) rawUrl = ld("url")
    if (!truthy(rawUrl)) return None
    ReCompaniesId.findFirstMatchIn(pyStr(rawUrl)) match {
      case Some(m) =>
        val sid = m.group(1)
        if (sid.nonEmpty && sid != "jobs") Some(sid) else None
      case None => None
    }
  }

  /** adapter_yourator.py:221-234 */
  override def getCompanyAddress(ld: JObj): Option[String] = {
    val addrNode: JV = {
      val a = safeGet(ld, "hiringOrganization", "address")
      if (truthy(a)) a else ld("address")
    }
    if (!truthy(addrNode)) return None
    addrNode match {
      case JStr(s) => standardizeTaiwanAddress(Some(s))
      case o: JObj =>
        def g(k: String): Option[String] = {
          val v = o(k)
          if (v == JNull) None else Some(pyStr(v))
        }
        val region = standardizeTaiwanAddress(g("addressRegion"))
        val locality = standardizeTaiwanAddress(g("addressLocality"))
        val street = standardizeTaiwanAddress(g("streetAddress"))
        val district = dedupeAddress(List(region.getOrElse(""), locality.getOrElse("")))
        Some(dedupeAddress(List(district, street.getOrElse(""))))
      case other => Some(pyStr(other))
    }
  }

  override def getWorkHours(ld: JObj): Option[String] = ld("workHours") match {
    case JArr(items) => if (items.nonEmpty) Some(items.map(pyStr).mkString(", ")) else None
    case JNull => None
    case other => Some(pyStr(other))
  }

  override def getSkills(ld: JObj): Option[String] = ld("skills") match {
    case JArr(items) => if (items.nonEmpty) Some(items.map(pyStr).mkString(", ")) else None
    case JNull => None
    case other => Some(pyStr(other))
  }

  /** adapter_yourator.py:251-257 — coordinates forced to None (OSM path). */
  override def getLatitude(ld: JObj, html: Option[String]): Option[Double] = None
  override def getLongitude(ld: JObj, html: Option[String]): Option[Double] = None

  override def getCapital(ld: JObj): Option[String] =
    validateNumericNoise(ld("capital"), "capital")

  /** adapter_yourator.py:263-271 */
  override def getEmployeeCount(ld: JObj): Option[String] = {
    val emp = ld("numberOfEmployees")
    val v: JV = emp match {
      case o: JObj =>
        val unit = {
          val u = o("unitText")
          if (o.has("unitText") && u != JNull) pyStr(u) else ""
        }
        JStr(pyStr(o("value")) + unit)
      case JNull => JNull
      case other => if (truthy(other)) JStr(pyStr(other)) else JNull
    }
    validateNumericNoise(v, "employees")
  }

  /** adapter_yourator.py:273-300 — CSS-class extraction first. */
  override def extractCompanyFieldFromHtml(html: String, fieldType: String): Option[String] = {
    val root = HtmlText.parseCached(html)
    if (fieldType == "capital") {
      root.findByClass("basic-info__icon--capital").foreach(el =>
        return Some(el.getText(strip = true)))
    }
    if (fieldType == "employees") {
      root.findByClass("basic-info__icon--scale").foreach(el =>
        return Some(el.getText(strip = true)))
    }
    if (fieldType == "address") {
      root.findAllByTagAndHref("a", ReMapsHref).headOption.foreach { mapA =>
        val t = mapA.getText(strip = true)
        if (t.nonEmpty) return Some(t)
      }
      root.findByClass("basic-info__address").foreach { el =>
        el.find("a").foreach { detailA =>
          val t = detailA.getText(strip = true)
          if (t.nonEmpty) return Some(t)
        }
        return Some(el.getText(strip = true))
      }
    }
    super.extractCompanyFieldFromHtml(html, fieldType)
  }
}
