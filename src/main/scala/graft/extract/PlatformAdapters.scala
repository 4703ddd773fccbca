package graft.extract

import graft.extract.Json._
import graft.extract.JsonLd.safeGet
import graft.extract.TextClean._
import scala.util.matching.Regex

/** Platform adapters — ports of core/adapters/adapter_{104,1111,cakeresume,
  * yes123,yourator}.py and adapter_factory.py.
  */
object Platforms {
  val P104 = "platform_104"
  val P1111 = "platform_1111"
  val CAKE = "platform_cakeresume"
  val YES123 = "platform_yes123"
  val YOURATOR = "platform_yourator"
  val all: List[String] = List(P104, P1111, CAKE, YES123, YOURATOR)
}

object AdapterFactory {
  val a104 = new Adapter104
  val a1111 = new Adapter1111
  val aCake = new AdapterCakeResume
  val aYes = new AdapterYes123
  val aYour = new AdapterYourator

  def get(platform: String): Adapter = platform match {
    case Platforms.P104 => a104
    case Platforms.P1111 => a1111
    case Platforms.CAKE => aCake
    case Platforms.YES123 => aYes
    case Platforms.YOURATOR => aYour
    case other => throw new IllegalArgumentException(s"unknown platform $other")
  }
}

/** adapter_104.py */
class Adapter104 extends Adapter {
  override def platform: String = Platforms.P104

  /** adapter_104.py:24-44 — raw-JSON leak guard then clean. */
  override def getDescription(ld: JObj): Option[String] = {
    val desc = ld("description")
    if (!truthy(desc)) return None
    val text = Entities.unescape(pyStr(desc))
    if (text.contains("{") && text.contains("}") && text.contains(":") && text.contains("\""))
      return None
    Some(HtmlText.getText(text))
  }

  /** adapter_104.py:46-54 — query-string strip. */
  override def getUrl(ld: JObj, fallbackUrl: Option[String]): String = {
    val u0 = ld("url")
    val url = if (truthy(u0)) pyStr(u0) else fallbackUrl.getOrElse("")
    if (url.contains("?")) url.split("\\?", 2)(0) else url
  }

  private val ReJobId: Regex = "(?U)job/([^/?#]+)".r

  override def getSourceId(ld: JObj, url: Option[String]): Option[String] =
    ReJobId.findFirstMatchIn(getUrl(ld, url)).map(_.group(1))

  /** adapter_104.py:64-73 — full SalaryParser over the baseSalary node. */
  override def getSalary(ld: JObj): Parsers.SalaryResult =
    Parsers.parseSalary(ld.get("baseSalary").getOrElse(JObj.empty))

  /** adapter_104.py:75-92 — list variants joined with '/'. */
  override def getEducation(ld: JObj): String = {
    val edu = ld("educationRequirements")
    if (!truthy(edu)) return "不拘"
    val text = edu match {
      case JArr(items) =>
        items.map {
          case o: JObj =>
            val c = o("credentialCategory")
            val n = if (truthy(c)) c else o("name")
            if (truthy(n)) pyStr(n) else pyRepr(o)
          case other => pyStr(other)
        }.mkString("/")
      case o: JObj =>
        val c = o("credentialCategory")
        val n = if (truthy(c)) c else o("name")
        if (truthy(n)) pyStr(n) else pyRepr(o)
      case other => pyStr(other)
    }
    mapEducationText(Some(text))
  }

  override def getExperience(ld: JObj): Option[Int] =
    Parsers.parseExperience(ld("experienceRequirements"))

  /** adapter_104.py:102-105 — split at 'T' only (no regex normalize). */
  override def getPostedDate(ld: JObj): Option[String] = {
    val d = ld("datePosted")
    if (truthy(d)) Some(pyStr(d).split("T", 2)(0)) else None
  }

  /** adapter_104.py:110-114 */
  override def getAddress(ld: JObj, html: Option[String]): Option[String] = {
    val district = getDistrict(ld, None)
    val street = cleanTaiwan(jvStrOpt(safeGet(ld, "jobLocation", "address", "streetAddress")))
    cleanIdNoise(Some(dedupeAddress(List(district.getOrElse(""), street))))
  }

  private def jvStrOpt(v: JV): Option[String] =
    if (truthy(v)) Some(pyStr(v)) else None

  /** adapter_104.py:117-161 */
  override def getCompanyName(ld: JObj): Option[String] = {
    var name: Option[String] = {
      val n = safeGet(ld, "hiringOrganization", "name")
      if (truthy(n)) Some(pyStr(n))
      else {
        val l = safeGet(ld, "hiringOrganization", "legalName")
        if (truthy(l)) Some(pyStr(l)) else None
      }
    }
    if (name.isEmpty && ld("@type") == JStr("Organization")) {
      val n = ld("name")
      name = if (truthy(n)) Some(pyStr(n)) else {
        val l = ld("legalName")
        if (truthy(l)) Some(pyStr(l)) else None
      }
    }
    if (name.isEmpty) {
      val title = if (ld.has("title") && ld("title") != JNull) pyStr(ld("title")) else ""
      if (title.contains("｜")) {
        val parts = title.split("｜")
        if (parts.length > 1) name = Some(Py.strip(parts(1)))
      }
    }
    if (name.isEmpty) {
      val htmlTitle =
        if (ld.has("_injected_html_title") && ld("_injected_html_title") != JNull)
          pyStr(ld("_injected_html_title"))
        else ""
      if (htmlTitle.nonEmpty) {
        val cleanTitle = htmlTitle.replace("｜", " - ").replace("|", " - ").replace("－", " - ")
        val parts = cleanTitle.split(" - ", -1).map(Py.strip).filter(_.nonEmpty).toList
        if (parts.length >= 2) {
          var n = parts(1)
          if (n.contains("104") && parts.length >= 3) n = parts(1)
          val statusWords = List("徵才中", "徵人中", "工作", "職缺", "Company")
          if (n.contains("104") || statusWords.contains(n)) {
            parts.find(p => !p.contains("104") && !statusWords.contains(p)).foreach(p => n = p)
          }
          name = Some(n)
        }
      }
    }
    name.flatMap { n0 =>
      val n = Py.strip(n0.replace("104人力銀行", "").replace("104", ""), " -|－｜")
      if (n.isEmpty) None else Some(n)
    }
  }

  /** adapter_104.py:170-185 */
  override def getCompanyUrl(ld: JObj): Option[String] = {
    val inj = {
      val u = ld("_url")
      if (truthy(u)) u else ld("url")
    }
    if (truthy(inj) && pyStr(inj).contains("company/")) return Some(pyStr(inj))
    val u1 = safeGet(ld, "hiringOrganization", "sameAs")
    if (truthy(u1)) return Some(pyStr(u1))
    val u2 = safeGet(ld, "hiringOrganization", "url")
    if (truthy(u2)) return Some(pyStr(u2))
    if (ld("@type") == JStr("Organization")) {
      val s = ld("sameAs")
      if (truthy(s)) return Some(pyStr(s))
      val u = ld("url")
      if (truthy(u)) return Some(pyStr(u))
    }
    None
  }

  /** adapter_104.py:187-200 */
  override def getCompanyWebsite(ld: JObj): Option[String] = {
    var url = ld("sameAs")
    if (!truthy(url) && ld("@type") == JStr("Organization")) url = ld("url")
    url match {
      case JArr(items) =>
        items.foreach { u =>
          filterWebsite(u).foreach(f => return Some(f))
        }
        None
      case other => filterWebsite(other)
    }
  }

  private val ReCompanyId: Regex = "(?U)company/([^/?#]+)".r

  /** adapter_104.py:202-208 */
  override def getCompanySourceId(ld: JObj): Option[String] =
    getCompanyUrl(ld).map { url =>
      ReCompanyId.findFirstMatchIn(url) match {
        case Some(m) => m.group(1)
        case None => Py.rstrip(url, "/").split("/", -1).last
      }
    }

  /** adapter_104.py:210-238 */
  override def getCompanyAddress(ld: JObj): Option[String] = {
    var addrNode = safeGet(ld, "hiringOrganization", "address")
    if (!truthy(addrNode) && ld("@type") == JStr("Organization"))
      addrNode = ld("address")
    if (!truthy(addrNode)) return None
    addrNode match {
      case JArr(items) if items.nonEmpty =>
        companyAddrOf(items.head)
      case other => companyAddrOf(other)
    }
  }

  private def companyAddrOf(node: JV): Option[String] = node match {
    case JStr(s) =>
      cleanIdNoise(standardizeTaiwanAddress(Some(s)))
    case o: JObj =>
      def g(k: String): Option[String] = {
        val v = o(k)
        if (truthy(v)) Some(pyStr(v)) else if (o.has(k) && v != JNull) Some(pyStr(v)) else None
      }
      val region = cleanIdNoise(standardizeTaiwanAddress(g("addressRegion")))
      var locality = cleanIdNoise(standardizeTaiwanAddress(g("addressLocality")))
      if (locality.exists(_.contains("Locality"))) locality = Some("")
      val street = cleanIdNoise(standardizeTaiwanAddress(g("streetAddress")))
      val district = dedupeAddress(List(region.getOrElse(""), locality.getOrElse("")))
      Some(dedupeAddress(List(district, street.getOrElse(""))))
    case other => cleanIdNoise(Some(pyStr(other)))
  }

  private val ReIndustryFromDesc: Regex = "(?U)經營理念\\s*[:：].*?(\\d+\\.\\s*)?([^\\s\\-]+)\\s*[\\-－]".r

  /** adapter_104.py:240-254 */
  override def getIndustry(ld: JObj): Option[String] = {
    val ind = ld("industry")
    if (truthy(ind)) return Some(pyStr(ind))
    getDescription(ld).flatMap { desc =>
      ReIndustryFromDesc.findFirstMatchIn(desc).map(_.group(2))
    }
  }

  /** adapter_104.py:256-268 */
  override def getWorkHours(ld: JObj): Option[String] = ld("workHours") match {
    case JArr(items) =>
      if (items.nonEmpty) Some(items.map(pyStr).mkString(", ")) else None
    case JNull => None
    case other => Some(pyStr(other))
  }

  override def getSkills(ld: JObj): Option[String] = ld("skills") match {
    case JArr(items) =>
      if (items.nonEmpty) Some(items.map(pyStr).mkString(", ")) else None
    case JNull => None
    case other => Some(pyStr(other))
  }

  override def getCapital(ld: JObj): Option[String] =
    validateNumericNoise(ld("capital"), "capital")

  override def getEmployeeCount(ld: JObj): Option[String] =
    validateNumericNoise(ld("numberOfEmployees"), "employees")
}

/** adapter_1111.py */
class Adapter1111 extends Adapter {
  override def platform: String = Platforms.P1111

  /** adapter_1111.py:22-47 — anti-hallucination over page text. */
  override def mapToCompany(ld: JObj, html: Option[String]): Option[CompanyRow] = {
    super.mapToCompany(ld, html).map { company =>
      html match {
        case Some(h) =>
          val text = HtmlText.getTextNoScript(h)
          val emp =
            if ("(?U)員工人數\\s*[:：]\\s*暫不公開".r.findFirstIn(text).isDefined ||
                "(?sU)員工人數.*?暫不公開".r.findFirstIn(text).isDefined) None
            else company.employeeCount
          val cap =
            if ("(?U)資本額\\s*[:：]\\s*暫不公開".r.findFirstIn(text).isDefined ||
                "(?sU)資本額.*?暫不公開".r.findFirstIn(text).isDefined) None
            else company.capital
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

  override def getUrl(ld: JObj, fallbackUrl: Option[String]): String = {
    val u = ld("url")
    if (truthy(u)) pyStr(u) else fallbackUrl.getOrElse("")
  }

  private val ReJobId: Regex = "(?U)job/(\\d+)".r

  override def getSourceId(ld: JObj, url: Option[String]): Option[String] =
    ReJobId.findFirstMatchIn(getUrl(ld, url)).map(_.group(1))

  override def getSalary(ld: JObj): Parsers.SalaryResult =
    Parsers.parseSalary(ld.get("baseSalary").getOrElse(JObj.empty))

  /** adapter_1111.py:90-92 — raw JV straight into _map_education_text. */
  override def getEducation(ld: JObj): String = {
    val edu = ld("educationRequirements")
    if (!truthy(edu)) "不拘" else mapEducationText(Some(pyStr(edu)))
  }

  override def getExperience(ld: JObj): Option[Int] =
    Parsers.parseExperience(ld("experienceRequirements"))

  override def getWorkHours(ld: JObj): Option[String] = ld("workHours") match {
    case JNull => None
    case JStr(s) => Some(s)
    case other if truthy(other) => Some(pyStr(other))
    case other => Some(pyStr(other)) // Python returns the raw value
  }

  /** adapter_1111.py:107-112 */
  override def getSkills(ld: JObj): Option[String] = ld("skills") match {
    case JArr(items) => Some(items.map(pyStr).mkString(","))
    case JNull => None
    case other => if (truthy(other)) Some(pyStr(other)) else None
  }

  /** adapter_1111.py:116-122 */
  override def getAddress(ld: JObj, html: Option[String]): Option[String] = {
    val district = getDistrict(ld, None)
    val street = standardizeTaiwanAddress(
      jvStrOpt(safeGet(ld, "jobLocation", "address", "streetAddress")))
    Some(dedupeAddress(List(district.getOrElse(""), street.getOrElse(""))))
  }

  private def jvStrOpt(v: JV): Option[String] =
    if (truthy(v)) Some(pyStr(v)) else None

  /** adapter_1111.py:124-138 */
  override def getCompanyName(ld: JObj): Option[String] = {
    val n = safeGet(ld, "hiringOrganization", "name")
    if (truthy(n)) return Some(pyStr(n))
    if (ld("@type") == JStr("Organization")) {
      val nm = ld("name")
      return if (truthy(nm)) Some(pyStr(nm)) else None
    }
    val title = {
      val t = ld("_injected_title")
      if (truthy(t)) t else ld("_injected_html_title")
    }
    if (truthy(title)) Some(Py.strip(pyStr(title).split("\\|", -1)(0)))
    else None
  }

  /** adapter_1111.py:140-165 */
  override def getCompanyUrl(ld: JObj): Option[String] = {
    val inj = {
      val u = ld("_url")
      if (truthy(u)) u else ld("_source_url")
    }
    if (truthy(inj) && pyStr(inj).contains("corp/")) return Some(pyStr(inj))
    if (ld("@type") == JStr("Organization")) {
      val u = ld("url")
      if (truthy(u) && pyStr(u).contains("1111.com.tw")) return Some(pyStr(u))
      ld("sameAs") match {
        case JArr(items) =>
          items.find(s => pyStr(s).contains("1111.com.tw")).foreach(s => return Some(pyStr(s)))
        case sa if truthy(sa) && pyStr(sa).contains("1111.com.tw") => return Some(pyStr(sa))
        case _ =>
      }
    }
    val u1 = safeGet(ld, "hiringOrganization", "sameAs")
    if (truthy(u1)) return Some(pyStr(u1))
    val u2 = safeGet(ld, "hiringOrganization", "url")
    if (truthy(u2)) return Some(pyStr(u2))
    None
  }

  /** adapter_1111.py:167-177 */
  override def getCompanyWebsite(ld: JObj): Option[String] = {
    if (ld("@type") == JStr("Organization")) {
      ld("sameAs") match {
        case JArr(items) =>
          items.foreach(s => filterWebsite(s).foreach(f => return Some(f)))
          None
        case other => filterWebsite(other)
      }
    } else None
  }

  private val ReCorpId: Regex = "(?U)corp/(\\d+)".r

  override def getCompanySourceId(ld: JObj): Option[String] =
    getCompanyUrl(ld).map { url =>
      ReCorpId.findFirstMatchIn(url) match {
        case Some(m) => m.group(1)
        case None => Py.rstrip(url, "/").split("/", -1).last
      }
    }

  override def getCapital(ld: JObj): Option[String] = {
    val v = ld("capital")
    if (isPrivacyProtected(v)) None else validateNumericNoise(v, "capital")
  }

  override def getEmployeeCount(ld: JObj): Option[String] = {
    val v = ld("numberOfEmployees")
    if (isPrivacyProtected(v)) None else validateNumericNoise(v, "employees")
  }

  /** adapter_1111.py:213-238 */
  override def getCompanyAddress(ld: JObj): Option[String] = {
    val addrNode: JV =
      if (ld("@type") == JStr("JobPosting")) safeGet(ld, "hiringOrganization", "address")
      else {
        val a = ld("address")
        if (truthy(a)) a else safeGet(ld, "jobLocation", "address")
      }
    if (!truthy(addrNode)) return None
    addrNode match {
      case JStr(s) => standardizeTaiwanAddress(Some(s))
      case o: JObj =>
        def g(k: String): Option[String] = {
          val v = o(k)
          if (v == JNull && !o.has(k)) None
          else if (v == JNull) None
          else Some(pyStr(v))
        }
        val region = standardizeTaiwanAddress(g("addressRegion"))
        var locality = standardizeTaiwanAddress(g("addressLocality"))
        val street = standardizeTaiwanAddress(g("streetAddress"))
        if (locality.exists(_.contains(","))) {
          val parts = locality.get.split(",", -1).toList
            .map(p => standardizeTaiwanAddress(Some(Py.strip(p))).getOrElse(""))
          locality = Some(parts.filter(_.nonEmpty).mkString(""))
        }
        val district = dedupeAddress(List(region.getOrElse(""), locality.getOrElse("")))
        Some(dedupeAddress(List(district, street.getOrElse(""))))
      case other => Some(pyStr(other))
    }
  }
}
