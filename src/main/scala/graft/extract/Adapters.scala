package graft.extract

import graft.extract.Json._
import graft.extract.JsonLd.safeGet
import graft.extract.TextClean._
import scala.util.matching.Regex

/** Extracted-row models (mirror core/infra/schemas.py JobPydantic /
  * CompanyPydantic / JobLocationPydantic).
  */
final case class JobRow(
    platform: String,
    url: String,
    sourceId: Option[String],
    companySourceId: Option[String],
    title: Option[String],
    description: Option[String],
    industry: Option[String],
    jobType: Option[String],
    workHours: Option[String],
    salaryCurrency: Option[String],
    salaryType: Option[String],
    salaryText: Option[String],
    salaryMin: Option[Long],
    salaryMax: Option[Long],
    addressCountry: Option[String],
    address: Option[String],
    region: Option[String],
    district: Option[String],
    experienceMinYears: Option[Int],
    educationText: Option[String],
    skills: Option[String],
    postedAt: Option[java.time.LocalDate],
    validThrough: Option[java.time.LocalDate])

final case class CompanyRow(
    platform: String,
    sourceId: String,
    name: String,
    companyUrl: Option[String],
    companyWeb: Option[String],
    address: Option[String],
    capital: Option[String],
    employeeCount: Option[String],
    description: Option[String],
    dataSourceLayer: String)

final case class LocationRow(
    platform: String,
    jobSourceId: String,
    latitude: Double,
    longitude: Double,
    formattedAddress: Option[String],
    provider: String)

/** Base JSON-LD adapter — port of core/adapters/jsonld_adapter.py.
  * Platform subclasses override the same hooks the Python classes do.
  */
abstract class Adapter {

  def platform: String

  // ==== regex banks (jsonld_adapter.py:31-89). `raw` flags mirror the
  // reference's `"<" in pattern.pattern and ">" in pattern.pattern` rule that
  // selects raw html vs text-stripped content as the search target.
  protected case class BankPattern(re: Regex, raw: Boolean, hasGroup: Boolean = true)

  protected val ReCapital: List[BankPattern] = List(
    BankPattern("(?isU)資本額\\s*(?:[:：\\s]|<[^>]+>)*\\s*([^<|、{}\\[\"']{2,50})".r, raw = true),
    BankPattern("(?isU)capital\\s*(?:[:：\\s]|<[^>]+>)*\\s*([^<|、{}\\[\"']{2,50})".r, raw = true),
    BankPattern("(?iU)\"capital\"\\s*[:：]\\s*\"([^\"]+)\"".r, raw = false),
    BankPattern("(?isU)basic-info__icon--capital[^>]*>([^<]+)".r, raw = true),
    BankPattern("(?iU)((?:NT\\$|TWD|USD|HKD)?\\s*[\\d.,]{1,10}\\s*[億萬]{1,2}(?:[\\d.,]+\\s*[萬元]{1,2})?)(?!\\d)".r, raw = false))

  protected val ReEmployees: List[BankPattern] = List(
    BankPattern("(?isU)員工人數\\s*(?:[:：\\s]|<[^>]+>)*\\s*([^<|、]{2,50})".r, raw = true),
    BankPattern("(?isU)員工數\\s*(?:[:：\\s]|<[^>]+>)*\\s*([^<|、]{2,50})".r, raw = true),
    BankPattern("(?isU)公司規模\\s*(?:[:：\\s]|<[^|、]{2,50})".r, raw = false, hasGroup = false),
    BankPattern("(?iU)\"emp\"\\s*[:：]\\s*\"([^\"]+)\"".r, raw = false),
    BankPattern("(?isU)basic-info__icon--scale[^>]*>([^<]+)".r, raw = true),
    BankPattern("(?isU)(?<![a-zA-Z\\d])(\\d{1,7}(?:[~,\\-、〜]\\d{1,7})?\\s*人)(?![a-zA-Z\\d])".r, raw = false))

  protected val ReWeb: List[BankPattern] = List(
    BankPattern(("(?isU)(?:公司網址|官方網站|官網|企業網址|Official Website|Company Website|Website)" +
      "\\s*(?:[:：\\s]|<[^>]+>)*\\s*<a[^>]+href=[\"'](https?://[^\"']+)[\"']").r, raw = true),
    BankPattern(("(?isU)href\\s*=\\s*[\"'](https?://(?!www\\.104|static\\.104|www\\.1111|www\\.yes123|" +
      "www\\.cake|www\\.yourator|facebook|twitter|instagram|linkedin|youtube|line\\.me|google|apple|" +
      "github|onelink|fonts|ajax|cdn|static|assets|nat\\.gov|moea\\.gov|maps\\.google)[^\"']+)[\"']").r,
      raw = false))

  protected val ReAddress: List[BankPattern] = List(
    BankPattern("(?U)([\\u4e00-\\u9fff]{2}[縣市][\\u4e00-\\u9fff]{1,5}?[區市鎮鄉][^<{}\"']{5,})".r, raw = false),
    BankPattern("(?isU)(?:公司地址|公司位置|企業地址|通訊地址|地址|Address)\\s*(?:[:：\\s]|<[^>]+>)*\\s*([^<|{}\\[\"']{5,})".r, raw = true),
    BankPattern("(?isU)basic-info__address[^>]*>(?:<[^>]+>)*([^<{}\\[\"']{5,})".r, raw = true))

  protected val ReDescription: List[BankPattern] = List(
    BankPattern(("(?isU)(?:公司簡介|公司介紹|企業簡介|經營理念|主要商品|行業說明|福利制度|About Us)" +
      "\\s*(?:[:：\\s]|<[^>]+>)*\\s*<(?:div|p|section|article)[^>]*>(.*?)</(?:div|p|section|article)>").r, raw = true),
    BankPattern(("(?isU)(?:公司簡介|公司介紹|企業簡介|經營理念|主要商品|行業說明|福利制度|About Us)" +
      "\\s*(?:[:：\\s]|<[^>]+>)*\\s*([^<]{10,})").r, raw = true))

  protected val ReFieldLabels: Regex =
    ("(?iU)(?:行業類別|企業電話|企業地址|相關連結|成立時間|經營項目|資本額|員工人數|公司規模|聯絡人|傳真|" +
      "公司網址|公司位置|產業類別|產業描述|負責人|統一編號|福利制度|企業職缺|地址|電話|傳真)").r

  protected val ReGeoUrl: List[Regex] = List(
    "(?iU)@(-?\\d+\\.\\d+),(-?\\d+\\.\\d+)".r,
    "(?iU)ll=(-?\\d+\\.\\d+),(-?\\d+\\.\\d+)".r,
    "(?iU)q=(-?\\d+\\.\\d+),\\s*(-?\\d+\\.\\d+)".r,
    "(?iU)([-?\\d.]+)\"N\\s+([-?\\d.]+)\"E".r)

  // ==== mapping entry points (jsonld_adapter.py:102-186) ====

  def mapToJob(ld: JObj, url: String, html: Option[String]): Option[JobRow] = {
    val titleJv = {
      val t = ld("title")
      if (truthy(t)) t else ld("name")
    }
    val title = if (truthy(titleJv)) Some(pyStr(titleJv)) else None
    val sourceId = getSourceId(ld, Some(url))
    if (title.isEmpty || sourceId.isEmpty) return None

    val salary = getSalary(ld)
    val addr = getAddress(ld, html)
    Some(JobRow(
      platform = platform,
      url = getUrl(ld, Some(url)),
      sourceId = sourceId,
      companySourceId = getCompanySourceId(ld),
      title = title,
      description = getDescription(ld),
      industry = getIndustry(ld),
      jobType = Some(getJobType(ld)),
      workHours = getWorkHours(ld),
      salaryCurrency = getSalaryCurrency(ld),
      salaryType = Some(salary.salaryType),
      salaryText = Some(salary.text),
      salaryMin = salary.min,
      salaryMax = salary.max,
      addressCountry = getAddressCountry(ld),
      address = addr,
      region = getRegion(ld, addr),
      district = getDistrict(ld, addr),
      experienceMinYears = getExperience(ld),
      educationText = Some(getEducation(ld)),
      skills = getSkills(ld),
      postedAt = Parsers.parseDate(getPostedDate(ld).map(JStr).getOrElse(JNull)),
      validThrough = Parsers.parseDate(getValidThrough(ld).map(JStr).getOrElse(JNull))))
  }

  def mapToCompany(ld: JObj, html: Option[String]): Option[CompanyRow] = {
    val name = getCompanyName(ld)
    val sourceId = getCompanySourceId(ld)
    if (name.isEmpty || name.exists(_.isEmpty) || sourceId.isEmpty || sourceId.exists(_.isEmpty))
      return None

    val url = getCompanyUrl(ld)
    var web = getCompanyWebsite(ld)
    var addr = getCompanyAddress(ld)
    var capital: Option[String] = getCapital(ld)
    var employees: Option[String] = getEmployeeCount(ld)
    var desc: Option[String] =
      if (ld("@type") == JStr("Organization")) ld.get("description") match {
        case None | Some(JNull) => None
        case Some(JStr(s)) => Some(s) // "" preserved, like Python
        case Some(other) => Some(pyStr(other))
      } else None

    html.foreach { h =>
      if (web.isEmpty) web = extractCompanyFieldFromHtml(h, "web")
      var newAddr = extractCompanyFieldFromHtml(h, "address")
      if (newAddr.isDefined)
        newAddr = standardizeTaiwanAddress(newAddr)
      newAddr.filter(_.nonEmpty).foreach { na =>
        if (addr.forall(a => a.isEmpty || na.length > a.length)) addr = Some(na)
      }
      if (capital.forall(_.isEmpty) || isMinimalist(capital.map(JStr).getOrElse(JNull))) {
        val newCap = extractCompanyFieldFromHtml(h, "capital")
          .flatMap(c => validateNumericNoise(JStr(c), "capital"))
        newCap.filter(_.nonEmpty).foreach { nc =>
          if (capital.forall(c => c.isEmpty || nc.length >= c.length)) capital = Some(nc)
        }
      }
      if (employees.forall(_.isEmpty) || isMinimalist(employees.map(JStr).getOrElse(JNull))) {
        val newEmp = extractCompanyFieldFromHtml(h, "employees")
          .flatMap(e => validateNumericNoise(JStr(e), "employees"))
        newEmp.filter(_.nonEmpty).foreach { ne =>
          if (employees.forall(e => e.isEmpty || ne.length >= e.length)) employees = Some(ne)
        }
      }
      if (desc.forall(_.isEmpty)) {
        extractCompanyFieldFromHtml(h, "description").foreach { cand =>
          if (isMeaningfulText(cand)) desc = Some(cand)
        }
      }
    }

    capital = capital.flatMap(c => validateNumericNoise(JStr(c), "capital"))
    employees = employees.flatMap(e => validateNumericNoise(JStr(e), "employees"))

    Some(CompanyRow(
      platform = platform,
      sourceId = sourceId.get,
      name = name.get,
      companyUrl = url,
      companyWeb = web.map(JStr).flatMap(filterWebsite),
      address = addr,
      capital = standardizeNumeric(capital),
      employeeCount = standardizeNumeric(employees),
      description = desc,
      dataSourceLayer = ld.get("data_source_layer").map(pyStr).getOrElse("L1")))
  }

  /** jsonld_adapter.py:309-368 `_extract_company_field_from_html` */
  def extractCompanyFieldFromHtml(htmlContent: String, fieldType: String): Option[String] = {
    if (htmlContent == null || htmlContent.isEmpty) return None
    lazy val cleanHtml = Entities.unescape(HtmlText.getTextNoScript(htmlContent))
    val bank = fieldType match {
      case "capital" => ReCapital
      case "employees" => ReEmployees
      case "web" => ReWeb
      case "address" => ReAddress
      case "description" => ReDescription
      case _ => Nil
    }
    val noiseKeywords = List("暫不公開", "未公開", "保密", "面議", "暫不提供", "n/a", "null", "none")
    val bleedLabels = List("統一編號", "員工人數", "員工數", "公司地址", "企業地址")
    val platformNoise = List("1111", "yes123", "人力銀行")

    for ((bp, patternIdx) <- bank.zipWithIndex) {
      val target = if (bp.raw) htmlContent else cleanHtml
      val it = bp.re.findAllMatchIn(target)
      while (it.hasNext) {
        val m = it.next()
        var continue = false
        var ret: Option[String] = None
        var v = Py.strip(if (bp.hasGroup) m.group(1) else m.matched)

        if (fieldType == "description" && v.contains("<"))
          v = HtmlText.getText(v)
        v = Py.strip(collapseWs(Entities.unescape(v.replace("\u00a0", " "))))
        if (v.isEmpty) continue = true

        if (!continue) {
          bleedLabels.foreach { nk =>
            if (v.contains(nk)) v = Py.strip(v.split(java.util.regex.Pattern.quote(nk), 2)(0))
          }
          val vl = v.toLowerCase
          if (noiseKeywords.exists(nk => vl == nk || vl.startsWith(nk))) {
            if (patternIdx < bank.length - 1) return None
            continue = true
          }
        }
        if (!continue) {
          ReFieldLabels.findFirstMatchIn(v).foreach(lm => v = Py.strip(v.substring(0, lm.start)))
          if (v.isEmpty) continue = true
        }
        if (!continue) {
          val cleanVal = v.replace(" ", "").replace("人", "").replace("元", "")
          if (platformNoise.contains(cleanVal)) continue = true
          if (!continue && fieldType == "address" &&
              List("flex", "grid", "rgba").exists(ns => v.toLowerCase.contains(ns))) continue = true
          if (!continue && fieldType == "web") {
            filterWebsite(JStr(v)) match {
              case Some(fw) => v = fw
              case None => continue = true
            }
          }
          if (!continue && (fieldType == "capital" || fieldType == "employees")) {
            val hasDigit = v.exists(Character.isDigit)
            val hasKw = List("萬", "億", "人", "員", "名", "位", "~", "-", "〜").exists(v.contains)
            if (!(hasDigit || hasKw)) continue = true
            else if (List("{", "}", ":", ";", "=", "@").exists(v.contains)) continue = true
            else if (v.length > 40) continue = true
          }
          if (!continue) ret = Some(v)
        }
        if (ret.isDefined) return ret
      }
    }
    None
  }

  // ==== getters (jsonld_adapter.py:398-517) ====

  def getSalary(ld: JObj): Parsers.SalaryResult = {
    val base = safeGet(ld, "baseSalary")
    if (!truthy(base)) return Parsers.parseSalary(JStr("面議"))
    val (minV, maxV) = base match {
      case o: JObj =>
        o.get("value") match {
          case Some(v: JObj) =>
            val mn = v("minValue")
            val mxRaw = v("maxValue")
            val mx = if (truthy(mxRaw)) mxRaw else v("value")
            (mn, mx)
          case Some(v) => (v, v)
          case None => (JNull, JNull)
        }
      case _ => (JNull, JNull)
    }
    def part(x: JV): String = if (truthy(x)) pyStr(x) else ""
    Parsers.parseSalary(JStr(s"${part(minV)}-${part(maxV)}"))
  }

  def getEducation(ld: JObj): String = {
    var edu = ld("educationRequirements")
    edu match { case JArr(a) if a.nonEmpty => edu = a.head; case _ => }
    edu match {
      case o: JObj =>
        val c = o("credentialCategory")
        edu = if (truthy(c)) c else o("name")
      case _ =>
    }
    if (truthy(edu)) mapEducationText(Some(pyStr(edu))) else "不拘"
  }

  def getExperience(ld: JObj): Option[Int] = {
    var ext = ld("experienceRequirements")
    ext match { case JArr(a) if a.nonEmpty => ext = a.head; case _ => }
    ext match {
      case o: JObj =>
        val n = o("name")
        ext = if (truthy(n)) n else o("description")
      case _ =>
    }
    if (truthy(ext)) Parsers.parseExperience(JStr(pyStr(ext))) else None
  }

  def getJobType(ld: JObj): String = mapJobType(ld("employmentType"))

  def getPostedDate(ld: JObj): Option[String] = Parsers.parseIsoDate(ld("datePosted"))

  def getValidThrough(ld: JObj): Option[String] = Parsers.parseIsoDate(ld("validThrough"))

  /** Python `return ld.get("industry")` — preserves "" (only null/absent map
    * to None).
    */
  def getIndustry(ld: JObj): Option[String] = ld.get("industry") match {
    case None | Some(JNull) => None
    case Some(JStr(s)) => Some(s)
    case Some(other) => Some(pyStr(other))
  }

  def getWorkHours(ld: JObj): Option[String]
  def getSkills(ld: JObj): Option[String]

  /** jsonld_adapter.py:437-445 base `get_description` */
  def getDescription(ld: JObj): Option[String] = {
    val desc = ld("description")
    if (!truthy(desc)) return None
    val text = Entities.unescape(pyStr(desc))
    Some(HtmlText.getText(text))
  }

  def getSalaryCurrency(ld: JObj): Option[String] = {
    val c = safeGet(ld, "baseSalary", "currency")
    if (truthy(c)) Some(pyStr(c)) else Some("TWD")
  }

  protected def geoFromLd(ld: JObj, axis: String): JV = {
    val v1 = safeGet(ld, "jobLocation", "geo", axis)
    if (truthy(v1)) return v1
    // the `jobLocation, 0, geo` int-key path is a no-op in the reference
    val v3 = safeGet(ld, "geo", axis)
    if (truthy(v3)) v3 else JNull
  }

  protected def jvToDouble(v: JV): Option[Double] = v match {
    case JInt(i) => Some(i.toDouble)
    case JFloat(f) => Some(f)
    case JStr(s) => Py.toFloat(s)
    case _ => None
  }

  def getLatitude(ld: JObj, html: Option[String]): Option[Double] = {
    val v = geoFromLd(ld, "latitude")
    if (truthy(v)) jvToDouble(v).foreach(d => return Some(d))
    html.foreach { h =>
      ReGeoUrl.foreach { re =>
        re.findFirstMatchIn(h).foreach { m =>
          Py.toFloat(m.group(1)).foreach(d => return Some(d))
        }
      }
    }
    None
  }

  def getLongitude(ld: JObj, html: Option[String]): Option[Double] = {
    val v = geoFromLd(ld, "longitude")
    if (truthy(v)) jvToDouble(v).foreach(d => return Some(d))
    html.foreach { h =>
      ReGeoUrl.foreach { re =>
        re.findFirstMatchIn(h).foreach { m =>
          Py.toFloat(m.group(2)).foreach(d => return Some(d))
        }
      }
    }
    None
  }

  def getDistrict(ld: JObj, addressHint: Option[String]): Option[String] =
    parseTaiwanLocation(ld, addressHint.filter(_.nonEmpty))._2

  def getRegion(ld: JObj, addressHint: Option[String]): Option[String] =
    parseTaiwanLocation(ld, addressHint.filter(_.nonEmpty))._1

  /** jsonld_adapter.py:484-496 */
  def getAddressCountry(ld: JObj): Option[String] = {
    val node = safeGet(ld, "jobLocation", "address")
    var text = ""
    node match {
      case o: JObj =>
        def part(k: String): String = if (o.has(k)) pyStr(o(k)) else ""
        text = part("addressRegion") + part("addressLocality") + part("streetAddress")
      case JStr(s) => text = s
      case _ =>
    }
    if (text.nonEmpty) {
      val m = List("越南" -> "VN", "印尼" -> "ID", "菲律賓" -> "PH", "泰國" -> "TH",
        "馬來西亞" -> "MY", "新加坡" -> "SG", "日本" -> "JP", "韓國" -> "KR",
        "中國" -> "CN", "美國" -> "US")
      m.collectFirst { case (kw, code) if text.contains(kw) => code } match {
        case Some(code) => return Some(code)
        case None =>
      }
    }
    val c = safeGet(ld, "jobLocation", "address", "addressCountry")
    if (!truthy(c)) return Some("TW")
    c match {
      case JStr(s) if List("TW", "TWN", "TAIWAN", "ROC", "台灣", "臺灣").contains(s.toUpperCase) =>
        Some("TW")
      case other => Some(pyStr(other))
    }
  }

  def getSourceId(ld: JObj, url: Option[String]): Option[String]
  def getUrl(ld: JObj, fallbackUrl: Option[String]): String
  def getAddress(ld: JObj, html: Option[String]): Option[String]

  def getCompanyName(ld: JObj): Option[String] = {
    val n = safeGet(ld, "hiringOrganization", "name")
    if (truthy(n)) return Some(pyStr(n))
    val a = safeGet(ld, "author", "name")
    if (truthy(a)) Some(pyStr(a)) else None
  }

  def getCompanyUrl(ld: JObj): Option[String] = {
    val u = safeGet(ld, "hiringOrganization", "url")
    if (truthy(u)) return Some(pyStr(u))
    val s = safeGet(ld, "hiringOrganization", "sameAs")
    if (truthy(s)) Some(pyStr(s)) else None
  }

  def getCompanyWebsite(ld: JObj): Option[String] = {
    val u = safeGet(ld, "hiringOrganization", "url")
    if (truthy(u)) Some(pyStr(u)) else None
  }

  def getCompanySourceId(ld: JObj): Option[String] = None

  def getCompanyAddress(ld: JObj): Option[String] = {
    val addr = safeGet(ld, "hiringOrganization", "address")
    addr match {
      case o: JObj =>
        def part(k: String): String = if (o.has(k)) pyStr(o(k)) else ""
        Some(part("addressRegion") + part("addressLocality") + part("streetAddress"))
      case JNull => None
      case other => if (truthy(other)) Some(pyStr(other)) else None
    }
  }

  def getCapital(ld: JObj): Option[String] = None
  def getEmployeeCount(ld: JObj): Option[String] = None
}
