package graft.extract

import graft.extract.Json._

/** Ports of the base-adapter string cleaners in
  * core/adapters/jsonld_adapter.py (the X5-X9, X13-X16, X18 surface of
  * SURVEY.md §2.8).
  */
object TextClean {

  // jsonld_adapter.py:63-68,77-83
  private val ReTaiwanStart = "^(台灣|臺灣|Taiwan|台灣省|臺灣省|中華民國)[,，\\s]*".r
  private val ReTaiwanEnd = "[,，\\s]*(台灣|臺灣|Taiwan|台灣省|臺灣省)$".r
  private val ReTaiwanAny = "(台灣|臺灣|Taiwan|台灣省|臺灣省|中華民國)".r
  private val ReAddressFix = "(?U)(\\d+\\s*[號樓及Ff])\\s+([^\\s,;，；]{2,}(?:[路街巷大道段]))".r
  private val ReIdNoise = "(?iU)no\\s*=\\s*[\"'][\\w\\d]+[\"']".r
  val ReCity = "(?U)([^\\s,，]{2,3}(?:縣|市))".r
  val ReDistrict = "([\\u4e00-\\u9fff]{1,5}?[區市鎮鄉])".r
  val ReCityDistrict = "([\\u4e00-\\u9fff]{2}[縣市])([\\u4e00-\\u9fff]{1,5}?[區市鎮鄉])".r
  private val ReWhitespace = "(?U)\\s+".r
  private val ReTrailingParen = "(?U)\\s*\\(.*?\\)$".r
  val ReNumericOnly = "(?U)[\\d.]+".r
  private val ReYi = "(?U)([\\d.]+)(?=億)".r
  private val ReWan = "(?U)([\\d.]+)(?=萬)".r
  private val ReNoise = "(?U)[\\s\\-─=＞><!*#_~]+".r
  private val ReCjkOrLetter = "[\\u4e00-\\u9fffA-Za-z0-9]".r
  private val ReCjkFirst = "[\\u4e00-\\u9fff]".r

  // jsonld_adapter.py:92-95
  val PrivacyProtectedKeywords: Set[String] = Set(
    "暫不公開", "未公開", "保密", "面議", "暫不提供", "non-disclosure",
    "not-disclosed", "on request", "to be confirmed")

  /** jsonld_adapter.py:190-206 `_is_privacy_protected` */
  def isPrivacyProtected(v: JV): Boolean = {
    if (!truthy(v)) return false
    val s = Py.strip(pyStr(v)).toLowerCase
    PrivacyProtectedKeywords.exists(kw => s.contains(kw))
  }

  /** jsonld_adapter.py:208-213 `_is_minimalist` */
  def isMinimalist(v: JV): Boolean = {
    if (!truthy(v)) return true
    val s = Py.strip(pyStr(v))
    s.length < 2 || Py.isDigit(s)
  }

  /** jsonld_adapter.py:550-573 `_standardize_numeric` (the live, later
    * definition; the earlier one at 216-241 is shadowed dead code).
    */
  def standardizeNumeric(text: Option[String]): Option[String] = {
    text match {
      case None => None
      case Some(t0) if t0.isEmpty => None // Python `if not text`
      case Some(t0) =>
        var s = Entities.unescape(t0)
          .replace(",", "").replace(" ", "").replace("元", "")
          .replace("人", "").replace("員", "").replace("名", "")
        if (ReNumericOnly.pattern.matcher(s).matches()) return Some(s)
        var total = 0.0
        var hasU = false
        ReYi.findFirstMatchIn(s).foreach { m =>
          Py.toFloat(m.group(1)) match {
            case Some(d) =>
              total += d * 100000000d; hasU = true
              val parts = s.split("億", 2)
              s = if (parts.length > 1) parts(1) else ""
            case None =>
          }
        }
        ReWan.findFirstMatchIn(s).foreach { m =>
          Py.toFloat(m.group(1)).foreach { d => total += d * 10000d; hasU = true }
        }
        if (hasU) return Some(Py.formatF(total).split("\\.")(0))
        if (List("~", "-", "〜", "至").exists(s.contains)) {
          val ms = ReNumericOnly.findAllIn(s).toList
          if (ms.nonEmpty) {
            val ints = ms.map(m => Py.toFloat(m).map(_.toLong))
            if (ints.forall(_.isDefined))
              return Some(ints.flatten.max.toString)
          }
        }
        ReNumericOnly.findFirstIn(s) match {
          case Some(m) => Some(m)
          case None => Some(t0) // `return str(text)`
        }
    }
  }

  /** jsonld_adapter.py:243-299 `_validate_numeric_noise` */
  def validateNumericNoise(val0: JV, fieldType: String): Option[String] = {
    if (!truthy(val0)) return None
    if (isPrivacyProtected(val0)) return None
    val stdVal = standardizeNumeric(Some(pyStr(val0))) match {
      case Some(v) if v.nonEmpty => v
      case _ => return None
    }
    val s = Py.strip(stdVal).replace(",", "").replace("元", "")
      .replace("人", "").replace("員", "").replace("名", "")
    if (fieldType == "employees") {
      if (Py.isDigit(s) && BigInt(s) < 2) return None
    }
    if (fieldType == "capital") {
      val sl = s.toLowerCase
      if (sl.contains("private-equity") || sl.contains("funded")) return None
      Py.toFloat(s).foreach { f => if (f < 100000) return None }
      if (s.length < 4 && Py.isDigit(s.replace(".", ""))) return None
    }
    val noise = List("電聯", "先生", "小姐", "人力銀行",
      "1111", "yes123", "104", "yourator", "cakeresume", "cake.me", "locality")
    val sLower = s.toLowerCase
    if (noise.exists(k => sLower.contains(k.toLowerCase))) return None
    if (s == "104" || s == "1111") return None
    Some(stdVal)
  }

  /** jsonld_adapter.py:301-307 `_is_meaningful_text` */
  def isMeaningfulText(text: String): Boolean = {
    if (text == null || text.isEmpty) return false
    val clean = ReNoise.replaceAllIn(text, "")
    if (text.nonEmpty && clean.length.toDouble / text.length < 0.3) return false
    if (clean.length < 10) return false
    ReCjkOrLetter.findFirstIn(clean).isDefined
  }

  /** jsonld_adapter.py:390-395 `_clean_taiwan` */
  def cleanTaiwan(text: Option[String]): String = text match {
    case None => ""
    case Some(t) if t.isEmpty => ""
    case Some(t) =>
      Py.strip(ReTaiwanEnd.replaceAllIn(ReTaiwanStart.replaceAllIn(t, ""), ""))
  }

  /** jsonld_adapter.py:583-610 `_standardize_taiwan_address_format`.
    * Python returns the input unchanged when falsy (None -> None, "" -> "").
    */
  def standardizeTaiwanAddress(text: Option[String]): Option[String] = text match {
    case None => None
    case Some(t) if t.isEmpty => Some("")
    case Some(t0) =>
      if (List("台灣", "臺灣", "Taiwan", "TW", "TWN", "中華民國").contains(Py.strip(t0)))
        return Some("")
      var s = ReTaiwanStart.replaceAllIn(t0, "")
      s = ReTaiwanEnd.replaceAllIn(s, "")
      val m = ReCityDistrict.findFirstMatchIn(s).orElse(ReCity.findFirstMatchIn(s))
      m.foreach(mm => s = s.substring(mm.start))
      s = ReTrailingParen.replaceAllIn(s, "")
      val trailingNoise = List("追蹤", "關於我們", "職務類別", "儲存", "應徵", "分享",
        "檢舉", "回報", "查看地圖", "看地圖", "薪資待遇", "上班時段", "休假制度", "工作性質")
      trailingNoise.foreach { noise =>
        if (s.contains(noise)) s = Py.strip(s.split(java.util.regex.Pattern.quote(noise), 2)(0))
      }
      if (s.length > 4) s = ReTaiwanAny.replaceAllIn(s, "")
      s = Py.strip(s.replace(",", "").replace("，", ""))
      s = ReAddressFix.replaceAllIn(s, "$2$1")
      Some(s)
  }

  /** jsonld_adapter.py:612-636 `_dedupe_address` */
  def dedupeAddress(parts: List[String]): String = {
    if (parts.isEmpty) return ""
    val allTks = parts.filter(p => p != null && p.nonEmpty)
      .flatMap(p => Py.splitWs(p.replace("\u00a0", " ")))
    var resTks = List.empty[String]
    var seen = Set.empty[String]
    for (tk <- allTks) {
      val tkC = Py.strip(tk).replace(" ", "")
      if (tkC.nonEmpty && !seen.exists(ex => ex.contains(tkC))) {
        var newRes = List.empty[String]
        var repl = false
        for (exTk <- resTks) {
          val exC = exTk.replace(" ", "")
          if (tkC.contains(exC)) {
            if (!repl) { newRes = newRes :+ tk; repl = true }
            if (seen.contains(exC)) seen -= exC
            seen += tkC
          } else newRes = newRes :+ exTk
        }
        if (repl) resTks = newRes
        else { resTks = resTks :+ tk; seen += tkC }
      }
    }
    val sb = new StringBuilder
    for (tk <- resTks) {
      if (sb.isEmpty) sb.append(tk)
      else {
        val lastCjk = sb.nonEmpty && ReCjkFirst.pattern.matcher(sb.substring(sb.length - 1)).lookingAt()
        val firstCjk = tk.nonEmpty && ReCjkFirst.pattern.matcher(tk.substring(0, 1)).lookingAt()
        if (lastCjk && firstCjk) sb.append(tk) else sb.append(" ").append(tk)
      }
    }
    sb.toString
  }

  /** jsonld_adapter.py:638-640 `_clean_id_noise` */
  def cleanIdNoise(text: Option[String]): Option[String] =
    text.map(t => Py.strip(ReIdNoise.replaceAllIn(t, "")))

  /** jsonld_adapter.py:642-645 `_extract_city_from_text` */
  def extractCityFromText(text: String): Option[String] =
    if (text == null || text.isEmpty) None
    else ReCity.findFirstMatchIn(text).map(_.group(1))

  /** jsonld_adapter.py:370-388 `_parse_taiwan_location` */
  def parseTaiwanLocation(ld: JV, addressHint: Option[String]): (Option[String], Option[String]) = {
    var text = addressHint.getOrElse("")
    if (text.isEmpty) {
      JsonLd.safeGet(ld, "jobLocation", "address") match {
        case o: JObj =>
          // Python f"{node.get('addressRegion','')}...": key-present-but-null
          // renders as "None"
          def part(k: String): String = if (o.has(k)) pyStr(o(k)) else ""
          text = part("addressRegion") + part("addressLocality") + part("streetAddress")
        case JStr(s) => text = s
        case _ =>
      }
    }
    var reg: Option[String] = None
    var dist: Option[String] = None
    if (text.nonEmpty) {
      val t = cleanTaiwan(Some(text))
      ReCityDistrict.findFirstMatchIn(t) match {
        case Some(m) =>
          reg = Some(m.group(1))
          dist = Some(m.group(1) + m.group(2))
        case None =>
          ReCity.findFirstMatchIn(t).foreach(m => reg = Some(m.group(1)))
          ReDistrict.findFirstMatchIn(t).foreach(m => dist = Some(reg.getOrElse("") + m.group(1)))
      }
    }
    (reg, dist)
  }

  /** jsonld_adapter.py:530-539 `_map_job_type` */
  def mapJobType(et0: JV): String = {
    if (!truthy(et0)) return "全職"
    val et = et0 match {
      case JArr(a) if a.nonEmpty => a.head
      case other => other
    }
    val s = pyStr(et).toLowerCase
    if (s.contains("full")) "全職"
    else if (s.contains("part")) "兼職"
    else if (s.contains("intern")) "實習"
    else if (s.contains("contract") || s.contains("temp")) "約聘"
    else pyStr(et)
  }

  /** jsonld_adapter.py:541-548 `_map_education_text` */
  def mapEducationText(text: Option[String]): String = text match {
    case None => "不拘"
    case Some(t) if t.isEmpty => "不拘"
    case Some(t) =>
      val s = t.toLowerCase
      val m = List("elementary" -> "國小", "junior high" -> "國中", "high school" -> "高中",
        "vocational" -> "高職", "associate" -> "專科", "junior college" -> "專科",
        "bachelor" -> "大學", "university" -> "大學", "graduate" -> "碩士",
        "master" -> "碩士", "doctor" -> "博士", "ph.d" -> "博士")
      m.collectFirst { case (k, v) if s.contains(k) => v }.getOrElse(t)
  }

  /** jsonld_adapter.py:575-581 `_filter_website` */
  def filterWebsite(url: JV): Option[String] = {
    if (!truthy(url)) return None
    val s = Py.strip(pyStr(url))
    if (!s.toLowerCase.startsWith("http")) return None
    val ignore = List("104.com.tw", "1111.com.tw", "yes123.com.tw", "cake.me",
      "yourator.co", "facebook.com", "instagram.com", "linkedin.com",
      "twitter.com", "youtube.com", "google.com")
    if (ignore.exists(d => s.toLowerCase.contains(d))) None else Some(s)
  }

  /** Collapse runs of whitespace to single space (RE_WHITESPACE). */
  def collapseWs(s: String): String = ReWhitespace.replaceAllIn(s, " ")
}
