package graft.extract

import graft.extract.Json._

/** Ports of core/utils/parsers.py — SalaryParser, DateParser,
  * ExperienceParser. Implementation-faithful, including documented quirks:
  *
  *   - SalaryParser string path: only `min` gets the 萬/億 multiplier and
  *     `s_type` stays MONTHLY (parsers.py:44,62-74 — the reference's own
  *     test_salary.py expects otherwise; we follow the implementation, see
  *     SURVEY.md §5.1).
  *   - ExperienceParser falls off the end (returns None) for values < 12
  *     without 月/month (parsers.py:168-175).
  */
object Parsers {

  object SalaryType {
    val MONTHLY = "月薪"
    val HOURLY = "時薪"
    val YEARLY = "年薪"
    val DAILY = "日薪"
    val BY_CASE = "由案件決定"
    val NEGOTIABLE = "面議"
  }

  final case class SalaryResult(min: Option[Long], max: Option[Long],
                                salaryType: String, text: String)

  private val ReYi = "(?U)([\\d.]+)(?=億)".r
  private val ReWan = "(?U)([\\d.]+)(?=萬)".r
  private val ReDigits = "(?U)\\d+".r

  /** parsers.py:90-97 `_to_int` */
  def toInt(v: JV): Option[Long] = v match {
    case JNull => None
    case other =>
      Py.toFloat(pyStr(other)) match {
        case Some(d) =>
          val n = d.toLong
          if (n > 0) Some(n) else None
        case None => None
      }
  }

  /** parsers.py:100-107 `_normalize_type` */
  def normalizeType(unit: String, text: String): String = {
    val u = unit.toUpperCase
    if (u.contains("YEAR") || text.contains("年")) SalaryType.YEARLY
    else if (u.contains("HOUR") || text.contains("時")) SalaryType.HOURLY
    else if (u.contains("DAY") || text.contains("日")) SalaryType.DAILY
    else if (u.contains("MONTH") || text.contains("月")) SalaryType.MONTHLY
    else SalaryType.NEGOTIABLE
  }

  /** parsers.py:110-118 `_format_text` */
  def formatText(minV: Option[Long], maxV: Option[Long], baseText: Option[String]): String =
    (minV, maxV) match {
      case (Some(mn), Some(mx)) => s"$mn-$mx"
      case (Some(mn), None) =>
        baseText match {
          case Some(bt) if bt.contains("以上") || bt.contains("起") => Py.strip(bt)
          case _ => s"${mn}元以上"
        }
      case _ => baseText.map(Py.strip).filter(_.nonEmpty).getOrElse("面議")
    }

  /** parsers.py:24-87 `SalaryParser.parse` */
  def parseSalary(baseSalary0: JV): SalaryResult = {
    if (!truthy(baseSalary0))
      return SalaryResult(None, None, SalaryType.NEGOTIABLE, "面議")

    val baseSalary = baseSalary0 match {
      case JArr(a) if a.nonEmpty => a.head
      case other => other
    }

    var minV: JV = JNull
    var maxV: JV = JNull
    var sType: String = SalaryType.MONTHLY
    var baseText: Option[String] = None

    val isDict = baseSalary.isInstanceOf[JObj]
    if (isDict) {
      val d = baseSalary.asInstanceOf[JObj]
      val value: JObj = d.get("value") match {
        case Some(o: JObj) => o
        case _ => d
      }
      // Python `or`: falsy minValue falls through to value (even if also falsy)
      val mv0 = value.get("minValue").getOrElse(JNull)
      minV = if (truthy(mv0)) mv0 else value.get("value").getOrElse(JNull)
      maxV = value.get("maxValue").getOrElse(JNull)
      val ut0 = value.get("unitText").getOrElse(JNull)
      val unitText = if (truthy(ut0)) pyStr(ut0) else "MONTH"
      sType = normalizeType(unitText, pyRepr(baseSalary))
      baseText = if (truthy(minV)) Some(pyStr(minV)) else None
    }

    val rawText: String =
      if (!isDict) pyStr(baseSalary) else baseText.getOrElse("")

    val minStr = pyStr(minV)
    val minNotNumeric = (minV == JNull) || !Py.isDigit(minStr.replace(".", ""))
    if (minNotNumeric && rawText.nonEmpty) {
      val cleaned = rawText.replace(",", "").replace(" ", "")
      val yi = ReYi.findFirstMatchIn(cleaned)
      val wan = ReWan.findFirstMatchIn(cleaned)
      if (yi.isDefined) {
        Py.toFloat(yi.get.group(1)).foreach(d => minV = JInt(BigInt((d * 100000000L).toLong)))
      } else if (wan.isDefined) {
        Py.toFloat(wan.get.group(1)).foreach(d => minV = JInt(BigInt((d * 10000L).toLong)))
      } else {
        val digits = ReDigits.findAllIn(cleaned).toList
        if (digits.nonEmpty) {
          minV = JStr(digits.head)
          if (digits.length > 1) maxV = JStr(digits(1))
        }
      }
      if (baseText.isEmpty) baseText = Some(rawText)
    }

    val finalMin = toInt(minV)
    val finalMax = toInt(maxV)
    SalaryResult(finalMin, finalMax, sType, formatText(finalMin, finalMax, baseText))
  }

  private val ReIsoDate = "(?U)(\\d{4})[-/](\\d{1,2})[-/](\\d{1,2})".r

  /** parsers.py:124-136 `DateParser.parse_iso_date` (string input path). */
  def parseIsoDate(dateStr: JV): Option[String] = dateStr match {
    case JStr(s) if s.nonEmpty =>
      val clean = s.split("T", 2)(0).split(" ", 2)(0)
      ReIsoDate.findFirstMatchIn(clean).map { m =>
        f"${m.group(1)}-${m.group(2).toInt}%02d-${m.group(3).toInt}%02d"
      }
    case _ => None // Python: not a str (or falsy) -> None
  }

  /** parsers.py:139-146 `DateParser.parse` -> java LocalDate. */
  def parseDate(raw: JV): Option[java.time.LocalDate] =
    parseIsoDate(raw).flatMap { iso =>
      try Some(java.time.LocalDate.parse(iso)) catch { case _: Exception => None }
    }

  private val ReFirstDigits = "(?U)(\\d+)".r

  /** parsers.py:151-175 `ExperienceParser.parse`.
    * Returns: Some(0) for falsy/不拘/no-digit, Some(v/12) for month-y values,
    * None when the function falls off the end (the <12-years quirk).
    */
  def parseExperience(expVal: JV): Option[Int] = {
    if (!truthy(expVal)) return Some(0)
    val s = pyStr(expVal).toLowerCase
    if (s.contains("不拘")) return Some(0)
    ReFirstDigits.findFirstMatchIn(s) match {
      case None => Some(0)
      case Some(m) =>
        val v = m.group(1).toInt
        if (List("月", "month", "個月").exists(s.contains) && v >= 12) Some(v / 12)
        else if (v >= 12 && !List("年", "year").exists(s.contains)) Some(v / 12)
        else None // falls off the end in the reference
    }
  }
}
