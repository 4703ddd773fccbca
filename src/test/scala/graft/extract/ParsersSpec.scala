package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.Json._
import graft.extract.Parsers._

/** Mirrors test/unit/parsers/test_salary.py plus implementation-traced cases.
  * Where the reference's test suite diverges from its implementation
  * (SURVEY.md §5.1), we assert the implementation's behavior.
  */
class ParsersSpec extends AnyFunSuite {

  test("salary: basic range string") {
    val r = parseSalary(JStr("月薪 40,000 - 50,000 元"))
    assert(r.min.contains(40000L) && r.max.contains(50000L))
    assert(r.salaryType == SalaryType.MONTHLY)
    assert(r.text == "40000-50000")
  }

  test("salary: 萬 multiplier applies to min only; string path stays MONTHLY") {
    val r = parseSalary(JStr("年薪 100萬 - 120 萬"))
    assert(r.min.contains(1000000L))
    assert(r.max.isEmpty) // implementation quirk, reference test expects 1200000
    assert(r.salaryType == SalaryType.MONTHLY) // quirk: string path never sets type
    assert(r.text == "1000000元以上")
  }

  test("salary: 億 multiplier") {
    val r = parseSalary(JStr("月薪 1.5 億"))
    assert(r.min.contains(150000000L))
  }

  test("salary: negotiable") {
    val r = parseSalary(JStr("面議"))
    assert(r.min.isEmpty && r.max.isEmpty)
    assert(r.text == "面議")
    assert(r.salaryType == SalaryType.MONTHLY) // quirk: truthy string path
  }

  test("salary: falsy input") {
    val r = parseSalary(JNull)
    assert(r.salaryType == SalaryType.NEGOTIABLE && r.text == "面議")
  }

  test("salary: JSON-LD dict with nested value") {
    val ld = Json.parse(
      """{"@type":"MonetaryAmount","currency":"TWD","value":
        |{"@type":"QuantitativeValue","minValue":40000,"maxValue":100000,"unitText":"MONTH"}}""".stripMargin)
    val r = parseSalary(ld)
    assert(r.min.contains(40000L) && r.max.contains(100000L))
    assert(r.salaryType == SalaryType.MONTHLY)
    assert(r.text == "40000-100000")
  }

  test("salary: dict with YEAR unit") {
    val ld = Json.parse("""{"value":{"minValue":1000000,"unitText":"YEAR"}}""")
    val r = parseSalary(ld)
    assert(r.salaryType == SalaryType.YEARLY)
    assert(r.min.contains(1000000L) && r.max.isEmpty)
    assert(r.text == "1000000元以上")
  }

  test("salary: flat dict without nested value") {
    val ld = Json.parse("""{"minValue":30000,"maxValue":45000}""")
    val r = parseSalary(ld)
    assert(r.min.contains(30000L) && r.max.contains(45000L))
    assert(r.salaryType == SalaryType.MONTHLY) // default unit MONTH
  }

  test("salary: 以上 text preserved") {
    val r = parseSalary(JStr("35000元以上"))
    assert(r.min.contains(35000L) && r.text == "35000元以上")
  }

  test("salary: list takes first element") {
    val r = parseSalary(JArr.of(JStr("月薪 28,000 元"), JStr("ignored")))
    assert(r.min.contains(28000L))
  }

  test("experience: implementation-faithful quirks") {
    assert(parseExperience(JStr("不拘")).contains(0))
    assert(parseExperience(JNull).contains(0))
    assert(parseExperience(JStr("")).contains(0))
    assert(parseExperience(JStr("無經驗可")).contains(0)) // no digits
    assert(parseExperience(JStr("3年以上")).isEmpty) // falls off the end (<12, has 年... wait)
    assert(parseExperience(JStr("24個月")).contains(2))
    assert(parseExperience(JStr("36")).contains(3)) // >=12 without 年 -> months
    assert(parseExperience(JStr("2年")).isEmpty) // <12 -> falls off the end
    assert(parseExperience(JStr("15年")).isEmpty) // >=12 but has 年 and no 月 -> falls off
  }

  test("dates") {
    assert(parseIsoDate(JStr("2026-01-05T08:00:00")).contains("2026-01-05"))
    assert(parseIsoDate(JStr("2026/1/5")).contains("2026-01-05"))
    assert(parseIsoDate(JStr("2026-1-5 10:00")).contains("2026-01-05"))
    assert(parseIsoDate(JStr("no date here")).isEmpty)
    assert(parseIsoDate(JInt(20260105)).isEmpty) // non-string -> None
    assert(parseDate(JStr("2026-12-31")).map(_.toString).contains("2026-12-31"))
  }

  test("standardize numeric") {
    import TextClean.standardizeNumeric
    assert(standardizeNumeric(Some("1,000萬元")).contains("10000000"))
    assert(standardizeNumeric(Some("1386億")).contains("138600000000"))
    assert(standardizeNumeric(Some("5億3000萬")).contains("530000000"))
    assert(standardizeNumeric(Some("1~5人")).contains("5"))
    assert(standardizeNumeric(Some("40000")).contains("40000"))
    assert(standardizeNumeric(Some("約50名")).contains("50"))
    assert(standardizeNumeric(None).isEmpty)
    assert(standardizeNumeric(Some("無資料")).contains("無資料")) // falls back to str(text)
  }

  test("validate numeric noise") {
    import TextClean.validateNumericNoise
    assert(validateNumericNoise(JStr("40000"), "capital").isEmpty) // < 100000 -> salary leak
    assert(validateNumericNoise(JStr("1000萬"), "capital").contains("10000000"))
    assert(validateNumericNoise(JStr("1"), "employees").isEmpty) // < 2
    assert(validateNumericNoise(JStr("50人"), "employees").contains("50"))
    assert(validateNumericNoise(JStr("暫不公開"), "capital").isEmpty)
    assert(validateNumericNoise(JStr("面議"), "employees").isEmpty)
    assert(validateNumericNoise(JNull, "capital").isEmpty)
  }

  test("address standardization") {
    import TextClean._
    assert(standardizeTaiwanAddress(Some("台灣台北市信義區信義路五段7號"))
      .contains("台北市信義區信義路五段7號"))
    assert(standardizeTaiwanAddress(Some("D.Lab 台北市中山區南京東路一段1號"))
      .contains("台北市中山區南京東路一段1號"))
    assert(standardizeTaiwanAddress(Some("台北市信義區市府路45號 (101大樓)"))
      .contains("台北市信義區市府路45號"))
    assert(standardizeTaiwanAddress(Some("高雄市前鎮區中山二路2號 薪資待遇"))
      .contains("高雄市前鎮區中山二路2號"))
    assert(standardizeTaiwanAddress(Some("台灣")).contains(""))
    assert(standardizeTaiwanAddress(None).isEmpty)
    // misordered 號樓 swap (RE_ADDRESS_FIX)
    assert(standardizeTaiwanAddress(Some("新北市板橋區7號 文化路"))
      .contains("新北市板橋區文化路7號"))
  }

  test("dedupe address") {
    import TextClean.dedupeAddress
    assert(dedupeAddress(List("台北市信義區", "台北市信義區信義路五段7號"))
      == "台北市信義區信義路五段7號")
    assert(dedupeAddress(List("新北市 板橋區", "板橋區文化路")) == "新北市板橋區文化路")
    assert(dedupeAddress(Nil) == "")
    assert(dedupeAddress(List("ABC Tower", "台北市")) == "ABC Tower 台北市")
  }

  test("taiwan location parse") {
    import TextClean.parseTaiwanLocation
    val (r1, d1) = parseTaiwanLocation(JNull, Some("台北市信義區信義路五段7號"))
    assert(r1.contains("台北市") && d1.contains("台北市信義區"))
    val (r2, d2) = parseTaiwanLocation(JNull, Some("信義區信義路"))
    assert(r2.isEmpty && d2.contains("信義區"))
    val ld = Json.parse(
      """{"jobLocation":{"address":{"addressRegion":"高雄市","addressLocality":"前鎮區","streetAddress":"中山二路2號"}}}""")
    val (r3, d3) = parseTaiwanLocation(ld, None)
    // lazy {1,5}? stops at the first class char: 鎮 of 前鎮區 (reference quirk)
    assert(r3.contains("高雄市") && d3.contains("高雄市前鎮"))
  }

  test("job type / education mapping") {
    import TextClean._
    assert(mapJobType(JStr("FULL_TIME")) == "全職")
    assert(mapJobType(JStr("PART_TIME")) == "兼職")
    assert(mapJobType(JStr("INTERN")) == "實習")
    assert(mapJobType(JStr("CONTRACTOR")) == "約聘")
    assert(mapJobType(JNull) == "全職")
    assert(mapJobType(JArr.of(JStr("INTERNSHIP"), JStr("FULL_TIME"))) == "實習")
    assert(mapJobType(JStr("特殊型態")) == "特殊型態")
    assert(mapEducationText(Some("bachelor degree")) == "大學")
    assert(mapEducationText(Some("Master")) == "碩士")
    assert(mapEducationText(None) == "不拘")
    assert(mapEducationText(Some("高中以上")) == "高中以上") // passthrough
  }

  test("py repr float formatting") {
    assert(Py.reprFloat(1.0) == "1.0")
    assert(Py.reprFloat(0.1) == "0.1")
    assert(Py.reprFloat(1e16) == "1e+16")
    assert(Py.reprFloat(1.5e-7) == "1.5e-07")
    assert(Py.reprFloat(25.033) == "25.033")
    assert(Py.reprFloat(-0.0) == "-0.0")
  }
}
