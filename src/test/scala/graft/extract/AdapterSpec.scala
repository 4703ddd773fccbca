package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.Json._

/** Adapter behavior mirrors test/unit/adapters/test_adapter_logic.py shapes
  * plus implementation-traced platform deltas (SURVEY.md §2.8 X19-X22).
  */
class AdapterSpec extends AnyFunSuite {

  private def obj(src: String): JObj = Json.parse(src).asInstanceOf[JObj]

  // ---- source-id grammars (X19) ----

  test("104 source id: query stripped, job/<id>") {
    val a = AdapterFactory.a104
    assert(a.getSourceId(JObj.empty, Some("https://www.104.com.tw/job/8abc12?jobsource=index"))
      .contains("8abc12"))
    assert(a.getUrl(JObj.empty, Some("https://www.104.com.tw/job/8abc12?x=1"))
      == "https://www.104.com.tw/job/8abc12")
  }

  test("1111 source id: digits only") {
    val a = AdapterFactory.a1111
    assert(a.getSourceId(JObj.empty, Some("https://www.1111.com.tw/job/73159840"))
      .contains("73159840"))
    assert(a.getSourceId(JObj.empty, Some("https://www.1111.com.tw/job/abc")).isEmpty)
  }

  test("cake source id: last path segment; VertivTW url normalization") {
    val a = AdapterFactory.aCake
    assert(a.getSourceId(JObj.empty,
      Some("https://www.cake.me/companies/VertivTW/jobs/senior-engineer"))
      .contains("senior-engineer"))
    val ld = obj("""{"hiringOrganization":{"url":"https://www.cakeresume.com/companies/vertiv-taiwan-co-ltd"}}""")
    assert(a.getCompanyUrl(ld).contains("https://www.cake.me/companies/VertivTW"))
    assert(a.getCompanySourceId(ld).contains("VertivTW"))
  }

  test("yes123 source id: p_id + job_id composite; relative url base") {
    val a = AdapterFactory.aYes
    assert(a.getSourceId(JObj.empty,
      Some("https://www.yes123.com.tw/wk_index/job.asp?p_id=2849804&job_id=97260086"))
      .contains("2849804_97260086"))
    assert(a.getUrl(obj("""{"url":"/wk_index/job.asp?p_id=1&job_id=2"}"""), None)
      == "https://www.yes123.com.tw/wk_index/job.asp?p_id=1&job_id=2")
  }

  test("yourator source id: jobs/<digits>; company id skips 'jobs'") {
    val a = AdapterFactory.aYour
    assert(a.getSourceId(JObj.empty,
      Some("https://www.yourator.co/companies/acme/jobs/919")).contains("919"))
    val ld = obj("""{"_url":"https://www.yourator.co/companies/919f33fa/jobs/123"}""")
    assert(a.getCompanySourceId(ld).contains("919f33fa"))
  }

  // ---- description deltas (X4) ----

  test("104 description: raw JSON leak returns None") {
    val a = AdapterFactory.a104
    assert(a.getDescription(obj("""{"description":"{\"k\": \"v\"} leaked"}""")).isEmpty)
    assert(a.getDescription(obj("""{"description":"<p>正常 &amp; 描述</p>"}"""))
      .contains("正常 & 描述"))
  }

  test("cake description: learn_more/view_all leak returns None") {
    val a = AdapterFactory.aCake
    assert(a.getDescription(
      obj("""{"description":"x \"learn_more\" y \"view_all\" z"}""")).isEmpty)
  }

  test("yourator description: 【工作內容】 truncation") {
    val a = AdapterFactory.aYour
    assert(a.getDescription(
      obj("""{"description":"公司介紹 blah 【工作內容】 開發與維護"}"""))
      .contains("【工作內容】 開發與維護"))
  }

  // ---- geo (X17) ----

  test("native geo from LD (test_coords golden)") {
    val a = AdapterFactory.a104
    val ld = obj("""{"jobLocation":{"geo":{"latitude":25.075,"longitude":121.572}}}""")
    assert(a.getLatitude(ld, None).contains(25.075))
    assert(a.getLongitude(ld, None).contains(121.572))
  }

  test("geo from google-maps url in html") {
    val a = AdapterFactory.a104
    val html = Some("""<a href="https://maps.google.com/?q=x@25.0512786,121.5167936">map</a>""")
    assert(a.getLatitude(JObj.empty, html).contains(25.0512786))
    assert(a.getLongitude(JObj.empty, html).contains(121.5167936))
  }

  test("yourator forces native geo to None") {
    val a = AdapterFactory.aYour
    val ld = obj("""{"jobLocation":{"geo":{"latitude":25.0,"longitude":121.5}}}""")
    assert(a.getLatitude(ld, None).isEmpty && a.getLongitude(ld, None).isEmpty)
  }

  // ---- company name fallbacks (X21) ----

  test("104 company name from title ｜ split + platform scrub") {
    val a = AdapterFactory.a104
    assert(a.getCompanyName(obj("""{"title":"資深工程師｜測試公司"}""")).contains("測試公司"))
    assert(a.getCompanyName(obj("""{"hiringOrganization":{"name":"104人力銀行 真名"}}"""))
      .contains("真名"))
  }

  test("1111 company name from injected title") {
    val a = AdapterFactory.a1111
    assert(a.getCompanyName(obj("""{"_injected_title":"好公司 | 徵才中 - 1111人力銀行"}"""))
      .contains("好公司"))
  }

  test("yes123 company name from injected html title") {
    val a = AdapterFactory.aYes
    assert(a.getCompanyName(obj("""{"_injected_html_title":"焱芝手工皂-工作徵才簡介｜yes123"}"""))
      .contains("焱芝手工皂"))
  }

  test("yourator company name from injected html title") {
    val a = AdapterFactory.aYour
    assert(a.getCompanyName(
      obj("""{"_injected_html_title":"VITABOX 維他盒子－最新職缺徵才中｜Yourator"}"""))
      .contains("VITABOX 維他盒子"))
  }

  // ---- anti-hallucination (X16/X22) ----

  test("1111 privacy-protected capital/employees -> None") {
    val a = AdapterFactory.a1111
    assert(a.getCapital(obj("""{"capital":"暫不公開"}""")).isEmpty)
    assert(a.getEmployeeCount(obj("""{"numberOfEmployees":"暫不公開"}""")).isEmpty)
    assert(a.getCapital(obj("""{"capital":"5000萬"}""")).contains("50000000"))
  }

  test("1111 html 暫不公開 anti-hallucination forces NULL") {
    val a = AdapterFactory.a1111
    val ld = obj(
      """{"@type":"Organization","name":"C","url":"https://www.1111.com.tw/corp/123",
        |"capital":"1000萬","numberOfEmployees":"50人"}""".stripMargin)
    val html = "<div>資本額：暫不公開 員工人數： 暫不公開</div>"
    val c = a.mapToCompany(ld, Some(html))
    assert(c.isDefined)
    assert(c.get.capital.isEmpty && c.get.employeeCount.isEmpty)
    assert(c.get.sourceId == "123")
  }

  test("yes123 employee count dict form + validation") {
    val a = AdapterFactory.aYes
    assert(a.getEmployeeCount(obj("""{"numberOfEmployees":{"value":50,"unitText":"人"}}"""))
      .contains("50"))
    assert(a.getEmployeeCount(obj("""{"numberOfEmployees":1}""")).isEmpty)
  }

  // ---- cake NEXT_DATA (X21) ----

  test("cake NEXT_DATA experience/company/capital") {
    val a = AdapterFactory.aCake
    val ld = obj(
      """{"@type":"JobPosting","title":"T",
        |"_next_data":{"props":{"pageProps":{
        |  "company":{"name":"NextCo","slug":"nextco","address":"台北市中山區南京東路100號",
        |             "capital":"3000萬","numberOfEmployees":"120人"},
        |  "job":{"min_work_exp_year":3}}}}}""".stripMargin)
    assert(a.getExperience(ld).contains(3))
    assert(a.getCompanyName(ld).contains("NextCo"))
    assert(a.getCompanyUrl(ld).contains("https://www.cake.me/companies/nextco"))
    assert(a.getCompanySourceId(ld).contains("nextco"))
    assert(a.getCapital(ld).contains("30000000"))
    assert(a.getEmployeeCount(ld).contains("120"))
    assert(a.getCompanyAddress(ld).contains("台北市中山區南京東路100號"))
  }

  // ---- yes123 overseas country (X18) ----

  test("yes123 overseas address country") {
    val a = AdapterFactory.aYes
    val ld = obj("""{"jobLocation":{"address":{"addressRegion":"亞洲","addressLocality":"東南亞越南地區"}}}""")
    assert(a.getAddressCountry(ld).contains("越南"))
    val ld2 = obj("""{"jobLocation":{"address":{"addressRegion":"台北市"}}}""")
    assert(a.getAddressCountry(ld2).contains("TW"))
  }

  test("base address country keyword map") {
    val a = AdapterFactory.a104
    val ld = obj("""{"jobLocation":{"address":{"addressLocality":"日本東京"}}}""")
    assert(a.getAddressCountry(ld).contains("JP"))
    assert(a.getAddressCountry(JObj.empty).contains("TW"))
  }
}
