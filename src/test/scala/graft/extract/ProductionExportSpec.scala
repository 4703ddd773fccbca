package graft.extract

import graft.extract.Json._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Byte-parity against the reference's OWN production export — the one true
  * oracle for the cleaning chain: `tb_jobs_20260129_134157.json` carries both
  * the original JSON-LD (`raw_json`) and the production row that the
  * reference's real bs4/CPython pipeline produced from it. Feeding that
  * `raw_json` back through the yourator adapter must reproduce the exported
  * bytes exactly — unlike the emulator-generated goldens, this certifies
  * parity with actual reference output (the exports/categories files,
  * produced by crawl_service.py + adapter_yourator.py + bs4).
  *
  * Fields that the reference derived from page HTML (address, capital,
  * employee_count) or from the category layer (industry) are not recoverable
  * from raw_json alone and are asserted only where the html=None path has
  * defined semantics.
  */
class ProductionExportSpec extends AnyFunSuite {

  private val exportDir = "/root/reference/exports/categories"

  private def loadJobsExport(): JObj = {
    val text = new String(
      Files.readAllBytes(Paths.get(s"$exportDir/tb_jobs_20260129_134157.json")),
      StandardCharsets.UTF_8)
    Json.parse(text) match {
      case JArr(rows) => rows.head.asInstanceOf[JObj]
      case other => fail(s"unexpected export shape: $other")
    }
  }

  private def str(o: JObj, k: String): String = o(k) match {
    case JStr(s) => s
    case other => pyStr(other)
  }

  test("yourator job row reproduces the production export byte-for-byte") {
    val row = loadJobsExport()
    val rawJson = str(row, "raw_json")
    val ld = Json.parse(rawJson).asInstanceOf[JObj]
    val url = str(ld, "_url")

    val adapter = new AdapterYourator
    val job = adapter.mapToJob(ld, url, html = None)
      .getOrElse(fail("mapToJob returned None"))

    assert(job.title.contains(str(row, "title")))
    assert(job.sourceId.contains(str(row, "source_id")))
    assert(job.companySourceId.contains(str(row, "company_source_id")))
    assert(job.url == str(row, "url"))
    // THE parity assert: description was produced by real BeautifulSoup
    // get_text in production — our HtmlText/Entities chain must match bytes.
    assert(job.description.contains(str(row, "description")),
      s"description drift:\n got=${job.description}\n exp=${str(row, "description")}")
    assert(job.jobType.contains(str(row, "job_type")))            // INTERN -> 實習
    assert(job.salaryType.contains(str(row, "salary_type")))      // 面議
    assert(job.salaryText.contains(str(row, "salary_text")))      // 面議
    assert(job.salaryMin.isEmpty && job.salaryMax.isEmpty)
    assert(job.salaryCurrency.contains(str(row, "salary_currency"))) // TWD
    assert(job.addressCountry.contains(str(row, "address_country"))) // TW
    // In production, region/district were derived from the html-scraped
    // address hint (not the LD): replay parseTaiwanLocation with the
    // exported address as the hint — must reproduce the 台北市台北市
    // lazy-regex district-duplication quirk byte-for-byte.
    val hint = Some(str(row, "address"))
    assert(adapter.getRegion(ld, hint).contains(str(row, "region")))     // 台北市
    assert(adapter.getDistrict(ld, hint).contains(str(row, "district"))) // 台北市台北市
    // LD-only path (html=None): the 臺-variant from jobLocation.address
    assert(job.region.contains("臺北市"))
    assert(job.experienceMinYears.contains(0))
    assert(job.educationText.contains(str(row, "education_text"))) // 不拘
    assert(job.postedAt.map(_.toString)
      .contains(str(row, "posted_at").take(10)))                  // 2026-01-29
    assert(job.validThrough.map(_.toString)
      .contains(str(row, "valid_through").take(10)))              // 2112-09-03
  }

  test("raw_json AST round-trips to the production export bytes") {
    val row = loadJobsExport()
    val rawJson = str(row, "raw_json")
    // ordered AST + ensure_ascii=False dumps: parse→dumps must be identity
    // against bytes that production CPython json.dumps wrote
    assert(Json.dumps(Json.parse(rawJson)) == rawJson)
  }

  test("yourator company row reproduces the production CSV export") {
    val row = loadJobsExport()
    val ld = Json.parse(str(row, "raw_json")).asInstanceOf[JObj]
    val adapter = new AdapterYourator
    val comp = adapter.mapToCompany(ld, html = None)
      .getOrElse(fail("mapToCompany returned None"))

    val csv = new String(
      Files.readAllBytes(Paths.get(s"$exportDir/tb_companies_20260129_134157.csv")),
      StandardCharsets.UTF_8)
    assert(csv.startsWith("﻿"), "export CSV must carry a UTF-8 BOM")
    val lines = csv.stripPrefix("﻿").split("\r?\n")
    val header = lines(0).split(",", -1)
    val values = lines(1).split(",", -1)
    val rec = header.zip(values).toMap

    assert(comp.platform == rec("platform"))
    assert(comp.sourceId == rec("source_id"))                     // Aidmics
    assert(comp.name == rec("name"))                              // Aidmics 億觀生技
    assert(comp.companyUrl.contains(rec("company_url")))          // companies/Aidmics
    assert(comp.companyWeb.contains(rec("company_web")))          // tw.loveuhandy.com
    assert(comp.dataSourceLayer == rec("data_source_layer"))      // L1
    // address/capital/employee_count came from page HTML in production;
    // with html=None the adapter must leave them unset rather than guess
    assert(comp.address.isEmpty && comp.capital.isEmpty && comp.employeeCount.isEmpty)
  }
}
