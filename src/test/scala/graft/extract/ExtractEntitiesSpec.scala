package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end page extraction mirroring crawl_service._extract_entities,
  * with raw_json bytes verified against a CPython json.dumps golden.
  */
class ExtractEntitiesSpec extends AnyFunSuite {

  private val ldSrc =
    """{"@context":"https://schema.org","@type":"JobPosting","title":"資深後端工程師","description":"<p>負責 API 開發&amp;維護</p><ul><li>Python</li><li>Go</li></ul>","datePosted":"2026-01-05T08:00:00+08:00","validThrough":"2026-12-31","employmentType":"FULL_TIME","industry":"軟體服務業","url":"https://www.104.com.tw/job/8abc12?jobsource=index","hiringOrganization":{"@type":"Organization","name":"測試科技股份有限公司","sameAs":"https://www.104.com.tw/company/xyz789","url":"https://www.104.com.tw/company/xyz789"},"baseSalary":{"@type":"MonetaryAmount","currency":"TWD","value":{"@type":"QuantitativeValue","minValue":60000,"maxValue":90000,"unitText":"MONTH"}},"jobLocation":{"@type":"Place","address":{"@type":"PostalAddress","addressCountry":"TW","addressRegion":"台北市","addressLocality":"信義區","streetAddress":"信義路五段7號"},"geo":{"@type":"GeoCoordinates","latitude":25.033,"longitude":121.564}},"educationRequirements":[{"credentialCategory":"bachelor"}],"experienceRequirements":"3年以上"}"""

  private val pageUrl = "https://www.104.com.tw/job/8abc12?jobsource=index"

  private val html =
    s"""<!DOCTYPE html><html><head>
       |<title>資深後端工程師｜測試科技股份有限公司｜104人力銀行</title>
       |<script type="application/ld+json">$ldSrc</script>
       |</head><body><div>content</div></body></html>""".stripMargin

  // CPython golden: json.dumps(ld_with_injected_url, ensure_ascii=False)
  private val expectedRawJson =
    """{"@context": "https://schema.org", "@type": "JobPosting", "title": "資深後端工程師", "description": "<p>負責 API 開發&amp;維護</p><ul><li>Python</li><li>Go</li></ul>", "datePosted": "2026-01-05T08:00:00+08:00", "validThrough": "2026-12-31", "employmentType": "FULL_TIME", "industry": "軟體服務業", "url": "https://www.104.com.tw/job/8abc12?jobsource=index", "hiringOrganization": {"@type": "Organization", "name": "測試科技股份有限公司", "sameAs": "https://www.104.com.tw/company/xyz789", "url": "https://www.104.com.tw/company/xyz789"}, "baseSalary": {"@type": "MonetaryAmount", "currency": "TWD", "value": {"@type": "QuantitativeValue", "minValue": 60000, "maxValue": 90000, "unitText": "MONTH"}}, "jobLocation": {"@type": "Place", "address": {"@type": "PostalAddress", "addressCountry": "TW", "addressRegion": "台北市", "addressLocality": "信義區", "streetAddress": "信義路五段7號"}, "geo": {"@type": "GeoCoordinates", "latitude": 25.033, "longitude": 121.564}}, "educationRequirements": [{"credentialCategory": "bachelor"}], "experienceRequirements": "3年以上", "_url": "https://www.104.com.tw/job/8abc12?jobsource=index"}"""

  test("full 104 page extraction") {
    val r = ExtractEntities(pageUrl, Platforms.P104, html)
    assert(r.extractOk)
    val job = r.job.get
    assert(job.platform == "platform_104")
    assert(job.url == "https://www.104.com.tw/job/8abc12")
    assert(job.sourceId.contains("8abc12"))
    assert(job.companySourceId.contains("xyz789"))
    assert(job.title.contains("資深後端工程師"))
    assert(job.description.contains("負責 API 開發&維護 Python Go"))
    assert(job.industry.contains("軟體服務業"))
    assert(job.jobType.contains("全職"))
    assert(job.salaryType.contains("月薪"))
    assert(job.salaryText.contains("60000-90000"))
    assert(job.salaryMin.contains(60000L) && job.salaryMax.contains(90000L))
    assert(job.salaryCurrency.contains("TWD"))
    assert(job.addressCountry.contains("TW"))
    assert(job.address.contains("台北市信義區信義路五段7號"))
    assert(job.region.contains("台北市"))
    assert(job.district.contains("台北市信義區"))
    assert(job.experienceMinYears.isEmpty) // ExperienceParser quirk on "3年以上"
    assert(job.educationText.contains("大學"))
    assert(job.postedAt.map(_.toString).contains("2026-01-05"))
    assert(job.validThrough.map(_.toString).contains("2026-12-31"))

    val comp = r.company.get
    assert(comp.sourceId == "xyz789")
    assert(comp.name == "測試科技股份有限公司")
    assert(comp.companyUrl.contains("https://www.104.com.tw/company/xyz789"))
    assert(comp.companyWeb.isEmpty) // 104 domain filtered
    assert(comp.dataSourceLayer == "L1")

    val loc = r.location.get
    assert(loc.latitude == 25.033 && loc.longitude == 121.564)
    assert(loc.provider == "NATIVE")
    assert(loc.jobSourceId == "8abc12")

    assert(r.rawJson == expectedRawJson)
    assert(!r.jobValid) // experience_min_years null fails the json-schema check
  }

  test("no-LD page: fallback object has no title key -> no job (as reference)") {
    // The fallback LD carries only @type/_url/_injected_title; map_to_job
    // reads title-or-name, both absent -> job None -> extract_ok False
    // (crawl_service.py:326-340 with AI healing off).
    val r = ExtractEntities("https://www.104.com.tw/job/zzz9", Platforms.P104,
      "<html><head><title>前端工程師｜另一家公司｜104人力銀行</title></head><body>x</body></html>")
    assert(!r.extractOk && r.job.isEmpty && r.rawJson == "")
  }

  test("malformed LD skipped; @graph flattened") {
    val page =
      """<html><head>
        |<script type="application/ld+json">{broken json]]</script>
        |<script type="application/ld+json">{"@context":"x","@graph":[
        |  {"@type":"Organization","name":"G公司"},
        |  {"@type":"JobPosting","title":"G工程師","url":"https://www.1111.com.tw/job/555"}
        |]}</script>
        |</head><body></body></html>""".stripMargin
    val r = ExtractEntities("https://www.1111.com.tw/job/555", Platforms.P1111, page)
    assert(r.extractOk)
    assert(r.job.get.title.contains("G工程師"))
    assert(r.job.get.sourceId.contains("555"))
  }

  test("CDATA-wrapped LD") {
    val page =
      """<script type="application/ld+json">
        |<![CDATA[{"@type":"JobPosting","title":"C工程師","url":"https://www.1111.com.tw/job/777"}]]>
        |</script>""".stripMargin
    val r = ExtractEntities("https://www.1111.com.tw/job/777", Platforms.P1111, page)
    assert(r.extractOk && r.job.get.title.contains("C工程師"))
  }
}
