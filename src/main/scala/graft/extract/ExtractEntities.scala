package graft.extract

import graft.extract.Json._

/** Full per-page extraction result (one fetched URL). */
final case class ExtractResult(
    job: Option[JobRow],
    company: Option[CompanyRow],
    location: Option[LocationRow],
    rawJson: String,
    extractOk: Boolean,
    jobValid: Boolean,
    dataSourceLayer: String = "L1")

/** Port of crawl_service.py:317-365 `_extract_entities` +
  * `_extract_native_location`, minus the LLM self-healing slice
  * (crawl_service.py:336-337 — optional L2 stage, out of the batch core;
  * rows it would touch keep data_source_layer='L1').
  */
object ExtractEntities {

  def apply(url: String, platform: String, html: String,
            healer: Option[LlmJobExtractor] = None): ExtractResult = {
    val pgTitle = HtmlText.pageTitle(html)
    var ldList = JsonLd.extract(html)
    ldList.foreach(_.put("_url", JStr(url)))

    if (ldList.isEmpty) {
      val o = JObj.empty
      o.put("@type", JStr("JobPosting"))
      o.put("_url", JStr(url))
      o.put("_injected_title", JStr(pgTitle))
      ldList = List(o)
    }

    val jobLd = JsonLd.findJobPosting(ldList)
    val adapter = AdapterFactory.get(platform)

    var job = jobLd.flatMap(ld => adapter.mapToJob(ld, url, Some(html)))
    var comp = adapter.mapToCompany(jobLd.getOrElse(ldList.head), Some(html))
    var layer = "L1"

    // X25 AI self-healing (crawl_service.py:336-337): structured extraction
    // failed -> LLM re-extract behind the title-similarity gate; surviving
    // rows carry L2 lineage. The reference gate is Python-falsy
    // (`not job or not job.title`): an EMPTY-STRING title heals too, not
    // just a missing one.
    if (job.forall(_.title.forall(_.isEmpty))) healer.foreach { h =>
      val (hj, hc) = Healing.healWithAi(html, platform, pgTitle, url, h)
      job = hj
      comp = hc
      if (hj.isDefined) layer = "L2"
    }

    if (job.isEmpty)
      return ExtractResult(None, None, None, "", extractOk = false, jobValid = false)

    val valid = Validator.validateJob(job.get)
    val loc = extractNativeLocation(job.get, jobLd, adapter, platform, html)
    val rawJson = Json.dumps(jobLd.getOrElse(JObj.empty))
    ExtractResult(job, comp, loc, rawJson, extractOk = true, jobValid = valid,
      dataSourceLayer = layer)
  }

  /** crawl_service.py:351-365 — NATIVE provider only when both coords truthy
    * (0.0 is falsy, as in Python).
    */
  private def extractNativeLocation(job: JobRow, ld: Option[JObj], adapter: Adapter,
                                    platform: String, html: String): Option[LocationRow] = {
    val lat = ld.flatMap(l => adapter.getLatitude(l, Some(html))).filter(_ != 0.0)
    val lon = ld.flatMap(l => adapter.getLongitude(l, Some(html))).filter(_ != 0.0)
    (lat, lon) match {
      case (Some(la), Some(lo)) =>
        job.sourceId.map { sid =>
          LocationRow(platform, sid, la, lo, job.address, "NATIVE")
        }
      case _ => None
    }
  }
}

/** Port of core/schemas/validator.py + core/schemas/job_schema.json /
  * company_schema.json as row predicates. Validation in the reference is
  * monitoring-only (the row is persisted regardless, crawl_service.py:343-344);
  * invalid rows additionally land in a quarantine table here.
  */
object Validator {

  private val platforms = Set("platform_104", "platform_1111", "platform_cakeresume",
    "platform_yes123", "platform_yourator", "platform_unknown")
  private val salaryTypes = Set("月薪", "時薪", "年薪", "日薪", "由案件決定", "面議")

  /** job_schema.json: required platform/url/title; typed fields must match
    * when present (null allowed only where the schema lists it).
    */
  def validateJob(j: JobRow): Boolean = {
    if (!platforms.contains(j.platform)) return false
    if (j.url == null || j.url.isEmpty) return false
    if (j.title.isEmpty) return false
    // non-nullable-when-present string fields (model always emits them)
    if (j.description.isEmpty) return false // "description": {"type":"string"}
    if (j.jobType.isEmpty) return false
    if (j.salaryType.exists(st => !salaryTypes.contains(st))) return false
    if (j.addressCountry.isEmpty) return false
    if (j.address.isEmpty) return false
    if (j.experienceMinYears.isEmpty || j.experienceMinYears.exists(_ < 0)) return false
    if (j.postedAt.isEmpty) return false // "posted_at": {"type":"string","format":"date"}
    true
  }

  def validateCompany(c: CompanyRow): Boolean = {
    if (!platforms.contains(c.platform)) return false
    if (c.sourceId == null || c.sourceId.isEmpty) return false
    if (c.name == null || c.name.isEmpty) return false
    true
  }
}
