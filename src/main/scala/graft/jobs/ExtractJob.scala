package graft.jobs

import graft.extract._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.sql.Date

/** One flattened extraction row per fetched page — the typed output of the
  * extract stage (crawl_service._extract_entities, SURVEY.md §3.1 step 4).
  * The 5 relational tables (§1.1) are column-pruned projections of this.
  */
final case class FullExtract(
    canon_url: String,
    platform: String,
    host: String,
    category_id: String,
    extract_ok: Boolean,
    job_valid: Boolean,
    source_id: Option[String],
    company_source_id: Option[String],
    title: Option[String],
    job_url: Option[String],
    description: Option[String],
    industry: Option[String],
    job_type: Option[String],
    work_hours: Option[String],
    salary_currency: Option[String],
    salary_type: Option[String],
    salary_text: Option[String],
    salary_min: Option[Long],
    salary_max: Option[Long],
    address_country: Option[String],
    address: Option[String],
    region: Option[String],
    district: Option[String],
    experience_min_years: Option[Int],
    education_text: Option[String],
    skills_text: Option[String],
    posted_at: Option[Date],
    valid_through: Option[Date],
    raw_json: Option[String],
    company_name: Option[String],
    company_url: Option[String],
    company_web: Option[String],
    company_address: Option[String],
    company_capital: Option[String],
    company_employees: Option[String],
    company_description: Option[String],
    latitude: Option[Double],
    longitude: Option[Double],
    geo_provider: Option[String],
    extracted_skills: Seq[(String, String)],
    latency_ms: Long,
    is_listing: Boolean = false,
    discovered_links: Seq[String] = Nil,
    data_source_layer: String = "L1",
    company_data_source_layer: String = "L1")

object ExtractJob {

  /** Run the scala-native extraction over fetched pages.
    * Input columns: canon_url, platform, category_id, html (binary).
    * The flatMap is a deserialized Scala call — no Python boundary; html is
    * consumed here and never carried further (column pruning boundary).
    */
  def extractPages(fetched: DataFrame,
                   healer: Option[LlmJobExtractor] = None): Dataset[FullExtract] = {
    val spark = fetched.sparkSession
    import spark.implicits._
    fetched
      .select("canon_url", "platform", "host", "category_id", "html")
      .as[(String, String, String, String, Array[Byte])]
      .map { case (canonUrl, platform, host, categoryId, htmlBytes) =>
        val html = new String(htmlBytes, java.nio.charset.StandardCharsets.UTF_8)
        // F3: listing pages yield frontier candidates in the SAME pass over
        // the pages side (html is read exactly once per round) and skip
        // entity extraction entirely
        if (graft.frontier.Discovery.isListingUrl(canonUrl)) {
          FullExtract(canon_url = canonUrl, platform = platform, host = host,
            category_id = categoryId, extract_ok = false, job_valid = false,
            source_id = None, company_source_id = None, title = None,
            job_url = None, description = None, industry = None,
            job_type = None, work_hours = None, salary_currency = None,
            salary_type = None, salary_text = None, salary_min = None,
            salary_max = None, address_country = None, address = None,
            region = None, district = None, experience_min_years = None,
            education_text = None, skills_text = None, posted_at = None,
            valid_through = None, raw_json = None, company_name = None,
            company_url = None, company_web = None, company_address = None,
            company_capital = None, company_employees = None,
            company_description = None, latitude = None, longitude = None,
            geo_provider = None, extracted_skills = Nil,
            latency_ms = htmlBytes.length / 100 + 1,
            is_listing = true,
            discovered_links = graft.frontier.Discovery.extractLinks(platform, html))
        } else {
        val r = ExtractEntities(canonUrl, platform, html, healer)
        val job = r.job
        val comp = r.company
        val skills = job.flatMap(_.description).map(SkillExtractor.extract).getOrElse(Nil)
        FullExtract(
          canon_url = canonUrl,
          platform = platform,
          host = host,
          category_id = categoryId,
          extract_ok = r.extractOk,
          job_valid = r.jobValid,
          source_id = job.flatMap(_.sourceId),
          company_source_id = job.flatMap(_.companySourceId),
          title = job.flatMap(_.title),
          job_url = job.map(_.url),
          description = job.flatMap(_.description),
          industry = job.flatMap(_.industry),
          job_type = job.flatMap(_.jobType),
          work_hours = job.flatMap(_.workHours),
          salary_currency = job.flatMap(_.salaryCurrency),
          salary_type = job.flatMap(_.salaryType),
          salary_text = job.flatMap(_.salaryText),
          salary_min = job.flatMap(_.salaryMin),
          salary_max = job.flatMap(_.salaryMax),
          address_country = job.flatMap(_.addressCountry),
          address = job.flatMap(_.address),
          region = job.flatMap(_.region),
          district = job.flatMap(_.district),
          experience_min_years = job.flatMap(_.experienceMinYears),
          education_text = job.flatMap(_.educationText),
          skills_text = job.flatMap(_.skills),
          posted_at = job.flatMap(_.postedAt).map(Date.valueOf),
          valid_through = job.flatMap(_.validThrough).map(Date.valueOf),
          raw_json = if (r.extractOk) Some(r.rawJson) else None,
          company_name = comp.map(_.name),
          company_url = comp.flatMap(_.companyUrl),
          company_web = comp.flatMap(_.companyWeb),
          company_address = comp.flatMap(_.address),
          company_capital = comp.flatMap(_.capital),
          company_employees = comp.flatMap(_.employeeCount),
          company_description = comp.flatMap(_.description),
          latitude = r.location.map(_.latitude),
          longitude = r.location.map(_.longitude),
          geo_provider = r.location.map(_.provider),
          extracted_skills = skills,
          // deterministic latency proxy for the health EWMA (no wall clock)
          latency_ms = htmlBytes.length / 100 + 1,
          data_source_layer = r.dataSourceLayer,
          company_data_source_layer = comp.map(_.dataSourceLayer).getOrElse("L1"))
        }
      }
  }

  /** tb_jobs projection. */
  def jobs(extracted: DataFrame): DataFrame =
    extracted.filter(col("extract_ok"))
      .select(col("platform"), col("job_url").as("url"), col("source_id"),
        col("company_source_id"), col("title"), col("description"), col("industry"),
        col("job_type"), col("work_hours"), col("salary_currency"), col("salary_type"),
        col("salary_text"), col("salary_min"), col("salary_max"), col("address_country"),
        col("address"), col("region"), col("district"), col("experience_min_years"),
        col("education_text"), col("skills_text").as("skills"), col("posted_at"),
        col("valid_through"), col("raw_json"), col("data_source_layer"),
        col("job_valid").as("is_valid"))

  /** tb_companies projection — dedup replaces the reference's LRU company
    * cache (SURVEY.md §2.4 J3): deterministic keep-first by canon_url order.
    */
  def companies(extracted: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("platform"), col("company_source_id"))
      .orderBy(col("canon_url"))
    extracted
      .filter(col("extract_ok") && col("company_source_id").isNotNull &&
        col("company_name").isNotNull)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("platform"), col("company_source_id").as("source_id"),
        col("company_name").as("name"), col("company_url"), col("company_web"),
        col("company_address").as("address"), col("company_capital").as("capital"),
        col("company_employees").as("employee_count"),
        col("company_description").as("description"),
        col("company_data_source_layer").as("data_source_layer"))
  }

  /** tb_job_locations projection (NATIVE provider rows only). */
  def locations(extracted: DataFrame): DataFrame =
    extracted.filter(col("extract_ok") && col("latitude").isNotNull &&
        col("source_id").isNotNull)
      .select(col("platform"), col("source_id").as("job_source_id"),
        col("latitude"), col("longitude"), col("address").as("formatted_address"),
        col("geo_provider").as("provider"))

  /** tb_job_skills_extracted: lexicon explode (SURVEY.md §2.8 X23). */
  def skills(extracted: DataFrame): DataFrame =
    extracted.filter(col("extract_ok") && col("source_id").isNotNull)
      .select(col("platform"), col("source_id").as("job_source_id"),
        explode(col("extracted_skills")).as("sk"))
      .select(col("platform"), col("job_source_id"),
        col("sk._1").as("skill_name"), col("sk._2").as("skill_type"),
        lit(1.0).as("confidence_score"))

  /** tb_categories_jobs junction (SURVEY.md §2.4 J2). */
  def junction(extracted: DataFrame): DataFrame =
    extracted.filter(col("extract_ok") && col("source_id").isNotNull)
      .select(col("platform"), col("category_id"), col("source_id").as("job_source_id"),
        col("canon_url").as("job_url"))
      .dropDuplicates("platform", "category_id", "job_source_id")
}
