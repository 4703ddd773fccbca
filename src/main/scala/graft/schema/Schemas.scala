package graft.schema

import java.sql.{Date, Timestamp}

/** Spark-facing row models (encoders derive from these case classes).
  * Mirrors core/infra/schemas.py (SURVEY.md §1.1-§1.3) plus the pages table
  * from BASELINE.json.input_hint.
  */
object Schemas {

  /** Common-Crawl-style pages table: the engine's fetch source
    * (BASELINE.json input_hint).
    */
  final case class Page(
      url: String,
      warc_ts: Timestamp,
      html: Array[Byte],
      text: String,
      lang: String)

  /** Frontier seed (mirrors discovery output, discovery_service.py:63-239). */
  final case class SeedUrl(url: String, platform: String, category_id: String, priority: Double)

  /** Per-host politeness policy (config.py:62-69 + north-rule robots rules). */
  final case class HostPolicy(
      host: String,
      rate_per_s: Double,
      burst: Int,
      crawl_delay_s: Double,
      robots_deny: Seq[String])

  /** tb_categories (schemas.py:33-44). */
  final case class Category(
      platform: String,
      layer_1_id: String, layer_1_name: String,
      layer_2_id: String, layer_2_name: String,
      layer_3_id: String, layer_3_name: String)

  /** tb_jobs (schemas.py:73-109). */
  final case class Job(
      platform: String,
      url: String,
      source_id: String,
      company_source_id: Option[String],
      title: String,
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
      skills: Option[String],
      posted_at: Option[Date],
      valid_through: Option[Date],
      raw_json: Option[String],
      data_source_layer: String,
      is_valid: Boolean)

  /** tb_companies (schemas.py:57-70). */
  final case class Company(
      platform: String,
      source_id: String,
      name: String,
      company_url: Option[String],
      company_web: Option[String],
      address: Option[String],
      capital: Option[String],
      employee_count: Option[String],
      description: Option[String],
      data_source_layer: String)

  /** tb_job_locations (schemas.py:125-133). */
  final case class JobLocation(
      platform: String,
      job_source_id: String,
      latitude: Double,
      longitude: Double,
      formatted_address: Option[String],
      provider: String)

  /** tb_job_skills_extracted (schemas.py:135-142). */
  final case class JobSkill(
      platform: String,
      job_source_id: String,
      skill_name: String,
      skill_type: String,
      confidence_score: Double)

  /** tb_categories_jobs junction (schemas.py:47-54). */
  final case class CategoryJob(
      platform: String,
      category_id: String,
      job_source_id: String,
      job_url: String)

  /** tb_platform_health rollup (schemas.py:112-123, database.py:248-278). */
  final case class PlatformHealth(
      platform: String,
      total_requests: Long,
      success_requests: Long,
      failed_requests: Long,
      extraction_success: Long,
      extraction_failure: Long,
      avg_latency_ms: Long,
      last_error: Option[String])
}
