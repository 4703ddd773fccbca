package graft.schema

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.types.StructType

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

  /** S8 DDL auto-sync (database.py:336-383): the reference creates every
    * table plus its secondary indexes at startup; the Spark analog registers
    * catalog tables with `CREATE TABLE IF NOT EXISTS` from these case-class
    * schemas, with partition specs in place of MySQL partitioning and the
    * reference's index columns recorded as a sort-order table property
    * (`graft.zorder`) that writers use as their `sortWithinPartitions` /
    * Z-ORDER columns.
    */
  private final case class TableSpec(
      name: String,
      schema: StructType,
      partitionBy: Seq[String] = Nil,
      // database.py:344-374 secondary-index analog — the write-time sort
      // order that makes these columns min/max-prunable in parquet footers
      indexCols: Seq[String] = Nil,
      // pages is the 100 TB fetch side: bucketing by url co-locates the
      // frontier equi-join without shuffling html
      bucketBy: Option[(Int, String)] = None)

  private def specs: Seq[TableSpec] = Seq(
    TableSpec("pages", Encoders.product[Page].schema,
      bucketBy = Some((64, "url"))),
    TableSpec("tb_categories", Encoders.product[Category].schema,
      partitionBy = Seq("platform")),
    TableSpec("tb_jobs", Encoders.product[Job].schema,
      partitionBy = Seq("platform"),
      indexCols = Seq("source_id", "posted_at", "region", "job_type")),
    TableSpec("tb_companies", Encoders.product[Company].schema,
      partitionBy = Seq("platform"), indexCols = Seq("source_id", "name")),
    TableSpec("tb_job_locations", Encoders.product[JobLocation].schema,
      partitionBy = Seq("platform"), indexCols = Seq("job_source_id")),
    TableSpec("tb_job_skills_extracted", Encoders.product[JobSkill].schema,
      partitionBy = Seq("platform"), indexCols = Seq("skill_name")),
    TableSpec("tb_categories_jobs", Encoders.product[CategoryJob].schema,
      partitionBy = Seq("platform"), indexCols = Seq("category_id")),
    TableSpec("tb_platform_health", Encoders.product[PlatformHealth].schema))

  /** Idempotent fresh-warehouse bootstrap: issue one
    * `CREATE TABLE IF NOT EXISTS` per table under `warehouseDir`.
    * Safe to call at every session start (the reference calls its DDL sync
    * on every service boot, database.py:336).
    */
  def ensureTables(spark: SparkSession, warehouseDir: String): Unit =
    specs.foreach { t =>
      val dataCols = t.schema.fields.filterNot(f => t.partitionBy.contains(f.name))
      val colsDdl = (dataCols.map(f => s"`${f.name}` ${f.dataType.sql}") ++
        t.partitionBy.map { p =>
          val f = t.schema(p)
          s"`${f.name}` ${f.dataType.sql}"
        }).mkString(", ")
      val partClause =
        if (t.partitionBy.isEmpty) ""
        else t.partitionBy.mkString(" PARTITIONED BY (", ", ", ")")
      val bucketClause = t.bucketBy
        .map { case (n, c) => s" CLUSTERED BY ($c) SORTED BY ($c) INTO $n BUCKETS" }
        .getOrElse("")
      val props =
        if (t.indexCols.isEmpty) ""
        else s" TBLPROPERTIES ('graft.zorder' = '${t.indexCols.mkString(",")}')"
      spark.sql(
        s"""CREATE TABLE IF NOT EXISTS `${t.name}` ($colsDdl) USING PARQUET
           |$partClause$bucketClause
           |LOCATION '$warehouseDir/${t.name}'$props""".stripMargin)
    }

  /** The registered write-time sort order of a table ('' if none). */
  def indexColsOf(spark: SparkSession, table: String): Seq[String] = {
    val rows = spark.sql(s"SHOW TBLPROPERTIES `$table`")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    rows.get("graft.zorder").map(_.split(",").toSeq).getOrElse(Nil)
  }
}
