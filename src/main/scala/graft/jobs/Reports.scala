package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Monitoring / audit query surface over the crawl outputs (SURVEY.md §2.5
  * A1-A7, §3.3) — the rebuild's analog of inspect_data.py + health_service.
  */
object Reports {

  /** A1: platform health rollup across rounds with EWMA latency.
    *
    * The reference folds `avg = 0.9*old + 0.1*new` per URL in arrival order
    * (database.py:248-278). Order-dependent EWMA doesn't distribute, so the
    * batch analog folds per-round mean latencies in round order — closed
    * form: ewma_n = 0.9^n·x_0 + Σ_{i=1..n} 0.1·0.9^(n-i)·x_i, computed with
    * window sums (one value per round per platform — tiny).
    *
    * Metrics arrive one row per (platform, host, round); they are first
    * pre-aggregated to ONE row per (platform, round) — latency folded
    * request-weighted — so the order-dependent EWMA never depends on a
    * nondeterministic tie order between same-round rows (round-3 advice).
    */
  def platformHealth(metrics: DataFrame): DataFrame = {
    val perRound = metrics.groupBy("platform", "round").agg(
      sum("total_requests").as("total_requests"),
      sum("success_requests").as("success_requests"),
      sum("extraction_success").as("extraction_success"),
      sum("extraction_failure").as("extraction_failure"),
      when(sum("total_requests") > 0,
        sum(col("avg_latency_ms") * col("total_requests")) / sum("total_requests"))
        .otherwise(avg("avg_latency_ms")).as("avg_latency_ms"),
      sum("invalid_jobs").as("invalid_jobs"))
    val w = Window.partitionBy("platform").orderBy("round")
    val wAll = Window.partitionBy("platform")
    val withN = perRound
      .withColumn("_i", row_number().over(w) - 1)
      .withColumn("_n", max(col("_i")).over(wAll))
    val term = when(col("_i") === 0,
      col("avg_latency_ms") * pow(lit(0.9), col("_n")))
      .otherwise(col("avg_latency_ms") * lit(0.1) * pow(lit(0.9), col("_n") - col("_i")))
    withN
      .withColumn("_term", term)
      .groupBy("platform")
      .agg(
        sum("total_requests").as("total_requests"),
        sum("success_requests").as("success_requests"),
        (sum("total_requests") - sum("success_requests")).as("failed_requests"),
        sum("extraction_success").as("extraction_success"),
        sum("extraction_failure").as("extraction_failure"),
        round(sum("_term")).cast("long").as("avg_latency_ms_ewma"),
        sum("invalid_jobs").as("invalid_jobs"))
  }

  /** A2: structural-drift alarm — validation failure ratio per platform,
    * alert when total >= 10 and ratio > 0.3 (validator.py:45-65).
    */
  def validationAlerts(jobs: DataFrame): DataFrame =
    jobs.groupBy("platform")
      .agg(count(lit(1)).as("total"),
        round(avg(when(!col("is_valid"), 1.0).otherwise(0.0)), 4).as("fail_ratio"))
      .withColumn("alert", col("total") >= 10 && col("fail_ratio") > 0.3)

  /** A3: missing-rate audit over key columns (inspect_data.py:59-84). */
  def missingRates(jobs: DataFrame,
                   cols: Seq[String] = Seq("title", "salary_text", "address", "description",
                     "company_source_id", "posted_at")): DataFrame = {
    val aggs = cols.map(c => round(avg(isnull(col(c)).cast("int")), 4).as(s"missing_$c"))
    jobs.agg(aggs.head, aggs.tail: _*)
  }

  /** A4: inventory counts by platform. */
  def countsByPlatform(df: DataFrame): DataFrame =
    df.groupBy("platform").agg(count(lit(1)).as("n")).orderBy("platform")

  /** A7: anti-hallucination audit — rows that violate the acceptance
    * invariants (should always be empty; kept as a report for monitoring).
    */
  def antiHallucinationViolations(companies: DataFrame): DataFrame =
    companies.filter(
      col("employee_count").cast("long") < 2 ||
      col("capital").cast("long") < 100000 ||
      col("capital").contains("暫不公開") || col("employee_count").contains("暫不公開"))
}

/** S6: CSV/JSON export (export_service.py:24-87) — UTF-8-BOM CSV with header
  * and ISO dates, or JSON lines.
  */
object Export {

  /** Write a single UTF-8-BOM CSV file (the reference writes one file with a
    * BOM for Excel compatibility; dates render ISO).
    */
  def toCsv(df: DataFrame, outFile: String): Unit = {
    val tmp = outFile + ".tmpdir"
    val isoCols = df.schema.fields.map { f =>
      f.dataType.typeName match {
        case "date" => date_format(col(f.name), "yyyy-MM-dd").as(f.name)
        case "timestamp" => date_format(col(f.name), "yyyy-MM-dd'T'HH:mm:ss").as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(isoCols.toIndexedSeq: _*).coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(tmp)
    val dir = new java.io.File(tmp)
    val part = dir.listFiles().find(_.getName.startsWith("part-")).get
    val out = new java.io.FileOutputStream(outFile)
    try {
      out.write(Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte)) // UTF-8 BOM
      java.nio.file.Files.copy(part.toPath, out)
    } finally out.close()
    dir.listFiles().foreach(_.delete())
    dir.delete()
  }

  def toJson(df: DataFrame, outDir: String): Unit =
    df.write.mode("overwrite").json(outDir)
}
