package graft.streaming

import graft.jobs.ExtractJob
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Structured-Streaming variant of the extract stage (SURVEY.md §2.9 —
  * optional: the north rule is batch; frontier rounds map to
  * Trigger.AvailableNow micro-batches).
  *
  * The streaming plan is the same declarative pipeline as the batch one:
  * watermark on `warc_ts`, stateful URL dedup (the streaming seen-set —
  * state-store-backed instead of Bloom+anti-join), then the typed extract
  * flatMap. A production deployment would `readStream` the pages table
  * (file/Kafka source) and `writeStream` the table projections with
  * checkpointing; tests drive it through MemoryStream.
  */
object StreamingExtract {

  /** pages stream -> extracted jobs stream with cross-batch URL dedup. */
  def jobsStream(pages: DataFrame, watermark: String = "1 hour"): DataFrame = {
    val deduped = pages
      .withColumn("canon_url", graft.frontier.Canon.canonUrl(col("url")))
      .withColumn("platform",
        when(col("url").contains("104.com.tw"), "platform_104")
          .when(col("url").contains("1111.com.tw"), "platform_1111")
          .when(col("url").contains("cake.me"), "platform_cakeresume")
          .when(col("url").contains("yes123.com.tw"), "platform_yes123")
          .when(col("url").contains("yourator.co"), "platform_yourator"))
      .filter(col("platform").isNotNull)
      .withColumn("category_id", lit("stream"))
      .withWatermark("warc_ts", watermark)
      .dropDuplicates("canon_url") // state-store seen-set, bounded by watermark
    ExtractJob.jobs(ExtractJob.extractPages(
      deduped.withColumn("host", graft.frontier.Canon.host(col("url")))).toDF())
  }
}
