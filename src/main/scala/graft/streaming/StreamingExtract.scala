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

  /** Shared front half: canon + platform tag + watermark + state-store URL
    * dedup (the streaming seen-set), then the SAME typed extract pass as the
    * batch rounds (listing pages yield discovered_links, job pages yield
    * entities).
    */
  private def extractedStream(pages: DataFrame, watermark: String): DataFrame = {
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
      // state-store seen-set. dropDuplicates(keys) only evicts state when the
      // event-time column is IN the keys — with canon_url alone the store
      // would grow without bound; the WithinWatermark variant keeps the dedup
      // key set while evicting rows older than the watermark.
      // SINK CONTRACT: dedup is therefore bounded-window, not forever — a
      // URL re-arriving later than the watermark gap is re-emitted and
      // re-extracted, so downstream sees at-least-once per canon_url across
      // far-apart batches. That is exactly the upsert shape the batch layer
      // already absorbs: rows land as round deltas and MERGE-at-read
      // compaction (Compaction.currentJobs) folds re-emissions to the
      // latest row, IFNULL-guarded. Consumers reading the raw stream (not
      // the compacted view) must dedupe themselves or widen the watermark.
      .dropDuplicatesWithinWatermark("canon_url")
    ExtractJob.extractPages(
      deduped.withColumn("host", graft.frontier.Canon.host(col("url")))).toDF()
  }

  /** pages stream -> extracted jobs stream with cross-batch URL dedup. */
  def jobsStream(pages: DataFrame, watermark: String = "1 hour"): DataFrame =
    ExtractJob.jobs(extractedStream(pages, watermark))

  /** pages stream -> discovered frontier-candidate stream (streaming F3):
    * listing pages crossing the stream emit their candidate job URLs in
    * seed shape — the writeStream side of a live frontier loop. The link
    * grammars are the same typed pass the batch rounds use; candidate dedup
    * per (platform, url) is the single stateful stage (it subsumes page-level
    * dedup — a re-seen listing only re-emits candidates the state already
    * holds), bounded by the event-time watermark.
    */
  def discoveryStream(pages: DataFrame, watermark: String = "1 hour"): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages
      .withColumn("canon_url", graft.frontier.Canon.canonUrl(col("url")))
      .withColumn("platform",
        when(col("url").contains("104.com.tw"), "platform_104")
          .when(col("url").contains("1111.com.tw"), "platform_1111")
          .when(col("url").contains("cake.me"), "platform_cakeresume")
          .when(col("url").contains("yes123.com.tw"), "platform_yes123")
          .when(col("url").contains("yourator.co"), "platform_yourator"))
      .filter(col("platform").isNotNull &&
        graft.frontier.Discovery.isListing(col("canon_url")))
      .select(col("platform"), col("warc_ts"), col("html"))
      .as[(String, java.sql.Timestamp, Array[Byte])]
      .flatMap { case (p, ts, html) =>
        graft.frontier.Discovery
          .extractLinks(p, new String(html, java.nio.charset.StandardCharsets.UTF_8))
          .map(u => (p, ts, u))
      }
      .toDF("platform", "warc_ts", "url")
      .withWatermark("warc_ts", watermark)
      // watermark-evicted dedup state (see jobsStream note)
      .dropDuplicatesWithinWatermark("platform", "url")
      .withColumn("priority", lit(0.5))
      .select("url", "platform", "priority", "warc_ts")
  }
}
