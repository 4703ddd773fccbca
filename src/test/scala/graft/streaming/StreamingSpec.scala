package graft.streaming

import graft.schema.Schemas.Page
import graft.synth.PagesGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming extract: micro-batches with stateful cross-batch URL dedup. */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-streaming-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming extract dedups URLs across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Page]
    val out = StreamingExtract.jobsStream(input.toDF())
      .writeStream.format("memory").queryName("jobs_stream")
      .outputMode("append").start()

    val pages = (0L until 40L).map(id => PagesGen.buildPage(42L, id))
      .filter(!_.url.contains("blog.example")) // platform pages only
    // batch 1: first half; batch 2: second half PLUS duplicates of batch 1
    input.addData(pages.take(20))
    out.processAllAvailable()
    input.addData(pages.drop(20) ++ pages.take(20))
    out.processAllAvailable()

    val rows = spark.sql("SELECT url FROM jobs_stream").collect().map(_.getString(0))
    out.stop()

    // each URL extracted at most once despite re-arrival in batch 2
    assert(rows.nonEmpty)
    assert(rows.length == rows.distinct.length,
      s"duplicates leaked: ${rows.length} vs ${rows.distinct.length}")
  }

  test("streaming discovery: listing pages emit deduped frontier candidates") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Page]
    val out = StreamingExtract.discoveryStream(input.toDF())
      .writeStream.format("memory").queryName("frontier_stream")
      .outputMode("append").start()

    val listings = PagesGen.listingPages(spark, 1200L).collect().toSeq
    input.addData(listings.take(listings.size / 2))
    out.processAllAvailable()
    // re-send the first half (state-store dedup) plus the rest
    input.addData(listings)
    out.processAllAvailable()

    val rows = spark.sql("SELECT url, platform FROM frontier_stream").collect()
    out.stop()
    assert(rows.nonEmpty, "no candidates discovered from streamed listings")
    val urls = rows.map(_.getString(0))
    assert(urls.length == urls.distinct.length, "candidate dedup leaked")
    // candidates are job URLs, never listing URLs
    assert(!urls.exists(u => graft.frontier.Discovery.isListingUrl(u)))
  }
}
