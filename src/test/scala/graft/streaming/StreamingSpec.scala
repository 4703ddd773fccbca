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

  test("online simhash dedup equals the batch all-pairs result across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val mutated = docs.select((col("doc_id") + 1000000).as("doc_id"),
      array_join(slice(split(col("text"), " "), lit(1),
        greatest(size(split(col("text"), " ")) - 1, lit(1))), " ").as("text"))
    val uni = docs.select("doc_id", "text").unionByName(mutated)
    val expected = graft.ops.TextOps.simhashPairs(uni, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    val rows = uni.select("doc_id", "text").as[(Long, String)].collect().toSeq
    val input = MemoryStream[(Long, String)]
    val out = StreamingDedup.simhashPairsStream(
        input.toDF().toDF("doc_id", "text"), maxDist = 3)
      .writeStream.format("memory").queryName("simdup_stream")
      .outputMode("append").start()
    // originals arrive first, their mutations a micro-batch later — the
    // cross-batch pairs exercise the state-store index, the in-batch pairs
    // the same-batch path
    input.addData(rows.filter(_._1 < 1000000))
    out.processAllAvailable()
    input.addData(rows.filter(_._1 >= 1000000))
    out.processAllAvailable()

    val got = spark.sql("SELECT doc_a, doc_b, hamming FROM simdup_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    out.stop()
    assert(got.length == got.distinct.length, "a pair was emitted twice")
    assert(got.toSet == expected,
      s"streaming diverged from batch: +${(got.toSet -- expected).size} " +
        s"-${(expected -- got.toSet).size} of ${expected.size}")
  }

  test("online simhash dedup state survives a query restart (checkpoint recovery)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val ckpt = java.nio.file.Files.createTempDirectory("simdup_ckpt").toString
    val sink = java.util.concurrent.ConcurrentHashMap.newKeySet[(Long, Long, Int)]()
    val input = MemoryStream[(Long, String)]
    def start() = StreamingDedup.simhashPairsStream(
        input.toDF().toDF("doc_id", "text"), maxDist = 3)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[SimPair], _: Long) =>
        batch.collect().foreach(p => sink.add((p.doc_a, p.doc_b, p.hamming)))
        ()
      }.start()

    // run 1: the original corpus populates the state-store chunk index
    val q1 = start()
    input.addData(Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
                      (2L, "one two three four five six seven eight")))
    q1.processAllAvailable(); q1.stop()
    assert(sink.isEmpty, "no near-dups within the seed batch")

    // run 2: a RESTARTED query (same checkpoint) must still know run 1's
    // fingerprints — a near-identical doc arriving after the restart pairs
    // with a doc indexed before it
    val q2 = start()
    input.addData(Seq((9L, "alpha beta gamma delta epsilon zeta eta theta")))
    q2.processAllAvailable(); q2.stop()

    import scala.jdk.CollectionConverters._
    assert(sink.asScala.map(p => (p._1, p._2)).toSet == Set((1L, 9L)),
      s"cross-restart pair missing or wrong: ${sink.asScala.toSet}")
  }

  test("r6: skewed stream spreads residents across sub-buckets (bounded state rewrites)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // 32 docs with IDENTICAL text → identical simhash → all land in the
    // same 4 chunk buckets (worst-case skew). Sub-bucketing must split the
    // fingerprint state into 4 × subBuckets rows of ~N/subBuckets entries
    // each — a per-arrival value rewrite is then bounded by the sub-bucket
    // population, not the whole clique — while still emitting every pair
    // exactly once.
    val input = MemoryStream[(Long, String)]
    val out = StreamingDedup.simhashPairsStream(
        input.toDF().toDF("doc_id", "text"), maxDist = 3, subBuckets = 8)
      .writeStream.format("memory").queryName("simdup_skew")
      .outputMode("append").start()
    input.addData((0L until 32L).map(i => (i, "same text for every doc")))
    out.processAllAvailable()
    val stateRows = out.recentProgress
      .flatMap(_.stateOperators.map(_.numRowsTotal)).max
    val got = spark.sql("SELECT doc_a, doc_b FROM simdup_skew").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    out.stop()
    assert(got.length == 32 * 31 / 2, s"clique pairs: ${got.length}")
    assert(got.length == got.distinct.length, "a pair was emitted twice")
    assert(stateRows == 4 * 8,
      s"state rows $stateRows != 32: residents not spread across sub-buckets")
  }

  test("online simhash dedup runs on the RocksDB state store provider") {
    // the scale claim: the fingerprint index lives in RocksDB on executors,
    // not on-heap — same results, state size no longer bounded by heap
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Long, String)]
      val out = StreamingDedup.simhashPairsStream(
          input.toDF().toDF("doc_id", "text"), maxDist = 3)
        .writeStream.format("memory").queryName("simdup_rocks")
        .outputMode("append").start()
      input.addData(Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
                        (2L, "one two three four five six seven eight")))
      out.processAllAvailable()
      input.addData(Seq((9L, "alpha beta gamma delta epsilon zeta eta theta")))
      out.processAllAvailable()
      val got = spark.sql("SELECT doc_a, doc_b FROM simdup_rocks")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      out.stop()
      assert(got == Set((1L, 9L)), s"RocksDB-backed run diverged: $got")
    } finally {
      prev match { case Some(v) => spark.conf.set(key, v)
                   case None => spark.conf.unset(key) }
    }
  }
}
