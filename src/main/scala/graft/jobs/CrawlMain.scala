package graft.jobs

import graft.frontier.RoundState
import graft.synth.PagesGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** spark-submit entry point: run the full frontier → fetch → extract pipeline
  * over the synthetic Common-Crawl-style corpus (or a pre-written pages dir),
  * with checkpoint/resume via the round-manifest state.
  *
  * Usage (all flags optional):
  *   runMain graft.jobs.CrawlMain --pages 50000 --state /tmp/crawl_state \
  *     --rounds 10 --roundSeconds 600 --cpus 8 [--pagesDir DIR] [--seed 42]
  *
  * Prints one JSON line with totals and urls/sec (the BASELINE.json metric).
  */
object CrawlMain {

  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val nPages = opts.getOrElse("--pages", "20000").toLong
    val stateDir = opts.getOrElse("--state", "/tmp/graft_crawl_state")
    val maxRounds = opts.getOrElse("--rounds", "10").toInt
    val roundSeconds = opts.getOrElse("--roundSeconds", "600").toDouble
    val cpus = opts.getOrElse("--cpus", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val seed = opts.getOrElse("--seed", "42").toLong
    val pagesDir = opts.get("--pagesDir")
    // fold delta tables into a checkpoint base every K rounds (0 = off):
    // bounds reader dir-listing at O(K) instead of O(rounds) on long crawls
    val checkpointEvery = opts.getOrElse("--checkpointEvery", "0").toInt
    // seen-filter shard count for NEW states (resumed states keep the count
    // in their manifest). Size >= cluster cores: probe/build parallelism is
    // bounded by it — a 1000-executor deployment wants thousands.
    val seenShards = opts.getOrElse("--seenShards",
      graft.frontier.ShardedSeen.DefaultShards.toString).toInt

    // respect an externally supplied master (spark-submit --master
    // local-cluster[N,C,M] / a real cluster); default to local[cpus]
    val builder0 = SparkSession.builder().appName("graft-crawl")
    val spark = (if (sys.props.contains("spark.master")) builder0
                 else builder0.master(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val t0 = System.nanoTime()
    val pages = pagesDir match {
      case Some(dir) => spark.read.parquet(dir)
      case None => PagesGen.pages(spark, nPages, seed).toDF()
    }
    val seeds = PagesGen.seedUrls(spark, nPages, seed).toDF()
    val policy = PagesGen.hostPolicy(spark).toDF()
    val state = new RoundState(spark, stateDir)

    var totalScheduled = 0L
    var totalExtracted = 0L
    var round = state.nextRound
    var continue = true
    val roundStats = scala.collection.mutable.ListBuffer.empty[CrawlRound.RoundStats]
    // bloom capacity: constant per state; sized to the expected seen total
    val bloomCapacity = math.max(nPages * 2, 1000000L)
    while (continue && round < maxRounds) {
      val st = CrawlRound.run(spark, pages, seeds, policy, state, round, roundSeconds,
        bloomCapacity = bloomCapacity, nShards = seenShards)
      roundStats += st
      totalScheduled += st.scheduled
      totalExtracted += st.extracted
      if (st.frontier == 0) continue = false
      round += 1
      if (checkpointEvery > 0 && round % checkpointEvery == 0)
        Seq("seen", "crawled", "discovered", "metrics", "cooling")
          .foreach(state.checkpointTable)
    }
    val wallSec = (System.nanoTime() - t0) / 1e9
    val urlsPerSec = if (wallSec > 0) totalScheduled / wallSec else 0.0

    val roundsJson = roundStats.map(s =>
      s"""{"round":${s.round},"frontier":${s.frontier},"scheduled":${s.scheduled},""" +
      s""""fetched":${s.fetched},"extracted":${s.extracted},"jobs":${s.jobs},""" +
      // Locale.ROOT: the f-interpolator is default-locale-sensitive (de_DE
      // renders "28,9" — invalid JSON; round-5 ADVICE)
      s""""companies":${s.companies},"wall_sec":${String.format(java.util.Locale.ROOT, "%.1f", Double.box(s.wallSec))}}""")
      .mkString("[", ",", "]")
    println(
      s"""{"metric":"urls_scheduled_extracted_per_sec","value":$urlsPerSec,""" +
      s""""unit":"urls/sec","wall_sec":$wallSec,"pages":$nPages,"cpus":"$cpus",""" +
      s""""scheduled":$totalScheduled,"extracted":$totalExtracted,"rounds":$roundsJson}""")
    spark.stop()
  }
}
