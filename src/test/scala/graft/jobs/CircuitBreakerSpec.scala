package graft.jobs

import graft.frontier.RoundState
import graft.synth.PagesGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** P7 circuit breaker (circuit_breaker.py as batch rounds) and P8 geocoder
  * QPS throttle (geocoder.py:166-171 as a per-window budget).
  */
class CircuitBreakerSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-breaker-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("breaker trips at the failure threshold and cools for the recovery window") {
    val spark2 = spark
    import spark2.implicits._
    val metrics = Seq(
      ("www.104.com.tw", 6L),  // >= 5 failures -> OPEN
      ("www.cake.me", 5L),     // == threshold -> OPEN (circuit_breaker.py: >=)
      ("www.yourator.co", 4L), // below -> CLOSED
      ("www.1111.com.tw", 0L))
      .toDF("host", "rate_limited")
    // roundSeconds 30 -> ceil(60/30) = 2 cooldown rounds after round 3
    val trips = CircuitBreaker.trips(metrics, round = 3, roundSeconds = 30.0)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(trips == Map("www.104.com.tw" -> 6, "www.cake.me" -> 6))
    // excluded while round < until_round: rounds 4 and 5; half-open at 6
    assert(trips("www.104.com.tw") == 3 + 1 + 2)
  }

  test("a tripped host is parked by the crawl and half-opens after expiry") {
    val spark2 = spark
    import spark2.implicits._
    val dir = Files.createTempDirectory("graft_breaker_").toString
    val state = new RoundState(spark, dir)
    val pages = PagesGen.pages(spark, 1200L).toDF()
    val seeds = PagesGen.seedUrls(spark, 1200L).toDF()
    val policy = PagesGen.hostPolicy(spark).toDF()
    // round 0 committed with metrics showing the mega-host rate-limited:
    // the breaker entry the engine would have written
    val m = Seq(("platform_104", "www.104.com.tw", 9L))
      .toDF("platform", "host", "rate_limited")
    state.writeDelta("metrics", 0,
      m.withColumn("total_requests", lit(9L))
        .withColumn("success_requests", lit(0L))
        .withColumn("extraction_success", lit(0L))
        .withColumn("extraction_failure", lit(9L))
        .withColumn("avg_latency_ms", lit(1.0))
        .withColumn("invalid_jobs", lit(0L))
        .withColumn("round", lit(0)))
    state.writeDelta("cooling", 0, CircuitBreaker.trips(m, 0, 60.0))
    state.commit(0, Map("round" -> 0, "seen_total" -> 0L))
    var round = 1
    var continue = true
    while (continue && round < 12) {
      val st = CrawlRound.run(spark, pages, seeds, policy, state, round, 60.0)
      if (st.frontier == 0) continue = false
      round += 1
    }
    val ord = state.readCommitted("ordering").get.cache()
    val until = 0 + 1 + 1 // trips at round 0, cooldown ceil(60/60)=1 -> until_round 2
    assert(ord.filter(col("host") === "www.104.com.tw" && col("round") < until).isEmpty,
      "tripped host scheduled while the breaker was OPEN")
    assert(ord.filter(col("host") === "www.104.com.tw" && col("round") >= until).count() > 0,
      "breaker never half-opened")
    ord.unpersist()
  }

  test("engine rounds write breaker deltas (empty when no 429s)") {
    val dir = Files.createTempDirectory("graft_breaker2_").toString
    val state = new RoundState(spark, dir)
    val pages = PagesGen.pages(spark, 600L).toDF()
    CrawlRound.run(spark, pages, PagesGen.seedUrls(spark, 600L).toDF(),
      PagesGen.hostPolicy(spark).toDF(), state, 0, 60.0)
    // static pages table -> no rate limits -> breaker writes an empty delta
    assert(state.readCommitted("cooling").get.isEmpty)
  }

  test("P8: miss queue honors the per-window QPS budget deterministically") {
    val spark2 = spark
    import spark2.implicits._
    val misses = (1 to 50).map(i => f"addr_$i%03d").toDF("geo_query")
    val (due, deferred) = graft.enrich.Geo.throttleMisses(misses, qps = 1.0,
      windowSeconds = 10.0)
    assert(due.count() == 10 && deferred.count() == 40)
    // deterministic head of the queue: stable retry order across windows
    assert(due.collect().map(_.getString(0)).sorted.sameElements(
      (1 to 10).map(i => f"addr_$i%03d")))
    // no loss: due + deferred partition the queue
    assert(due.unionByName(deferred).distinct().count() == 50)
  }
}
