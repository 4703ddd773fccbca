package graft.jobs

import graft.frontier.RoundState
import graft.synth.PagesGen
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

/** The dashboard HTTP surface serves the same report queries as the CLI,
  * with the reference's /api/stats and /api/jobs endpoints
  * (dashboard_server.py:32-99), per-round response caching, and ?asOf
  * time travel.
  */
class DashboardSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-dash-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("dashboard endpoints serve parseable JSON views of the crawl state") {
    val stateDir = Files.createTempDirectory("graft_dash_").toString
    val pages = PagesGen.pages(spark, 600L).toDF()
    val seeds = PagesGen.seedUrls(spark, 600L).toDF()
    val policy = PagesGen.hostPolicy(spark).toDF()
    val state = new RoundState(spark, stateDir)
    CrawlRound.run(spark, pages, seeds, policy, state, 0, 60.0)
    CrawlRound.run(spark, pages, seeds, policy, state, 1, 60.0)
    state.checkpointTable("metrics")

    val server = DashboardServer.start(spark, stateDir, 0)
    try {
      val port = server.getAddress.getPort
      val client = HttpClient.newHttpClient()
      def get(path: String): String = {
        val resp = client.send(
          HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
          HttpResponse.BodyHandlers.ofString())
        assert(resp.statusCode() == 200, s"$path -> ${resp.statusCode()}: ${resp.body().take(200)}")
        resp.body()
      }
      import graft.extract.Json
      val health = Json.parse(get("/api/health")).asInstanceOf[Json.JArr]
      assert(health.items.nonEmpty)
      val first = health.items.head.asInstanceOf[Json.JObj]
      assert(first.has("platform") && first.has("total_requests"))
      // the reference's lamp column (dashboard_server.py:70-80)
      assert(first.get("status").collect { case Json.JStr(s) => s }
        .exists(Set("green", "yellow", "red", "gray")))
      val counts = Json.parse(get("/api/counts")).asInstanceOf[Json.JObj]
      assert(counts.get("jobs").exists(Json.truthy) && counts.get("companies").exists(Json.truthy))

      // /api/stats: system rollup (dashboard_server.py:32-60)
      val stats = Json.parse(get("/api/stats")).asInstanceOf[Json.JObj]
      val jobCount = stats.get("job_count").collect { case Json.JInt(v) => v.toLong }.get
      assert(jobCount > 0)
      assert(stats.get("company_count").collect { case Json.JInt(v) => v.toLong }.exists(_ > 0))
      assert(stats.has("geo_coverage"))
      val layers = stats.get("layers").get.asInstanceOf[Json.JObj]
      assert(layers.entries.nonEmpty)

      // /api/jobs: recency-ordered sample, bounded by limit
      val jobs = Json.parse(get("/api/jobs?limit=7")).asInstanceOf[Json.JArr]
      assert(jobs.items.size == 7)
      val job0 = jobs.items.head.asInstanceOf[Json.JObj]
      assert(job0.has("title") && job0.has("url") && job0.has("updated_round"))
      // recency: every returned row is from the newest rounds first
      val updRounds = jobs.items.map(_.asInstanceOf[Json.JObj]
        .get("updated_round").collect { case Json.JInt(v) => v.toInt }.get)
      assert(updRounds == updRounds.sorted.reverse)

      // /api/rounds: manifests + checkpoint bases, real JSON
      val rounds = Json.parse(get("/api/rounds")).asInstanceOf[Json.JObj]
      assert(rounds.get("rounds").get.asInstanceOf[Json.JArr].items.size == 2)
      val bases = rounds.get("checkpoint_bases").get.asInstanceOf[Json.JObj]
      assert(bases.get("metrics").collect { case Json.JInt(v) => v.toInt }.contains(1))

      // ?asOf=0 time travel: the round-0 view has fewer-or-equal jobs and
      // only round-0 manifest data behind it
      val statsAsOf = Json.parse(get("/api/stats?asOf=0")).asInstanceOf[Json.JObj]
      val jobCount0 = statsAsOf.get("job_count").collect { case Json.JInt(v) => v.toLong }.get
      assert(jobCount0 > 0 && jobCount0 <= jobCount)
      val jobsAsOf = Json.parse(get("/api/jobs?limit=5&asOf=0")).asInstanceOf[Json.JArr]
      assert(jobsAsOf.items.forall(_.asInstanceOf[Json.JObj]
        .get("updated_round").collect { case Json.JInt(v) => v.toInt }.contains(0)))

      // response caching: identical request at an unchanged state round is
      // served byte-identically (and without recomputing — same cache hit)
      assert(get("/api/stats") == get("/api/stats"))

      assert(Json.parse(get("/api/missing")).isInstanceOf[Json.JArr])
      assert(Json.parse(get("/api/alerts")).isInstanceOf[Json.JArr])
      // the monitoring page (reference dashboard.html parity): stat tiles,
      // tabbed tables, search filter, periodic refresh; served at both paths
      val html = get("/")
      assert(html.contains("graft crawl dashboard"))
      for (frag <- Seq("t-jobs", "t-comps", "t-geo", "t-layers", // stat tiles
                       "b-health", "b-rounds",                   // tabs
                       "filter rows", "setInterval(refresh",     // search + refresh
                       "/api/stats", "/api/jobs?limit=50", "/api/health"))
        assert(html.contains(frag), s"page missing $frag")
      assert(get("/dashboard") == html)
    } finally server.stop(0)
  }
}
