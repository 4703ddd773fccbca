package graft.jobs

import graft.frontier.RoundState
import graft.synth.PagesGen
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

/** The dashboard HTTP surface serves the same report queries as the CLI. */
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
    CrawlRound.run(spark, pages, seeds, policy, new RoundState(spark, stateDir), 0, 60.0)

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
      val counts = Json.parse(get("/api/counts")).asInstanceOf[Json.JObj]
      assert(counts.get("jobs").exists(Json.truthy) && counts.get("companies").exists(Json.truthy))
      val rounds = Json.parse(get("/api/rounds")).asInstanceOf[Json.JArr]
      assert(rounds.items.size == 1)
      assert(Json.parse(get("/api/missing")).isInstanceOf[Json.JArr])
      assert(Json.parse(get("/api/alerts")).isInstanceOf[Json.JArr])
      assert(get("/").contains("dashboard"))
    } finally server.stop(0)
  }
}
