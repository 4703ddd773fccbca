package graft.jobs

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.frontier.RoundState
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** The reference's monitoring HTTP surface (`dashboard/dashboard_server.py`
  * serves `dashboard.html` + JSON endpoints over the MySQL tables) as a
  * zero-dependency JDK HttpServer over a crawl state dir — the same report
  * queries InspectMain exposes as a CLI.
  *
  * Endpoints (all JSON):
  *   GET /api/health      platform health rollup (A1)
  *   GET /api/alerts      validation-failure alarms (A2)
  *   GET /api/missing     per-column missing-rate audit (A3)
  *   GET /api/counts      jobs+companies by platform (A4)
  *   GET /api/rounds      committed round manifests
  *   GET /                tiny inline dashboard page
  *
  * Serving is driver-side by design: each endpoint is a small AGGREGATED
  * frame (per-platform rows), so the collect is bounded by platform count,
  * never corpus size. Start via [[DashboardServer.main]] or [[start]].
  */
object DashboardServer {

  /** DataFrame -> JSON array of objects (driver-side; aggregated frames). */
  private[jobs] def toJson(df: DataFrame): String = {
    val cols = df.columns
    df.collect().map { row =>
      cols.indices.map { i =>
        val v = row.get(i) match {
          case null => "null"
          case b: Boolean => b.toString
          case n: java.lang.Number => n.toString
          case other => graft.extract.Json.dumps(graft.extract.Json.JStr(other.toString))
        }
        graft.extract.Json.dumps(graft.extract.Json.JStr(cols(i))) + ":" + v
      }.mkString("{", ",", "}")
    }.mkString("[", ",", "]")
  }

  private val page =
    """<!doctype html><title>graft crawl dashboard</title>
      |<h1>graft crawl dashboard</h1>
      |<ul><li><a href="/api/health">health</a></li>
      |<li><a href="/api/alerts">alerts</a></li>
      |<li><a href="/api/missing">missing rates</a></li>
      |<li><a href="/api/counts">counts</a></li>
      |<li><a href="/api/rounds">rounds</a></li></ul>""".stripMargin

  /** Start serving `stateDir` on `port` (0 = ephemeral); returns the server
    * (caller stops it).
    */
  def start(spark: SparkSession, stateDir: String, port: Int): HttpServer = {
    val state = new RoundState(spark, stateDir)
    val server = HttpServer.create(new InetSocketAddress(port), 0)

    def reply(ex: HttpExchange, status: Int, body: String, mime: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", s"$mime; charset=utf-8")
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
    def json(path: String)(body: => String): Unit =
      server.createContext(path, new HttpHandler {
        override def handle(ex: HttpExchange): Unit =
          try reply(ex, 200, body, "application/json")
          catch { case e: Throwable =>
            reply(ex, 500, s"""{"error":${graft.extract.Json.dumps(
              graft.extract.Json.JStr(String.valueOf(e.getMessage)))}}""",
              "application/json")
          }
      })

    json("/api/health") {
      toJson(Reports.platformHealth(state.readCommitted("metrics").get).orderBy("platform"))
    }
    json("/api/alerts") {
      toJson(Reports.validationAlerts(Compaction.currentJobs(state).get))
    }
    json("/api/missing") {
      toJson(Reports.missingRates(Compaction.currentJobs(state).get))
    }
    json("/api/counts") {
      val jobs = toJson(Reports.countsByPlatform(Compaction.currentJobs(state).get))
      val comps = toJson(Reports.countsByPlatform(Compaction.currentCompanies(state).get))
      s"""{"jobs":$jobs,"companies":$comps}"""
    }
    json("/api/rounds") {
      state.committedRounds.map { r =>
        val m = state.readManifest(r).getOrElse(Map.empty)
        m.map { case (k, v) =>
          val num = v.nonEmpty && v.forall(c => c.isDigit || c == '.' || c == '-')
          s""""$k":${if (num) v else "\"" + v + "\""}"""
        }.mkString("{", ",", "}")
      }.mkString("[", ",", "]")
    }
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = reply(ex, 200, page, "text/html")
    })
    server.start()
    server
  }

  /** spark-submit entry: DashboardServer <stateDir> [port]. */
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DashboardServer <stateDir> [port=8080]")
    val port = if (args.length > 1) args(1).toInt else 8080
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val builder0 = SparkSession.builder().appName("graft-dashboard")
    val spark = (if (sys.props.contains("spark.master")) builder0
                 else builder0.master(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val server = start(spark, args(0), port)
    println(s"dashboard serving ${args(0)} on port ${server.getAddress.getPort}")
    Thread.currentThread().join() // serve until killed
  }
}
