package graft.jobs

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.extract.Json
import graft.frontier.RoundState
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** The reference's monitoring HTTP surface (`dashboard/dashboard_server.py`
  * serves `dashboard.html` + JSON endpoints over the MySQL tables) as a
  * zero-dependency JDK HttpServer over a crawl state dir — the same report
  * queries InspectMain exposes as a CLI.
  *
  * Endpoints (all JSON; `?asOf=K` time-travels any data endpoint to the
  * state as of committed round K — readAsOf over the round manifests):
  *   GET /api/stats           system rollup: job/company counts, geo
  *                            coverage %, data_source_layer distribution
  *                            (dashboard_server.py:32-60)
  *   GET /api/health          platform health rollup (A1) + the reference's
  *                            green/yellow/red/gray lamp
  *                            (dashboard_server.py:70-80)
  *   GET /api/jobs?limit=N    most recently upserted jobs
  *                            (dashboard_server.py:90-99; recency = the
  *                            compacted row's last update round)
  *   GET /api/alerts          validation-failure alarms (A2)
  *   GET /api/missing         per-column missing-rate audit (A3)
  *   GET /api/counts          jobs+companies by platform (A4)
  *   GET /api/rounds          committed round manifests + checkpoint bases
  *   GET /                    tiny inline dashboard page
  *
  * Serving is driver-side by design: each endpoint is a small AGGREGATED
  * frame (per-platform rows, or a LIMITed sample), so the collect is
  * bounded, never corpus-sized. Responses are cached keyed by (request URI,
  * latest committed round) — MERGE-at-read compaction runs once per round
  * per distinct request, not per hit (round-3 advice); a new commit
  * invalidates the whole cache. Start via [[DashboardServer.main]] or
  * [[start]].
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
          case other => Json.dumps(Json.JStr(other.toString))
        }
        Json.dumps(Json.JStr(cols(i))) + ":" + v
      }.mkString("{", ",", "}")
    }.mkString("[", ",", "]")
  }

  /** JSON number grammar — manifest values matching it are emitted raw,
    * everything else (including "-", "1-2", "007", "NaN") goes through
    * [[Json.dumps]] as an escaped string.
    */
  private val JsonNumber = "-?(0|[1-9][0-9]*)(\\.[0-9]+)?([eE][+-]?[0-9]+)?".r

  /** The monitoring page (dashboard/dashboard.html in the reference: stat
    * tiles over /api/stats, tabbed jobs/health tables, a search filter and
    * periodic refresh — re-implemented from scratch, self-contained, no CDN
    * assets). Same data surface, plus a Rounds tab over the manifest log
    * that the reference keeps CLI-only.
    */
  private val page =
    """<!doctype html><html><head><meta charset="utf-8">
      |<title>graft crawl dashboard</title>
      |<style>
      | body{font-family:system-ui,sans-serif;margin:0;background:#f4f5f7;color:#1d2733}
      | header{background:#1d2733;color:#fff;padding:14px 24px;font-size:20px}
      | .tiles{display:flex;gap:14px;padding:18px 24px;flex-wrap:wrap}
      | .tile{background:#fff;border-radius:8px;padding:14px 20px;min-width:150px;
      |   box-shadow:0 1px 3px rgba(0,0,0,.12)}
      | .tile .v{font-size:26px;font-weight:700}.tile .l{font-size:12px;color:#667}
      | nav{padding:0 24px}nav button{border:0;background:none;padding:10px 14px;
      |   cursor:pointer;font-size:14px;border-bottom:2px solid transparent}
      | nav button.on{border-color:#2563eb;color:#2563eb;font-weight:600}
      | #q{margin:10px 24px;padding:8px;width:320px;border:1px solid #ccd;border-radius:6px}
      | table{border-collapse:collapse;margin:4px 24px 40px;background:#fff;width:calc(100% - 48px)}
      | th,td{padding:6px 10px;border-bottom:1px solid #e5e8ee;font-size:13px;text-align:left}
      | th{background:#eef1f6;position:sticky;top:0}
      | .lamp{display:inline-block;width:10px;height:10px;border-radius:50%}
      | .green{background:#16a34a}.yellow{background:#eab308}.red{background:#dc2626}
      | .gray{background:#9ca3af}
      |</style></head><body>
      |<header>graft crawl dashboard</header>
      |<div class="tiles">
      | <div class="tile"><div class="v" id="t-jobs">–</div><div class="l">jobs</div></div>
      | <div class="tile"><div class="v" id="t-comps">–</div><div class="l">companies</div></div>
      | <div class="tile"><div class="v" id="t-geo">–</div><div class="l">geo coverage %</div></div>
      | <div class="tile"><div class="v" id="t-layers">–</div><div class="l">data source layers</div></div>
      |</div>
      |<nav>
      | <button id="b-jobs" class="on" onclick="show('jobs')">Jobs</button>
      | <button id="b-health" onclick="show('health')">Health</button>
      | <button id="b-rounds" onclick="show('rounds')">Rounds</button>
      | <a href="/api/alerts" style="font-size:12px;margin-left:14px">alerts</a>
      | <a href="/api/missing" style="font-size:12px;margin-left:8px">missing</a>
      | <a href="/api/counts" style="font-size:12px;margin-left:8px">counts</a>
      |</nav>
      |<input id="q" placeholder="filter rows…" oninput="render()">
      |<table><thead><tr id="head"></tr></thead><tbody id="body"></tbody></table>
      |<script>
      |let tab='jobs', data={jobs:[],health:[],rounds:[]};
      |const esc=s=>String(s==null?'':s).replace(/[&<>"]/g,
      |  c=>({'&':'&amp;','<':'&lt;','>':'&gt;','"':'&quot;'}[c]));
      |function show(t){tab=t;for(const x of ['jobs','health','rounds'])
      |  document.getElementById('b-'+x).className=x===t?'on':'';render()}
      |function render(){
      |  const rows=data[tab]||[], q=document.getElementById('q').value.toLowerCase();
      |  const kept=q?rows.filter(r=>JSON.stringify(r).toLowerCase().includes(q)):rows;
      |  const cols=kept.length?Object.keys(kept[0]):[];
      |  document.getElementById('head').innerHTML=cols.map(c=>'<th>'+esc(c)+'</th>').join('');
      |  document.getElementById('body').innerHTML=kept.map(r=>'<tr>'+cols.map(c=>{
      |    if(c==='status')return '<td><span class="lamp '+esc(r[c])+'"></span> '+esc(r[c])+'</td>';
      |    return '<td>'+esc(r[c])+'</td>';}).join('')+'</tr>').join('');
      |}
      |async function refresh(){
      |  try{
      |    const [stats,jobs,health,rounds]=await Promise.all([
      |      fetch('/api/stats').then(r=>r.json()),
      |      fetch('/api/jobs?limit=50').then(r=>r.json()),
      |      fetch('/api/health').then(r=>r.json()),
      |      fetch('/api/rounds').then(r=>r.json())]);
      |    document.getElementById('t-jobs').textContent=stats.job_count;
      |    document.getElementById('t-comps').textContent=stats.company_count;
      |    document.getElementById('t-geo').textContent=stats.geo_coverage;
      |    document.getElementById('t-layers').textContent=
      |      Object.entries(stats.layers||{}).map(([k,v])=>k+':'+v).join(' / ')||'–';
      |    data={jobs:jobs,health:health,rounds:rounds.rounds};
      |    render();
      |  }catch(e){console.error(e)}
      |}
      |refresh();setInterval(refresh,30000);
      |</script></body></html>""".stripMargin

  /** Start serving `stateDir` on `port` (0 = ephemeral); returns the server
    * (caller stops it).
    */
  def start(spark: SparkSession, stateDir: String, port: Int): HttpServer = {
    val state = new RoundState(spark, stateDir)
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    // Response cache, swapped WHOLE per committed round: entries computed
    // against round K can never leak into round K+1's map (atomic
    // invalidation even under a future thread-pool executor), and the
    // per-round map is size-capped so arbitrary ?limit=/asOf= URIs cannot
    // grow it without bound. Bodies compute OUTSIDE the map (no Spark jobs
    // under a CHM bin lock); a racing duplicate compute is idempotent.
    val MaxCacheEntries = 256
    val cacheRef = new java.util.concurrent.atomic.AtomicReference[
      (Int, java.util.concurrent.ConcurrentHashMap[String, String])](
      (Int.MinValue, new java.util.concurrent.ConcurrentHashMap[String, String]()))

    def reply(ex: HttpExchange, status: Int, body: String, mime: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", s"$mime; charset=utf-8")
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
    def params(ex: HttpExchange): Map[String, String] =
      Option(ex.getRequestURI.getQuery).toSeq
        .flatMap(_.split("&"))
        .flatMap { kv =>
          kv.split("=", 2) match {
            case Array(k, v) => Some(k -> v)
            case _ => None
          }
        }.toMap
    def json(path: String)(body: Map[String, String] => String): Unit =
      server.createContext(path, new HttpHandler {
        override def handle(ex: HttpExchange): Unit =
          try {
            // re-list the round log per request (the crawler is a separate
            // writer — the server's RoundState memo must not go stale), then
            // serve every state read in this request from that one epoch
            state.refresh()
            val latest = state.committedRounds.lastOption.getOrElse(-1)
            val (_, cache) = cacheRef.updateAndGet {
              case t @ (r, _) if r == latest => t
              case _ => (latest, new java.util.concurrent.ConcurrentHashMap[String, String]())
            }
            val uri = ex.getRequestURI.toString
            val resp = Option(cache.get(uri)).getOrElse {
              val b = body(params(ex))
              if (cache.size < MaxCacheEntries) cache.put(uri, b)
              b
            }
            reply(ex, 200, resp, "application/json")
          } catch { case e: Throwable =>
            reply(ex, 500, s"""{"error":${Json.dumps(
              Json.JStr(String.valueOf(e.getMessage)))}}""",
              "application/json")
          }
      })

    def asOfOf(q: Map[String, String]): Option[Int] = q.get("asOf").flatMap(_.toIntOption)
    def delta(table: String, asOf: Option[Int]): Option[DataFrame] = asOf match {
      case Some(r) => state.readAsOf(table, r)
      case None => state.readCommitted(table)
    }

    json("/api/stats") { q =>
      val asOf = asOfOf(q)
      val comps = Compaction.currentCompanies(state, asOf)
      val jobCount = Compaction.currentJobs(state, asOf).map(_.count()).getOrElse(0L)
      val compCount = comps.map(_.count()).getOrElse(0L)
      // geo coverage: jobs with a resolved location (distinct per job key —
      // append-only deltas re-emit a re-crawled job's location each round)
      val locCount = delta("out_locations", asOf)
        .map(_.select("platform", "job_source_id").distinct().count()).getOrElse(0L)
      val geo = if (jobCount > 0) math.round(locCount * 1000.0 / jobCount) / 10.0 else 0.0
      val layers = comps.map(_.groupBy("data_source_layer").agg(count(lit(1)).as("n"))
          .orderBy("data_source_layer").collect()
          .map(r => s"${Json.dumps(Json.JStr(r.getString(0)))}:${r.getLong(1)}")
          .mkString("{", ",", "}"))
        .getOrElse("{}")
      s"""{"job_count":$jobCount,"company_count":$compCount,""" +
        s""""geo_coverage":$geo,"layers":$layers}"""
    }
    json("/api/health") { q =>
      val health = Reports.platformHealth(delta("metrics", asOfOf(q)).get)
      val ratio = col("success_requests").cast("double") / col("total_requests")
      toJson(health.withColumn("status",
          when(col("total_requests") <= 0, "gray")
            .when(ratio >= 0.9, "green")
            .when(ratio >= 0.7, "yellow")
            .otherwise("red"))
        .orderBy("platform"))
    }
    json("/api/jobs") { q =>
      val limit = q.get("limit").flatMap(_.toIntOption).getOrElse(50)
      Compaction.currentJobsWithRound(state, asOfOf(q)) match {
        case Some(jobs) => toJson(jobs.orderBy(col("updated_round").desc,
          col("posted_at").desc_nulls_last, col("platform"), col("source_id"))
          .limit(limit))
        case None => "[]"
      }
    }
    json("/api/alerts") { q =>
      toJson(Reports.validationAlerts(Compaction.currentJobs(state, asOfOf(q)).get))
    }
    json("/api/missing") { q =>
      toJson(Reports.missingRates(Compaction.currentJobs(state, asOfOf(q)).get))
    }
    json("/api/counts") { q =>
      val asOf = asOfOf(q)
      val jobs = toJson(Reports.countsByPlatform(Compaction.currentJobs(state, asOf).get))
      val comps = toJson(Reports.countsByPlatform(Compaction.currentCompanies(state, asOf).get))
      s"""{"jobs":$jobs,"companies":$comps}"""
    }
    json("/api/rounds") { _ =>
      val rounds = state.committedRounds.map { r =>
        val m = state.readManifest(r).getOrElse(Map.empty)
        m.map { case (k, v) =>
          val vs = if (JsonNumber.matches(v)) v else Json.dumps(Json.JStr(v))
          s"${Json.dumps(Json.JStr(k))}:$vs"
        }.mkString("{", ",", "}")
      }.mkString("[", ",", "]")
      val bases = state.checkpointedTables.toSeq.sortBy(_._1)
        .map { case (t, b) => s"${Json.dumps(Json.JStr(t))}:$b" }
        .mkString("{", ",", "}")
      s"""{"rounds":$rounds,"checkpoint_bases":$bases}"""
    }
    // the page serves at / and /dashboard (dashboard_server.py:101-115)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = reply(ex, 200, page, "text/html")
    })
    server.createContext("/dashboard", new HttpHandler {
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
