package graft.jobs

import graft.frontier.RoundState
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CLI for the monitoring/inspection surface — the rebuild's analog of the
  * reference's `inspect_data.py` subcommands and the dashboard endpoints
  * (`dashboard/dashboard_server.py`), run against a crawl state dir.
  *
  * Usage:
  *   runMain graft.jobs.InspectMain <stateDir> <cmd> [args]
  *   cmd ∈ health | alerts | missing | counts | jobs | companies |
  *         quarantine | rounds | geo <cacheDir> | export <outDir> |
  *         bootstrap <warehouseDir> | publish <warehouseDir> |
  *         checkpoint <table...> | vacuum <table...>
  *
  * `jobs` / `companies` show the MERGE-compacted current view (S5 read
  * path): latest row per (platform, source_id) with IFNULL guards.
  */
object InspectMain {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: InspectMain <stateDir> <cmd> [args]")
    val stateDir = args(0)
    val cmd = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val builder0 = SparkSession.builder().appName("graft-inspect")
    val spark = (if (sys.props.contains("spark.master")) builder0
                 else builder0.master(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val state = new RoundState(spark, stateDir)
    def table(name: String): DataFrame = state.readCommitted(name).getOrElse {
      sys.error(s"state table '$name' has no committed rounds under $stateDir")
    }
    def show(df: DataFrame, n: Int = 50): Unit = df.show(n, truncate = false)

    cmd match {
      case "health" => show(Reports.platformHealth(table("metrics")).orderBy("platform"))
      case "alerts" => show(Reports.validationAlerts(Compaction.currentJobs(state).get))
      case "missing" => show(Reports.missingRates(Compaction.currentJobs(state).get))
      case "counts" =>
        println("jobs:"); show(Reports.countsByPlatform(Compaction.currentJobs(state).get))
        println("companies:"); show(Reports.countsByPlatform(Compaction.currentCompanies(state).get))
      case "jobs" => show(Compaction.currentJobs(state).get
        .select("platform", "source_id", "title", "salary_text", "posted_at", "is_valid"))
      case "companies" => show(Compaction.currentCompanies(state).get
        .select("platform", "source_id", "name", "capital", "employee_count"))
      case "quarantine" => show(table("quarantine"))
      case "rounds" =>
        state.committedRounds.foreach { r =>
          println(s"round $r: ${state.readManifest(r).getOrElse(Map.empty)}")
        }
      case "geo" =>
        // J7: enrich current jobs against a geocode cache; report hit/miss
        // and write the miss queue for the external geocoder. P8: the due
        // batch honors the reference's 1-QPS Nominatim budget over the
        // window (geocoder.py:166-171); the rest defer to the next window.
        val cacheDir = args(2)
        val windowS = if (args.length > 3) args(3).toDouble else 600.0
        val cache = spark.read.parquet(cacheDir)
        val enriched = graft.enrich.Geo.enrich(
          Compaction.currentJobs(state).get.filter(col("address").isNotNull), cache)
        val hits = enriched.filter(col("geo_lat").isNotNull).count()
        val misses = graft.enrich.Geo.misses(enriched)
        val nMiss = misses.count()
        val (due, deferred) = graft.enrich.Geo.throttleMisses(misses, 1.0, windowS)
        due.write.mode("overwrite").parquet(s"$stateDir/geo_miss_queue")
        deferred.write.mode("overwrite").parquet(s"$stateDir/geo_miss_deferred")
        val nDef = deferred.count()
        println(s"""{"geo_hits":$hits,"geo_misses":$nMiss,"due":${nMiss - nDef},""" +
          s""""deferred":$nDef,"queue":"$stateDir/geo_miss_queue"}""")
      case "export" =>
        val outDir = args(2)
        new java.io.File(outDir).mkdirs()
        Export.toCsv(Compaction.currentCompanies(state).get, s"$outDir/tb_companies.csv")
        Export.toJson(Compaction.currentJobs(state).get, s"$outDir/tb_jobs_json")
        println(s"exported to $outDir")
      case "checkpoint" =>
        // fold round deltas into a base snapshot (manifest compaction)
        args.drop(2).foreach { t =>
          println(s"$t -> base ${state.checkpointTable(t)}")
        }
      case "vacuum" =>
        args.drop(2).foreach { t => state.vacuumTable(t); println(s"$t vacuumed") }
      case "bootstrap" =>
        // S8 DDL auto-sync (database.py:336-383): register every table
        graft.schema.Schemas.ensureTables(spark, args(2))
        spark.sql("SHOW TABLES").show(50, truncate = false)
      case "publish" =>
        // S8: bootstrap + overwrite catalog tables with the compacted views
        Compaction.publish(spark, state, args(2))
        println("jobs by platform (from catalog):")
        show(Reports.countsByPlatform(spark.table("tb_jobs")))
      case other => sys.error(s"unknown cmd '$other'")
    }
    spark.stop()
  }
}
