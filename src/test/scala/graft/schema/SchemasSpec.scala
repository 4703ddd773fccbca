package graft.schema

import graft.frontier.RoundState
import graft.jobs.{Compaction, CrawlRound}
import graft.synth.PagesGen
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** S8 DDL auto-sync (database.py:336-383): fresh-warehouse bootstrap,
  * idempotency, and the publish path into catalog tables.
  */
class SchemasSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-schema-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val expectedTables = Seq("pages", "tb_categories", "tb_jobs",
    "tb_companies", "tb_job_locations", "tb_job_skills_extracted",
    "tb_categories_jobs", "tb_platform_health")

  test("ensureTables bootstraps a fresh warehouse and is idempotent") {
    val wh = Files.createTempDirectory("graft_wh_").toString
    Schemas.ensureTables(spark, wh)
    expectedTables.foreach { t =>
      assert(spark.catalog.tableExists(t), s"table $t not registered")
    }
    // second boot (the reference syncs DDL on every service start) is a no-op
    Schemas.ensureTables(spark, wh)
    // index analog recorded: tb_jobs carries its write-time sort order
    assert(Schemas.indexColsOf(spark, "tb_jobs") ==
      Seq("source_id", "posted_at", "region", "job_type"))
    // partitioned tables really are partitioned by platform
    val jobsPartCols = spark.catalog.listColumns("tb_jobs")
      .filter("isPartition").collect().map(_.name).toSeq
    assert(jobsPartCols == Seq("platform"))
  }

  test("publish writes compacted current views into catalog tables") {
    val wh = Files.createTempDirectory("graft_wh_").toString
    val stateDir = Files.createTempDirectory("graft_wh_state_").toString
    val pages = PagesGen.pages(spark, 800L).toDF()
    val seeds = PagesGen.seedUrls(spark, 800L).toDF()
    val policy = PagesGen.hostPolicy(spark).toDF()
    val state = new RoundState(spark, stateDir)
    CrawlRound.run(spark, pages, seeds, policy, state, 0, 60.0)
    Compaction.publish(spark, state, wh)
    val fromCatalog = spark.table("tb_jobs")
    val expected = Compaction.currentJobs(state).get
    assert(fromCatalog.count() == expected.count() && expected.count() > 0)
    // a platform predicate prunes to that partition's files only
    val pruned = fromCatalog.filter(org.apache.spark.sql.functions
      .col("platform") === "platform_yourator")
    assert(pruned.count() ==
      expected.filter(org.apache.spark.sql.functions
        .col("platform") === "platform_yourator").count())
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") || scan.contains("platform_yourator"),
      scan.take(500))
    assert(spark.table("tb_companies").count() ==
      Compaction.currentCompanies(state).get.count())
  }
}
