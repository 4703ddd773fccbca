package graft.jobs

import graft.frontier.RoundState
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S5 — MERGE-style compaction of append-only round deltas, the batch
  * re-expression of the reference's idempotent persistence:
  * `INSERT … ON DUPLICATE KEY UPDATE` with `IFNULL(new, old)` guards on
  * description/company_web/company_url (sql_generator.py:165-200, txn at
  * database.py:142-188). Re-crawling a key across rounds folds to ONE row:
  * latest round wins per column, except guarded columns where a NULL in a
  * newer round must not clobber an older non-null value — i.e. latest
  * NON-NULL wins.
  *
  * Scale shape: one hash aggregation on the merge keys (`max_by` with a
  * struct ordering key — map-side partial agg, no window, no sort). The
  * reference's `ifnull_cols` set is the default here.
  */
object Compaction {

  val DefaultIfNullCols: Seq[String] = Seq("description", "company_web", "company_url")

  /** Fold `deltas` (which must carry an `orderCol` round column) to one row
    * per `keys`: column := value from the max (orderCol, tiebreakCols) row;
    * for `ifnullCols` := value from the max such row WHERE the value is
    * non-null (IFNULL-guard semantics).
    */
  def compact(deltas: DataFrame, keys: Seq[String],
              ifnullCols: Seq[String] = DefaultIfNullCols,
              orderCol: String = "round",
              tiebreakCols: Seq[String] = Seq.empty): DataFrame = {
    val ord: Column = struct((orderCol +: tiebreakCols).map(col): _*)
    val valueCols = deltas.columns.filterNot(c => keys.contains(c) || c == orderCol)
    val aggs = valueCols.map { c =>
      if (ifnullCols.contains(c))
        // max_by skips rows whose ordering key is null -> latest non-null
        max_by(col(c), when(col(c).isNotNull, ord)).as(c)
      else
        max_by(col(c), ord).as(c)
    }
    deltas.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Read a state table's committed round deltas compacted to current rows.
    * The round number is re-attached from the delta layout so `compact` can
    * order; this is the MERGE-at-read path the round deltas were designed
    * for (CrawlRound writes append-only; readers see upsert semantics).
    */
  def readCompacted(state: RoundState, table: String, keys: Seq[String],
                    ifnullCols: Seq[String] = DefaultIfNullCols,
                    tiebreakCols: Seq[String] = Seq.empty,
                    asOf: Option[Int] = None): Option[DataFrame] = {
    val deltas = asOf match {
      case Some(r) => state.readAsOfWithRound(table, r)
      case None => state.readCommittedWithRound(table)
    }
    deltas.map(df => compact(df, keys, ifnullCols, "_round", tiebreakCols))
  }

  /** Current tb_jobs view: latest row per (platform, source_id) with the
    * reference's IFNULL guard on description. `asOf` time-travels to an
    * earlier committed round.
    */
  def currentJobs(state: RoundState, asOf: Option[Int] = None): Option[DataFrame] =
    readCompacted(state, "out_jobs", Seq("platform", "source_id"),
      ifnullCols = Seq("description"), tiebreakCols = Seq("url"), asOf = asOf)

  /** [[currentJobs]] plus `updated_round` — the round each surviving row was
    * last upserted in. The reference's /api/jobs orders by `created_at
    * DESC` (dashboard_server.py:90-99); in the batch state the commit round
    * is that recency axis.
    */
  def currentJobsWithRound(state: RoundState, asOf: Option[Int] = None): Option[DataFrame] = {
    val deltas = asOf match {
      case Some(r) => state.readAsOfWithRound("out_jobs", r)
      case None => state.readCommittedWithRound("out_jobs")
    }
    deltas.map(df => compact(df.withColumn("updated_round", col("_round")),
      Seq("platform", "source_id"), ifnullCols = Seq("description"), "_round", Seq("url")))
  }

  /** Current tb_companies view: latest row per (platform, source_id) with
    * IFNULL guards on description/company_web/company_url.
    */
  def currentCompanies(state: RoundState, asOf: Option[Int] = None): Option[DataFrame] =
    readCompacted(state, "out_companies", Seq("platform", "source_id"),
      ifnullCols = DefaultIfNullCols, tiebreakCols = Seq("name"), asOf = asOf)

  /** S8 publish: bootstrap the warehouse DDL ([[graft.schema.Schemas
    * .ensureTables]]) and overwrite the catalog tables with the compacted
    * current views, sorted by each table's registered index columns so the
    * reference's secondary-index lookups become parquet min/max prunes.
    * (The sandbox session catalog is in-memory; production points the same
    * calls at a persistent metastore / Iceberg catalog.)
    */
  def publish(spark: org.apache.spark.sql.SparkSession, state: RoundState,
              warehouseDir: String): Unit = {
    graft.schema.Schemas.ensureTables(spark, warehouseDir)
    def writeInto(dfOpt: Option[DataFrame], table: String): Unit = dfOpt.foreach { df =>
      // insertInto is positional: realign to the catalog schema (partition
      // columns last) and apply the registered sort order
      val target = spark.table(table).columns
      val sortCols = graft.schema.Schemas.indexColsOf(spark, table)
      val aligned = df.select(target.map(col): _*)
      val sorted = if (sortCols.isEmpty) aligned
        else aligned.sortWithinPartitions(sortCols.map(col): _*)
      sorted.write.mode("overwrite").insertInto(table)
    }
    writeInto(currentJobs(state), "tb_jobs")
    writeInto(currentCompanies(state), "tb_companies")
    writeInto(state.readCommitted("out_locations"), "tb_job_locations")
    writeInto(state.readCommitted("out_skills"), "tb_job_skills_extracted")
    writeInto(state.readCommitted("out_junction"), "tb_categories_jobs")
  }
}
