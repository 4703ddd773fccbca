package graft.frontier

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL canonicalization + host extraction (SURVEY.md §2.2 F4).
  *
  * Reference: `clean_url` strips the query string (discovery_service.py:40-43)
  * for every platform except yes123, which keeps its params
  * (discovery_service.py:215-217) because its identity lives in p_id/job_id.
  */
object Canon {

  /** Canonical URL column: `substring_index(url,'?',1)` unless yes123 host. */
  def canonUrl(url: Column): Column =
    when(url.contains("yes123.com.tw"), url)
      .otherwise(substring_index(url, "?", 1))

  /** Host column from an absolute URL — pure string ops, codegen-friendly. */
  def host(url: Column): Column =
    substring_index(substring_index(regexp_replace(url, "^https?://", ""), "/", 1), "?", 1)

  /** Path column (leading '/', no query) for robots prefix checks. */
  def path(url: Column): Column = {
    val noScheme = regexp_replace(url, "^https?://", "")
    val afterHost = noScheme.substr(length(substring_index(noScheme, "/", 1)) + 1, lit(1000000))
    substring_index(afterHost, "?", 1)
  }
}

/** Cross-round URL-seen set: Bloom prefilter + exact anti-join backstop
  * (SURVEY.md §2.2 F5, north rule "bloom/cuckoo URL-seen").
  *
  * Scale shape: the Bloom filter is built once per round over the seen table
  * and broadcast; candidates that the filter rejects are *definitely unseen*
  * and skip the join entirely. Only possible-hits (≈ fpp × candidates + true
  * hits) flow into the exact `left_anti`, so the shuffle is proportional to
  * the overlap, not the frontier. Exactness comes from the anti-join, never
  * from the filter.
  */
object SeenSet {

  /** candidates minus seen, on column `keyCol` present in both frames. */
  def antiJoin(candidates: DataFrame, seen: DataFrame, keyCol: String,
               expectedSeen: Long, fpp: Double = 0.01): DataFrame = {
    if (seen.isEmpty) return candidates
    val n = math.max(expectedSeen, 1000L)
    val bloom = seen.stat.bloomFilter(keyCol, n, fpp)
    val spark = candidates.sparkSession
    val bloomBc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((s: String) => s != null && bloomBc.value.mightContain(s))
    val definitelyNew = candidates.filter(!mightContain(col(keyCol)))
    val maybeSeen = candidates.filter(mightContain(col(keyCol)))
    // AQE picks broadcast when the maybe-set or seen projection is small
    val checked = maybeSeen.join(seen.select(keyCol), Seq(keyCol), "left_anti")
    definitelyNew.unionByName(checked)
  }
}

/** Per-host politeness budgets as window-ranked priority queues
  * (SURVEY.md §2.3 P1-P5; throttler.py token bucket → batch round budgets).
  */
object Politeness {

  /** Deterministic priority order: priority desc, canon_url asc — a total
    * order so crawl ordering is reproducible across parallelism levels
    * (SURVEY.md §2.6).
    */
  val orderCols: Seq[Column] = Seq(col("priority").desc, col("canon_url").asc)

  /** Select the per-host top-`budget` rows by priority, scalably.
    *
    * Naive `row_number over (partition by host)` funnels each mega-host into
    * one task. Instead: two-phase ranking — (1) rank within (host, salt) and
    * keep only salted-rank <= budget (any row ranked below `budget` within its
    * salt cannot be in the host's global top-budget, so this prefilter is
    * lossless); (2) exact rank over the ≤ saltFactor×budget survivors.
    * Adds `sched_rank` (1-based within host) to the selected rows.
    */
  def selectBudget(frontier: DataFrame, saltFactor: Int = 32): DataFrame = {
    val salted = frontier.withColumn("_salt", pmod(xxhash64(col("canon_url")), lit(saltFactor)))
    val w1 = Window.partitionBy(col("host"), col("_salt"))
      .orderBy(orderCols: _*)
    val phase1 = salted
      .withColumn("_r1", row_number().over(w1))
      .filter(col("_r1") <= col("budget"))
      .drop("_salt", "_r1")
    val w2 = Window.partitionBy(col("host")).orderBy(orderCols: _*)
    phase1
      .withColumn("sched_rank", row_number().over(w2))
      .filter(col("sched_rank") <= col("budget"))
  }

  /** Robots rules: drop URLs whose path starts with any denied prefix of its
    * host policy (north-rule host-policy column; reference has no robots —
    * SURVEY.md §2.3 note).
    */
  def applyRobots(frontier: DataFrame): DataFrame = {
    val denied = exists(col("robots_deny"), p => col("path").startsWith(p))
    frontier.filter(col("robots_deny").isNull || !denied)
  }

  /** Adaptive-rate fold (throttler.py:125-156): ×1.1 after a 50-success
    * streak capped at 1.5×base; ×0.7 after a 429 floored at 0.1×base.
    * Batch analog over per-round metrics: one multiplicative step per round.
    */
  def adaptRate(baseRate: Column, currentRate: Column,
                successes: Column, rateLimited: Column): Column = {
    val up = least(currentRate * 1.1, baseRate * 1.5)
    val down = greatest(currentRate * 0.7, baseRate * 0.1)
    when(rateLimited > 0, down)
      .when(successes >= 50, up)
      .otherwise(currentRate)
  }
}
