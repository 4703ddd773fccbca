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
    rankWithinHost(phase1)
      .filter(col("sched_rank") <= col("budget"))
  }

  /** Exact, fully parallel per-host ranking by the priority total order.
    *
    * `row_number over (partition by host)` would sort each mega-host in ONE
    * task — the thing that dies at 10^10. Instead: range-repartition on
    * (host, key) so each host spans consecutive sorted partitions, take a
    * local row_number per (host, physical partition) — parallel, group sizes
    * bounded by partition size — then add per-(host, partition) prefix-sum
    * offsets (a tiny hosts×partitions table collected to the driver and
    * broadcast back). Global rank = local rank + offset; deterministic for
    * any partition count because it derives only from the total key order
    * (ties impossible: canon_url is unique).
    */
  def rankWithinHost(frontier: DataFrame): DataFrame = {
    val sortKeys = col("host").asc +: orderCols
    val ranged = frontier
      .repartitionByRange(sortKeys: _*)
      .withColumn("_pid", spark_partition_id())
    val localW = Window.partitionBy(col("host"), col("_pid")).orderBy(orderCols: _*)
    // localCheckpoint pins the range-partitioner bounds (they come from
    // sampling): the counts action and the final join must see the SAME
    // physical partitioning or the offsets would be wrong.
    val local = ranged.withColumn("_lr", row_number().over(localW)).localCheckpoint()
    val counts = local.groupBy("host", "_pid").count().collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val offsets: Seq[(String, Int, Long)] =
      counts.groupBy(_._1).toSeq.flatMap { case (host, rows) =>
        var acc = 0L
        rows.sortBy(_._2).map { case (_, pid, n) =>
          val off = acc; acc += n; (host, pid, off)
        }.toSeq
      }
    val spark = frontier.sparkSession
    import spark.implicits._
    val offsetsDf = offsets.toDF("host", "_pid", "_offset")
    local.join(broadcast(offsetsDf), Seq("host", "_pid"))
      .withColumn("sched_rank", (col("_lr") + col("_offset")).cast("int"))
      .drop("_pid", "_lr", "_offset")
  }

  /** Robots rules: drop URLs whose path starts with any denied prefix of its
    * host policy (north-rule host-policy column; reference has no robots —
    * SURVEY.md §2.3 note).
    */
  def applyRobots(frontier: DataFrame): DataFrame = {
    val denied = exists(col("robots_deny"), p => col("path").startsWith(p))
    frontier.filter(col("robots_deny").isNull || !denied)
  }

  /** Adaptive-rate law (throttler.py:125-156): ×1.1 after a 50-success
    * streak capped at 1.5×base; ×0.7 after a 429 floored at 0.1×base.
    * Batch analog: one multiplicative step per committed round.
    */
  def adaptRateStep(base: Double, current: Double,
                    successes: Long, rateLimited: Long): Double = {
    if (rateLimited > 0) math.max(current * 0.7, base * 0.1)
    else if (successes >= 50) math.min(current * 1.1, base * 1.5)
    else current
  }

  /** Fold committed per-host round metrics into an effective-rate policy.
    * The history is tiny (hosts × rounds) — folded on the driver, broadcast
    * back as `eff_rate_per_s`.
    */
  def adaptPolicy(policy: DataFrame, metricsOpt: Option[DataFrame]): DataFrame = {
    val spark = policy.sparkSession
    import spark.implicits._
    val history: Map[String, Seq[(Int, Long, Long)]] = metricsOpt match {
      case None => Map.empty
      case Some(m) =>
        m.select(col("host"), col("round").cast("int"),
            col("success_requests").cast("long"),
            coalesce(col("rate_limited"), lit(0L)).cast("long"))
          .collect()
          .map(r => (r.getString(0), (r.getInt(1), r.getLong(2), r.getLong(3))))
          .groupBy(_._1).map { case (h, rows) => h -> rows.map(_._2).sortBy(_._1).toSeq }
    }
    val base = policy.select("host", "rate_per_s").as[(String, Double)].collect().toMap
    val eff = base.map { case (host, b) =>
      val folded = history.getOrElse(host, Seq.empty)
        .foldLeft(b) { case (cur, (_, succ, limited)) => adaptRateStep(b, cur, succ, limited) }
      host -> folded
    }
    val effDf = eff.toSeq.toDF("host", "eff_rate_per_s")
    policy.join(effDf, Seq("host"), "left")
  }
}
