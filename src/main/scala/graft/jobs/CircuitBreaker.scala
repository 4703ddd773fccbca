package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P7 — the reference's circuit breaker (core/infra/circuit_breaker.py:
  * failure_threshold=5 failures trips OPEN, recovery_timeout=60 s later the
  * breaker half-opens and one good call closes it) re-expressed for batch
  * rounds.
  *
  * Batch mapping: the per-(platform, host) round metrics ARE the call
  * outcomes; a host whose external-failure count in a round reaches the
  * threshold trips and is written to the `cooling` state table for
  * ceil(recovery_timeout / roundSeconds) rounds. The cooling filter
  * (CrawlRound P3) is the OPEN state; expiry is HALF_OPEN — the host is
  * scheduled again and a clean round closes the breaker (no new trip), a
  * bad one re-trips it, exactly the reference's half-open probe at round
  * granularity.
  *
  * The default failure signal is `rate_limited` (429s — the external-service
  * failure the reference's breaker guards on its browser/AI instances);
  * extraction/parse failures deliberately do NOT trip it, matching the
  * reference, which persists parse failures without breaking the circuit.
  */
object CircuitBreaker {

  val DefaultFailureThreshold = 5 // circuit_breaker.py:27
  val DefaultRecoveryTimeoutS = 60.0 // circuit_breaker.py:28

  /** Cooling entries for hosts whose failure count trips the breaker this
    * round. One aggregated row per tripped host — at scale this is a tiny
    * projection of the already-aggregated metrics frame.
    */
  def trips(metrics: DataFrame, round: Int, roundSeconds: Double,
            failureCol: Column = col("rate_limited"),
            failureThreshold: Int = DefaultFailureThreshold,
            recoveryTimeoutS: Double = DefaultRecoveryTimeoutS): DataFrame = {
    val cooldownRounds = math.max(1, math.ceil(recoveryTimeoutS / roundSeconds).toInt)
    // cooling semantics: excluded while current round < until_round, so
    // until_round = round + 1 + cooldown keeps the host out for `cooldown`
    // rounds and half-opens on the round after
    metrics.filter(coalesce(failureCol, lit(0L)) >= failureThreshold)
      .select(col("host"), lit(round + 1 + cooldownRounds).as("until_round"))
      .dropDuplicates("host")
  }
}
