package graft.streaming

import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One exploded chunk-key row of a streamed document's simhash. `store` is
  * true on exactly one of the doc's sub-bucket rows per (blk, blk_key) —
  * the sub-bucket that persists the doc; the others only probe.
  */
case class SimChunk(doc_id: Long, simhash: Long, blk: Int, blk_key: Long,
                    sub: Int, store: Boolean)

/** A near-dup pair emitted by the online dedup (hamming <= maxDist). */
case class SimPair(doc_a: Long, doc_b: Long, hamming: Int)

/** Per-bucket fingerprint state: every (doc_id, simhash) whose chunk `blk`
  * equals this bucket's key, in arrival order.
  */
case class SimBucket(entries: Seq[(Long, Long)])

/** ONLINE content near-dup over a document stream — the Manku/Jain/Sarma
  * WWW'07 construction in its original setting (their paper's motivating
  * problem is crawl-time duplicate detection: does the page that just
  * arrived near-duplicate anything already crawled?). The batch engine
  * answers it retrospectively ([[graft.ops.TextOps.simhashPairs]]); this is
  * the `flatMapGroupsWithState` form that answers it AS PAGES ARRIVE, with
  * the accumulated fingerprint index living in the Spark state store
  * instead of a parquet side table.
  *
  * Construction: each doc's 64-bit simhash splits into the production
  * 4 × 16-bit chunk layout (d <= 3 — the d15-certified batch blocking); the
  * doc lands in 4 state buckets keyed by (chunk index, chunk value). A pair
  * within hamming d agrees exactly on some chunk (pigeonhole), so comparing
  * each arrival against only its 4 buckets' residents is LOSSLESS — and
  * each resident list is ~n/2^16 of the corpus, so per-arrival work is
  * corpus/16,384-ish, not corpus.
  *
  * Exactly-once pair emission WITHOUT cross-bucket coordination: a pair
  * agreeing on several chunks is seen by several buckets, but only the
  * bucket whose chunk index equals the pair's SMALLEST agreeing chunk
  * emits — a rule each bucket evaluates locally from the two hashes. No
  * downstream dedup, no unbounded `dropDuplicates` state.
  *
  * Scale shape: state is the full fingerprint history sharded over
  * 4 × 65,536 bucket keys × `subBuckets` hash sub-buckets (RocksDB-backed
  * in production; entries are 16 bytes each), text never enters the
  * stateful stage at all. Re-crawled doc_ids are the caller's concern (the
  * crawl seen-set drops them upstream, exactly as in the batch rounds).
  *
  * SUB-BUCKETING (round-6 state-write hygiene): a state-store update
  * rewrites the group's WHOLE serialized value, so keying state by
  * (blk, blk_key) alone rewrote the full resident Vector per arrival —
  * ~2.4 MB per update at the 10^10-doc design point. Residents are instead
  * stored under (blk, blk_key, doc_id mod subBuckets): an arrival probes
  * all sub-buckets of each of its c chunk keys (c × subBuckets small
  * id+hash rows in the micro-batch shuffle) but is PERSISTED in exactly
  * one, so the per-arrival state rewrite shrinks by the sub-bucket factor
  * (bounded write amplification; StreamingSpec pins streaming-equals-batch,
  * restart recovery and a skewed-stream write-size bound).
  */
object StreamingDedup {

  /** Default sub-bucket fan-out: 2.4 MB design-point rewrites become
    * ~150 KB, while a 10k-doc micro-batch ships 10k × 4 × 16 = 640k
    * 24-byte rows — still far below the text bytes the stage never sees.
    */
  val DefaultSubBuckets: Int =
    sys.env.getOrElse("SPARK_GRAFT_DEDUP_SUBBUCKETS", "16").toInt

  /** documents stream `(doc_id, text, ...)` -> append-mode stream of
    * near-dup pairs (doc_a < doc_b, hamming <= maxDist) against everything
    * that arrived before (and earlier in the same micro-batch, ordered by
    * doc_id).
    *
    * Exactly-once across sub-buckets: a pair is emitted only (a) from the
    * pair's smallest agreeing chunk (the original rule) and (b) inside the
    * sub-bucket where the EARLIER-processed side is persisted — both
    * locally decidable, so no cross-group coordination is added.
    */
  def simhashPairsStream(docs: DataFrame, maxDist: Int = 3,
                         subBuckets: Int = DefaultSubBuckets): Dataset[SimPair] = {
    require(0 <= maxDist && maxDist <= 3,
      "the streaming path keeps the production 4×16-bit layout (d <= 3); " +
        "run wider radii through the batch engine")
    require(subBuckets >= 1, "subBuckets must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val (c, widths) = TextOps.simhashBlocking(maxDist)
    val offsets = widths.scanLeft(0)(_ + _).init
    val chunkCols = (0 until c).map { i =>
      call_function("shiftrightunsigned", col("simhash"), lit(offsets(i)))
        .bitwiseAND(lit((1L << widths(i)) - 1))
    }
    val exploded = TextOps.withSimhash(docs)
      .select(col("doc_id"), col("simhash"),
        posexplode(array(chunkCols: _*)).as(Seq("blk", "blk_key")))
      .select(col("doc_id"), col("simhash"), col("blk"), col("blk_key"),
        explode(sequence(lit(0), lit(subBuckets - 1))).as("sub"))
      .withColumn("store", pmod(col("doc_id"), lit(subBuckets)).cast("int") === col("sub"))
      .as[SimChunk]
    val d = maxDist
    val nChunks = c
    val widthArr = widths.toArray
    val offsetArr = offsets.toArray
    exploded
      .groupByKey(r => (r.blk, r.blk_key, r.sub))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Int, Long, Int), rows: Iterator[SimChunk], state: GroupState[SimBucket]) =>
          def chunkOf(sim: Long, i: Int): Long =
            (sim >>> offsetArr(i)) & ((1L << widthArr(i)) - 1)
          def minAgreeingChunk(x: Long, y: Long): Int = {
            var i = 0
            while (i < nChunks && chunkOf(x, i) != chunkOf(y, i)) i += 1
            i // < nChunks whenever hamming <= d (pigeonhole)
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[SimPair]
          val prev = state.getOption.map(_.entries).getOrElse(Vector.empty)
          var residents = prev
          // doc_id order makes in-batch emission independent of partitioning
          for (r <- rows.toSeq.sortBy(_.doc_id)) {
            for ((oid, osim) <- residents if oid != r.doc_id) {
              val ham = java.lang.Long.bitCount(r.simhash ^ osim)
              if (ham <= d && minAgreeingChunk(r.simhash, osim) == key._1)
                out += SimPair(math.min(r.doc_id, oid), math.max(r.doc_id, oid), ham)
            }
            if (r.store) residents = residents :+ ((r.doc_id, r.simhash))
          }
          // probe-only visits leave the state value untouched — the whole
          // point of sub-bucketing is that only the owning sub-bucket pays
          // a value rewrite per arrival
          if (residents.size != prev.size) state.update(SimBucket(residents))
          out.iterator
      }
  }
}
