package graft.streaming

import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One exploded chunk-key row of a streamed document's simhash. */
case class SimChunk(doc_id: Long, simhash: Long, blk: Int, blk_key: Long)

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
  * 4 × 65,536 bucket keys (RocksDB-backed in production; entries are 16
  * bytes each), micro-batch shuffle is 4 id+hash rows per arriving doc,
  * and text never enters the stateful stage at all. Re-crawled doc_ids are
  * the caller's concern (the crawl seen-set drops them upstream, exactly
  * as in the batch rounds).
  */
object StreamingDedup {

  /** documents stream `(doc_id, text, ...)` -> append-mode stream of
    * near-dup pairs (doc_a < doc_b, hamming <= maxDist) against everything
    * that arrived before (and earlier in the same micro-batch, ordered by
    * doc_id).
    */
  def simhashPairsStream(docs: DataFrame, maxDist: Int = 3): Dataset[SimPair] = {
    require(0 <= maxDist && maxDist <= 3,
      "the streaming path keeps the production 4×16-bit layout (d <= 3); " +
        "run wider radii through the batch engine")
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
      .as[SimChunk]
    val d = maxDist
    val nChunks = c
    val widthArr = widths.toArray
    val offsetArr = offsets.toArray
    exploded
      .groupByKey(r => (r.blk, r.blk_key))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Int, Long), rows: Iterator[SimChunk], state: GroupState[SimBucket]) =>
          def chunkOf(sim: Long, i: Int): Long =
            (sim >>> offsetArr(i)) & ((1L << widthArr(i)) - 1)
          def minAgreeingChunk(x: Long, y: Long): Int = {
            var i = 0
            while (i < nChunks && chunkOf(x, i) != chunkOf(y, i)) i += 1
            i // < nChunks whenever hamming <= d (pigeonhole)
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[SimPair]
          var residents = state.getOption.map(_.entries).getOrElse(Vector.empty)
          // doc_id order makes in-batch emission independent of partitioning
          for (r <- rows.toSeq.sortBy(_.doc_id)) {
            for ((oid, osim) <- residents if oid != r.doc_id) {
              val ham = java.lang.Long.bitCount(r.simhash ^ osim)
              if (ham <= d && minAgreeingChunk(r.simhash, osim) == key._1)
                out += SimPair(math.min(r.doc_id, oid), math.max(r.doc_id, oid), ham)
            }
            residents = residents :+ ((r.doc_id, r.simhash))
          }
          state.update(SimBucket(residents))
          out.iterator
      }
  }
}
