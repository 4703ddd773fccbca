package graft.frontier

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.charset.StandardCharsets

/** Iceberg-style snapshot/manifest layer over partitioned parquet
  * (SURVEY.md §7.0 — no Iceberg runtime jars ship in /opt/spark/jars, so
  * rounds commit through a thin manifest: state is only visible once the
  * round's manifest file exists, making resume atomic and replayable).
  *
  * All metadata I/O goes through the Hadoop `FileSystem` API resolved from
  * `stateDir`'s scheme, so the state can live on HDFS/S3A/file:// alike —
  * at the design point (10^10-URL frontier) it must: the driver-local POSIX
  * layer this replaces was the one piece that only worked single-node.
  * Commits are create-temp-then-rename to a FRESH name (atomic on HDFS and
  * local file systems; never rename-over-existing, which the FileSystem
  * contract does not make atomic).
  *
  * Layout under `stateDir`:
  * {{{
  *   <table>/round=<k>/(parquet)        state deltas / outputs per round
  *   <table>/_base_<k>_a<j>/(parquet)   checkpoint base snapshots (attempt j)
  *   _checkpoints/<table>/ckpt_<s>.json log-structured base pointer, max s wins
  *   _manifest/round_<k>.json           commit marker, written last
  *   _blobs/<name>_round_<k>.bin        binary sidecars
  * }}}
  *
  * Checkpoint crash-safety: a new base lands under a never-before-used
  * attempt dir, and the pointer file referencing it is written (to a fresh
  * sequence number) only after the base rename succeeded. A crash anywhere
  * leaves either the old pointer + old base (stale but valid) or an orphan
  * base dir no pointer references (ignored; vacuum prunes it) — readers
  * never see a pointer to a missing base.
  */
final class RoundState(spark: SparkSession, stateDir: String) {

  private val root = new Path(stateDir)
  private val fs: FileSystem = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val manifestDir = new Path(root, "_manifest")

  // ---- memoized metadata snapshot ------------------------------------------
  // Without these caches every `readCommitted`-family call re-lists
  // `_manifest` + `_checkpoints` and re-reads the pointer JSON — ~7× per
  // crawl round, and each `committedRounds` is an O(rounds) listing on an
  // object store (10^4 rounds → 10^4 listStatus keys PER CALL). Within one
  // cache epoch every reader sees a single consistent snapshot of the round
  // log (the Iceberg snapshot-isolation analog). Local mutations (commit /
  // checkpointTable / vacuumTable) invalidate automatically; a process
  // observing ANOTHER writer's commits must call [[refresh]] — reads between
  // refreshes are intentionally stale (snapshot semantics, StateSpec-tested).
  private var roundsCache: Option[Seq[Int]] = None
  private val ckptCache = scala.collection.mutable.HashMap.empty[String, Option[(Int, String)]]
  private val manifestCache = scala.collection.mutable.HashMap.empty[Int, Option[Map[String, String]]]
  private val tableRoundsCache = scala.collection.mutable.HashMap.empty[String, Set[Int]]
  // Per-instance parquet SCHEMA memo, keyed by (table, kind) where kind
  // distinguishes delta dirs from checkpoint bases (bases carry `_round`).
  // Unlike the metadata caches above this survives refresh(): a table's
  // delta schema is fixed by the writer code, so re-inferring it (a
  // listing + footer read per spark.read.parquet, ~6 tables × every
  // round — measured 0.5-1.0 s/round of pure driver time) buys nothing.
  // [[writeDelta]] invalidates the entry if this process ever writes the
  // table with a DIFFERENT schema, so in-process schema evolution is safe;
  // a table widened by another process mid-run needs a new RoundState
  // (the same boundary the metadata snapshot semantics already draw).
  private val schemaCache =
    scala.collection.mutable.HashMap.empty[(String, String), org.apache.spark.sql.types.StructType]

  private def readParquet(table: String, kind: String, paths: Seq[String]): DataFrame = {
    val cached = synchronized(schemaCache.get((table, kind)))
    cached match {
      case Some(s) => spark.read.schema(s).parquet(paths: _*)
      case None =>
        val df = spark.read.parquet(paths: _*)
        synchronized { schemaCache((table, kind)) = df.schema }
        df
    }
  }

  /** Drop the memoized metadata snapshot; the next read re-lists the state
    * dir. The round driver calls this once per round — combined with
    * auto-invalidation on local mutations, each round pays exactly one
    * metadata-listing epoch regardless of how many state reads it makes.
    */
  def refresh(): Unit = synchronized {
    roundsCache = None; ckptCache.clear(); manifestCache.clear(); tableRoundsCache.clear()
  }

  /** Committed round numbers of the delta dirs present under a table — one
    * listStatus per (table, epoch) instead of one getFileStatus per
    * (table, round, call).
    */
  private def tableRounds(table: String): Set[Int] = synchronized {
    tableRoundsCache.getOrElseUpdate(table,
      list(new Path(root, table))
        .collect { case s if s.startsWith("round=") => s.stripPrefix("round=").toInt }
        .toSet)
  }
  // --------------------------------------------------------------------------

  private def list(dir: Path): Seq[String] =
    try fs.listStatus(dir).toSeq.map(_.getPath.getName)
    catch { case _: java.io.FileNotFoundException => Seq.empty }

  private def readString(p: Path): String = {
    val in = fs.open(p)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Atomic publish: write bytes to a dot-tmp sibling, rename to the (fresh)
    * final name. `replace` deletes a stale leftover target first — only used
    * where the target is not yet visible to any reader (uncommitted blobs).
    */
  private def writeAtomic(dest: Path, bytes: Array[Byte], replace: Boolean = false): Unit = {
    fs.mkdirs(dest.getParent)
    val tmp = new Path(dest.getParent, "." + dest.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    if (replace && fs.exists(dest)) fs.delete(dest, false)
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(s"rename $tmp -> $dest failed")
  }

  def committedRounds: Seq[Int] = synchronized {
    roundsCache match {
      case Some(r) => r
      case None =>
        val r = list(manifestDir)
          .collect { case s if s.startsWith("round_") && s.endsWith(".json") =>
            s.stripPrefix("round_").stripSuffix(".json").toInt
          }
          .sorted
        roundsCache = Some(r)
        r
    }
  }

  def nextRound: Int = committedRounds.lastOption.map(_ + 1).getOrElse(0)

  /** Append a round-delta for a state table (not visible until commit).
    *
    * Committer v2 + no `_SUCCESS` marker (guide §6): task output commits
    * straight to the destination dir, halving the per-write rename/list
    * round-trips of the v1 two-phase protocol — measured as the dominant
    * share of the ~14 concurrent one-file delta writes a small round pays.
    * Safe HERE because delta visibility is gated by the round manifest
    * (written last): a crashed write job leaves partial files in a dir no
    * reader consults, and the retry's `overwrite` clears them first. Do
    * not copy this setting to writers whose output dir IS the commit
    * marker.
    */
  def writeDelta(table: String, round: Int, df: DataFrame): Unit = {
    // in-process schema evolution: a delta written with a different schema
    // invalidates the memo so the next read re-infers
    synchronized {
      schemaCache.get((table, "delta")).foreach { s =>
        if (s != df.schema) { schemaCache.remove((table, "delta")); schemaCache.remove((table, "base")) }
      }
    }
    df.write.mode("overwrite")
      .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .parquet(s"$stateDir/$table/round=$round")
  }

  /** Union of all committed deltas of a table (empty frame via schema sample
    * must be handled by callers when no rounds are committed yet).
    * If the table has a checkpoint base (see [[checkpointTable]]), the base
    * replaces the deltas it folded — readers list O(rounds-since-checkpoint)
    * dirs instead of O(all rounds).
    */
  def readCommitted(table: String): Option[DataFrame] = {
    val ckpt = checkpointInfo(table)
    val present = tableRounds(table)
    val paths = committedRounds.filter(r => ckpt.forall(r > _._1))
      .filter(present.contains)
      .map(r => s"$stateDir/$table/round=$r")
    val parts =
      ckpt.map { case (_, d) => readParquet(table, "base", Seq(s"$stateDir/$table/$d")).drop("_round") }.toSeq ++
        (if (paths.isEmpty) Nil else Seq(readParquet(table, "delta", paths)))
    if (parts.isEmpty) None else Some(parts.reduce(_ unionByName _))
  }

  /** Snapshot read AS OF a committed round (inclusive) — time travel over
    * the manifest log, the Iceberg-snapshot semantics the state layer
    * mirrors: the table exactly as a reader at round `asOfRound`'s commit
    * saw it. Uncommitted or later rounds are invisible.
    */
  def readAsOf(table: String, asOfRound: Int): Option[DataFrame] = {
    val rounds = committedRounds.filter(_ <= asOfRound)
      .filter(tableRounds(table).contains)
    if (rounds.isEmpty) None
    else Some(readParquet(table, "delta", rounds.map(r => s"$stateDir/$table/round=$r")))
  }

  /** [[readAsOf]] with each delta's round re-attached as `_round` — the
    * time-travel analog of [[readCommittedWithRound]] (MERGE-at-read
    * compaction as a reader at `asOfRound`'s commit saw the table). Reads
    * raw deltas only, like readAsOf: vacuuming trades this away.
    */
  def readAsOfWithRound(table: String, asOfRound: Int): Option[DataFrame] = {
    val rounds = committedRounds.filter(_ <= asOfRound)
      .filter(tableRounds(table).contains)
    if (rounds.isEmpty) None
    else Some(rounds.map { r =>
      readParquet(table, "delta", Seq(s"$stateDir/$table/round=$r"))
        .withColumn("_round", org.apache.spark.sql.functions.lit(r))
    }.reduce(_ unionByName _))
  }

  /** Like readCommitted, but re-attaches each delta's round as `_round`
    * (needed by MERGE-at-read compaction to order versions). A checkpoint
    * base, when present, preserves `_round` per row, so compaction ordering
    * survives the fold.
    */
  def readCommittedWithRound(table: String): Option[DataFrame] = {
    val ckpt = checkpointInfo(table)
    val rounds = committedRounds
      .filter(r => ckpt.forall(r > _._1))
      .filter(tableRounds(table).contains)
    val deltas = rounds.map { r =>
      readParquet(table, "delta", Seq(s"$stateDir/$table/round=$r"))
        .withColumn("_round", org.apache.spark.sql.functions.lit(r))
    }
    val baseDf = ckpt.map { case (_, d) => readParquet(table, "base", Seq(s"$stateDir/$table/$d")) }
    val parts = baseDf.toSeq ++ deltas
    if (parts.isEmpty) None else Some(parts.reduce(_ unionByName _))
  }

  private def ckptDir(table: String) = new Path(root, s"_checkpoints/$table")

  /** Newest checkpoint pointer: (base round, base dir name). Pointer files
    * are append-only `ckpt_<seq>.json`; the max sequence wins, so a reader
    * racing a checkpoint sees either the old or the new pointer — never a
    * missing base.
    */
  private def checkpointInfo(table: String): Option[(Int, String)] = synchronized {
    ckptCache.getOrElseUpdate(table, {
      val seqs = list(ckptDir(table))
        .collect { case s if s.startsWith("ckpt_") && s.endsWith(".json") =>
          s.stripPrefix("ckpt_").stripSuffix(".json").toInt
        }
      seqs.maxOption.flatMap { s =>
        graft.extract.Json.parse(readString(new Path(ckptDir(table), s"ckpt_$s.json"))) match {
          case o: graft.extract.Json.JObj =>
            for {
              b <- o.get("base").collect { case graft.extract.Json.JInt(v) => v.toInt }
              d <- o.get("dir").collect { case graft.extract.Json.JStr(v) => v }
            } yield (b, d)
          case _ => None
        }
      }
    })
  }

  /** The round a table's checkpoint base folds up to, if one exists. */
  def checkpointedBase(table: String): Option[Int] = checkpointInfo(table).map(_._1)

  /** Every checkpointed table and its base round (dashboard/ops surface). */
  def checkpointedTables: Map[String, Int] =
    list(new Path(root, "_checkpoints"))
      .flatMap(t => checkpointedBase(t).map(t -> _)).toMap

  /** CHECKPOINT a delta table: fold every committed delta (plus any earlier
    * base) into one base snapshot covering rounds <= the latest commit —
    * the Iceberg manifest-compaction analog. A 10^4-round state otherwise
    * makes every reader list 10^4 delta dirs; after a checkpoint, readers
    * see base + O(rounds since). Raw deltas stay on disk, so [[readAsOf]]
    * time travel is unaffected (run [[vacuumTable]] to trade it for space).
    * Per-row `_round` provenance is preserved inside the base, so
    * MERGE-at-read compaction ordering still holds. Not for full-snapshot
    * tables ([[readLatestSnapshot]]) — those already self-compact.
    *
    * Returns the base round, or None when the table has no committed data.
    */
  def checkpointTable(table: String): Option[Int] = committedRounds.lastOption.flatMap { upTo =>
    readCommittedWithRound(table).map { df =>
      // fresh attempt dir: re-checkpointing at the same round never touches
      // the base a live pointer references
      val attempt = Iterator.from(0)
        .find(j => !fs.exists(new Path(root, s"$table/_base_${upTo}_a$j"))).get
      val baseName = s"_base_${upTo}_a$attempt"
      val tmp = new Path(root, s"$table/._base_${upTo}_a$attempt.tmp")
      df.write.mode("overwrite").parquet(tmp.toString)
      if (!fs.rename(tmp, new Path(root, s"$table/$baseName")))
        throw new java.io.IOException(s"rename $tmp -> $table/$baseName failed")
      // pointer written only after the base landed
      val seq = list(ckptDir(table))
        .collect { case s if s.startsWith("ckpt_") && s.endsWith(".json") =>
          s.stripPrefix("ckpt_").stripSuffix(".json").toInt
        }.maxOption.getOrElse(-1) + 1
      writeAtomic(new Path(ckptDir(table), s"ckpt_$seq.json"),
        s"""{"base": $upTo, "dir": "$baseName"}""".getBytes(StandardCharsets.UTF_8))
      refresh() // the new base + pointer supersede the memoized snapshot
      upTo
    }
  }

  /** Delete the delta dirs a checkpoint base covers, base dirs the current
    * pointer does not reference (older rounds and orphaned attempts), and
    * superseded pointer files. Frees space and dir-listing work at the cost
    * of [[readAsOf]] time travel below the base round.
    */
  def vacuumTable(table: String): Unit = {
    checkpointInfo(table).foreach { case (b, dir) =>
      committedRounds.filter(_ <= b)
        .foreach(r => fs.delete(new Path(root, s"$table/round=$r"), true))
      // prune (a) base dirs the live pointer does not reference and (b)
      // `._base_*.tmp` leftovers of checkpoint attempts that crashed
      // mid-write — without (b) crashed-attempt temp dirs accumulate forever
      list(new Path(root, table))
        .filter(n => (n.startsWith("_base_") && n != dir) || n.startsWith("._base_"))
        .foreach(n => fs.delete(new Path(root, s"$table/$n"), true))
      val seqs = list(ckptDir(table))
        .collect { case s if s.startsWith("ckpt_") && s.endsWith(".json") =>
          s.stripPrefix("ckpt_").stripSuffix(".json").toInt
        }
      seqs.maxOption.foreach(keep => seqs.filter(_ < keep)
        .foreach(s => fs.delete(new Path(ckptDir(table), s"ckpt_$s.json"), false)))
    }
    refresh() // deleted delta dirs invalidate the per-table round listing
  }

  /** Latest committed FULL-SNAPSHOT table (e.g. the sharded seen filters):
    * unlike delta tables, only the newest committed round's write is current.
    * Rounds that wrote no snapshot (empty rounds) are skipped — readers look
    * back to the last round that did.
    */
  def readLatestSnapshot(table: String): Option[DataFrame] =
    committedRounds.reverse
      .find(tableRounds(table).contains)
      .map(r => readParquet(table, "delta", Seq(s"$stateDir/$table/round=$r")))

  /** Row count of one written delta (parquet footer metadata read). */
  def readDeltaCount(table: String, round: Int): Long =
    spark.read.parquet(s"$stateDir/$table/round=$round").count()

  /** Binary sidecar per round (e.g. the carried URL-seen Bloom filter bits).
    * Written before commit; visible like any delta only once the round's
    * manifest exists — so replacing a stale leftover from a crashed attempt
    * of the SAME (uncommitted) round is safe.
    */
  def writeBlob(name: String, round: Int, bytes: Array[Byte]): Unit =
    writeAtomic(new Path(root, s"_blobs/${name}_round_$round.bin"), bytes, replace = true)

  def readBlob(name: String, round: Int): Option[Array[Byte]] = {
    val p = new Path(root, s"_blobs/${name}_round_$round.bin")
    if (fs.exists(p)) {
      val in = fs.open(p)
      try Some(org.apache.commons.io.IOUtils.toByteArray(in)) finally in.close()
    } else None
  }

  /** Flat string map of a committed round's manifest (carries e.g. the
    * cumulative seen count so rounds never recount the full history).
    */
  def readManifest(round: Int): Option[Map[String, String]] = synchronized {
    // gate on the memoized committed set (the manifest file IS the commit
    // marker): a round committed by another writer after this epoch began
    // stays invisible until refresh() — snapshot semantics, no extra I/O
    if (!committedRounds.contains(round)) None
    else manifestCache.getOrElseUpdate(round, {
      val p = new Path(manifestDir, s"round_$round.json")
      if (!fs.exists(p)) None
      // a real JSON parse (not a regex): values containing ',', '}', '"' or
      // escapes survive as commit() grows fields
      else graft.extract.Json.parse(readString(p)) match {
        case o: graft.extract.Json.JObj =>
          Some(o.entries.map { case (k, v) => k -> graft.extract.Json.pyStr(v) }.toMap)
        case _ => None
      }
    })
  }

  /** Commit a round: manifest written last, after all table writes landed.
    * Keys and string values serialize through the JSON writer (escaped), so
    * a value containing a quote/backslash survives the strict readManifest.
    */
  def commit(round: Int, info: Map[String, Any]): Unit = {
    import graft.extract.Json
    val json = info.map {
      case (k, v: String) => s"${Json.dumps(Json.JStr(k))}: ${Json.dumps(Json.JStr(v))}"
      case (k, v) => s"${Json.dumps(Json.JStr(k))}: $v"
    }.mkString("{", ", ", "}")
    writeAtomic(new Path(manifestDir, s"round_$round.json"),
      json.getBytes(StandardCharsets.UTF_8))
    refresh() // the new manifest advances the committed-round snapshot
  }
}
