package graft.frontier

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Iceberg-style snapshot/manifest layer over partitioned parquet
  * (SURVEY.md §7.0 — no Iceberg runtime jars ship in /opt/spark/jars, so
  * rounds commit through a thin manifest: state is only visible once the
  * round's manifest file exists, making resume atomic and replayable).
  *
  * Layout under `stateDir`:
  * {{{
  *   <table>/round=<k>/(parquet)   state deltas / outputs per round
  *   _manifest/round_<k>.json      commit marker, written last
  * }}}
  */
final class RoundState(spark: SparkSession, stateDir: String) {

  private val manifestDir: Path = Paths.get(stateDir, "_manifest")

  def committedRounds: Seq[Int] = {
    if (!Files.isDirectory(manifestDir)) return Seq.empty
    Files.list(manifestDir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("round_") && s.endsWith(".json") =>
        s.stripPrefix("round_").stripSuffix(".json").toInt
      }
      .toSeq.sorted
  }

  def nextRound: Int = committedRounds.lastOption.map(_ + 1).getOrElse(0)

  /** Append a round-delta for a state table (not visible until commit). */
  def writeDelta(table: String, round: Int, df: DataFrame): Unit =
    df.write.mode("overwrite").parquet(s"$stateDir/$table/round=$round")

  /** Union of all committed deltas of a table (empty frame via schema sample
    * must be handled by callers when no rounds are committed yet).
    * If the table has a checkpoint base (see [[checkpointTable]]), the base
    * replaces the deltas it folded — readers list O(rounds-since-checkpoint)
    * dirs instead of O(all rounds).
    */
  def readCommitted(table: String): Option[DataFrame] = {
    val base = checkpointedBase(table)
    val paths = committedRounds.filter(r => base.forall(r > _))
      .map(r => s"$stateDir/$table/round=$r")
      .filter(p => Files.isDirectory(Paths.get(p)))
    val parts =
      base.map(b => spark.read.parquet(s"$stateDir/$table/_base_$b").drop("_round")).toSeq ++
        (if (paths.isEmpty) Nil else Seq(spark.read.parquet(paths: _*)))
    if (parts.isEmpty) None else Some(parts.reduce(_ unionByName _))
  }

  /** Snapshot read AS OF a committed round (inclusive) — time travel over
    * the manifest log, the Iceberg-snapshot semantics the state layer
    * mirrors: the table exactly as a reader at round `asOfRound`'s commit
    * saw it. Uncommitted or later rounds are invisible.
    */
  def readAsOf(table: String, asOfRound: Int): Option[DataFrame] = {
    val rounds = committedRounds.filter(_ <= asOfRound)
      .filter(r => Files.isDirectory(Paths.get(s"$stateDir/$table/round=$r")))
    if (rounds.isEmpty) None
    else Some(spark.read.parquet(rounds.map(r => s"$stateDir/$table/round=$r"): _*))
  }

  /** Like readCommitted, but re-attaches each delta's round as `_round`
    * (needed by MERGE-at-read compaction to order versions). A checkpoint
    * base, when present, preserves `_round` per row, so compaction ordering
    * survives the fold.
    */
  def readCommittedWithRound(table: String): Option[DataFrame] = {
    val base = checkpointedBase(table)
    val rounds = committedRounds
      .filter(r => base.forall(r > _))
      .filter(r => Files.isDirectory(Paths.get(s"$stateDir/$table/round=$r")))
    val deltas = rounds.map { r =>
      spark.read.parquet(s"$stateDir/$table/round=$r")
        .withColumn("_round", org.apache.spark.sql.functions.lit(r))
    }
    val baseDf = base.map(b => spark.read.parquet(s"$stateDir/$table/_base_$b"))
    val parts = baseDf.toSeq ++ deltas
    if (parts.isEmpty) None else Some(parts.reduce(_ unionByName _))
  }

  /** The round a table's checkpoint base folds up to, if one exists. */
  def checkpointedBase(table: String): Option[Int] = {
    val p = Paths.get(stateDir, "_checkpoints", s"$table.json")
    if (!Files.exists(p)) return None
    graft.extract.Json.parse(Files.readString(p)) match {
      case o: graft.extract.Json.JObj =>
        o.get("base").collect { case graft.extract.Json.JInt(v) => v.toInt }
      case _ => None
    }
  }

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
      val dest = Paths.get(stateDir, table, s"_base_$upTo")
      val tmp = Paths.get(stateDir, table, s"._base_$upTo.tmp")
      df.write.mode("overwrite").parquet(tmp.toString)
      if (Files.isDirectory(dest)) { // re-checkpoint at the same round
        Files.walk(dest).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => Files.delete(f))
      }
      Files.move(tmp, dest, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      val mdir = Paths.get(stateDir, "_checkpoints")
      Files.createDirectories(mdir)
      val mtmp = mdir.resolve(s".$table.json.tmp")
      Files.writeString(mtmp, s"""{"base": $upTo}""")
      Files.move(mtmp, mdir.resolve(s"$table.json"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      upTo
    }
  }

  /** Delete the delta dirs (and any older base) a checkpoint base covers.
    * Frees space and dir-listing work at the cost of [[readAsOf]] time
    * travel below the base round.
    */
  def vacuumTable(table: String): Unit =
    checkpointedBase(table).foreach { b =>
      def rmTree(p: Path): Unit = if (Files.exists(p)) {
        Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => Files.delete(f))
      }
      committedRounds.filter(_ <= b)
        .foreach(r => rmTree(Paths.get(stateDir, table, s"round=$r")))
      Files.list(Paths.get(stateDir, table)).iterator().asScala
        .filter { p =>
          val n = p.getFileName.toString
          n.startsWith("_base_") && n.stripPrefix("_base_").toIntOption.exists(_ < b)
        }
        .foreach(rmTree)
    }

  /** Latest committed FULL-SNAPSHOT table (e.g. the sharded seen filters):
    * unlike delta tables, only the newest committed round's write is current.
    * Rounds that wrote no snapshot (empty rounds) are skipped — readers look
    * back to the last round that did.
    */
  def readLatestSnapshot(table: String): Option[DataFrame] =
    committedRounds.reverse
      .find(r => Files.isDirectory(Paths.get(s"$stateDir/$table/round=$r")))
      .map(r => spark.read.parquet(s"$stateDir/$table/round=$r"))

  /** Row count of one written delta (parquet footer metadata read). */
  def readDeltaCount(table: String, round: Int): Long =
    spark.read.parquet(s"$stateDir/$table/round=$round").count()

  /** Binary sidecar per round (e.g. the carried URL-seen Bloom filter bits).
    * Written before commit; visible like any delta only once the round's
    * manifest exists.
    */
  def writeBlob(name: String, round: Int, bytes: Array[Byte]): Unit = {
    val dir = Paths.get(stateDir, "_blobs")
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".${name}_round_$round.bin.tmp")
    Files.write(tmp, bytes)
    Files.move(tmp, dir.resolve(s"${name}_round_$round.bin"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def readBlob(name: String, round: Int): Option[Array[Byte]] = {
    val p = Paths.get(stateDir, "_blobs", s"${name}_round_$round.bin")
    if (Files.exists(p)) Some(Files.readAllBytes(p)) else None
  }

  /** Flat string map of a committed round's manifest (carries e.g. the
    * cumulative seen count so rounds never recount the full history).
    */
  def readManifest(round: Int): Option[Map[String, String]] = {
    val p = manifestDir.resolve(s"round_$round.json")
    if (!Files.exists(p)) return None
    // a real JSON parse (not a regex): values containing ',', '}', '"' or
    // escapes survive as commit() grows fields
    graft.extract.Json.parse(Files.readString(p)) match {
      case o: graft.extract.Json.JObj =>
        Some(o.entries.map { case (k, v) => k -> graft.extract.Json.pyStr(v) }.toMap)
      case _ => None
    }
  }

  /** Commit a round: manifest written last, after all table writes landed. */
  def commit(round: Int, info: Map[String, Any]): Unit = {
    Files.createDirectories(manifestDir)
    val json = info.map {
      case (k, v: String) => s""""$k": "$v""""
      case (k, v) => s""""$k": $v"""
    }.mkString("{", ", ", "}")
    val tmp = manifestDir.resolve(s".round_$round.json.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, manifestDir.resolve(s"round_$round.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }
}
