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
    */
  def readCommitted(table: String): Option[DataFrame] = {
    val rounds = committedRounds
    val paths = rounds.map(r => s"$stateDir/$table/round=$r")
      .filter(p => Files.isDirectory(Paths.get(p)))
    if (paths.isEmpty) None
    else Some(spark.read.parquet(paths: _*))
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
    * (needed by MERGE-at-read compaction to order versions).
    */
  def readCommittedWithRound(table: String): Option[DataFrame] = {
    val rounds = committedRounds
      .filter(r => Files.isDirectory(Paths.get(s"$stateDir/$table/round=$r")))
    if (rounds.isEmpty) None
    else Some(rounds.map { r =>
      spark.read.parquet(s"$stateDir/$table/round=$r")
        .withColumn("_round", org.apache.spark.sql.functions.lit(r))
    }.reduce(_ unionByName _))
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
