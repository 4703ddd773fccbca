package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata; decode / feature-extract run as typed
  * mapPartitions stages (the JVM analog of `mapInPandas` batch UDFs).
  *
  * The actual codec is STUBBED — image/audio libraries are not in this
  * container — behind [[MediaDecoder]]; [[StubDecoder]] produces
  * deterministic fake features so the Spark-side plumbing (schema, batch
  * iteration, partitioning, downstream joins) is real and tested. Swap in a
  * real decoder (JNI/javacpp ffmpeg, ImageIO) without touching the plan.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media: Array[Byte], kind: String)

  final case class MediaMeta(
      doc_id: Long,
      kind: String,
      n_bytes: Long,
      header_hex: String,
      // decode output (stubbed): dimensions + a small feature vector
      width: Int,
      height: Int,
      feature: Seq[Float])

  /** Decoder contract: one batch (partition iterator) at a time, mirroring
    * the batch shape of an Arrow/pandas UDF.
    */
  trait MediaDecoder extends Serializable {
    def decode(row: MediaRow): MediaMeta
  }

  /** Deterministic fake decode: dimensions and features derive only from the
    * payload bytes. A real implementation would replace exactly this class.
    */
  object StubDecoder extends MediaDecoder {
    override def decode(row: MediaRow): MediaMeta = {
      val bytes = row.media
      val n = bytes.length
      val header = bytes.take(4).map(b => f"${b & 0xff}%02x").mkString
      val fakeW = 16 + math.abs(scala.util.hashing.MurmurHash3.bytesHash(bytes, 1)) % 1024
      val fakeH = 16 + math.abs(scala.util.hashing.MurmurHash3.bytesHash(bytes, 2)) % 1024
      val feat = (0 until 8).map { i =>
        val h = scala.util.hashing.MurmurHash3.bytesHash(bytes, 100 + i)
        (h % 1000) / 1000.0f
      }
      MediaMeta(row.doc_id, row.kind, n.toLong, header, fakeW, fakeH, feat)
    }
  }

  /** Wrap a text table as a media table (synthetic payloads: utf-8 bytes). */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "utf-8").as("media"),
      lit("image/fake").as("kind"))

  /** The decode stage: typed mapPartitions over binary batches. */
  def decodeMeta(media: DataFrame, decoder: MediaDecoder = StubDecoder): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media", "kind").as[MediaRow]
      .mapPartitions(batch => batch.map(decoder.decode))
  }
}
