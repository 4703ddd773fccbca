package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata; decode / feature-extract run as typed
  * mapPartitions stages (the JVM analog of `mapInPandas` batch UDFs).
  *
  * PNG and JPEG decode is REAL — [[ImageIoDecoder]] runs `javax.imageio`
  * (ships with the JDK, no external codec libs) on the executors for true
  * dimensions and a pixel-derived feature vector. Other media kinds
  * (audio/video — their codecs are not in this container) fall back to
  * [[StubDecoder]], which produces deterministic fake features so the
  * Spark-side plumbing (schema, batch iteration, partitioning, downstream
  * joins) stays real and tested; swap in a real decoder (JNI/javacpp
  * ffmpeg) without touching the plan.
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

  /** Real image decode via the JDK's `javax.imageio` (PNG + JPEG): true
    * width/height from the codec and an 8-bin luminance histogram feature.
    * Non-image payloads (and undecodable bytes) fall back to [[StubDecoder]]
    * so mixed media tables decode in one pass.
    */
  object ImageIoDecoder extends MediaDecoder {
    private def isPng(b: Array[Byte]): Boolean =
      b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'
    private def isJpeg(b: Array[Byte]): Boolean =
      b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8

    override def decode(row: MediaRow): MediaMeta = {
      val bytes = row.media
      if (!isPng(bytes) && !isJpeg(bytes)) return StubDecoder.decode(row)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) return StubDecoder.decode(row) // truncated/corrupt
      val (w, h) = (img.getWidth, img.getHeight)
      // 8-bin luminance histogram, strided so huge frames stay O(1k) samples
      val counts = new Array[Long](8)
      val stride = math.max(1, (w.toLong * h / 1024).toInt)
      var idx = 0
      var sampled = 0L
      while (idx < w * h) {
        val rgb = img.getRGB(idx % w, idx / w)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        counts(lum >> 5) += 1
        sampled += 1
        idx += stride
      }
      val feat = counts.map(c => c.toFloat / sampled).toSeq
      val header = bytes.take(4).map(b => f"${b & 0xff}%02x").mkString
      val kind = if (isPng(bytes)) "image/png" else "image/jpeg"
      MediaMeta(row.doc_id, kind, bytes.length.toLong, header, w, h, feat)
    }
  }

  final case class AudioMeta(
      doc_id: Long,
      kind: String,
      n_bytes: Long,
      sample_rate: Int,
      channels: Int,
      n_frames: Long)

  /** Real WAV decode via the JDK's `javax.sound.sampled` (no external
    * libs): container-level sample rate / channels / frame count. Non-WAV
    * payloads (video and exotic audio — their codecs are not in this
    * container) report -1s, keeping the one-pass mixed-table shape.
    */
  def decodeAudioMeta(media: DataFrame): Dataset[AudioMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media", "kind").as[MediaRow]
      .mapPartitions(_.map { row =>
        val b = row.media
        val isWav = b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
          b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'
        if (!isWav) AudioMeta(row.doc_id, row.kind, b.length.toLong, -1, -1, -1L)
        else {
          val fmt = javax.sound.sampled.AudioSystem
            .getAudioFileFormat(new java.io.ByteArrayInputStream(b))
          AudioMeta(row.doc_id, "audio/wav", b.length.toLong,
            fmt.getFormat.getSampleRate.toInt, fmt.getFormat.getChannels,
            fmt.getFrameLength.toLong)
        }
      })
  }

  /** Synthetic REAL WAV payloads, one per doc_id: deterministic sample rate
    * ({8000, 16000, 22050, 44100}), channels (1-2), frame count and 16-bit
    * PCM samples, encoded with the JDK WAVE writer on the executors — true
    * audio bytes for decoder tests and the m3 oracle, no external fixtures.
    */
  def syntheticWav(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions(_.map { id =>
      val rates = Array(8000, 16000, 22050, 44100)
      val rate = rates((id % 4).toInt)
      val channels = 1 + (id % 2).toInt
      val frames = 200 + (id % 800).toInt
      val pcm = new Array[Byte](frames * channels * 2)
      var i = 0
      while (i < frames * channels) {
        val v = (((id * 31 + i * 7) % 65536) - 32768).toShort
        pcm(2 * i) = (v & 0xff).toByte        // little-endian per WAV PCM
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, channels,
        true, false)
      val stream = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(stream,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      (id, bos.toByteArray)
    }).toDF("doc_id", "media").withColumn("kind", lit("audio/wav"))
  }

  /** Wrap a text table as a media table (synthetic payloads: utf-8 bytes). */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "utf-8").as("media"),
      lit("image/fake").as("kind"))

  /** Synthetic REAL PNG payloads, one per doc_id: deterministic dimensions
    * (16+id%48 × 16+(id/7)%40) and a deterministic diagonal-stripe fill,
    * encoded with the JDK PNG writer on the executors. Gives decoder tests
    * and the m2 oracle true image bytes with no external fixtures.
    */
  def syntheticPng(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // no executor temp files
      it.map { id =>
        val w = 16 + (id % 48).toInt
        val h = 16 + ((id / 7) % 40).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var x = 0
        while (x < w) {
          img.setRGB(x, ((x + id) % h).toInt, 0xff0000 | (id & 0xff).toInt)
          x += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (id, bos.toByteArray)
      }
    }.toDF("doc_id", "media").withColumn("kind", lit("image/png"))
  }

  /** The decode stage: typed mapPartitions over binary batches. */
  def decodeMeta(media: DataFrame, decoder: MediaDecoder = StubDecoder): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media", "kind").as[MediaRow]
      .mapPartitions(batch => batch.map(decoder.decode))
  }
}
