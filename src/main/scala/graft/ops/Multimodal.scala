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

  /** Aspect-preserving downscale target, in EXACT integer arithmetic (so an
    * oracle can recompute it without FP edge cases): images already within
    * the box pass through; otherwise the binding side pins to the box and
    * the other side scales by integer ratio.
    */
  def fitWithin(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) =
    if (w <= maxW && h <= maxH) (w, h)
    else if (maxW.toLong * h <= maxH.toLong * w)
      (maxW, math.max(1, (h.toLong * maxW / w).toInt))
    else (math.max(1, (w.toLong * maxH / h).toInt), maxH)

  /** Real image resize on the executors: decode (ImageIO), aspect-preserving
    * downscale into a `maxW`×`maxH` box ([[fitWithin]]), re-encode PNG.
    * Non-image payloads pass through untouched — one-pass mixed tables.
    * Schema is preserved (doc_id, media, kind), so resize composes with
    * [[decodeMeta]] and any downstream stage.
    */
  def resizeImages(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media", "kind").as[MediaRow]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { row =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.media))
            catch { case _: java.io.IOException => null }
          if (img == null) row
          else {
            val (nw, nh) = fitWithin(img.getWidth, img.getHeight, maxW, maxH)
            if (nw == img.getWidth && nh == img.getHeight) row
            else {
              val out = new java.awt.image.BufferedImage(nw, nh,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              g.drawImage(img, 0, 0, nw, nh, null)
              g.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              // the payload was re-encoded as PNG — the kind column must
              // say so (a resized JPEG carrying kind=image/jpeg would lie
              // to any consumer that trusts kind over magic bytes)
              MediaRow(row.doc_id, bos.toByteArray, "image/png")
            }
          }
        }
      }.toDF("doc_id", "media", "kind")
  }

  /** Length-prefixed frame container ("FPK1"): 4-byte magic, int32-BE frame
    * count, then per frame int32-BE length + payload. The video analog for
    * the sandbox — real video codecs aren't in this container, but the
    * frame-sampling PLUMBING (opaque binary → per-frame rows → decode) is
    * format-independent; swap the container parser for an ffmpeg demuxer
    * without touching the plan.
    */
  final case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Every `everyK`-th frame of each framepack as its own row — the
    * frame-sampling stage. Exploding mapPartitions: output rows ∝ sampled
    * frames, payloads stay executor-side.
    */
  def sampleFrames(media: DataFrame, everyK: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media", "kind").as[MediaRow]
      .flatMap { row =>
        val b = row.media
        if (b.length < 8 || b(0) != 'F' || b(1) != 'P' || b(2) != 'K' || b(3) != '1')
          Iterator.empty
        else {
          def be32(o: Int): Int =
            ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
              ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
          val n = be32(4)
          var off = 8
          // a truncated/corrupt container (negative or overlong length,
          // count beyond the buffer) must degrade like the bad-magic case —
          // emit the frames that parse, stop at the first violation, never
          // throw and fail the whole task
          val frames = Iterator.range(0, n).map { i =>
            if (off + 4 > b.length) (i, null: Array[Byte])
            else {
              val len = be32(off)
              // bounds check in Long arithmetic: a large positive len (e.g.
              // 0x7FFFFFF0) wraps `off + 4 + len` negative in Int and would
              // pass the guard only to throw in copyOfRange — exactly the
              // corrupt input this path promises to degrade gracefully on
              if (len < 0 || off.toLong + 4L + len > b.length) (i, null: Array[Byte])
              else {
                val payload = java.util.Arrays.copyOfRange(b, off + 4, off + 4 + len)
                off += 4 + len
                (i, payload)
              }
            }
          }.takeWhile(_._2 != null)
          frames.collect { case (i, p) if i % everyK == 0 => Frame(row.doc_id, i, p) }
        }
      }
  }

  /** Synthetic framepacks of REAL PNG frames: 3 + id%5 frames per doc, all
    * frames of a doc share deterministic dimensions (16+id%32 × 16+(id/3)%24)
    * with per-frame content.
    */
  def syntheticFramepack(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val n = 3 + (id % 5).toInt
        val w = 16 + (id % 32).toInt
        val h = 16 + ((id / 3) % 24).toInt
        val frames = (0 until n).map { f =>
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var x = 0
          while (x < w) {
            img.setRGB(x, ((x + id + f) % h).toInt, 0x00ff00 | ((id + f) & 0xff).toInt)
            x += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          bos.toByteArray
        }
        val out = new java.io.ByteArrayOutputStream()
        out.write(Array[Byte]('F', 'P', 'K', '1'))
        def be32(v: Int): Array[Byte] = Array(
          ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
          ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
        out.write(be32(n))
        frames.foreach { fb => out.write(be32(fb.length)); out.write(fb) }
        (id, out.toByteArray)
      }
    }.toDF("doc_id", "media").withColumn("kind", lit("video/framepack"))
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
