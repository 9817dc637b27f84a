package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata for an opaque media payload. Nullable fields apply
  * per kind (image: width/height; audio: sample_rate/n_samples;
  * video: width/height/fps/n_frames). */
final case class MediaMeta(
    width: Int,
    height: Int,
    sample_rate: Int,
    n_frames: Int)

/** One media row: binary payload + typed metadata. The payload column
  * is `binary` — Parquet stores it verbatim, Spark never interprets
  * it; only the decode stage touches bytes. */
final case class MediaRecord(
    media_id: String,
    kind: String, // image | audio | video
    payload: Array[Byte],
    meta: MediaMeta)

final case class MediaFeatures(
    media_id: String,
    kind: String,
    n_bytes: Int,
    embedding: Array[Float])

/**
 * Multimodal column handling: image/audio/video as opaque `binary`
 * columns with typed metadata, processed in per-partition batches.
 *
 * Image and audio decode are REAL (JDK-only codecs — no new
 * dependencies): [[synthesize]] emits genuine PNG payloads (encoded
 * via `javax.imageio`) and genuine WAV/PCM16 payloads (canonical RIFF
 * header, hand-built), and [[JdkDecoder]] decodes them back to pixels
 * / samples before feature folding. Only the `video` kind remains a
 * STUB ([[StubDecoder]] byte-fold — no video codec ships with the
 * JDK); a real deployment drops a JNI/codec-backed [[MediaDecoder]]
 * in with the same signature. The Spark-side plumbing is identical
 * either way: the schema (binary + struct metadata round-trips
 * through Parquet), the typed Dataset boundary, the mapPartitions
 * batch shape (one decoder instance per partition, amortized over all
 * rows in it — the same shape a JNI codec or an inference runtime
 * needs), and the partitioning contract.
 *
 * Scale: decode/feature-extract is the most expensive narrow stage of
 * a multimodal pipeline; the design rule is: never shuffle payload
 * bytes (repartition BEFORE attaching payloads when possible — here
 * the generator emits directly into the target partitioning), and
 * carry only (media_id, embedding) forward to joins/dedup stages.
 */
object Multimodal {

  /** Encode an RGB pixel grid as a real PNG via javax.imageio. */
  def encodePng(w: Int, h: Int, rgb: Array[Int]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, rgb, 0, w)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Encode PCM16 mono samples as a canonical 44-byte-header WAV. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Deterministic synthetic media corpus (seeded): REAL PNG payloads
    * for images, REAL WAV/PCM16 payloads for audio, opaque seeded
    * bytes for video (the one kind whose decode stays stubbed). */
  def synthesize(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRecord] = {
    implicit val enc = Encoders.product[MediaRecord]
    spark.range(n).mapPartitions { it =>
      it.map { i =>
        val rng = new graft.gen.TokenGen.Rng(seed ^ (i * 0x9E3779B97F4A7C15L + 7))
        val kind = Seq("image", "audio", "video")(rng.nextInt(3))
        kind match {
          case "image" =>
            val w = 8 + rng.nextInt(17) // 8..24 px
            val h = 8 + rng.nextInt(17)
            val rgb = Array.fill(w * h)(rng.nextInt(0x1000000))
            MediaRecord(f"m-$i%08d", kind, encodePng(w, h, rgb),
              MediaMeta(w, h, 0, 1))
          case "audio" =>
            val nSamp = 200 + rng.nextInt(600)
            val samples = Array.fill(nSamp)(rng.nextInt(65536).toShort)
            MediaRecord(f"m-$i%08d", kind, encodeWav(16000, samples),
              MediaMeta(0, 0, 16000, nSamp))
          case _ =>
            val size = 256 + rng.nextInt(1024)
            MediaRecord(f"m-$i%08d", kind,
              Array.fill(size)(rng.nextLong().toByte),
              MediaMeta(640, 360, 0, 1 + rng.nextInt(300)))
        }
      }
    }
  }

  /**
   * Pluggable decode boundary: the default implementation is
   * [[JdkDecoder]] (real PNG + WAV decode, JDK-only); a deployment
   * with native codecs drops in a JNI-backed instance with the same
   * signature and the pipeline shape is unchanged. Ships to
   * executors once; [[init]] runs once per PARTITION before the row
   * loop, where an implementation acquires its expensive native state
   * (codec handle, inference session).
   */
  trait MediaDecoder extends Serializable {
    def init(): Unit = ()
    def decode(kind: String, payload: Array[Byte], dim: Int): Array[Float]
  }

  /** STUB decode: a real implementation would dispatch on `kind` to an
    * image codec / audio resampler / video frame sampler. The
    * deterministic stand-in folds payload bytes into a fixed-length
    * float vector, so downstream stages (ANN, dedup, joins) exercise
    * realistic shapes and the whole pipeline stays reproducible. */
  object StubDecoder extends MediaDecoder {
    def decode(kind: String, payload: Array[Byte], dim: Int): Array[Float] = {
      // a real codec call goes here (codecs unavailable in this sandbox)
      val out = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        val d = i % dim
        out(d) += (payload(i) & 0xff) / 255.0f - 0.5f
        i += 1
      }
      out
    }
  }

  /** Kept for existing call sites/oracles: stub decode of one payload. */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] =
    StubDecoder.decode("", payload, dim)

  /** REAL decoder, JDK-only (round-3 verdict #4): PNG via
    * `javax.imageio` (the JDK ships PNG/BMP/GIF readers), WAV/PCM16
    * via a RIFF parser — both decode the genuine formats
    * [[synthesize]] emits, then fold the DECODED signal (pixels /
    * samples, not payload bytes) into the feature vector. `video`
    * falls back to the stub byte-fold (no JDK video codec). */
  object JdkDecoder extends MediaDecoder {

    /** Decoded grayscale intensities in [0,1], row-major. */
    def decodePixels(payload: Array[Byte]): Array[Float] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, "imageio could not decode payload")
      val w = img.getWidth; val h = img.getHeight
      val rgb = img.getRGB(0, 0, w, h, null, 0, w)
      rgb.map { p =>
        val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
        (0.299f * r + 0.587f * g + 0.114f * b) / 255.0f
      }
    }

    /** Decoded PCM16 samples in [-1,1] from a canonical mono WAV. */
    def decodeSamples(payload: Array[Byte]): Array[Float] = {
      val bb = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      require(payload.length >= 44 &&
        payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F' &&
        payload(8) == 'W' && payload(9) == 'A' && payload(10) == 'V' && payload(11) == 'E',
        "not a RIFF/WAVE payload")
      // walk chunks to the data chunk (robust to extra chunks)
      var pos = 12
      var dataOff = -1; var dataLen = 0
      while (dataOff < 0 && pos + 8 <= payload.length) {
        val id = new String(payload, pos, 4, "US-ASCII")
        val len = bb.getInt(pos + 4)
        if (id == "data") { dataOff = pos + 8; dataLen = len }
        else {
          // a corrupt negative length would stall the walk (len = -8
          // advances by 0) — fail fast like every other malformed input
          require(len >= 0, s"malformed WAV chunk '$id' length $len")
          pos += 8 + len + (len & 1)
        }
      }
      require(dataOff > 0, "WAV data chunk not found")
      val n = math.min(dataLen, payload.length - dataOff) / 2
      Array.tabulate(n)(k => bb.getShort(dataOff + 2 * k) / 32768.0f)
    }

    private def fold(signal: Array[Float], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < signal.length) { out(i % dim) += signal(i); i += 1 }
      out
    }

    def decode(kind: String, payload: Array[Byte], dim: Int): Array[Float] =
      kind match {
        case "image" => fold(decodePixels(payload), dim)
        case "audio" => fold(decodeSamples(payload), dim)
        case _       => StubDecoder.decode(kind, payload, dim) // video: stub
      }
  }

  /** Feature extraction in per-partition batches: one decoder init per
    * partition (the expensive setup a real codec/model would pay),
    * then a tight loop over rows. */
  def extractFeatures(
      media: Dataset[MediaRecord], dim: Int = 64,
      decoder: MediaDecoder = JdkDecoder): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      decoder.init() // per-partition init (codec handle, model session)
      rows.map { m =>
        MediaFeatures(m.media_id, m.kind, m.payload.length,
          decoder.decode(m.kind, m.payload, dim))
      }
    }
  }

  /** Per-kind stats over the features — the monitoring projection. */
  def kindStats(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF()
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        avg(size(col("embedding"))).cast("int").as("dim"))
      .orderBy(col("kind"))
}
