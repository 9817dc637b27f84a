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
 * The decode kernels are STUBS — image/audio codec libraries are not
 * available in this environment, so [[decodeStub]] produces a
 * deterministic fake "decoded" buffer from the payload bytes. The
 * Spark-side plumbing is real and is what's under test: the schema
 * (binary + struct metadata round-trips through Parquet), the typed
 * Dataset boundary, the mapPartitions batch shape (one decoder
 * instance per partition, amortized over all rows in it — the same
 * shape a JNI codec or an inference runtime needs), and the
 * partitioning contract (repartition by size budget before the
 * expensive stage so batches are balanced).
 *
 * Scale: decode/feature-extract is the most expensive narrow stage of
 * a multimodal pipeline; the design rule is: never shuffle payload
 * bytes (repartition BEFORE attaching payloads when possible — here
 * the generator emits directly into the target partitioning), and
 * carry only (media_id, embedding) forward to joins/dedup stages.
 */
object Multimodal {

  /** Deterministic synthetic media corpus (seeded; payload bytes from
    * the xorshift stream, sized by kind). */
  def synthesize(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRecord] = {
    implicit val enc = Encoders.product[MediaRecord]
    spark.range(n).mapPartitions { it =>
      it.map { i =>
        val rng = new graft.gen.TokenGen.Rng(seed ^ (i * 0x9E3779B97F4A7C15L + 7))
        val kind = Seq("image", "audio", "video")(rng.nextInt(3))
        val size = 256 + rng.nextInt(1024)
        val payload = Array.fill(size)(rng.nextLong().toByte)
        val meta = kind match {
          case "image" => MediaMeta(32 + rng.nextInt(992), 32 + rng.nextInt(992), 0, 1)
          case "audio" => MediaMeta(0, 0, 16000, 0)
          case _       => MediaMeta(640, 360, 0, 1 + rng.nextInt(300))
        }
        MediaRecord(f"m-$i%08d", kind, payload, meta)
      }
    }
  }

  /**
   * Pluggable decode boundary: the sandbox ships no codec libraries,
   * so the default implementation is the deterministic stub — a real
   * deployment drops in a JNI/codec-backed instance with the same
   * signature and the pipeline shape is unchanged (the claim "same
   * shape a real codec needs" is structural, not prose). Ships to
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

  /** Feature extraction in per-partition batches: one decoder init per
    * partition (the expensive setup a real codec/model would pay),
    * then a tight loop over rows. */
  def extractFeatures(
      media: Dataset[MediaRecord], dim: Int = 64,
      decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] = {
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
