package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: opaque binary payloads + typed metadata.
  *
  * The convention (SURVEY §1 extension types): a modality column is
  * `BinaryType` payload alongside a `StructType` metadata column
  * (media_type, byte_len, content hash). All Spark-side plumbing — schema,
  * partition-friendly projections, per-partition batch decode — is real and
  * tested; the actual media decode is a clearly-marked deterministic STUB
  * (no image/audio codecs in this environment). Swapping `stubDecode` for a
  * real codec (or routing the batch iterator to a Python worker via Arrow)
  * changes nothing structurally: the batch shape, schema, and partitioning
  * stay as-is.
  */
object Multimodal {

  /** Attach a binary payload + metadata struct derived from a text column —
    * the fixture stand-in for ingesting raw media bytes.
    */
  def withPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("text/plain;fake=image").as("media_type"),
        length(encode(col(textCol), "UTF-8")).as("byte_len"),
        sha2(encode(col(textCol), "UTF-8"), 256).as("sha256")).as("meta"))

  /** Cheap metadata extraction — pure projection, no decode needed. */
  def metadata(withBytes: DataFrame, idCol: String): DataFrame =
    withBytes.select(col(idCol),
      col("meta.media_type").as("media_type"),
      col("meta.byte_len").as("byte_len"),
      col("meta.sha256").as("sha256"))

  case class DecodedFrame(id: Long, frame_no: Int, width: Int, height: Int,
                          mean_intensity: Double)

  /** Batch "decode": iterate each partition once, emit per-frame rows.
    *
    * STUB — a real implementation replaces the body of `decodeOne` with a
    * codec call (e.g. libjpeg via JNI, or ship the iterator to a Python
    * worker as Arrow batches). The deterministic fake derives frame count
    * and dimensions from the payload bytes so tests can pin results.
    * Partition-level iteration (not per-row UDF) is the shape that lets a
    * real codec amortize setup per batch.
    */
  def decodeFrames(withBytes: DataFrame, idCol: String): DataFrame = {
    val spark = withBytes.sparkSession
    import spark.implicits._
    withBytes.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it: Iterator[(Long, Array[Byte])] =>
        it.flatMap { case (id, bytes) => decodeOne(id, bytes) }
      }
      .toDF()
  }

  /** STUB decode: deterministic pseudo-frames from the byte content. */
  private def decodeOne(id: Long, bytes: Array[Byte]): Seq[DecodedFrame] = {
    val nFrames = 1 + (bytes.length % 3)
    (0 until nFrames).map { f =>
      val w = 64 + (bytes.length % 64)
      val slice = bytes.drop(f * 16).take(64)
      val mean =
        if (slice.isEmpty) 0.0
        else slice.map(b => (b & 0xff).toLong).sum.toDouble / slice.length
      DecodedFrame(id, f, w, w / 2, mean)
    }
  }

  /** Keep every `everyK`-th frame (frame 0 always kept) — temporal
    * sampling after decode. Pure filter: no UDF, no re-decode.
    */
  def sampleFrames(decoded: DataFrame, everyK: Int,
                   frameCol: String = "frame_no"): DataFrame = {
    require(everyK >= 1, "everyK must be >= 1")
    decoded.filter(col(frameCol) % everyK === 0)
  }

  case class Feature(id: Long, feature: Array[Float])

  /** Batch feature extraction: one fixed-`dim` float vector per payload —
    * the media-to-embedding bridge whose output plugs straight into the
    * `Similarity` operators (`bruteForceTopK`/`lshTopK`/`ivfTopK` over a
    * `feature` column).
    *
    * STUB — a real implementation replaces `stubFeature` with an encoder
    * call (ONNX/JNI, or ship the partition iterator to a Python worker as
    * Arrow batches). Partition-level iteration amortizes model load per
    * batch, exactly like [[decodeFrames]]; the deterministic fake folds
    * byte content into the vector so specs can pin results.
    */
  def extractFeatures(withBytes: DataFrame, idCol: String,
                      dim: Int = 16): DataFrame = {
    require(dim >= 1, "dim must be >= 1")
    val spark = withBytes.sparkSession
    import spark.implicits._
    withBytes.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        Feature(id, stubFeature(bytes, dim)) })
      .toDF(idCol, "feature")
  }

  /** STUB encoder: strided byte folding, L2-normalized. Deterministic in
    * the payload alone (partition- and order-invariant).
    */
  private def stubFeature(bytes: Array[Byte], dim: Int): Array[Float] = {
    val acc = Array.fill(dim)(0.0)
    var j = 0
    while (j < bytes.length) {
      acc(j % dim) += (bytes(j) & 0xff) * (1.0 + (j / dim) % 7)
      j += 1
    }
    val norm = math.sqrt(acc.map(v => v * v).sum)
    if (norm == 0) acc.map(_.toFloat)
    else acc.map(v => (v / norm).toFloat)
  }

  /** Batch "resize": re-encode each payload to exactly `targetBytes`
    * (cycle-padded / truncated) with refreshed metadata — the
    * normalize-before-training step for media columns.
    *
    * STUB — a real implementation decodes, resamples (image scale /
    * audio rate), and re-encodes inside the same partition iterator; the
    * byte-cycling fake keeps the schema, metadata refresh, and batch
    * shape identical to what a codec-backed version produces.
    */
  def resizePayloads(withBytes: DataFrame, idCol: String,
                     targetBytes: Int): DataFrame = {
    require(targetBytes >= 1, "targetBytes must be >= 1")
    val spark = withBytes.sparkSession
    import spark.implicits._
    withBytes.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, bytes) =>
          val out = Array.tabulate[Byte](targetBytes) { i =>
            if (bytes.isEmpty) 0.toByte else bytes(i % bytes.length)
          }
          md.reset()
          val sha = md.digest(out).map("%02x".format(_)).mkString
          (id, out, s"text/plain;fake=image;resized=$targetBytes",
            out.length, sha)
        }
      }
      .toDF(idCol, "payload", "media_type", "byte_len", "sha256")
      .select(col(idCol), col("payload"),
        struct(col("media_type"), col("byte_len"), col("sha256")).as("meta"))
  }
}
