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
}
