package graft.operators

import scala.util.chaining._

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: opaque binary payloads + typed metadata.
  *
  * The convention (SURVEY §1 extension types): a modality column is
  * `BinaryType` payload alongside a `StructType` metadata column
  * (media_type, byte_len, content hash). All Spark-side plumbing — schema,
  * partition-friendly projections, per-partition batch decode — is real and
  * tested. The image path is a REAL codec: payloads are genuine 24-bit BMP
  * streams ([[Bmp]] — header parse, row padding, bottom-up rows), decoded
  * per partition; frames, features, and resizes operate on actually-decoded
  * pixel samples. Non-BMP payloads fall back to a clearly-marked
  * deterministic stub (this container has no jpeg/audio codecs); swapping
  * that for another codec (or routing batches to a Python worker via
  * Arrow) changes nothing structurally — the batch shape, schema, and
  * partitioning stay as-is.
  */
object Multimodal {

  /** Shared modality metadata: media type + byte length + content hash of
    * the payload column. ONE definition — the oracle checks this shape, so
    * the modalities must not diverge.
    */
  private def withMeta(df: DataFrame, idCol: String, mediaType: String): DataFrame =
    withMetaCol(df, idCol, lit(mediaType))

  private def withMetaCol(df: DataFrame, idCol: String,
                          mediaType: org.apache.spark.sql.Column): DataFrame =
    df.select(col(idCol), col("payload"),
      struct(
        mediaType.as("media_type"),
        length(col("payload")).as("byte_len"),
        sha2(col("payload"), 256).as("sha256")).as("meta"))

  /** Attach a binary payload + metadata struct derived from a text column —
    * the fixture stand-in for ingesting raw media bytes (opaque non-BMP
    * path; decode falls back to the deterministic stub).
    */
  def withPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    withMeta(df.select(col(idCol), encode(col(textCol), "UTF-8").as("payload")),
      idCol, "text/plain;fake=image")

  /** Attach a REAL image payload: 1–3 concatenated 24-bit BMP frames whose
    * dimensions and pixels derive deterministically from the text bytes —
    * a genuine encoded media column (parseable by any BMP reader), not a
    * byte-blob stand-in. Batch-encoded per partition, like a real ingest.
    */
  def withBmpPayload(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val encoded = df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id, encodeFrames(text.getBytes("UTF-8")))
      })
      .toDF(idCol, "payload")
    withMeta(encoded, idCol, "image/bmp")
  }

  /** Attach a REAL PNG payload: the same deterministic frames as
    * [[withBmpPayload]] but zlib-compressed through the pure-JVM PNG
    * encoder — the format real multimodal corpora are dominated by,
    * exercising the full chunk/deflate/filter path on decode.
    */
  def withPngPayload(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val encoded = df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val frames = Bmp.decodeAll(encodeFrames(text.getBytes("UTF-8")))
        (id, Array.concat(frames.map(Png.encode): _*))
      })
      .toDF(idCol, "payload")
    withMeta(encoded, idCol, "image/png")
  }

  /** Attach a REAL JPEG payload: the same deterministic frames, but
    * DCT-compressed through the pure-JVM baseline JPEG encoder (4:2:0) —
    * the lossy format that dominates real web-crawl images, exercising
    * the full marker/Huffman/IDCT/upsample path on decode. Unlike the
    * BMP/PNG payloads the pixels round-trip only to within quantization
    * error; everything downstream of decode must treat them as signal,
    * not identity — exactly as with real crawled JPEGs.
    */
  def withJpegPayload(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val encoded = df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val frames = Bmp.decodeAll(encodeFrames(text.getBytes("UTF-8")))
        (id, Array.concat(frames.map(f => Jpeg.encode(f, subsample420 = true)): _*))
      })
      .toDF(idCol, "payload")
    withMeta(encoded, idCol, "image/jpeg")
  }

  /** Deterministic multi-frame BMP stream from seed bytes: frame count,
    * dimensions, and pixels are all functions of the content alone
    * (partition- and order-invariant, spec-pinnable).
    */
  private def encodeFrames(seed: Array[Byte]): Array[Byte] = {
    val n = 1 + (seed.length % 3)
    val frames = (0 until n).map { f =>
      val w = 8 + (seed.length % 9)
      val h = 6 + ((seed.length + f) % 5)
      val rgb = Array.tabulate[Byte](w * h * 3) { i =>
        if (seed.isEmpty) 0.toByte
        else seed((i * (f + 1) + f) % seed.length)
      }
      Bmp.encode(Bmp.Image(w, h, rgb))
    }
    Array.concat(frames: _*)
  }

  /** Cheap metadata extraction — pure projection, no decode needed. */
  def metadata(withBytes: DataFrame, idCol: String): DataFrame =
    withBytes.select(col(idCol),
      col("meta.media_type").as("media_type"),
      col("meta.byte_len").as("byte_len"),
      col("meta.sha256").as("sha256"))

  case class DecodedFrame(id: Long, frame_no: Int, width: Int, height: Int,
                          mean_intensity: Double)

  /** Batch decode: iterate each partition once, emit per-frame rows.
    *
    * BMP payloads go through the REAL codec ([[Bmp.decodeAll]]): width and
    * height come from parsed headers, mean intensity from decoded pixels.
    * Non-BMP payloads fall back to the deterministic stub (no other codecs
    * in this container — swapping the fallback for libjpeg-via-JNI or an
    * Arrow round-trip to a Python worker is a per-branch change).
    * Partition-level iteration (not per-row UDF) is the shape that lets a
    * codec amortize setup per batch.
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

  /** Route a payload to the real codec that can decode it — BMP or PNG
    * frames (both land on the shared [[Bmp.Image]] RGB surface) — or
    * None for opaque payloads (stub fallback). Full-structure sniffs,
    * NOT magic bytes alone: opaque text can start with "BM" ("BMW…")
    * and must fall back to the stub instead of crashing a strict codec.
    */
  private def imagesOf(bytes: Array[Byte]): Option[Seq[Bmp.Image]] =
    if (Bmp.looksLikeBmp(bytes)) Some(Bmp.decodeAll(bytes))
    else if (Png.looksLikePng(bytes)) Some(Png.decodeAll(bytes))
    else if (Jpeg.looksLikeJpeg(bytes)) Some(Jpeg.decodeAll(bytes))
    else None

  private def decodeOne(id: Long, bytes: Array[Byte]): Seq[DecodedFrame] =
    imagesOf(bytes) match {
      case Some(frames) =>
        frames.zipWithIndex.map { case (img, f) =>
          val g = img.gray
          val mean = if (g.isEmpty) 0.0 else g.map(_.toLong).sum.toDouble / g.length
          DecodedFrame(id, f, img.width, img.height, mean)
        }
      case None => stubDecode(id, bytes)
    }

  /** STUB decode for opaque non-BMP payloads: deterministic pseudo-frames
    * from the byte content.
    */
  private def stubDecode(id: Long, bytes: Array[Byte]): Seq[DecodedFrame] = {
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
    * BMP payloads are REALLY decoded first: the feature folds the decoded
    * grayscale pixel samples (all frames, in order), not the compressed
    * container bytes — so two encodings of the same pixels featurize
    * identically, the property a real encoder has and byte-folding lacks.
    * Non-BMP payloads fold raw bytes (stub fallback). The fold itself is
    * the dependency-free stand-in for a learned encoder (ONNX/JNI or an
    * Arrow round-trip replaces one function); partition-level iteration
    * amortizes model load per batch, exactly like [[decodeFrames]].
    */
  def extractFeatures(withBytes: DataFrame, idCol: String,
                      dim: Int = 16): DataFrame = {
    require(dim >= 1, "dim must be >= 1")
    val spark = withBytes.sparkSession
    import spark.implicits._
    withBytes.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        Feature(id, foldFeature(samplesOf(bytes), dim)) })
      .toDF(idCol, "feature")
  }

  /** Decoded sample stream of a payload: grayscale pixels for BMP media,
    * 8-bit-folded PCM samples for WAV media, raw bytes for opaque
    * payloads.
    */
  private def samplesOf(bytes: Array[Byte]): Array[Int] =
    imagesOf(bytes) match {
      case Some(frames) => frames.flatMap(_.gray).toArray
      case None if Wav.looksLikeWav(bytes) =>
        Wav.decode(bytes).samples.map(s => (s >> 8) + 128)
      case None => bytes.map(_ & 0xff)
    }

  /** Attach a REAL audio payload: a mono 16-bit PCM WAV whose samples
    * derive deterministically from the text bytes — genuine encoded media
    * (parseable by any WAV reader), batch-encoded per partition.
    */
  def withWavPayload(df: DataFrame, idCol: String, textCol: String,
                     sampleRate: Int = 8000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val encoded = df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val seed = text.getBytes("UTF-8")
        val n = 256 + (if (seed.isEmpty) 0 else seed.length % 512)
        val samples = Array.tabulate[Short](n) { i =>
          if (seed.isEmpty) 0
          else (((seed((i * 7 + 3) % seed.length) & 0xff) - 128) * 201).toShort
        }
        (id, Wav.encode(Wav.Audio(sampleRate, samples)))
      })
      .toDF(idCol, "payload")
    withMeta(encoded, idCol, "audio/wav")
  }

  case class DecodedAudio(id: Long, sample_rate: Int, n_samples: Int,
                          duration_ms: Long, rms_e6: Long, peak: Int)

  /** Batch audio decode: per payload, header + decoded-sample stats
    * (duration, RMS, peak). RMS is scaled to integer micro-units — float
    * summaries are not order-stable across engines, integers are.
    */
  def decodeAudio(withBytes: DataFrame, idCol: String): DataFrame = {
    val spark = withBytes.sparkSession
    import spark.implicits._
    withBytes.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val a = Wav.decode(bytes)
        DecodedAudio(id, a.sampleRate, a.samples.length,
          (a.durationSec * 1000).toLong, (a.rms * 1e6).toLong, a.peak)
      })
      .toDF()
  }

  case class AudioWindow(id: Long, window_no: Int, n_samples: Int, rms_e6: Long)

  /** Fixed-width analysis windows over decoded audio — the temporal
    * sampling analog of [[sampleFrames]] for the audio modality: one row
    * per `windowMs` window with its sample count and RMS.
    */
  def audioWindows(withBytes: DataFrame, idCol: String,
                   windowMs: Int = 125): DataFrame = {
    require(windowMs >= 1, "windowMs must be >= 1")
    val spark = withBytes.sparkSession
    import spark.implicits._
    withBytes.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val a = Wav.decode(bytes)
        val win = math.max(1, a.sampleRate * windowMs / 1000)
        a.samples.grouped(win).zipWithIndex.map { case (chunk, w) =>
          AudioWindow(id, w, chunk.length,
            (Wav.Audio(a.sampleRate, chunk).rms * 1e6).toLong)
        }
      })
      .toDF()
  }

  case class AudioPrint(id: Long, afp: Long)

  /** 64-bit perceptual AUDIO fingerprint — the audio member of the
    * signature family next to the image aHash: decode, split the clip
    * into 64 equal-span energy windows, and set bit i iff
    * `energy(i) > energy((i+1) mod 64)` (the energy-delta sign pattern
    * of the Haitsma–Kalker fingerprint family, reduced to one band).
    * Pure integer arithmetic over decoded samples — deterministic in
    * the payload bytes alone, so the staged signature table is
    * oracle-replayable exactly like the image hashes.
    */
  def audioFingerprints(withBytes: DataFrame, idCol: String): DataFrame = {
    val spark = withBytes.sparkSession
    import spark.implicits._
    withBytes.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val a = Wav.decode(bytes)
        val n = a.samples.length
        val e = Array.fill(64)(0L)
        var i = 0
        while (i < n) {
          // balanced spans: window w covers [w·n/64, (w+1)·n/64)
          e((i.toLong * 64 / math.max(n, 1)).toInt) += math.abs(a.samples(i).toLong)
          i += 1
        }
        var fp = 0L
        var w = 0
        while (w < 64) {
          if (e(w) > e((w + 1) % 64)) fp |= (1L << w)
          w += 1
        }
        AudioPrint(id, fp)
      })
      .toDF()
  }

  /** Audio near-dup mining: the hamming-LSH band miner is MODALITY-
    * AGNOSTIC — any 64-bit perceptual signature mines with the same
    * corpus-sized band tuples (pigeonhole-exact recall at ≤ 6 bits,
    * single bands at 7), capped buckets, and `bit_count(xor)` verify.
    * This is [[imageNearDupPairs]] over the audio fingerprint column;
    * one miner, two modalities, one oracle replay shape.
    */
  def audioNearDupPairs(prints: DataFrame, maxHamming: Int = 6,
                        maxBandSize: Option[Int] = Some(1000),
                        arity: Option[Int] = None): DataFrame =
    imageNearDupPairs(prints.select(col("id"), col("afp").as("ahash")),
      maxHamming, maxBandSize, arity)

  /** REAL audio resample: decode, nearest-neighbor rate-convert,
    * re-encode with refreshed metadata — [[resizeImages]] for the audio
    * modality.
    */
  def resampleAudio(withBytes: DataFrame, idCol: String,
                    targetRate: Int): DataFrame = {
    require(targetRate >= 1, "targetRate must be >= 1")
    val spark = withBytes.sparkSession
    import spark.implicits._
    withBytes.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        (id, Wav.encode(Wav.resample(Wav.decode(bytes), targetRate)))
      })
      .toDF(idCol, "payload")
      .pipe(withMeta(_, idCol, s"audio/wav;rate=$targetRate"))
  }

  /** Strided sample folding, L2-normalized — deterministic in the decoded
    * samples alone (partition- and order-invariant).
    */
  private def foldFeature(samples: Array[Int], dim: Int): Array[Float] = {
    val acc = Array.fill(dim)(0.0)
    var j = 0
    while (j < samples.length) {
      acc(j % dim) += samples(j) * (1.0 + (j / dim) % 7)
      j += 1
    }
    val norm = math.sqrt(acc.map(v => v * v).sum)
    if (norm == 0) acc.map(_.toFloat)
    else acc.map(v => (v / norm).toFloat)
  }

  /** REAL image resize: decode every BMP frame, nearest-neighbor resample
    * to `targetW`×`targetH`, re-encode, refresh metadata — the
    * normalize-before-training step for media columns, decode→resample→
    * re-encode inside one partition iterator like a production transcoder.
    */
  def resizeImages(withBytes: DataFrame, idCol: String,
                   targetW: Int, targetH: Int): DataFrame = {
    require(targetW >= 1 && targetH >= 1, "target dimensions must be >= 1")
    val spark = withBytes.sparkSession
    import spark.implicits._
    withBytes.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        // re-encode in the payload's OWN container: a transcoder that
        // silently converts PNG input to BMP output would corrupt any
        // downstream consumer keyed on the column's media type
        val isPng = Png.looksLikePng(bytes)
        val isJpeg = !isPng && Jpeg.looksLikeJpeg(bytes)
        val frames =
          if (isPng)
            Png.decodeAll(bytes).map(f => Png.encode(Bmp.resize(f, targetW, targetH)))
          else if (isJpeg)
            Jpeg.decodeAll(bytes).map(f =>
              Jpeg.encode(Bmp.resize(f, targetW, targetH), subsample420 = true))
          else Bmp.decodeAll(bytes).map(f => Bmp.encode(Bmp.resize(f, targetW, targetH)))
        val mt = (if (isPng) "image/png" else if (isJpeg) "image/jpeg"
                  else "image/bmp") + s";resized=${targetW}x$targetH"
        (id, Array.concat(frames: _*), mt)
      })
      .toDF(idCol, "payload", "__media_type")
      .pipe(withMetaCol(_, idCol, col("__media_type")))
  }

  case class FrameHash(id: Long, frame_no: Int, ahash: Long)

  /** Perceptual 64-bit average-hash (aHash — public knowledge: downscale
    * to 8×8 grayscale, threshold each cell at the frame mean, read the
    * bits row-major) per decoded frame. BMP payloads go through the REAL
    * codec + nearest-neighbor resample; opaque payloads hash a
    * deterministic 64-sample fold of their bytes (stub fallback, same
    * convention as [[decodeFrames]]). Pure per-partition projection — the
    * hash is the compact stand-in the near-dup miner shuffles instead of
    * pixels.
    */
  def imageHashes(withBytes: DataFrame, idCol: String): DataFrame = {
    val spark = withBytes.sparkSession
    import spark.implicits._
    withBytes.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val grids: Seq[Array[Int]] =
          imagesOf(bytes) match {
            case Some(frames) => frames.map(f => Bmp.resize(f, 8, 8).gray)
            case None =>
              val s = if (bytes.isEmpty) Array(0) else bytes.map(_ & 0xff)
              Seq(Array.tabulate(64)(i => s((i.toLong * s.length / 64).toInt)))
          }
        grids.zipWithIndex.map { case (g, f) => FrameHash(id, f, aHash(g)) }
      })
      .toDF()
  }

  /** 64 grayscale cells → 64-bit hash: bit i (MSB-first) set iff
    * cell i ≥ the integer mean. Integer arithmetic throughout —
    * reproducible everywhere.
    */
  private def aHash(cells: Array[Int]): Long = {
    val mean = cells.map(_.toLong).sum / cells.length
    cells.take(64).zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
      if (v >= mean) acc | (1L << (63 - i)) else acc
    }
  }

  /** (id, ahash, band, bv): the 8 byte-bands of each 64-bit hash — the
    * hamming-LSH bucketing key shared by the batch pair miner and the
    * streaming vs-index detector (they MUST band identically or the
    * pigeonhole recall argument breaks across the pair).
    */
  private[graft] def bandRows(hashes: DataFrame): DataFrame =
    hashes.select(col("id"), col("ahash"),
        explode(array((0 until 8).map(b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("ahash"), b * 8)
              .bitwiseAND(lit(255L)).as("bv"))): _*)).as("e"))
      .select(col("id"), col("ahash"), col("e.band"), col("e.bv"))

  /** (id, ahash, band, bv): the C(8,2) = 28 byte-band PAIRS of each
    * 64-bit hash — band = i·8+j, bv = bv_i·256+bv_j, a 16-bit bucket
    * value space. Pigeonhole-EXACT for hamming ≤ 6: each flipped bit
    * dirties exactly one byte-band, so 6 flips leave ≥ 2 of the 8 bands
    * clean and that pair's key matches. The single-band key (256 values
    * per band) SATURATES at corpus scale — by pigeonhole every bucket
    * holds ≥ n/256 ids, so candidates grow Ω(n²/2048) no matter how the
    * corpus is distributed (measured: 100 s for 100 k signatures, with
    * the 1000-cap silently dropping most buckets at the next decade);
    * the 65 536-value pair key holds the same exactness bound to ~10⁸
    * signatures. This is [[bandTupleRows]] at arity 2, kept verbatim —
    * its band-id/key layout is what the DuckDB oracles and the streaming
    * detector replay.
    */
  private[graft] def pairBandRows(hashes: DataFrame): DataFrame = {
    val combos = for { i <- 0 until 8; j <- (i + 1) until 8 } yield (i, j)
    hashes.select(col("id"), col("ahash"),
        explode(array(combos.map { case (i, j) =>
          struct(lit(i * 8 + j).as("band"),
            (shiftrightunsigned(col("ahash"), i * 8)
               .bitwiseAND(lit(255L)) * lit(256L) +
             shiftrightunsigned(col("ahash"), j * 8)
               .bitwiseAND(lit(255L))).as("bv"))
        }: _*)).as("e"))
      .select(col("id"), col("ahash"), col("e.band"), col("e.bv"))
  }

  /** Band layout for tuple arity `k` at the hamming-6 recall budget:
    * B = 6 + k bands over the 64 bits, widths as even as 64/B allows
    * (the first 64 mod B bands take the extra bit). Any ≤ 6 flipped
    * bits dirty ≤ 6 bands, leaving ≥ k clean — so the k-subset of clean
    * bands is one of the emitted tuple keys and recall stays
    * pigeonhole-EXACT at every arity. Returns (startBit, width) per
    * band.
    */
  private[graft] def bandLayout(arity: Int): Seq[(Int, Int)] = {
    require(arity >= 2, s"bandLayout: arity must be >= 2, got $arity")
    val b = 6 + arity
    val base = 64 / b
    val extra = 64 % b
    val widths = Seq.tabulate(b)(i => if (i < extra) base + 1 else base)
    widths.scanLeft(0)(_ + _).zip(widths).map { case (s, w) => (s, w) }
  }

  /** Tuple arity for a signature corpus of `n`, the [[bandLayout]]
    * occupancy knob — the autoPlanes rule applied to the hamming bands
    * ([[graft.operators.Similarity.autoPlanes]]): a FIXED key space
    * saturates like a fixed nlist. At arity k the narrowest tuple key
    * has k·⌊64/(6+k)⌋ bits, so uniform-expected bucket occupancy is
    * n / 2^bits; the smallest arity that keeps it ≤ `targetOccupancy`
    * keeps candidate generation linear with 10× headroom before the
    * 1000-cap would start pricing recall (the r11 single-band lesson:
    * a saturated cap drops RECALL, not just work). Zones at the default
    * target 100: arity 2 (28 keys, ≥16-bit) to ~6.5 M signatures,
    * arity 3 (84 keys, ≥21-bit) to ~2×10⁸, arity 4 (210 keys, ≥24-bit)
    * to ~1.7×10⁹ — past maxArity, shard the corpus like every other
    * bucket miner here. Per-signature band rows grow C(6+k, k): the
    * linear-factor cost of the exponential key-space win.
    */
  def autoBandArity(n: Long, targetOccupancy: Int = 100,
                    maxArity: Int = 4): Int = {
    require(n >= 0 && targetOccupancy >= 1 && maxArity >= 2,
      "autoBandArity: invalid bounds")
    (2 to maxArity).find { k =>
      val minBits = k * (64 / (6 + k))
      n.toDouble / math.pow(2.0, minBits.toDouble) <= targetOccupancy
    }.getOrElse(maxArity)
  }

  /** (id, ahash, band, bv): the C(6+k, k) band-TUPLE keys of each 64-bit
    * hash at arity `k` — the generalization of [[pairBandRows]] (arity 2
    * delegates to it verbatim so oracle replays and the streaming
    * detector keep their byte-stable layout). band = the tuple's index
    * in the lexicographic combination order; bv = the member band values
    * folded MSB-first (acc · 2^width + value).
    */
  private[graft] def bandTupleRows(hashes: DataFrame, arity: Int): DataFrame =
    if (arity == 2) pairBandRows(hashes)
    else {
      val layout = bandLayout(arity)
      val bv: Seq[Column] = layout.map { case (s, w) =>
        shiftrightunsigned(col("ahash"), s).bitwiseAND(lit((1L << w) - 1L))
      }
      val combos = layout.indices.combinations(arity).toSeq
      hashes.select(col("id"), col("ahash"),
          explode(array(combos.zipWithIndex.map { case (combo, ci) =>
            struct(lit(ci).as("band"),
              combo.foldLeft(lit(0L): Column) { (acc, bi) =>
                acc * lit(1L << layout(bi)._2) + bv(bi)
              }.as("bv"))
          }: _*)).as("e"))
        .select(col("id"), col("ahash"), col("e.band"), col("e.bv"))
    }

  /** Near-duplicate frame pairs by perceptual hash: pairs whose aHash
    * Hamming distance is ≤ `maxHamming` (default 6 — the conventional
    * aHash near-dup band). Candidates come from a band-TUPLE join
    * ([[bandTupleRows]]: ids sharing any of the C(6+k, k) band tuples),
    * so recall is EXACT for `maxHamming ≤ 6` at EVERY arity — ≤ 6
    * flipped bits dirty ≤ 6 of the 6+k bands, leaving a clean k-tuple —
    * while the ≥16-bit tuple key keeps candidate generation linear
    * where 8-bit single-band buckets saturate (see [[pairBandRows]]).
    * `maxHamming = 7` needs only one clean band and falls back to the
    * single-band key, accepting its saturation (callers at that
    * threshold are bounded fixtures).
    *
    * ARITY IS CORPUS-SIZED BY DEFAULT ([[autoBandArity]]): a fixed key
    * space saturates its cap at some decade no matter how wide — and a
    * saturated cap drops RECALL silently (the r11 plateau lesson). With
    * `arity = None` the miner pins the signature frame once
    * (`localCheckpoint` — it feeds ≥ 3 passes below anyway, so an
    * expensive upstream like a decode chain runs ONCE instead of per
    * pass) and derives the arity from its count; pass `Some(k)` to pin
    * a geometry (the oracle-replayed entries pass through auto and stay
    * at arity 2 at verification scale).
    *
    * Scale shape: the join shuffles (band, bucket, id, hash) rows —
    * C(6+k, k) compact rows per FRAME, never pixels; in-bucket
    * candidate pairs are verified with one `bit_count(xor)` projection.
    * `hashes` must carry ONE row per id (select a frame upstream —
    * pairs are per-id, and a multi-frame id would alias its pairs).
    * Degenerate buckets (constant-color corpora collapse a band) are
    * capped like every other bucket miner: pass `maxBandSize` to drop
    * saturated buckets.
    */
  def imageNearDupPairs(hashes: DataFrame, maxHamming: Int = 6,
                        maxBandSize: Option[Int] = Some(1000),
                        arity: Option[Int] = None): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"maxHamming must be in [0, 7] (8-band recall bound), got $maxHamming")
    val bands =
      if (maxHamming > 6) bandRows(hashes)
      else arity match {
        case Some(k) => bandTupleRows(hashes, k)
        case None =>
          val pinned = hashes.localCheckpoint(true)
          bandTupleRows(pinned, autoBandArity(pinned.count()))
      }
    val ok = bands.groupBy("band", "bv").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2 &&
        col("n") <= lit(maxBandSize.getOrElse(Int.MaxValue)))
      .select("band", "bv")
    val capped = bands.join(ok, Seq("band", "bv"))
    val pairs = capped.select(col("band"), col("bv"),
        col("id").as("a"), col("ahash").as("ha"))
      .join(capped.select(col("band"), col("bv"),
        col("id").as("b"), col("ahash").as("hb")), Seq("band", "bv"))
      .filter(col("a") < col("b"))
      .select("a", "b", "ha", "hb").distinct()
    pairs.select(col("a"), col("b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Batch "resize" to a byte budget: re-encode each payload to exactly
    * `targetBytes` (cycle-padded / truncated) with refreshed metadata —
    * the OPAQUE-payload variant (a byte-budget normalization for media
    * with no decoder in this container; [[resizeImages]] is the real
    * decode→resample→re-encode path for BMP media).
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
