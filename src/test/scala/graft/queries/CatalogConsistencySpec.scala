package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract: every query name is unique across the three
  * catalog maps (a Map merge would silently drop collisions), every oracle
  * points at a real query, and the rows-only set stays the known,
  * intentionally-approximate operators.
  */
class CatalogConsistencySpec extends AnyFunSuite {
  import QueryCatalog._

  test("no key collisions between catalog maps") {
    val maps = Seq(referenceQueries.keySet, relationalQueries.keySet,
      extensionQueries.keySet)
    maps.combinations(2).foreach { case Seq(a, b) =>
      assert((a & b).isEmpty, s"colliding query names: ${a & b}")
    }
    assert(all.size == maps.map(_.size).sum)
  }

  test("every oracle references a declared query") {
    assert((oracles.keySet -- all.keySet).isEmpty)
  }

  test("corrupt-record quarantine query survives count-only execution") {
    // The bench times every entry as fn(...).count(): column pruning can
    // reduce a raw-JSON read to referencing ONLY _corrupt_record, which
    // Spark disallows (this failed the r8 bench once). Pin the
    // count-only path, not just the full-projection Verify path.
    val spark = graft.SparkTestBase.spark
    val n = all("x_ingest_jsonl")(spark, "/root/testdata/sf0.001").count()
    val r = all("x_ingest_jsonl_report")(spark, "/root/testdata/sf0.001").count()
    assert(n > 0 && r > 0)
  }

  test("rows-only queries are exactly the known approximate/stub set") {
    // the catalog's own declared invariant (also enforced by Verify at
    // the correctness gate) must match the catalog's actual state...
    assert(all.keySet -- oracles.keySet == QueryCatalog.rowsOnlyByDesign)
    // ...and the set itself is pinned VERBATIM here, so growing it takes
    // an explicit edit in two places — a reviewed act, not a drift
    assert(QueryCatalog.rowsOnlyByDesign == Set(
      "x_approx_distinct",   // HLL sketch (engine-specific)
      "x_sim_ivf_trained",   // approximate by design (k-means centroids)
      "x_multimodal_frames",   // real BMP decode, pinned by ScalaTest
      "x_multimodal_png",      // real PNG codec round-trip, pinned by PngSpec
      "x_multimodal_jpeg",     // real baseline-JPEG codec, pinned by JpegSpec
      "x_multimodal_features", // decoded-pixel features → ANN, pinned by ScalaTest
      "x_multimodal_audio",    // real WAV decode, pinned by ScalaTest
      "x_text_surprisal",      // float log-probs, pinned by ScalaTest
      "x_dedup_minhash_fast",  // xx64 production config, spec-pinned vs exact
      "x_dedup_cross_fast",    // xx64 production config, spec-pinned vs exact
      "x_text_heavyhitters",   // murmur CMS counters, spec-pinned vs exact top-k
      "x_unigram_train",       // Viterbi-EM log-double scores, spec-pinned
      "x_unigram_segment",     // Viterbi under the trained model, spec-pinned
      "x_dedup_incremental_fast", // xx64+estimator production config
      "x_stream_neardup",      // xx64 streaming detector, spec-pinned vs batch
      "x_stream_incremental",  // xx64 stream-vs-corpus hits, spec-pinned
      "x_corpus_overlap_fast", // xx64 production config, spec-pinned vs exact
      "x_text_compress",       // JDK-zlib output sizes, spec-pinned monotonicity
      "x_stream_latedata",     // engine drop-telemetry, spec-pinned integrity
      "x_multimodal_imagehash") // real BMP decode → aHash, pinned by ImageHashSpec
    )
  }
}
