package graft.tools

import java.nio.file.{Files, Paths}

import graft.queries.QueryCatalog

/** Generate `docs/CATALOG.md` — the machine-derived inventory of every
  * catalog query with its verification mode, grouped by family. Run
  * after adding entries; the committed file is what a reviewer diffs
  * against SURVEY §2 line by line, and because it is DERIVED from
  * `QueryCatalog.all`/`oracles` it cannot drift from the code the way
  * a hand-maintained table would.
  *
  * `runMain graft.tools.CatalogDoc [outPath]`
  */
object CatalogDoc {

  private val families: Seq[(String, String)] = Seq(
    "ref_" -> "Reference surface (agol_pandas callables)",
    "q" -> "Relational / TPC-H-style",
    "x_dedup" -> "Deduplication",
    "x_decontam" -> "Decontamination",
    "x_sim" -> "Similarity / ANN",
    "x_knn" -> "kNN graph",
    "x_emb" -> "Embedding ops",
    "x_export" -> "Export / interchange",
    "x_bpe" -> "BPE tokenizer",
    "x_wordpiece" -> "WordPiece tokenizer",
    "x_unigram" -> "Unigram tokenizer",
    "x_text" -> "Text analysis",
    "x_token" -> "Token accounting",
    "x_corpus" -> "Corpus audit",
    "x_quality" -> "Quality gates",
    "x_classifier" -> "Classifier lifecycle",
    "x_curate" -> "Curation",
    "x_domain" -> "Domain mixing",
    "x_pack" -> "Sequence packing",
    "x_chunk" -> "Chunking",
    "x_split" -> "Splits",
    "x_stratified" -> "Sampling",
    "x_weighted" -> "Sampling",
    "x_shuffle" -> "Sampling",
    "x_dsir" -> "DSIR selection",
    "x_curriculum" -> "Curriculum",
    "x_contrastive" -> "Contrastive data",
    "x_hard" -> "Contrastive data",
    "x_eval" -> "Evaluation",
    "x_cdc" -> "Change data capture",
    "x_takedown" -> "Compliance / takedown",
    "x_entity" -> "Record linkage",
    "x_ingest" -> "Ingestion",
    "x_layout" -> "Storage layout",
    "x_snapshot" -> "Snapshots",
    "x_stream" -> "Streaming",
    "x_multimodal" -> "Multimodal",
    "x_graph" -> "Graph",
    "x_sketch" -> "Sketches",
    "x_kmv" -> "Sketches",
    "x_approx" -> "Sketches",
    "x_quantile" -> "Sketches",
    "x_exact_quantiles" -> "Sketches",
    "x_skew" -> "Scale tooling",
    "x_profile" -> "Profiling",
    "x_pipeline" -> "Pipeline composites",
    "x_spatial" -> "Spatial",
    "x_session" -> "Sessionization",
    "x_event" -> "Event analytics",
    "x_cohort" -> "Event analytics",
    "x_hybrid" -> "Retrieval",
    "x_retrieval" -> "Retrieval",
    "x_bitext" -> "Bitext mining",
    "x_tokenizer" -> "Token accounting",
    "x_ann" -> "Similarity / ANN",
    "x_pq" -> "Similarity / ANN",
    "x_index" -> "Similarity / ANN",
    "x_privacy" -> "Privacy / compliance",
    "x_pref" -> "SFT / post-training",
    "x_mix" -> "Domain mixing",
    "x_shards" -> "Storage layout",
    "x_range" -> "Relational / TPC-H-style",
    "x_sft" -> "SFT / post-training",
    "x_cluster" -> "Similarity / ANN",
    "x_distinct" -> "Text analysis",
    "x_subword" -> "Token accounting")

  private def familyOf(name: String): String =
    families.filter { case (p, _) => name.startsWith(p) }
      .sortBy(-_._1.length).headOption.map(_._2).getOrElse("Other")

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "docs/CATALOG.md"
    val names = QueryCatalog.all.keys.toSeq.sorted
    val oracles = QueryCatalog.oracles.keySet
    val grouped = names.groupBy(familyOf).toSeq.sortBy(_._1)
    val sb = new StringBuilder
    sb.append("# Catalog inventory (GENERATED — `runMain graft.tools.CatalogDoc`)\n\n")
    sb.append(s"${names.size} queries; ${names.count(oracles)} DuckDB-oracle-hashed, ")
    sb.append(s"${names.size - names.count(oracles)} rows-only by declared design ")
    sb.append("(each pinned by a ScalaTest; see CatalogConsistencySpec).\n")
    grouped.foreach { case (fam, qs) =>
      sb.append(s"\n## $fam (${qs.size})\n\n")
      sb.append("| query | verification |\n|---|---|\n")
      qs.foreach { n =>
        val v = if (oracles(n)) "oracle-hashed" else "rows-only + spec"
        sb.append(s"| `$n` | $v |\n")
      }
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out: ${names.size} queries, ${grouped.size} families")
  }
}
