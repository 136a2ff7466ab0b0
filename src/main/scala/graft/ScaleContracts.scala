package graft

/** Machine-readable scale contracts — the single source of truth for
  * which registered queries a gauntlet EXCLUDES by documented contract
  * (quadratic output in duplicate multiplicity, declared exact-baseline
  * tier, small-corpus confinement) and what BOUNDS the ones it audits.
  *
  * Both gauntlets call [[verifyAndRecord]] at startup: a contract entry
  * marked `excluded` for that gauntlet must be absent from its query
  * list, and one marked `audited` must be present — so an exclusion
  * whose reason has been engineered away (the s40 bucket cap), or an
  * audited entry silently dropped from a tier, fails the run loudly
  * instead of surviving as prose. The verified table is also written to
  * `records/scale_contracts.json` so the round artifacts carry the
  * exclusion list in a parseable form.
  */
object ScaleContracts {

  /** `status`: gauntlet name ("skew" | "volume") → "audited" |
    * "excluded". A gauntlet absent from the map is unconstrained — tier
    * curation (which of the 200+ entries are top-cost enough to time)
    * stays a judgment call; only CONTRACT claims are enforced. */
  final case class Contract(
      entry: String,
      status: Map[String, String],
      reason: String,
      boundedBy: String)

  val All: Seq[Contract] = Seq(
    Contract("d30_simhash_pairs",
      Map("skew" -> "excluded"),
      "output is quadratic in duplicate multiplicity by contract — every " +
        "dup pair is a result row, so 10k dups = ~50M CORRECT answer rows",
      "d26 exact dedup owns mass duplicates upstream (x90 pins the " +
        "composition under the skew workload)"),
    Contract("d31_embedding_neardup",
      Map("skew" -> "excluded"),
      "declared exact all-pairs baseline; output quadratic in duplicate " +
        "multiplicity like d30",
      "d33 is the registered scale path (probe-rule candidates)"),
    Contract("d33_embedding_neardup_lsh",
      Map("skew" -> "excluded"),
      "output (true near-dup pairs) is quadratic in duplicate " +
        "multiplicity by contract, independent of the candidate rule",
      "probe-rule candidate pruning; built over a d26/d31-deduped corpus " +
        "by the documented pipeline order"),
    Contract("m44_media_neardup",
      Map("skew" -> "excluded"),
      "10k identical blobs share one perceptual hash — every pair is a " +
        "correct result row (quadratic output, the d30 contract)",
      "m49's banded multi-block fingerprints are the components-scale tier"),
    Contract("m46_media_components",
      Map("volume" -> "excluded"),
      "pigeonhole candidate stage measured quadratic at 10× volume " +
        "(round-9 in-timer audit, cost_ratio 1.8) — contract-confined to " +
        "the base-SF small-corpus tier",
      "m49_media_components_scalable supersedes it at scale (volume-audited)"),
    Contract("s32_knn_bruteforce",
      Map("skew" -> "excluded", "volume" -> "excluded"),
      "declared exact brute-force baseline — quadratic by definition; " +
        "exists to calibrate the ANN tiers' recall",
      "s33/s34/s36/s43 are the registered scale paths"),
    Contract("s40_knn_graph",
      Map("skew" -> "audited", "volume" -> "audited"),
      "",
      "per-bucket candidate cap (Similarity.KnnBucketCap = 32, " +
        "hash-ranked): candidates ≤ N·7·cap at any bucket population; " +
        "recall@3 audited in RecallSpec"),
    Contract("x107_graph_pagerank",
      Map("skew" -> "audited", "volume" -> "audited"),
      "",
      "consumes the capped s40 graph; sweeps are O(edges) keyed joins " +
        "over N·3 edges, lineage-truncated per round"),
    Contract("x118_label_communities",
      Map("skew" -> "audited", "volume" -> "audited"),
      "",
      "consumes the capped s40 graph; LPA sweeps shuffle O(edges) with " +
        "map-side partials and a rank-1 window"),
    Contract("x119_community_sample",
      Map("skew" -> "audited", "volume" -> "audited"),
      "",
      "x118's communities plus ONE window keyed by community; quota " +
        "filter is map-side on the ranked rows"),
    Contract("x128_contamination_spans",
      Map("skew" -> "audited", "volume" -> "excluded"),
      "span-pair OUTPUT is quadratic in cross-split duplicate " +
        "multiplicity by contract (every train×eval span pair is a " +
        "correct result row) — d36's contract applied cross-corpus; " +
        "under skew the df cap zeroes the pile's grams so the hostile " +
        "run stays bounded",
      "d36's gram df cap bounds the candidate join; at production the " +
        "eval side is benchmark-sized and broadcastable"),
    Contract("d47_line_dedup",
      Map("skew" -> "audited", "volume" -> "audited"),
      "",
      "line-df model is hashed count cells (partial+final agg); " +
        "boilerplate filter is a keyed anti-join; rebuild regroups per " +
        "doc — linear at any duplication"),
    Contract("x126_incremental_manifest",
      Map("skew" -> "audited", "volume" -> "audited"),
      "",
      "d37's bucketed index probe (batch-proportional) + cell-domain-" +
        "bounded quantile state merge + broadcast re-attach"),
    Contract("x129_dsir_weights",
      Map("skew" -> "audited", "volume" -> "audited"),
      "",
      "both n-gram models bounded at DsirBuckets hashed cells and " +
        "broadcast; feature explode map-only; per-doc aggregate"),
    Contract("x130_community_cohesion",
      Map("skew" -> "audited", "volume" -> "audited"),
      "",
      "x127's degree-3 mutual lcc table + one keyed rollup on community"),
    Contract("x131_decontaminated_rewrite",
      Map("skew" -> "audited", "volume" -> "excluded"),
      "consumes x128's span table, whose pair stage is quadratic in " +
        "cross-split duplicate multiplicity by the d36 contract; the " +
        "rewrite itself is per-doc linear",
      "d36's gram df cap bounds the candidate join; the span table " +
        "broadcasts and the mask join is doc_id-keyed"),
    Contract("x132_source_priority_sample",
      Map("skew" -> "audited"),
      "",
      "map-side Partial WindowGroupLimit caps every source at K rows " +
        "per task before the shuffle (x91's posture, PlanSpec-gated)"),
    Contract("s49_graph_recall_audit",
      Map("skew" -> "audited"),
      "",
      "exact side is a fixed 20-query broadcast sample x N (linear); " +
        "graph side inherits s40's per-bucket cap"),
    Contract("x133_dsir_selection",
      Map("skew" -> "audited"),
      "",
      "x129's 16k-cell broadcast models + x132's map-side per-source " +
        "group limit"),
    Contract("m50_media_best_keeper",
      Map("volume" -> "audited"),
      "",
      "m49's audited candidate machinery + rank-1 window keyed by " +
        "component + component-keyed keeper re-attach (d39's posture)"))

  /** Fails (IllegalStateException) if `queries` disagrees with the
    * contract table for `gauntlet`, then writes the JSON record. */
  def verifyAndRecord(gauntlet: String, queries: Seq[String]): Unit = {
    val qs = queries.toSet
    val bad = All.flatMap { c =>
      c.status.get(gauntlet) match {
        case Some("excluded") if qs.contains(c.entry) =>
          Some(s"${c.entry}: contract says excluded from $gauntlet but it runs")
        case Some("audited") if !qs.contains(c.entry) =>
          Some(s"${c.entry}: contract says audited by $gauntlet but it was silently skipped")
        case _ => None
      }
    }
    if (bad.nonEmpty) throw new IllegalStateException(
      s"scale-contract violations:\n  ${bad.mkString("\n  ")}")
    writeJson("records/scale_contracts.json")
  }

  def writeJson(path: String): Unit = {
    val rows = All.map { c =>
      val st = c.status.toSeq.sortBy(_._1)
        .map { case (g, s) => JsonOut.str(g) + ":" + JsonOut.str(s) }
        .mkString("{", ",", "}")
      s"""{"entry":${JsonOut.str(c.entry)},"status":$st,""" +
        s""""reason":${JsonOut.str(c.reason)},"bounded_by":${JsonOut.str(c.boundedBy)}}"""
    }
    val f = new java.io.File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    val w = new java.io.PrintWriter(f, "UTF-8")
    try w.println(rows.mkString("[\n", ",\n", "\n]")) finally w.close()
  }
}
