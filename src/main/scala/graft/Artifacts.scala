package graft

import org.apache.spark.sql.SparkSession

/** The PINNED pre-build order for every memoized per-(session, corpus)
  * artifact the query surface shares — bucketed/partitioned layouts,
  * governed-lake tables, signature tables, converged label tables, the
  * media decode pass, staged stream inputs.
  *
  * Why this exists: each of these is built lazily on first touch and
  * memoized, so in a timed sweep the ENTIRE build cost lands on whichever
  * entry happens to run first in that sweep's order — and that entry's
  * per-query number then reads as a regression when the sweep order (or
  * host load during the build) changes. Three driver benches were lost
  * and a fourth inflated ~1.5× to exactly this attribution problem (m11
  * charged 22.5 s for the decode parquet + edge list + label rounds it
  * happened to touch first; d10 charged the d-family's JVM/codegen
  * warmup). The bench now forces every artifact HERE, in a fixed order,
  * timed under its own key in a separate `artifacts` JSON section — so
  * per-entry numbers measure the query, and artifact costs are visible,
  * named, and comparable round over round instead of smeared anonymously
  * over the surface.
  *
  * On the 1000-executor cluster this phase IS the pipeline's layout/
  * prepare stage: bucketed writes, z-ordered rewrites, signature and
  * label tables are one-time jobs amortized over every downstream query —
  * separating their cost from query cost is how a capacity plan reads.
  *
  * Ordering: dependencies first (shingles before the postings built from
  * them, the lake catalog before the tables living in it, the decode pass
  * before the cross-modal labels), then alphabetical within a family.
  * Every builder is idempotent and memoized, so a query later re-touching
  * an artifact pays only the memo lookup. */
object Artifacts {

  /** (artifact name, builder). Builders force materialization as a side
    * effect (each memoized builder writes its parquet/tables eagerly
    * inside its `computeIfAbsent`). */
  val all: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    // --- dedup signature/index substrate (shingles feed everything) ---------
    "shingles"           -> ((s, d) => { operators.Dedup.shingled(s, d); () }),
    "ranked_postings"    -> ((s, d) => { operators.Dedup.rankedPostings(s, d); () }),
    "verified_pairs"     -> ((s, d) => { operators.Dedup.verifiedPairs(s, d); () }),
    "minhash_signatures" -> ((s, d) => { operators.Dedup.minhashSignatures(s, d); () }),
    "simhash_signatures" -> ((s, d) => { operators.Dedup.simhashSignatures(s, d); () }),
    "dedup_labels"       -> ((s, d) => { operators.Dedup.clusterLabels(s, d); () }),
    "d17_spans"          -> ((s, d) => { operators.Dedup.dupSpanReport(s, d); () }),
    // --- media decode pass + the cross-modal labels built on it -------------
    "media_decoded"      -> ((s, d) => { functions.Multimodal.mediaDecoded(s, d); () }),
    "m11_labels"         -> ((s, d) => { functions.Multimodal.m11Labels(s, d); () }),
    // --- graph substrate -----------------------------------------------------
    "copurchase_edges"   -> ((s, d) => { operators.Graph.copurchaseEdges(s, d); () }),
    "triangle_rows"      -> ((s, d) => { operators.Graph.triangleRows(s, d); () }),
    "chunked_adjacency"  -> ((s, d) => { operators.Graph.chunkedAdjacency(s, d); () }),
    "lpa_labels"         -> ((s, d) => { operators.Graph.lpaLabels(s, d); () }),
    // --- text-curation intermediates -----------------------------------------
    "x_tokens"           -> ((s, d) => { functions.TextAnalysis.xTokens(s, d); () }),
    "x25_chunks"         -> ((s, d) => { functions.TextAnalysis.x25Chunks(s, d); () }),
    "x26_bigrams"        -> ((s, d) => { functions.TextAnalysis.x26Bigrams(s, d); () }),
    "x31_shards"         -> ((s, d) => { functions.TextAnalysis.x31Export(s, d); () }),
    "bpe_merges"         -> ((s, d) => { functions.BpeTraining.trainedMerges(s, d); () }),
    // --- relational layouts (partitioned/bucketed/fragmented/chunked) -------
    "year_layout"        -> ((s, d) => { operators.Relational.yearLayout(s, d); () }),
    "s10_buckets"        -> ((s, d) => { operators.Relational.s10Tables(s, d); () }),
    "s14_fragments"      -> ((s, d) => { operators.Relational.s14Layout(s, d); () }),
    "s20_chunks"         -> ((s, d) => { operators.Relational.s20Prepare(s, d); () }),
    "s21_layout"         -> ((s, d) => { operators.Relational.s21Layout(s, d); () }),
    "j21_skew"           -> ((s, d) => { operators.Relational.j21Materialize(s, d); () }),
    "s24_layout"         -> ((s, d) => { operators.Relational.s24Layout(s, d); () }),
    "s25_layout"         -> ((s, d) => { operators.Relational.s25Layout(s, d); () }),
    "s27_layout"         -> ((s, d) => { operators.Relational.s27Layout(s, d); () }),
    "s29_layout"         -> ((s, d) => { operators.Relational.s29Layout(s, d); () }),
    // --- governed lake: catalog first, then the SHARED staged bases the
    // --- identical-load tables branch from at the file level, then the
    // --- tables themselves (their keys now time copy + mutation only) ----
    "s30_lake"           -> ((s, d) => { operators.Relational.s30Lake(s, d); () }),
    "lake_base4"         -> ((s, d) => { operators.Relational.lakeDocsBase4(s, d); () }),
    "lake_base3"         -> ((s, d) => { operators.Relational.lakeDocsBase3(s, d); () }),
    "s31_table"          -> ((s, d) => { operators.Relational.s31Table(s, d); () }),
    "s32_table"          -> ((s, d) => { operators.Relational.s32Table(s, d); () }),
    "s33_table"          -> ((s, d) => { operators.Relational.s33Table(s, d); () }),
    "s34_table"          -> ((s, d) => { operators.Relational.s34Table(s, d); () }),
    "s35_lake"           -> ((s, d) => { operators.Relational.s35Lake(s, d); () }),
    "s36_table"          -> ((s, d) => { operators.Relational.s36Table(s, d); () }),
    "s37_table"          -> ((s, d) => { operators.Relational.s37Table(s, d); () }),
    "s38_table"          -> ((s, d) => { operators.Relational.s38Table(s, d); () }),
    "s39_layout"         -> ((s, d) => { operators.Relational.s39Layout(s, d); () }),
    "s40_table"          -> ((s, d) => { operators.Relational.s40Table(s, d); () }),
    "s41_table"          -> ((s, d) => { operators.Relational.s41Table(s, d); () }),
    "s42_table"          -> ((s, d) => { operators.Relational.s42Table(s, d); () }),
    "s43_table"          -> ((s, d) => { operators.Relational.s43Table(s, d); () }),
    "s44_table"          -> ((s, d) => { operators.Relational.s44Table(s, d); () }),
    "s45_ndv"            -> ((s, d) => { operators.Relational.s45Layout(s, d); () }),
    "s46_layout"         -> ((s, d) => { operators.Relational.s46Layout(s, d); () }),
    "s47_tables"         -> ((s, d) => { operators.Relational.s47Tables(s, d); () }),
    "ann_indexes"        -> ((s, d) => { operators.Similarity.forceAnnIndexes(s, d); () }),
    // --- staged streaming inputs/outputs -------------------------------------
    "st24_waves"         -> ((s, d) => { streaming.Streams.st24Waves(s, d); () }),
    "st25_out"           -> ((s, d) => { streaming.Streams.st25Out(s, d); () }),
    "st26_out"           -> ((s, d) => { streaming.Streams.st26Out(s, d); () }),
    "st27_out"           -> ((s, d) => { streaming.Streams.st27Out(s, d); () }),
    "st28_table"         -> ((s, d) => { streaming.Streams.st28Table(s, d); () }),
    "st29_out"           -> ((s, d) => { streaming.Streams.st29Out(s, d); () }))

  /** Dependency STAGES for the parallel pre-build: every artifact in
    * stage N depends only on artifacts in stages < N, so members of one
    * stage build CONCURRENTLY. This is what the phase looks like on a
    * real cluster — independent layout/DDL/signature jobs submitted
    * together, the scheduler filling the executors — instead of a serial
    * drip of small jobs each leaving 31 of 32 cores idle. Dependencies
    * stay correct even if misplaced: every builder reaches its inputs
    * through the same memoized functions, and concurrent callers of one
    * memo key block inside computeIfAbsent until the first completes —
    * a misplacement only smears ATTRIBUTION (the waiter's key absorbs
    * the wait), never correctness. The stage lists must cover exactly
    * [[all]]; prebuild asserts it so a new artifact cannot silently
    * drop out of the phase. */
  val stages: Seq[Seq[String]] = Seq(
    Seq("shingles", "media_decoded", "copurchase_edges", "year_layout",
      "s10_buckets", "s14_fragments", "s20_chunks", "j21_skew",
      "s21_layout", "s24_layout", "s25_layout", "s27_layout", "s29_layout",
      "s30_lake", "x25_chunks", "x_tokens", "bpe_merges",
      "st24_waves", "st25_out", "st26_out", "st27_out", "s45_ndv"),
    Seq("ranked_postings", "minhash_signatures", "simhash_signatures",
      "m11_labels", "triangle_rows", "chunked_adjacency", "x26_bigrams",
      "lake_base4", "lake_base3", "s35_lake", "st28_table", "x31_shards",
      "d17_spans"),
    Seq("verified_pairs", "lpa_labels", "s31_table", "s32_table",
      "s33_table", "s34_table", "s36_table", "s37_table", "s38_table",
      "s39_layout", "s40_table", "s41_table", "s42_table", "s43_table",
      "s44_table", "s46_layout", "s47_tables", "ann_indexes"),
    Seq("dedup_labels", "st29_out"))

  /** Force every artifact, stage by stage with in-stage parallelism.
    * Returns (per-artifact seconds in [[all]]'s pinned order, failed
    * names, PHASE WALL seconds). Per-artifact seconds are measured under
    * in-stage contention (they attribute work and catch regressions;
    * their SUM overstates the phase), and the wall is what the phase
    * actually costs the pipeline — Bench reports both. Failures are
    * RETURNED, not rethrown — the sweep always completes so one broken
    * artifact cannot hide which later ones were also broken; the CALLER
    * owns failing the run (Bench exits rc 1 and lists them in
    * `errors`). */
  def prebuild(s: SparkSession, d: String, parallelism: Int = 6)
      : (Seq[(String, Double)], Seq[String], Double) = {
    require(stages.flatten.sorted == all.map(_._1).sorted,
      "Artifacts.stages must cover exactly Artifacts.all: " +
        s"missing ${all.map(_._1).diff(stages.flatten).mkString(",")} " +
        s"extra ${stages.flatten.diff(all.map(_._1)).mkString(",")}")
    val builders = all.toMap
    val failed = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val times = new java.util.concurrent.ConcurrentHashMap[String, Double]
    val t0 = System.nanoTime()
    stages.foreach { stage =>
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.max(1, math.min(parallelism, stage.size)))
      try {
        import scala.jdk.CollectionConverters._
        val tasks: Seq[java.util.concurrent.Callable[Unit]] =
          stage.map { name =>
            () => {
              val b0 = System.nanoTime()
              try {
                builders(name)(s, d)
                times.put(name, (System.nanoTime() - b0) / 1e9); ()
              } catch {
                case e: Throwable =>
                  System.err.println(s"[artifacts] $name FAILED: ${e.getMessage}")
                  failed.add(name); times.put(name, -1.0); ()
              }
            }
          }
        pool.invokeAll(tasks.asJava).asScala.foreach(_.get())
      } finally pool.shutdown()
    }
    val wall = (System.nanoTime() - t0) / 1e9
    import scala.jdk.CollectionConverters._
    (all.map { case (n, _) => n -> times.getOrDefault(n, -1.0) },
      failed.iterator().asScala.toSeq, wall)
  }
}
