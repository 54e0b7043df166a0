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
    "ann_ivf"            -> ((s, d) => { operators.Similarity.forceIvfIndex(s, d); () }),
    "ann_ivf_coarse"     -> ((s, d) => { operators.Similarity.forceIvfCoarseIndex(s, d); () }),
    "ann_pq_raw"         -> ((s, d) => { operators.Similarity.forcePqRawIndex(s, d); () }),
    "ann_pq_fine"        -> ((s, d) => { operators.Similarity.forcePqFineIndex(s, d); () }),
    // --- staged streaming inputs/outputs -------------------------------------
    "st24_waves"         -> ((s, d) => { streaming.Streams.st24Waves(s, d); () }),
    "st25_out"           -> ((s, d) => { streaming.Streams.st25Out(s, d); () }),
    "st26_out"           -> ((s, d) => { streaming.Streams.st26Out(s, d); () }),
    "st27_out"           -> ((s, d) => { streaming.Streams.st27Out(s, d); () }),
    "st28_table"         -> ((s, d) => { streaming.Streams.st28Table(s, d); () }),
    "st29_out"           -> ((s, d) => { streaming.Streams.st29Out(s, d); () }))

  /** Explicit dependency edges for the DAG pre-build: an artifact starts
    * the moment its listed dependencies finish, never at a stage barrier.
    * The r13 stage-barrier executor made the phase wall = Σ stage-walls,
    * and each stage's wall = its longest member — measured 54-56 s at
    * sf0.1 idle, with long poles (d17_spans, triangle_rows) idling behind
    * unrelated stage-mates (guide §2.6: overlap independent jobs; the
    * scheduler back-fills). Dependencies stay correct even if misplaced:
    * every builder reaches its inputs through the same memoized
    * functions, and concurrent callers of one memo key block inside
    * computeIfAbsent until the first completes — a misplacement only
    * smears ATTRIBUTION (the waiter's key absorbs the wait), never
    * correctness. Artifacts absent from this map have no dependencies.
    * prebuild asserts key/value coverage against [[all]] so a new
    * artifact cannot silently reference a phantom dependency. */
  val deps: Map[String, Seq[String]] = Map(
    // dedup signature/index substrate
    "ranked_postings"    -> Seq("shingles"),
    "minhash_signatures" -> Seq("shingles"),
    "simhash_signatures" -> Seq("shingles"),
    "verified_pairs"     -> Seq("ranked_postings"),
    "dedup_labels"       -> Seq("verified_pairs"),
    "d17_spans"          -> Seq("x_tokens"),
    // media decode pass feeds the cross-modal labels
    "m11_labels"         -> Seq("media_decoded"),
    // graph substrate
    "triangle_rows"      -> Seq("copurchase_edges"),
    "chunked_adjacency"  -> Seq("copurchase_edges"),
    "lpa_labels"         -> Seq("chunked_adjacency"),
    // text-curation intermediates
    "x26_bigrams"        -> Seq("x_tokens"),
    // governed lake: catalog, then shared staged bases, then tables
    "lake_base4"         -> Seq("s30_lake"),
    "lake_base3"         -> Seq("s30_lake"),
    "s35_lake"           -> Seq("s30_lake"),
    "s31_table"          -> Seq("lake_base4"),
    "s32_table"          -> Seq("s30_lake"),
    "s33_table"          -> Seq("lake_base4"),
    "s34_table"          -> Seq("lake_base4"),
    "s36_table"          -> Seq("lake_base4"),
    "s37_table"          -> Seq("s30_lake"),
    "s38_table"          -> Seq("s30_lake"),
    "s40_table"          -> Seq("s30_lake"),
    "s41_table"          -> Seq("s30_lake"),
    "s42_table"          -> Seq("lake_base3"),
    "s43_table"          -> Seq("lake_base3"),
    "s44_table"          -> Seq("lake_base3", "lake_base4", "s30_lake"),
    "s46_layout"         -> Seq(),
    "s47_tables"         -> Seq("s30_lake"),
    "ann_ivf"            -> Seq("s30_lake"),
    "ann_ivf_coarse"     -> Seq("s30_lake"),
    "ann_pq_raw"         -> Seq("s30_lake"),
    "ann_pq_fine"        -> Seq("s30_lake"),
    "st28_table"         -> Seq("s30_lake"),
    "st29_out"           -> Seq("s44_table"))

  /** Force every artifact, dependency-DAG-driven with bounded
    * parallelism: a worker pool of `parallelism` threads drains a ready
    * queue; an artifact enters the queue when its last dependency
    * completes (or fails — the run must always sweep everything so one
    * broken artifact cannot hide which later ones were also broken).
    * Returns (per-artifact seconds in [[all]]'s pinned order, failed
    * names, PHASE WALL seconds). Per-artifact seconds are measured under
    * whatever concurrency the DAG admits (they attribute work and catch
    * regressions; their SUM overstates the phase), and the wall is what
    * the phase actually costs the pipeline — Bench reports both. The
    * CALLER owns failing the run (Bench exits rc 1 and lists failures in
    * `errors`). */
  def prebuild(s: SparkSession, d: String, parallelism: Int = 8)
      : (Seq[(String, Double)], Seq[String], Double) = {
    val names = all.map(_._1)
    require(deps.keySet.subsetOf(names.toSet) &&
      deps.values.flatten.forall(names.contains),
      "Artifacts.deps must reference only Artifacts.all: " +
        s"unknown keys ${deps.keySet.diff(names.toSet).mkString(",")} " +
        s"unknown deps ${deps.values.flatten.toSet.diff(names.toSet).mkString(",")}")
    // Kahn's-algorithm acyclicity check: a cycle in deps would leave the
    // completion latch waiting forever — fail loudly at submit time instead
    locally {
      var left = names.toSet
      var progressed = true
      while (progressed) {
        val ready = left.filter(n =>
          deps.getOrElse(n, Seq.empty).forall(d => !left.contains(d)))
        progressed = ready.nonEmpty
        left = left.diff(ready)
      }
      require(left.isEmpty, s"Artifacts.deps contains a cycle through: ${left.mkString(",")}")
    }
    // Force Scala module (class-init) resolution on the caller's thread
    // BEFORE any pool thread first-touches one: the operator objects
    // reference each other (Dedup ↔ TextAnalysis, Graph → Dedup, ...),
    // and two pool threads first-initializing two mutually-referencing
    // modules deadlock on the JVM class-initialization monitors (observed
    // r14: the DAG executor's wider initial wave hit it immediately).
    locally {
      operators.Dedup.toString(); operators.Graph.toString()
      operators.Relational.toString(); operators.Similarity.toString()
      functions.TextAnalysis.toString(); functions.Multimodal.toString()
      functions.BpeTraining.toString(); streaming.Streams.toString()
      ()
    }
    val builders = all.toMap
    val failed = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val times = new java.util.concurrent.ConcurrentHashMap[String, Double]
    // remaining-dependency counts; an artifact is READY at zero
    val remaining = new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.atomic.AtomicInteger]
    val dependents = names.map(n => n ->
      deps.collect { case (m, ds) if ds.contains(n) => m }.toSeq).toMap
    names.foreach { n =>
      remaining.put(n, new java.util.concurrent.atomic.AtomicInteger(
        deps.getOrElse(n, Seq.empty).size))
    }
    val done = new java.util.concurrent.CountDownLatch(names.size)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, parallelism))
    val t0 = System.nanoTime()
    def submit(name: String): Unit = pool.execute { () =>
      val b0 = System.nanoTime()
      try {
        builders(name)(s, d)
        times.put(name, (System.nanoTime() - b0) / 1e9); ()
      } catch {
        case e: Throwable =>
          System.err.println(s"[artifacts] $name FAILED: ${e.getMessage}")
          failed.add(name); times.put(name, -1.0); ()
      }
      // release dependents regardless of outcome — a dependent of a
      // failed build either fails loudly itself (its memoized input
      // rethrows) or succeeds independently; both land in the report
      dependents(name).foreach { m =>
        if (remaining.get(m).decrementAndGet() == 0) submit(m)
      }
      done.countDown()
    }
    try {
      names.filter(n => remaining.get(n).get() == 0).foreach(submit)
      done.await()
    } finally pool.shutdown()
    val wall = (System.nanoTime() - t0) / 1e9
    import scala.jdk.CollectionConverters._
    (all.map { case (n, _) => n -> times.getOrDefault(n, -1.0) },
      failed.iterator().asScala.toSeq, wall)
  }
}
