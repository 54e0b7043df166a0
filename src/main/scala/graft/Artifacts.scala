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
    // --- media decode pass + the cross-modal labels built on it -------------
    "media_decoded"      -> ((s, d) => { functions.Multimodal.mediaDecoded(s, d); () }),
    "m11_labels"         -> ((s, d) => { functions.Multimodal.m11Labels(s, d); () }),
    // --- graph substrate -----------------------------------------------------
    "copurchase_edges"   -> ((s, d) => { operators.Graph.copurchaseEdges(s, d); () }),
    "triangle_rows"      -> ((s, d) => { operators.Graph.triangleRows(s, d); () }),
    "chunked_adjacency"  -> ((s, d) => { operators.Graph.chunkedAdjacency(s, d); () }),
    "lpa_labels"         -> ((s, d) => { operators.Graph.lpaLabels(s, d); () }),
    // --- text-curation intermediates -----------------------------------------
    "x25_chunks"         -> ((s, d) => { functions.TextAnalysis.x25Chunks(s, d); () }),
    "x26_bigrams"        -> ((s, d) => { functions.TextAnalysis.x26Bigrams(s, d); () }),
    "x31_shards"         -> ((s, d) => { functions.TextAnalysis.x31Export(s, d); () }),
    // --- relational layouts (partitioned/bucketed/fragmented/chunked) -------
    "year_layout"        -> ((s, d) => { operators.Relational.yearLayout(s, d); () }),
    "s10_buckets"        -> ((s, d) => { operators.Relational.s10Tables(s, d); () }),
    "s14_fragments"      -> ((s, d) => { operators.Relational.s14Layout(s, d); () }),
    "s20_chunks"         -> ((s, d) => { operators.Relational.s20Prepare(s, d); () }),
    "j21_skew"           -> ((s, d) => { operators.Relational.j21Materialize(s, d); () }),
    "s24_layout"         -> ((s, d) => { operators.Relational.s24Layout(s, d); () }),
    "s25_layout"         -> ((s, d) => { operators.Relational.s25Layout(s, d); () }),
    "s27_layout"         -> ((s, d) => { operators.Relational.s27Layout(s, d); () }),
    "s29_layout"         -> ((s, d) => { operators.Relational.s29Layout(s, d); () }),
    // --- governed lake: catalog first, then the tables inside it ------------
    "s30_lake"           -> ((s, d) => { operators.Relational.s30Lake(s, d); () }),
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
    // --- staged streaming inputs/outputs -------------------------------------
    "st24_waves"         -> ((s, d) => { streaming.Streams.st24Waves(s, d); () }),
    "st25_out"           -> ((s, d) => { streaming.Streams.st25Out(s, d); () }),
    "st26_out"           -> ((s, d) => { streaming.Streams.st26Out(s, d); () }),
    "st27_out"           -> ((s, d) => { streaming.Streams.st27Out(s, d); () }),
    "st28_table"         -> ((s, d) => { streaming.Streams.st28Table(s, d); () }))

  /** Force every artifact in pinned order, returning (name, seconds) per
    * build plus the names of builders that threw (recorded with time -1).
    * Failures are RETURNED, not rethrown — the sweep always completes so
    * one broken artifact cannot hide which later ones were also broken;
    * the CALLER owns failing the run (Bench exits rc 1 and lists them in
    * `errors`). */
  def prebuild(s: SparkSession, d: String): (Seq[(String, Double)], Seq[String]) = {
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val times = all.map { case (name, build) =>
      val t0 = System.nanoTime()
      val ok = try { build(s, d); true } catch {
        case e: Throwable =>
          System.err.println(s"[artifacts] $name FAILED: ${e.getMessage}")
          failed += name
          false
      }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    (times, failed.toSeq)
  }
}
