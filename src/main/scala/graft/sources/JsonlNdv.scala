package graft.sources

import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union}

/** Sidecar NDV sketches: per-file HyperLogLog of selected columns
  * (`ndvFor` write option), published in the `_stats-*` sidecar (`_ndv`,
  * base64 compact DataSketches HLL) and MERGED AT PLAN TIME across any
  * live file set — distinct counts for the planner at zero data read,
  * the same role Iceberg's Puffin `apache-datasketches-theta-v1` blobs
  * and parquet's NDV column stats play.
  *
  * Why sketches and not exact counts: per-file exact distinct counts do
  * not compose (the union of two files' distincts is not their sum), but
  * HLL registers max-merge losslessly — the merged estimate is the same
  * as if one sketch had seen every row, at ~1.6% rsd for lgK=12. That is
  * what makes the statistic trustworthy over a 100 TB table assembled by
  * thousands of independent commits.
  *
  * Coverage discipline (the metadata-aggregation rule): EVERY live data
  * file must carry a sketch for the column or the answer is None — a
  * partially-covered estimate would silently under-count, and the
  * planner would broadcast on fiction. Delete vectors only shrink the
  * true distinct count, so a merged estimate over MOR files OVERSTATES —
  * the safe direction for a broadcast decision. */
private[graft] object JsonlNdv {

  /** lgK = 12 → 4096 registers, ~1.6% relative standard error, ≤ ~2.5 KB
    * compact per (file, column) — sidecar-weight. */
  val LgK = 12

  def emptySketch(): HllSketch = new HllSketch(LgK)

  /** Merged NDV estimate for `col` over the table's LIVE data files;
    * None unless every live file carries a sketch for the column. */
  def mergedNdv(dir: String, col: String): Option[Double] = {
    val live = JsonlV2.listFiles(dir)
      .map(f => f._1.substring(f._1.lastIndexOf('/') + 1))
    if (live.isEmpty) return Some(0.0)
    val stats = JsonlV2.loadStats(dir)
    val sketches = live.map(n => stats.get(n).flatMap(_.ndv.get(col)))
    if (sketches.exists(_.isEmpty)) return None
    val u = new Union(LgK)
    sketches.flatten.foreach(b => u.update(HllSketch.heapify(b)))
    Some(u.getResult(TgtHllType.HLL_4).getEstimate)
  }
}
