package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler decomposing the d-family cold artifact build —
  * test scope, not shipped. */
object ProfD02 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", Scratch.localDir)
      // storage-partitioned reads: let V2 scans honor KeyGroupedPartitioning
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      // sides clustered on a SUBSET of the join keys are still co-partitioned
      // (same key -> same partition pair) -- required for storage-partitioned
      // joins whose keys superset the layout's partition columns
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    def time(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime; f
      println(f"PROF $tag: ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    time("shingled build")(graft.operators.Dedup.shingled(spark, d).count())
    time("shingled reread")(graft.operators.Dedup.shingled(spark, d).count())
    time("ranked postings build")(
      graft.operators.Dedup.rankedPostings(spark, d).count())
    time("d02 pairs (after postings)")(
      SparkEntry.queries("d02_ngram_jaccard")(spark, d).count())
    time("d02 warm")(SparkEntry.queries("d02_ngram_jaccard")(spark, d).count())
    time("d14 (after d02)")(SparkEntry.queries("d14_containment")(spark, d).count())
    time("d15 (after d02)")(SparkEntry.queries("d15_winnowing")(spark, d).count())
    spark.stop()
  }
}
