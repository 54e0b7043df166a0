package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timer (prints incrementally, unlike Bench's single JSON
  * line) — `runMain graft.QBench <sfDir> [prefix...]`.
  *
  * Runs the SAME artifact pre-build phase as Bench by default, so ad-hoc
  * timings measure queries rather than whichever entry first-touches a
  * shared layout/signature/decode artifact (pre-r11 QBench smeared those
  * builds into the first entry of the sweep, which made every ad-hoc
  * adjudication table need first-touch footnotes). `SPARK_GRAFT_COLD=1`
  * skips the pre-build to deliberately measure the cold first-touch path. */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val prefixes = if (args.length > 1) args.tail.toSeq else Seq("")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // same extensions as Verify/Bench/DumpOne — otherwise QBench times a
      // DIFFERENT plan for the rewrite-dependent entries (p08/p14/j19)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // shuffle/spill on the headroom-checked scratch policy (shm first) —
      // the r8 driver bench was lost to disk-contended /tmp shuffle dirs
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
    if (sys.env.get("SPARK_GRAFT_COLD").forall(_ != "1")) {
      val (_, failed, wall) = Artifacts.prebuild(spark, sfDir)
      println(f"QBENCH artifacts prebuilt in $wall%.2f s" +
        (if (failed.isEmpty) "" else s" (FAILED: ${failed.mkString(", ")})"))
    }
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val rows = try fn(spark, sfDir).count() catch { case e: Throwable => println(s"$name ERROR $e"); -1L }
        println(f"QBENCH $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  $rows rows")
      }
    spark.stop()
  }
}
