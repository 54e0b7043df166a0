package graft
import org.apache.spark.sql.SparkSession
/** Dump a single harness query's result to parquet — the targeted face of
  * [[Verify]] for spot-checking one entry against its oracle without
  * re-running the whole surface. Usage: DumpOne <sfDir> <outDir> <name>... */
object DumpOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
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
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"DUMPED $name")
    }
    // The same manifest pair Verify writes, restricted to the dumped names,
    // so `scripts/check.py <sf> --skip-verify` gates a targeted dump dir.
    import JsonEscape.q
    val oracles = names.toSeq.flatMap(n =>
      SparkEntry.oracleSql.get(n).map(sql => s"${q(n)}: ${q(sql)}"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      oracles.mkString("{", ", ", "}").getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/queries.json"),
      names.toSeq.map(q).mkString("[", ", ", "]").getBytes("UTF-8"))
    spark.stop()
  }
}
