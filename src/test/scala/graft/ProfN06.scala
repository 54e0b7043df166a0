package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler for slow bench entries — test scope, not shipped. */
object ProfN06 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    def time(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime; f
      println(f"$tag: ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    for (q <- args) {
      time(q + " cold")(SparkEntry.queries(q)(spark, d).count())
      time(q + " warm")(SparkEntry.queries(q)(spark, d).count())
    }
    spark.stop()
  }
}
