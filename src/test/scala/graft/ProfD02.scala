package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the d02 build chain — test scope, not shipped. */
object ProfD02 {
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
    val d = "/root/testdata/sf0.1"
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    def time(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime; f
      println(f"$tag: ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    graft.functions.WordShingles.register(spark)
    graft.functions.SortedInterCount.register(spark)
    import org.apache.spark.sql.expressions.Window
    val sh = Tables.documents(spark, d)
      .repartition(32, col("doc_id"))
      .withColumn("shingles", expr("word_shingles(text, 3)"))
      .withColumn("hs", array_sort(expr("transform(shingles, x -> xxhash64(x))")))
      .select(col("doc_id"), col("shingles"), col("hs"))
      .cache()
    time("shingle+cache")(sh.count())
    val exh = sh.select(col("doc_id"), explode(col("hs")).as("h"))
    val dfreq = exh.groupBy(col("h")).agg(count(lit(1)).as("df"))
    time("dfreq")(dfreq.count())
    val byDoc = Window.partitionBy(col("doc_id"))
    val prefix = exh.join(dfreq, "h")
      .withColumn("rk", row_number().over(byDoc.orderBy(col("df"), col("h"))))
      .withColumn("n_h", count(lit(1)).over(byDoc))
      .filter(col("rk") <= floor(col("n_h") / 2) + 1)
      .select(col("doc_id"), col("h"))
      .cache()
    time("prefix+cache")(prefix.count())
    val cands = prefix.toDF("ia", "h")
      .join(prefix.toDF("ib", "h"), Seq("h"))
      .filter(col("ia") < col("ib"))
      .select(col("ia"), col("ib")).distinct()
    time("cands")(cands.count())
    val byId = sh.select(col("doc_id"), col("hs"))
    val ver = cands
      .join(byId.toDF("ia", "hs_a"), "ia")
      .join(byId.toDF("ib", "hs_b"), "ib")
      .withColumn("inter", expr("sorted_inter_count(hs_a, hs_b)"))
      .select(col("ia"), col("ib"),
        (col("inter").cast("double") /
          (size(col("hs_a")) + size(col("hs_b")) - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
    time("verify")(ver.count())
    time("verify2")(ver.count())
    ver.write.mode("overwrite").parquet("/tmp/profd02_pairs")
    time("write")(())
    spark.stop()
  }
}
