package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The reference's core pipeline in one declarative plan: the MESHJOIN
    * stream-static enrichment (`Java/MeshJoin.java:216-284`) re-expressed as
    * a broadcast 3-way join (orders × customer × nation) + the derived SALE
    * column (`MeshJoin.java:265`) + a grouped revenue rollup.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    Tables.orders(spark, d)
      .join(broadcast(Tables.customer(spark, d)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, d)),
        col("c_nationkey") === col("n_nationkey"))
      .withColumn("sale", col("o_totalprice").cast(DecimalType(18, 2)))
      .groupBy(col("n_name"), col("c_mktsegment"))
      .agg(sum(col("sale")).cast(DoubleType).as("total_sales"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("n_name"), col("c_mktsegment"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Olap.queries ++ Relational.queries ++ Aggregates.queries ++
      graft.streaming.Streams.queries ++
      Dedup.queries ++ Similarity.queries ++ Graph.queries ++
      graft.functions.TextAnalysis.queries ++ graft.functions.Multimodal.queries ++
      graft.sources.RetailIngest.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops →
    * driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    Olap.oracles ++ Relational.oracles ++ Aggregates.oracles ++
      graft.streaming.Streams.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ Graph.oracles ++
      graft.functions.TextAnalysis.oracles ++ graft.functions.Multimodal.oracles ++
      graft.sources.RetailIngest.oracles
}
