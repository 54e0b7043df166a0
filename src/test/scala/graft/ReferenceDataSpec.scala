package graft

import org.apache.spark.sql.functions._

import graft.sources.RetailIngest

/** End-to-end parity on the REFERENCE'S OWN data: the full ETL over
  * /root/reference/CSV must reproduce every structural fact the survey
  * established about that corpus (SURVEY.md §1.5, Appendix A). Skipped
  * when the reference snapshot is absent. */
class ReferenceDataSpec extends SparkSpec {

  private val refDir = "/root/reference/CSV"
  private def available = new java.io.File(refDir).isDirectory

  test("customers: 30,247 raw rows collapse to 100 distinct ids, last write wins") {
    assume(available)
    val raw = spark.read.option("header", "true")
      .csv(s"$refDir/customers_data.csv")
    assert(raw.count() === 30247)
    val deduped = RetailIngest.customers(spark, s"$refDir/customers_data.csv")
    assert(deduped.count() === 100)
    assert(deduped.select("customer_id").distinct().count() === 100)
  }

  test("products: 101 rows; quoted supplier names parse intact; prices cleaned") {
    assume(available)
    val p = RetailIngest.products(spark, s"$refDir/products_data.csv").collect()
    assert(p.length === 101)
    val suppliers = p.map(_.getAs[String]("supplierName")).toSet
    assert(suppliers.contains("Amazon.com, Inc."), "RFC-4180 quotes must survive")
    assert(suppliers.contains("Roku, Inc."))
    // planted anomaly row ingests normally (store 51 / Pakistan, SURVEY App. A)
    assert(p.exists(r => r.getAs[String]("storeID") == "51"))
    // every price parsed to a non-null DECIMAL(10,2) (the `$` suffix stripped)
    assert(p.forall(r => !r.isNullAt(r.fieldIndex("productPrice"))))
  }

  test("transactions: 30,247 rows, distinct ORDER_IDs, the 1819 outlier survives") {
    assume(available)
    val t = RetailIngest.transactions(spark, s"$refDir/transactions.csv")
    assert(t.count() === 30247)
    assert(t.select("order_id").distinct().count() === 30247)
    val years = t.select(year(col("order_date"))).distinct()
      .collect().map(_.getInt(0)).sorted
    assert(years.head === 1819, "outlier date must parse, not crash (SURVEY App. A)")
    assert(years.last === 2019)
  }

  test("full ETL: fact grain is the order — one row per ORDER_ID, SALE derived") {
    assume(available)
    val fact = RetailIngest.etl(spark, refDir)
    val n = fact.count()
    assert(n === fact.select("ORDER_ID").distinct().count(),
      "upsert must collapse to PK grain")
    // inner-join semantics (MeshJoin.java:264-267): only rows matching both
    // dims emit; ORDER_IDs are unique so the fact keeps ~the full stream
    assert(n > 29000 && n <= 30247)
    val bad = fact.filter(
      col("SALE") =!= (col("QUANTITY") * col("PRODUCT_PRICE")).cast("decimal(10,2)"))
      .count()
    assert(bad === 0, "SALE = QUANTITY × PRODUCT_PRICE everywhere")
  }
}
