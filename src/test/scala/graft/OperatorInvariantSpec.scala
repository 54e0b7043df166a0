package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Cross-operator invariants (SURVEY.md §5.2 property tests) on sf0.001. */
class OperatorInvariantSpec extends SparkSpec {

  val d = sf("sf0.001")

  test("q08 invariant: H1 + H2 sales equal yearly sales per brand") {
    Olap.q08(spark, d).collect().foreach { r =>
      val h1 = r.getAs[Double]("h1_sales")
      val h2 = r.getAs[Double]("h2_sales")
      val y  = r.getAs[Double]("yearly_sales")
      assert(math.abs(h1 + h2 - y) < 1e-6, s"brand ${r.get(0)}: $h1 + $h2 != $y")
    }
  }

  test("q02 invariant: growth_pct is null exactly on each nation's first quarter") {
    val rows = Olap.q02(spark, d).collect()
    val byNation = rows.groupBy(_.getAs[String]("n_name"))
    byNation.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Int]("sales_quarter"))
      assert(sorted.head.isNullAt(sorted.head.fieldIndex("growth_pct")))
      assert(sorted.tail.forall(!_.isNullAt(sorted.head.fieldIndex("growth_pct"))))
    }
  }

  test("q09 invariant: spike rows are a labeled copy of daily rows (no row loss)") {
    val out = Olap.q09(spark, d)
    val daily = Tables.lineitem(spark, d)
      .groupBy(col("l_partkey"), col("l_shipdate").cast("date")).count()
    assert(out.count() === daily.count())
  }

  test("upsert last-write-wins is idempotent") {
    val once = Relational.s04UpsertLww(spark, d)
    // applying the same keyed-dedup again must be a no-op
    val again = once.groupBy(col("user_id"), col("event_type")).count()
      .filter(col("count") > 1)
    assert(again.count() === 0)
  }

  test("approx_count_distinct stays within 10% of exact counts") {
    val approx = Aggregates.a12ApproxDistinct(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Aggregates.a11DistinctAgg(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e < 0.10, s"$k: approx $a vs exact $e")
    }
  }

  test("rollup emits subtotal and grand-total marker rows") {
    val rows = Olap.q07(spark, d).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    val subtotals = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length === 1)
    assert(subtotals.nonEmpty)
    // grand total equals the sum of leaf rows
    val leaves = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(_.getAs[Double]("total_sales")).sum
    assert(math.abs(grand.head.getAs[Double]("total_sales") - leaves) < 1e-4)
  }

  test("set ops: intersect + except partition the urgent-order key set") {
    val rows = Relational.u02SetOps(spark, d).collect()
    val urgent = Tables.orders(spark, d)
      .filter(col("o_orderpriority") === "1-URGENT").count()
    assert(rows.length === urgent)
  }
}
