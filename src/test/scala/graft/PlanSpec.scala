package graft

import graft.operators.{Olap, Relational}

/** Physical-plan regression guards: the scale-critical plan properties —
  * filters reaching the parquet scan, dimension joins broadcasting, top-k
  * avoiding a global sort — must not silently regress when query code is
  * edited (they are invisible to result-correctness tests). */
class PlanSpec extends SparkSpec {

  val d = sf("sf0.001")

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q01: year range is pushed to the lineitem scan and part broadcasts") {
    val p = plan(Olap.q01(spark, d))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), "range pushdown lost")
    assert(p.contains("LessThan(l_shipdate"), "range pushdown lost")
    assert(p.contains("BroadcastHashJoin"), "dim join must broadcast")
  }

  test("q01: top-5 plans as TakeOrderedAndProject, not a global sort") {
    assert(plan(Olap.q01(spark, d)).contains("TakeOrderedAndProject"))
  }

  test("p01: scan reads only the projected columns") {
    val p = plan(Relational.queries("p01_projection")(spark, d))
    val schema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!schema.contains("l_comment") && !schema.contains("l_shipmode"),
      s"column pruning lost: $schema")
  }

  test("j01: MESHJOIN enrichment is a broadcast join (no shuffle of the fact)") {
    val p = plan(Relational.queries("j01_meshjoin_enrich")(spark, d))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), "dims must not shuffle-join")
  }

  test("a01: grouped sum is a two-phase hash aggregate (map-side partial)") {
    val p = plan(graft.operators.Aggregates.queries("a01_grouped_sum")(spark, d))
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "partial+final aggregation expected")
  }
}
