package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Physical-schema drift guard (round-4 postmortem).
  *
  * The harness regenerates /root/testdata between rounds and has already
  * changed `events.ts`'s physical encoding once (INT64 TIMESTAMP(NANOS) →
  * timestamp[us] TIMESTAMP_NTZ), which silently killed 12 operators at
  * analysis time. This spec pins the POST-NORMALIZATION contract every
  * consumer relies on, so the next drift fails here — one obvious place —
  * instead of as 12 absent correctness rows.
  */
class SchemaSpec extends SparkSpec {
  private val d = sf("sf0.001")

  test("events.ts normalizes to instant-semantics TimestampType, whatever " +
    "the parquet encoding (INT64-nanos, µs-NTZ, µs-UTC)") {
    val e = Tables.events(spark, d)
    assert(e.schema("ts").dataType === TimestampType)
    // unix_millis is TZ-typed — this is the exact call that died at analysis
    // when NTZ leaked through in round 4
    e.select(unix_millis(col("ts"))).head
  }

  test("events.ts epoch values are sane after normalization (a wrong " +
    "unit/timezone reinterpretation lands decades away, e.g. 1970-01-20)") {
    val yr = Tables.events(spark, d)
      .agg(min(year(col("ts"))).as("lo"), max(year(col("ts"))).as("hi")).head
    assert(yr.getInt(0) >= 2020 && yr.getInt(1) <= 2030,
      s"events.ts years [${yr.getInt(0)}, ${yr.getInt(1)}] outside the " +
        "plausible window — unit or timezone reinterpretation drift")
  }

  test("events columns besides ts keep their contracted types") {
    val s = Tables.events(spark, d).schema
    assert(s("event_id").dataType === LongType)
    assert(s("user_id").dataType === LongType)
    assert(s("event_type").dataType === StringType)
    assert(s("value").dataType === DoubleType)
  }

  test("orders/lineitem date columns accept datetime arithmetic and land " +
    "in the TPC-H-ish year range") {
    val o = Tables.orders(spark, d)
    val l = Tables.lineitem(spark, d)
    // year()/date comparisons must analyze on whatever encoding arrives
    val oy = o.agg(min(year(col("o_orderdate"))), max(year(col("o_orderdate")))).head
    val ly = l.agg(min(year(col("l_shipdate"))), max(year(col("l_shipdate")))).head
    assert(oy.getInt(0) >= 1990 && oy.getInt(1) <= 2030)
    assert(ly.getInt(0) >= 1990 && ly.getInt(1) <= 2030)
    // the inYear pushdown-friendly range predicate must stay analyzable
    o.filter(Ops.inYear(col("o_orderdate"), 2024)).limit(1).collect()
  }

  test("orders/lineitem money columns stay numeric (decimal-sum boundary " +
    "depends on a lossless cast to DECIMAL(18,2))") {
    val o = Tables.orders(spark, d).schema
    val l = Tables.lineitem(spark, d).schema
    assert(o("o_totalprice").dataType === DoubleType)
    for (c <- Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      assert(l(c).dataType === DoubleType, s"lineitem.$c drifted")
  }

  test("streaming raw schema matches the physical events parquet (a " +
    "declared-schema mismatch reads garbage instead of failing)") {
    val phys = spark.read.parquet(s"$d/events.parquet").schema
    // the streaming reader declares eventsRawSchema up front; its ts branch
    // must agree with what parquet actually holds
    val declared = graft.streaming.Streams.eventsRawSchema
    assert(declared.fieldNames.toSeq === phys.fieldNames.toSeq)
    assert(declared("ts").dataType === phys("ts").dataType,
      s"eventsRawSchema.ts=${declared("ts").dataType} but parquet holds " +
        s"${phys("ts").dataType} — update Streams.eventsRawSchema and " +
        "normalizeTs together")
  }

  test("embeddings/documents contracted types for the ANN/dedup families") {
    val e = Tables.embeddings(spark, d).schema
    assert(e("embedding").dataType === ArrayType(FloatType, containsNull = true) ||
      e("embedding").dataType === ArrayType(FloatType, containsNull = false))
    val doc = Tables.documents(spark, d).schema
    assert(doc("doc_id").dataType === LongType)
    assert(doc("text").dataType === StringType)
  }
}
