package graft

import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** Stream ≡ batch equivalence (SURVEY.md §7.3 M4): the streaming plans must
  * produce exactly the batch-twin results once all micro-batches drain. */
class StreamingSpec extends SparkSpec {

  val d = sf("sf0.001")

  private def normalize(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("tumbling window: streaming result equals the batch twin") {
    val streamed = Streams.runToMemory(spark,
      Streams.tumblingAgg(Streams.eventsStream(spark, d)), "t_tumbling",
      mode = "complete")
    val batch = Streams.st01Tumbling(spark, d)
    assert(normalize(streamed) === normalize(batch))
  }

  test("sliding window: streaming result equals the batch twin") {
    val streamed = Streams.runToMemory(spark,
      Streams.slidingAgg(Streams.eventsStream(spark, d)), "t_sliding",
      mode = "complete")
    val batch = Streams.st02Sliding(spark, d)
    assert(normalize(streamed) === normalize(batch))
  }

  test("session window: streaming result equals the batch twin") {
    val streamed = Streams.runToMemory(spark,
      Streams.sessionAgg(Streams.eventsStream(spark, d)), "t_session",
      mode = "complete")
    val batch = Streams.st03Session(spark, d)
    assert(normalize(streamed) === normalize(batch))
  }

  test("streaming MESHJOIN: stream-static enrichment equals the batch join") {
    val orders = Tables.orders(spark, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    val streamed = Streams.runToMemory(spark,
      Streams.streamingEnrich(Streams.eventsStream(spark, d), orders)
        .select(col("event_id"), col("user_id"), col("n_orders")),
      "t_enrich")
    val batch = Tables.events(spark, d)
      .join(broadcast(orders), col("user_id") === col("o_custkey"), "inner")
      .select(col("event_id"), col("user_id"), col("n_orders"))
    assert(normalize(streamed) === normalize(batch))
  }

  test("mapGroupsWithState: streaming running aggregate converges to the batch twin") {
    // update mode emits one row per (user, micro-batch); the final row per
    // user is the converged state and must equal the batch evaluation
    val streamed = Streams.runToMemory(spark,
      Streams.statefulUserAgg(spark, Streams.eventsStream(spark, d)).toDF(),
      "t_stateful", mode = "update")
    val finalPerUser = streamed.collect()
      .groupBy(_.getLong(0))
      .map { case (uid, rows) => (uid, rows.map(_.getLong(1)).max,
        rows.maxBy(_.getLong(1)).getDouble(2)) }
      .toSet
    val batch = Streams.st04Stateful(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(finalPerUser === batch)
  }

  test("mapGroupsWithState: streaming bounded top-k converges to the batch " +
    "window model regardless of micro-batch slicing") {
    val streamed = Streams.runToMemory(spark,
      Streams.statefulTopK(spark, Streams.eventsStream(spark, d)).toDF(),
      "t_topk", mode = "update")
    // update mode: per key, the row with max n_seen is the converged state
    val finalPerKey = streamed.collect()
      .groupBy(_.getString(0))
      .map { case (k, rows) =>
        val last = rows.maxBy(_.getLong(1))
        (k, last.getSeq[Long](2).toList, last.getSeq[Double](3).toList)
      }.toSet
    val batch = Streams.statefulTopK(spark, Tables.events(spark, d)).collect()
      .map(t => (t.event_type, t.ids.toList, t.vals.toList)).toSet
    assert(finalPerKey === batch)
  }

  test("stream-stream range join: streaming pairs equal the batch twin") {
    val streamed = Streams.runToMemory(spark,
      Streams.streamStreamJoin(Streams.eventsStream(spark, d)), "t_ssjoin")
      .orderBy("purchase_id", "view_ms").collect()
    val batch = Streams.st06StreamStreamJoin(spark, d).collect()
    assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
  }

  test("left-outer stream-stream join: matched pairs equal the batch twin; " +
    "unmatched purchases emit ONE null row once the view watermark passes") {
    val streamed = Streams.runToMemory(spark,
      Streams.streamStreamOuterJoin(Streams.eventsStream(spark, d)), "t_ssouter")
      .collect().map(_.toSeq)
    val batch = Streams.st11OuterJoin(spark, d).collect().map(_.toSeq)
    val (sMatch, sNull) = streamed.partition(_(2) != null)
    val (bMatch, bNull) = batch.partition(_(2) != null)
    assert(sMatch.sortBy(_.toString).toSeq === bMatch.sortBy(_.toString).toSeq,
      "matched pairs must equal the batch join exactly")
    // a null row may only emit when the view-side watermark has passed the
    // purchase ts; purchases after (max view ts − 10 min) stay in state —
    // the honest streaming semantics, so compare against the batch nulls
    // restricted to finalized purchases
    val wmFinalMs = Tables.events(spark, d)
      .filter(col("event_type") === "view")
      .agg(max(unix_millis(col("ts")))).head().getLong(0) - 600000L
    val bNullFinal = bNull.filter(_(1).asInstanceOf[Long] < wmFinalMs)
    val sNullSet = sNull.map(_(0)).toSeq
    assert(sNullSet.distinct.size === sNullSet.size,
      "an unmatched purchase emitted twice")
    assert(sNull.map(_.take(2)).toSet.subsetOf(bNull.map(_.take(2)).toSet),
      "streamed null row not an unmatched batch purchase")
    assert(bNullFinal.map(_.take(2)).toSet.subsetOf(sNull.map(_.take(2)).toSet),
      "a finalized unmatched purchase never emitted its null row")
    assert(bNullFinal.nonEmpty, "scenario degenerate: no finalized unmatched purchases")
  }

  test("bounded-state dedup (dropDuplicatesWithinWatermark): exact — the " +
    "day-bucketed key keeps every duplicate inside the watermark window") {
    val streamed = Streams.runToMemory(spark,
      Streams.boundedDedup(Streams.eventsStream(spark, d)), "t_bdedup")
      .collect().map(_.toSeq)
    val batch = Streams.st12BoundedDedup(spark, d).collect().map(_.toSeq)
    assert(streamed.length === streamed.distinct.length, "key emitted twice")
    assert(streamed.toSet === batch.toSet,
      "bounded dedup must equal the batch distinct (25h delay covers the " +
        "24h intra-key spread)")
  }

  test("streaming incremental dedup: converged per-fingerprint verdicts " +
    "equal the batch twin across micro-batch boundaries") {
    val docsStatic = Tables.documents(spark, d)
      .select(col("doc_id"), col("text"))
    val batchStream = graft.operators.Dedup
      .d11Batch(Streams.documentsStream(spark, d))
      .select(col("doc_id"), md5(col("text")).as("fp"))
    val streamed = Streams.runToMemory(spark,
      Streams.streamingIncrementalDedup(batchStream,
        graft.operators.Dedup.d11Store(docsStatic)),
      "t_incdedup", mode = "update")
    // update mode: per fingerprint, the row with max n_arrivals is the
    // converged state (count is monotone across micro-batches)
    val finalPerFp = streamed.collect()
      .groupBy(_.getString(0))
      .map { case (fp, rows) =>
        val last = rows.maxBy(_.getLong(1))
        (fp, last.getLong(1), last.getLong(2),
          Option(last.get(3)), last.getString(4))
      }.toSet
    val batch = Streams.queries("st13_incremental_dedup")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)), r.getString(4))).toSet
    assert(finalPerFp === batch)
  }

  test("streaming dedup: kept key set equals the batch distinct") {
    val streamed = Streams.runToMemory(spark,
      Streams.streamingDedup(Streams.eventsStream(spark, d)), "t_dedup")
    assert(normalize(streamed) ===
      normalize(Streams.st05Dedup(spark, d)))
  }

  test("streaming corpus ingest: kept (lang, fp) key set equals the batch distinct") {
    // quality filter is stateless; the dedup state must hold across the 4
    // staged micro-batches — a duplicate arriving in a later batch is
    // dropped, so the kept key set equals the batch-side distinct
    val streamed = Streams.runToMemory(spark,
      Streams.corpusIngest(Streams.documentsStream(spark, d)), "t_corpus")
    val batch = Tables.documents(spark, d)
      .withColumn("quality", graft.functions.TextAnalysis.qualityCol)
      .filter(col("quality") >= 0.45)
      .select(col("lang"), md5(col("text")).as("fp")).distinct()
    assert(normalize(streamed) === normalize(batch))
    // and the aggregated harness entry sees the same per-language counts
    val agg = streamed.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"))
    assert(normalize(agg) === normalize(Streams.st07CorpusIngest(spark, d)))
  }

  test("watermark drop: a three-weeks-late wave arriving two batches after " +
    "the watermark advanced is discarded; on-time windows emit exactly once") {
    import java.sql.Timestamp
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val staged = Streams.lateStagedEvents(spark, d)
    val streamed = Streams.runToMemory(spark,
      Streams.tumblingAgg(Streams.lateEventsStream(spark, staged)),
      "t_late_drop", mode = "append")

    // Batch model = the st08 gate entry (what the driver's DuckDB oracle
    // checks): late wave contributes nothing, only windows the final
    // watermark passed emit. Watermarks are (max ts − 10 min) — not
    // hour-aligned for this corpus — so <, ≤ boundary choices cannot matter.
    val ev = Tables.events(spark, d)
    val lateCut = new Timestamp(Streams.LateCutNs / 1000000L)
    val lateWave = ev.filter(col("ts") < lit(lateCut))
    val model = Streams.st08LateDrop(spark, d)
    // sanity: the late wave is non-trivial and lands entirely in windows the
    // final output contains — were it merged, counts would differ
    assert(lateWave.count() > 0, "no late rows staged")
    assert(normalize(streamed) !== normalize(model.unionAll(
      lateWave.groupBy(date_trunc("hour", col("ts")).as("window_start"),
        col("event_type")).agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType)
          .as("total_value")))), "scenario degenerate: late wave invisible")
    // append mode must emit each finalized window exactly once
    val keys = streamed.collect().map(r => (r.get(0), r.getString(1))).toSeq
    assert(keys.distinct.size === keys.size, "window emitted twice")
    assert(normalize(streamed) === normalize(model))
  }

  test("streaming OHLC: algebraic bar state converges to the batch twin " +
    "across micro-batch boundaries") {
    import java.nio.file.Files
    import org.apache.spark.sql.types._
    // stage as 4 files so bars genuinely merge across micro-batches
    val staged = Files.createTempDirectory("graft_st16_events").toString
    Tables.events(spark, d).filter(col("user_id") % 10 === 7)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .repartition(4).write.mode("overwrite").parquet(staged)
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("user_id", LongType), StructField("event_id", LongType),
        StructField("ts", TimestampType), StructField("value", DoubleType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(staged)
    val streamed = Streams.runToMemory(spark,
      Streams.streamingOhlc(stream), "t_ohlc", mode = "update")
    // update mode: the converged row per bar is the one with max n_events
    val finalPerKey = streamed.collect()
      .groupBy(r => (r.getLong(0), r.getString(1)))
      .map { case (_, rows) => rows.maxBy(_.getLong(6)).toSeq }
      .toSet
    val batch = Streams.st16StreamOhlc(spark, d).collect().map(_.toSeq).toSet
    assert(finalPerKey === batch)
  }

  test("foreachBatch matview: the merged state converges to the batch " +
    "aggregate across micro-batch boundaries") {
    import java.nio.file.Files
    import org.apache.spark.sql.types._
    // stage as 4 files so the merge path genuinely crosses batches
    val staged = Files.createTempDirectory("graft_st10_events").toString
    Tables.events(spark, d).select(col("event_type"), col("value"))
      .repartition(4).write.mode("overwrite").parquet(staged)
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("event_type", StringType), StructField("value", DoubleType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(staged)
    val stateRoot = Files.createTempDirectory("graft_st10_state").toString
    val q = Streams.matviewStream(stream, stateRoot)
    q.processAllAvailable(); q.stop()
    val got = Streams.matviewState(spark, stateRoot).collect().map(_.toSeq)
    val want = Streams.st10Matview(spark, d).collect().map(_.toSeq)
    assert(got === want)
  }

  test("foreachBatch matview: a checkpointed stop/restart resumes batch ids " +
    "past the replay fence and converges to the full batch aggregate") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import org.apache.spark.sql.types._
    // stage HALF the corpus, run, stop; stage the rest, RESTART on the same
    // checkpoint + state root. If restarted ids began at 0 again, the
    // id <= lastApplied fence would wrongly drop the new batches — this
    // test pins the monotonic-id contract the fence relies on.
    val src = Files.createTempDirectory("graft_st10_restart_src").toString
    val stash = Files.createTempDirectory("graft_st10_restart_stash").toString
    Tables.events(spark, d).select(col("event_type"), col("value"))
      .repartition(4).write.mode("overwrite").parquet(stash)
    val parts = new java.io.File(stash).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(parts.length === 4)
    parts.take(2).foreach(f => Files.copy(f.toPath,
      Paths.get(src, f.getName), StandardCopyOption.REPLACE_EXISTING))
    val schema = StructType(Seq(
      StructField("event_type", StringType), StructField("value", DoubleType)))
    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val stateRoot = Files.createTempDirectory("graft_st10_restart_state").toString
    val ckpt = Files.createTempDirectory("graft_st10_restart_ckpt").toString
    val q1 = Streams.matviewStream(stream(), stateRoot, Some(ckpt))
    q1.processAllAvailable(); q1.stop()
    val marker1 = new String(java.nio.file.Files.readAllBytes(
      Paths.get(s"$stateRoot/LATEST")), "UTF-8").split("\n", 2)
    val idAfterFirstRun = marker1(1).trim.toLong
    parts.drop(2).foreach(f => Files.copy(f.toPath,
      Paths.get(src, f.getName), StandardCopyOption.REPLACE_EXISTING))
    val q2 = Streams.matviewStream(stream(), stateRoot, Some(ckpt))
    q2.processAllAvailable(); q2.stop()
    val marker2 = new String(java.nio.file.Files.readAllBytes(
      Paths.get(s"$stateRoot/LATEST")), "UTF-8").split("\n", 2)
    assert(marker2(1).trim.toLong > idAfterFirstRun,
      "restarted batch ids must continue past the fence, not restart at 0")
    val got = Streams.matviewState(spark, stateRoot).collect().map(_.toSeq)
    val want = Streams.st10Matview(spark, d).collect().map(_.toSeq)
    assert(got === want, "restarted matview diverged from the batch aggregate")
  }

  test("foreachBatch matview: replaying a committed batch id is a no-op " +
    "(at-least-once delivery cannot double-merge the state)") {
    import java.nio.file.Files
    val stateRoot = Files.createTempDirectory("graft_st10_replay").toString
    val b0 = Tables.events(spark, d).select(col("event_type"), col("value"))
    Streams.matviewMergeBatch(b0, 0L, stateRoot)
    val once = Streams.matviewState(spark, stateRoot).collect().map(_.toSeq)
    // failure between state write and checkpoint commit → same id re-delivered
    Streams.matviewMergeBatch(b0, 0L, stateRoot)
    val twice = Streams.matviewState(spark, stateRoot).collect().map(_.toSeq)
    assert(twice === once, "replayed batch was merged twice")
    // and a genuinely new id still advances the state
    Streams.matviewMergeBatch(b0, 1L, stateRoot)
    val advanced = Streams.matviewState(spark, stateRoot).collect().map(_.toSeq)
    assert(advanced !== once, "fresh batch id was wrongly fenced")
    // a REGRESSED id means a new lineage on old state: loud failure, not a
    // silent skip (and never a merge)
    intercept[IllegalStateException] {
      Streams.matviewMergeBatch(b0, 0L, stateRoot)
    }
    val after = Streams.matviewState(spark, stateRoot).collect().map(_.toSeq)
    assert(after === advanced, "rejected lineage must not touch state")
  }

  test("st28 streaming merge: replaying a committed epoch is a no-op on " +
    "rows AND on the directory (no second round of vectors/files), a fresh " +
    "epoch advances, a regressed id fails loudly") {
    import java.nio.file.Files
    val cat = {
      val wh = Files.createTempDirectory("graft_st28_replay").toString
      spark.conf.set("spark.sql.catalog.graft_st28_replay",
        classOf[graft.sources.JsonlCatalog].getName)
      spark.conf.set("spark.sql.catalog.graft_st28_replay.warehouse", wh)
      "graft_st28_replay"
    }
    spark.sql(s"CREATE NAMESPACE $cat.lake")
    val tbl = s"$cat.lake.t"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, lang STRING, " +
      s"source STRING, n_chars BIGINT) PARTITIONED BY (lang) " +
      s"TBLPROPERTIES ('merge.mode' = 'merge-on-read')")
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    docs.filter(expr("doc_id % 2 = 0"))
      .withColumn("n_chars", lit(-1L)).writeTo(tbl).append()
    val dir = spark.conf.get(s"spark.sql.catalog.$cat.warehouse") + "/lake/t"
    val fence = Files.createTempDirectory("graft_st28_fence").toString
    def snapshot: Seq[(String, Long)] =
      new java.io.File(dir).listFiles().toSeq
        .filter(_.isFile).map(f => f.getName -> f.length).sortBy(_._1)

    val b0 = docs.filter(expr("doc_id % 3 = 0"))
    Streams.st28MergeBatch(b0, 0L, tbl, fence)
    val once = spark.table(tbl).collect().map(_.toString).sorted.toSeq
    val filesOnce = snapshot
    // at-least-once: the SAME epoch re-delivered must change nothing —
    // not the rows, not the directory (no extra vectors, no extra files)
    Streams.st28MergeBatch(b0, 0L, tbl, fence)
    assert(spark.table(tbl).collect().map(_.toString).sorted.toSeq === once,
      "replayed epoch changed rows")
    assert(snapshot === filesOnce, "replayed epoch touched the directory")
    // a fresh epoch advances the state
    Streams.st28MergeBatch(docs.filter(expr("doc_id % 7 = 1")), 1L, tbl, fence)
    val advanced = spark.table(tbl).collect().map(_.toString).sorted.toSeq
    assert(advanced !== once, "fresh epoch was wrongly fenced")
    // expected state: seeds upserted by the two epochs
    val want = docs
      .withColumn("n_chars",
        when(expr("doc_id % 3 = 0 OR doc_id % 7 = 1"), col("n_chars"))
          .otherwise(lit(-1L)))
      .filter(expr("doc_id % 2 = 0 OR doc_id % 3 = 0 OR doc_id % 7 = 1"))
      .collect().map(_.toString).sorted.toSeq
    assert(advanced === want)
    // a regressed id is a new lineage on old state: loud, untouched
    intercept[IllegalStateException] {
      Streams.st28MergeBatch(b0, 0L, tbl, fence)
    }
    assert(spark.table(tbl).collect().map(_.toString).sorted.toSeq === advanced)
  }

  test("flatMapGroupsWithState sessionization: two staged micro-batches " +
    "(events, then flush sentinels) reproduce the w12 window result — " +
    "open sessions survive the state round-trip between batches") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // batch 1: the events table; batch 2: the per-user flush sentinels.
    // File-stream order is by modification time, so stamp the sentinel
    // file strictly later.
    val staged = Files.createTempDirectory("graft_sess_stream")
    Files.copy(Paths.get(s"$d/events.parquet"),
      staged.resolve("a_events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val sentDir = Files.createTempDirectory("graft_sess_sent")
    Streams.sessionSentinels(Tables.events(spark, d))
      .select(col("event_id"),
        col("ts").cast(org.apache.spark.sql.types.TimestampNTZType).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(sentDir.toString)
    val sentFile = new java.io.File(sentDir.toString).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val target = staged.resolve("b_sentinels.parquet")
    Files.copy(sentFile.toPath, target, StandardCopyOption.REPLACE_EXISTING)
    Files.setLastModifiedTime(target, java.nio.file.attribute.FileTime.fromMillis(
      Files.getLastModifiedTime(staged.resolve("a_events.parquet")).toMillis + 60000))
    val stream = Streams.normalizeTs(spark.readStream
      .schema(Streams.eventsRawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged.toString))
    val streamed = Streams.runToMemory(spark,
      Streams.sessionizeWithState(spark, stream).toDF(), "t_sess_state")
    val batch = graft.operators.Aggregates.queries("w12_sessionize")(spark, d)
    assert(normalize(streamed) === normalize(batch))
    // the cross-batch property specifically: at least one emitted session
    // must have been closed by the sentinel batch (i.e. emitted in batch 2)
    assert(streamed.count() === batch.count())
  }

  test("streaming EWMA: two time-split micro-batches reproduce the w21 " +
    "window result — trailing frames spanning the batch boundary come out " +
    "of carried state") {
    import java.nio.file.Files
    import org.apache.spark.sql.types.TimestampNTZType
    val ev = Tables.events(spark, d)
    val medMs = ev.agg(expr("CAST(percentile(unix_millis(ts), 0.5) AS BIGINT)"))
      .head().getLong(0)
    val staged = Files.createTempDirectory("graft_ewma_stream")
    def stage(name: String, df: org.apache.spark.sql.DataFrame, mtime: Long): Unit = {
      val tmp = Files.createTempDirectory(s"graft_ewma_$name")
      df.select(col("event_id"), col("ts").cast(TimestampNTZType).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val target = staged.resolve(s"$name.parquet")
      Files.copy(f.toPath, target)
      Files.setLastModifiedTime(target,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val base = System.currentTimeMillis()
    stage("a_first", ev.filter(expr(s"unix_millis(ts) <= $medMs")), base)
    stage("b_second", ev.filter(expr(s"unix_millis(ts) > $medMs")), base + 60000)
    val stream = Streams.normalizeTs(spark.readStream
      .schema(Streams.eventsRawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged.toString))
    val streamed = Streams.runToMemory(spark,
      Streams.ewmaWithState(spark, stream).toDF(), "t_ewma_state")
    val batch = graft.operators.Aggregates.queries("w21_ewma")(spark, d)
    assert(normalize(streamed) === normalize(batch))
    // the boundary property specifically: some user's frame spans the split
    val crossing = batch.filter(col("seq") > 1).count()
    assert(crossing > 0, "the split must leave multi-event users on both sides")
  }

  test("streaming CDC apply: converged per-key state equals the batch twin " +
    "across a time-split batch boundary, tombstones suppressed on read") {
    import java.nio.file.Files
    import org.apache.spark.sql.types.TimestampNTZType
    val ev = Tables.events(spark, d)
    val medMs = ev.agg(expr("CAST(percentile(unix_millis(ts), 0.5) AS BIGINT)"))
      .head().getLong(0)
    val staged = Files.createTempDirectory("graft_cdc_stream")
    def stage(name: String, df: org.apache.spark.sql.DataFrame, mtime: Long): Unit = {
      val tmp = Files.createTempDirectory(s"graft_cdc_$name")
      df.select(col("event_id"), col("ts").cast(TimestampNTZType).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val target = staged.resolve(s"$name.parquet")
      Files.copy(f.toPath, target)
      Files.setLastModifiedTime(target,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val base = System.currentTimeMillis()
    stage("a_first", ev.filter(expr(s"unix_millis(ts) <= $medMs")), base)
    stage("b_second", ev.filter(expr(s"unix_millis(ts) > $medMs")), base + 60000)
    val stream = Streams.normalizeTs(spark.readStream
      .schema(Streams.eventsRawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged.toString))
    val streamed = Streams.runToMemory(spark,
      Streams.streamingCdcApply(stream), "t_cdc_state", mode = "update")
    // update mode: per key, the row with max n_ops is the converged state
    val converged = streamed.collect()
      .groupBy(_.getLong(0))
      .map { case (_, rows) => rows.maxBy(_.getLong(2)) }
      .filter(_.getStruct(1).getString(2) == "U")
      .map(r => (r.getLong(0), r.getStruct(1).getDouble(3),
        r.getStruct(1).getLong(0), r.getLong(2)))
      .toSet
    val batch = Streams.queries("st18_stream_cdc")(spark, d).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(converged === batch)
    assert(converged.nonEmpty)
  }

  test("streaming CUSUM: two time-split micro-batches reproduce the w22 " +
    "closed-form result — the accumulator pair survives the boundary") {
    import java.nio.file.Files
    import org.apache.spark.sql.types.TimestampNTZType
    val ev = Tables.events(spark, d)
    val medMs = ev.agg(expr("CAST(percentile(unix_millis(ts), 0.5) AS BIGINT)"))
      .head().getLong(0)
    val staged = Files.createTempDirectory("graft_cusum_stream")
    def stage(name: String, df: org.apache.spark.sql.DataFrame, mtime: Long): Unit = {
      val tmp = Files.createTempDirectory(s"graft_cusum_$name")
      df.select(col("event_id"), col("ts").cast(TimestampNTZType).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val target = staged.resolve(s"$name.parquet")
      Files.copy(f.toPath, target)
      Files.setLastModifiedTime(target,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val base = System.currentTimeMillis()
    stage("a_first", ev.filter(expr(s"unix_millis(ts) <= $medMs")), base)
    stage("b_second", ev.filter(expr(s"unix_millis(ts) > $medMs")), base + 60000)
    val stream = Streams.normalizeTs(spark.readStream
      .schema(Streams.eventsRawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged.toString))
    val streamed = Streams.runToMemory(spark,
      Streams.cusumWithState(spark, stream).toDF(), "t_cusum_state")
    val batch = graft.operators.Aggregates.queries("w22_cusum")(spark, d)
    assert(normalize(streamed) === normalize(batch))
    assert(streamed.count() === batch.count())
  }

  test("streaming z-score: two time-split micro-batches reproduce the " +
    "trailing-frame window result — frames spanning the boundary come " +
    "out of the carried ring") {
    import java.nio.file.Files
    import org.apache.spark.sql.types.TimestampNTZType
    val ev = Tables.events(spark, d)
    val medMs = ev.agg(expr("CAST(percentile(unix_millis(ts), 0.5) AS BIGINT)"))
      .head().getLong(0)
    val staged = Files.createTempDirectory("graft_zscore_stream")
    def stage(name: String, df: org.apache.spark.sql.DataFrame, mtime: Long): Unit = {
      val tmp = Files.createTempDirectory(s"graft_zscore_$name")
      df.select(col("event_id"), col("ts").cast(TimestampNTZType).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val target = staged.resolve(s"$name.parquet")
      Files.copy(f.toPath, target)
      Files.setLastModifiedTime(target,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val base = System.currentTimeMillis()
    stage("a_first", ev.filter(expr(s"unix_millis(ts) <= $medMs")), base)
    stage("b_second", ev.filter(expr(s"unix_millis(ts) > $medMs")), base + 60000)
    val stream = Streams.normalizeTs(spark.readStream
      .schema(Streams.eventsRawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged.toString))
    val streamed = Streams.runToMemory(spark,
      Streams.zscoreWithState(spark, stream).toDF(), "t_zscore_state")
    val batch = Streams.queries("st21_stream_zscore")(spark, d)
    assert(normalize(streamed) === normalize(batch))
    assert(streamed.count() === batch.count())
  }

  test("streaming coverage: three staged micro-batches reproduce the " +
    "single-fold gaps-and-islands result — open islands survive the " +
    "boundary") {
    import java.nio.file.Files
    import org.apache.spark.sql.types.TimestampNTZType
    val ev = Tables.events(spark, d)
    val medMs = ev.agg(expr("CAST(percentile(unix_millis(ts), 0.5) AS BIGINT)"))
      .head().getLong(0)
    val staged = Files.createTempDirectory("graft_cov_stream")
    def stage(name: String, df: org.apache.spark.sql.DataFrame, mtime: Long): Unit = {
      val tmp = Files.createTempDirectory(s"graft_cov_$name")
      df.select(col("event_id"), col("ts").cast(TimestampNTZType).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val target = staged.resolve(s"$name.parquet")
      Files.copy(f.toPath, target)
      Files.setLastModifiedTime(target,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val base = System.currentTimeMillis()
    stage("a_first", ev.filter(expr(s"unix_millis(ts) <= $medMs")), base)
    stage("b_second", ev.filter(expr(s"unix_millis(ts) > $medMs")), base + 60000)
    stage("c_sentinels", Streams.sessionSentinels(ev), base + 120000)
    val stream = Streams.normalizeTs(spark.readStream
      .schema(Streams.eventsRawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged.toString))
    val streamed = Streams.runToMemory(spark,
      Streams.coverageWithState(spark, stream).toDF(), "t_cov_state")
    val batch = Streams.queries("st22_stream_coverage")(spark, d)
    assert(normalize(streamed) === normalize(batch))
    assert(streamed.count() === batch.count())
  }

  test("streaming point-in-time features: two time-split micro-batches " +
    "reproduce the j20 training table — the trailing click deque " +
    "survives the boundary and never leaks same-millisecond clicks") {
    import java.nio.file.Files
    import org.apache.spark.sql.types.TimestampNTZType
    val ev = Tables.events(spark, d)
    val medMs = ev.agg(expr("CAST(percentile(unix_millis(ts), 0.5) AS BIGINT)"))
      .head().getLong(0)
    val staged = Files.createTempDirectory("graft_pit_stream")
    def stage(name: String, df: org.apache.spark.sql.DataFrame, mtime: Long): Unit = {
      val tmp = Files.createTempDirectory(s"graft_pit_$name")
      df.select(col("event_id"), col("ts").cast(TimestampNTZType).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val target = staged.resolve(s"$name.parquet")
      Files.copy(f.toPath, target)
      Files.setLastModifiedTime(target,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val base = System.currentTimeMillis()
    stage("a_first", ev.filter(expr(s"unix_millis(ts) <= $medMs")), base)
    stage("b_second", ev.filter(expr(s"unix_millis(ts) > $medMs")), base + 60000)
    val stream = Streams.normalizeTs(spark.readStream
      .schema(Streams.eventsRawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged.toString))
    val streamed = Streams.runToMemory(spark,
      Streams.pitWithState(spark, stream).toDF(), "t_pit_state")
    val batch = Streams.queries("st23_stream_pit")(spark, d)
    assert(normalize(streamed) === normalize(batch))
    // and the window-form equivalence is already oracle-pinned (j20Sql);
    // here assert the twins agree with the batch j20 operator directly
    val j20 = graft.operators.Relational.queries("j20_pit_features")(spark, d)
    assert(normalize(batch) === normalize(j20))
  }

  test("streaming funnel: three staged micro-batches (first half, second " +
    "half, flush sentinels) reproduce the single-fold per-user funnels — " +
    "partial funnels survive the boundary") {
    import java.nio.file.Files
    import org.apache.spark.sql.types.TimestampNTZType
    val ev = Tables.events(spark, d)
    val batch = Streams.funnelWithState(spark,
      ev.select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
          col("value"), col("props"))
        .unionByName(Streams.sessionSentinels(ev))).toDF()
    // split exactly at some advancing user's t1, so that user's funnel
    // provably STARTS in batch 1 and ADVANCES in batch 2
    val medMs = batch.filter(col("t2") > col("t1"))
      .agg(min(col("t1"))).head().getLong(0)
    val staged = Files.createTempDirectory("graft_funnel_stream")
    def stage(name: String, df: org.apache.spark.sql.DataFrame, mtime: Long): Unit = {
      val tmp = Files.createTempDirectory(s"graft_funnel_$name")
      df.select(col("event_id"), col("ts").cast(TimestampNTZType).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val target = staged.resolve(s"$name.parquet")
      Files.copy(f.toPath, target)
      Files.setLastModifiedTime(target,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val base = System.currentTimeMillis()
    stage("a_first", ev.filter(expr(s"unix_millis(ts) <= $medMs")), base)
    stage("b_second", ev.filter(expr(s"unix_millis(ts) > $medMs")), base + 60000)
    stage("c_sentinels", Streams.sessionSentinels(ev), base + 120000)
    val stream = Streams.normalizeTs(spark.readStream
      .schema(Streams.eventsRawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged.toString))
    val streamed = Streams.runToMemory(spark,
      Streams.funnelWithState(spark, stream).toDF(), "t_funnel_state")
    assert(normalize(streamed) === normalize(batch))
    // the boundary property specifically: some funnel must START in batch 1
    // and ADVANCE in batch 2 — i.e. its t1 precedes the split and its
    // t2/t3 follows it, proving the partial state crossed a micro-batch
    val crossing = batch.filter(col("t1") <= medMs &&
      (col("t2") > medMs || col("t3") > medMs)).count()
    assert(crossing > 0, "no funnel spans the split — the test is vacuous")
  }

  test("online semantic dedup: 4 id-range micro-batches fold against the " +
    "kept-representative state and reproduce the batch greedy fold exactly") {
    import java.nio.file.{Files, attribute}
    val staged = Files.createTempDirectory("graft_emb_stream")
    val e = Tables.embeddings(spark, d).orderBy(col("vec_id")).collect()
    val n = e.length
    // 4 contiguous id ranges written as separate files with increasing
    // mtimes — the file source then replays them as id-ordered batches
    (0 until 4).foreach { i =>
      val slice = e.slice(i * n / 4, (i + 1) * n / 4)
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(slice.toSeq, 1),
        Tables.embeddings(spark, d).schema)
      val dir = Files.createTempDirectory(s"graft_emb_part$i")
      df.coalesce(1).write.mode("overwrite").parquet(dir.toString)
      val src = new java.io.File(dir.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = staged.resolve(f"part_$i%02d.parquet")
      Files.copy(src.toPath, dst)
      Files.setLastModifiedTime(dst,
        attribute.FileTime.fromMillis(System.currentTimeMillis() + i * 60000))
    }
    val stream = spark.readStream
      .schema(Tables.embeddings(spark, d).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged.toString)
    val streamed = Streams.runToMemory(spark,
      Streams.onlineSemdedupStream(spark, stream, d).toDF(), "t_semdedup")
    val batch = Streams.st15OnlineSemdedup(spark, d)
    assert(normalize(streamed) === normalize(batch))
  }

  test("foreachBatch upsert: append + last-write-wins dedup-on-read converges " +
    "to the batch upsert result") {
    val outDir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val stream = Streams.eventsStream(spark, d)
    val q = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("append").parquet(s"$outDir/fact")
      }
      .option("checkpointLocation", s"$outDir/ckpt")
      .start()
    q.processAllAvailable(); q.stop()

    val factOnRead = graft.sources.RetailIngest.lastWriteWins(
      spark.read.parquet(s"$outDir/fact")
        .withColumn("ord", col("ts").cast("long") * 10000000L + col("event_id")),
      key = "user_id", order = "ord")
    val batchExpected = graft.sources.RetailIngest.lastWriteWins(
      Tables.events(spark, d)
        .withColumn("ord", col("ts").cast("long") * 10000000L + col("event_id")),
      key = "user_id", order = "ord")
    assert(normalize(factOnRead.select(col("user_id"), col("event_id"))) ===
      normalize(batchExpected.select(col("user_id"), col("event_id"))))
  }

  test("st24: the V2 JSONL micro-batch stream consumes an append-only wave " +
    "drop incrementally and its final aggregate equals the batch twin") {
    import java.nio.file.{Files, Paths}
    val wavesRoot = Streams.st24Waves(spark, d)
    val waves = new java.io.File(wavesRoot).listFiles()
      .filter(_.getName.endsWith(".jsonl")).sortBy(_.getName)
    assert(waves.length === 3)
    val drop = Files.createTempDirectory("graft_st24_drop").toString
    // wave 0 is present before the query starts
    Files.copy(waves(0).toPath, Paths.get(drop, waves(0).getName))
    val q = Streams.langProfile(Streams.jsonlDocStream(spark, drop))
      .writeStream.format("memory").queryName("st24_mem")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val after0 = spark.table("st24_mem")
        .agg(sum(col("n_docs"))).collect().head.getLong(0)
      // waves 1 and 2 arrive WHILE the query runs — each must be picked up
      // as its own micro-batch through the file-count offsets
      Files.copy(waves(1).toPath, Paths.get(drop, waves(1).getName))
      q.processAllAvailable()
      val after1 = spark.table("st24_mem")
        .agg(sum(col("n_docs"))).collect().head.getLong(0)
      assert(after1 > after0, "second wave not consumed incrementally")
      Files.copy(waves(2).toPath, Paths.get(drop, waves(2).getName))
      q.processAllAvailable()
      val got = spark.table("st24_mem").orderBy(col("lang"))
        .collect().map(_.toSeq).toSeq
      val want = Streams.st24JsonlStream(spark, d).collect().map(_.toSeq).toSeq
      assert(got === want, "streamed language profile diverged from the batch face")
    } finally q.stop()
  }

  test("st24 offset watermark: a late file that sorts BELOW the consumed " +
    "prefix fails the stream LOUDLY instead of silently mis-slicing") {
    import java.nio.file.{Files, Paths}
    val wavesRoot = Streams.st24Waves(spark, d)
    val waves = new java.io.File(wavesRoot).listFiles()
      .filter(_.getName.endsWith(".jsonl")).sortBy(_.getName)
    val drop = Files.createTempDirectory("graft_st24_wm").toString
    Files.copy(waves(0).toPath, Paths.get(drop, "wave-b.jsonl"))
    val q = Streams.langProfile(Streams.jsonlDocStream(spark, drop))
      .writeStream.format("memory").queryName("st24_wm_mem")
      .outputMode("complete").start()
    try {
      q.processAllAvailable() // consumes wave-b at position 0
      // a producer violates the append-only contract: the new name sorts
      // BEFORE the consumed boundary — a bare count offset would silently
      // re-read wave-b as if it were the new file
      Files.copy(waves(1).toPath, Paths.get(drop, "wave-a.jsonl"))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(10000)
      }
      def causes(t: Throwable): Seq[String] =
        if (t == null) Nil else t.getMessage +: causes(t.getCause)
      assert(causes(ex).exists(m => m != null && m.contains("does not sort after")),
        s"expected the monotone-name contract error, got: ${causes(ex)}")
    } finally q.stop()
  }

  test("st25: JSONL stream -> JSONL streaming sink end to end — incremental " +
    "waves publish per-epoch, markers land, and the sink equals the batch " +
    "transform") {
    import java.nio.file.{Files, Paths}
    val wavesRoot = Streams.st24Waves(spark, d)
    val waves = new java.io.File(wavesRoot).listFiles()
      .filter(_.getName.endsWith(".jsonl")).sortBy(_.getName)
    val drop = Files.createTempDirectory("graft_st25_drop").toString
    val out = Files.createTempDirectory("graft_st25_out").toString
    val ckpt = Files.createTempDirectory("graft_st25_ckpt").toString
    Files.copy(waves(0).toPath, Paths.get(drop, waves(0).getName))
    val q = Streams.jsonlDocStream(spark, drop)
      .filter(col("n_chars") >= 100)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .writeStream.format("graft-jsonl")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start(out)
    try {
      q.processAllAvailable()
      def sinkCount() = spark.read.format("graft-jsonl")
        .schema(Streams.st25Schema).load(out).count()
      val after0 = sinkCount()
      Files.copy(waves(1).toPath, Paths.get(drop, waves(1).getName))
      Files.copy(waves(2).toPath, Paths.get(drop, waves(2).getName))
      q.processAllAvailable()
      assert(sinkCount() > after0, "later waves did not publish new epochs")
    } finally q.stop()
    // exactly the batch transform, row for row
    val got = spark.read.format("graft-jsonl").schema(Streams.st25Schema)
      .load(out).collect().map(_.toString).sorted.toSeq
    val want = graft.Tables.documents(spark, d)
      .filter(col("n_chars") >= 100)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .collect().map(_.toString).sorted.toSeq
    assert(got === want, "streaming sink diverged from the batch transform")
    // per-epoch commit markers landed; temps did not survive
    val leftovers = new java.io.File(out).listFiles().map(_.getName)
    assert(leftovers.exists(_.startsWith("_epoch-")), "no epoch markers")
    assert(!leftovers.exists(_.startsWith("_tmp")), "temps survived a commit")
  }

  test("st25: a REPLAYED epoch commit is a no-op — the marker makes the " +
    "sink exactly-once per epoch") {
    import org.apache.spark.sql.connector.write.WriterCommitMessage
    val out = java.nio.file.Files.createTempDirectory("graft_st25_replay").toString
    val w = new graft.sources.JsonlStreamingWrite(out, Streams.st25Schema)
    def tempWithLine(n: String): String = {
      val f = new java.io.File(out, n)
      java.nio.file.Files.write(f.toPath, """{"doc_id":1,"lang":"en","n_chars":9}""".getBytes)
      f.toString
    }
    val first: Array[WriterCommitMessage] =
      Array(graft.sources.JsonlCommitMessage(0,
        Seq(graft.sources.JsonlPiece(tempWithLine("_tmp-a"), 1L))))
    w.commit(7L, first)
    val replay: Array[WriterCommitMessage] =
      Array(graft.sources.JsonlCommitMessage(0,
        Seq(graft.sources.JsonlPiece(tempWithLine("_tmp-b"), 1L))))
    w.commit(7L, replay) // same epoch again: must publish NOTHING new
    val rows = spark.read.format("graft-jsonl").schema(Streams.st25Schema)
      .load(out).count()
    assert(rows === 1L, s"replayed epoch 7 double-published ($rows rows)")
    val files = new java.io.File(out).listFiles().map(_.getName)
    assert(files.count(f => !f.startsWith("_") && !f.startsWith(".")) === 1)
    assert(!files.exists(_.startsWith("_tmp")), "replayed temps not dropped")
  }

  test("st25: epoch-marker retention — vacuum's fold collapses old markers " +
    "into ONE high-water record (O(recent), not O(epochs), listing cost) " +
    "and a replay of a FOLDED epoch is still exactly-once") {
    import org.apache.spark.sql.connector.write.WriterCommitMessage
    val out = java.nio.file.Files.createTempDirectory("graft_st25_fold").toString
    val root = new org.apache.hadoop.fs.Path(out)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      root.toUri, new org.apache.hadoop.conf.Configuration())
    val w = new graft.sources.JsonlStreamingWrite(out, Streams.st25Schema)
    def msg(tmp: String, id: Long): Array[WriterCommitMessage] = {
      val f = new java.io.File(out, tmp)
      java.nio.file.Files.write(f.toPath,
        s"""{"doc_id":$id,"lang":"en","n_chars":9}""".getBytes)
      Array(graft.sources.JsonlCommitMessage(0,
        Seq(graft.sources.JsonlPiece(f.toString, 1L))))
    }
    (0L to 20L).foreach(e => w.commit(e, msg(s"_tmp-e$e", e)))
    def names() = new java.io.File(out).listFiles().map(_.getName).toSeq
    assert(names().count(_.startsWith("_epoch-")) === 21)

    // no snapshots recorded: all but the newest KeepMarkers fold
    val folded = graft.sources.JsonlVacuum.foldEpochMarkers(fs, root)
    assert(folded === 21 - graft.sources.JsonlVacuum.KeepMarkers)
    val after = names()
    assert(after.count(n => graft.sources.EpochHighWater.markerId(n).isDefined)
      === graft.sources.JsonlVacuum.KeepMarkers,
      s"fold kept the wrong marker tail: $after")
    assert(after.contains(graft.sources.EpochHighWater.Name),
      "fold did not write the high-water record")
    assert(graft.sources.EpochHighWater.read(fs, root) === 12L,
      "high water must be the largest folded epoch id")

    def rowCount() = spark.read.format("graft-jsonl")
      .schema(Streams.st25Schema).load(out).count()
    val before = rowCount()
    // replay of a FOLDED epoch (its marker file is gone): exactly-once
    // must now come from the high-water record
    w.commit(5L, msg("_tmp-replay5", 5L))
    assert(rowCount() === before, "a folded epoch's replay double-published")
    // replay of a RETAINED epoch: the plain marker still short-circuits
    w.commit(20L, msg("_tmp-replay20", 20L))
    assert(rowCount() === before, "a retained epoch's replay double-published")
    // and genuinely NEW epochs still commit
    w.commit(21L, msg("_tmp-e21", 21L))
    assert(rowCount() === before + 1, "the fold blocked a new epoch's commit")
    assert(!names().exists(_.startsWith("_tmp")), "replay temps survived")
    // a second fold is idempotent-ish: high water only advances
    graft.sources.JsonlVacuum.foldEpochMarkers(fs, root)
    assert(graft.sources.EpochHighWater.read(fs, root) >= 12L)
  }
}
