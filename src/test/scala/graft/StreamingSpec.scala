package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.ops.StreamingIngest

/** Streaming ingest semantics (SURVEY.md §2.10, §5 #5): AvailableNow over a
  * dir of CSV shards, checkpointed exactly-once across restarts, windowed
  * aggregation parity with the batch form.
  */
class StreamingSpec extends SparkSpec {

  private def writeShard(dir: String, name: String, rows: Seq[String]): Unit = {
    val header = "domain,date,term,url,rank,volume,cpc"
    Files.write(Paths.get(dir, name),
      (header +: rows).mkString("\n").getBytes)
  }

  private def mkTmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("T1/T4/T5: AvailableNow ingest is exactly-once across restart") {
    val in = mkTmp("shards")
    val out = mkTmp("ingested")
    val ckpt = mkTmp("ckpt")
    writeShard(in, "shard1.csv", Seq(
      "foo.com,2023-01-01,term1,https://foo.com/a,1,100,0.5",
      "foo.com,2023-01-02,term2,https://foo.com/b,2,200,1.5"))
    writeShard(in, "shard2.csv", Seq(
      "bar.com,2023-01-01,term3,https://bar.com/c,3,300,2.5"))

    val stream1 = StreamingIngest.csvStream(spark, Tables.rankingsV1Schema, in,
      maxFilesPerTrigger = 1)
    val q1 = StreamingIngest.ingestAvailableNow(stream1, out, ckpt)
    assert(q1.awaitTermination(60000),
      "stream did not finish in 60s")
    assert(spark.read.parquet(out).count() == 3)

    // restart with no new files → no duplicates (flag-store analog)
    val q2 = StreamingIngest.ingestAvailableNow(
      StreamingIngest.csvStream(spark, Tables.rankingsV1Schema, in, 1),
      out, ckpt)
    assert(q2.awaitTermination(60000),
      "stream did not finish in 60s")
    assert(spark.read.parquet(out).count() == 3)

    // new shard arrives → only it is ingested (resume-from-offset)
    writeShard(in, "shard3.csv", Seq(
      "baz.com,2023-01-03,term4,https://baz.com/d,4,400,3.5"))
    val q3 = StreamingIngest.ingestAvailableNow(
      StreamingIngest.csvStream(spark, Tables.rankingsV1Schema, in, 1),
      out, ckpt)
    assert(q3.awaitTermination(60000),
      "stream did not finish in 60s")
    val rows = spark.read.parquet(out)
    assert(rows.count() == 4)
    assert(rows.filter(col("domain") === "baz.com").count() == 1)
  }

  test("T1-T5 at reference scale shape: 200 shards, mid-stream kill, " +
    "exactly-once (VERDICT r03 #6)") {
    // the reference ingests 2,137 CSV shards (`ingest.py:15`); this drives
    // the same shape — many small shards, bounded files-per-trigger — and
    // kills the query MID-STREAM, then restarts on the same checkpoint.
    // Exactly-once = the committed output is multiset-equal to the source
    // (no loss, no dupes), with uncommitted orphan files from the kill
    // invisible behind the sink's _spark_metadata transaction log.
    val in = mkTmp("shards200")
    val out = mkTmp("ingested200")
    val ckpt = mkTmp("ckpt200")
    val src = graft.sources.SeededGenerator.rankings(spark, 4000, seed = 7L)
    val rows = src.collect()
    def fmt(r: org.apache.spark.sql.Row): String = Seq(
      r.getString(0), r.getDate(1).toString, r.getString(2), r.getString(3),
      r.getInt(4).toString, r.getLong(5).toString,
      r.getDouble(6).toString).mkString(",")
    rows.grouped(20).zipWithIndex.foreach { case (g, i) =>
      writeShard(in, f"shard$i%03d.csv", g.map(fmt).toSeq)
    }
    def stream() = StreamingIngest.csvStream(
      spark, Tables.rankingsV1Schema, in, maxFilesPerTrigger = 5)
    def committed(): Long =
      try spark.read.parquet(out).count() catch { case _: Throwable => 0L }

    // run 1: 40 micro-batches pending; kill once >= ~5 batches committed
    val q1 = StreamingIngest.ingestAvailableNow(stream(), out, ckpt)
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (q1.isActive && committed() < 500 && System.nanoTime() < deadline)
      Thread.sleep(50)
    q1.stop()
    val mid = committed()
    assert(mid > 0, "kill landed before any batch committed")
    assert(mid < 4000, "stream finished before the kill - raise shard count")

    // run 2: restart from the checkpoint, drain the rest
    val q2 = StreamingIngest.ingestAvailableNow(stream(), out, ckpt)
    assert(q2.awaitTermination(180000),
      "stream did not finish in 180s")
    val got = spark.read.parquet(out)
    assert(got.count() == 4000, s"expected 4000 rows, got ${got.count()}")
    assert(got.exceptAll(src).isEmpty && src.exceptAll(got).isEmpty,
      "committed output is not multiset-equal to the source")
  }

  test("T7: foreachBatch skips empty batches and sees all rows once") {
    val in = mkTmp("shards2")
    val ckpt = mkTmp("ckpt2")
    writeShard(in, "s1.csv", Seq(
      "foo.com,2023-01-01,t,https://foo.com/a,1,100,0.5"))
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val batches = new java.util.concurrent.atomic.AtomicLong(0)
    val q = StreamingIngest.ingestForeachBatch(
      StreamingIngest.csvStream(spark, Tables.rankingsV1Schema, in, 10),
      ckpt) { (batch, _) =>
      batches.incrementAndGet(); seen.addAndGet(batch.count())
    }
    assert(q.awaitTermination(60000),
      "stream did not finish in 60s")
    assert(seen.get() == 1 && batches.get() == 1)
  }

  test("X39 twin: streaming context chunking matches the batch chunk set " +
    "(stateless narrow map — same plan, per-micro-batch)") {
    val in = mkTmp("docstream")
    val docs = Tables.documents(spark, sf)
    docs.repartition(3).write.mode("overwrite").parquet(in)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val q = QueriesCuration.contextChunks(stream)
      .writeStream.format("memory").queryName("chunk_twin")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000),
      "stream did not finish in 120s")
    val streamed = spark.table("chunk_twin")
      .orderBy("doc_id", "chunk_id").collect()
    val batch = QueriesCuration.contextChunks(
      spark.read.parquet(in)).orderBy("doc_id", "chunk_id").collect()
    assert(streamed.length == batch.length && batch.nonEmpty,
      s"row count drift: streamed ${streamed.length} vs batch ${batch.length}")
    assert(streamed.sameElements(batch),
      "streaming chunk rows diverge from the batch form")
  }

  test("X59 twin: complete-mode streaming drift cells equal the batch " +
    "cells — the TVD monitor folds incrementally over micro-batches") {
    val in = mkTmp("driftstream")
    val docs = Tables.documents(spark, sf)
    docs.repartition(3).write.mode("overwrite").parquet(in)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val q = QueriesCuration.lengthCells(stream)
      .writeStream.format("memory").queryName("drift_twin")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not finish in 120s")
    val streamed = QueriesCuration.driftFromCells(
      spark.table("drift_twin").localCheckpoint(true))
      .collect().map(_.toString).sorted
    val batch = Queries.byName("q148_drift_audit").build(spark, sf)
      .collect().map(_.toString).sorted
    assert(streamed.sameElements(batch),
      "streaming-folded drift audit diverges from the batch audit")
  }

  test("T21s twin: complete-mode streaming hourly cents equal the batch " +
    "agg — the gap-fill monitor folds incrementally over micro-batches") {
    val in = mkTmp("interpstream")
    val ev = Tables.events(spark, sf) // ts already normalized to epoch-ns
    ev.repartition(3).write.mode("overwrite").parquet(in)
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val q = QueriesTime.hourlyCents(stream)
      .writeStream.format("memory").queryName("interp_twin")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not finish in 120s")
    val streamed = QueriesTime.fillFromHourly(
      spark.table("interp_twin").localCheckpoint(true))
      .collect().map(_.toString)
    val batch = Queries.byName("q155_interpolate").build(spark, sf)
      .collect().map(_.toString)
    assert(streamed.nonEmpty && streamed.sameElements(batch),
      "streaming-folded gap fill diverges from the batch form")
  }

  test("T22s twin: complete-mode streaming daily counts equal the batch " +
    "agg — the spike monitor folds incrementally over micro-batches") {
    val in = mkTmp("spikestream")
    val ev = Tables.events(spark, sf) // ts already normalized to epoch-ns
    ev.repartition(3).write.mode("overwrite").parquet(in)
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val q = QueriesTime.dailyCounts(stream)
      .writeStream.format("memory").queryName("spike_twin")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not finish in 120s")
    val streamed = QueriesTime.spikeFromDaily(
      spark.table("spike_twin").localCheckpoint(true))
      .collect().map(_.toString)
    val batch = Queries.byName("q162_spike_gate").build(spark, sf)
      .collect().map(_.toString)
    assert(streamed.nonEmpty && streamed.sameElements(batch),
      "streaming-folded spike gate diverges from the batch form")
  }

  test("T31s twin: complete-mode streaming (type, day) counts equal the " +
    "batch agg — the weekday-seasonality gate folds incrementally") {
    val in = mkTmp("seasonstream")
    val ev = Tables.events(spark, sf) // ts already normalized to epoch-ns
    ev.repartition(3).write.mode("overwrite").parquet(in)
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val q = QueriesTime.typeDailyCounts(stream)
      .writeStream.format("memory").queryName("season_twin")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not finish in 120s")
    val streamed = QueriesTime.seasonalityFromDaily(
      spark.table("season_twin").localCheckpoint(true))
      .collect().map(_.toString)
    val batch = Queries.byName("q197_weekday_seasonality").build(spark, sf)
      .collect().map(_.toString)
    assert(streamed.nonEmpty && streamed.sameElements(batch),
      "streaming-folded weekday seasonality diverges from the batch form")
  }

  test("T24s twin: complete-mode streaming daily counts equal the batch " +
    "agg — the decay score folds incrementally over micro-batches") {
    val in = mkTmp("decaystream")
    val ev = Tables.events(spark, sf) // ts already normalized to epoch-ns
    ev.repartition(3).write.mode("overwrite").parquet(in)
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val q = QueriesTime.dailyCounts(stream)
      .writeStream.format("memory").queryName("decay_twin")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not finish in 120s")
    val streamed = QueriesTime.decayFromDaily(
      spark.table("decay_twin").localCheckpoint(true))
      .collect().map(_.toString)
    val batch = Queries.byName("q168_decay_score").build(spark, sf)
      .collect().map(_.toString)
    assert(streamed.nonEmpty && streamed.sameElements(batch),
      "streaming-folded decay score diverges from the batch form")
  }

  test("T33s twin: complete-mode streaming OHLC equals the batch agg — " +
    "min_by/max_by/min/max/sum/count all fold associatively") {
    val in = mkTmp("ohlcstream")
    val ev = Tables.events(spark, sf)
    ev.repartition(3).write.mode("overwrite").parquet(in)
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val q = QueriesTime.typeDayOhlc(stream)
      .writeStream.format("memory").queryName("ohlc_twin")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not finish in 120s")
    val streamed = spark.table("ohlc_twin")
      .orderBy("event_type", "day").collect().map(_.toString)
    val batch = Queries.byName("q204_ohlc_downsample").build(spark, sf)
      .collect().map(_.toString)
    assert(streamed.nonEmpty && streamed.sameElements(batch),
      "streaming-folded OHLC diverges from the batch form")
  }

  test("X93s twin: complete-mode streaming (source, hash) token counts " +
    "equal the batch agg — the drift monitor folds incrementally") {
    val in = mkTmp("driftstream")
    val docs = Tables.documents(spark, sf)
    docs.repartition(3).write.mode("overwrite").parquet(in)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val q = QueriesCuration.sourceTokenCounts(stream)
      .writeStream.format("memory").queryName("drift_twin")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not finish in 120s")
    val streamed = QueriesCuration.chi2FromCounts(
      spark.table("drift_twin").localCheckpoint(true))
      .collect().map(_.toString)
    val batch = Queries.byName("q207_chi2_drift").build(spark, sf)
      .collect().map(_.toString)
    assert(streamed.nonEmpty && streamed.sameElements(batch),
      "streaming-folded chi2 drift diverges from the batch form")
  }

  test("T34s twin: order-aware mapGroupsWithState deltaSum equals the " +
    "batch rollup under the ord-monotone replay contract") {
    import org.apache.spark.sql.expressions.Window
    val in = mkTmp("deltastream")
    val e = QueriesTime.deltaEvents(Tables.events(spark, sf))
      .localCheckpoint(true)
    val n = e.count()
    // three ord-range files with strictly increasing mtimes: the file
    // source replays them oldest-first, so per-user batches arrive
    // ord-monotone — the log-structured replay contract the fold states
    val ranked = e.withColumn("rn",
      row_number().over(Window.orderBy("o"))).localCheckpoint(true)
    var lo = 0L
    Seq(n / 3, 2 * n / 3, n).zipWithIndex.foreach { case (hi, i) =>
      val tmp = mkTmp(s"dspart$i")
      ranked.filter(col("rn") > lo && col("rn") <= hi).drop("rn")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val src = new java.io.File(tmp).listFiles
        .find(_.getName.endsWith(".parquet")).get
      val dst = Paths.get(in, s"f$i.parquet")
      Files.move(src.toPath, dst)
      dst.toFile.setLastModified(1700000000000L + i * 2000L)
      lo = hi
    }
    val stream = spark.readStream.schema(e.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val q = graft.ops.DeltaSumStream.fold(stream)
      .writeStream.format("memory").queryName("delta_twin")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not finish in 120s")
    // update mode appends one row per (user, touching batch); the
    // current total per user is the row with the max (monotone) n_events
    val w = Window.partitionBy("user_id").orderBy(col("n_events").desc)
    val streamed = spark.table("delta_twin")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .drop("rn").orderBy("user_id").collect().map(_.toString)
    val batch = Queries.byName("q205_delta_sum").build(spark, sf)
      .collect().map(_.toString)
    assert(streamed.nonEmpty && streamed.sameElements(batch),
      "streaming-folded deltaSum diverges from the batch form")
  }

  test("T34s late segment: a cross-batch row at or below the last applied " +
    "ord is discarded (deltaSumTimestamp semantics), not folded out of " +
    "order") {
    import spark.implicits._
    val in = mkTmp("deltalate")
    // batch 0 applies ords a1,a3; batch 1 carries a LATE a2 (must be
    // discarded — folding it would add 850 to posSum) and a fresh a5
    val batches = Seq(
      Seq((1L, "a1", 100L), (1L, "a3", 150L)),
      Seq((1L, "a2", 1000L), (1L, "a5", 120L)))
    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = mkTmp(s"dlpart$i")
      rows.toDF("user_id", "o", "c").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val src = new java.io.File(tmp).listFiles
        .find(_.getName.endsWith(".parquet")).get
      val dst = Paths.get(in, s"f$i.parquet")
      Files.move(src.toPath, dst)
      dst.toFile.setLastModified(1700000000000L + i * 2000L)
    }
    val schema = Seq((1L, "x", 1L)).toDF("user_id", "o", "c").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val q = graft.ops.DeltaSumStream.fold(stream)
      .writeStream.format("memory").queryName("delta_late")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000), "stream did not finish in 60s")
    val fin = spark.table("delta_late")
      .orderBy(col("n_events").desc).limit(1)
      .as[graft.ops.DeltaSumRow].collect().head
    // in-order fold of a1(100), a3(150), a5(120): +50 then one reset
    assert(fin == graft.ops.DeltaSumRow(1L, 3L, 50L, 1L, 120L),
      s"late segment corrupted the fold: $fin")
  }

  test("A24s twin: complete-mode streaming welch partials equal the " +
    "batch drift gate — the A/B monitor folds live over micro-batches") {
    val in = mkTmp("welchstream")
    val ev = Tables.events(spark, sf)
    ev.repartition(3).write.mode("overwrite").parquet(in)
    // the A/B boundary is deployment config — known before the stream
    // starts (q222's declared batch form derives it from min(day); a
    // live monitor pins the same calendar cut up front)
    val cut = ev.agg(org.apache.spark.sql.functions.min(
      graft.ops.Scalars.longDiv("ts", 86400000000000L)))
      .head().getLong(0) + 7
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val rows = stream.select(col("event_type"),
        graft.ops.Scalars.longDiv("ts", 86400000000000L).as("day"),
        graft.ops.Scalars.cents(col("value")).as("x"))
      .withColumn("grp",
        when(col("day") < lit(cut), lit(0)).otherwise(lit(1)))
    val q = graft.ops.Welch.partials(rows, Seq("event_type"), "grp", "x")
      .writeStream.format("memory").queryName("welch_twin")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not finish in 120s")
    val streamed = graft.ops.Welch.tTestFromPartials(
      spark.table("welch_twin").localCheckpoint(true), Seq("event_type"))
      .orderBy("event_type").collect().map(_.toString)
    val batch = Queries.byName("q222_welch_ttest").build(spark, sf)
      .collect().map(_.toString)
    assert(streamed.nonEmpty && streamed.sameElements(batch),
      "streaming-folded welch gate diverges from the batch form")
  }

  test("X97s twin: foreachBatch folds micro-batches into the maintained " +
    "aggregate state; the final table equals the from-scratch aggregation") {
    import graft.pipelines.AggPipeline
    val in = mkTmp("aggmvstream")
    val e = Tables.events(spark, sf)
    e.repartition(3).write.mode("overwrite").parquet(in)
    var st = AggPipeline.emptyState(spark)
    val q = spark.readStream.schema(e.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
      .writeStream
      .option("checkpointLocation", mkTmp("aggmvckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        st = AggPipeline.addBatch(st, df); ()
      }
      .start()
    assert(q.awaitTermination(120000), "stream did not finish in 120s")
    def canon(df: org.apache.spark.sql.DataFrame) = {
      val cols = df.columns.sorted.toIndexedSeq
      df.select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
    }
    val scratch = AggPipeline.merge(AggPipeline.dayPartials(e))
    assert(canon(st).nonEmpty && canon(st) == canon(scratch),
      "streamed agg state diverges from the from-scratch aggregation")
  }

  test("T8: streaming tumbling-window agg matches the batch date_trunc form") {
    import spark.implicits._
    val in = mkTmp("events_json")
    // three events across two hours, as JSON lines with epoch-second ts
    Files.write(Paths.get(in, "e.json"), Seq(
      """{"ts": 3600, "v": 1.0}""",
      """{"ts": 3700, "v": 2.0}""",
      """{"ts": 7300, "v": 4.0}""").mkString("\n").getBytes)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.DoubleType)))
    val stream = spark.readStream.schema(schema).json(in)
      .withColumn("t", to_timestamp(col("ts")))
      .withWatermark("t", "1 hour")
      .groupBy(window(col("t"), "1 hour")).agg(sum("v").as("sv"))
      .select(col("window.start").cast("long").as("h"), col("sv"))
    val ckpt = mkTmp("ckpt3")
    val q = stream.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("win_agg")
      .outputMode("complete")
      .start()
    assert(q.awaitTermination(60000),
      "stream did not finish in 60s")
    val got = spark.table("win_agg").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got == Map(3600L -> 3.0, 7200L -> 4.0))
  }

  test("T8c: streaming hopping window matches q100's batch offset-explode " +
    "twin on the same rows") {
    import spark.implicits._
    val in = mkTmp("events_hop")
    Files.write(Paths.get(in, "e.json"), Seq(
      """{"ts": 3600, "v": 1.0}""",
      """{"ts": 3700, "v": 2.0}""",
      """{"ts": 7300, "v": 4.0}""").mkString("\n").getBytes)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.DoubleType)))
    // streaming: the native sliding window — each event lands in
    // window/slide = 4 overlapping windows
    val stream = spark.readStream.schema(schema).json(in)
      .withColumn("t", to_timestamp(col("ts")))
      .withWatermark("t", "1 hour")
      .groupBy(window(col("t"), "1 hour", "15 minutes"))
      .agg(sum("v").as("sv"))
      .select(col("window.start").cast("long").as("w"), col("sv"))
    val q = stream.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", mkTmp("ckpt_hop"))
      .format("memory").queryName("hop_agg")
      .outputMode("complete")
      .start()
    assert(q.awaitTermination(60000),
      "stream did not finish in 60s")
    val streamed = spark.table("hop_agg").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    // batch: q100's offset-explode arithmetic (here in seconds) — the
    // claim under test is that the declared batch form IS the streaming
    // window(1h, 15m) semantics
    val batchMap = spark.read.schema(schema).json(in)
      .select(col("ts"), col("v"), explode(sequence(lit(0L), lit(3L))).as("j"))
      .select(((expr("ts DIV 900L") - col("j")) * 900L).as("w"), col("v"))
      .groupBy("w").agg(sum("v").as("sv"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(streamed == batchMap,
      s"streaming $streamed != batch offset-explode $batchMap")
    assert(streamed(3600L) == 3.0 && streamed(7200L) == 4.0)
  }

  test("T8d: dropDuplicatesWithinWatermark dedups across micro-batches") {
    val in = mkTmp("events_dup")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.LongType)))
    // duplicates deliberately split ACROSS shards: maxFilesPerTrigger=1
    // forces separate micro-batches, so the dedup must come from state,
    // not per-batch distinct
    Files.write(Paths.get(in, "a.json"), Seq(
      """{"id": 1, "ts": 1000}""",
      """{"id": 2, "ts": 1010}""").mkString("\n").getBytes)
    Files.write(Paths.get(in, "b.json"), Seq(
      """{"id": 1, "ts": 1020}""",
      """{"id": 3, "ts": 1030}""").mkString("\n").getBytes)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in)
      .withColumn("t", to_timestamp(col("ts")))
      .withWatermark("t", "1 hour")
      .dropDuplicatesWithinWatermark("id")
    val q = stream.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", mkTmp("ckpt_dup"))
      .format("memory").queryName("dedup_stream")
      .outputMode("append")
      .start()
    assert(q.awaitTermination(60000),
      "stream did not finish in 60s")
    val ids = spark.table("dedup_stream").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L),
      s"cross-batch duplicate survived or rows lost: $ids")
  }

  test("T8b: the checkpointed watermark drops late data across restarts") {
    val in = mkTmp("events_late")
    val ckpt = mkTmp("ckpt4")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.DoubleType)))
    val out = mkTmp("late_out")
    // memory sink cannot recover a checkpoint; the file sink is also the
    // production shape (sealed windows append to partitioned storage)
    def run(): Map[Long, Double] = {
      val stream = spark.readStream.schema(schema).json(in)
        .withColumn("t", to_timestamp(col("ts")))
        .withWatermark("t", "10 seconds")
        .groupBy(window(col("t"), "100 seconds")).agg(sum("v").as("sv"))
        .select(col("window.start").cast("long").as("w"), col("sv"))
      val q = stream.writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .format("parquet")
        .outputMode("append")
        .start()
      assert(q.awaitTermination(60000),
        "stream did not finish in 60s")
      spark.read.parquet(out).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toMap
    }
    // run 1 advances the watermark to 2000s - 10s = 1990 and seals the
    // [1000,1100) window; [2000,2100) stays open in state.
    Files.write(Paths.get(in, "a.json"), Seq(
      """{"ts": 1000, "v": 1.0}""",
      """{"ts": 2000, "v": 2.0}""").mkString("\n").getBytes)
    assert(run() == Map(1000L -> 1.0))
    // run 2 restarts from the checkpoint: its watermark (1990) must drop
    // the ts=500 straggler; ts=3000 reopens state and seals [2000,2100).
    Files.write(Paths.get(in, "b.json"), Seq(
      """{"ts": 500, "v": 100.0}""",
      """{"ts": 3000, "v": 4.0}""").mkString("\n").getBytes)
    val got2 = run()
    assert(got2 == Map(1000L -> 1.0, 2000L -> 2.0),
      s"late data leaked past the restored watermark: $got2")
  }
}
