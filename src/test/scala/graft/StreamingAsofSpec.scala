package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.ops.{AsofJoin, Scalars, StreamingAsof}
import graft.ops.StreamingAsof.{Buf, In, Match, Probe, Ref}

/** Streaming backward as-of (ops/StreamingAsof): watermark-gated emission
  * equals the batch operator regardless of arrival order — the T13
  * batch/streaming twin (q39/q100/q55 pattern completed).
  */
class StreamingAsofSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000L // µs per second

  test("handle(): out-of-order reference rows cannot be missed — emission " +
    "waits for the watermark") {
    val st = new TestGroupState[Buf]
    // batch 1: a probe at 150s arrives BEFORE the 120s reference row.
    // Watermark 0 → nothing may be emitted yet.
    val out1 = StreamingAsof.handle(7L,
      Iterator(In(7, 1, 150 * S, 10, 0.0, null),
        In(7, 0, 100 * S, 0, 1.0, null)), st).toSeq
    assert(out1.isEmpty && st.get.pending == Seq(Probe(150 * S, 10)))
    // batch 2: the late-but-in-watermark 120s reference lands
    val out2 = StreamingAsof.handle(7L,
      Iterator(In(7, 0, 120 * S, 0, 2.0, null)), st).toSeq
    assert(out2.isEmpty)
    // batch 3: watermark passes the probe → it must see the 120s row
    // (an eager emit at batch 1 would have wrongly carried the 100s row)
    st.watermarkMs = 200 * 1000L
    val out3 = StreamingAsof.handle(7L, Iterator.empty, st).toSeq
    assert(out3 == Seq(Match(7, 10, 150 * S, Some(120 * S), Some(2.0))))
  }

  test("handle(): reference buffer prunes to one shadow row below the " +
    "watermark; pending drains; state clears when empty") {
    val st = new TestGroupState[Buf]
    StreamingAsof.handle(3L,
      Iterator(In(3, 0, 100 * S, 0, 1.0, null),
        In(3, 0, 120 * S, 0, 2.0, null),
        In(3, 0, 300 * S, 0, 3.0, null)), st).toSeq
    st.watermarkMs = 200 * 1000L
    StreamingAsof.handle(3L, Iterator.empty, st).toSeq
    // 100s is shadowed by 120s for every future probe (all > 200s);
    // 300s is above the watermark and must stay
    assert(st.get.refs == Seq(Ref(120 * S, 2.0), Ref(300 * S, 3.0)))
    // a probe before every reference row gets a null match
    st.watermarkMs = 400 * 1000L
    val out = StreamingAsof.handle(3L,
      Iterator(In(3, 1, 50 * S, 77, 0.0, null)), st).toSeq
    assert(out == Seq(Match(3, 77, 50 * S, None, None)))
  }

  test("handle(): timeout armed at the oldest pending probe, clamped " +
    "above the watermark") {
    val st = new TestGroupState[Buf]
    st.watermarkMs = 10 * 1000L
    StreamingAsof.handle(5L,
      Iterator(In(5, 1, 500 * S, 1, 0.0, null),
        In(5, 1, 700 * S, 2, 0.0, null)), st).toSeq
    assert(st.timeoutTs == 500 * 1000L)
    st.watermarkMs = 600 * 1000L
    val out = StreamingAsof.handle(5L, Iterator.empty, st).toSeq
    assert(out.map(_.ev_id) == Seq(1L))
    assert(st.timeoutTs == 700 * 1000L) // re-armed for the remaining probe
  }

  test("multi-batch shuffled arrival equals the batch as-of on the events " +
    "fixture (q95's purchases-vs-views shape)") {
    val ev = Tables.events(spark, sf)
      .withColumn("t", Scalars.longDiv("ts", 1000L))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("t"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id", "t")
      .agg(max_by(col("value"), col("event_id")).as("value"))
    val expected = AsofJoin.backward(
      purchases.withColumnRenamed("t", "ts"),
      views.withColumnRenamed("t", "ts"),
      "user_id", "ts", timeOut = "v_ts",
      payloadCol = "value", payloadOut = "v_value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .sortBy(t => (t._1, t._2)).toSeq

    // one JSON row per input, shuffled WITHIN each time half (any disorder
    // is legal inside a micro-batch; across batches the watermark governs)
    def js(u: Long, side: Int, t: Long, id: Long, v: Double) =
      s"""{"user_id": $u, "side": $side, "t": $t, "ev_id": $id, "value": $v}"""
    val probeRows = purchases.collect()
      .map(r => (r.getLong(2), js(r.getLong(0), 1, r.getLong(2), r.getLong(1), 0.0)))
    val refRows = views.collect()
      .map(r => (r.getLong(1), js(r.getLong(0), 0, r.getLong(1), 0, r.getDouble(2))))
    val all = (probeRows ++ refRows).toSeq
    val ts = all.map(_._1).sorted
    val cut = ts(ts.length / 2)
    val maxT = ts.last
    val rnd = new scala.util.Random(42)
    val batch1 = rnd.shuffle(all.filter(_._1 < cut).map(_._2))
    val batch2 = rnd.shuffle(all.filter(_._1 >= cut).map(_._2))
    // sentinels: far-future reference rows for an unused key — they emit
    // nothing but push the watermark so every real probe flushes
    val sent1 = Seq(js(-1, 0, maxT + 1000 * S, 0, 0.0))
    val sent2 = Seq(js(-1, 0, maxT + 2000 * S, 0, 0.0))

    val dir = Files.createTempDirectory("asofstream").toString
    Seq("b1" -> batch1, "b2" -> batch2, "b3" -> sent1, "b4" -> sent2)
      .zipWithIndex.foreach { case ((name, rows), i) =>
        val p = Paths.get(dir, s"$name.json")
        Files.write(p, rows.mkString("\n").getBytes)
        // force the source's mtime order = intended batch order
        Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(1000000L + i * 60000L))
      }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("side",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("t",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ev_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").json(dir)
      .withColumn("ts", timestamp_micros(col("t")))
      .as[In]
    val q = StreamingAsof.asof(stream, "1 second").writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("asofckpt").toString)
      .format("memory").queryName("asof_stream")
      .outputMode("append")
      .start()
    q.awaitTermination(120000)
    val got = spark.table("asof_stream").as[Match].collect()
      .map(m => (m.user_id, m.ev_id, m.m_t, m.m_value))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got.nonEmpty && got == expected,
      s"streaming asof diverged: got ${got.take(5)} vs ${expected.take(5)}")
  }
}
