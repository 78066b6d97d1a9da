package graft

import graft.ops.ProcessedLog

/** Batch idempotency (T4 analog): unprocessed-unit selection via anti-join
  * against the processed log, re-run safety, incremental arrival.
  */
class ProcessedLogSpec extends SparkSpec {
  import spark.implicits._

  test("pending → mark → pending cycle is exactly-once over work units") {
    val log = java.nio.file.Files.createTempDirectory("plog").toString + "/log"
    val keys = Seq("locale_page", "chunk")
    val units1 = Seq(("en-us/1", 0), ("en-us/1", 1), ("en-us/2", 0))
      .toDF("locale_page", "chunk")

    // empty log → everything pending
    val p1 = ProcessedLog.pending(units1, log, keys)
    assert(p1.count() == 3)

    // process + mark two of them
    ProcessedLog.mark(p1.filter($"chunk" === 0), log, keys)
    val p2 = ProcessedLog.pending(units1, log, keys)
    assert(p2.collect().map(r => (r.getString(0), r.getInt(1))).toSet ==
      Set(("en-us/1", 1)))

    // re-run with the same inputs → already-marked units stay excluded
    ProcessedLog.mark(p2, log, keys)
    assert(ProcessedLog.pending(units1, log, keys).count() == 0)

    // new unit arrives → only it is pending (resume semantics)
    val units2 = units1.union(Seq(("en-ca/1", 0)).toDF("locale_page", "chunk"))
    val p3 = ProcessedLog.pending(units2, log, keys).collect()
    assert(p3.map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("en-ca/1", 0)))

    // double-marking is harmless
    ProcessedLog.mark(units2, log, keys)
    ProcessedLog.mark(units2, log, keys)
    assert(ProcessedLog.pending(units2, log, keys).count() == 0)
  }
}
