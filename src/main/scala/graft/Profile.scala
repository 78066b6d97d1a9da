package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Dev profiling tool (guide §1: measure first, empirically): run declared
  * queries under the bench session config and print, per executed-plan
  * operator, the post-run SQL metrics (rows, time, shuffle bytes, spill) so
  * hot operators are attributable without the Spark UI (disabled in the
  * bench). `sbt "runMain graft.Profile q63_percentiles"`; env
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench; SPARK_GRAFT_PROF_RUNS
  * timed runs after one warmup (default 2).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROF_RUNS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("q06_group_measures")

    def dump(p: SparkPlan, indent: Int): Unit = {
      val ms = p.metrics.toSeq
        .filter { case (_, m) => m.value != 0 && m.value != -1 }
        .map { case (k, m) => s"$k=${m.value}" }
        .mkString(" ")
      println("  " * indent + p.nodeName + (if (ms.nonEmpty) s"  [$ms]" else ""))
      p match {
        case a: AdaptiveSparkPlanExec => dump(a.executedPlan, indent + 1)
        case q: QueryStageExec => dump(q.plan, indent + 1)
        case _ => p.children.foreach(dump(_, indent + 1))
        }
      p.subqueries.foreach { sq => println("  " * (indent + 1) + "SUBQUERY:");
        dump(sq, indent + 2) }
    }

    // per-query job/stage accounting: at local bench scale the fixed
    // per-job and per-stage overheads dominate, so the JOB COUNT is the
    // first metric to read (guide §1.1 empirical loop)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          stages.addAndGet(j.stageInfos.size)
          tasks.addAndGet(j.stageInfos.map(_.numTasks).sum)
        }
      })

    // r17 fix: the noop write runs its OWN QueryExecution — reading
    // lastDf.queryExecution.executedPlan dumped the UN-executed initial
    // plan (isFinalPlan=false: no AQEShuffleRead nodes, no metrics). A
    // QueryExecutionListener captures the write's executed plan instead.
    @volatile var lastExecuted: SparkPlan = null
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = { lastExecuted = qe.executedPlan }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    names.foreach { n =>
      val q = Queries.byName(n)
      // warmup (codegen compile); bench-faithful timing = build + write
      q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
      var best = Double.MaxValue
      var bestBuild = Double.MaxValue
      var (nj, ns, nt) = (0, 0, 0)
      (1 to runs).foreach { r =>
        val (j0, s0, t0c) = (jobs.get(), stages.get(), tasks.get())
        val t0 = System.nanoTime()
        val df = q.build(spark, sfDir)
        val tb = (System.nanoTime() - t0) / 1e9
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        if (dt < best) { best = dt; bestBuild = tb }
        if (r == runs) {
          nj = jobs.get() - j0; ns = stages.get() - s0; nt = tasks.get() - t0c
        }
      }
      println(f"===== $n  best=$best%.3f s (build-phase $bestBuild%.3f s, " +
        f"jobs=$nj stages=$ns tasks=$nt) =====")
      // bounded wait: the listener bus is async (ADVICE r16 #2)
      var waited = 0
      while (lastExecuted == null && waited < 5000) {
        Thread.sleep(50); waited += 50
      }
      if (lastExecuted != null) dump(lastExecuted, 0)
      lastExecuted = null
    }
    spark.stop()
  }
}
