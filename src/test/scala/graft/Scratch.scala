package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Dev-only micro-profiler (not part of the driver surface): splits each
  * declared query's wall time into executor stage time vs driver overhead
  * (planning + Janino codegen compile).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stageTime = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          stageTime.addAndGet(i.completionTime.getOrElse(0L) -
            i.submissionTime.getOrElse(0L))
        }
      })
    def compileMs: Long =
      org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getSnapshot.getValues.sum / 1000000
    // "cc" mode: quantify the iterative-tier per-round barrier floor —
    // run star-contraction on graphs needing different round counts and
    // report wall-per-round (VERDICT r10 item #4 measurement).
    if (args.headOption.contains("cc")) {
      import spark.implicits._
      def time[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = f
        (a, (System.nanoTime() - t0) / 1e9)
      }
      // warm the machinery once
      graft.ops.ConnectedComponents.labelStar(
        Seq((1L, 2L)).toDF("src", "dst"))._2
      (1 to 3).foreach { rep =>
        // path graph: worst case, O(log n) rounds
        val path = spark.range(0, 20000)
          .select(col("id").as("src"), (col("id") + 1).as("dst"))
        val (r1, t1) = time(
          graft.ops.ConnectedComponents.labelStar(path)._2)
        // pre-stars: converges in minimum rounds
        val star = spark.range(0, 20000)
          .select((col("id") % 100).as("src"),
            (col("id") + 1000000).as("dst"))
        val (r2, t2) = time(
          graft.ops.ConnectedComponents.labelStar(star)._2)
        // guard r1 == r2: the per-round division is meaningless when
        // both graphs converge in the same round count (ADVICE r11)
        val perRound = if (r1 != r2) f"${(t1 - t2) / (r1 - r2)}%.3f s"
          else "n/a (equal round counts — read walls separately)"
        println(f"CCFLOOR#$rep path rounds=$r1 wall=$t1%.2f | " +
          f"star rounds=$r2 wall=$t2%.2f | per-round=" + perRound)
      }
      spark.stop(); return
    }
    // "kcore" mode: per-round edge counts of the q196 peel at
    // SPARK_GRAFT_SF_DIR — shows which round the fixpoint arrives in
    // (the early-exit saving is (8 - that round) barrier rounds).
    if (args.headOption.contains("kcore")) {
      val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
        "/root/testdata/sf0.01")
      val pairs = QueriesText.contractedPairs(spark, dir)
      var e = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
        .unionByName(pairs
          .select(col("b_id").as("src"), col("a_id").as("dst")))
        .localCheckpoint(true)
      var prev = e.count()
      println(s"KCORE round=0 edges=$prev")
      var k = 0
      var done = false
      while (k < 8 && !done) {
        val keep = e.groupBy("src").agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= 2).select(col("src").as("kk"))
        e = e.join(keep, col("src") === col("kk"), "left_semi")
          .join(keep, col("dst") === col("kk"), "left_semi")
          .localCheckpoint(true)
        val n = e.count(); k += 1
        println(s"KCORE round=$k edges=$n fixpoint=${n == prev}")
        done = n == prev; prev = n
      }
      spark.stop(); return
    }
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // optional comma-separated name filter (substring match), repeat count:
    //   runMain graft.Scratch q185,q167 3
    val filter = args.headOption.map(_.split(',').toSeq)
    val reps = if (args.length > 1) args(1).toInt else 1
    val picked = Queries.all.filter(q =>
      filter.forall(_.exists(q.name.contains)))
    val rows = mutable.ArrayBuffer[(String, Double, Double, Long)]()
    (1 to reps).foreach { rep =>
      picked.foreach { q =>
        val st0 = stageTime.get(); val c0 = compileMs
        val t0 = System.nanoTime()
        try q.build(spark, d).count() catch { case _: Throwable => }
        val wall = (System.nanoTime() - t0) / 1e9
        rows += ((s"${q.name}#$rep", wall,
          (stageTime.get() - st0) / 1000.0, compileMs - c0))
      }
    }
    rows.sortBy(-_._2).take(24).foreach { case (n, w, s, c) =>
      println(f"PROFILE $n wall=$w%.2f stage=$s%.2f janinoMs=$c")
    }
    println(f"PROFILE_TOTAL wall=${rows.map(_._2).sum}%.1f " +
      f"stage=${rows.map(_._3).sum}%.1f janino=${compileMs}ms")
    spark.stop()
  }
}
