package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dev probe (r17): per-phase job/time attribution for the
  * q212 pipeline. Not on any bench/verify path.
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/testdata-sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      })
    def ph[T](name: String)(f: => T): T = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $name%-28s jobs=${jobs.get() - j0}%3d  " +
        f"time=${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    // warmup
    graft.pipelines.CurationPipeline.run(Tables.documents(spark, d))
      .yieldTable.write.format("noop").mode("overwrite").save()
    println("== timed breakdown ==")
    val t0 = System.nanoTime(); val jAll = jobs.get()
    val docs = Tables.documents(spark, d)
    val corpus = ph("corpus cp")(
      Tables.fanOut(docs).localCheckpoint(true))
    val isBench = col("doc_id") % 100 === 0
    val bench = corpus.filter(isBench)
    val corp = corpus.filter(!isBench)
    val q = graft.pipelines.CurationPipeline.qualityScores(corp)
    val bp = ph("bandKeys cp")(
      QueriesText.bandKeys(corp).localCheckpoint(true))
    val pairs = QueriesText.bandPairsFrom(bp)
    val lab = ph("labelMinProp")(
      graft.ops.ConnectedComponents.labelMinProp(pairs))
    val labeled = corp.select(col("doc_id"), col("n_chars"))
      .join(lab, col("doc_id") === lab("v"), "left")
      .withColumn("cluster", coalesce(col("component"), col("doc_id")))
      .groupBy("cluster")
      .agg(max(struct(col("n_chars").as("n_chars"),
        (-col("doc_id")).as("nd"))).as("w"))
      .select((-col("w.nd")).as("doc_id"))
    val con = graft.pipelines.CurationPipeline.contaminatedDocs(corp, bench)
    val flags = ph("flags cp (qual+reps+con)")(
      corp.select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
        .join(q.select(col("doc_id"), col("n_tokens"),
          col("keep").as("k_quality")), Seq("doc_id"), "left")
        .join(labeled.withColumn("k_dedup", lit(true)), Seq("doc_id"), "left")
        .join(con.withColumn("contaminated", lit(true)), Seq("doc_id"), "left")
        .localCheckpoint(true))
    ph("funnel agg (noop)")(
      flags.groupBy("lang").agg(count(lit(1)))
        .write.format("noop").mode("overwrite").save())
    println(f"TOTAL jobs=${jobs.get() - jAll} " +
      f"time=${(System.nanoTime() - t0) / 1e9}%6.2f s")
    spark.stop()
  }
}
