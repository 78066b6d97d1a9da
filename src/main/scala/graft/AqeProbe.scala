package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r17, VERDICT #4): does AQE partition coalescing fire under
  * the bench session config? Prints the post-execution plan for a tiny
  * aggregate under several conf combinations.
  */
object AqeProbe {
  def main(args: Array[String]): Unit = {
    val variants: Seq[(String, Map[String, String])] = Seq(
      ("bench-default", Map.empty),
      ("parallelismFirst=false",
        Map("spark.sql.adaptive.coalescePartitions.parallelismFirst" ->
          "false")),
      ("pf=false+advisory=64m",
        Map("spark.sql.adaptive.coalescePartitions.parallelismFirst" ->
          "false",
          "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m")))
    variants.foreach { case (name, extra) =>
      val b = SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
      val b2 = extra.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
      val spark = b2.getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      // the noop write runs its OWN QueryExecution — capture the executed
      // (final, AQE-re-optimized) plan through a listener, not df.queryExecution
      @volatile var last: String = ""
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit = { last = qe.executedPlan.toString }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })
      val df = spark.range(0, 100000).toDF("id")
        .repartition(32)
        .withColumn("g", pmod(col("id"), lit(1000)))
        .groupBy("g").agg(count(lit(1)).as("c"))
      df.write.format("noop").mode("overwrite").save()
      // listener bus is async; bounded wait for the completion event
      var waited = 0
      while (last.isEmpty && waited < 5000) { Thread.sleep(50); waited += 50 }
      val p = last
      val n = "AQEShuffleRead".r.findAllIn(p).size
      val coal = "coalesced".r.findAllIn(p).size
      println(s"VARIANT $name: AQEShuffleRead=$n coalesced=$coal")
      if (args.contains("-v")) println(p)
      spark.stop()
    }
  }
}
