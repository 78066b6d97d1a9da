package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed physical plan of declared queries.
  * `sbt "runMain graft.PlanDump q76_date_spine q78_retention"` — with no
  * args, dumps every query. Env `SPARK_GRAFT_SF_DIR` picks the data dir
  * (default sf0.001 — plan shape, not data, is the point).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Queries.all.map(_.name)
    names.foreach { n =>
      println(s"===== $n =====")
      println(Queries.byName(n).build(spark, sfDir)
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
