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
    // SPARK_GRAFT_PLAN_DIR: also write each query's explain("formatted")
    // to <dir>/<query>_<SPARK_GRAFT_PLAN_TAG>.txt (optimization-round
    // evidence files, e.g. plans/r16/q63_percentiles_before.txt).
    val outDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "plan")
    outDir.foreach(d => java.nio.file.Files
      .createDirectories(java.nio.file.Paths.get(d)))
    names.foreach { n =>
      println(s"===== $n =====")
      val qe = Queries.byName(n).build(spark, sfDir).queryExecution
      println(qe.executedPlan.toString)
      outDir.foreach { d =>
        val formatted = qe.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(d, s"${n}_$tag.txt"),
          formatted.getBytes("UTF-8"))
      }
    }
    spark.stop()
  }
}
