package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for the load-bearing
  * queries so plan regressions (lost pushdown, surprise shuffles,
  * missed broadcasts) are visible. */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val wanted = if (args.isEmpty) Seq("logs_filter_range", "logs_cursor_page",
      "q3_revenue_by_segment", "similarity_topk", "dedup_minhash") else args.toSeq
    wanted.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
