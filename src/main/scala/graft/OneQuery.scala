package graft

import org.apache.spark.sql.SparkSession

/** Single-query profiling harness: run one registry entry against one
  * sf directory, print the wall time and the formatted physical plan.
  * The Bench main times the whole registry; this is the drill-down for
  * one slow entry (`runMain graft.OneQuery <query> <sfDir> [repeats]`).
  */
object OneQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: OneQuery <queryName> <sfDir> [repeats]")
    val (name, sfDir) = (args(0), args(1))
    val repeats = if (args.length > 2) args(2).toInt else 1
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      // experiment dial for scan-split studies; Spark's default when
      // unset. Measured here: extra splits of megabyte fixture files
      // are pure task overhead — the heavy stages all sit downstream
      // of a shuffle (the merge-hinted bucket joins), which already
      // provides their parallelism.
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPEN_COST", (4 * 1024 * 1024).toString))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to repeats).foreach { i =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      df.write.mode("overwrite").format("noop").save()
      println(f"[onequery] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      if (i == repeats) println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
