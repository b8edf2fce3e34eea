package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every declared query at the given scale
  * factor and prints one JSON line. Failures are recorded as -1 (never
  * silently timed as successes), and the action is a full-result noop
  * write so column pruning cannot fake the cost of the projection.
  *
  * The 1-minute load average is sampled before and after and emitted
  * in the JSON (`load_avg_start`/`load_avg_end`): on a 32-thread
  * local[32] box, concurrent work inflates wall-clock per query 2-6×,
  * so a reader comparing runs needs to know whether the machine was
  * idle. A run's own load contribution shows in `load_avg_end`;
  * `load_avg_start` well above ~1 means the numbers are contended.
  */
object Bench {

  private def loadAvg(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .getSystemLoadAverage

  def main(args: Array[String]): Unit = {
    val loadStart = loadAvg()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up codegen / parquet reader / shuffle machinery so the
    // alphabetically-first query doesn't absorb ~6 s of session
    // bring-up in its timing.
    graft.tables.Fixtures.events(spark, sfDir).limit(100)
      .write.mode("overwrite").format("noop").save()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val nFailed = results.count(_._2 < 0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$nFailed,"sf":"$sfDir","load_avg_start":$loadStart,"load_avg_end":${loadAvg()}}""")
    spark.stop()
  }
}
