package graft

import org.apache.spark.sql.SparkSession
import graft.ops.Dedup
import graft.tables.Fixtures

object DedupTiming {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    // session warmup like Bench
    Fixtures.events(spark, dir).limit(100)
      .write.mode("overwrite").format("noop").save()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[timing] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows=$n)")
    }
    val docs = Fixtures.documents(spark, dir)
    time("docs count")(docs.count())
    time("sharedShingleRows")(Dedup.sharedShingleRows(docs).count())
    time("sharedBands")(Dedup.sharedBands(docs).count())
    time("minhashPairs (shared)")(Dedup.sharedMinhashPairs(docs).count())
    time("clusterLabels")(Dedup.clusterLabels(docs, Dedup.sharedMinhashPairs(docs)).count())
    time("applyNearDedup full")(Dedup.applyNearDedup(docs, Dedup.sharedMinhashPairs(docs)).count())
    spark.stop()
  }
}
