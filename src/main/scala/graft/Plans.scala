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
    val wanted = if (args.isEmpty) Seq("logs_range", "logs_cursor",
      "q3_revenue", "topk", "dedup_minhash",
      "dedup_banded") else args.toSeq
    wanted.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    // chain-store height lookup: BucketPruneRule must surface the
    // transposed bucket bound as a PartitionFilter on the scan
    println("\n========== chainstore point lookup (BucketPruneRule) ==========")
    val tmp = java.nio.file.Files.createTempDirectory("plans-store").toString
    val store = new graft.ingest.ChainStore(spark, tmp, bucketSize = 10)
    import spark.implicits._
    graft.ingest.SimChain.canonical(40).grouped(20)
      .foreach(b => graft.ingest.StreamingIngester.processBatch(store, b.toDF()))
    store.read("blocks").get
      .filter(org.apache.spark.sql.functions.col("block_number") === 25)
      .explain("formatted")
    // scratch store — don't leave parquet piles in /tmp on every run
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    spark.stop()
  }
}
