package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off profiling harness for the streaming near-dup sink: replays
  * the bounded corpus exactly like
  * [[graft.streaming.StreamAnalytics.nearDupStreamCompleted]] but
  * prints each micro-batch's StreamingQueryProgress duration
  * breakdown, so per-batch fixed costs (planning, WAL, state commit,
  * addBatch) are visible individually instead of as one wall number. */
object SinkProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.streaming.StreamAnalytics.StreamDocRow

    val docs = graft.tables.Fixtures.documents(spark, sfDir)
      .select(col("doc_id"), col("text"),
        ((col("doc_id") + 1440L) * 60000000000L).as("ts"))
    val arrivals = docs.select(col("doc_id"), col("text"), col("ts"))
      .as[(Long, String, Long)].collect()
      .map { case (d, t, ts) => StreamDocRow(d, t, ts) }
      .sortBy(r => (r.ts, r.doc_id))
    println(s"[profile] ${arrivals.length} docs")

    val streamSession = spark.newSession()
    streamSession.conf.set("spark.sql.shuffle.partitions", "4")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = streamSession.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamDocRow]
    val hits = graft.streaming.StreamAnalytics.streamingNearDup(
      mem.toDF(), 0.6, horizonNanos = 3600L * 1000000000L, maxPerBucket = 1024)
    val ckpt = java.nio.file.Files.createTempDirectory("profile-ck").toString
    val q = hits.writeStream.format("memory").queryName("profile_sink")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    val chunk = math.max(100, (arrivals.length + 9) / 10)
    try {
      arrivals.grouped(chunk).zipWithIndex.foreach { case (b, i) =>
        val t0 = System.nanoTime()
        mem.addData(b.toSeq: _*)
        q.processAllAvailable()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[profile] chunk $i%2d wall $wall%6.2f s")
      }
      q.recentProgress.foreach { p =>
        println(s"[profile] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs}")
        p.stateOperators.foreach(so =>
          println(s"[profile]   state: rows=${so.numRowsTotal} updated=${so.numRowsUpdated} " +
            s"commitTimeMs=${so.commitTimeMs}"))
      }
    } finally q.stop()
    println(s"[profile] done")
    spark.stop()
  }
}
