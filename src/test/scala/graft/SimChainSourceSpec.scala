package graft

import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.api.{GetLogsFilter, LogsQuery}
import graft.ingest.{ChainStore, IngestTelemetry, StreamingIngester}
import graft.sources.SimChainSource

/** End-to-end: the DataSourceV2 simulated-chain source feeding the
  * streaming ingester — head discovery, batch bounding, retry,
  * reorg-on-fork, telemetry, and concurrent query-while-ingesting
  * (I-1..I-6, I-9..I-15 of SURVEY §2.B). */
class SimChainSourceSpec extends AnyFunSuite with SparkSpec {

  test("source streams bounded batches, retries flaky fetches, survives a fork") {
    val headFile = Files.createTempFile("simchain-head", ".txt").toString
    SimChainSource.writeHeadFile(headFile, 9, None)
    val storeDir = Files.createTempDirectory("simchain-store").toString
    val store = new ChainStore(spark, storeDir, bucketSize = 10)
    val checkpoint = Files.createTempDirectory("simchain-ckpt").toString

    val telemetry = new IngestTelemetry
    spark.streams.addListener(telemetry)
    val envelopes = spark.readStream.format("graft-simchain")
      .option("headFile", headFile)
      .option("blocksPerBatch", 5)
      .option("flakyEveryN", 4) // every 4th block fails once, then retries
      .load()
    val query = StreamingIngester.start(envelopes, store, checkpoint,
      trigger = Trigger.ProcessingTime("50 milliseconds"))
    try {
      query.processAllAvailable()
      // head=9 → blocks 0..9 ingested, in batches of <= 5 (I-4)
      assert(store.lastSyncedBlock.contains(9L))
      assert(store.readStatus.map(_._1).contains(9L))
      // each batch plans <= blocksPerBatch new + reorgLookback re-served
      val sizes = telemetry.rowsPerBatch.filter(_ > 0)
      assert(sizes.nonEmpty && sizes.forall(_ <= 5 + 6), s"batch sizes: $sizes")

      // advance the head (I-2 discovers it on the next trigger)
      SimChainSource.writeHeadFile(headFile, 14, None)
      query.processAllAvailable()
      assert(store.lastSyncedBlock.contains(14L))

      // I-13: serve the flagship query against the store while the
      // stream is live
      val logs = store.read("logs").get
      val resp = LogsQuery.run(logs,
        GetLogsFilter(fromBlock = Some(0), toBlock = Some(14), pageSize = Some(100)))
      assert(resp.logs.nonEmpty && query.isActive)

      // chain reorgs at height 12 (node now serves the fork branch)
      SimChainSource.writeHeadFile(headFile, 16, Some(12L))
      query.processAllAvailable()
      assert(store.lastSyncedBlock.contains(16L))
      val byHeight = store.read("blocks").get
        .select("block_number", "block_hash", "parent_hash")
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
      assert(byHeight.size == 17, s"expected 17 canonical blocks, got ${byHeight.size}")
      (1L to 16L).foreach { h =>
        assert(byHeight(h)._2 == byHeight(h - 1)._1, s"chain must link at $h")
      }
    } finally {
      query.stop()
      spark.streams.removeListener(telemetry)
    }
  }
}
