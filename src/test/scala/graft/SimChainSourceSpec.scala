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

  test("deep reorg beyond the lookback window heals via the repair marker (no permanent gap)") {
    val headFile = Files.createTempFile("simchain-head-deep", ".txt").toString
    SimChainSource.writeHeadFile(headFile, 30, None)
    val storeDir = Files.createTempDirectory("simchain-store-deep").toString
    val store = new ChainStore(spark, storeDir, bucketSize = 10)
    val checkpoint = Files.createTempDirectory("simchain-ckpt-deep").toString

    val envelopes = spark.readStream.format("graft-simchain")
      .option("headFile", headFile)
      .option("blocksPerBatch", 5)
      .option("reorgLookback", 6)
      .option("repairFile", s"$storeDir/_repair_from")
      .load()
    val query = StreamingIngester.start(envelopes, store, checkpoint,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
    try {
      query.processAllAvailable()
      assert(store.lastSyncedBlock.contains(30L))

      // the chain reorgs at height 10 — far deeper than the 6-block
      // lookback, so the first post-fork batch cannot contain the fork
      // point; without the repair marker this would leave a permanent
      // hole and a store stuck on the stale branch
      SimChainSource.writeHeadFile(headFile, 32, Some(10L))
      query.processAllAvailable()
      // the repair loop needs head advances to trigger new batches;
      // the serve-from reach doubles each cycle (O(log depth))
      var head = 32L
      var cycles = 0
      while (store.readRepairFrom.isDefined && cycles < 12) {
        head += 1
        SimChainSource.writeHeadFile(headFile, head, Some(10L))
        query.processAllAvailable()
        cycles += 1
      }
      assert(store.readRepairFrom.isEmpty,
        s"repair marker should clear after healing (still set after $cycles extra cycles)")
      assert(cycles <= 6, s"expected O(log depth) healing, took $cycles cycles")

      // store is fully canonical on the fork branch: contiguous 0..head,
      // hash-linked end to end, exactly one block per height
      val byHeight = store.read("blocks").get
        .select("block_number", "block_hash", "parent_hash")
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
      assert(byHeight.keySet == (0L to head).toSet,
        s"store must be gap-free 0..$head, missing ${(0L to head).toSet -- byHeight.keySet}")
      (1L to head).foreach { h =>
        assert(byHeight(h)._2 == byHeight(h - 1)._1, s"chain must link at $h")
      }
      // heights >= 10 carry the fork branch
      assert(byHeight(10L)._1 == graft.ingest.SimChain.blockOn(10, Some(10L)).block_hash)
      assert(store.read("blocks").get.count() == head + 1) // exactly-once
    } finally query.stop()
  }

  test("I-14: missing blocks are skipped, missing receipts tolerated as status=null with no logs") {
    import org.apache.spark.sql.functions.col
    val headFile = Files.createTempFile("simchain-head-i14", ".txt").toString
    SimChainSource.writeHeadFile(headFile, 14, None)
    val storeDir = Files.createTempDirectory("simchain-store-i14").toString
    val store = new ChainStore(spark, storeDir, bucketSize = 10)
    val checkpoint = Files.createTempDirectory("simchain-ckpt-i14").toString

    val envelopes = spark.readStream.format("graft-simchain")
      .option("headFile", headFile)
      .option("blocksPerBatch", 5)
      .option("missingBlocks", "3,7")     // node serves Ok(None): skipped (main.rs:134-139)
      .option("receiptlessBlocks", "5,9") // receipts absent: status=null, no logs (main.rs:219-221)
      .load()
    val query = StreamingIngester.start(envelopes, store, checkpoint,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
    try {
      query.processAllAvailable()
      val heights = store.read("blocks").get
        .select("block_number").collect().map(_.getLong(0)).toSet
      // gap-tolerant ingest: everything but the missing heights landed
      assert(heights == (0L to 14L).toSet -- Set(3L, 7L),
        s"expected holes exactly at 3 and 7, got ${(0L to 14L).toSet -- heights}")
      val txs = store.read("transactions").get
      // receiptless blocks: every tx has null status and zero logs
      assert(txs.filter(col("block_number").isin(5L, 9L))
        .filter(col("status").isNotNull).count() == 0)
      assert(store.read("logs").get
        .filter(col("block_number").isin(5L, 9L)).count() == 0)
      // receipts elsewhere intact
      assert(txs.filter(!col("block_number").isin(5L, 9L))
        .filter(col("status").isNull).count() == 0)
    } finally query.stop()
  }
}
