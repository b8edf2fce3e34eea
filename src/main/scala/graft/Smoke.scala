package graft

import org.apache.spark.sql.SparkSession
import graft.api.{GetLogsFilter, LogsQuery, Lookups}
import graft.evm.EvmDerive

/** Dev smoke main: drives the public library surface the way the
  * driver's t1 smoke does (entry rows > 0) plus the negative paths the
  * queries registry can't express (None returns, clamps, cursor walk).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"

    val n = SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows=$n (driver checks >0)")

    val txs = EvmDerive.transactions(spark, dir)
    println(s"[smoke] txByHash invalid short hash -> ${Lookups.txByHash(txs, "0xdeadbeef")}")
    println(s"[smoke] txByHash no-0x 66 chars -> ${Lookups.txByHash(txs, "zz" + "a" * 64)}")
    val blocks = EvmDerive.blocks(spark, dir)
    println(s"[smoke] blockByIdentifier gibberish -> ${Lookups.blockByIdentifier(blocks, "not-a-number")}")
    println(s"[smoke] blockByIdentifier missing height rows=" +
      Lookups.blockByIdentifier(blocks, "999999").get.count())

    println(s"[smoke] clamp(0)=${LogsQuery.clampPageSize(0)} clamp(1000)=${LogsQuery.clampPageSize(1000)}")

    // Cursor pagination walk == one-shot scan (the reference's core
    // pagination claim, src/api.rs:162-163).
    val logs = EvmDerive.logs(spark, dir)
    // 0..8 = 90 logs < the 100-row one-shot cap, so both sides see all.
    val filter0 = GetLogsFilter(fromBlock = Some(0), toBlock = Some(8), pageSize = Some(7))
    val oneShot = LogsQuery.plan(logs, filter0.copy(pageSize = Some(100))).collect().map(_.getAs[Long]("id"))
    var walked = Vector.empty[Long]
    var f = filter0.copy(cursorBlock = Some(-1L), cursorLogId = Some(-1L))
    var done = false
    while (!done) {
      val page = LogsQuery.run(logs, f)
      walked ++= page.logs.map(_.getAs[Long]("id"))
      if (page.logs.length < 7) done = true
      else f = f.copy(cursorBlock = page.nextCursorBlock, cursorLogId = page.nextCursorLogId)
    }
    println(s"[smoke] cursor walk ${walked.length} ids == one-shot ${oneShot.length}: " +
      (walked == oneShot.toVector))

    // Ingest surface: micro-batch a simulated chain into a parquet
    // ChainStore, inject a fork, confirm the store ends strictly
    // canonical (the reference's reorg guarantee, src/main.rs:166-189).
    import graft.ingest.{ChainStore, SimChain, StreamingIngester}
    import spark.implicits._
    val storeDir = java.nio.file.Files.createTempDirectory("smoke-chain").toString
    val store = new ChainStore(spark, storeDir, bucketSize = 10)
    SimChain.canonical(30).grouped(5)
      .foreach(b => StreamingIngester.processBatch(store, b.toSeq.toDF()))
    println(s"[smoke] ingested 30 blocks, lastSynced=${store.lastSyncedBlock}")
    StreamingIngester.processBatch(store, SimChain.forked(22, 35).toDF())
    val chainBlocks = store.read("blocks").get.select("block_number", "block_hash", "parent_hash")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val linked = (1L until 35L).forall(h => chainBlocks(h)._2 == chainBlocks(h - 1)._1)
    println(s"[smoke] after fork@22: blocks=${chainBlocks.size} lastSynced=${store.lastSyncedBlock} " +
      s"hash-chain-linked=$linked")

    // Streaming surface: the DataSourceV2 simulated-chain source wired
    // through the public readStream.format(...) API into a fresh store.
    import graft.sources.SimChainSource
    val headFile = java.nio.file.Files.createTempFile("smoke-head", ".txt").toString
    SimChainSource.writeHeadFile(headFile, 12, None)
    val store2 = new ChainStore(spark,
      java.nio.file.Files.createTempDirectory("smoke-chain2").toString, bucketSize = 10)
    val q = StreamingIngester.start(
      spark.readStream.format("graft-simchain")
        .option("headFile", headFile).option("flakyEveryN", 5).load(),
      store2,
      java.nio.file.Files.createTempDirectory("smoke-ckpt").toString,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
    q.processAllAvailable()
    SimChainSource.writeHeadFile(headFile, 20, Some(15L))
    q.processAllAvailable()
    q.stop()
    println(s"[smoke] DSv2 source: lastSynced=${store2.lastSyncedBlock} " +
      s"status=${store2.readStatus} (expect 20 after fork@15)")

    // Ingest throughput: blocks/sec through the full batch path
    // (flatten + reorg check + idempotent append + checkpoint). The
    // reference ingests 5 blocks per 10 s poll (RPC-bound, ~0.5
    // blocks/s sustained, README.md:238); this measures the engine-side
    // pipeline the reference says is "not the bottleneck".
    val store3 = new ChainStore(spark,
      java.nio.file.Files.createTempDirectory("smoke-chain3").toString, bucketSize = 500)
    val throughputBlocks = 2000
    val t0 = System.nanoTime()
    SimChain.canonical(throughputBlocks).grouped(500)
      .foreach(b => StreamingIngester.processBatch(store3, b.toSeq.toDF()))
    val secs = (System.nanoTime() - t0) / 1e9
    val rows = store3.read("logs").get.count() + store3.read("transactions").get.count() +
      throughputBlocks
    println(f"[smoke] ingest throughput: $throughputBlocks blocks ($rows rows) in $secs%.1f s " +
      f"= ${throughputBlocks / secs}%.0f blocks/s")
    spark.stop()
  }
}
