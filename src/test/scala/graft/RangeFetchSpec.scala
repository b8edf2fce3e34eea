package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.{ChainStore, SimChain, StreamingIngester}
import graft.sources.{ChainFetch, RpcFetcherConf, SimChainSource, SimFetcherConf, SimFetcherCounters}

/** The `eth_getLogs` range-fetch strategy — the optimization the
  * reference's README names "the highest-impact future" one
  * (`README.md:90`: one log call per block RANGE instead of the N+1
  * per-tx receipt fan-out, "but requires careful deduplication and
  * schema alignment").
  *
  * Contract pinned here:
  *  - byte-identical envelopes/stores vs the N+1 path, across fork,
  *    missing-block, and receiptless scenarios (the reference's full
  *    fault matrix);
  *  - the dedup/alignment actually earns its keep: duplicated,
  *    removed-flagged, and stale-branch range logs all vanish;
  *  - RPC call complexity is O(ranges + blocks), NOT O(txs):
  *    `eth_getLogs` counts ranges, `eth_getTransactionReceipt` drops
  *    to zero (or, on a node without `eth_getBlockReceipts`, survives
  *    only as the status fallback while logs still ride the range
  *    call);
  *  - all of the above holds over the real JSON-RPC wire
  *    ([[StubRpcNode]]), not just in-process.
  */
class RangeFetchSpec extends AnyFunSuite with SparkSpec {

  private def txCount(n: Long): Long = n % 3 + 1 // SimChain's tx shape

  test("range envelopes are byte-identical to the N+1 path (fork + gap + receiptless + flaky)") {
    val conf = SimFetcherConf(forkAt = Some(12L), flakyEveryN = 5L,
      missing = Set(3L, 7L), receiptless = Set(5L, 9L))
    val viaReceipts = {
      val f = conf.open()
      try (0L to 20L).flatMap(n => ChainFetch.envelope(f, n, 3, 1, 10)) finally f.close()
    }
    val viaRange = {
      val f = conf.open()
      try ChainFetch.rangeEnvelopes(f, 0L, 20L, 3, 1, 10) finally f.close()
    }
    assert(viaRange == viaReceipts,
      "range strategy must reproduce the receipt strategy's envelopes exactly")
    // and with the per-tx status fallback (node without eth_getBlockReceipts)
    val viaFallback = {
      val f = conf.copy(noBlockReceipts = true).open()
      try ChainFetch.rangeEnvelopes(f, 0L, 20L, 3, 1, 10) finally f.close()
    }
    assert(viaFallback == viaReceipts)
  }

  test("dedup/schema alignment: duplicate, removed, and stale-branch range logs all vanish") {
    val clean = SimFetcherConf(forkAt = Some(4L), flakyEveryN = 0L,
      missing = Set.empty, receiptless = Set(2L))
    val noisy = clean.copy(rangeNoise = true)
    val want = { val f = clean.open(); try ChainFetch.rangeEnvelopes(f, 0L, 10L, 3, 1, 10) finally f.close() }
    val got = { val f = noisy.open(); try ChainFetch.rangeEnvelopes(f, 0L, 10L, 3, 1, 10) finally f.close() }
    assert(got == want,
      "triplicated + removed-flagged + stale-branch logs must dedup/align away")
    assert(want.exists(_.transactions.exists(_.logs.nonEmpty)),
      "sanity: the comparison actually covers logs")
  }

  test("RPC call complexity: O(ranges + blocks), not O(txs)") {
    val blocks = 0L to 19L
    val totalTxs = blocks.map(txCount).sum

    // N+1 baseline: one receipt call per tx
    SimFetcherCounters.reset("cc-n1")
    val n1 = SimFetcherConf(None, 0L, Set.empty, Set.empty, counterKey = Some("cc-n1")).open()
    try blocks.foreach(n => ChainFetch.envelope(n1, n, 3, 1, 10)) finally n1.close()
    assert(SimFetcherCounters.get("cc-n1", "transactionReceipt") == totalTxs)
    assert(SimFetcherCounters.get("cc-n1", "blockWithTxs") == blocks.size)

    // range strategy in 4 chunks of 5: logs cost 4 calls total, status
    // is one block-receipts call per block, zero per-tx receipts
    SimFetcherCounters.reset("cc-range")
    val rf = SimFetcherConf(None, 0L, Set.empty, Set.empty, counterKey = Some("cc-range")).open()
    try blocks.grouped(5).foreach(chunk =>
      ChainFetch.rangeEnvelopes(rf, chunk.head, chunk.last, 3, 1, 10)) finally rf.close()
    assert(SimFetcherCounters.get("cc-range", "logsInRange") == 4,
      "one eth_getLogs per range — O(ranges)")
    assert(SimFetcherCounters.get("cc-range", "transactionReceipt") == 0,
      "no per-tx receipt calls when the node serves eth_getBlockReceipts")
    assert(SimFetcherCounters.get("cc-range", "blockReceiptStatuses") == blocks.size)
    // + one branch-stability head re-fetch per range (still O(ranges))
    assert(SimFetcherCounters.get("cc-range", "blockWithTxs") == blocks.size + 4)

    // fallback node (no eth_getBlockReceipts): receipts return for
    // STATUS only — logs still cost O(ranges)
    SimFetcherCounters.reset("cc-fb")
    val fb = SimFetcherConf(None, 0L, Set.empty, Set.empty,
      noBlockReceipts = true, counterKey = Some("cc-fb")).open()
    try blocks.grouped(5).foreach(chunk =>
      ChainFetch.rangeEnvelopes(fb, chunk.head, chunk.last, 3, 1, 10)) finally fb.close()
    assert(SimFetcherCounters.get("cc-fb", "logsInRange") == 4)
    assert(SimFetcherCounters.get("cc-fb", "transactionReceipt") == totalTxs)
  }

  test("a reorg racing the range window falls back to the N+1 path — no empty-log holes") {
    // the branch flips AFTER the 10 block fetches but BEFORE the log
    // call: the range logs describe branch B while the fetched blocks
    // are branch A. Without the stability check, B's logs are keyed by
    // B hashes, 'fall away' against the A blocks, and heights >= 5
    // persist with silently EMPTY logs — the hole the N+1 path cannot
    // produce. The check must detect the foreign-only log evidence
    // (and the moved head) and re-resolve the window per block.
    val conf = SimFetcherConf(None, 0L, Set.empty, Set.empty,
      raceForkAt = Some(5L), raceAfterBlockCalls = 10L)
    val got = { val f = conf.open(); try ChainFetch.rangeEnvelopes(f, 0L, 9L, 3, 1, 10) finally f.close() }
    val want = (0L to 9L).map(n => SimChain.blockOn(n, Some(5L)))
    assert(want.drop(5).exists(_.transactions.exists(_.logs.nonEmpty)),
      "sanity: the post-reorg branch carries logs the hole would lose")
    assert(got == want, "the window must re-resolve onto the post-reorg branch, logs included")

    // the race landing between the log call and the stability re-check:
    // blocks and logs agree (branch A) but the head moved — the
    // conservative fallback refetches and lands on B
    val conf2 = SimFetcherConf(None, 0L, Set.empty, Set.empty,
      raceForkAt = Some(5L), raceAfterLogsCall = true)
    val got2 = { val f = conf2.open(); try ChainFetch.rangeEnvelopes(f, 0L, 9L, 3, 1, 10) finally f.close() }
    assert(got2 == want, "a head moved during the window must trigger the fallback")
  }

  test("a reorg landing mid-BLOCK-fetch with log-silent raced heights trips the parent-linkage check") {
    // The corner the foreign-evidence + head-re-fetch pair misses: the
    // branch flips after 8 of the 10 block fetches, so heights 0-7 are
    // fetched from the stale branch and 8-9 from the fresh one. The
    // head re-fetch (block 9) matches — 9 was already fetched
    // post-reorg. And with heights 5-7 receiptless, the fresh branch
    // serves NO logs there, so the stale blocks at 5-7 draw no
    // foreign-only log evidence either. Without linkage validation
    // they would persist from the dead branch (wrong hashes, wrong
    // txs) with silently empty logs. The seam between the branches —
    // block 8's parentHash pointing at the fresh block 7, not the
    // fetched stale one — is what the check must catch.
    val conf = SimFetcherConf(None, 0L, Set.empty,
      receiptless = Set(5L, 6L, 7L),
      raceForkAt = Some(5L), raceAfterBlockCalls = 8L)
    val got = { val f = conf.open(); try ChainFetch.rangeEnvelopes(f, 0L, 9L, 3, 1, 10) finally f.close() }
    val want = {
      val f = SimFetcherConf(Some(5L), 0L, Set.empty, Set(5L, 6L, 7L)).open()
      try (0L to 9L).flatMap(n => ChainFetch.envelope(f, n, 3, 1, 10)) finally f.close()
    }
    assert(got.map(_.block_hash) == want.map(_.block_hash),
      "heights >= 5 must re-resolve onto the post-reorg branch, not persist stale blocks")
    assert(got == want, "the fallback must reproduce the N+1 envelopes exactly")
    assert(got(5).block_hash == SimChain.blockOn(5, Some(5L)).block_hash,
      "sanity: height 5 is the fresh-branch block, not the raced stale one")
  }

  test("a persistently erroring eth_getBlockReceipts degrades to per-tx statuses, not task death") {
    val blocks = 0L to 9L
    SimFetcherCounters.reset("cc-broken")
    val clean = {
      val f = SimFetcherConf(None, 0L, Set.empty, Set.empty).open()
      try ChainFetch.rangeEnvelopes(f, 0L, 9L, 3, 1, 10) finally f.close()
    }
    val broken = {
      val f = SimFetcherConf(None, 0L, Set.empty, Set.empty,
        brokenBlockReceipts = true, counterKey = Some("cc-broken")).open()
      try ChainFetch.rangeEnvelopes(f, 0L, 9L, 3, 1, 10) finally f.close()
    }
    assert(broken == clean,
      "an erroring aggregate-status endpoint must fall back, byte-identically")
    assert(SimFetcherCounters.get("cc-broken", "transactionReceipt") ==
      blocks.map(txCount).sum, "statuses came through the per-tx fallback")
  }

  /** Name-sorted projection before comparing: parquet appendfiles may
    * carry different column ORDERS (the store's anti-join rotates the
    * key column first), and Row.toString is positional. */
  private def sortedRows(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toIndexedSeq.map(org.apache.spark.sql.functions.col)
    df.select(cols: _*).orderBy(cols: _*).collect().map(_.toString).toIndexedSeq
  }

  private def ingestScenario(strategy: String, extra: Map[String, String] = Map.empty): ChainStore = {
    val headFile = Files.createTempFile(s"range-head-$strategy", ".txt").toString
    SimChainSource.writeHeadFile(headFile, 9, None)
    val store = new ChainStore(spark,
      Files.createTempDirectory(s"range-store-$strategy").toString, bucketSize = 10)
    val checkpoint = Files.createTempDirectory(s"range-ckpt-$strategy").toString
    var reader = spark.readStream.format("graft-simchain")
      .option("headFile", headFile)
      .option("blocksPerBatch", 5)
      .option("fetchStrategy", strategy)
      .option("missingBlocks", "3")
      .option("receiptlessBlocks", "6")
      .option("flakyEveryN", 4)
    extra.foreach { case (k, v) => reader = reader.option(k, v) }
    val query = StreamingIngester.start(reader.load(), store, checkpoint,
      trigger = Trigger.ProcessingTime("50 milliseconds"))
    try {
      query.processAllAvailable()
      // fork at 12 while the head advances — the reorg path
      SimChainSource.writeHeadFile(headFile, 16, Some(12L))
      query.processAllAvailable()
      assert(store.lastSyncedBlock.contains(16L))
    } finally query.stop()
    store
  }

  test("streaming e2e: a reorg racing the FIRST range window falls back inside the run; store converges byte-identically") {
    // The full loop for the mid-window reorg: the first micro-batch's
    // single range partition (blocksPerBatch = logRangeSize = 10) races
    // onto the fork after 8 of its 10 block fetches, with the raced
    // heights 5-7 receiptless (log-silent on the fresh branch) — the
    // parent-linkage fallback must fire INSIDE the streaming read and
    // the store must land wholly on the post-race branch; afterwards
    // the head advances on that branch and ingestion continues.
    SimFetcherCounters.reset("e2e-race")
    val headFile = Files.createTempFile("race-head", ".txt").toString
    SimChainSource.writeHeadFile(headFile, 9, None)
    val store = new ChainStore(spark,
      Files.createTempDirectory("race-store").toString, bucketSize = 10)
    val checkpoint = Files.createTempDirectory("race-ckpt").toString
    val envelopes = spark.readStream.format("graft-simchain")
      .option("headFile", headFile)
      .option("blocksPerBatch", 10)
      .option("fetchStrategy", "range")
      .option("receiptlessBlocks", "5,6,7")
      .option("raceForkAt", 5)
      .option("raceAfterBlockCalls", 8)
      .option("counterKey", "e2e-race")
      .load()
    val query = StreamingIngester.start(envelopes, store, checkpoint,
      trigger = Trigger.ProcessingTime("50 milliseconds"))
    try {
      query.processAllAvailable()
      // the node is now durably on the fork branch; the head advances
      SimChainSource.writeHeadFile(headFile, 16, Some(5L))
      query.processAllAvailable()
      assert(store.lastSyncedBlock.contains(16L))
    } finally query.stop()

    // ground truth: the same chain ingested over the N+1 path from a
    // node that was on the fork branch all along
    val wantStore = ingestWant(Some(5L), Set(5L, 6L, 7L))
    for (table <- Seq("blocks", "transactions", "logs"))
      assert(sortedRows(store.read(table).get) == sortedRows(wantStore.read(table).get),
        s"table $table must converge byte-identically after the raced window's fallback")
    // the fallback fired exactly once, for the raced window: per-tx
    // receipts were fetched only there (blocks 0-9: sum of txCount),
    // while every later window stayed on block-level statuses
    assert(SimFetcherCounters.get("e2e-race", "transactionReceipt") ==
      (0L to 9L).map(txCount).sum,
      "per-tx receipts must come only from the raced window's N+1 fallback")
    assert(SimFetcherCounters.get("e2e-race", "logsInRange") <= 4,
      "log calls must stay O(ranges)")
  }

  test("streaming e2e: range strategy on a node WITHOUT eth_getBlockReceipts — logs ride ranges, statuses per tx") {
    SimFetcherCounters.reset("e2e-nobr")
    val viaReceipts = ingestScenario("receipts")
    val viaRange = ingestScenario("range",
      Map("noBlockReceipts" -> "true", "counterKey" -> "e2e-nobr"))
    for (table <- Seq("blocks", "transactions", "logs"))
      assert(sortedRows(viaRange.read(table).get) == sortedRows(viaReceipts.read(table).get),
        s"table $table must be byte-identical on a receipts-method-absent node")
    assert(SimFetcherCounters.get("e2e-nobr", "logsInRange") > 0 &&
      SimFetcherCounters.get("e2e-nobr", "logsInRange") <= 8,
      "logs must ride O(ranges) eth_getLogs calls")
    assert(SimFetcherCounters.get("e2e-nobr", "blockReceiptStatuses") == 0,
      "the node has no eth_getBlockReceipts to call")
    assert(SimFetcherCounters.get("e2e-nobr", "transactionReceipt") > 0,
      "statuses must arrive through the per-tx fallback")
  }

  /** An N+1-strategy ingest of the canonical-then-fork chain — the
    * ground-truth store the raced-range run must converge to. */
  private def ingestWant(forkAt: Option[Long], receiptless: Set[Long]): ChainStore = {
    val headFile = Files.createTempFile("race-want-head", ".txt").toString
    SimChainSource.writeHeadFile(headFile, 9, forkAt)
    val store = new ChainStore(spark,
      Files.createTempDirectory("race-want-store").toString, bucketSize = 10)
    val checkpoint = Files.createTempDirectory("race-want-ckpt").toString
    val envelopes = spark.readStream.format("graft-simchain")
      .option("headFile", headFile)
      .option("blocksPerBatch", 10)
      .option("receiptlessBlocks", receiptless.mkString(","))
      .load()
    val query = StreamingIngester.start(envelopes, store, checkpoint,
      trigger = Trigger.ProcessingTime("50 milliseconds"))
    try {
      query.processAllAvailable()
      SimChainSource.writeHeadFile(headFile, 16, forkAt)
      query.processAllAvailable()
      assert(store.lastSyncedBlock.contains(16L))
    } finally query.stop()
    store
  }

  test("streaming e2e: range-strategy store is byte-identical to the receipt-strategy store") {
    val viaReceipts = ingestScenario("receipts")
    val viaRange = ingestScenario("range", Map("rangeNoise" -> "true"))
    for (table <- Seq("blocks", "transactions", "logs")) {
      assert(sortedRows(viaRange.read(table).get) == sortedRows(viaReceipts.read(table).get),
        s"table $table must be byte-identical across fetch strategies")
    }
    assert(viaRange.read("logs").get.count() > 0, "sanity: logs landed")
  }

  test("over the wire: eth_getLogs strategy matches, with O(ranges) log calls") {
    val headFile = Files.createTempFile("rpc-range-head", ".txt").toString
    SimChainSource.writeHeadFile(headFile, 9, None)
    val node = new StubRpcNode(headFile)
    try {
      // fetcher-level parity over real JSON (hex quantities, removed flag)
      val f = RpcFetcherConf(node.url).open()
      val want = (0L to 9L).map(n => SimChain.blockOn(n, None))
      try assert(ChainFetch.rangeEnvelopes(f, 0L, 9L, 3, 5, 10) == want) finally f.close()
      assert(node.callsServed("eth_getLogs") == 1)
      assert(node.callsServed("eth_getTransactionReceipt") == 0)

      // streaming e2e over graft-rpcchain with the range strategy
      val store = new ChainStore(spark,
        Files.createTempDirectory("rpc-range-store").toString, bucketSize = 10)
      val checkpoint = Files.createTempDirectory("rpc-range-ckpt").toString
      val envelopes = spark.readStream.format("graft-rpcchain")
        .option("rpcUrl", node.url)
        .option("blocksPerBatch", 5)
        .option("fetchStrategy", "range")
        .option("baseBackoffMs", 5)
        .load()
      val query = StreamingIngester.start(envelopes, store, checkpoint,
        trigger = Trigger.ProcessingTime("50 milliseconds"))
      try {
        query.processAllAvailable()
        SimChainSource.writeHeadFile(headFile, 16, Some(12L))
        query.processAllAvailable()
        assert(store.lastSyncedBlock.contains(16L))
        val byHeight = store.read("blocks").get
          .select("block_number", "block_hash", "parent_hash")
          .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
        assert(byHeight.size == 17)
        (1L to 16L).foreach(h => assert(byHeight(h)._2 == byHeight(h - 1)._1))
        assert(byHeight(12L)._1 == SimChain.blockOn(12, Some(12L)).block_hash)
        // every tx got its status through eth_getBlockReceipts, and the
        // whole run made zero per-tx receipt calls
        import org.apache.spark.sql.functions.col
        assert(store.read("transactions").get.filter(col("status").isNull).count() == 0)
        assert(node.callsServed("eth_getTransactionReceipt") == 0,
          "range mode must never fetch per-tx receipts on a block-receipts node")
        assert(node.callsServed("eth_getLogs") > 0)
      } finally query.stop()
    } finally node.close()
  }

  test("over the wire: node without eth_getBlockReceipts falls back to per-tx STATUS fetches") {
    val headFile = Files.createTempFile("rpc-range-fb-head", ".txt").toString
    SimChainSource.writeHeadFile(headFile, 6, None)
    val node = new StubRpcNode(headFile, supportsBlockReceipts = false)
    try {
      val f = RpcFetcherConf(node.url).open()
      val want = (0L to 6L).map(n => SimChain.blockOn(n, None))
      try assert(ChainFetch.rangeEnvelopes(f, 0L, 6L, 3, 5, 10) == want) finally f.close()
      assert(node.callsServed("eth_getLogs") == 1, "logs still ride the range call")
      // -32601 probe happens once, then the fetcher stops asking
      assert(node.callsServed("eth_getBlockReceipts") == 1,
        "method-not-found must be cached, not re-probed per block")
      assert(node.callsServed("eth_getTransactionReceipt") ==
        (0L to 6L).map(txCount).sum, "per-tx calls return for status only")
    } finally node.close()
  }
}
