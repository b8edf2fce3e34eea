package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.{ChainStore, Ingest, SimChain, StreamingIngester}

/** Ingest semantics: flatten, idempotency, reorg rollback, streaming
  * end-to-end — the reference's `src/main.rs:166-311` + `src/db.rs:34-50`
  * guarantees, which it asserts but never tests (SURVEY §5). */
class IngestSpec extends AnyFunSuite with SparkSpec {

  private def envelopes(blocks: Seq[SimChain.SimBlock]): DataFrame = {
    import spark.implicits._
    blocks.toDF()
  }

  private def freshStore(bucketSize: Long = 5): (ChainStore, String) = {
    val dir = Files.createTempDirectory("chainstore").toString
    (new ChainStore(spark, dir, bucketSize), dir)
  }

  test("I-7: flatten explodes nested envelopes into consistent tables") {
    val chain = SimChain.canonical(12)
    val (blocks, txs, logs) = Ingest.flatten(envelopes(chain))
    assert(blocks.count() == 12)
    assert(txs.count() == chain.map(_.transactions.size).sum)
    assert(logs.count() == chain.flatMap(_.transactions).map(_.logs.size).sum)
    // denormalized lineage columns present (init.sql:53-55)
    assert(logs.columns.toSet.contains("block_hash") &&
      logs.columns.toSet.contains("transaction_hash"))
  }

  test("Q-20: idempotent re-append is a fixpoint (db.rs:97,136)") {
    val (_, txs, _) = Ingest.flatten(envelopes(SimChain.canonical(10)))
    val once = Ingest.idempotentAppend(txs, txs, Seq("tx_hash"))
    assert(once.count() == txs.count())
    val twice = Ingest.idempotentAppend(once, txs.limit(5), Seq("tx_hash"))
    assert(twice.count() == txs.count())
  }

  test("ChainStore: append batches, checkpoint, replay is exactly-once") {
    val (store, _) = freshStore()
    val chain = SimChain.canonical(20)
    chain.grouped(5).foreach(b => StreamingIngester.processBatch(store, envelopes(b)))
    assert(store.lastSyncedBlock.contains(19L))
    val logsN = store.read("logs").get.count()
    // replay a middle batch (crash-recovery path): nothing duplicates
    StreamingIngester.processBatch(store, envelopes(chain.slice(5, 15)))
    assert(store.read("logs").get.count() == logsN)
    assert(store.read("blocks").get.count() == 20)
  }

  test("Q-21: rollback removes exactly the suffix across all tables (db.rs:34-50)") {
    val (store, _) = freshStore(bucketSize = 4)
    SimChain.canonical(18).grouped(6)
      .foreach(b => StreamingIngester.processBatch(store, envelopes(b)))
    val beforeTx = store.read("transactions").get
      .filter(col("block_number") < 11).count()
    store.rollback(11)
    assert(store.lastSyncedBlock.contains(10L))
    assert(store.read("transactions").get.count() == beforeTx)
    assert(store.read("logs").get
      .filter(col("block_number") >= 11).count() == 0)
    // and the store keeps working after the partition rewrite
    StreamingIngester.processBatch(store, envelopes(SimChain.canonical(18).drop(11)))
    assert(store.lastSyncedBlock.contains(17L))
  }

  test("I-9/I-10: reorg detected via parent hash, fork suffix replaced (main.rs:166-189)") {
    val (store, _) = freshStore()
    SimChain.canonical(15).grouped(5)
      .foreach(b => StreamingIngester.processBatch(store, envelopes(b)))
    val fork = SimChain.forked(10, 18)
    // sanity: fork first block links to canonical block 9 but differs from canonical 10
    assert(store.detectReorg(fork.head.block_number, fork.head.parent_hash).isEmpty)
    assert(store.hashAt(10).get != fork.head.block_hash)
    StreamingIngester.processBatch(store, envelopes(fork))
    // store is strictly canonical: prefix untouched, suffix is the fork chain
    assert(store.lastSyncedBlock.contains(17L))
    val byHeight = store.read("blocks").get
      .select(col("block_number"), col("block_hash"), col("parent_hash"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(byHeight.size == 18)
    (1L until 18L).foreach { h =>
      assert(byHeight(h)._2 == byHeight(h - 1)._1,
        s"hash chain must link at height $h after reorg")
    }
  }

  test("streaming e2e: micro-batched ingest with injected fork (I-1..I-12)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val (store, _) = freshStore()
    val checkpoint = Files.createTempDirectory("ckpt").toString
    val source = MemoryStream[SimChain.SimBlock]
    val query = StreamingIngester.start(source.toDF(), store, checkpoint,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"),
      compactEvery = 1L) // maintenance interleaved with live ingest
    try {
      source.addData(SimChain.canonical(8))
      query.processAllAvailable()
      assert(store.lastSyncedBlock.contains(7L))
      source.addData(SimChain.blocks(8, 12))
      query.processAllAvailable()
      assert(store.lastSyncedBlock.contains(11L))
      source.addData(SimChain.forked(6, 10))
      query.processAllAvailable()
      assert(store.lastSyncedBlock.contains(9L))
      assert(store.read("blocks").get.count() == 10)
      assert(store.hashAt(6).get == SimChain.forked(6, 10).head.block_hash)
    } finally query.stop()
  }

  test("compact merges per-batch small files per bucket without changing data") {
    import org.apache.hadoop.fs.Path
    val (store, root) = freshStore(bucketSize = 10)
    val chain = SimChain.canonical(20)
    // 10 appends of 2 blocks → buckets 0 and 1 get 5 files each
    chain.grouped(2).foreach(b => StreamingIngester.processBatch(store, envelopes(b.toSeq)))
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def filesPerBucket(t: String): Map[String, Int] =
      fs.listStatus(new Path(s"$root/$t")).map(_.getPath)
        .filter(_.getName.startsWith("bucket=")).map { p =>
          p.getName -> fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
        }.toMap
    assert(filesPerBucket("logs").values.forall(_ > 1))
    val before = store.read("logs").get.orderBy(col("id")).collect().toSeq
    store.Tables.foreach(store.compact)
    assert(filesPerBucket("logs").values.forall(_ == 1))
    assert(filesPerBucket("blocks").values.forall(_ == 1))
    val after = store.read("logs").get.orderBy(col("id")).collect().toSeq
    assert(after == before)
    // store still serves normally post-compaction
    assert(store.lastSyncedBlock.contains(19L))
    assert(store.hashAt(13).contains(chain(13).block_hash))
  }

  test("compact visits only buckets touched since the last compaction (O(touched), not O(chain))") {
    import org.apache.hadoop.fs.Path
    val (store, root) = freshStore(bucketSize = 2)
    val chain = SimChain.canonical(104) // 52 buckets of 2 blocks
    chain.grouped(3).foreach(b => StreamingIngester.processBatch(store, envelopes(b.toSeq)))
    store.Tables.foreach(store.compact) // compacts + clears all dirty state
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def listing(t: String): Map[String, Seq[String]] =
      fs.listStatus(new Path(s"$root/$t")).map(_.getPath)
        .filter(_.getName.startsWith("bucket=")).map { p =>
          p.getName -> fs.listStatus(p).map(_.getPath.getName)
            .filter(_.endsWith(".parquet")).toSeq.sorted
        }.toMap
    // dirty exactly one new bucket (52) with two single-block appends
    SimChain.blocks(104, 106).foreach(b =>
      StreamingIngester.processBatch(store, envelopes(Seq(b))))
    assert(listing("blocks")("bucket=52").size == 2)
    // the dirty set is persisted beside the data (_dirty markers): a
    // RESTARTED ingester — fresh ChainStore instance, same root —
    // keeps O(touched) compaction instead of degrading to a no-op
    // until the next compactAll full sweep
    val freshInstance = new ChainStore(spark, root, bucketSize = 2)
    val before = listing("blocks")
    freshInstance.compact("blocks")
    val after = listing("blocks")
    assert(after("bucket=52").size == 1, "restart lost the persisted dirty set")
    // ...and everything the restarted instance did NOT touch must come
    // through byte-identical (same part files, no rewrite)
    (before - "bucket=52").foreach { case (b, files) =>
      assert(after(b) == files, s"untouched bucket $b was rewritten")
    }
    // the pre-restart instance's stale in-memory mark for bucket 52 is
    // harmless: one listing, no rewrite (nFiles is already 1)
    store.compact("blocks")
    assert(listing("blocks") == after, "stale dirty mark caused a rewrite")
    // offline full sweep still available for maintenance
    SimChain.blocks(106, 108).foreach(b =>
      StreamingIngester.processBatch(store, envelopes(Seq(b))))
    freshInstance.compactAll("blocks")
    assert(listing("blocks")("bucket=53").size == 1)
    // data unharmed end to end
    assert(store.read("blocks").get.count() == 108)
    assert(store.lastSyncedBlock.contains(107L))
  }

  test("a crashed bucket swap heals before the first append/read, not only before compact") {
    import org.apache.hadoop.fs.Path
    val (store, root) = freshStore(bucketSize = 5)
    SimChain.canonical(20).grouped(10)
      .foreach(b => StreamingIngester.processBatch(store, envelopes(b.toSeq)))
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a crash between swapBucket's two renames: the live
    // bucket was renamed aside, the replacement never arrived
    val live = new Path(s"$root/blocks/bucket=1")
    val aside = new Path(s"$root/blocks/.aside-bucket=1")
    assert(fs.rename(live, aside))
    // a fresh process's FIRST operation is an ingest batch — without
    // recovery-before-append this would recreate bucket=1 with only
    // the new rows and the aside copy would later be deleted as
    // "superseded", losing heights 5..9 forever
    val store2 = new ChainStore(spark, root, bucketSize = 5)
    StreamingIngester.processBatch(store2, envelopes(SimChain.blocks(20, 22)))
    val heights = store2.read("blocks").get
      .select("block_number").collect().map(_.getLong(0)).toSet
    assert(heights == (0L until 22L).toSet,
      s"pre-crash rows lost: missing ${(0L until 22L).toSet -- heights}")
    assert(!fs.exists(aside), "healed aside copy must be gone")
  }

  test("property: random extend/fork walk — store stays canonical, linked, exactly-once") {
    import spark.implicits._
    // model-based check of the reference's headline integrity claim
    // ("zero data integrity failures across crash and block-reorg
    // scenarios", README.md:41): drive the ingester with a seeded
    // random sequence of chain extensions and reorgs, mirror them in an
    // in-memory model chain, and require the store to equal the model
    // exactly at every step boundary property that matters.
    val rnd = new scala.util.Random(7)
    val (store, _) = freshStore(bucketSize = 7)
    var model: Vector[SimChain.SimBlock] = SimChain.canonical(6).toVector
    StreamingIngester.processBatch(store, model.toDF())
    var branch = 0
    (1 to 18).foreach { _ =>
      val batch: Seq[SimChain.SimBlock] =
        if (rnd.nextDouble() < 0.35 && model.length > 2) {
          // reorg: fork at a random stored height, new branch wins
          branch += 1
          val h = 1 + rnd.nextInt(model.length - 1)
          val ext = 1 + rnd.nextInt(4)
          val repl = SimChain.blocks(h, model.length + ext, salt = s"b$branch",
            parentOfFirst = Some(model(h - 1).block_hash))
          model = model.take(h) ++ repl
          repl
        } else {
          // extend the current tip
          val k = 1 + rnd.nextInt(5)
          val tip = model.length
          val ext = SimChain.blocks(tip, tip + k,
            salt = if (branch == 0) "main" else s"b$branch",
            parentOfFirst = Some(model.last.block_hash))
          model = model ++ ext
          ext
        }
      StreamingIngester.processBatch(store, batch.toDF())
    }
    // store == model, block for block
    val stored = store.read("blocks").get
      .select(col("block_number"), col("block_hash"), col("parent_hash"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(stored.map(_._1).toSeq == model.indices.map(_.toLong))
    assert(stored.map(_._2).toSeq == model.map(_.block_hash))
    // hash-linked end to end
    stored.sliding(2).foreach { case Array(p, c) => assert(c._3 == p._2); case _ => }
    // children consistent and exactly-once
    val txs = store.read("transactions").get
    assert(txs.count() == model.map(_.transactions.size).sum)
    assert(txs.select(col("tx_hash")).distinct().count() == txs.count())
    val logs = store.read("logs").get
    assert(logs.count() == model.flatMap(_.transactions).map(_.logs.size).sum)
    assert(logs.select(col("id")).distinct().count() == logs.count())
    assert(store.lastSyncedBlock.contains(model.length - 1L))
  }

  test("property: compact interleaved with random extend/fork walks — maintenance never races retraction") {
    import spark.implicits._
    // The deleted-partition + rewrite machinery of rollback and the
    // merge-files + swap machinery of compact share the same bucket
    // directories; this walk pins that no interleaving of the two
    // (compaction after an append the next step retracts, compaction
    // immediately after a rollback's straddling-bucket rewrite, …)
    // ever loses or duplicates a row. Each seeded walk mirrors the
    // chain in an in-memory model and requires store == model at the
    // end. GRAFT_WALKS overrides the walk count (CI default 5 × 20
    // steps; the GRAFT_WALKS=100 evidence run passed green on
    // 2026-08-13, 100 walks × 20 steps, 93 min wall).
    val nWalks = sys.env.get("GRAFT_WALKS").flatMap(_.toIntOption).getOrElse(5)
    (0 until nWalks).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val (store, _) = freshStore(bucketSize = 7)
      var model: Vector[SimChain.SimBlock] = SimChain.canonical(6).toVector
      StreamingIngester.processBatch(store, model.toDF())
      var branch = 0
      (1 to 20).foreach { _ =>
        val batch: Seq[SimChain.SimBlock] =
          if (rnd.nextDouble() < 0.35 && model.length > 2) {
            branch += 1
            val h = 1 + rnd.nextInt(model.length - 1)
            val ext = 1 + rnd.nextInt(4)
            val repl = SimChain.blocks(h, model.length + ext, salt = s"w$seed-b$branch",
              parentOfFirst = Some(model(h - 1).block_hash))
            model = model.take(h) ++ repl
            repl
          } else {
            val k = 1 + rnd.nextInt(5)
            val tip = model.length
            val ext = SimChain.blocks(tip, tip + k,
              salt = if (branch == 0) "main" else s"w$seed-b$branch",
              parentOfFirst = Some(model.last.block_hash))
            model = model ++ ext
            ext
          }
        StreamingIngester.processBatch(store, batch.toDF())
        // maintenance interleaves the walk: sometimes one table,
        // sometimes a full sweep — including right after a rollback
        if (rnd.nextDouble() < 0.4)
          if (rnd.nextBoolean()) store.compact(store.Tables(rnd.nextInt(3)))
          else store.Tables.foreach(store.compact)
      }
      val stored = store.read("blocks").get
        .select(col("block_number"), col("block_hash"), col("parent_hash"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
      assert(stored.map(_._1).toSeq == model.indices.map(_.toLong), s"walk $seed: heights")
      assert(stored.map(_._2).toSeq == model.map(_.block_hash), s"walk $seed: hashes")
      stored.sliding(2).foreach { case Array(p, c) =>
        assert(c._3 == p._2, s"walk $seed: link at ${c._1}"); case _ => }
      val txs = store.read("transactions").get
      assert(txs.count() == model.map(_.transactions.size).sum, s"walk $seed: tx count")
      assert(txs.select(col("tx_hash")).distinct().count() == txs.count(), s"walk $seed: tx dup")
      val logs = store.read("logs").get
      assert(logs.count() == model.flatMap(_.transactions).map(_.logs.size).sum,
        s"walk $seed: log count")
      assert(store.lastSyncedBlock.contains(model.length - 1L), s"walk $seed: status")
    }
  }

  test("I-13: queries serve concurrently with live ingest (main.rs:358-374)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val (store, _) = freshStore()
    val checkpoint = Files.createTempDirectory("ckpt13").toString
    val source = MemoryStream[SimChain.SimBlock]
    val query = StreamingIngester.start(source.toDF(), store, checkpoint,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
    // the serving side: a reader thread issuing point lookups + stats
    // against the store while the ingester commits batches — the
    // reference's tokio::spawn(ingester) + Axum server sharing one pool
    @volatile var served = 0
    @volatile var failure: Option[Throwable] = None
    val reader = new Thread(() => {
      try {
        while (served < 8) {
          store.read("blocks").foreach { b =>
            val n = b.count()
            val lookedUp = graft.api.Lookups.blockByIdentifier(b, "0").get.collect()
            assert(lookedUp.length <= 1)
            if (n > 0) served += 1
          }
          Thread.sleep(20)
        }
      } catch { case t: Throwable => failure = Some(t) }
    })
    try {
      source.addData(SimChain.canonical(5))
      query.processAllAvailable()
      reader.start()
      (5L until 30L by 5).foreach { h =>
        source.addData(SimChain.blocks(h, h + 5))
        query.processAllAvailable()
      }
      reader.join(30000)
      assert(!reader.isAlive, "reader thread starved while ingest ran")
      failure.foreach(throw _)
      assert(served >= 8)
      assert(store.lastSyncedBlock.contains(29L))
    } finally {
      query.stop()
      if (reader.isAlive) reader.interrupt()
    }
  }
}
