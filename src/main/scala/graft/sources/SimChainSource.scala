package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{AtomicMoveNotSupportedException, Files, Paths, StandardCopyOption}
import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.ingest.SimChain

/** DataSourceV2 micro-batch source over the simulated chain — the
  * Spark-native re-expression of the reference's polling RPC client
  * (`src/main.rs:64-164`):
  *
  *  - I-2 chain-head discovery → [[SimChainMicroBatchStream.latestOffset]]
  *    reads the "node state" (a head file: `<head> <forkAt|->`)
  *  - I-4 batch bounding       → latestOffset clamps to
  *    `committed + blocksPerBatch` (BLOCKS_PER_BATCH=5 analog)
  *  - I-3 block+txs fetch      → one [[InputPartition]] per block; the
  *    partition reader materializes the full nested envelope
  *  - I-6 parallel fan-out     → partitions execute concurrently; the
  *    reference's `buffer_unordered(10)` becomes executor parallelism
  *  - I-5 retry + backoff      → [[SimChainPartitionReader]] retries a
  *    (deterministically injected) flaky fetch 3× with exponential
  *    backoff (`src/main.rs:28-29,49,153-155`)
  *
  * Every batch re-serves a `reorgLookback` window of already-committed
  * blocks (default 6 — a finality-depth analog). Offsets in the engine
  * WAL are monotonic, so a source cannot rewind after a reorg; the
  * lookback guarantees any fork within the window arrives *inside* a
  * batch, where the ingester's same-height divergence check rolls back
  * and replaces it in one cycle. (The reference instead re-fetches
  * after rollback, which only heals 1-block-deep reorgs —
  * `src/main.rs:166-189` deletes the stored parent and then skips the
  * check when it is absent.) The re-served blocks dedup away in the
  * idempotent append.
  *
  * A reorg deeper than the lookback window leaves a hole the ingester
  * cannot refill from the batch; it records the fork height in the
  * store's repair marker (`ChainStore.writeRepairFrom`) and the
  * `repairFile` option lets this source honor it: the next batch's
  * re-serve window extends down to the marked height, so the hole is
  * re-ingested and the marker cleared — the reference's
  * refetch-after-rollback (`src/main.rs:166-189`) generalized to any
  * depth. Offsets in the WAL stay monotonic; only the served window
  * widens.
  *
  * I-14 error isolation: heights in `missingBlocks` fetch as absent
  * and are skipped (`src/main.rs:134-139`); heights in
  * `receiptlessBlocks` serve txs with `status=null` and no logs
  * (`src/main.rs:219-221,250-253`).
  *
  * Options: `headFile` (required), `startBlock` (default 0),
  * `blocksPerBatch` (default 5), `reorgLookback` (default 6),
  * `flakyEveryN` (0 = reliable), `repairFile` (optional marker path),
  * `missingBlocks` / `receiptlessBlocks` (comma-separated heights).
  *
  * Usage: `spark.readStream.format("graft-simchain")
  *   .option("headFile", path).load()`
  */
class SimChainSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-simchain"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SimChainSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SimChainTable(properties)
}

object SimChainSource {
  lazy val schema: StructType =
    ExpressionEncoder[SimChain.SimBlock]().schema

  /** Node state: "<head> <forkAt|->" — head is the highest available
    * block; forkAt marks where the chain reorged onto the fork branch. */
  def readHeadFile(path: String): (Long, Option[Long]) = {
    val parts = new String(Files.readAllBytes(Paths.get(path)),
      StandardCharsets.UTF_8).trim.split("\\s+")
    val fork = if (parts.length > 1 && parts(1) != "-") Some(parts(1).toLong) else None
    (parts(0).toLong, fork)
  }

  /** Atomic temp-write + rename: [[SimChainMicroBatchStream.latestOffset]]
    * polls and parses this file on every trigger, so a plain
    * truncate-then-write races the poll — a torn read (empty file
    * mid-truncate) throws in latestOffset and kills the whole
    * streaming query. Rename is atomic on POSIX, so a reader sees the
    * old head or the new one, never a partial file. */
  def writeHeadFile(path: String, head: Long, forkAt: Option[Long]): Unit = {
    val p = Paths.get(path)
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    Files.write(tmp,
      s"$head ${forkAt.map(_.toString).getOrElse("-")}".getBytes(StandardCharsets.UTF_8))
    try Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    catch {
      case _: AtomicMoveNotSupportedException =>
        Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING)
    }
  }
}

class SimChainTable(properties: util.Map[String, String]) extends Table with SupportsRead {
  override def name(): String = "sim_chain"
  override def schema(): StructType = SimChainSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = SimChainSource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new SimChainMicroBatchStream(options)
    }
}

/** Offset = exclusive upper block number already planned. */
case class BlockOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

class SimChainMicroBatchStream(options: CaseInsensitiveStringMap)
    extends MicroBatchStream {
  private val headFile = options.get("headFile")
  require(headFile != null, "graft-simchain requires option headFile")
  private val startBlock = options.getLong("startBlock", 0L)
  private val blocksPerBatch = options.getLong("blocksPerBatch", 5L)
  private val reorgLookback = options.getLong("reorgLookback", 6L)
  private val flakyEveryN = options.getLong("flakyEveryN", 0L)
  private val repairFile = Option(options.get("repairFile"))
  private def heightSet(key: String): Set[Long] =
    Option(options.get(key)).map(_.split(",").filter(_.nonEmpty).map(_.trim.toLong).toSet)
      .getOrElse(Set.empty)
  private val missingBlocks = heightSet("missingBlocks")
  private val receiptlessBlocks = heightSet("receiptlessBlocks")

  /** Deep-reorg repair marker left by the ingester (see class doc) —
    * the serve-from height, parsed by the marker format's single owner
    * ([[graft.ingest.ChainStore.parseRepairMarker]]). */
  private def repairFrom(): Option[Long] =
    repairFile.filter(f => Files.exists(Paths.get(f))).flatMap { f =>
      graft.ingest.ChainStore.parseRepairMarker(
        new String(Files.readAllBytes(Paths.get(f)), StandardCharsets.UTF_8)).map(_._1)
    }

  /** Exclusive end of the last planned batch. The clamp must advance
    * with *planned* work, not with the asynchronous commit callback —
    * otherwise processAllAvailable observes a stale bound and stops
    * after one batch. */
  @volatile private var planned: Long = startBlock

  override def initialOffset(): Offset = BlockOffset(startBlock)

  override def deserializeOffset(json: String): Offset = {
    val n = json.toLong
    planned = math.max(planned, n)
    BlockOffset(n)
  }

  /** I-2 head discovery + I-4 bounding: never plan more than
    * blocksPerBatch past the last planned batch (`src/main.rs:113-114`). */
  override def latestOffset(): Offset = {
    val (head, _) = SimChainSource.readHeadFile(headFile)
    BlockOffset(math.max(planned, math.min(head + 1, planned + blocksPerBatch)))
  }

  /** I-3/I-6: one partition per block, fetched concurrently. The fork
    * state is snapshotted at planning time so every partition of the
    * batch sees one consistent chain view. */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (_, forkAt) = SimChainSource.readHeadFile(headFile)
    val s0 = math.max(0L, start.asInstanceOf[BlockOffset].n - reorgLookback)
    // widen (never narrow) the re-serve window down to a pending
    // deep-reorg repair marker; the extra blocks dedup in the store
    val s = repairFrom().filter(_ < s0).getOrElse(s0)
    val e = end.asInstanceOf[BlockOffset].n
    planned = math.max(planned, e)
    (s until e).map(n => SimChainInputPartition(n, forkAt, flakyEveryN,
      missingBlocks, receiptlessBlocks): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new SimChainPartitionReader(partition.asInstanceOf[SimChainInputPartition])
    }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

case class SimChainInputPartition(blockNumber: Long, forkAt: Option[Long],
                                  flakyEveryN: Long,
                                  missingBlocks: Set[Long] = Set.empty,
                                  receiptlessBlocks: Set[Long] = Set.empty) extends InputPartition

/** Fetches one block envelope, with the reference's retry policy
  * (3 attempts, exponential backoff — `src/main.rs:126-159`). The
  * "RPC failure" is injected deterministically for blocks where
  * `n % flakyEveryN == 0`: the first attempt throws, the retry
  * succeeds — exercising the real retry path on every such block. */
class SimChainPartitionReader(p: SimChainInputPartition)
    extends PartitionReader[InternalRow] {
  private val serializer = ExpressionEncoder[SimChain.SimBlock]().createSerializer()
  private var attempts = 0
  private var done = false
  private var current: InternalRow = _

  /** Returns None when the node has no block at this height — I-14's
    * `Ok(None)` skip path (`src/main.rs:134-139`). */
  private def fetchWithRetry(): Option[SimChain.SimBlock] = {
    val maxAttempts = 3
    var backoffMs = 10L
    var out: Option[Option[SimChain.SimBlock]] = None
    while (out.isEmpty) {
      attempts += 1
      try {
        if (p.flakyEveryN > 0 && p.blockNumber % p.flakyEveryN == 0 && attempts == 1)
          throw new RuntimeException(s"injected RPC failure for block ${p.blockNumber}")
        out = Some(SimChain.blockOnNode(p.blockNumber, p.forkAt,
          p.missingBlocks, p.receiptlessBlocks))
      } catch {
        case e: RuntimeException if attempts < maxAttempts =>
          Thread.sleep(backoffMs)
          backoffMs *= 2
        case e: RuntimeException => throw e
      }
    }
    out.get
  }

  override def next(): Boolean =
    if (done) false
    else {
      done = true
      fetchWithRetry() match {
        case Some(b) => current = serializer(b).copy(); true
        case None    => false // I-14: missing block — emit nothing, skip
      }
    }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
