package graft.sources

import java.util.concurrent.{Callable, Executors, TimeUnit}
import graft.ingest.SimChain

/** The chain-fetch seam: the three RPC operations the reference's
  * ingester makes against a node (`src/main.rs:96-106` head discovery,
  * `:129` block+txs, `:204-227` receipt fan-out), extracted as a trait
  * so the streaming source can run over either the in-process simulated
  * chain or a real JSON-RPC endpoint ([[JsonRpcFetcher]]) without
  * touching the ingest pipeline.
  *
  * A fetcher is opened per partition reader (and once on the driver for
  * head discovery) from a serializable [[FetcherConf]] — the fetcher
  * itself holds live resources (HTTP connections, caches) and never
  * crosses the driver/executor boundary.
  *
  * Implementations must tolerate concurrent [[ChainFetcher.transactionReceipt]]
  * calls: [[ChainFetch.envelope]] fans receipts out across a bounded
  * thread pool (the reference's `buffer_unordered(10)`,
  * `src/main.rs:204-227`).
  */
trait ChainFetcher extends AutoCloseable {
  /** I-2: highest block the node currently has (`eth_blockNumber`). */
  def blockNumber(): Long
  /** I-3: block with full transaction objects
    * (`eth_getBlockByNumber(n, full_tx=true)`); None when the node has
    * no block at this height (the reference's `Ok(None)` skip path,
    * `src/main.rs:134-139`) — never retried, unlike transport errors. */
  def blockWithTxs(n: Long): Option[WireBlock]
  /** Receipt for one tx (`eth_getTransactionReceipt`); None when the
    * node has none (tolerated downstream as status=null, no logs). */
  def transactionReceipt(txHash: String): Option[WireReceipt]
  /** All logs of the inclusive block range `[from, to]` in one call
    * (`eth_getLogs {fromBlock, toBlock}`) — the range strategy the
    * reference names "the highest-impact future optimization"
    * (`README.md:90`). Logs arrive block-scoped (block-level
    * `logIndex`, tagged with the observed `blockHash`); alignment back
    * into the per-tx envelope happens in [[ChainFetch.rangeEnvelopes]].
    * Throws when the node/strategy does not support range queries —
    * the caller opts in explicitly via `fetchStrategy=range`. */
  def logsInRange(from: Long, to: Long): Seq[WireRangeLog] =
    throw new UnsupportedOperationException("range log fetch unsupported")
  /** Receipt STATUS of every tx in block `n` in one call
    * (`eth_getBlockReceipts`). None = the node does not serve the
    * method → the range strategy falls back to the per-tx receipt
    * fan-out for status only (logs still come from the range call).
    * An empty map = the node has the block but no receipts for it
    * (status=null downstream, the receiptless-tolerance path). */
  def blockReceiptStatuses(n: Long): Option[Map[String, Option[Long]]] = None
  override def close(): Unit = ()
}

/** Serializable recipe for opening a [[ChainFetcher]] on whichever JVM
  * the partition lands on. */
trait FetcherConf extends Serializable {
  def open(): ChainFetcher
}

/** Block + embedded tx objects as they arrive off the wire — receipts
  * are NOT here (they are a separate N+1 fetch, exactly the reference's
  * two-phase shape). `value`/`gas` are decimal-string U256 already
  * (hex→decimal conversion happens at the wire boundary, in the
  * fetcher), `gas` being the TX-side gas field the reference persists
  * as the tx's gas column (`src/main.rs:265`) — which is why it
  * survives a missing receipt. */
case class WireTx(hash: String, index: Long, from: String, to: String,
                  value: String, gas: String)
case class WireBlock(number: Long, hash: String, parentHash: String,
                     timestamp: Long, txs: Seq[WireTx])
/** Receipt wire shape: the two fields the reference takes from it —
  * `status` (`src/main.rs:250-253`) and `logs` (`:274-295`). Topics
  * arrive as the raw array; positional split happens at assembly. */
case class WireReceipt(status: Option[Long], logs: Seq[WireLog])
case class WireLog(logIndex: Long, address: String, topics: Seq[String],
                   data: String)
/** One log as `eth_getLogs` returns it: block-scoped `logIndex` (the
  * position within the whole BLOCK, not within its tx — the schema
  * difference the reference's README warns needs "careful …  schema
  * alignment"), tagged with the `blockHash` it was observed on so a
  * reorg racing the range call cannot attach stale-branch logs to a
  * fresh block, and `removed` (true = the node itself flags the log as
  * reorged away). */
case class WireRangeLog(blockNumber: Long, blockHash: String, txHash: String,
                        logIndexInBlock: Long, address: String,
                        topics: Seq[String], data: String,
                        removed: Boolean = false)

object ChainFetch {

  /** The reference's retry policy (3 attempts, exponential backoff —
    * `src/main.rs:28-29,49,140-158`), parameterized so tests keep
    * millisecond backoffs where production uses seconds. Retries only
    * on exceptions; a successful None (absent block/receipt) returns
    * immediately. */
  def retry[T](maxAttempts: Int, baseBackoffMs: Long)(op: => T): T = {
    var attempt = 0
    var backoff = baseBackoffMs
    var out: Option[T] = None
    while (out.isEmpty) {
      attempt += 1
      try out = Some(op)
      catch {
        // An interrupt is a CANCELLATION (Spark's task reaper killing
        // the partition on query stop / speculative kill), never a
        // transient fetch failure — restore the flag and propagate
        // instead of sleeping through the backoff schedule.
        case e: InterruptedException =>
          Thread.currentThread().interrupt()
          throw e
        case _: Exception if attempt < maxAttempts =>
          Thread.sleep(backoff)
          backoff *= 2
      }
    }
    out.get
  }

  /** Fetch one block's full envelope: block+txs, then receipts fanned
    * out over at most `receiptConcurrency` threads (the reference's
    * `MAX_RECEIPT_CONCURRENT = 10` `buffer_unordered`,
    * `src/main.rs:26,204-227`). A receipt that still fails after all
    * retries degrades to None — the reference's `unwrap_or(None)`
    * (`src/main.rs:216-218`) — so one poisoned tx cannot sink its
    * block; an absent receipt lands as status=null with no logs.
    *
    * This is per-PARTITION work: at scale the cross-block parallelism
    * is Spark's executor fan-out (one partition per block), and this
    * pool only bounds the intra-block N+1 receipt burst against the
    * node, exactly like the reference. */
  def envelope(fetcher: ChainFetcher, n: Long, maxRetries: Int,
               baseBackoffMs: Long, receiptConcurrency: Int): Option[SimChain.SimBlock] =
    retry(maxRetries, baseBackoffMs)(fetcher.blockWithTxs(n)).map { b =>
      assemble(b, fanOutReceipts(fetcher, b, maxRetries, baseBackoffMs, receiptConcurrency))
    }

  /** The bounded per-tx receipt burst shared by both strategies: the
    * N+1 path takes full receipts (status + logs); the range path
    * reuses it as the STATUS fallback when the node lacks
    * `eth_getBlockReceipts`. */
  private def fanOutReceipts(fetcher: ChainFetcher, b: WireBlock, maxRetries: Int,
                             baseBackoffMs: Long, receiptConcurrency: Int): Map[String, Option[WireReceipt]] =
    if (b.txs.isEmpty) Map.empty
    else if (b.txs.size == 1 || receiptConcurrency <= 1)
      b.txs.map(t => t.hash -> fetchReceipt(fetcher, t.hash, maxRetries, baseBackoffMs)).toMap
    else {
      val pool = Executors.newFixedThreadPool(math.min(receiptConcurrency, b.txs.size))
      try {
        b.txs.map { t =>
          t.hash -> pool.submit(new Callable[Option[WireReceipt]] {
            override def call(): Option[WireReceipt] =
              fetchReceipt(fetcher, t.hash, maxRetries, baseBackoffMs)
          })
        }.map { case (h, fu) => h -> fu.get() }.toMap
      } finally {
        pool.shutdown()
        pool.awaitTermination(60, TimeUnit.SECONDS): Unit
      }
    }

  /** I-3 via the range strategy (`eth_getLogs`): ONE log call for the
    * whole inclusive block range `[from, toIncl]` + one block call and
    * one `eth_getBlockReceipts` status call per block — O(ranges +
    * blocks) RPCs where the N+1 path is O(blocks + txs). The receipt
    * N+1 survives only as the status fallback for nodes without
    * `eth_getBlockReceipts` (and even then the per-receipt payload
    * shrinks to a status bit; logs never ride receipts here).
    *
    * The "careful deduplication and schema alignment" the reference's
    * README calls out (`README.md:90`) is this method:
    *  - `removed=true` logs (node-flagged reorg casualties) drop first;
    *  - duplicates dedup on (blockNumber, blockHash, txHash,
    *    logIndexInBlock) — a node re-serving overlapping chunks cannot
    *    double-emit;
    *  - logs key by the (blockNumber, blockHash, txHash) they were
    *    OBSERVED at, so stale-branch logs keyed by an old hash never
    *    attach to a fresh block, and a lying node serving the SAME
    *    hash at two heights cannot merge logs across them (the N+1
    *    path gets this for free because receipts are fetched after
    *    the block; the range path must reconstruct it);
    *  - block-level `logIndex` re-indexes to the envelope's per-tx
    *    order (sort by block index within each tx, then 0..n-1).
    *
    * A reorg RACING the window is the one hazard keying alone cannot
    * absorb: stale-keyed logs falling away would leave fresh-branch
    * blocks persisted with silently EMPTY logs — data the N+1 path
    * cannot lose. So the window must prove the block and log views
    * describe ONE branch: blocks are fetched FIRST (their hashes pin
    * the branch), then the range logs, and the pair counts as stable
    * only if (a) no height carries log evidence exclusively for a
    * foreign hash (logs observed at n but none matching the fetched
    * block — extra stale/duplicate entries beside matching ones are
    * fine, the alignment drops them), (b) one head re-fetch after
    * the log call returns the same hash for the window's last present
    * block (any reorg touching the window rewrites its suffix,
    * including that block), and (c) the fetched blocks themselves are
    * parent-hash linked across every pair of CONSECUTIVE present
    * heights (`b.parentHash == previous.hash` — the same linkage rule
    * the ingester's reorg detection applies, reference
    * `src/main.rs:168-199`). (c) closes the remaining corner (a)+(b)
    * miss: a reorg landing mid-BLOCK-fetch leaves the window's prefix
    * on the stale branch and its suffix on the fresh one — the suffix
    * satisfies the head re-check, and if the fresh branch happens to
    * carry no logs at the stale heights there is no foreign-only log
    * evidence either — but the seam between the branches always
    * breaks parent linkage. (Heights absent from the node interrupt
    * the chain, so linkage is only checkable between ADJACENT present
    * heights; a mid-fetch reorg within such a gap still trips (a)/(b)
    * or lands wholly on one branch.) An unstable window falls back to
    * the per-block N+1 path — receipts carry authoritative logs —
    * costing O(txs) for that one rare window instead of a silent
    * hole.
    *
    * Returns one envelope per block present on the node; absent
    * heights skip exactly like the per-block path (I-14). */
  def rangeEnvelopes(fetcher: ChainFetcher, from: Long, toIncl: Long,
                     maxRetries: Int, baseBackoffMs: Long,
                     receiptConcurrency: Int): Seq[SimChain.SimBlock] = {
    if (toIncl < from) return Nil
    val blocks = (from to toIncl).flatMap(n =>
      retry(maxRetries, baseBackoffMs)(fetcher.blockWithTxs(n)))
    val live = retry(maxRetries, baseBackoffMs)(fetcher.logsInRange(from, toIncl))
      .filterNot(_.removed)
    val hashesAt: Map[Long, Set[String]] =
      live.groupBy(_.blockNumber).map { case (n, ls) => n -> ls.map(_.blockHash).toSet }
    val foreignOnlyEvidence = blocks.exists { b =>
      val hs = hashesAt.getOrElse(b.number, Set.empty)
      hs.nonEmpty && !hs.contains(b.hash)
    }
    val parentLinked = blocks.zip(blocks.drop(1)).forall { case (prev, b) =>
      b.number != prev.number + 1 || b.parentHash == prev.hash
    }
    val headStable = blocks.lastOption.forall { last =>
      retry(maxRetries, baseBackoffMs)(fetcher.blockWithTxs(last.number))
        .exists(_.hash == last.hash)
    }
    if (foreignOnlyEvidence || !parentLinked || !headStable)
      return (from to toIncl).flatMap(n =>
        envelope(fetcher, n, maxRetries, baseBackoffMs, receiptConcurrency))
    // keyed by (blockNumber, blockHash, txHash), number included: a
    // lying/buggy node serving the SAME hash at two heights (a hash
    // "collision" cannot happen honestly — the hash identifies the
    // block) must not get its logs merged across heights; each height
    // keeps only the logs observed at that height for that hash.
    // Duplicates with conflicting payloads at one key keep the first
    // occurrence (deterministic in response order) — the honest-node
    // case is byte-identical duplicates from overlapping chunks.
    val byTx: Map[(Long, String, String), Seq[WireLog]] = live
      .distinctBy(l => (l.blockNumber, l.blockHash, l.txHash, l.logIndexInBlock))
      .groupBy(l => (l.blockNumber, l.blockHash, l.txHash))
      .map { case (k, ls) =>
        k -> ls.sortBy(_.logIndexInBlock).zipWithIndex.map { case (l, i) =>
          WireLog(i, l.address, l.topics, l.data)
        }
      }
    blocks.map { b =>
      // a persistently ERRORING eth_getBlockReceipts (anything but the
      // clean method-absent None) degrades to the per-tx status
      // fallback exactly like the absent method — the fallback exists,
      // so a broken aggregate endpoint must not sink the partition
      val statuses: Map[String, Option[Long]] =
        (try fetchBlockStatuses(fetcher, b.number, maxRetries, baseBackoffMs)
         catch { case _: Exception => None }).getOrElse {
          fanOutReceipts(fetcher, b, maxRetries, baseBackoffMs, receiptConcurrency)
            .map { case (h, r) => h -> r.flatMap(_.status) }
        }
      SimChain.SimBlock(b.number, b.hash, b.parentHash, b.timestamp,
        b.txs.sortBy(_.index).map { t =>
          SimChain.SimTx(t.hash, t.index, t.from, t.to, t.value, t.gas,
            statuses.getOrElse(t.hash, None),
            byTx.getOrElse((b.number, b.hash, t.hash), Nil).map { l =>
              SimChain.SimLog(l.logIndex, l.address,
                l.topics.lift(0).orNull, l.topics.lift(1), l.topics.lift(2),
                l.topics.lift(3), l.data)
            })
        })
    }
  }

  /** `eth_getBlockReceipts` with the standard retry; an
    * unsupported-method signal (None) is NOT retried — it is a stable
    * property of the node, and the caller's per-tx fallback takes over. */
  private def fetchBlockStatuses(fetcher: ChainFetcher, n: Long, maxRetries: Int,
                                 baseBackoffMs: Long): Option[Map[String, Option[Long]]] =
    retry(maxRetries, baseBackoffMs)(fetcher.blockReceiptStatuses(n))

  private def fetchReceipt(fetcher: ChainFetcher, txHash: String,
                           maxRetries: Int, baseBackoffMs: Long): Option[WireReceipt] =
    try retry(maxRetries, baseBackoffMs)(fetcher.transactionReceipt(txHash))
    catch { case _: Exception => None } // unwrap_or(None): block survives

  /** Join block-side tx fields with receipt-side status/logs into the
    * nested envelope the ingester flattens — the in-memory analog of
    * the reference's per-block insert loop (`src/main.rs:240-295`).
    * Topics split positionally into topic0..3 (`src/db.rs:84-89`). */
  def assemble(b: WireBlock, receipts: Map[String, Option[WireReceipt]]): SimChain.SimBlock =
    SimChain.SimBlock(b.number, b.hash, b.parentHash, b.timestamp,
      b.txs.sortBy(_.index).map { t =>
        val receipt = receipts.getOrElse(t.hash, None)
        SimChain.SimTx(t.hash, t.index, t.from, t.to, t.value, t.gas,
          receipt.flatMap(_.status),
          receipt.map(_.logs).getOrElse(Nil).map { l =>
            SimChain.SimLog(l.logIndex, l.address,
              l.topics.lift(0).orNull, l.topics.lift(1), l.topics.lift(2),
              l.topics.lift(3), l.data)
          })
      })

  /** 0x-hex quantity → Long (block numbers, timestamps, indexes). */
  def hexToLong(s: String): Long = java.lang.Long.parseLong(strip(s), 16)

  /** 0x-hex quantity → decimal string, full U256 range — the storage
    * contract for money/gas columns (TEXT, `init.sql:18-20,34-38`). */
  def hexToDec(s: String): String = new java.math.BigInteger(strip(s), 16).toString

  def longToHex(n: Long): String = "0x" + java.lang.Long.toHexString(n)

  def decToHex(s: String): String = "0x" + new java.math.BigInteger(s).toString(16)

  private def strip(s: String): String = {
    val t = s.trim
    val body = if (t.startsWith("0x") || t.startsWith("0X")) t.substring(2) else t
    if (body.isEmpty) "0" else body
  }
}
