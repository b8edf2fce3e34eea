package graft.sources

import java.nio.charset.StandardCharsets
import java.util
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.connector.catalog.TableProvider
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 micro-batch source over a REAL Ethereum JSON-RPC
  * endpoint — the production twin of `graft-simchain`, speaking the
  * wire protocol the reference's ethers provider speaks
  * (`src/main.rs:96-106` `get_block_number`, `:129`
  * `get_block_with_txs`, `:204-227` receipt fan-out):
  *
  *  - `eth_blockNumber`                     → head discovery per trigger
  *  - `eth_getBlockByNumber(n, full_tx)`    → one call per block partition
  *  - `eth_getTransactionReceipt(tx_hash)`  → N+1 fan-out, bounded
  *    concurrency (MAX_RECEIPT_CONCURRENT analog), each with the
  *    3-attempt exponential-backoff retry; a receipt that exhausts its
  *    retries degrades to status=null+no-logs (`unwrap_or(None)`,
  *    `src/main.rs:216-218`) rather than sinking the block
  *
  * All batching/reorg/repair semantics are inherited from
  * [[ChainMicroBatchStream]] — identical to the sim source, so every
  * ingest guarantee proven there (bounded batches, lookback re-serve,
  * O(log depth) deep-reorg repair, exactly-once append) holds over the
  * real wire unchanged.
  *
  * Scale shape: one partition per block means a 1000-executor cluster
  * backfilling history issues 1000 concurrent block fetches, each with
  * its own bounded receipt burst — tune `blocksPerBatch` (and node-side
  * rate limits) accordingly; the per-call work is pure I/O + one row of
  * assembly, so the source is network-bound by design.
  *
  * Options: `rpcUrl` (required), plus the shared dials —
  * `startBlock`, `blocksPerBatch`, `reorgLookback`, `repairFile`,
  * `maxRetries` (default 3), `baseBackoffMs` (default 250 here; the
  * reference uses 2 s — `src/main.rs:29`), `receiptConcurrency`
  * (default 10), `connectTimeoutMs`, `readTimeoutMs`.
  *
  * Usage: `spark.readStream.format("graft-rpcchain")
  *   .option("rpcUrl", "http://127.0.0.1:8545").load()`
  */
class RpcChainSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-rpcchain"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SimChainSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ChainSourceTable(properties, new RpcChainMicroBatchStream(_))
}

class RpcChainMicroBatchStream(options: CaseInsensitiveStringMap)
    extends ChainMicroBatchStream(options) {
  private val rpcUrl = options.get("rpcUrl")
  require(rpcUrl != null, "graft-rpcchain requires option rpcUrl")
  private val conf = RpcFetcherConf(rpcUrl,
    options.getLong("connectTimeoutMs", 2000L).toInt,
    options.getLong("readTimeoutMs", 10000L).toInt)
  override protected val baseBackoffMs: Long = options.getLong("baseBackoffMs", 250L)

  // driver-side fetcher for head discovery; partitions open their own
  private lazy val headFetcher = conf.open()

  /** Head poll with the same retry the reference's loop applies to
    * get_block_number failures (`src/main.rs:96-106` sleeps and
    * retries the cycle; here a trigger retries in-place — a node down
    * past all retries fails the query, which is the honest outcome
    * for a source with no data to serve). */
  override protected def chainHead(): Long =
    ChainFetch.retry(maxRetries, baseBackoffMs)(headFetcher.blockNumber())

  override protected def fetcherConf(): FetcherConf = conf

  override def stop(): Unit = headFetcher.close()
}

/** Serializable recipe for a [[JsonRpcFetcher]]. */
case class RpcFetcherConf(url: String, connectTimeoutMs: Int = 2000,
                          readTimeoutMs: Int = 10000) extends FetcherConf {
  override def open(): ChainFetcher = new JsonRpcFetcher(this)
}

/** Blocking HTTP JSON-RPC 2.0 client over `java.net.HttpURLConnection`
  * — deliberately dependency-free (the classpath rule) and
  * per-call-connection (HttpURLConnection keep-alive pools under the
  * hood; partition readers are short-lived). Thread-safe: state is one
  * ObjectMapper (thread-safe after config) and an id counter, so the
  * receipt fan-out can share one fetcher across its pool.
  *
  * Error contract: non-200 responses, transport failures, and JSON-RPC
  * `error` members all throw `IOException` — the retryable category
  * ([[ChainFetch.retry]]); `result: null` returns None — the
  * non-retryable "node has no such block/receipt" (`Ok(None)`).
  */
class JsonRpcFetcher(conf: RpcFetcherConf) extends ChainFetcher {
  import ChainFetch.{hexToDec, hexToLong, longToHex}
  private val mapper = new ObjectMapper()
  private val nextId = new java.util.concurrent.atomic.AtomicLong(1)

  private def call(method: String, params: String): JsonNode = {
    val body =
      s"""{"jsonrpc":"2.0","id":${nextId.getAndIncrement()},"method":"$method","params":$params}"""
    // no conn.disconnect() anywhere: fully reading and closing the
    // streams returns the socket to the JVM keep-alive pool (the reuse
    // the per-call-connection design depends on); disconnect() would
    // tear it down and pay a fresh TCP (+TLS) handshake for every call
    // of the N+1 receipt fan-out. A transport failure mid-call leaves
    // a broken socket the pool discards on its own.
    val conn = new java.net.URL(conf.url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setConnectTimeout(conf.connectTimeoutMs)
    conn.setReadTimeout(conf.readTimeoutMs)
    conn.setRequestProperty("Content-Type", "application/json")
    conn.setDoOutput(true)
    val out = conn.getOutputStream
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val code = conn.getResponseCode
    if (code != 200) {
      // drain + close the error body so the socket stays reusable
      Option(conn.getErrorStream).foreach { es =>
        try { es.readAllBytes(); () } finally es.close()
      }
      throw new java.io.IOException(s"$method: HTTP $code from ${conf.url}")
    }
    val in = conn.getInputStream
    val root =
      try mapper.readTree(in) finally in.close()
    val err = root.get("error")
    if (err != null && !err.isNull)
      throw new JsonRpcError(method,
        Option(err.get("code")).filterNot(_.isNull).map(_.asInt()).getOrElse(0),
        err.toString)
    // a response carrying NEITHER result NOR error is malformed — it
    // must throw (retryable), never read as the legitimate
    // `result: null` "node has no such block/receipt" signal
    if (!root.has("result"))
      throw new java.io.IOException(s"$method: malformed response (no result/error member)")
    root.get("result")
  }

  private def isNull(n: JsonNode): Boolean = n == null || n.isNull

  /** A REQUIRED textual wire field. Wrong-type and missing fields
    * throw (the retryable IOException category) instead of silently
    * degrading: Jackson's `asText()` renders a missing/object/array
    * node as ""/"{...}", which [[ChainFetch.hexToLong]] would read as
    * 0 or garbage — a silently corrupted block number/hash is the one
    * failure mode worse than a loud one. Ethereum's wire encodes every
    * quantity and hash as a 0x-hex STRING, so textual-or-throw is
    * exactly the spec. */
  private def req(n: JsonNode, field: String): String =
    if (isNull(n) || !n.isTextual)
      throw new java.io.IOException(
        s"malformed RPC field '$field': ${String.valueOf(n)}")
    else n.asText()

  /** An OPTIONAL wire field (nullable on the wire — tx `to`, receipt
    * `status`): absent/null → None, present-but-wrong-type → throw. */
  private def opt(n: JsonNode, field: String): Option[String] =
    if (isNull(n)) None else Some(req(n, field))

  override def blockNumber(): Long =
    hexToLong(req(call("eth_blockNumber", "[]"), "blockNumber result"))

  override def blockWithTxs(n: Long): Option[WireBlock] = {
    val r = call("eth_getBlockByNumber", s"""["${longToHex(n)}",true]""")
    if (isNull(r)) None
    else {
      val txs = iter(r.get("transactions")).map { t =>
        WireTx(req(t.get("hash"), "tx.hash"),
          hexToLong(req(t.get("transactionIndex"), "tx.transactionIndex")),
          req(t.get("from"), "tx.from"),
          opt(t.get("to"), "tx.to").orNull, // contract creation: to == null
          hexToDec(req(t.get("value"), "tx.value")),
          hexToDec(req(t.get("gas"), "tx.gas")))
      }
      Some(WireBlock(hexToLong(req(r.get("number"), "block.number")),
        req(r.get("hash"), "block.hash"),
        req(r.get("parentHash"), "block.parentHash"),
        hexToLong(req(r.get("timestamp"), "block.timestamp")), txs))
    }
  }

  override def transactionReceipt(txHash: String): Option[WireReceipt] = {
    val r = call("eth_getTransactionReceipt", s"""["$txHash"]""")
    if (isNull(r)) None
    else {
      val logs = iter(r.get("logs")).map { l =>
        WireLog(hexToLong(req(l.get("logIndex"), "log.logIndex")),
          req(l.get("address"), "log.address"),
          iter(l.get("topics")).map(tn => req(tn, "log.topic")),
          opt(l.get("data"), "log.data").getOrElse(""))
      }
      // pre-Byzantium receipts have no status field (the reference's
      // Option<U64> — models.rs MyTransaction.status)
      Some(WireReceipt(opt(r.get("status"), "receipt.status").map(hexToLong), logs))
    }
  }

  /** `eth_getLogs {fromBlock, toBlock}` — the range strategy's one
    * log call per range. `logIndex` is the block-level index and
    * `removed` the node's own reorg flag; both survive into
    * [[WireRangeLog]] for [[ChainFetch.rangeEnvelopes]]'s alignment. */
  override def logsInRange(from: Long, to: Long): Seq[WireRangeLog] = {
    val r = call("eth_getLogs",
      s"""[{"fromBlock":"${longToHex(from)}","toBlock":"${longToHex(to)}"}]""")
    iter(r).map { l =>
      WireRangeLog(hexToLong(req(l.get("blockNumber"), "log.blockNumber")),
        req(l.get("blockHash"), "log.blockHash"),
        req(l.get("transactionHash"), "log.transactionHash"),
        hexToLong(req(l.get("logIndex"), "log.logIndex")),
        req(l.get("address"), "log.address"),
        iter(l.get("topics")).map(tn => req(tn, "log.topic")),
        opt(l.get("data"), "log.data").getOrElse(""),
        Option(l.get("removed")).exists(n => !n.isNull && n.asBoolean(false)))
    }
  }

  // a node that answered eth_getBlockReceipts with method-not-found
  // once will do so forever — remember and stop asking
  @volatile private var blockReceiptsUnsupported = false

  /** `eth_getBlockReceipts` → txHash → status. None when the node
    * does not serve the method (JSON-RPC -32601), which callers treat
    * as "fall back to per-tx receipts for status" — a stable node
    * property, cached so only the first block pays the probe. */
  override def blockReceiptStatuses(n: Long): Option[Map[String, Option[Long]]] = {
    if (blockReceiptsUnsupported) return None
    val r =
      try call("eth_getBlockReceipts", s"""["${longToHex(n)}"]""")
      catch {
        case e: JsonRpcError if e.code == -32601 =>
          blockReceiptsUnsupported = true
          return None
      }
    if (isNull(r)) Some(Map.empty)
    else Some(iter(r).map { rc =>
      req(rc.get("transactionHash"), "receipt.transactionHash") ->
        opt(rc.get("status"), "receipt.status").map(hexToLong)
    }.toMap)
  }

  private def iter(n: JsonNode): Seq[JsonNode] =
    if (isNull(n)) Nil
    else { val b = Seq.newBuilder[JsonNode]; n.forEach(e => b += e); b.result() }

  private def text(n: JsonNode): Option[String] =
    if (isNull(n)) None else Some(n.asText())
}

/** JSON-RPC `error` member as an exception: still the retryable
  * IOException category ([[ChainFetch.retry]]), but carrying the code
  * so capability probes can distinguish method-not-found (-32601, a
  * stable node property — never retried) from transient errors. */
class JsonRpcError(method: String, val code: Int, detail: String)
    extends java.io.IOException(s"$method: RPC error $detail")
