package graft.api

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Typed wire models of the reference's REST responses
  * (`src/api_models.rs:50-76`, `src/models.rs:10-74`) — what a caller
  * of `GET /stats`, `GET /block/{id}`, `GET /transaction/{hash}`
  * receives, minus the HTTP frame. */
final case class IndexerStats(
    blocksCount: Long, transactionsCount: Long, logsCount: Long,
    lastProcessedBlock: Option[Long], chainHeadAtLastPoll: Option[Long],
    ingestionLag: Option[Long])

/** Block gas columns are U256 decimal strings, the reference's storage
  * contract (`init.sql:18-20`): TEXT survives the full 78-digit u256
  * range that BIGINT/NUMERIC(38) cannot. */
final case class BlockInfo(
    blockNumber: Long, blockHash: String, parentHash: String,
    timestamp: Long, miner: Option[String], gasUsed: Option[String],
    gasLimit: Option[String], baseFeePerGas: Option[String],
    txCount: Option[Long])

final case class TransactionInfo(
    txHash: String, blockNumber: Long, blockHash: String,
    txIndexInBlock: Option[Long], fromAddress: String,
    toAddress: Option[String], value: String, gasUsed: Option[String],
    gasLimit: Option[String], gasPrice: Option[String],
    maxFeePerGas: Option[String], maxPriorityFeePerGas: Option[String],
    inputData: Option[String], nonce: Option[Long], status: Option[Long])

/** The reference's complete serving surface as one typed facade — the
  * four endpoints of `src/api.rs:393-401` over any source of the three
  * EVM tables (derived fixtures or a [[graft.ingest.ChainStore]]).
  *
  * Error semantics mirror the reference: invalid identifiers and
  * missing rows are `None` (its 400/404, `src/api.rs:65-74,342-346`);
  * only real failures throw (its 500).
  *
  * Serving caveat (SURVEY §7.4): Spark job-launch latency makes a
  * COLD lookup ~100 ms regardless of scan pruning — inherent to the
  * engine choice. Repeats are a different story: the optional
  * [[LookupCache]] (default-on in both factories) answers a repeated
  * point lookup in-process with zero Spark jobs, invalidating
  * wholesale whenever the backing store's mutation version moves
  * (append or reorg rollback — a rollback can change the answer at an
  * existing height, so per-key invalidation would be wrong).
  */
final class EvmApi(blocks: DataFrame, transactions: DataFrame, logs: DataFrame,
                   cache: Option[LookupCache] = None) {

  private def memo[T](kind: String, key: String)(compute: => T): T =
    cache match {
      case Some(c) => c.getOrCompute(kind, key)(compute)
      case None => compute
    }

  /** `GET /stats` (`src/api.rs:242-267`). */
  def stats(): IndexerStats = {
    val r = Lookups.stats(blocks, transactions, logs).collect().head
    def optLong(i: Int): Option[Long] = if (r.isNullAt(i)) None else Some(r.getLong(i))
    IndexerStats(r.getLong(0), r.getLong(1), r.getLong(2),
      optLong(3), optLong(4), optLong(5))
  }

  /** `POST /logs` (`src/api.rs:111-228`): one filtered page + resume
    * cursor. */
  def logsPage(filter: GetLogsFilter): LogsResponse =
    LogsQuery.run(logs, filter)

  /** `GET /block/{identifier}` (`src/api.rs:284-320`): 0x-hash or
    * decimal height; None = 404 (or 400 on an unparsable identifier).
    *
    * Hash-vs-number routing is decided on the RAW identifier —
    * `api.rs:290` checks `starts_with("0x")` before any case-fold, so
    * `'0X…'` is NOT a hash (the reference rejects it; here it falls
    * through to the number parse and misses). Only an ACCEPTED `0x`
    * identifier has its body lowercased, and that normalized form is
    * both the memo key and the value handed to [[Lookups]] — so the
    * cached answer always agrees with what a fresh compute of the
    * same key would return ('0xAB…' and '0xab…' are one key AND one
    * answer; keying on a normalized form while computing on the raw
    * one would let a mixed-case miss poison the entry for the valid
    * lowercase spelling). */
  def block(identifier: String): Option[BlockInfo] = {
    val id = if (identifier.startsWith("0x")) identifier.toLowerCase else identifier
    memo("block", id) {
    Lookups.blockByIdentifier(blocks, id)
      .flatMap(_.collect().headOption).map { r =>
        def get[T](name: String): Option[T] =
          if (!r.schema.fieldNames.contains(name) || r.isNullAt(r.fieldIndex(name))) None
          else Some(r.getAs[T](name))
        BlockInfo(
          r.getAs[Long]("block_number"), r.getAs[String]("block_hash"),
          r.getAs[String]("parent_hash"), r.getAs[Long]("timestamp"),
          get[String]("miner"), get[String]("gas_used"),
          get[String]("gas_limit"), get[String]("base_fee_per_gas"),
          get[Long]("tx_count"))
      }
    }
  }

  /** `GET /transaction/{tx_hash}` (`src/api.rs:338-387`). Same
    * raw-prefix-then-fold contract as [[block]] (`api.rs:342-346`
    * validates `starts_with("0x")` on the raw param): a `'0X…'` hash
    * never reaches the lookup; an accepted one is lowercased once and
    * that form is both the memo key and the computed answer's key. */
  def transaction(txHash: String): Option[TransactionInfo] = {
    val id = if (txHash.startsWith("0x")) txHash.toLowerCase else txHash
    memo("tx", id) {
    Lookups.txByHash(transactions, id)
      .flatMap(_.collect().headOption).map { r =>
        def get[T](name: String): Option[T] =
          if (!r.schema.fieldNames.contains(name) || r.isNullAt(r.fieldIndex(name))) None
          else Some(r.getAs[T](name))
        TransactionInfo(
          r.getAs[String]("tx_hash"), r.getAs[Long]("block_number"),
          r.getAs[String]("block_hash"), get[Long]("tx_index_in_block"),
          r.getAs[String]("from_address"), get[String]("to_address"),
          r.getAs[String]("value"), get[String]("gas_used"),
          get[String]("gas_limit"), get[String]("gas_price"),
          get[String]("max_fee_per_gas"), get[String]("max_priority_fee_per_gas"),
          get[String]("input_data"), get[Long]("nonce"), get[Long]("status"))
      }
    }
  }
}

object EvmApi {
  /** Facade over the derived fixture tables — immutable source, so the
    * lookup memo never needs invalidating (version constant). */
  def onFixtures(spark: SparkSession, sfDir: String): EvmApi =
    new EvmApi(
      graft.evm.EvmDerive.blocks(spark, sfDir),
      graft.evm.EvmDerive.transactions(spark, sfDir),
      graft.evm.EvmDerive.logs(spark, sfDir),
      Some(new LookupCache()))

  /** Facade over an ingested [[graft.ingest.ChainStore]] — the serving
    * side of the reference's concurrent ingest+serve design (I-13).
    * The lookup memo invalidates on the store's in-process mutation
    * version, so a reorg rollback is visible on the very next
    * request. */
  def onStore(store: graft.ingest.ChainStore): Option[EvmApi] =
    onStoreWith(store, new LookupCache(version = () => store.mutationCount))

  private def onStoreWith(store: graft.ingest.ChainStore,
                          cache: LookupCache): Option[EvmApi] =
    for {
      b <- store.read("blocks")
      t <- store.read("transactions")
      l <- store.read("logs")
    } yield new EvmApi(b, t, l, Some(cache))

  /** The live-serving provider for [[RestServer]]: a FRESH facade per
    * request (fresh parquet listing, so appends and rollback rewrites
    * are visible — a fixed DataFrame freezes its file index at
    * construction) sharing ONE version-aware lookup memo across
    * requests. Without the shared memo, per-request facades would
    * each allocate a cold cache and the repeat-lookup win would
    * never materialize. Throws if the store has no tables yet —
    * serve after the first committed batch, like the reference's API
    * server over an initialized schema. */
  def providerOnStore(store: graft.ingest.ChainStore,
                      cache: LookupCache): () => EvmApi =
    () => onStoreWith(store, cache).getOrElse(
      throw new IllegalStateException("chain store has no tables yet"))

  def providerOnStore(store: graft.ingest.ChainStore): () => EvmApi =
    providerOnStore(store, new LookupCache(version = () => store.mutationCount))
}
