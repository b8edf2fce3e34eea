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
  * Serving caveat (SURVEY §7.4): Spark job-launch latency makes this a
  * batch-analytics surface, not a sub-millisecond point-lookup store —
  * callers needing the reference's indexed-lookup latency put these
  * DataFrames behind `.cache()` or a key-value projection.
  */
final class EvmApi(blocks: DataFrame, transactions: DataFrame, logs: DataFrame) {

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
    * decimal height; None = 404 (or 400 on an unparsable identifier). */
  def block(identifier: String): Option[BlockInfo] =
    Lookups.blockByIdentifier(blocks, identifier)
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

  /** `GET /transaction/{tx_hash}` (`src/api.rs:338-387`). */
  def transaction(txHash: String): Option[TransactionInfo] =
    Lookups.txByHash(transactions, txHash)
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

object EvmApi {
  /** Facade over the derived fixture tables. */
  def onFixtures(spark: SparkSession, sfDir: String): EvmApi =
    new EvmApi(
      graft.evm.EvmDerive.blocks(spark, sfDir),
      graft.evm.EvmDerive.transactions(spark, sfDir),
      graft.evm.EvmDerive.logs(spark, sfDir))

  /** Facade over an ingested [[graft.ingest.ChainStore]] — the serving
    * side of the reference's concurrent ingest+serve design (I-13). */
  def onStore(store: graft.ingest.ChainStore): Option[EvmApi] =
    for {
      b <- store.read("blocks")
      t <- store.read("transactions")
      l <- store.read("logs")
    } yield new EvmApi(b, t, l)
}
