package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch building blocks of the reference's ingest path
  * (`src/main.rs:191-311`, `src/db.rs:34-50,80-196`).
  */
object Ingest {

  /** Q-20: idempotent append — the reference's
    * `INSERT ... ON CONFLICT (key) DO NOTHING` (`src/db.rs:97,136`).
    * In-batch dedup + left-anti join against existing keys; at scale
    * the anti-join shuffles only the incoming batch against the keyed
    * store (or broadcasts the batch when it is small, which Catalyst
    * picks via AQE).
    */
  def idempotentAppend(existing: DataFrame, incoming: DataFrame,
                       keys: Seq[String]): DataFrame = {
    // anti-join FIRST, dedup only the survivors: rows whose key is
    // already stored never pay the representative-pick aggregate
    // (dropDuplicates over non-key string columns plans a
    // SortAggregate of first()s — the dominant stage of the old
    // shape), so the common ingest case (a mostly-duplicate retry
    // batch) degenerates to one key-only anti-join. The result set is
    // unchanged: the per-key representative is arbitrary among
    // incoming rows under either order.
    val fresh = incoming
      .join(existing.select(keys.map(col): _*), keys, "left_anti")
      .dropDuplicates(keys)
    existing.unionByName(fresh)
  }

  /** Q-21 / I-10: reorg retraction — delete the suffix
    * `block_number >= fork` (`src/db.rs:34-50`). On an immutable
    * snapshot this is a filter; [[ChainStore]] makes it a physical
    * partition-level rewrite.
    */
  def rollback(table: DataFrame, forkHeight: Long): DataFrame =
    table.filter(col("block_number") < forkHeight)

  /** I-9: reorg detection — does the stored hash at `height-1` match
    * the incoming block's parent_hash (`src/main.rs:166-189`)?
    * Returns None when the parent is absent (cold start / gap →
    * reference treats as OK, `src/main.rs:171-175`).
    */
  def reorgDetected(blocks: DataFrame, height: Long, parentHash: String): Option[Boolean] =
    blocks.filter(col("block_number") === height - 1)
      .select(col("block_hash")).limit(1).collect()
      .headOption.map(_.getString(0).toLowerCase != parentHash.toLowerCase)

  /** I-7/I-8: flatten a nested block envelope into the three tables —
    * the reference's hand-written loops (`src/main.rs:240-297`)
    * become two `explode`s. `envelopes` schema:
    * block cols + `transactions array<struct<..., logs array<struct>>>`.
    */
  def flatten(envelopes: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val blocks = envelopes.drop("transactions")
    val txs = envelopes
      .select(col("block_number"), col("block_hash"),
        explode(col("transactions")).as("t"))
      .select(col("block_number"), col("block_hash"), col("t.*"))
    val logs = txs
      .select(col("block_number"), col("block_hash"), col("tx_hash"),
        col("tx_index_in_block"), explode(col("logs")).as("l"))
      .select(col("block_number"), col("block_hash"),
        col("tx_hash").as("transaction_hash"), col("tx_index_in_block"), col("l.*"))
    (blocks, txs.drop("logs"), logs)
  }
}
