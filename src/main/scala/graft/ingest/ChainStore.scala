package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed chain store: the reference's PostgreSQL tables
  * (`blocks` / `transactions` / `logs`, `init.sql:13-63`) re-hosted on
  * immutable columnar storage.
  *
  * Physical design (the Spark substitute for the reference's 11
  * B-tree indexes, `init.sql:24,44-46,66-74`): each table is
  * partitioned by `bucket = block_number div bucketSize`, rows within
  * files arrive in block order, so block-range predicates prune at two
  * levels (partition dirs, then parquet row-group min/max). At 100 TB
  * this is the layout that keeps the flagship range+cursor queries
  * from scanning the chain.
  *
  * Reorg retraction (`src/db.rs:34-50`) on immutable files = delete
  * whole partitions above the fork bucket + rewrite the one straddling
  * bucket via temp-write-then-swap — O(bucketSize) work per reorg,
  * independent of chain length.
  */
class ChainStore(spark: SparkSession, root: String, bucketSize: Long = 100L) {
  require(bucketSize > 0)

  val Tables = Seq("blocks", "transactions", "logs")
  private def tablePath(t: String) = s"$root/$t"
  private val keyOf = Map("blocks" -> "block_hash", "transactions" -> "tx_hash", "logs" -> "id")

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(table: String): Boolean = fs.exists(new Path(tablePath(table)))

  /** Read a table (without the physical bucket column). */
  def read(table: String): Option[DataFrame] =
    if (exists(table)) Some(spark.read.parquet(tablePath(table)).drop("bucket"))
    else None

  private def withBucket(df: DataFrame): DataFrame =
    df.withColumn("bucket", expr(s"block_number div $bucketSize"))

  /** I-12: checkpoint state — max ingested height (None on empty store). */
  def lastSyncedBlock: Option[Long] =
    read("blocks").flatMap { b =>
      b.agg(max(col("block_number"))).collect().headOption
        .flatMap(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    }

  /** Q-10: stored hash at a height. */
  def hashAt(height: Long): Option[String] =
    read("blocks").flatMap { b =>
      b.filter(col("block_number") === height).select(col("block_hash"))
        .limit(1).collect().headOption.map(_.getString(0))
    }

  /** Q-20 / I-11: idempotent append of one flattened batch. The
    * existing-keys anti-join scans only the block range the batch
    * touches (partition pruning on bucket), so the append cost is
    * O(batch), not O(store). */
  def append(blocks: DataFrame, transactions: DataFrame, logs: DataFrame): Unit = {
    val dfs = Map("blocks" -> blocks, "transactions" -> transactions, "logs" -> logs)
    dfs.foreach { case (t, incoming) =>
      val key = keyOf(t)
      val deduped = incoming.dropDuplicates(key)
      val minB = deduped.agg(min(col("block_number"))).collect().head
      val fresh = if (minB.isNullAt(0)) deduped else {
        if (exists(t)) {
          // keep the physical `bucket` column in the overlap scan so the
          // predicate prunes partition *directories*, not just row
          // groups — at chain length N this reads O(batch) partitions
          val lo = minB.getLong(0)
          val overlap = spark.read.parquet(tablePath(t))
            .filter(col("bucket") >= lo / bucketSize && col("block_number") >= lo)
            .select(col(key))
          deduped.join(overlap, Seq(key), "left_anti")
        } else deduped
      }
      // sort within files by (block_number, key) — the substitute for
      // the reference's composite B-trees: row-group min/max stats stay
      // tight, so range + cursor predicates prune inside partitions too
      withBucket(fresh)
        .sortWithinPartitions(col("block_number"), col(key))
        .write.mode(SaveMode.Append)
        // bloom filter on the idempotency/lookup key: the anti-join and
        // point lookups (Q-13/Q-14) skip row groups without the key
        .option(s"parquet.bloom.filter.enabled#$key", "true")
        .partitionBy("bucket").parquet(tablePath(t))
    }
  }

  /** Q-21 / I-10: delete every row with `block_number >= forkHeight`
    * across all tables, children first (`src/db.rs:34-50`). */
  def rollback(forkHeight: Long): Unit = {
    val forkBucket = forkHeight / bucketSize
    // children first: logs, transactions, then blocks
    Seq("logs", "transactions", "blocks").foreach { t =>
      if (exists(t)) {
        val dir = new Path(tablePath(t))
        val parts = fs.listStatus(dir).map(_.getPath)
          .filter(_.getName.startsWith("bucket="))
        parts.foreach { p =>
          val b = p.getName.stripPrefix("bucket=").toLong
          if (b > forkBucket) {
            fs.delete(p, true)
          } else if (b == forkBucket) {
            val kept = spark.read.parquet(p.toString)
              .filter(col("block_number") < forkHeight)
            val tmp = new Path(dir, s".tmp-rollback-bucket-$b")
            if (kept.isEmpty) fs.delete(p, true)
            else {
              kept.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
              fs.delete(p, true)
              fs.rename(tmp, p)
            }
          }
        }
      }
    }
  }

  /** Small-file compaction: every micro-batch append leaves one file
    * per bucket it touched, so a bucket ingested across B cycles holds
    * B small files — the classic streaming-sink problem at scale.
    * Rewrites any multi-file bucket into one sorted, bloom-filtered
    * file via temp-write-then-swap (same atomicity discipline as
    * [[rollback]]). Run periodically (e.g. every N batches or from a
    * maintenance job); readers between swap steps see either the old
    * or the new complete bucket, never a partial one. */
  def compact(table: String): Unit = {
    if (exists(table)) {
      val key = keyOf(table)
      val dir = new Path(tablePath(table))
      fs.listStatus(dir).map(_.getPath)
        .filter(_.getName.startsWith("bucket=")).foreach { p =>
          val nFiles = fs.listStatus(p)
            .count(s => s.getPath.getName.endsWith(".parquet"))
          if (nFiles > 1) {
            val rows = spark.read.parquet(p.toString)
            val tmp = new Path(dir, s".tmp-compact-${p.getName}")
            rows.coalesce(1)
              .sortWithinPartitions(col("block_number"), col(key))
              .write.mode(SaveMode.Overwrite)
              .option(s"parquet.bloom.filter.enabled#$key", "true")
              .parquet(tmp.toString)
            fs.delete(p, true)
            fs.rename(tmp, p)
          }
        }
    }
  }

  /** Q-19: the reference's `indexer_status` single-row upsert
    * (`ON CONFLICT DO UPDATE`, `src/db.rs:53-77`) — last-writer-wins
    * overwrite of a one-row table. */
  def writeStatus(lastProcessedBlock: Long, chainHeadAtLastPoll: Long): Unit = {
    import spark.implicits._
    Seq((lastProcessedBlock, chainHeadAtLastPoll))
      .toDF("last_processed_block", "chain_head_at_last_poll")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$root/indexer_status")
  }

  /** (last_processed_block, chain_head_at_last_poll), None before
    * first ingest — `src/db.rs:8-15`. */
  def readStatus: Option[(Long, Long)] =
    if (fs.exists(new Path(s"$root/indexer_status")))
      spark.read.parquet(s"$root/indexer_status").collect().headOption
        .map(r => (r.getLong(0), r.getLong(1)))
    else None

  /** I-9: incoming block's parent must match the stored hash at
    * height-1; absent parent is OK (cold start / gap,
    * `src/main.rs:171-175`). Returns the fork height when a reorg is
    * detected. */
  def detectReorg(height: Long, parentHash: String): Option[Long] =
    hashAt(height - 1) match {
      case Some(stored) if stored.toLowerCase != parentHash.toLowerCase => Some(height)
      case _ => None
    }
}
