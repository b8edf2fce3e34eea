package graft.evm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Fixtures

/** Deterministic derivation of the reference's EVM tables
  * (`blocks` / `transactions` / `logs`, reference `init.sql:13-63`)
  * from the driver fixture `events` table, so that every query over the
  * EVM surface is DuckDB-oracle-checkable on identical inputs.
  *
  * Layout: event_id is contiguous from 0; 1 block = 5 transactions =
  * 10 logs (2 logs per tx). All hashes are lowercase 0x-hex like the
  * reference's `format!("{:#x}")` encoding (`src/db.rs:84-89`); U256
  * money columns are decimal strings like `U256::to_string()`
  * (`src/db.rs:87-89,121-124`).
  *
  * Every expression here is mirrored 1:1 by the DuckDB SQL in [[cte]];
  * any change must be made in both places (the per-round driver verify
  * run is the enforcement).
  */
object EvmDerive {

  // ---- Scala-side constants for building filter literals ------------
  def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Contract address for a user bucket (H160 analog, 42 chars). */
  def addressOf(userId: Long): String = "0x" + md5hex(s"$userId:addr").take(40)
  /** Block hash at a height (H256 analog, 66 chars: two md5 halves). */
  def blockHashOf(n: Long): String =
    "0x" + md5hex(n.toString) + md5hex(n.toString + ":2")
  /** Transaction hash for a tx id (H256 analog, 66 chars). */
  def txHashOf(t: Long): String =
    "0x" + md5hex(s"$t:tx") + md5hex(s"$t:tx:2")
  /** topic0 = event-signature analog. */
  def topicOf(sig: String): String = "0x" + md5hex(sig)

  private def hx(c: Column): Column = concat(lit("0x"), md5(c))
  /** 64-hex H256 analog: md5(x) || md5(x||":2"), 66 chars with 0x. */
  private def hx2(c: Column): Column =
    concat(lit("0x"), md5(c), md5(concat(c, lit(":2"))))

  // ---- logs ---------------------------------------------------------
  /** reference `init.sql:49-63`: id, block_number, block_hash,
    * transaction_hash, log_index_in_tx, transaction_index_in_block
    * (named `tx_index_in_block` here, matching the ingested-table
    * column of [[graft.ingest.Ingest.flatten]]), contract_address,
    * topic0..3, data. One log per fixture event.
    */
  def logs(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Fixtures.events(spark, sfDir)
    val blockNum = floor(col("event_id") / 10).cast("long")
    val txId = floor(col("event_id") / 2).cast("long")
    ev.select(
      col("event_id").as("id"),
      blockNum.as("block_number"),
      hx2(blockNum.cast("string")).as("block_hash"),
      hx2(concat(txId.cast("string"), lit(":tx"))).as("transaction_hash"),
      (col("event_id") % 2).cast("long").as("log_index_in_tx"),
      (txId % 5).cast("long").as("tx_index_in_block"),
      concat(lit("0x"),
        substring(md5(concat(col("user_id").cast("string"), lit(":addr"))), 1, 40))
        .as("contract_address"),
      hx(col("event_type")).as("topic0"),
      when(col("user_id") % 4 =!= 3, hx(col("user_id").cast("string"))).as("topic1"),
      when(col("event_id") % 3 === 0, hx((col("event_id") % 7).cast("string"))).as("topic2"),
      when(col("event_id") % 5 === 0, hx((col("event_id") % 11).cast("string"))).as("topic3"),
      col("props").as("data"))
  }

  /** logs plus the `all_topics TEXT[]` array column of the reference
    * (`init.sql:62`) — Q-17/Q-18: array built from the denormalized
    * topics, nulls compacted away like `Vec<H256>` of present topics.
    */
  def logsWithTopicsArray(spark: SparkSession, sfDir: String): DataFrame =
    logs(spark, sfDir).withColumn(
      "all_topics",
      array_compact(array(col("topic0"), col("topic1"), col("topic2"), col("topic3"))))

  // ---- transactions -------------------------------------------------
  /** reference `init.sql:27-41`. One row per tx = every even event_id. */
  def transactions(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Fixtures.events(spark, sfDir).filter(col("event_id") % 2 === 0)
    val txId = floor(col("event_id") / 2).cast("long")
    val blockNum = floor(col("event_id") / 10).cast("long")
    ev.select(
      hx2(concat(txId.cast("string"), lit(":tx"))).as("tx_hash"),
      blockNum.as("block_number"),
      hx2(blockNum.cast("string")).as("block_hash"),
      (txId % 5).cast("long").as("tx_index_in_block"),
      concat(lit("0x"),
        substring(md5(concat(col("user_id").cast("string"), lit(":from"))), 1, 40))
        .as("from_address"),
      concat(lit("0x"),
        substring(md5(concat((col("user_id") % 50).cast("string"), lit(":to"))), 1, 40))
        .as("to_address"),
      // U256 wei as decimal string: (event_id+1) * 10^18 via string concat
      concat((col("event_id") + 1).cast("string"), lit("000000000000000000")).as("value"),
      // U256 gas columns as decimal-string TEXT, the reference's storage
      // contract for transactions too (`init.sql:34-38`, SURVEY §1.2)
      (lit(21000) + (col("event_id") % 9) * 5000).cast("string").as("gas_used"),
      lit("30000000").as("gas_limit"),
      // gas_price is nullable TEXT like the reference (`init.sql:35`):
      // legacy (pre-EIP-1559) txs carry it, the rest leave it null.
      when(col("event_id") % 4 === 0,
        concat((col("user_id") % 100 + 2).cast("string"), lit("000000000")))
        .as("gas_price"),
      concat((col("user_id") % 100 + 1).cast("string"), lit("000000000")).as("max_fee_per_gas"),
      concat((col("user_id") % 3 + 1).cast("string"), lit("000000000")).as("max_priority_fee_per_gas"),
      txId.as("nonce"),
      hx(col("props")).as("input_data"),
      when(col("event_id") % 25 === 0, 0L).otherwise(1L).as("status"))
  }

  // ---- blocks -------------------------------------------------------
  /** reference `init.sql:13-21`. One row per block = every event_id % 10 == 0.
    * Block `gas_used`/`gas_limit`/`base_fee_per_gas` are U256
    * decimal-string TEXT per the reference's storage contract
    * (`init.sql:18-20`, SURVEY §1.2); `base_fee_per_gas` is nullable
    * (pre-London blocks have none).
    */
  def blocks(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Fixtures.events(spark, sfDir).filter(col("event_id") % 10 === 0)
    val blockNum = floor(col("event_id") / 10).cast("long")
    ev.select(
      blockNum.as("block_number"),
      hx2(blockNum.cast("string")).as("block_hash"),
      hx2((blockNum - 1).cast("string")).as("parent_hash"),
      (lit(1704067200L) + blockNum * 12).as("timestamp"),
      concat(lit("0x"),
        substring(md5(concat((blockNum % 10).cast("string"), lit(":miner"))), 1, 40))
        .as("miner"),
      (lit(105000L) + (blockNum % 100) * 1000).cast("string").as("gas_used"),
      lit("30000000").as("gas_limit"),
      when(blockNum % 7 =!= 6,
        concat((blockNum % 50 + 10).cast("string"), lit("00000000")))
        .as("base_fee_per_gas"),
      lit(5L).as("tx_count"))
  }

  // ---- DuckDB oracle mirror ----------------------------------------
  /** WITH-clause prefix prepended to every EVM-surface oracle query.
    * DuckDB dialect; must stay semantically identical to the DataFrame
    * derivations above.
    */
  val cte: String =
    """WITH logs AS (
      |  SELECT
      |    event_id AS id,
      |    CAST(FLOOR(event_id / 10) AS BIGINT) AS block_number,
      |    '0x' || md5(CAST(CAST(FLOOR(event_id / 10) AS BIGINT) AS VARCHAR)) || md5(CAST(CAST(FLOOR(event_id / 10) AS BIGINT) AS VARCHAR) || ':2') AS block_hash,
      |    '0x' || md5(CAST(CAST(FLOOR(event_id / 2) AS BIGINT) AS VARCHAR) || ':tx') || md5(CAST(CAST(FLOOR(event_id / 2) AS BIGINT) AS VARCHAR) || ':tx' || ':2') AS transaction_hash,
      |    CAST(event_id % 2 AS BIGINT) AS log_index_in_tx,
      |    CAST(CAST(FLOOR(event_id / 2) AS BIGINT) % 5 AS BIGINT) AS tx_index_in_block,
      |    '0x' || substr(md5(CAST(user_id AS VARCHAR) || ':addr'), 1, 40) AS contract_address,
      |    '0x' || md5(event_type) AS topic0,
      |    CASE WHEN user_id % 4 <> 3 THEN '0x' || md5(CAST(user_id AS VARCHAR)) END AS topic1,
      |    CASE WHEN event_id % 3 = 0 THEN '0x' || md5(CAST(event_id % 7 AS VARCHAR)) END AS topic2,
      |    CASE WHEN event_id % 5 = 0 THEN '0x' || md5(CAST(event_id % 11 AS VARCHAR)) END AS topic3,
      |    props AS data
      |  FROM events
      |), transactions AS (
      |  SELECT
      |    '0x' || md5(CAST(CAST(FLOOR(event_id / 2) AS BIGINT) AS VARCHAR) || ':tx') || md5(CAST(CAST(FLOOR(event_id / 2) AS BIGINT) AS VARCHAR) || ':tx' || ':2') AS tx_hash,
      |    CAST(FLOOR(event_id / 10) AS BIGINT) AS block_number,
      |    '0x' || md5(CAST(CAST(FLOOR(event_id / 10) AS BIGINT) AS VARCHAR)) || md5(CAST(CAST(FLOOR(event_id / 10) AS BIGINT) AS VARCHAR) || ':2') AS block_hash,
      |    CAST(CAST(FLOOR(event_id / 2) AS BIGINT) % 5 AS BIGINT) AS tx_index_in_block,
      |    '0x' || substr(md5(CAST(user_id AS VARCHAR) || ':from'), 1, 40) AS from_address,
      |    '0x' || substr(md5(CAST(user_id % 50 AS VARCHAR) || ':to'), 1, 40) AS to_address,
      |    CAST(event_id + 1 AS VARCHAR) || '000000000000000000' AS value,
      |    CAST(21000 + (event_id % 9) * 5000 AS VARCHAR) AS gas_used,
      |    '30000000' AS gas_limit,
      |    CASE WHEN event_id % 4 = 0 THEN CAST(user_id % 100 + 2 AS VARCHAR) || '000000000' END AS gas_price,
      |    CAST(user_id % 100 + 1 AS VARCHAR) || '000000000' AS max_fee_per_gas,
      |    CAST(user_id % 3 + 1 AS VARCHAR) || '000000000' AS max_priority_fee_per_gas,
      |    CAST(FLOOR(event_id / 2) AS BIGINT) AS nonce,
      |    '0x' || md5(props) AS input_data,
      |    CAST(CASE WHEN event_id % 25 = 0 THEN 0 ELSE 1 END AS BIGINT) AS status
      |  FROM events WHERE event_id % 2 = 0
      |), blocks AS (
      |  SELECT
      |    CAST(FLOOR(event_id / 10) AS BIGINT) AS block_number,
      |    '0x' || md5(CAST(CAST(FLOOR(event_id / 10) AS BIGINT) AS VARCHAR)) || md5(CAST(CAST(FLOOR(event_id / 10) AS BIGINT) AS VARCHAR) || ':2') AS block_hash,
      |    '0x' || md5(CAST(CAST(FLOOR(event_id / 10) AS BIGINT) - 1 AS VARCHAR)) || md5(CAST(CAST(FLOOR(event_id / 10) AS BIGINT) - 1 AS VARCHAR) || ':2') AS parent_hash,
      |    CAST(1704067200 + CAST(FLOOR(event_id / 10) AS BIGINT) * 12 AS BIGINT) AS timestamp,
      |    '0x' || substr(md5(CAST(CAST(FLOOR(event_id / 10) AS BIGINT) % 10 AS VARCHAR) || ':miner'), 1, 40) AS miner,
      |    CAST(105000 + (CAST(FLOOR(event_id / 10) AS BIGINT) % 100) * 1000 AS VARCHAR) AS gas_used,
      |    '30000000' AS gas_limit,
      |    CASE WHEN CAST(FLOOR(event_id / 10) AS BIGINT) % 7 <> 6 THEN CAST(CAST(FLOOR(event_id / 10) AS BIGINT) % 50 + 10 AS VARCHAR) || '00000000' END AS base_fee_per_gas,
      |    CAST(5 AS BIGINT) AS tx_count
      |  FROM events WHERE event_id % 10 = 0
      |)
      |""".stripMargin
}
