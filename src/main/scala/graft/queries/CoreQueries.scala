package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{GetLogsFilter, LogsQuery, Lookups}
import graft.evm.EvmDerive
import graft.ingest.Ingest

/** Driver-verified queries covering the reference's relational surface
  * (SURVEY.md §2.A, Q-1..Q-23) over the derived EVM tables. Each entry
  * has a DuckDB oracle in [[oracleSql]] (prefixed with
  * [[EvmDerive.cte]]) and ends in a total-order ORDER BY.
  */
object CoreQueries {

  private val logProj =
    """id, log_index_in_tx AS log_index, tx_index_in_block AS
      |transaction_index, block_number, block_hash, transaction_hash,
      |contract_address, data, topic0, topic1, topic2,
      |topic3""".stripMargin.replace("\n", " ")

  // Literals shared between the Spark filter and the oracle SQL.
  private val addr6Upper = EvmDerive.addressOf(6).toUpperCase.replace("0X", "0X")
  private val addr6 = EvmDerive.addressOf(6)
  private val addr11 = EvmDerive.addressOf(11)
  private val topicClick = EvmDerive.topicOf("click")
  private val topicView = EvmDerive.topicOf("view")
  private val topic1User6 = "0x" + EvmDerive.md5hex("6")
  private val hash42 = EvmDerive.blockHashOf(42)
  private val hash77 = EvmDerive.blockHashOf(77)
  private val tx123 = EvmDerive.txHashOf(123)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q-1/Q-3/Q-7/Q-8: projection w/ aliases + closed block range +
    // stable sort + limit (reference src/api.rs:118-138,174-175).
    "logs_range" -> ((s, dir) =>
      LogsQuery.plan(EvmDerive.logs(s, dir),
        GetLogsFilter(fromBlock = Some(100), toBlock = Some(199), pageSize = Some(100)))),

    // Q-2: case-insensitive address equality (src/api.rs:140-144) —
    // input deliberately uppercased to exercise the LOWER on both sides.
    "logs_addr" -> ((s, dir) =>
      LogsQuery.plan(EvmDerive.logs(s, dir),
        GetLogsFilter(fromBlock = Some(0), toBlock = Some(500),
          contractAddress = Some(addr6Upper), pageSize = Some(100)))),

    // Q-4: conjunctive topic filters (src/api.rs:145-160).
    "logs_topics" -> ((s, dir) =>
      LogsQuery.plan(EvmDerive.logs(s, dir),
        GetLogsFilter(topic0 = Some(topicClick), topic1 = Some(topic1User6),
          pageSize = Some(100)))),

    // Q-5: block_hash overrides the block range (src/api.rs:126-139) —
    // the 900..999 range below must be ignored.
    "logs_blockhash" -> ((s, dir) =>
      LogsQuery.plan(EvmDerive.logs(s, dir),
        GetLogsFilter(blockHash = Some(hash42.toUpperCase.replace("0X", "0x")),
          fromBlock = Some(900), toBlock = Some(999), pageSize = Some(100)))),

    // Q-6: keyset cursor page (src/api.rs:162-172).
    "logs_cursor" -> ((s, dir) =>
      LogsQuery.plan(EvmDerive.logs(s, dir),
        GetLogsFilter(topic0 = Some(topicView),
          cursorBlock = Some(500), cursorLogId = Some(5004), pageSize = Some(50)))),

    // Q-9: legacy offset pagination (src/api.rs:177-182), page 3 of 25.
    "logs_offset" -> ((s, dir) =>
      LogsQuery.plan(EvmDerive.logs(s, dir),
        GetLogsFilter(contractAddress = Some(addr11),
          page = Some(3), pageSize = Some(25)))),

    // Q-13: polymorphic point lookup by height (src/api.rs:284-303).
    "block_by_number" -> ((s, dir) =>
      Lookups.blockByIdentifier(EvmDerive.blocks(s, dir), "123").get),

    // Q-13: same endpoint, 0x-hash identifier branch.
    "block_by_hash" -> ((s, dir) =>
      Lookups.blockByIdentifier(EvmDerive.blocks(s, dir), hash77.toUpperCase.replace("0X", "0x")).get),

    // Q-14: tx point lookup with hash validation (src/api.rs:338-357).
    "tx_by_hash" -> ((s, dir) =>
      Lookups.txByHash(EvmDerive.transactions(s, dir), tx123).get),

    // Q-10: stored hash at height, latest-wins (src/db.rs:19-30).
    "latest_at" -> ((s, dir) =>
      Lookups.blockHashAtHeight(EvmDerive.blocks(s, dir), 55)),

    // Q-11/Q-12: stats counts + ingestion lag (src/api.rs:242-267).
    "evm_stats" -> ((s, dir) =>
      Lookups.stats(EvmDerive.blocks(s, dir), EvmDerive.transactions(s, dir),
        EvmDerive.logs(s, dir))),

    // Q-17/Q-18: all_topics array build + element access
    // (src/db.rs:164-167, src/main.rs:284-288).
    "logs_tarray" -> ((s, dir) =>
      EvmDerive.logsWithTopicsArray(s, dir)
        .filter(col("block_number") < 50)
        .select(col("id"),
          size(col("all_topics")).as("n_topics"),
          element_at(col("all_topics"), 1).as("first_topic"))
        .orderBy(col("id"))),

    // Q-16: U256 decimal-string → DecimalType(38,0) arithmetic.
    "tx_value_decimal" -> ((s, dir) =>
      EvmDerive.transactions(s, dir)
        .filter(col("block_number") < 100)
        .groupBy(col("block_number"))
        .agg(
          sum(col("value").cast("decimal(38,0)")).cast("string").as("wei_sum"),
          // gas_used is U256 TEXT like value: a cast("long") would turn
          // a genuine >64-bit value into null (silently dropped from
          // the sum) while the oracle's BIGINT cast errors — the exact
          // divergence the TEXT storage contract exists to avoid.
          sum(col("gas_used").cast("decimal(38,0)")).cast("string").as("gas_sum"))
        .orderBy(col("block_number"))),

    // I-7: nested envelope → explode round-trip (src/main.rs:240-297).
    "ingest_explode" -> ((s, dir) => {
      val logs = EvmDerive.logs(s, dir)
      val nested = logs.groupBy(col("block_number"))
        .agg(collect_list(struct(col("id"), col("transaction_hash"), col("data"))).as("entries"))
      nested.select(col("block_number"), explode(col("entries")).as("e"))
        .select(col("e.id").as("id"), col("block_number"),
          col("e.transaction_hash").as("transaction_hash"), col("e.data").as("data"))
        .orderBy(col("id"))
    }),

    // Q-20: idempotent re-append is a fixpoint (src/db.rs:97,136).
    "ingest_idem" -> ((s, dir) => {
      val logs = EvmDerive.logs(s, dir)
      Ingest.idempotentAppend(logs, logs, Seq("id"))
        .select(col("id"), col("block_number"), col("transaction_hash"))
        .orderBy(col("id"))
    }),

    // Q-21/I-10: reorg suffix retraction (src/db.rs:34-50).
    "reorg_rollback" -> ((s, dir) =>
      Ingest.rollback(EvmDerive.logs(s, dir), forkHeight = 900)
        .select(col("id"), col("block_number"))
        .orderBy(col("id"))),

    // Q-22: row → JSON wire serialization (the reference's serde
    // camelCase of MyLog, src/models.rs:47 via src/api.rs:224-228).
    // ignoreNullFields=false so null topics serialize as `"t":null`,
    // the way serde serializes Option::None.
    "logs_json" -> ((s, dir) =>
      EvmDerive.logs(s, dir)
        .filter(col("block_number") < 20)
        .select(col("id"), to_json(struct(
          col("id"), col("block_number"), col("transaction_hash"),
          col("contract_address"), col("topic0"), col("topic3")),
          Map("ignoreNullFields" -> "false")).as("log_json"))
        .orderBy(col("id")))
  )

  def oracleSql: Map[String, String] = Map(
    "logs_range" -> (EvmDerive.cte +
      s"SELECT $logProj FROM logs WHERE block_number >= 100 AND block_number <= 199 " +
      "ORDER BY block_number, id LIMIT 100"),

    "logs_addr" -> (EvmDerive.cte +
      s"SELECT $logProj FROM logs WHERE block_number >= 0 AND block_number <= 500 " +
      s"AND contract_address = '$addr6' ORDER BY block_number, id LIMIT 100"),

    "logs_topics" -> (EvmDerive.cte +
      s"SELECT $logProj FROM logs WHERE topic0 = '$topicClick' AND topic1 = '$topic1User6' " +
      "ORDER BY block_number, id LIMIT 100"),

    "logs_blockhash" -> (EvmDerive.cte +
      s"SELECT $logProj FROM logs WHERE block_hash = '$hash42' " +
      "ORDER BY block_number, id LIMIT 100"),

    "logs_cursor" -> (EvmDerive.cte +
      s"SELECT $logProj FROM logs WHERE topic0 = '$topicView' " +
      "AND (block_number > 500 OR (block_number = 500 AND id > 5004)) " +
      "ORDER BY block_number, id LIMIT 50"),

    "logs_offset" -> (EvmDerive.cte +
      s"SELECT $logProj FROM logs WHERE contract_address = '$addr11' " +
      "ORDER BY block_number, id LIMIT 25 OFFSET 50"),

    "block_by_number" -> (EvmDerive.cte +
      "SELECT block_number, block_hash, parent_hash, timestamp, miner, gas_used, gas_limit, base_fee_per_gas, tx_count " +
      "FROM blocks WHERE block_number = 123 ORDER BY block_number LIMIT 1"),

    "block_by_hash" -> (EvmDerive.cte +
      "SELECT block_number, block_hash, parent_hash, timestamp, miner, gas_used, gas_limit, base_fee_per_gas, tx_count " +
      s"FROM blocks WHERE block_hash = '$hash77' ORDER BY block_number LIMIT 1"),

    "tx_by_hash" -> (EvmDerive.cte +
      "SELECT tx_hash, block_number, block_hash, tx_index_in_block, from_address, to_address, " +
      "value, gas_used, gas_limit, gas_price, max_fee_per_gas, max_priority_fee_per_gas, nonce, input_data, status " +
      s"FROM transactions WHERE tx_hash = '$tx123' ORDER BY tx_hash LIMIT 1"),

    "latest_at" -> (EvmDerive.cte +
      "SELECT block_hash FROM blocks WHERE block_number = 55 ORDER BY block_number DESC LIMIT 1"),

    "evm_stats" -> (EvmDerive.cte +
      "SELECT (SELECT COUNT(*) FROM blocks) AS blocks_count, " +
      "(SELECT COUNT(*) FROM transactions) AS transactions_count, " +
      "(SELECT COUNT(*) FROM logs) AS logs_count, " +
      "(SELECT MAX(block_number) FROM blocks) AS last_processed_block, " +
      "(SELECT MAX(block_number) FROM blocks) + 3 AS chain_head_at_last_poll, " +
      "CAST(3 AS BIGINT) AS ingestion_lag"),

    "logs_tarray" -> (EvmDerive.cte +
      "SELECT id, CAST(1 + CASE WHEN topic1 IS NOT NULL THEN 1 ELSE 0 END " +
      "+ CASE WHEN topic2 IS NOT NULL THEN 1 ELSE 0 END " +
      "+ CASE WHEN topic3 IS NOT NULL THEN 1 ELSE 0 END AS INT) AS n_topics, " +
      "topic0 AS first_topic FROM logs WHERE block_number < 50 ORDER BY id"),

    "tx_value_decimal" -> (EvmDerive.cte +
      // CAST to BIGINT: DuckDB's SUM(BIGINT) returns HUGEINT, which the
      // checker renders as float ("205000.0") while Spark emits int64
      // ("205000") — the formatted hashes diverge without the cast.
      "SELECT block_number, CAST(SUM(CAST(value AS DECIMAL(38,0))) AS VARCHAR) AS wei_sum, " +
      "CAST(SUM(CAST(gas_used AS DECIMAL(38,0))) AS VARCHAR) AS gas_sum FROM transactions WHERE block_number < 100 " +
      "GROUP BY block_number ORDER BY block_number"),

    "ingest_explode" -> (EvmDerive.cte +
      "SELECT id, block_number, transaction_hash, data FROM logs ORDER BY id"),

    "ingest_idem" -> (EvmDerive.cte +
      "SELECT id, block_number, transaction_hash FROM logs ORDER BY id"),

    "reorg_rollback" -> (EvmDerive.cte +
      "SELECT id, block_number FROM logs WHERE block_number < 900 ORDER BY id"),

    "logs_json" -> (EvmDerive.cte +
      "SELECT id, to_json(struct_pack(id := id, block_number := block_number, " +
      "transaction_hash := transaction_hash, contract_address := contract_address, " +
      "topic0 := topic0, topic3 := topic3))::VARCHAR AS log_json " +
      "FROM logs WHERE block_number < 20 ORDER BY id")
  )
}
