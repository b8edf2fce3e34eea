package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Fixtures

/** Analytic queries over the fixture star schema — the aggregate /
  * join / window operator classes the reference delegates to Postgres
  * (SURVEY.md §2: COUNT aggregates, plus the extension surface a
  * Spark engine gets for free from Catalyst).
  *
  * Determinism-for-oracle rules (FIXTURES.md §3): money math is done
  * in DecimalType (exact, order-insensitive) and cast to double only
  * at the end; every query ends in a total-order ORDER BY on
  * non-floating keys.
  */
object AnalyticsQueries {

  private def dec(c: String) = col(c).cast("decimal(12,2)")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: one wide scan, map-side partial agg, tiny
    // shuffle (4 groups) — the 100 TB plan is identical.
    "q1_agg" -> ((s, dir) =>
      Fixtures.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec("l_quantity")).cast("double").as("sum_qty"),
          sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
          sum(dec("l_extendedprice") * (lit(1).cast("decimal(12,2)") - dec("l_discount")))
            .cast("double").as("sum_disc_price"),
          (sum(dec("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // TPC-H Q3 shape, pre-aggregated: lineitem revenue folds to one
    // row per order BEFORE the star join (map-side combinable), so the
    // join moves |orders| rows instead of |lineitem| — at 100 TB that
    // is the difference between shuffling the fact table and shuffling
    // its order-level digest. It also turns COUNT(DISTINCT o_orderkey)
    // into a plain count (one row per order by construction), dropping
    // the distinct-expand from the plan. Decimal addition is exact, so
    // regrouping the sum per order first is bit-identical to the
    // oracle's direct formulation.
    "q3_revenue" -> ((s, dir) => {
      val c = Fixtures.customer(s, dir)
      val o = Fixtures.orders(s, dir)
      val perOrder = Fixtures.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(dec("l_extendedprice") * (lit(1).cast("decimal(12,2)") - dec("l_discount")))
          .as("order_rev"))
      perOrder.join(o, col("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          sum(col("order_rev")).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("c_mktsegment"))
    }),

    // TPC-H Q5 shape: star join through nation/region (broadcast
    // dims), with the same per-order lineitem pre-aggregation as Q3.
    "q5_revenue" -> ((s, dir) => {
      val c = Fixtures.customer(s, dir)
      val o = Fixtures.orders(s, dir)
      val n = Fixtures.nation(s, dir)
      val r = Fixtures.region(s, dir)
      val perOrder = Fixtures.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(dec("l_extendedprice") * (lit(1).cast("decimal(12,2)") - dec("l_discount")))
          .as("order_rev"))
      perOrder.join(o, col("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(col("order_rev")).cast("double").as("revenue"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // Window top-k per key: per-partition rank, no global sort.
    "top3_per_user" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("value").desc, col("event_id").asc)
      Fixtures.events(s, dir)
        .filter(col("event_type") === "purchase")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("user_id"), col("rn"), col("event_id"), col("value"))
        .orderBy(col("user_id"), col("rn"))
    }),

    // Time bucketing + grouped agg. `ts` is epoch-nanos (LongType, see
    // Fixtures.events), so the hour bucket is integer arithmetic; the
    // oracle mirrors it as epoch_ms(date_trunc('hour', ts)) — identical
    // for epoch-positive timestamps. Emitted as epoch millis so Spark
    // and DuckDB hash identically.
    "events_hourly" -> ((s, dir) =>
      Fixtures.events(s, dir)
        .groupBy(expr("(ts div 3600000000000) * 3600000").as("hour_ms"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(14,2)")).cast("double").as("sum_value"))
        .orderBy(col("hour_ms"), col("event_type"))),

    // batch twin of the streaming sessionization (gap = 1 hour): lag +
    // cumulative-sum session ids, both windows partitioned by user.
    // Micros, not nanos: DuckDB truncates the parquet TIMESTAMP(NANOS)
    // to microseconds on read, so the differential form must too (the
    // operator is unit-agnostic; the streaming parity test runs nanos).
    "events_sessions" -> ((s, dir) =>
      graft.streaming.StreamAnalytics.batchSessionize(
        Fixtures.events(s, dir)
          .select(col("user_id"), expr("ts div 1000").as("ts"), col("value")),
        gapNanos = 3600L * 1000000L)
        .orderBy(col("user_id"), col("session_idx"))),

    // Batch twin of the streaming MinHash near-dup matcher at fixture
    // scale: documents arrive one per minute starting a day after
    // epoch (ts = (doc_id + 1440) minutes — deterministic, the oracle
    // derives the same clock, and the offset keeps doc 0 admissible
    // under the stream's initial watermark when the spec replays the
    // same rows), the match horizon is 120 minutes, so the time
    // condition genuinely bites (roughly half the fixture's
    // est-agreement pairs lie farther apart). StreamAnalyticsSpec
    // feeds the same rows through the stateful matcher and
    // differentially checks it against this plan.
    "stream_twin" -> ((s, dir) =>
      graft.streaming.StreamAnalytics.batchNearDup(
        Fixtures.documents(s, dir)
          .select(col("doc_id"), col("text"),
            ((col("doc_id") + 1440L) * 60000000000L).as("ts")),
        threshold = 0.6, horizonNanos = 120L * 60000000000L)
        .orderBy(col("doc_a"), col("doc_b"))),

    // the STATE MACHINE itself, driver-checked: the same rows fed
    // through streamingNearDup (MemoryStream, bounded micro-batches,
    // memory sink, run to completion inside this entry) — sharing the
    // twin's oracle SQL, so bucket pruning / watermark / intra-batch
    // ordering regressions become a driver hash mismatch rather than
    // a spec-only failure
    // chunks is the replay harness's micro-batch dial, exposed here:
    // the hit set is chunk-count-invariant (chunks are ts-ordered and
    // each chunk is one whole micro-batch, so the watermark only moves
    // BETWEEN chunks at every setting — the oracle hash pins it), and
    // each micro-batch costs a fixed state-store commit round, so
    // fewer, larger chunks buy wall time at identical semantics
    // (measured 8.0 -> ~5 s at sf1 going 10 -> 4, ~5 -> ~4 going
    // 4 -> 2; two chunks keep one real watermark advance in the
    // replay, so the BETWEEN-chunks state machinery still executes —
    // chunks=1 would measure a batch job wearing a streaming API). A
    // production deployment replays from its real source; this dial
    // only shapes the bounded-replay fixture.
    "stream_sink" -> ((s, dir) =>
      graft.streaming.StreamAnalytics.nearDupStreamCompleted(
        Fixtures.documents(s, dir)
          .select(col("doc_id"), col("text"),
            ((col("doc_id") + 1440L) * 60000000000L).as("ts")),
        threshold = 0.6, horizonNanos = 120L * 60000000000L, chunks = 2)
        .orderBy(col("doc_a"), col("doc_b"))),

    // Salting is result-transparent: the oracle states the PLAIN join,
    // so this entry proves the de-skew rewrite changes the shuffle key
    // and nothing else. Quantities are integral in TPC-H, so the
    // per-row long cast keeps the aggregate exact in both engines.
    "skew_salted_join" -> ((s, dir) => {
      val li = Fixtures.lineitem(s, dir)
        .select(col("l_orderkey").as("k"), col("l_quantity"))
      val ord = Fixtures.orders(s, dir)
        .select(col("o_orderkey").as("k"), col("o_orderpriority"))
      // salts=4 spreads the hottest key over 4 reducers — ample for
      // the fixture's skew while replicating the dim side 4× instead
      // of 8× (the replication IS the salting's cost; the dial rises
      // with observed per-key skew, not corpus size)
      graft.ops.SkewJoin.saltedJoin(li, ord, "k", salts = 4)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
        .orderBy(col("o_orderpriority"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_revenue" ->
      """SELECT c_mktsegment,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
        |COUNT(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q5_revenue" ->
      """SELECT r_name, n_name,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "top3_per_user" ->
      """SELECT user_id, rn, event_id, value FROM (
        |SELECT user_id, event_id, value,
        |ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn
        |FROM events WHERE event_type = 'purchase') t
        |WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin,

    "events_hourly" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
        |COUNT(*) AS n,
        |CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_ms, event_type""".stripMargin,

    "events_sessions" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tsn, value FROM events),
        |l AS (SELECT user_id, tsn, value,
        |  LAG(tsn) OVER (PARTITION BY user_id ORDER BY tsn) AS prev_ts FROM e),
        |m AS (SELECT user_id, tsn, value,
        |  CASE WHEN prev_ts IS NULL OR tsn - prev_ts > 3600000000 THEN 1 ELSE 0 END AS ns FROM l),
        |x AS (SELECT user_id, tsn, value,
        |  CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY tsn ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx FROM m)
        |SELECT user_id, session_idx, MIN(tsn) AS session_start, MAX(tsn) AS session_end,
        |COUNT(*) AS n_events,
        |CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
        |FROM x GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,

    // Mirrors batchNearDup: KM double-hash signatures (one md5 per
    // shingle, 13-hex-char slices — the dedup_minhash arithmetic),
    // band buckets, position-agreement >= ceil(0.6 * 12) = 8, arrival
    // clock ts = doc_id minutes with a 120-minute horizon.
    "stream_twin" -> streamNearDupOracle,

    // the completed streaming sink must equal the twin — SAME oracle
    // verbatim; divergence is a stateful-matcher bug by definition
    "stream_sink" -> streamNearDupOracle,

    "skew_salted_join" ->
      """SELECT o_orderpriority, COUNT(*)::BIGINT AS n_lines,
        |SUM(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
  )

  private val streamNearDupOracle =
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)]) AS shingles
        |  FROM toks WHERE len(t) >= 3),
        |mh AS (SELECT doc_id, j,
        |  list_min([('0x' || substr(md5(s), 1, 13))::BIGINT
        |            + j * ('0x' || substr(md5(s), 14, 13))::BIGINT for s in shingles]) AS m
        |  FROM sh, range(12) r(j)),
        |sig AS (SELECT doc_id, list(m ORDER BY j) AS sig FROM mh GROUP BY doc_id),
        |bands AS (SELECT doc_id, j // 2 AS band,
        |  md5(string_agg(m::VARCHAR, '|' ORDER BY j)) AS band_sig
        |  FROM mh GROUP BY doc_id, j // 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |  ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
        |  WHERE b.doc_id - a.doc_id <= 120),
        |agree AS (SELECT doc_a, doc_b,
        |  len([i for i in range(1, 13) if x.sig[i] = y.sig[i]])::BIGINT AS n_agree
        |  FROM cand JOIN sig x ON x.doc_id = doc_a JOIN sig y ON y.doc_id = doc_b)
        |SELECT doc_a, doc_b, (n_agree * 10000) // 12 AS est_jaccard_bp,
        |  (doc_b + 1440) * 60000000000 AS ts
        |FROM agree WHERE n_agree >= 8 ORDER BY doc_a, doc_b""".stripMargin
}
