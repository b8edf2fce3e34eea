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
    * The salt hashes the full fact row PLUS a per-row id: a hash of
    * the row values alone would send bit-identical duplicate rows of
    * the hot key back to one reducer — exactly the straggler salting
    * exists to break, and duplicate-heavy hot keys are the common case
    * (the same event replayed, the same default value). The id makes
    * the salt row-unique rather than value-deterministic across runs;
    * the RESULT is unaffected either way (each fact row carries one
    * salt and meets each dim match exactly once at the replica bearing
    * it — the salt never reaches the output). */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1: $salts")
    require(!facts.columns.contains("_salt") && !dim.columns.contains("_salt"),
      "input already has a _salt column; rename it before salting")
    val salted = facts.withColumn("_salt",
      pmod(xxhash64(facts.columns.map(col) :+ monotonically_increasing_id(): _*),
        lit(salts.toLong)))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
