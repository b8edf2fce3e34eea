package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions
import graft.ops.Dedup

/** ONE simhash, three computations, one answer — on the sf0.001
  * fixture.
  *
  * The production path is the native [[graft.functions.SimHash64]]
  * expression (one codegen'd digest loop per row); the differential
  * twin [[Dedup.simhashSigsMd5]] spells the same md5-derived 60-bit
  * arithmetic out in plain column expressions; the DuckDB oracle
  * mirrors the twin. This spec pins native == twin BIT-FOR-BIT per
  * document (the strongest cross-check two independent implementations
  * can give), and brute-force-recomputes the banded join's output from
  * the raw signatures in plain Scala — proving the pigeonhole
  * banding's total-recall claim at Hamming <= 3, not sampling it.
  */
class SimHashCrossSpec extends AnyFunSuite with SparkSpec {

  private val MaxHamming = 3
  private lazy val docs =
    graft.tables.Fixtures.documents(spark, "/root/testdata/sf0.001")

  private def sigMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap

  /** All (a, b, hamming) with a < b and hamming <= maxH — the ground
    * truth the banded join must reproduce exactly. */
  private def brutePairs(sigs: Map[Long, Long], maxH: Int): Set[(Long, Long, Long)] = {
    val ids = sigs.keys.toArray.sorted
    (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      h = java.lang.Long.bitCount(sigs(ids(i)) ^ sigs(ids(j))).toLong
      if h <= maxH
    } yield (ids(i), ids(j), h)).toSet
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
      r.getAs[Long]("hamming"))).toSet

  private lazy val nativeSigs = {
    GraftFunctions.register(spark)
    sigMap(Dedup.simhashSigs(docs))
  }
  private lazy val twinSigs = sigMap(Dedup.simhashSigsMd5(docs))
  private lazy val nativePairs = pairSet(Dedup.simhashPairs(docs, MaxHamming))
  private lazy val twinPairs = pairSet(Dedup.simhashPairsMd5(docs, MaxHamming))

  test("native expression == DataFrame twin, bit-for-bit, for every document") {
    assert(nativeSigs.nonEmpty && nativeSigs == twinSigs)
    // 60-bit contract: the packed signature must stay a non-negative
    // BIGINT in both engines (bit 63 would sign-flip on the SQL side)
    assert(nativeSigs.values.forall(s => s >= 0L && s < (1L << 60)))
  }

  test("banded native join reproduces the brute-force pair set exactly (total recall, no extras)") {
    assert(nativePairs == brutePairs(nativeSigs, MaxHamming))
    assert(nativePairs.size == 21, "fixture regression sentinel")
  }

  test("banded twin join reproduces the brute-force pair set exactly") {
    assert(twinPairs == brutePairs(twinSigs, MaxHamming))
    assert(twinPairs == nativePairs, "one simhash: both paths emit one pair set")
  }

  test("pinned pair set on the fixture (deterministic across runs, Spark versions, and engines — " +
      "independently recomputed via DuckDB's md5)") {
    val expected = Set(
      (5L, 450L, 0L), (8L, 12L, 3L), (8L, 120L, 0L), (8L, 360L, 2L),
      (12L, 120L, 3L), (12L, 360L, 1L), (16L, 369L, 0L), (26L, 176L, 1L),
      (56L, 157L, 1L), (72L, 103L, 3L), (77L, 459L, 1L), (99L, 174L, 1L),
      (110L, 467L, 0L), (119L, 425L, 3L), (120L, 360L, 2L), (144L, 161L, 2L),
      (211L, 404L, 3L), (260L, 391L, 2L), (270L, 329L, 2L), (328L, 428L, 0L),
      (474L, 498L, 1L))
    assert(nativePairs == expected)
  }
}
