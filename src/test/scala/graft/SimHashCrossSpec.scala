package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions
import graft.ops.Dedup

/** Cross-validation of the two SimHash families on the sf0.001 fixture.
  *
  * `dedup_simhash` (murmur, 64-bit — the codegen fast path) has no
  * DuckDB form, so its registry check is rows-only; this spec gives it
  * the independent guard the oracle can't: both families' banded-join
  * outputs are brute-force-recomputed from their raw signatures in
  * plain Scala (proving the pigeonhole banding's total-recall claim,
  * not just sampling it), and the two families — built from unrelated
  * hash functions — are required to agree on the overwhelming majority
  * of pairs and to disagree only on borderline near-dups, never on
  * unrelated docs.
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

  private lazy val murmurSigs = {
    GraftFunctions.register(spark)
    sigMap(Dedup.simhashSigs(docs))
  }
  private lazy val md5Sigs = sigMap(Dedup.simhashSigsMd5(docs))
  private lazy val murmurPairs = pairSet(Dedup.simhashPairs(docs, MaxHamming))
  private lazy val md5Pairs = pairSet(Dedup.simhashPairsMd5(docs, MaxHamming))

  test("banded murmur join reproduces the brute-force pair set exactly (total recall, no extras)") {
    assert(murmurPairs == brutePairs(murmurSigs, MaxHamming))
    assert(murmurPairs.size == 24, "fixture regression sentinel")
  }

  test("banded md5 join reproduces the brute-force pair set exactly") {
    assert(md5Pairs == brutePairs(md5Sigs, MaxHamming))
    assert(md5Pairs.size == 21, "fixture regression sentinel")
  }

  test("murmur and md5 families agree on the bulk of the pair set; disagreements are borderline only") {
    val m = murmurPairs.map(p => (p._1, p._2))
    val d = md5Pairs.map(p => (p._1, p._2))
    val common = m & d
    assert(common.size * 3 >= m.size * 2, s"murmur overlap too low: ${common.size}/${m.size}")
    assert(common.size * 3 >= d.size * 2, s"md5 overlap too low: ${common.size}/${d.size}")

    // a pair one family calls a near-dup must be unusually close in the
    // other family too — far below the ~bits/2 expectation for
    // unrelated docs (60-bit md5: mean 30; 64-bit murmur: mean 32).
    // Disagreements are docs straddling the <= 3 cut, not false hits.
    (m -- d).foreach { case (a, b) =>
      val h = java.lang.Long.bitCount(md5Sigs(a) ^ md5Sigs(b))
      assert(h <= 18, s"murmur-only pair ($a,$b) looks unrelated under md5: hamming $h")
    }
    (d -- m).foreach { case (a, b) =>
      val h = java.lang.Long.bitCount(murmurSigs(a) ^ murmurSigs(b))
      assert(h <= 18, s"md5-only pair ($a,$b) looks unrelated under murmur: hamming $h")
    }
  }

  test("pinned murmur pair set on the fixture (deterministic across runs and Spark versions)") {
    val expected = Set(
      (0L, 82L, 3L), (5L, 450L, 2L), (8L, 12L, 1L), (8L, 120L, 2L), (8L, 360L, 1L),
      (12L, 120L, 3L), (12L, 360L, 0L), (16L, 369L, 1L), (26L, 176L, 1L), (43L, 272L, 3L),
      (45L, 487L, 2L), (56L, 157L, 1L), (77L, 459L, 0L), (85L, 197L, 2L), (99L, 174L, 1L),
      (110L, 467L, 1L), (120L, 360L, 3L), (144L, 161L, 1L), (211L, 404L, 3L),
      (227L, 373L, 3L), (229L, 263L, 3L), (270L, 329L, 0L), (349L, 411L, 3L),
      (474L, 498L, 1L))
    assert(murmurPairs == expected)
  }
}
