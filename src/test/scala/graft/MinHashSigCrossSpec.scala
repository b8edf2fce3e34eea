package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, TextAnalysis}

/** ONE per-row MinHash signature, two computations, one answer — on
  * the sf0.001 fixture (the SimHashCrossSpec pattern).
  *
  * The production path is the native [[graft.functions.MinHashSig]]
  * expression (one digest per shingle, whole-stage codegen); the
  * declarative twin [[Dedup.perRowMinhashSig]] spells the identical
  * KM double-hash arithmetic out in HOF column expressions (and is
  * what the DuckDB oracles mirror). This spec pins native == twin
  * BIT-FOR-BIT per document, and pins the per-row form against the
  * BATCH aggregate [[Dedup.minhashSignature]] — three independent
  * computations of the same k minima.
  */
class MinHashSigCrossSpec extends AnyFunSuite with SparkSpec {

  private val K = 12
  private lazy val docs =
    graft.tables.Fixtures.documents(spark, "/root/testdata/sf0.001")
      .filter(size(TextAnalysis.tokens(col("text"))) >= 3)

  private def sigMap(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap

  test("native expression == declarative twin == batch aggregate, bit-for-bit, every document") {
    val native = sigMap(docs.select(col("doc_id"),
      graft.functions.MinHashSig.of(TextAnalysis.tokens(col("text")), K).as("sig")))
    val twin = sigMap(docs.select(col("doc_id"),
      Dedup.perRowMinhashSig(col("text"), K).as("sig")))
    val batch = sigMap(Dedup.minhashSignature(Dedup.shingleRows(docs), K)
      .select(col("doc_id"), col("sig")))
    def diff(a: Map[Long, Seq[Long]], b: Map[Long, Seq[Long]]): String = {
      val keyDiff = (a.keySet -- b.keySet) ++ (b.keySet -- a.keySet)
      if (keyDiff.nonEmpty) s"key sets differ: ${keyDiff.take(5)}"
      else a.keys.find(id => a(id) != b(id))
        .map(id => s"doc $id: ${a(id)} vs ${b(id)}").getOrElse("equal")
    }
    assert(native.nonEmpty && native.size == docs.count())
    assert(native == twin, s"native != twin — ${diff(native, twin)}")
    assert(native == batch, s"native != batch — ${diff(native, batch)}")
  }

  test("fewer than 3 tokens yields NULL (no shingle window exists)") {
    import spark.implicits._
    val short = Seq((1L, "one two"), (2L, "solo"), (3L, "a b c"))
      .toDF("doc_id", "text")
    val out = short.select(col("doc_id"),
      graft.functions.MinHashSig.of(TextAnalysis.tokens(col("text")), K).as("sig"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.isNullAt(1)).toMap
    assert(out(1L) && out(2L) && !out(3L))
  }
}
