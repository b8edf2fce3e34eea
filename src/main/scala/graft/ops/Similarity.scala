package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table
  * (`embedding: array<float>`, 64-dim).
  *
  * Brute-force cosine is the correctness baseline (oracle-checked);
  * the scale paths are IVF (coarse-cell probe — here the fixture
  * `label` plays the centroid-cell id) and random-hyperplane LSH
  * (bucketed candidate join). All dot products run in double via
  * `zip_with` + `aggregate` — codegen'd, no UDF.
  */
object Similarity {

  /** Dot product in double via the native codegen expression
    * [[graft.functions.DotProductF64]] — sequential index-order
    * summation, same order as the oracle's list_dot_product, for bit
    * parity; ~40× faster than the interpreted
    * `aggregate(zip_with(...))` formulation. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExprs.dotF64(a, b)

  def cosine(a: Column, aNorm: Column, b: Column, bNorm: Column): Column =
    dot(a, b) / (aNorm * bNorm)

  /** embeddings with double vectors + precomputed norms (compute the
    * norm once per row, not once per pair). */
  def prepared(embeddings: DataFrame): DataFrame = {
    val v = col("embedding").cast("array<double>")
    embeddings.select(col("vec_id"), col("label"), v.as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
  }

  /** Brute-force cosine top-k for a set of query vectors: broadcast
    * the (small) query side across the full table, per-query window
    * rank. Scores rounded to 4 decimals before ranking so ordering is
    * reproducible across engines; ties broken by vec_id. */
  def topK(embeddings: DataFrame, maxQueryId: Long, k: Int = 10): DataFrame = {
    val e = prepared(embeddings)
    val q = e.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("score", round(cosine(col("v"), col("nrm"), col("qv"), col("qn")), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("rn"), col("vec_id"), col("score"))
  }

  /** IVF-style top-k: candidates restricted to the query's coarse
    * cell (`label` = centroid-cell id, standing in for a k-means
    * assignment). The join is an equality join on the cell key — at
    * scale each query probes one cell, not the corpus. */
  def topKIvf(embeddings: DataFrame, maxQueryId: Long, k: Int = 3): DataFrame = {
    val e = prepared(embeddings)
    val q = e.filter(col("vec_id") < maxQueryId)
      .select(col("label"), col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = e.join(broadcast(q), Seq("label"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("score", round(cosine(col("v"), col("nrm"), col("qv"), col("qn")), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("rn"), col("vec_id"), col("label"), col("score"))
  }

  /** Brute-force near-duplicate pairs (cosine >= threshold, i < j).
    * O(n²) by construction — the correctness baseline; use
    * [[nearDupPairsLsh]] at scale. */
  def nearDupPairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    val e = prepared(embeddings)
    val a = e.select(col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("score", round(cosine(col("va"), col("na"), col("vb"), col("nb")), 4))
      .filter(col("score") >= threshold)
      .select(col("id_a"), col("id_b"), col("score"))
  }

  /** Random-hyperplane LSH near-dup: 16 sign bits from fixed seeded
    * Gaussian planes, banded 4×4; candidates = equality join on
    * (band, 4-bit chunk); verified by exact cosine. The plane matrix
    * is a broadcast literal — at scale this is a narrow map + a
    * bucket-keyed shuffle, never all-pairs. */
  def nearDupPairsLsh(embeddings: DataFrame, threshold: Double,
                      nPlanes: Int = 16, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(nPlanes, dim)(rnd.nextGaussian())
    val planesCol = array(planes.map(p => array(p.map(lit): _*)): _*)
    val e = prepared(embeddings)
      .withColumn("bits", transform(planesCol, p =>
        when(dot(col("v"), p) >= 0, 1).otherwise(0)))
    val banded = e.select(col("vec_id"), col("v"), col("nrm"),
      posexplode(transform(sequence(lit(0), lit(nPlanes / 4 - 1)),
        b => concat_ws("", (0 until 4).map(k =>
          element_at(col("bits"), b * 4 + k + 1).cast("string")): _*)))
        .as(Seq("band", "chunk")))
    val a = banded.select(col("band"), col("chunk"), col("vec_id").as("id_a"),
      col("v").as("va"), col("nrm").as("na"))
    val b = banded.select(col("band"), col("chunk"), col("vec_id").as("id_b"),
      col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("va"), col("na"), col("vb"), col("nb")), 4).as("score"))
      .distinct()
      .filter(col("score") >= threshold)
  }
}
