package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The last mile of a training-data pipeline: deterministic shard
  * assignment for the curated corpus, plus the write manifest a
  * downstream loader checks shards against.
  *
  * A production run ends with
  * `repartition(nShards, col("shard")).sortWithinPartitions("doc_id")
  * .write`; [[shardAssignments]] computes exactly that placement —
  * shard id and within-shard position — as a queryable frame, so the
  * layout itself is oracle-checkable. Shard membership is a pure
  * function of doc_id ([[Curation.hashMod]]), never of partitioning or
  * arrival order: re-running the export after adding data moves no
  * existing doc to a different shard.
  *
  * Scale: one shuffle keyed on the shard id. `nShards` is the
  * parallelism dial — production sizes shards to ~1 GB, so 100 TB is
  * ~100k shards and each window partition holds one shard's docs, the
  * same rows the writer task would sort anyway. The manifest is a
  * map-side-combined groupBy over per-shard aggregates; the id
  * fingerprint md5s the sorted id list so a loader can verify a shard
  * without re-reading the corpus.
  */
object Export {

  /** (doc_id, n_tokens, shard, position): hash-assigned shard plus the
    * doc's 1-based rank in its shard's doc_id order. */
  def shardAssignments(docs: DataFrame, nShards: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    docs.select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).as("n_tokens"))
      .withColumn("shard", Curation.hashMod(col("doc_id"), "shard", nShards))
      .withColumn("position", row_number().over(w))
  }

  /** The physical export: one parquet directory per shard, rows
    * sorted by doc_id within each shard — the layout
    * [[shardAssignments]] describes, actually written. `repartition`
    * on the shard id is the single shuffle; `sortWithinPartitions`
    * rides the shuffle's local sort, so the write adds no extra pass.
    * `partitionBy("shard")` makes each shard its own directory, which
    * is what lets a loader fetch shard k without listing the rest —
    * and lets [[shardManifest]] be re-verified against any single
    * shard's files in isolation. */
  def writeShards(docs: DataFrame, outDir: String, nShards: Int = 8): Unit =
    prepareShards(docs, nShards).parquet(outDir)

  /** The shared placement: select + hash-assign + one shuffle + local
    * sort + per-shard directories. BOTH physical writers go through
    * here, so the JSONL export can never silently desynchronize from
    * the manifest the parquet form verifies against. */
  private def prepareShards(docs: DataFrame, nShards: Int) =
    docs.select(col("doc_id"), col("text"),
        size(TextAnalysis.tokens(col("text"))).as("n_tokens"))
      .withColumn("shard", Curation.hashMod(col("doc_id"), "shard", nShards))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .write.mode("overwrite").partitionBy("shard")

  /** [[writeShards]] in JSON-lines — the format most training-data
    * loaders consume directly. Same single shuffle, same per-shard
    * directories and doc_id order, same manifest contract (pass
    * `format = "json"` to [[verifyShards]]); only the file encoding
    * differs. Parquet stays the right interchange for anything that
    * will be re-queried — JSONL is the last hop to a tokenizer. */
  def writeShardsJsonl(docs: DataFrame, outDir: String, nShards: Int = 8): Unit =
    prepareShards(docs, nShards).json(outDir)

  /** Loader-side integrity check: recompute each written shard's
    * manifest row from the files in `outDir` and diff it against the
    * expected manifest. Returns the mismatching shards (missing,
    * extra, or any field off — the XOR fingerprint catches content
    * drift the counts alone would miss). Empty result = the export on
    * disk is exactly what the manifest promises. One scan of the
    * written data, grouped on the directory-partition column. */
  def verifyShards(spark: org.apache.spark.sql.SparkSession, outDir: String,
                   expected: DataFrame, format: String = "parquet"): DataFrame = {
    // the export schema is fixed by prepareShards; stating it for JSON
    // skips the full-file inference scan (parquet reads footers only)
    val reader = spark.read.format(format)
    val actual = (if (format == "json")
        reader.schema("doc_id LONG, text STRING, n_tokens LONG, shard LONG")
      else reader).load(outDir)
      .withColumn("doc_h",
        conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10).cast("long"))
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"),
        expr("bit_xor(doc_h)").as("ids_fp"))
    val cols = Seq("shard", "n_docs", "total_tokens", "min_doc_id", "max_doc_id", "ids_fp")
    actual.select(cols.map(col): _*)
      .exceptAll(expected.select(cols.map(col): _*))
      .unionByName(
        expected.select(cols.map(col): _*)
          .exceptAll(actual.select(cols.map(col): _*)))
  }

  /** Per-shard manifest: doc count, token total, id range, and an
    * order-independent membership fingerprint — XOR of each doc's
    * 52-bit md5-derived hash. XOR commutes, so the aggregate is
    * map-side combined with CONSTANT per-group state (a collect-ids
    * fingerprint would buffer the whole shard's id list in one
    * aggregation buffer — the thing that OOMs at 100 TB); ids are
    * unique per shard, so the self-cancelling property of XOR on
    * repeated values cannot fire. */
  def shardManifest(docs: DataFrame, nShards: Int = 8): DataFrame =
    docs.select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).as("n_tokens"))
      .withColumn("shard", Curation.hashMod(col("doc_id"), "shard", nShards))
      .withColumn("doc_h",
        conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10).cast("long"))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"),
        expr("bit_xor(doc_h)").as("ids_fp"))
}
