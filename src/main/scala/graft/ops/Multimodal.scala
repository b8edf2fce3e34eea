package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque media payload row: binary bytes + typed metadata, the
  * multimodal-column model for a training-data pipeline. */
final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

/** Stub "decoded" features — what a real image/audio decoder would
  * emit. The decode itself is a deterministic fake (no codec libs in
  * this container); the Spark-side plumbing (schema, typed Dataset,
  * partition-batched decode, output shape) is real and oracle-checked.
  */
final case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
                               checksum: String, width: Long, height: Long,
                               frames: Long)

/** Multimodal columns: treat image/audio/video as opaque `binary`
  * with typed metadata; decode / feature-extract runs as a
  * partition-batched typed transformation (`mapPartitions` over a
  * `Dataset[MediaRow]`, batches of 64 — the same batch shape a
  * vectorized decoder / Pandas-UDF analog would use). At scale this
  * is embarrassingly parallel: no shuffle, one pass, decoder state
  * amortized per batch.
  */
object Multimodal {

  val BatchSize = 64

  /** Attach a binary payload + media_type to each document (the
    * fixture has no real media, so the payload is the UTF-8 text
    * bytes — opaque bytes as far as the pipeline is concerned). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("payload"))

  /** REAL (non-stub) feature extraction over the opaque payload bytes:
    * length, distinct-byte count, and mean byte value — the
    * codec-free signals (size, entropy proxy, brightness proxy) a
    * media-quality gate can compute on ANY binary column without
    * decoding it. Backed by the native [[graft.functions.ByteStats]]
    * expression — one codegen'd pass over the raw bytes per row (the
    * declarative hex→transform→aggregate form ran its lambdas
    * interpreted, ~13× slower at sf0.1). Oracle-checked bit-for-bit
    * (the DuckDB side computes the same integers from the hex
    * encoding), unlike the stubbed decode whose width/height are
    * placeholders. Map-only: at 100 TB this is one scan.
    * mean_byte_x100 is integer arithmetic — floats never leave. */
  def byteStats(media: DataFrame): DataFrame =
    media.select(col("doc_id"), col("media_type"),
        graft.functions.ByteStats.of(col("payload")).as("bs"))
      .select(col("doc_id"), col("media_type"),
        col("bs.payload_len").as("payload_len"),
        col("bs.n_distinct_bytes").as("n_distinct_bytes"),
        col("bs.byte_sum").as("byte_sum"))
      .select(col("doc_id"), col("media_type"), col("payload_len"),
        col("n_distinct_bytes"),
        // explicit null for an empty payload: Spark's div would yield
        // null anyway, but DuckDB errors on //0 — the CASE in the
        // oracle and this when() pin the SAME defined result in both
        when(col("payload_len") === 0, lit(null).cast("long"))
          .otherwise(expr("(byte_sum * 100) div payload_len"))
          .as("mean_byte_x100"))

  /** STUB DECODER — deterministic fake in place of a real codec
    * (marked per the build contract; a production build would swap in
    * an actual decoder here and keep every signature identical).
    * Width/height/frames derive from the byte length; the checksum is
    * a real md5 over the payload bytes. */
  private[ops] def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    batch.map { r =>
      digest.reset()
      val sum = digest.digest(r.payload).map("%02x".format(_)).mkString
      val n = r.payload.length.toLong
      MediaFeatures(r.doc_id, r.media_type, n, sum,
        width = 64 + n % 576,
        height = 64 + (n * 7) % 416,
        frames = if (r.media_type == "video") 1 + n % 30 else 1)
    }
  }

  /** Partition-batched decode: groups each partition's iterator into
    * [[BatchSize]] chunks so a real decoder could amortize setup per
    * batch (the mapInPandas/mapInArrow batch shape, in Scala). */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.grouped(BatchSize).flatMap(decodeBatch)
    }
  }

  /** Resize to a bounded box preserving aspect ratio — pure metadata
    * arithmetic on the decoded features (a real resizer transforms the
    * pixels too; the scale factor math is the part a pipeline plans
    * around). Integer-exact: scale = maxSide/longest in per-mille so
    * every engine rounds identically. */
  def resizeMeta(features: DataFrame, maxSide: Long = 256L): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    val scalePm = when(longest <= maxSide, lit(1000L))
      .otherwise((lit(maxSide) * 1000L).cast("long") / longest.cast("long"))
    features
      .withColumn("scale_pm", scalePm.cast("long"))
      .withColumn("out_width", (col("width") * col("scale_pm") / lit(1000L)).cast("long"))
      .withColumn("out_height", (col("height") * col("scale_pm") / lit(1000L)).cast("long"))
      .select(col("doc_id"), col("media_type"), col("width"), col("height"),
        col("scale_pm"), col("out_width"), col("out_height"))
  }

  /** Frame sampling for video rows: one output row per sampled frame
    * index (every `stride`-th frame) — the explode shape a real frame
    * extractor feeds downstream encoders with. Non-video rows sample
    * their single frame 0. */
  def frameSample(features: DataFrame, stride: Long = 10L): DataFrame =
    features
      .withColumn("frame_idx",
        explode(sequence(lit(0L), col("frames") - 1, lit(stride))))
      .select(col("doc_id"), col("media_type"), col("frames"), col("frame_idx"))
}
