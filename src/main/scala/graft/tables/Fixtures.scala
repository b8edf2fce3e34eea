package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated fixture tables (TESTDATA.md).
  *
  * One parquet file per table under the scale-factor dir. At cluster
  * scale these would be multi-file partitioned datasets; the read path
  * is identical (`spark.read.parquet` on a directory), so nothing here
  * changes at 100 TB — partition pruning / row-group pruning come from
  * the parquet source, not from this loader.
  */
object Fixtures {
  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is epoch-nanos (LongType) everywhere in this engine,
    * regardless of how the fixture generator typed the column:
    *
    *  - parquet TIMESTAMP(NANOS) (rounds ≤8): Spark's reader rejects it
    *    unless nanos are read back as raw longs — the legacy switch
    *    does that (session-level, runtime-settable).
    *  - parquet timestamp[us] (round 9 regeneration): read as a
    *    timestamp and converted to epoch nanos. The NTZ cast is
    *    interpreted in the session time zone, which this engine pins
    *    to UTC (build.sbt javaOptions + every session builder), so the
    *    conversion is exact; the DuckDB oracles use unit-agnostic
    *    `date_trunc`/`epoch_us` and need no change.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ =>
        import org.apache.spark.sql.functions.{col, unix_micros}
        df.withColumn("ts",
          unix_micros(col("ts").cast(org.apache.spark.sql.types.TimestampType)) * 1000L)
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  def partTable(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
}
