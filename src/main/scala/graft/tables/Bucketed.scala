package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins: pay the shuffle ONCE at
  * write time, then every subsequent equality join on the bucket key
  * runs with zero Exchange on either side.
  *
  * This is the Spark-native stand-in for the reference's permanent
  * B-tree indexes (`init.sql`): the reference makes point/join access
  * cheap with an index it maintains on every insert; Spark makes
  * repeated large joins cheap with a layout it pays for on every
  * write. At 100 TB the fact-to-fact join (e.g. lineitem ⋈ orders,
  * logs ⋈ transactions) is the dominant shuffle in any analytics run —
  * with both sides bucketed on the join key into the same bucket
  * count, Catalyst's EnsureRequirements sees compatible hash
  * partitionings and plans a SortMergeJoin straight over the scans.
  * `BucketedJoinSpec` machine-checks that invariant (no
  * ShuffleExchange in the executed plan) rather than trusting the
  * docs.
  *
  * Bucket count is the parallelism dial: production sizes buckets to
  * task-sized splits (e.g. 100 TB / 256 MB ≈ 400k buckets is too many
  * files — pick thousands of buckets and let each bucket hold several
  * row groups; what matters for the join is equal counts on both
  * sides).
  */
object Bucketed {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table in the
    * session catalog/warehouse. Overwrites an existing table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, key).sortBy(key)
      .saveAsTable(table)

  /** Drop `table` from the catalog AND delete any leftover warehouse
    * location. A fresh JVM has an empty in-memory catalog, but the
    * warehouse directory on disk survives across runs — an orphaned
    * managed-table location makes `saveAsTable` throw
    * LOCATION_ALREADY_EXISTS unless cleared first. */
  def resetTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // Resolve the leftover location through Hadoop's FileSystem, not
    // java.io.File: the warehouse may be hdfs:// or s3a://, where a
    // local-path delete silently does nothing and the next saveAsTable
    // dies on LOCATION_ALREADY_EXISTS.
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true): Unit
  }

  /** Equality join of two bucketed tables on their bucket keys. With
    * matching bucket counts this plans shuffle-free. */
  def cooperativeJoin(spark: SparkSession, left: String, leftKey: String,
                      right: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))
}
