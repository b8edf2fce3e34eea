package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Curation, Similarity}

/** SemDeDup cost-model probe: for one embeddings tier, print the
  * quantities the SemDeDup scale claim rests on — corpus size n, cell
  * count k = `semdedupCellsFor(n, 1000)`, the cell-occupancy
  * distribution under the fixed md5 centroids, and the candidate pair
  * count Σ occ·(occ−1)/2 (the within-cell join's actual work, BEFORE
  * the threshold filter — the threshold prunes output, not
  * comparisons). Beyond the knee the claim is candidates ≈ n·500, i.e.
  * candidates/n stays flat as n grows; this main is the measurement
  * behind SCALING.md's beyond-the-knee table
  * (`runMain graft.SemDedupProbe <sfDir> [targetCellSize]`).
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SemDedupProbe <sfDir> [targetCellSize]")
    val dir = args(0)
    val target = if (args.length > 1) args(1).toLong else 1000L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = e.count()
    val k = Curation.semdedupCellsFor(n, target)
    val prep = Similarity.prepared(e)
    // both quantizers, so the balance argument stays a measurement:
    // `sampled` is what semdedupPairs ships; `fixed` is the retired
    // off-data matrix kept here as the skew yardstick
    val quantizers = Seq(
      "sampled" -> Similarity.sampledCentroids(prep, k),
      "fixed" -> Similarity.fixedCentroids(k, 64))
    quantizers.foreach { case (qname, cs) =>
      val occ = Similarity.assignCells(prep, cs)
        .groupBy(col("cell")).agg(count(lit(1)).as("occ"))
        .agg(
          count(lit(1)).as("cells_nonempty"),
          min(col("occ")).as("occ_min"),
          expr("percentile_approx(occ, 0.5)").as("occ_p50"),
          max(col("occ")).as("occ_max"),
          sum(col("occ") * (col("occ") - 1)).cast("long").as("candidates2"))
        .collect()(0)
      val candidates = occ.getAs[Long]("candidates2") / 2
      println(f"[probe] dir=$dir quantizer=$qname n=$n k=$k target=$target " +
        f"cells_nonempty=${occ.getAs[Long]("cells_nonempty")} " +
        f"occ_min=${occ.getAs[Long]("occ_min")} occ_p50=${occ.get(occ.fieldIndex("occ_p50"))} " +
        f"occ_max=${occ.getAs[Long]("occ_max")} candidates=$candidates " +
        f"cand_per_vec=${candidates.toDouble / n}%.1f")
    }
    spark.stop()
  }
}
