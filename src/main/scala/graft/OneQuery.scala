package graft

import org.apache.spark.sql.SparkSession

/** Single-query profiling harness: run one registry entry (or a
  * comma-separated sequence, to reproduce in-session interactions
  * like cache pressure from an earlier query) against one sf
  * directory, print wall times and the last query's formatted
  * physical plan. The Bench main times the whole registry; this is
  * the drill-down for a slow entry
  * (`runMain graft.OneQuery <q1[,q2,...]> <sfDir> [repeats]`).
  */
object OneQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: OneQuery <queryName[,query2,...]> <sfDir> [repeats]")
    val (names, sfDir) = (args(0).split(',').toSeq, args(1))
    val repeats = if (args.length > 2) args(2).toInt else 1
    val fns = names.map { n =>
      n -> SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query '$n'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    }
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      // scan-split dial, mirroring Bench: sized to the tier's physical
      // layout (see Bench.scanOpenCostFor — 128 KB for row-grouped
      // tiers so map stages parallelize, the 4 MB floor for the
      // single-row-group testdata tiers where splits cannot help)
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPEN_COST", Bench.scanOpenCostFor(sfDir).toString))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Mirror Bench's measurement conditions (override with
    // SPARK_GRAFT_PRELUDE=off to profile a truly cold session):
    // session bring-up warmed by a tiny noop write, and — when any
    // requested query consumes the session-shared MinHash bases — the
    // same eager family prelude Bench runs before timing.
    if (sys.env.getOrElse("SPARK_GRAFT_PRELUDE", "on") != "off") {
      graft.tables.Fixtures.events(spark, sfDir).limit(100)
        .write.mode("overwrite").format("noop").save()
      // every registry entry that consumes the session-shared MinHash
      // bases (shingles/bands/pairs/edge cut) — the incremental forms
      // read the shared band/shingle tables too
      val minhashConsumers =
        Set("dedup_minhash", "dedup_apply", "dedup_apply_best", "pipeline_curate",
          "dedup_inc", "dedup_inc_apply", "curate_inc")
      if (names.exists(minhashConsumers)) {
        val t0 = System.nanoTime()
        graft.ops.Dedup.prewarmShared(graft.tables.Fixtures.documents(spark, sfDir))
        println(f"[onequery] prelude (shared dedup bases): ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    fns.zipWithIndex.foreach { case ((name, fn), idx) =>
      (1 to repeats).foreach { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.write.mode("overwrite").format("noop").save()
        println(f"[onequery] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        // positional compare, not by name: a sequence may legitimately
        // repeat a query name (cache-pressure repro) — only the final
        // entry prints its plan
        if (i == repeats && idx == fns.size - 1)
          println(df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      }
    }
    spark.stop()
  }
}
