package graft

/** The sf1 scale tier as a one-command, independently re-runnable
  * measurement: regenerate the tier if absent (deterministic — seed 42
  * throughout `tools/gen_sf1.py`, so every rebuild is bit-identical to
  * the recorded one) and run the full [[Bench]] registry against it.
  *
  *   sbt "runMain graft.BenchSf1"           # localdata/sf1, building it if needed
  *   sbt "runMain graft.BenchSf1 /some/dir" # explicit tier directory
  *
  * This is the recipe behind `BENCH_SF1.json` / SCALING.md's 10×-data
  * wall-ratio table: a future round's driver (or any reader) can
  * re-measure the tier as cheaply as sf0.1 instead of trusting a
  * builder-recorded number. The bench line lands on stdout and in
  * `target/bench.json` exactly like the sf0.1 run.
  */
object BenchSf1 {
  /** Every table the registry reads: the presence probe must cover ALL
    * of them — an interrupted generation (kill/OOM mid-run) leaves a
    * prefix of these on disk, and probing only the first-written file
    * would wedge the tier as permanently half-built. Any missing table
    * triggers a full (idempotent, overwriting) regeneration. */
  private val RequiredTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "localdata/sf1"
    def missing() = RequiredTables.filterNot(t => new java.io.File(dir, s"$t.parquet").exists())
    if (missing().nonEmpty) {
      System.err.println(s"[bench-sf1] $dir incomplete (missing ${missing().mkString(", ")}) " +
        "— generating (deterministic, ~1 min)")
      val rc = new ProcessBuilder("python3", "tools/gen_sf1.py", dir)
        .inheritIO().start().waitFor()
      require(rc == 0, s"tools/gen_sf1.py exited $rc")
      require(missing().isEmpty, s"generator ran but ${missing().mkString(", ")} still missing")
    }
    Bench.run(dir)
  }
}
