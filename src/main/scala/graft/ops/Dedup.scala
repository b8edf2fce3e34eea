package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline over the
  * `documents` table: exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design: no operator here ever does an unblocked all-pairs
  * join. MinHash/SimHash candidates come from equality joins on band
  * signatures (shuffle on the band key, bucket sizes bounded by the
  * LSH false-positive rate); n-gram Jaccard is blocked on a grouping
  * key. Signatures are computed per-row with higher-order functions —
  * no explode of the shingle sets through a shuffle.
  */
object Dedup {

  /** Exact dedup: md5(text) fingerprint, min doc_id survives —
    * the reference's ON CONFLICT DO NOTHING (`src/db.rs:97`) lifted
    * to content identity. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("fingerprint"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  /** doc_id + distinct 3-word shingle set (docs with < 3 tokens have
    * no shingles and are excluded, mirroring the oracle). */
  def shingled(docs: DataFrame): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    docs.select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), TextAnalysis.shingles(col("toks")).as("shingles"))
  }

  /** MinHash signature: k independent hash functions realized as
    * lexicographic min of md5(j:shingle) — one per-row projection,
    * no shuffle, deterministic across engines (oracle mirrors it).
    */
  def withMinhashSignature(sh: DataFrame, k: Int = 12): DataFrame =
    sh.withColumn("sig", transform(
      sequence(lit(0), lit(k - 1)),
      j => array_min(transform(col("shingles"),
        s => md5(concat(j.cast("string"), lit(":"), s))))))

  /** LSH banding: k/rowsPerBand bands, each band = md5 of its rows'
    * concatenated minhashes. Explodes to (doc_id, band, band_sig). */
  def minhashBands(sig: DataFrame, k: Int = 12, rowsPerBand: Int = 2): DataFrame = {
    val nBands = k / rowsPerBand
    val bands = transform(
      sequence(lit(0), lit(nBands - 1)),
      b => md5(concat_ws("|",
        (1 to rowsPerBand).map(r => element_at(col("sig"), b * rowsPerBand + r)): _*)))
    sig.select(col("doc_id"), posexplode(bands).as(Seq("band", "band_sig")))
  }

  /** Full MinHash/LSH near-dup pipeline: shingle → sign → band →
    * bucket self-join (equality on band+signature, so the join is a
    * shuffle on the bucket key, never a cross product) → exact
    * Jaccard verification of candidates.
    *
    * Returns (doc_a, doc_b, jaccard) with doc_a < doc_b and
    * jaccard >= threshold, rounded to 4 decimals.
    */
  def minhashPairs(docs: DataFrame, k: Int = 12, rowsPerBand: Int = 2,
                   threshold: Double = 0.6): DataFrame = {
    val sh = shingled(docs)
    val bands = minhashBands(withMinhashSignature(sh, k), k, rowsPerBand)
    val a = bands.select(col("doc_id").as("doc_a"), col("band"), col("band_sig"))
    val b = bands.select(col("doc_id").as("doc_b"), col("band"), col("band_sig"))
    val cands = a.join(b, Seq("band", "band_sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    val shA = sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val shB = sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    cands.join(shA, "doc_a").join(shB, "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .filter(jaccardAtLeast(col("inter"), col("uni"), threshold))
      .select(col("doc_a"), col("doc_b"), jaccardBp(col("inter"), col("uni")).as("jaccard_bp"))
  }

  /** Exact Jaccard as integer basis points (⌊10000·|∩|/|∪|⌋) — integer
    * arithmetic so every engine agrees bit-for-bit. */
  def jaccardBp(inter: Column, uni: Column): Column =
    floor((inter.cast("long") * 10000) / uni.cast("long")).cast("long")

  /** jaccard >= threshold via integer cross-multiplication (exact; no
    * float threshold comparison). Threshold expressed in 1/1000ths. */
  def jaccardAtLeast(inter: Column, uni: Column, threshold: Double): Column = {
    val th = math.round(threshold * 1000)
    inter.cast("long") * 1000 >= uni.cast("long") * th
  }

  /** Blocked n-gram Jaccard: all pairs *within a blocking key* (here
    * `source` — at scale the block bounds the quadratic term), kept at
    * jaccard >= threshold. */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.2): DataFrame = {
    val sh = {
      val toks = TextAnalysis.tokens(col("text"))
      docs.select(col("doc_id"), col("source"), toks.as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), col("source"), TextAnalysis.shingles(col("toks")).as("shingles"))
    }
    val a = sh.select(col("source"), col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val b = sh.select(col("source"), col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    a.join(b, Seq("source"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .filter(jaccardAtLeast(col("inter"), col("uni"), threshold))
      .select(col("source"), col("doc_a"), col("doc_b"),
        jaccardBp(col("inter"), col("uni")).as("jaccard_bp"))
  }

  /** SimHash near-dup: 64-bit signature via the native
    * [[graft.functions.SimHash64]] expression, banded into 4×16-bit
    * chunks for LSH (Hamming distance <= 3 guarantees a shared band by
    * pigeonhole when bands=4), candidates verified by exact Hamming
    * distance.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val sigs = docs.select(col("doc_id"), toks.as("toks"))
      .withColumn("simhash", expr("simhash64(toks)"))
      .select(col("doc_id"), col("simhash"))
    val banded = sigs.select(col("doc_id"), col("simhash"),
      posexplode(array((0 to 3).map(b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("band", "chunk")))
    val a = banded.select(col("band"), col("chunk"),
      col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
    val b = banded.select(col("band"), col("chunk"),
      col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(sim_a ^ sim_b)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
