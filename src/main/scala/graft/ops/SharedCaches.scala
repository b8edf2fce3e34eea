package graft.ops

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.storage.StorageLevel

/** Sized budget for the engine's session-shared caches.
  *
  * The near-dup/segment/shingle bases persist so that one
  * materialization feeds every plan leg and every query of a family
  * (see [[Dedup.sharedShingleRows]]); Spark's `CacheManager` dedups
  * the entries by canonical plan, but nothing ever REMOVES them — a
  * long-lived session (the bench run, a notebook, a serving process)
  * accumulates one entry per (operator family × input) until the
  * block manager starts evicting partitions underneath whichever
  * query runs next. That failure mode is invisible at fixture scale
  * and pathological at 100 TB, where a single evicted shingle-base
  * partition recomputes a tokenize+explode stage mid-join.
  *
  * This registry makes the lifetime explicit and BOUNDED:
  *   - every shared persist site acquires through [[shared]], keyed by
  *     the plan's canonical form (the same identity `CacheManager`
  *     uses), so re-acquisition is a cache hit, never a second entry;
  *   - entries beyond `spark.graft.cache.maxEntries` (default
  *     [[DefaultMaxEntries]]) evict least-recently-acquired first,
  *     PER SESSION — a session's budget counts and evicts only its
  *     own entries, so one small-capped tenant cannot drain another's
  *     caches — and eviction is safe by construction (an unpersisted
  *     base recomputes from lineage, exactly as on executor loss);
  *   - [[releaseFamily]] / [[releaseAll]] give batch drivers
  *     (e.g. [[graft.Bench]]) a deterministic end-of-family /
  *     end-of-run hook.
  *
  * The default cap is sized ABOVE the full registry's distinct shared
  * plans (~12 at one scale factor), so a normal run never evicts and
  * bench numbers are unchanged; it exists to turn "unbounded growth"
  * into "LRU over a budget" for sessions that outlive one registry
  * sweep. Per-micro-batch persists with an explicit unpersist in the
  * same scope (e.g. [[graft.ingest.StreamingIngester]]) stay outside
  * the registry: their lifetime is already exact.
  */
object SharedCaches {

  /** Above the registry's distinct shared plans per scale factor
    * (measured high-water 23 at the 121-query registry — the bench
    * logs it every run, and the round-20 checkpoint-cut conversions
    * added per-leg artifacts for the pipeline family); below what
    * would let a multi-tenant session hoard the block manager. */
  val DefaultMaxEntries = 32

  private final case class Entry(df: DataFrame, family: String)

  /** Insertion-ordered: head = least recently acquired. Keyed by the
    * owning session + the canonicalized analyzed plan (+ whether the
    * entry is a checkpoint CUT — a same-plan frame acquired through
    * [[shared]] and [[sharedCut]] is two different artifacts) — two
    * DataFrame objects with the same canonical plan are the same cache
    * entry, mirroring `CacheManager`'s own identity rule. */
  private val entries =
    mutable.LinkedHashMap.empty[(SparkSession, LogicalPlan, Boolean), Entry]

  /** Peak tracked-entry count since JVM start (observability: a bench
    * run logs it so cap-vs-actual is measured, not assumed). */
  @volatile private var highWaterMark = 0

  private def cap(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.cache.maxEntries")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(DefaultMaxEntries)

  /** Acquire a shared cache of `df`'s plan: persist-and-register on
    * first sight, LRU-touch and return the REGISTERED frame on
    * re-acquisition (so callers always hold the instance whose
    * `storageLevel` reflects the cache). Budget and eviction are
    * PER SESSION: each session's cap counts and evicts only its own
    * entries — a small-capped session must not drain another
    * session's caches out of the shared registry (they live in
    * different block-manager accountings anyway), and a stopped
    * session's leftovers must not occupy a live session's LRU slots.
    * Entries of stopped sessions are swept opportunistically on any
    * acquisition. */
  def shared(df: DataFrame, family: String,
             level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    acquire(df, family, level, cut = false)

  /** Like [[shared]], but the stored artifact is an EAGER
    * `localCheckpoint()` of `df` — materialized AND plan-truncated on
    * first acquisition, returned as-is on every later one. This is
    * the registry form of "one checkpoint cut per shared input": an
    * iterative consumer (e.g. [[Dedup.clusterLabels]]'s min-label
    * rounds) that must reference a frame from 2^rounds plan legs cuts
    * it once per session instead of once per invocation — the
    * re-materialization was the dominant cold cost of `dedup_apply`
    * and the query the r9/r11 contended driver runs inflated most.
    *
    * The materialization (a full Spark job, seconds at scale) runs
    * OUTSIDE the registry lock — `shared`'s lazy persist() is cheap
    * under the lock, an eager checkpoint is not, and holding it would
    * stall every unrelated acquisition in the JVM for the duration.
    * Two threads racing the same cold key may both materialize; the
    * second registration loses and its checkpoint blocks are
    * reclaimed by the ContextCleaner — duplicate work once, never a
    * serialized registry. Eviction likewise only forgets the
    * reference: a checkpoint's blocks are not CacheManager entries
    * (unpersist is a no-op on them) and free once the RDD is
    * unreachable. */
  def sharedCut(df: DataFrame, family: String): DataFrame = {
    val session = df.sparkSession
    val key = (session, df.queryExecution.analyzed.canonicalized, true)
    lookup(key) match {
      case Some(existing) => existing
      case None =>
        val cutDf = df.localCheckpoint() // outside the lock: a full job
        registerIfAbsent(key, cutDf, family)
    }
  }

  private def lookup(key: (SparkSession, LogicalPlan, Boolean)): Option[DataFrame] =
    synchronized {
      sweepStopped()
      entries.remove(key).map { e =>
        entries.put(key, e) // re-insert = move to most-recent
        e.df
      }
    }

  /** Register `stored` under `key` unless a racing thread already did
    * — the existing entry wins so every caller converges on ONE
    * artifact. Runs the budget eviction either way. */
  private def registerIfAbsent(key: (SparkSession, LogicalPlan, Boolean),
                               stored: DataFrame, family: String): DataFrame =
    synchronized {
      val winner = entries.remove(key) match {
        case Some(e) => e // raced: the first registration wins
        case None => Entry(stored, family)
      }
      entries.put(key, winner)
      highWaterMark = math.max(highWaterMark, entries.size)
      evictOver(key._1)
      winner.df
    }

  private def acquire(df: DataFrame, family: String, level: StorageLevel,
                      cut: Boolean): DataFrame =
    synchronized {
      sweepStopped()
      val session = df.sparkSession
      val key = (session, df.queryExecution.analyzed.canonicalized, cut)
      entries.remove(key) match {
        case Some(e) =>
          entries.put(key, e) // re-insert = move to most-recent
          e.df
        case None =>
          df.persist(level) // lazy: cheap under the lock
          entries.put(key, Entry(df, family))
          highWaterMark = math.max(highWaterMark, entries.size)
          evictOver(session)
          df
      }
    }

  /** Callers hold the lock. */
  private def sweepStopped(): Unit =
    // a stopped session's entries are dead weight: unpersist is a
    // no-op there, and they'd otherwise hold registry slots forever
    entries.filter(_._1._1.sparkContext.isStopped).toList
      .foreach { case (k, e) => drop(k, e) }

  /** Callers hold the lock. */
  private def evictOver(session: SparkSession): Unit = {
    val budget = cap(session)
    while (entries.count(_._1._1 eq session) > budget) {
      val (k, e) = entries.find(_._1._1 eq session).get
      drop(k, e)
    }
  }

  private def drop(key: (SparkSession, LogicalPlan, Boolean), e: Entry): Unit = {
    // non-blocking: eviction must never stall the acquiring query on
    // block deletion; a stopped session's unpersist is a no-op concern
    try e.df.unpersist(blocking = false)
    catch { case scala.util.control.NonFatal(_) => () }
    entries.remove(key)
  }

  /** Unpersist and forget every entry of `family` (end-of-family hook
    * for batch drivers that sweep families in order). */
  def releaseFamily(family: String): Unit = synchronized {
    entries.filter(_._2.family == family).foreach { case (k, e) => drop(k, e) }
  }

  /** Unpersist and forget everything (end-of-run hook). */
  def releaseAll(): Unit = synchronized {
    entries.toList.foreach { case (k, e) => drop(k, e) }
  }

  def trackedCount: Int = synchronized(entries.size)

  def trackedCount(family: String): Int =
    synchronized(entries.count(_._2.family == family))

  def highWater: Int = highWaterMark
}
