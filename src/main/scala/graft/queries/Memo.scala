package graft.queries

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-corpus materialization registry — the persist-once/consume-many
  * contract behind the dedup pair graph, the MinHash index, the PQ
  * model, and the quality gate, in ONE place with a lifetime.
  *
  * Round-9 shape (a bare ConcurrentHashMap per tier) had two findings
  * against it: entries were never evicted (a long-lived session cycling
  * corpora pins checkpointed blocks forever) and the bench could not
  * reset them (so the one sample that paid a build was discarded by the
  * best-of-3 min and the build cost appeared in no pinned number). This
  * registry fixes both:
  *
  *  - entries are keyed (session, corpus dir, tier) and bounded per
  *    session to [[MaxDirsPerSession]] corpus dirs — inserting a new
  *    dir past the bound unpersists and drops every entry of that
  *    session's least-recently-used dir (checkpointed RDD blocks are
  *    freed, not just dereferenced);
  *  - [[reset]] drops everything (Bench calls it between round-robin
  *    passes so every pass pays each build exactly once, in the
  *    registered *_build query that owns it);
  *  - [[invalidate]] drops one session's entries (session teardown).
  *
  * Builders hand back `(value, frames)` where `frames` are the
  * localCheckpoint'ed DataFrames whose blocks the entry owns — the
  * registry frees them via the checkpoint leaf's RDD on evict. Dir
  * contents are treated as immutable for an entry's lifetime (the same
  * contract the persisted ANN index tables rely on).
  */
private[graft] object Memo {

  /** How many distinct corpus dirs one session may hold materializations
    * for before the least-recently-used dir's entries are evicted. Two
    * covers every real shape in this repo (a bench/verify run uses one
    * dir; the incremental-dedup twin probes a batch against a standing
    * corpus) while keeping a corpus-cycling session's footprint flat.
    */
  private[graft] val MaxDirsPerSession = 2

  private final case class Entry(value: AnyRef, frames: Seq[DataFrame], var tick: Long)

  private val cache = mutable.LinkedHashMap[(SparkSession, String, String), Entry]()
  private var clock = 0L

  /** Build locks, one per (session, corpus dir). Layered memos (tier B's
    * build calling tier A's `cached`) only ever nest WITHIN one
    * (session, dir), so the inner lookup re-enters the SAME
    * ReentrantLock — while two sessions, or one session on two corpus
    * dirs, build in parallel. A naive per-KEY lock would deadlock the
    * layered case across sessions acquiring in opposite order.
    */
  private val stripes =
    mutable.Map[(SparkSession, String), java.util.concurrent.locks.ReentrantLock]()

  /** Memoize `build` per (session, dir) under tier key `key`. `build`
    * returns the value plus the checkpointed frames the entry owns.
    *
    * Locking (round-12 striping — the r10/r11 registry-wide
    * `synchronized` serialized one session's 9 s graph build against
    * another session's unrelated 0.1 s lookup): cache HITS take only a
    * short global mutex and never wait on any build; a MISS takes the
    * (session, dir) stripe for the duration of `build`, so only builds
    * and lookups of the SAME corpus in the SAME session queue behind
    * it. LRU bookkeeping stays under the global mutex, taken strictly
    * after `build` finishes — never held across it.
    */
  def cached[T <: AnyRef](spark: SparkSession, dir: String, key: String)(
      build: => (T, Seq[DataFrame])): T = {
    val k = (spark, dir, key)
    def hit(): Option[T] = synchronized {
      cache.get(k).map { e => clock += 1; e.tick = clock; e.value.asInstanceOf[T] }
    }
    hit() match {
      case Some(v) => v
      case None =>
        val lock = synchronized {
          stripes.getOrElseUpdate((spark, dir),
            new java.util.concurrent.locks.ReentrantLock())
        }
        lock.lock()
        try hit() match { // re-check: a racing builder may have won the stripe
          case Some(v) => v
          case None =>
            val (v, frames) = build
            synchronized {
              clock += 1
              evictForInsert(spark, dir)
              cache.put(k, Entry(v, frames, clock))
            }
            v
        } finally lock.unlock()
    }
  }

  /** One-frame convenience: checkpoints `build` eagerly and owns it. */
  def frame(spark: SparkSession, dir: String, key: String)(
      build: => DataFrame): DataFrame =
    cached(spark, dir, key) {
      val df = build.localCheckpoint()
      (df, Seq(df))
    }

  /** If (spark, dir) is a NEW dir for this session and the session is
    * at its dir bound, evict every entry of its least-recently-used dir
    * whose stripe is free. A dir mid-build on another thread is skipped
    * (tryLock — non-blocking, so no lock-order deadlock against stripe
    * holders): unpersisting a localCheckpoint'ed frame under a running
    * consumer would fail its truncated lineage, and the bound is a
    * footprint guideline, not an invariant.
    */
  private def evictForInsert(spark: SparkSession, dir: String): Unit = {
    val dirs = cache.keys.collect { case (s, d, _) if s eq spark => d }.toSet
    if (!dirs.contains(dir) && dirs.size >= MaxDirsPerSession) {
      val byLru = dirs.toSeq.sortBy(d =>
        cache.collect { case ((s, dd, _), e) if (s eq spark) && dd == d => e.tick }.max)
      byLru.find { d =>
        stripes.get((spark, d)) match {
          case None =>
            drop { case (s, dd, _) => (s eq spark) && dd == d }
            true
          case Some(l) if l.tryLock() =>
            try drop { case (s, dd, _) => (s eq spark) && dd == d }
            finally l.unlock()
            true
          case _ => false
        }
      }
      ()
    }
  }

  /** Free the checkpointed blocks of a localCheckpoint'ed frame: the
    * checkpoint is a LogicalRDD leaf whose RDD holds the blocks.
    */
  private[graft] def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        try lr.rdd.unpersist(false) catch { case _: Throwable => () }
      case _ => ()
    }

  private def drop(p: ((SparkSession, String, String)) => Boolean): Unit = {
    val victims = cache.keys.filter(p).toSeq
    victims.foreach { k =>
      cache.remove(k).foreach(_.frames.foreach(unpersistCheckpoint))
    }
  }

  /** Drop every entry (all sessions) — bench pass boundaries. Stripes
    * currently held by an in-flight build are kept (removing one would
    * let a new lock mint a second concurrent builder for the same dir);
    * idle stripes go so session references don't outlive their entries.
    */
  def reset(): Unit = synchronized {
    drop(_ => true)
    stripes.filterInPlace { case (_, l) => l.isLocked }
  }

  /** Drop one session's entries — session teardown. */
  def invalidate(spark: SparkSession): Unit = synchronized {
    drop { case (s, _, _) => s eq spark }
    stripes.filterInPlace { case ((s, _), l) => !(s eq spark) || l.isLocked }
  }

  /** Entry count (specs). */
  private[graft] def size: Int = synchronized { cache.size }
}
