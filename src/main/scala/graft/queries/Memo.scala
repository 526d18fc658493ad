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

  /** Memoize `build` per (session, dir) under tier key `key`. `build`
    * returns the value plus the checkpointed frames the entry owns;
    * builds are serialized (they checkpoint eagerly — racing two is
    * pure waste, and the dedup/ANN tiers layer memos, so a per-key lock
    * could deadlock on the re-entrant inner lookup).
    *
    * MULTI-TENANT NOTE (single-session runs — the driver, the bench,
    * the probes — never see this): the registry-wide lock means one
    * session paying a 9 s graph build blocks another session's
    * unrelated 0.1 s lookup. The re-entrant layering is why a naive
    * per-key lock is unsafe: tier B's build calls tier A's `cached`
    * on the SAME thread, so two sessions building B(A) in opposite
    * key-acquisition order would deadlock. The right concurrent shape,
    * if this ever fronts concurrent sessions, is a lock per (session,
    * dir) — layered builds only ever nest WITHIN one (session, dir),
    * so the nesting re-enters the same lock (use a ReentrantLock, not
    * `synchronized` on the map) and cross-session/cross-corpus builds
    * proceed in parallel; the LRU bookkeeping stays under a short
    * global mutex taken strictly after the build finishes (never while
    * holding it across `build`).
    */
  def cached[T <: AnyRef](spark: SparkSession, dir: String, key: String)(
      build: => (T, Seq[DataFrame])): T = synchronized {
    clock += 1
    val k = (spark, dir, key)
    cache.get(k) match {
      case Some(e) =>
        e.tick = clock
        e.value.asInstanceOf[T]
      case None =>
        evictForInsert(spark, dir)
        val (v, frames) = build
        cache.put(k, Entry(v, frames, clock))
        v
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
    * at its dir bound, evict every entry of its least-recently-used dir.
    */
  private def evictForInsert(spark: SparkSession, dir: String): Unit = {
    val dirs = cache.keys.collect { case (s, d, _) if s eq spark => d }.toSet
    if (!dirs.contains(dir) && dirs.size >= MaxDirsPerSession) {
      val lru = dirs.minBy(d =>
        cache.collect { case ((s, dd, _), e) if (s eq spark) && dd == d => e.tick }.max)
      drop { case (s, d, _) => (s eq spark) && d == lru }
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

  /** Drop every entry (all sessions) — bench pass boundaries. */
  def reset(): Unit = synchronized { drop(_ => true) }

  /** Drop one session's entries — session teardown. */
  def invalidate(spark: SparkSession): Unit =
    synchronized { drop { case (s, _, _) => s eq spark } }

  /** Entry count (specs). */
  private[graft] def size: Int = synchronized { cache.size }
}
