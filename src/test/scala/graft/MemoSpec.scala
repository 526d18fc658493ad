package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Memo

/** Lifetime of the per-corpus materialization registry (VERDICT r9
  * findings 1+2): entries are bounded per session, eviction actually
  * frees checkpointed blocks, and reset() returns the session to its
  * pre-memo storage footprint — a corpus-cycling session must not grow
  * monotonically.
  */
class MemoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mkCorpus(tag: String): String = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"graft-memo-$tag").toString
    val docs = (1L to 40L).map { i =>
      val body = (0 until 30).map(j => s"w${(i * 7 + j * 3) % 11}").mkString(" ")
      (i, s"the a of to and in is $tag $body", "en", "test", 40L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("memo builds once per (session, dir, key) and reset() drops the entry") {
    Memo.reset()
    var builds = 0
    def get() = Memo.frame(spark, "/memo-spec/dirX", "probe") {
      builds += 1
      spark.range(3).toDF("n")
    }
    assert(get().count() == 3 && builds == 1)
    assert(get().count() == 3 && builds == 1) // cached, no rebuild
    Memo.reset()
    assert(get().count() == 3 && builds == 2) // reset forced a rebuild
    Memo.reset()
  }

  test("cycling corpora through one session does not grow checkpointed blocks monotonically") {
    Memo.reset()
    val dirs = Seq("a", "b", "c").map(mkCorpus)
    val blocks = dirs.map { d =>
      // two memoized tiers per corpus: the simhash pair graph +
      // components (neardup_graph_build) and the quality gate
      SparkEntry.queries("neardup_graph_build")(spark, d).count()
      SparkEntry.queries("text_quality_filter")(spark, d).count()
      spark.sparkContext.getPersistentRDDs.size
    }
    // bound = MaxDirsPerSession dirs: the third corpus must evict the
    // first's entries, so the persisted-RDD count stops growing
    assert(blocks(2) <= blocks(1),
      s"checkpointed block count grew monotonically across corpora: $blocks")
    // and a full reset returns the session to (at most) its pre-test
    // footprint — eviction really unpersists, not just dereferences
    Memo.reset()
    assert(spark.sparkContext.getPersistentRDDs.size <= blocks(0),
      "reset() left checkpointed blocks behind")
  }

  test("builds on two distinct corpus dirs run concurrently (striped locks)") {
    // r10/r11 carried a registry-wide build lock: one session's 9 s
    // graph build serialized an unrelated lookup. The striped design
    // must let two dirs build at once.
    Memo.reset()
    val aStarted = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val slow = new Thread(() =>
      Memo.frame(spark, "/memo-spec/slow-dir", "k") {
        aStarted.countDown()
        release.await(30, java.util.concurrent.TimeUnit.SECONDS)
        spark.range(1).toDF("n")
      })
    slow.start()
    assert(aStarted.await(30, java.util.concurrent.TimeUnit.SECONDS))
    // while the slow dir's build is in flight, a different dir builds...
    val other = Memo.frame(spark, "/memo-spec/fast-dir", "k") {
      spark.range(2).toDF("n")
    }
    assert(other.count() == 2, "unrelated dir's build blocked behind the slow one")
    // ...and a HIT on a third key is served from the fast path
    Memo.frame(spark, "/memo-spec/fast-dir", "k")(fail("should be cached"))
    release.countDown()
    slow.join(30000)
    assert(!slow.isAlive)
    Memo.reset()
  }

  test("layered memos re-enter the same dir's stripe without deadlock") {
    Memo.reset()
    var innerBuilds = 0
    val outer = Memo.frame(spark, "/memo-spec/layered", "outer") {
      // tier B's build consults tier A of the SAME (session, dir) on the
      // same thread — the ReentrantLock stripe must re-enter, not hang
      val inner = Memo.frame(spark, "/memo-spec/layered", "inner") {
        innerBuilds += 1
        spark.range(4).toDF("n")
      }
      inner.filter("n >= 1")
    }
    assert(outer.count() == 3 && innerBuilds == 1)
    Memo.reset()
  }

  test("LRU eviction keeps the recently-used dir, drops the stale one") {
    Memo.reset()
    val built = scala.collection.mutable.ArrayBuffer[String]()
    def get(dir: String) = Memo.frame(spark, dir, "k") {
      built += dir
      spark.range(1).toDF("n")
    }
    get("/memo-spec/A"); get("/memo-spec/B") // at the bound of 2 dirs
    get("/memo-spec/A")                      // A is now most recent
    get("/memo-spec/C")                      // must evict B, not A
    built.clear()
    get("/memo-spec/A")
    assert(built.isEmpty, "A was evicted despite being most recently used")
    get("/memo-spec/B")
    assert(built.toSeq == Seq("/memo-spec/B"), "stale B should have been evicted")
    Memo.reset()
  }
}
