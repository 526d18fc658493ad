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
