package graft.tools

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 absolute-threshold probe for the heaviest dedup/ANN tier.
  *
  * The winnowing lesson (round 7): a cutoff that passes at sf0.01 can
  * go DARK a decade up (fixed df cutoffs, saturating char-gram
  * vocabularies). This main probes the next decade above the bench
  * scale: it generates a deterministic sf1-shaped corpus (10× sf0.1 —
  * 50k documents, 20k embeddings) with the same statistical profile as
  * the driver's synthetic tables (31-word vocabulary, 20 sources,
  * 10–100-word docs, ~5% perturbed near-duplicate copies, 10 labelled
  * Gaussian embedding clusters with planted near-identical pairs), then
  * runs the slowest dedup/ANN queries against it and reports rows +
  * wall time. A query returning ZERO rows here has an absolute
  * threshold hiding in it — exactly the failure class the probe exists
  * to catch. The generated dir lives under the repo (testdata_sf1,
  * gitignored); /root/testdata itself is read-only.
  *
  * Usage: runMain graft.tools.ScaleProbe [outDir]
  */
object ScaleProbe {

  private val Vocab = Array(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window")
  private val Langs = Array("de", "en", "es", "fr", "zh")

  /** Deterministic uniform in [0, n) from md5 of the tag. */
  private def h(tag: String, n: Int): Int = {
    val d = MessageDigest.getInstance("MD5").digest(tag.getBytes("UTF-8"))
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (v % n).toInt
  }

  private def docText(id: Long): String = {
    val n = 10 + h(s"len:$id", 91) // 10..100 words, like the driver corpus
    // UNIFORM word draw — the driver corpus is flat (every vocab word
    // ~equal count at sf0.1); a skewed draw concentrates simhashes and
    // explodes the pair queries into a profile the real data doesn't have
    (0 until n).map(i => Vocab(h(s"w:$id:$i:a", Vocab.length))).mkString(" ")
  }

  def generate(spark: SparkSession, dir: String, nDocs: Long, nVecs: Long): Unit = {
    import spark.implicits._
    val docs = spark.range(nDocs).map { id =>
      // ~5% of docs are a near-duplicate of their predecessor: same
      // text with the final word swapped (high-Jaccard planted pairs,
      // the profile minhash/simhash/winnowing feed on)
      val base = if (id % 20 == 1) {
        val prev = docText(id - 1).split(' ')
        prev.init.mkString(" ") + " " + Vocab(h(s"swap:$id", Vocab.length))
      } else docText(id)
      (id, base, Langs(h(s"lang:$id", Langs.length)),
        s"src${h(s"src:$id", 20)}", base.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.repartition(32).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")

    val vecs = spark.range(nVecs).map { id =>
      val label = h(s"lab:$id", 10)
      def dim(vid: Long, i: Int): Float = {
        val lab = h(s"lab:$vid", 10)
        val centroid = (h(s"c:$lab:$i", 2001) - 1000) / 500.0f
        centroid + (h(s"e:$vid:$i", 2001) - 1000) / 1000.0f
      }
      // planted near-identical pairs for embedding_neardup
      val e =
        if (id % 50 == 1) (0 until 64).map(i => dim(id - 1, i) + 0.001f).toArray
        else (0 until 64).map(i => dim(id, i)).toArray
      (id, e, label)
    }.toDF("vec_id", "embedding", "label")
    vecs.repartition(8).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
  }

  /** The round-7 expensive tier + every banded/bucketed dedup shape. */
  private val ProbeQueries = Seq(
    "dedup_minhash_lsh", "dedup_components", "dedup_simhash_pairs",
    "dedup_ngram_jaccard", "winnowing_pairs", "semdedup",
    "cluster_representatives", "substring_scrub", "dedup_verdicts",
    "ann_pq", "ann_ivf_pq", "embedding_neardup", "ann_index_probe",
    "dedup_containment", "label_propagation")

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("testdata_sf1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scale-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fs = new java.io.File(s"$out/documents.parquet")
    if (!fs.exists()) {
      println(s"[probe] generating sf1 corpus under $out ...")
      generate(spark, out, nDocs = 50000L, nVecs = 20000L)
    }
    val results = ProbeQueries.map { name =>
      val t0 = System.nanoTime()
      val rows =
        try graft.SparkEntry.queries(name)(spark, out).count()
        catch { case e: Throwable => println(s"[probe] $name FAILED: ${e.getMessage}"); -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name%-28s rows=$rows%8d  ${sec}%7.1f s")
      (name, rows, sec)
    }
    val dark = results.filter(_._2 <= 0)
    println(if (dark.isEmpty) "[probe] PASS: no query went dark at sf1"
      else s"[probe] DARK at sf1: ${dark.map(_._1).mkString(", ")}")
    spark.stop()
  }
}
