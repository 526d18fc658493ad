package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.multimodal.Multimodal

/** Semantic tests for the training-data pipeline tier (dedup, text,
  * similarity, multimodal) beyond the DuckDB oracle's value checks.
  */
class PipelineOpsSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("dedup_exact group sizes sum to the corpus size") {
    val total = SparkEntry.queries("dedup_exact")(spark, sf)
      .agg(sum("n_dups")).first().getLong(0)
    val docs = graft.sources.Tables.documents(spark, sf).count()
    assert(total == docs)
  }

  test("minhash LSH pairs are ordered, deduped, and high-jaccard") {
    val df = SparkEntry.queries("dedup_minhash_lsh")(spark, sf).cache()
    assert(df.filter(col("doc_a") >= col("doc_b")).isEmpty)
    assert(df.count() == df.dropDuplicates("doc_a", "doc_b").count())
    assert(df.filter(col("jaccard") < 0.5 || col("jaccard") > 1.0).isEmpty)
  }

  test("simhash values fit in 32 bits") {
    val df = SparkEntry.queries("dedup_simhash")(spark, sf)
    assert(df.filter(col("simhash") < 0 || col("simhash") >= (1L << 32)).isEmpty)
  }

  test("rolling fingerprint is order-sensitive, content hash is not") {
    import spark.implicits._
    val df = Seq("alpha beta gamma", "gamma beta alpha").toDF("text")
      .withColumn("toks", TextFunctions.tokens(col("text")))
      .select(TextFunctions.rollingFingerprint("toks").as("fp"))
    val fps = df.collect().map(_.getLong(0))
    assert(fps(0) != fps(1), "reordering tokens must change the rolling fingerprint")
  }

  test("lang_id picks the profile with most marker hits") {
    import spark.implicits._
    val df = Seq(
      ("the cat and the dog of a house", "en"),
      ("el perro y la casa de los gatos", "es"),
      ("der hund und die katze ist das", "de"),
      ("le chien et les chats des du", "fr")).toDF("text", "expected")
    val base = df.withColumn("toks", TextFunctions.tokens(col("text")))
    val scored = Seq(
      "en" -> Seq("the", "and", "of", "to", "a"),
      "es" -> Seq("el", "la", "los", "de", "y"),
      "de" -> Seq("der", "die", "das", "und", "ist"),
      "fr" -> Seq("le", "les", "des", "et", "du"))
      .foldLeft(base) { case (d, (c, ws)) => d.withColumn(s"s_$c", TextFunctions.markerCount("toks", ws)) }
    val wrong = scored.filter(
      (col("expected") === "en" && !(col("s_en") >= greatest(col("s_es"), col("s_de"), col("s_fr")))) ||
      (col("expected") === "es" && !(col("s_es") >= greatest(col("s_en"), col("s_de"), col("s_fr")))) ||
      (col("expected") === "de" && !(col("s_de") >= greatest(col("s_en"), col("s_es"), col("s_fr")))) ||
      (col("expected") === "fr" && !(col("s_fr") >= greatest(col("s_en"), col("s_es"), col("s_de")))))
    assert(wrong.isEmpty)
  }

  test("ann_bruteforce returns exactly top-5 per probe, sims in [-1,1]") {
    val df = SparkEntry.queries("ann_bruteforce")(spark, sf).cache()
    val perProbe = df.groupBy("probe_id").count()
    assert(perProbe.filter(col("count") =!= 5).isEmpty)
    assert(df.filter(col("simr") > 1.000001 || col("simr") < -1.000001).isEmpty)
    assert(df.filter(col("probe_id") === col("vec_id")).isEmpty, "self-match excluded")
  }

  test("ann_ivf results are a subset-quality approximation of brute force") {
    val bf = SparkEntry.queries("ann_bruteforce")(spark, sf)
      .select("probe_id", "vec_id")
    val ivf = SparkEntry.queries("ann_ivf")(spark, sf)
      .select("probe_id", "vec_id")
    val nProbes = bf.select("probe_id").distinct().count()
    assert(ivf.select("probe_id").distinct().count() == nProbes, "every probe answered")
    val recall = ivf.intersect(bf).count().toDouble / bf.count()
    assert(recall > 0.0, "IVF should recover at least some true neighbors")
  }

  test("ann_lsh answers from the probe's own bucket with positive recall") {
    val bf = SparkEntry.queries("ann_bruteforce")(spark, sf).select("probe_id", "vec_id")
    val lsh = SparkEntry.queries("ann_lsh")(spark, sf).select("probe_id", "vec_id").cache()
    assert(lsh.count() > 0, "buckets should not be empty at 64-bucket granularity")
    val recall = lsh.intersect(bf).count().toDouble / bf.count()
    assert(recall > 0.0, "LSH should recover some true neighbors")
    assert(lsh.groupBy("probe_id").count().filter(col("count") > 5).isEmpty)
  }

  test("multimodal decode is deterministic and partition-distributed") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    val d1 = Multimodal.decodeAll(media).collect().sortBy(_.media_id)
    val d2 = Multimodal.decodeAll(media.repartition(7)).collect().sortBy(_.media_id)
    assert(d1.toSeq == d2.toSeq, "decode must not depend on partitioning")
    assert(d1.forall(d => d.width >= 64 && d.height >= 64 && d.n_bytes > 0))
  }

  test("frameOffsets respects frame size and stride") {
    assert(Multimodal.frameOffsets(200, 32, 64, 8) == Seq(1L, 65L, 129L))
    assert(Multimodal.frameOffsets(10, 32, 64, 8).isEmpty)
    assert(Multimodal.frameOffsets(1000, 32, 64, 3).size == 3)
  }
}
