package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.{DedupQueries, SimilarityQueries}

/** The bucket caps (MinHash band cap, embedding ND bucket cap,
  * winnowing block/posting caps) are the 100 TB safety net: DORMANT at
  * every gated scale by design (max bucket ≪ 400), so their engagement
  * paths would otherwise only run the day a mega-bucket appears in
  * production. This spec forces them to engage at artificially low cap
  * values on planted corpora and asserts the engagement SEMANTICS
  * exactly (VERDICT r12 item 7):
  *   - MinHash (drop-oversized-bucket policy): a bucket above cap
  *     vanishes whole; kept rows reconcile to total − oversized mass;
  *     the per-row band-liveness mask matches the surviving buckets.
  *   - Embedding ND (keep-cap-lowest policy): candidates at cap are
  *     exactly the pairs co-kept in ≥1 bucket; cap=1 yields zero pairs;
  *     engagement strictly shrinks the pair set, never grows it.
  * The VALUE-exactness of the accounting queries under engaged caps
  * (dedup_band_stats / embedding_band_stats counting dropped mass) is
  * proven end-to-end by the caps-engaged DuckDB verification run
  * (CAPS_ENGAGED artifact: GRAFT_CAP_* env overrides interpolate the
  * same low cap into the Spark plan AND the oracle SQL).
  */
class CapsEngagedSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** 30 byte-identical docs (one mega bucket in every band) + 4 planted
    * near-identical pairs + 20 unique docs.
    */
  private lazy val plantedDocsDir: String = {
    val mega = (0 until 30).map(i =>
      (i.toLong, "shared boilerplate banner text repeated across every page of this site"))
    val pairs = (0 until 4).flatMap { c =>
      val text = (0 until 12).map(j => s"c${c}tok$j").mkString(" ")
      Seq((100L + 2 * c, text), (101L + 2 * c, text))
    }
    val unique = (0 until 20).map(i =>
      (200L + i, (0 until 12).map(j => s"u${i}w$j").mkString(" ")))
    // a moderate-similarity FAMILY (pairwise J ~ 0.7): members collide
    // in SOME bands (bucket of 3+ > cap, dropped) and diverge in others
    // (bucket <= cap, kept) — the partial-liveness case the mask exists
    // for; byte-identical docs can't produce it (identical signatures
    // land every member in the same bucket in EVERY band)
    val family = (0 until 12).map { m =>
      val words = (0 until 30).map(j =>
        if (j == 2 * m) s"fam_variant_${m}_$j" else s"famword$j")
      (300L + m, words.mkString(" "))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-caps-docs").toString
    (mega ++ pairs ++ unique ++ family).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** 3 tight clusters of 40 vectors each: every cluster member signs
    * the same side of each hyperplane, so per-band bucket occupancy is
    * ~40 — far above the test caps, guaranteeing engagement.
    */
  private lazy val plantedVecs: DataFrame = {
    (0 until 120).map { id =>
      val lab = id % 3
      val e = Array.tabulate(64) { d =>
        val base = if (d / 21 == lab) 4.0f else -1.0f
        base + ((id * 17 + d) % 5 - 2) * 0.0005f
      }
      (id.toLong, e)
    }.toDF("vec_id", "embedding")
  }

  test("minhash band cap engages: oversized buckets vanish whole, kept mass reconciles, liveness mask exact") {
    val docs = graft.sources.Tables.documents(spark, plantedDocsDir)
    val cap = 2
    // minhashBandKeyed already posexplodes to one (doc, band, bh) row
    // per band — the same rows the capped index filters over
    val uncapped = DedupQueries.minhashBandKeyed(
      docs, "doc_id", "shs", "c", "band", "bh", "bands")
      .select(col("doc_id"), col("band"), col("bh"))
    val occ = uncapped.groupBy(col("band"), col("bh")).agg(count(lit(1)).as("n"))
    val totalRows = uncapped.count()
    val oversizedMass = occ.filter(col("n") > cap)
      .agg(coalesce(sum(col("n")), lit(0L))).head().getLong(0)
    assert(oversizedMass >= 30L,
      s"premise: the 30-identical-doc mega bucket must exceed cap=$cap in every band ($oversizedMass)")

    val capped = DedupQueries.minhashBandKeyedCappedIndex(
      docs, "doc_id", "shs", "c", "band", "bh", "bands", "live", cap)
    // 1. no surviving bucket above the cap
    val worst = capped.groupBy(col("band"), col("bh")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head().getLong(0)
    assert(worst <= cap, s"a bucket of $worst rows survived cap=$cap")
    // 2. drop-whole-bucket policy: kept rows == total − oversized mass
    assert(capped.count() == totalRows - oversizedMass,
      "kept row mass must reconcile exactly to total minus oversized buckets")
    // 3. the liveness mask is exactly the surviving-band set per doc
    val fromMask = capped
      .select(col("doc_id"), posexplode(col("live")).as(Seq("band_m", "is_live")))
      .filter(col("is_live"))
      .select(col("doc_id"), col("band_m").cast("integer").as("band")).distinct()
    val fromRows = capped
      .select(col("doc_id"), col("band").cast("integer").as("band")).distinct()
    assert(fromMask.exceptAll(fromRows).isEmpty && fromRows.exceptAll(fromMask).isEmpty,
      "live mask must equal the set of bands the doc actually survives in")
    // 4. engagement premise: some doc lost a band but kept another
    val partial = capped.filter(
      exists(col("live"), x => !x) && exists(col("live"), x => x))
    assert(partial.count() > 0,
      "premise: at least one doc should be capped out of one band yet live in another")
  }

  test("embedding ND cap engages: pairs at cap are exactly the co-kept-bucket pairs; cap=1 is empty; engagement shrinks") {
    val v = plantedVecs
    val bits = SimilarityQueries.ndSigBits(v.count())
    val keyed = SimilarityQueries.bandKeyed(
      v, "vec_id", "e", "nrm", "band", "sig", "sigs", bits)
      .select(col("vec_id"), col("band"), col("sig"))
    val maxOcc = keyed.groupBy(col("band"), col("sig")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head().getLong(0)
    assert(maxOcc > 3, s"premise: planted clusters must exceed the test caps (max occupancy $maxOcc)")

    val pairsAll = SimilarityQueries.neardupPairs(v, 1 << 20)
      .select(col("vec_a"), col("vec_b"))
    val pairs2 = SimilarityQueries.neardupPairs(v, 2)
      .select(col("vec_a"), col("vec_b"))
    val pairs1 = SimilarityQueries.neardupPairs(v, 1)
    assert(pairs1.isEmpty, "cap=1 leaves no bucket that can pair")
    assert(pairs2.exceptAll(pairsAll).isEmpty, "capped pairs must be a subset of uncapped")
    assert(pairs2.count() < pairsAll.count(),
      "premise: cap=2 must actually shed pairs on this corpus")
    // exact semantics: a pair survives cap=2 iff BOTH members are among
    // the 2 lowest vec_ids of at least one shared (band, sig) bucket —
    // recomputed here from the keyed rows, not from neardupPairs' code
    val kept2 = keyed.withColumn("rn", row_number().over(
      Window.partitionBy(col("band"), col("sig")).orderBy(col("vec_id"))))
      .filter(col("rn") <= 2).drop("rn")
    val expected2 = kept2.as("a")
      .join(kept2.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    assert(pairs2.exceptAll(expected2).isEmpty && expected2.exceptAll(pairs2).isEmpty,
      "cap=2 pair set must equal the co-kept-bucket recompute exactly")
  }
}
