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

  test("dedup_substring_spans: planted cross-doc runs yield maximal spans; within-doc repeats don't count") {
    val s = spark
    import s.implicits._
    def doc(id: Long, text: String) =
      (id, text, "en", "test", text.length.toLong)
    val docs = Seq(
      // docs 1+2 share an 8-token run at different offsets
      doc(1L, "a1 a2 a3 a4 a5 a6 a7 a8 x1 x2 x3 x4 b1 b2 b3 b4 b5"),
      doc(2L, "z1 z2 a1 a2 a3 a4 a5 a6 a7 a8 y1 y2"),
      // doc 3 repeats a 6-token run WITHIN itself only — must not count
      doc(3L, "c1 c2 c3 c4 c5 c6 c1 c2 c3 c4 c5 c6"),
      doc(4L, "d1 d2 d3 d4 d5 d6 d7 d8 d9"),
      // docs 5+6 share TWO disjoint 5-token runs -> two islands each
      doc(5L, "s1 s2 s3 s4 s5 u1 u2 u3 u4 u5 u6 u7 t1 t2 t3 t4 t5"),
      doc(6L, "t1 t2 t3 t4 t5 v1 v2 v3 v4 v5 v6 v7 s1 s2 s3 s4 s5"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-substr").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("dedup_substring_spans")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val expected = Set(
      (1L, 1L, 8L, 8L),   // maximal: 4 overlapping 5-grams merged
      (2L, 3L, 10L, 8L),  // same run at a different offset
      (5L, 1L, 5L, 5L), (5L, 13L, 17L, 5L), // two islands, gap > k
      (6L, 1L, 5L, 5L), (6L, 13L, 17L, 5L))
    assert(got == expected, s"got $got")
  }

  test("bpe_merges: greedy run merging, frequency-ordered merges, vocab reflects merges") {
    val s = spark
    import s.implicits._
    // aaab x3, ab x2: (a,a) counts 6 (overlap counted), (a,b) counts 5;
    // merging (a,a) in 'aaa' must be greedy left-to-right -> [aa, a, b];
    // the six single-pair words keep rounds 4-6 alive at count 1
    val text = "aaab aaab aaab ab ab cc dd ee ff gg hh"
    val docs = Seq((1L, text, "en", "test", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val merges = SparkEntry.queries("bpe_merges")(spark, dir)
      .orderBy("merge_round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(merges.length == 6)
    assert(merges(0) == (1L, "a", "a", "aa", 6L), s"run pairs count with overlap: ${merges(0)}")
    assert(merges(1) == (2L, "a", "b", "ab", 5L))
    assert(merges(2) == (3L, "aa", "ab", "aaab", 3L), "greedy left-to-right: aaa -> [aa, a], then ab joins")
    assert(merges.drop(3).forall(_._5 == 1L), "remaining rounds drain the count-1 doubles")
    assert(merges.map(m => (m._2, m._3)).distinct.length == 6, "no pair merged twice")
    val vocab = SparkEntry.queries("bpe_vocab")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab("aaab") == 3L, "fully merged word")
    assert(vocab("ab") == 2L)
  }

  test("doc_repetition: degenerate loop maxes the gates, all-distinct doc scores zero") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam", "en", "test", 19L),
      (2L, "one two three four five six", "en", "test", 27L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-rep").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("doc_repetition")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // 4x 'spam': 3 distinct-1 dups of 4 tokens, the one bigram IS the
    // top bigram, both trigram occurrences are the same gram
    assert(got(1L) == ((4L, 0.75, 1.0, 1.0)), s"got ${got(1L)}")
    assert(got(2L) == ((6L, 0.0, 0.2, 0.0)), s"got ${got(2L)}")
  }

  test("bpe_tokenize: planted corpus compresses exactly as the merge table predicts") {
    val s = spark
    import s.implicits._
    val text = "aaab aaab aaab ab ab cc dd ee ff gg hh"
    val docs = Seq((1L, text, "en", "test", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-tok").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("bpe_tokenize")(spark, dir).head()
    // 6 merge rounds: aaab and ab fully merge (1 sym each), three of
    // the six count-1 doubles merge (1 sym), the other three stay 2
    assert(r.getLong(1) == 11L, s"n_words ${r.getLong(1)}")
    assert(r.getLong(2) == 14L, s"n_bpe_tokens ${r.getLong(2)}")
    assert(r.getLong(3) == 28L, s"n_chars ${r.getLong(3)}")
    assert(r.getDouble(4) == 2.0, s"chars_per_token ${r.getDouble(4)}")
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

  test("asofJoin contract: latest at-or-before match, tie to max tiebreak, null when none") {
    import spark.implicits._
    val left = Seq((1L, 10L, "l10"), (1L, 20L, "l20"), (1L, 5L, "l5"), (2L, 50L, "l50"))
      .toDF("k", "t", "ltag")
    // rights: key 1 at t=10 twice (tiebreak 100 vs 200), t=15; key 3 unmatched
    val right = Seq((1L, 10L, 100L), (1L, 10L, 200L), (1L, 15L, 300L), (3L, 1L, 400L))
      .toDF("rk", "rt", "rid")
    val out = graft.operators.Joins.asofJoin(left, right,
        col("k"), col("rk"), col("t"), col("rt"), col("rid"),
        Seq(col("rid"), col("rt").as("matched_t")))
      .select(col("ltag"), col("__match.rid"), col("__match.matched_t"))
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]), Option(r.get(2)).map(_.asInstanceOf[Long])))
      .toMap
    assert(out("l5") == (None, None)) // before any right
    assert(out("l10") == (Some(200L), Some(10L))) // tie at t=10 -> max rid
    assert(out("l20") == (Some(300L), Some(15L))) // latest <= 20
    assert(out("l50") == (None, None)) // key 2 has no rights
  }

  test("bandJoin equals the naive range join, including band boundaries") {
    import spark.implicits._
    val a = Seq((1L, 0.0), (2L, 0.049), (3L, 0.05), (4L, 0.101), (5L, -0.02))
      .toDF("id_a", "va")
    val b = Seq((10L, 0.05), (11L, 0.1), (12L, -0.07), (13L, 0.2)).toDF("id_b", "vb")
    val banded = graft.operators.Joins.bandJoin(a, b, col("va"), col("vb"), 0.05)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = a.crossJoin(b).filter(abs(col("va") - col("vb")) <= 0.05)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == naive)
    assert(banded.contains((3L, 11L))) // exactly band apart (0.05 vs 0.1)
    assert(banded.contains((5L, 12L))) // negative values bucket correctly
  }

  test("bandJoin is rounding-proof on boundary-adjacent values (property)") {
    import spark.implicits._
    // values packed around multiples of the band, including pairs
    // exactly `band` apart whose FP divisions can round into buckets
    // 2 apart — the case the ±2 probe exists for
    val band = 0.1
    val rnd = new scala.util.Random(11)
    val vals = (0 until 400).map { i =>
      val k = rnd.nextInt(40) - 20
      val eps = rnd.nextInt(5) match {
        case 0 => 0.0
        case 1 => 1e-12
        case 2 => -1e-12
        case 3 => band
        case _ => rnd.nextDouble() * band
      }
      (i.toLong, k * band + eps)
    }
    val a = vals.toDF("id_a", "va")
    val b = vals.map { case (i, v) => (i + 10000L, v) }.toDF("id_b", "vb")
    val banded = graft.operators.Joins.bandJoin(a, b, col("va"), col("vb"), band)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = a.crossJoin(b).filter(abs(col("va") - col("vb")) <= band)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == naive,
      s"missing=${(naive -- banded).take(5)} extra=${(banded -- naive).take(5)}")
  }

  test("dedup_components labels agree with pair reachability") {
    val comp = SparkEntry.queries("dedup_components")(spark, sf).cache()
    // every doc labeled, component is a real doc_id <= doc_id
    val docs = graft.sources.Tables.documents(spark, sf).count()
    assert(comp.count() == docs)
    assert(comp.filter(col("component") > col("doc_id")).isEmpty)
    // both endpoints of every near-dup pair share a component
    val pairs = SparkEntry.queries("dedup_simhash_pairs")(spark, sf)
      .select("doc_a", "doc_b")
    val mismatched = pairs
      .join(comp.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("component", "ca"), "doc_a")
      .join(comp.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("component", "cb"), "doc_b")
      .filter(col("ca") =!= col("cb"))
    assert(mismatched.isEmpty)
  }

  test("corpus preparation pipeline composes end-to-end: quality -> dedup -> near-dup prune -> cap") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val raw = docs.count()
    // stage 1: quality gate
    val keepQuality = SparkEntry.queries("text_quality_filter")(spark, sf)
      .filter(col("passes")).select(col("doc_id"))
    val q1 = docs.join(keepQuality, "doc_id")
    // stage 2: exact dedup — keep each content group's canonical doc
    val canon = SparkEntry.queries("dedup_exact")(spark, sf)
      .select(col("canonical_id").as("doc_id"))
    val q2 = q1.join(canon, "doc_id")
    // stage 3: near-dup prune — drop the larger id of each confirmed pair
    val nearDrop = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .select(col("doc_b").as("doc_id")).distinct()
    val q3 = q2.join(nearDrop, Seq("doc_id"), "left_anti")
    // stage 4: per-source cap (deterministic md5 order)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val prepared = q3.withColumn("rn", row_number().over(w)).filter(col("rn") <= 50).drop("rn")

    val (n1, n2, n3, nf) = (q1.count(), q2.count(), q3.count(), prepared.count())
    assert(raw >= n1 && n1 >= n2 && n2 >= n3 && n3 >= nf, s"$raw >= $n1 >= $n2 >= $n3 >= $nf")
    assert(nf > 0)
    // prepared corpus has no exact duplicates left
    assert(prepared.groupBy(md5(col("text"))).count().filter(col("count") > 1).isEmpty)
    // and respects the per-source cap
    assert(prepared.groupBy("source").count().filter(col("count") > 50).isEmpty)
    // and no surviving doc is the dropped side of a confirmed near-dup pair
    assert(prepared.join(nearDrop, Seq("doc_id"), "left_semi").isEmpty)
  }

  test("embedding quantization: constant vectors code to zero with zero error; errors bounded by scale/2") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(2.5f, 2.5f, 2.5f, 2.5f)), // constant: mx == mn guard
      (2L, Array(0.0f, 1.0f, 2.0f, 255.0f)),
      (3L, Array(-3.0f, 0.0f, 3.0f, 6.0f))
    ).toDF("vec_id", "embedding")
    val out = graft.queries.SimilarityQueries.quantizeFrame(df)
      .collect().map(r => r.getLong(0) -> r).toMap
    // constant vector: zero reconstruction error (all-zero codes, scale 0 path)
    assert(out(1L).getDouble(3) == 0.0 && out(1L).getDouble(4) == 0.0)
    // non-constant: max error bounded by half a quantization step
    for (id <- Seq(2L, 3L)) {
      val (mn, mx) = (out(id).getDouble(1), out(id).getDouble(2))
      val halfStep = (mx - mn) / 255 / 2 + 1e-12
      assert(out(id).getDouble(3) <= halfStep, s"vec $id err ${out(id).getDouble(3)} > $halfStep")
    }
  }

  test("PII scrub redacts every email/phone variant and leaves clean text intact") {
    import spark.implicits._
    import graft.functions.TextFunctions
    val rows = Seq(
      ("a@b.co and c.d+x@e-f.org wrote", 2L, 0L),
      ("call +1-555-0100 or +44-202-7946", 0L, 2L),
      ("mixed a@b.io then +1-555-0100 done", 1L, 1L),
      ("no pii here at all", 0L, 0L))
    val df = rows.map(_._1).toDF("t")
      .withColumn("ne", TextFunctions.countEmails(col("t")))
      .withColumn("np", TextFunctions.countPhones(col("t")))
      .withColumn("s", TextFunctions.scrubPii(col("t")))
    val got = df.collect()
    rows.zip(got).foreach { case ((txt, ne, np), r) =>
      assert(r.getLong(1) == ne && r.getLong(2) == np, s"counts for '$txt'")
      val s = r.getString(3)
      assert(!s.matches(s".*${TextFunctions.EmailPattern}.*"), s"email survives in '$s'")
      assert(!s.matches(s".*${TextFunctions.PhonePattern}.*"), s"phone survives in '$s'")
      if (ne == 0 && np == 0) assert(s == txt, "clean text must be untouched")
      else assert(s.contains("<EMAIL>") || s.contains("<PHONE>"))
    }
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

  test("winnowing_pairs: near-total MinHash near-dup recall, scores well-formed and symmetric-free") {
    val win = SparkEntry.queries("winnowing_pairs")(spark, sf).cache()
    assert(win.count() > 0)
    // canonical orientation only, containment in (0, 1]
    assert(win.filter(col("doc_a") >= col("doc_b")).count() == 0)
    assert(win.filter(col("containment") <= 0 || col("containment") > 1).count() == 0)
    // the winnowing guarantee in practice: confirmed MinHash near-dups
    // (jaccard >= 0.5 on word 3-shingles) overwhelmingly share runs of
    // >= 6 words, so winnowing recovers nearly all of them; pairs whose
    // overlap is scattered below the t = w+k-1 guarantee, or whose
    // shared content is corpus-common (stop-fingerprint cutoff), may
    // legitimately miss — bound the recall, don't assert perfection
    val mh = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .select(col("doc_a"), col("doc_b"))
    val nTrue = mh.count()
    val recovered = nTrue - mh.join(win, Seq("doc_a", "doc_b"), "left_anti").count()
    assert(recovered.toDouble / nTrue >= 0.9,
      s"winnowing recovered only $recovered of $nTrue confirmed near-dup pairs")
    // and the recovered ones score at the top of the containment scale —
    // except r14 rescue rows (n_shared = 2 on a <= 3-fingerprint doc),
    // which legitimately score 2/3
    assert(mh.join(win, Seq("doc_a", "doc_b"))
      .filter(col("containment") < 0.9 && col("n_shared") >= 3).count() == 0,
      "a true near-dup scored below 0.9 containment")
    // report well-formedness: every row satisfies the MOSS floor or the
    // sized rescue — nothing below either bar may leak into the report
    assert(win.filter(!((col("n_shared") >= 3 && col("containment") >= 0.25) ||
      (col("n_shared") === 2 && col("containment") >= 0.65))).count() == 0,
      "a reported pair satisfies neither the MOSS floor nor the sized rescue")
    // twin contract (r12 swap): the default name runs the blocked scale
    // path; its pairs must be a SUBSET of the exact MOSS report with
    // identical scores (blocked candidates verify over the same full
    // fingerprint sets; the exact form's posting cap is dormant at this
    // scale, so exact ⊇ blocked holds strictly)
    val exact = SparkEntry.queries("winnowing_pairs_exact")(spark, sf)
    assert(win.exceptAll(exact).count() == 0,
      "blocked report emitted a pair/score the exact fidelity twin lacks")
    win.unpersist()
  }

  test("substring_scrub: removal accounting matches the span report exactly") {
    val scrub = SparkEntry.queries("substring_scrub")(spark, sf).cache()
    assert(scrub.count() == 500, "one verdict row per document")
    // conservation: every token is either kept or removed
    assert(scrub.filter(col("n_before") =!= col("n_removed") + col("n_after")).count() == 0)
    // the spans are merged disjoint islands, so their token counts sum
    // to exactly the positions the scrub removed — per doc
    val spanSum = SparkEntry.queries("dedup_substring_spans")(spark, sf)
      .groupBy(col("doc_id")).agg(sum(col("span_tokens")).as("s"))
    val joined = scrub.join(spanSum, Seq("doc_id"), "left")
      .withColumn("s", coalesce(col("s"), lit(0L)))
    assert(joined.filter(col("n_removed") =!= col("s")).count() == 0,
      "scrubbed token count diverged from the span report")
    // the corpus genuinely shares spans: some docs shrink, none vanish entirely
    assert(scrub.filter(col("n_removed") > 0).count() > 0)
    scrub.unpersist()
  }

  test("dedup_verdicts: precedence agrees with the standalone stages") {
    val v = SparkEntry.queries("dedup_verdicts")(spark, sf).cache()
    assert(v.count() == 500, "one verdict per document")
    assert(v.filter((col("reason") === "ok") =!= (col("verdict") === "keep")).count() == 0)
    // every near_dup drop is the larger side of a confirmed MinHash pair
    val nd = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .select(col("doc_b").as("doc_id")).distinct()
    assert(v.filter(col("reason") === "near_dup")
      .join(nd, Seq("doc_id"), "left_anti").count() == 0)
    // and no doc with a smaller confirmed partner is marked 'keep'
    assert(v.filter(col("verdict") === "keep").join(nd, Seq("doc_id")).count() == 0)
    // every quality-reason drop matches the standalone gate's first failing rule
    val q = SparkEntry.queries("text_quality_filter")(spark, sf)
      .select(col("doc_id"), col("fail_reason"))
    val qReasons = v.filter(!col("reason").isin("exact_dup", "near_dup", "ok"))
    assert(qReasons.join(q, Seq("doc_id")).filter(col("reason") =!= col("fail_reason")).count() == 0)
    assert(v.filter(col("verdict") === "keep").count() > 0)
    assert(v.filter(col("verdict") === "drop").count() > 0)
    v.unpersist()
  }

  test("content_defined_chunks: partitions every doc and survives a front insertion") {
    val ch = SparkEntry.queries("content_defined_chunks")(spark, sf).cache()
    // chunks partition each document: dense idx from 1, token conservation
    val perDoc = ch.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nc"), max(col("chunk_idx")).as("mx"),
        sum(col("n_tokens")).as("nt"))
    assert(perDoc.filter(col("nc") =!= col("mx")).count() == 0, "chunk_idx not dense")
    val docToks = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(trim(col("text")), " ")).cast("long").as("dt"))
    assert(perDoc.join(docToks, "doc_id").filter(col("nt") =!= col("dt")).count() == 0,
      "chunks do not conserve tokens")
    // the self-synchronizing property: prepending one token changes ONLY
    // the first chunk — every later chunk hash survives (fixed-stride
    // chunking would lose nearly all of them)
    val shifted = graft.queries.PipelineShaping.cdcChunksOf(
      graft.sources.Tables.documents(spark, sf)
        .select(col("doc_id"), concat(lit("inserted "), col("text")).as("text")))
    val origTail = ch.filter(col("chunk_idx") > 1).select(col("doc_id"), col("chunk_hash"))
    val lost = origTail.join(
      shifted.select(col("doc_id"), col("chunk_hash")),
      Seq("doc_id", "chunk_hash"), "left_anti")
    assert(lost.count() == 0,
      "a non-first chunk hash did not survive a front insertion")
    ch.unpersist()
  }

  test("mixture_manifest: per-source selection fills but never overruns its allocation") {
    val m = SparkEntry.queries("mixture_manifest")(spark, sf).cache()
    val alloc = SparkEntry.queries("mixture_alpha_sample")(spark, sf)
      .select(col("source"), col("alloc_tokens"))
    val per = m.groupBy(col("source"))
      .agg(max(col("cum_tokens")).as("used"), count(lit(1)).as("n_sel"),
        max(col("sel_rank")).as("max_rank"))
      .join(alloc, "source")
    assert(per.count() == 20, "all twenty sources represented")
    assert(per.filter(col("used") > col("alloc_tokens")).count() == 0, "budget overrun")
    // the selection is a PREFIX in md5 order: ranks 1..n_sel with no gaps
    assert(per.filter(col("max_rank") =!= col("n_sel")).count() == 0, "selection not a prefix")
    // tightness: the next doc in rank order would cross the budget
    val wSel = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val next = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        size(split(trim(col("text")), " ")).cast("long").as("nt"))
      .withColumn("rk", row_number().over(wSel).cast("long"))
      .withColumn("cum", sum(col("nt")).over(wSel.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .join(per.select(col("source"), col("n_sel"), col("alloc_tokens")), "source")
      .filter(col("rk") === col("n_sel") + 1)
    assert(next.filter(col("cum") <= col("alloc_tokens")).count() == 0,
      "a selectable doc was left out of the manifest")
    m.unpersist()
  }

  test("cluster_representatives: one quality-first pick per multi-member cluster") {
    val reps = SparkEntry.queries("cluster_representatives")(spark, sf).cache()
    val comp = SparkEntry.queries("dedup_components")(spark, sf)
    val sizes = comp.groupBy(col("component")).agg(count(lit(1)).as("n"))
    // exactly the multi-member clusters, one row each
    assert(reps.count() == sizes.filter(col("n") >= 2).count())
    assert(reps.join(sizes, "component").filter(col("n_members") =!= col("n")).count() == 0)
    // the representative is a member of its cluster
    assert(reps.join(comp,
      reps("rep_doc_id") === comp("doc_id") && reps("component") === comp("component"),
      "left_anti").count() == 0, "representative outside its cluster")
    // quality-first: if any member passes the gate, the pick passes
    val q = SparkEntry.queries("text_quality_filter")(spark, sf)
      .select(col("doc_id"), col("passes"))
    val anyPass = comp.join(q, "doc_id").groupBy(col("component"))
      .agg(max(col("passes")).as("any_pass"))
    assert(reps.join(anyPass, "component")
      .filter(col("any_pass") && !col("rep_passes")).count() == 0,
      "a failing doc was picked over a passing cluster member")
    reps.unpersist()
  }

  test("corpus_diff: statuses recover the snapshot derivation exactly") {
    val d = SparkEntry.queries("corpus_diff")(spark, sf).cache()
    val docs = graft.sources.Tables.documents(spark, sf).select(col("doc_id"))
    def cnt(m: Int) = docs.filter(pmod(col("doc_id"), lit(11)) === m).count()
    val by = d.groupBy(col("status")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(by("removed") == cnt(3))
    assert(by("changed") == cnt(5))
    assert(by("added") == cnt(7))
    assert(by("unchanged") == docs.count() - cnt(3) - cnt(5))
    // added rows carry the shifted ids, all above the id space
    assert(d.filter(col("status") === "added").filter(col("doc_id") < 1000000).count() == 0)
    d.unpersist()
  }

  test("embedding_project: unbiased distance preservation at quarter width") {
    val p = SparkEntry.queries("embedding_project")(spark, sf).cache()
    assert(p.count() == 500)
    val yCols = (0 until 16).map(j => f"y$j%02d")
    // no degenerate output dimension
    val stds = p.agg(stddev(col(yCols.head)), yCols.tail.map(c => stddev(col(c))): _*)
      .first().toSeq.map(_.asInstanceOf[Double])
    assert(stds.forall(_ > 0.0), "a projected dimension collapsed to a constant")
    // JL property on real pairs: squared distances in the 16-dim sketch
    // track the 64-dim originals — per-pair distortion is noisy at m=16
    // (std ~ sqrt(2/m)), but the Rademacher projection is unbiased, so
    // the MEAN ratio over ~250 consecutive-id pairs concentrates near 1
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val exact = e.as("a").join(e.as("b"), col("b.vec_id") === col("a.vec_id") + 1)
      .select(col("a.vec_id").as("vec_id"),
        aggregate(zip_with(col("a.embedding"), col("b.embedding"),
          (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
          lit(0.0), (a, v) => a + v).as("d64"))
    val projDist = yCols.map(c => (col(s"a.$c") - col(s"b.$c")) * (col(s"a.$c") - col(s"b.$c")))
      .reduce(_ + _)
    val proj = p.as("a").join(p.as("b"), col("b.vec_id") === col("a.vec_id") + 1)
      .select(col("a.vec_id").as("vec_id"), projDist.as("d16"))
    val meanRatio = exact.join(proj, "vec_id").filter(col("d64") > 0)
      .agg(avg(col("d16") / col("d64"))).first().getDouble(0)
    assert(math.abs(meanRatio - 1.0) < 0.15,
      s"mean distance ratio $meanRatio strayed from unbiased")
    p.unpersist()
  }

  test("kmv_overlap: estimates track exact day-audience overlaps within sketch error") {
    val est = SparkEntry.queries("kmv_overlap")(spark, sf).cache()
    assert(est.count() == 10, "5 days -> 10 pairs")
    // exact per-pair audiences for comparison
    val ud = graft.sources.Tables.events(spark, sf)
      .select(to_date(col("ts")).cast("string").as("d"), col("user_id")).distinct().cache()
    val exact = ud.as("a").join(ud.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.d") < col("b.d"))
      .groupBy(col("a.d").as("day_a"), col("b.d").as("day_b"))
      .agg(count(lit(1)).as("n_inter"))
    val na = ud.groupBy(col("d")).agg(countDistinct("user_id").as("n"))
    val joined = est.join(exact, Seq("day_a", "day_b"))
      .join(na.select(col("d").as("day_a"), col("n").as("na")), "day_a")
      .join(na.select(col("d").as("day_b"), col("n").as("nb")), "day_b")
      .withColumn("exact_union", col("na") + col("nb") - col("n_inter"))
      .withColumn("exact_j", col("n_inter").cast("double") / col("exact_union"))
      .collect()
    joined.foreach { r =>
      val (ej, xj) = (r.getAs[Double]("est_jaccard"), r.getAs[Double]("exact_j"))
      assert(math.abs(ej - xj) <= 0.25, s"jaccard estimate off: $ej vs $xj")
      val (eu, xu) = (r.getAs[Double]("est_union"), r.getAs[Long]("exact_union").toDouble)
      assert(math.abs(eu - xu) / xu <= 0.5, s"union estimate off: $eu vs $xu")
      val (ei, xi) = (r.getAs[Double]("est_intersection"), r.getAs[Long]("n_inter").toDouble)
      assert(math.abs(ei - xi) / xi <= 0.5, s"intersection estimate off: $ei vs $xi")
    }
    ud.unpersist(); est.unpersist()
  }

  test("training_order: a dense permutation, curriculum within source, strided across sources") {
    val to = SparkEntry.queries("training_order")(spark, sf).cache()
    val n = to.count()
    // global_pos is a dense permutation of 0..n-1
    assert(to.select("global_pos").distinct().count() == n)
    val mm = to.agg(min("global_pos"), max("global_pos")).head
    assert(mm.getLong(0) == 0 && mm.getLong(1) == n - 1)
    // within each source the schedule ascends in difficulty
    val wSrc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("src_rank"))
    val nonMono = to.withColumn("prev", lag(col("n_chars"), 1).over(wSrc))
      .filter(col("prev").isNotNull && col("prev") > col("n_chars")).count()
    assert(nonMono == 0, "n_chars must be non-decreasing along each source's ranks")
    // strided interleave: every position's residue class identifies its source
    val residues = to.withColumn("res", col("global_pos") % 20)
      .groupBy(col("source")).agg(countDistinct(col("res")).as("nr"))
      .filter(col("nr") =!= 1).count()
    assert(residues == 0, "each source must own exactly one stride residue")
    to.unpersist()
  }

  test("pipeline_funnel: stages nest monotonically and agree with the standalone gates") {
    val f = SparkEntry.queries("pipeline_funnel")(spark, sf).cache()
    assert(f.count() == 20, "one row per source")
    assert(f.filter(col("n_quality") > col("n_total") ||
      col("n_repetition_ok") > col("n_quality") ||
      col("n_unique") > col("n_repetition_ok")).count() == 0,
      "funnel stages must narrow monotonically")
    val sums = f.agg(sum("n_total").as("t"), sum("n_quality").as("q")).head
    assert(sums.getLong(0) == graft.sources.Tables.documents(spark, sf).count())
    // stage 1 must agree with the registered quality gate exactly
    val passes = SparkEntry.queries("text_quality_filter")(spark, sf)
      .filter(col("passes")).count()
    assert(sums.getLong(1) == passes, "funnel quality stage must equal text_quality_filter")
    f.unpersist()
  }

  test("hard_negatives: cross-label only, well-formed ranks, never beats the unrestricted top-1") {
    val hn = SparkEntry.queries("hard_negatives")(spark, sf).cache()
    assert(hn.filter(col("label") === col("probe_label")).count() == 0,
      "a hard negative must carry a different label than its anchor")
    // ranks 1..k per probe, k <= 5
    val badRanks = hn.groupBy("probe_id").agg(max("rn").as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n") || col("n") > 5).count()
    assert(badRanks == 0, "ranks must be consecutive from 1, at most 5")
    // the unrestricted nearest neighbor is at least as similar as the
    // best cross-label one
    val bf1 = SparkEntry.queries("ann_bruteforce")(spark, sf)
      .filter(col("rn") === 1).select(col("probe_id"), col("simr").as("bf"))
    val hn1 = hn.filter(col("rn") === 1).select(col("probe_id"), col("simr").as("hd"))
    assert(bf1.join(hn1, "probe_id").filter(col("hd") > col("bf")).count() == 0)
    hn.unpersist()
  }

  test("mixture_alpha_sample: shares normalize, flattening upsamples small sources") {
    val mx = SparkEntry.queries("mixture_alpha_sample")(spark, sf).collect()
    assert(mx.length == 20, "one row per source")
    val shareSum = mx.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares must sum to ~1, got $shareSum")
    // alpha < 1 flattens: epochs (upsampling factor) never increases
    // with source size
    val bySize = mx.sortBy(_.getAs[Long]("n_tokens"))
    bySize.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("epochs") >= b.getAs[Double]("epochs") - 1e-9,
        s"larger source ${b.getAs[String]("source")} upsampled more than smaller ${a.getAs[String]("source")}")
    }
  }

  test("dedup_incremental: batch side probes corpus side, one best match per dup") {
    val di = SparkEntry.queries("dedup_incremental")(spark, sf).cache()
    assert(di.count() > 0, "expected real batch-vs-corpus dups at sf0.01")
    assert(di.filter(col("batch_id") % 10 =!= 0).count() == 0, "left side must be the batch")
    assert(di.filter(col("dup_of") % 10 === 0).count() == 0, "matches must come from the corpus")
    assert(di.filter(col("jaccard") < 0.5).count() == 0)
    assert(di.select("batch_id").distinct().count() == di.count(),
      "exactly one verdict row per duplicate batch doc")
    di.unpersist()
  }

  test("ngram_lm_perplexity: thirds are balanced and ordered by cross-entropy") {
    val lm = SparkEntry.queries("ngram_lm_perplexity")(spark, sf).cache()
    val n = lm.count()
    val byBucket = lm.groupBy("bucket").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    assert(byBucket.values.sum == n)
    // each third within 1 of n/3 (integer split)
    byBucket.values.foreach(c => assert(math.abs(c - n / 3) <= 1, s"unbalanced: $byBucket"))
    // buckets follow the entropy order: head never exceeds middle, middle never tail
    def mx(b: String) = lm.filter(col("bucket") === b).agg(max("cross_entropy")).head.getDouble(0)
    def mn(b: String) = lm.filter(col("bucket") === b).agg(min("cross_entropy")).head.getDouble(0)
    assert(mx("head") <= mn("middle") && mx("middle") <= mn("tail"))
    lm.unpersist()
  }

  test("dsir_selection: target pool excluded, exact top-fifth selected in logw order") {
    val ds = SparkEntry.queries("dsir_selection")(spark, sf).cache()
    assert(ds.filter(col("source") === "src0").count() == 0, "target docs must not be scored")
    val n = ds.count()
    val sel = ds.filter(col("selected")).count()
    assert(sel == n / 5, s"expected exactly n/5 = ${n / 5} selected, got $sel")
    // selection is the top of the logw order
    val minSel = ds.filter(col("selected")).agg(min("logw")).head.getDouble(0)
    val maxUnsel = ds.filter(!col("selected")).agg(max("logw")).head.getDouble(0)
    assert(minSel >= maxUnsel, "a selected doc scored below an unselected one")
    ds.unpersist()
  }

  test("semdedup: full-corpus coverage, cell-local drops, precedence head always kept") {
    val sd = SparkEntry.queries("semdedup")(spark, sf).cache()
    val nVecs = graft.sources.Tables.embeddings(spark, sf).count()
    assert(sd.count() == nVecs, "one verdict row per corpus vector")
    // kept is exactly the n_dup_prior == 0 predicate
    assert(sd.filter(col("kept") =!= (col("n_dup_prior") === 0)).count() == 0)
    // the threshold actually fires on this corpus — a dedup query that
    // never drops anything at test scale proves nothing
    assert(sd.filter(!col("kept")).count() > 0, "expected real drops at sf0.01")
    // the first member in each cell's precedence order (max dist2_r,
    // then min vec_id) has no earlier member, so it can never drop
    val wHead = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster")).orderBy(col("dist2_r").desc, col("vec_id"))
    val heads = sd.withColumn("hrn", row_number().over(wHead)).filter(col("hrn") === 1)
    assert(heads.filter(!col("kept")).count() == 0, "precedence head must be kept")
    sd.unpersist()
  }

  test("semdedup cell chunking: a planted mega-cell is split at the cap and the pair bound engages") {
    val s = spark
    import s.implicits._
    // one degenerate cell of 10 members (all cid=0), priority order
    // d DESC then vec_id — cap 3 must chunk it 3/3/3/1
    val a = (0L until 10L).map(id => (id, 0L, (10 - id) / 10.0))
      .toDF("vec_id", "cid", "d")
    val chunked = graft.queries.CorpusMining.semCellChunks(a, 3).cache()
    val bySub = chunked.groupBy("sub").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bySub == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 1L),
      s"expected 3/3/3/1 chunks, got $bySub")
    // rank follows the priority order exactly: highest d -> rn 1
    val rnOf = chunked.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(rnOf(0L) == 1L && rnOf(9L) == 10L, s"rank must follow d DESC: $rnOf")
    // the sweep bound: pairs within chunks = 3+3+3+0 = 9, not the
    // 45 an uncapped 10-member cell would sweep
    val u = chunked.select(col("vec_id").as("uid"), col("cid"), col("sub"),
      col("rn").as("urn"))
    val pairs = u.join(chunked, Seq("cid", "sub"))
      .filter(col("urn") < col("rn")).count()
    assert(pairs == 9L, s"chunked sweep must see 9 pairs, saw $pairs")
    chunked.unpersist()
    // and with the cap NOT engaged (cap >= cell size) the sweep is the
    // full cell — chunking is inert exactly when cells are small
    val whole = graft.queries.CorpusMining.semCellChunks(a, 10)
    val uw = whole.select(col("vec_id").as("uid"), col("cid"), col("sub"),
      col("rn").as("urn"))
    assert(uw.join(whole, Seq("cid", "sub")).filter(col("urn") < col("rn")).count() == 45L)
  }

  test("ann_ivf_pq: every probe answered, answers drawn from the pruned cells, ranks well-formed") {
    val ivfpq = SparkEntry.queries("ann_ivf_pq")(spark, sf)
    val probes = graft.sources.Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 100 === 0).count()
    assert(ivfpq.select("probe_id").distinct().count() == probes, "every probe answered")
    // ranks are 1..5 per probe with non-decreasing exact distances
    val byProbe = ivfpq.collect()
      .groupBy(_.getLong(0)).values
    byProbe.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toSeq == (1L to sorted.length), "ranks consecutive from 1")
      assert(sorted.map(_.getDouble(2)).toSeq.sliding(2).forall(p => p.head <= p.last),
        "exact re-rank distances must be non-decreasing in rank")
    }
    // the cell pruning is real: results never leave the probe's cells —
    // which also means ivf_pq answers are a subset of the unrestricted
    // PQ shortlist universe, so sharing the probe's cell is checkable
    // through the label table
    val labels = graft.sources.Tables.embeddings(spark, sf).select(col("vec_id"), col("label"))
    val joined = ivfpq.join(labels, "vec_id")
      .join(labels.select(col("vec_id").as("probe_id"), col("label").as("probe_label")), "probe_id")
    // probes pick 2 cells of 8: at most 2 distinct result labels each
    val cellCounts = joined.groupBy("probe_id")
      .agg(countDistinct("label").as("n_cells")).collect()
    assert(cellCounts.forall(_.getLong(1) <= 2),
      "IVF-PQ answers must come from at most the 2 probed cells per probe")
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

  test("parsePpm is a real byte-level decoder: handcrafted container parses, malformed ones are rejected") {
    // 2x1 image, 6 body bytes with known values — built by hand, NOT by
    // the query's own encoder, so a decoder that shortcuts the parse
    // (e.g. the old checksum stub) cannot pass
    val body = Array[Byte](10, 20, 30, 40, 50, 60)
    val payload = "P6 2 1 255\n".getBytes("UTF-8") ++ body
    val d = Multimodal.parsePpm(7L, payload)
    assert(d == Multimodal.PpmDecoded(7L, 2L, 1L, 255L, 6L, 210L,
      java.security.MessageDigest.getInstance("MD5").digest(body)
        .map("%02x".format(_)).mkString))
    // wrong magic
    intercept[IllegalArgumentException] {
      Multimodal.parsePpm(8L, "P5 2 1 255\n".getBytes("UTF-8") ++ body)
    }
    // truncated body (header promises 6 bytes, payload carries 5)
    intercept[IllegalArgumentException] {
      Multimodal.parsePpm(9L, "P6 2 1 255\n".getBytes("UTF-8") ++ body.take(5))
    }
    // missing header terminator
    intercept[IllegalArgumentException] {
      Multimodal.parsePpm(10L, "P6 2 1 255".getBytes("UTF-8"))
    }
  }

  test("persist-once pair graph: bucketed edge table feeds CC, same labels, no edge re-shuffle") {
    import graft.operators.Storage
    // a pipeline at scale materializes the near-dup pair graph ONCE
    // (bucketed on the iteration key) and every graph consumer reads
    // the compact table — the storage-level form of the localCheckpoint
    // the inline query uses
    val pairs = SparkEntry.queries("dedup_simhash_pairs")(spark, sf)
    val bidir = pairs.select(col("doc_a"), col("doc_b"))
      .unionByName(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    Storage.writeBucketed(bidir, "graft_pair_graph", 4, "doc_b")
    val stored = Storage.table(spark, "graft_pair_graph")
    val nodes = graft.sources.Tables.documents(spark, sf).select(col("doc_id"))
    val fromStored = graft.queries.DedupQueries.componentsOverEdges(nodes, stored)
    val inline = SparkEntry.queries("dedup_components")(spark, sf)
    val rows = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(rows(fromStored) == rows(inline),
      "components over the persisted graph must equal the inline pipeline")
    // the bucketed edge side joins each round without its own
    // hash-partition exchange (the whole point of bucketing the write)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val oneRound = stored
        .join(nodes.withColumnRenamed("doc_id", "n_id"),
          stored("doc_b") === col("n_id"))
        .groupBy(col("doc_a")).agg(min(col("n_id")).as("m"))
      val plan = oneRound.queryExecution.executedPlan.toString()
      val edgeSideShuffles = "Exchange hashpartitioning\\(doc_b".r.findAllIn(plan).length
      assert(edgeSideShuffles == 0,
        s"bucketed edge side must not re-shuffle on its bucket key:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("resize: payload shrinks by the factor, deterministic, chains into decode") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    val resized = Multimodal.resizeAll(media, 4)
    val sizes = media.collect().map(m => m.media_id -> m.payload.length).toMap
    for (r <- resized.collect()) {
      val orig = sizes(r.media_id)
      assert(r.payload.length == (orig + 3) / 4,
        s"media ${r.media_id}: resized ${r.payload.length} from $orig")
    }
    // resize → decode chains without schema friction and stays deterministic
    val d1 = Multimodal.decodeAll(Multimodal.resizeAll(media, 4))
      .collect().sortBy(_.media_id).toSeq
    val d2 = Multimodal.decodeAll(Multimodal.resizeAll(media.repartition(3), 4))
      .collect().sortBy(_.media_id).toSeq
    assert(d1 == d2)
  }

  test("batched decode: batch boundaries never change results, batch shape honored") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    val single = Multimodal.decodeAll(media).collect().sortBy(_.media_id).toSeq
    // results identical across batch sizes and partitionings
    for (bs <- Seq(1, 7, 64, 10000)) {
      val b = Multimodal.decodeAllBatched(media.repartition(5), bs)
        .collect().sortBy(_.media_id).toSeq
      assert(b == single, s"batchSize=$bs changed the decode output")
    }
    // the batch contract itself: all-but-last full, order preserved
    val batches = Multimodal.batched((1 to 103).iterator, 10).toSeq
    assert(batches.dropRight(1).forall(_.size == 10) && batches.last.size == 3)
    assert(batches.flatten == (1 to 103))
  }
}
