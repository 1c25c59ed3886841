package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("langid predicts a language for every doc from the profile set") {
    val df = TextAnalysis.langId(spark, sfDir)
    assert(df.count() == Tables.documents(spark, sfDir).count())
    assert(df.filter(col("predicted_lang").isNull).count() == 0)
    val langs = df.select("predicted_lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "de", "es", "fr", "zh")))
  }

  test("quality signal in [0,1]; ratios bounded") {
    val bad = TextAnalysis.quality(spark, sfDir).filter(
      col("quality") < 0 || col("quality") > 1 ||
        col("stopword_ratio") < 0 || col("stopword_ratio") > 1 ||
        col("dup_ratio") < 0 || col("dup_ratio") > 1)
    assert(bad.count() == 0)
  }

  test("token counts: bpe-ish >= whitespace tokens on alpha text") {
    val bad = TextAnalysis.tokens(spark, sfDir)
      .filter(col("n_bpe_tokens") < col("n_ws_tokens"))
    assert(bad.count() == 0)
  }

  test("fingerprints: near-identical docs share fingerprints more than random ones") {
    val fp = TextAnalysis.fingerprint(spark, sfDir)
    // fingerprint is deterministic: running twice gives identical values
    val a = fp.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = TextAnalysis.fingerprint(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    // near-dup pairs from minhash should collide on fingerprint when est=1.0
    val identicalish = operators.Dedup.minhashLsh(spark, sfDir)
      .filter(col("est_jaccard") === 1.0).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val collisions = identicalish.count { case (x, y) => a.get(x) == a.get(y) && a.contains(x) }
    assert(identicalish.isEmpty || collisions > 0,
      s"expected some est=1.0 pairs to share fingerprints ($collisions/${identicalish.length})")
  }

  test("redaction: hit counts match recount and zero-hit docs hash unchanged") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), md5(col("text")).as("orig_md5")).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[String]("text"), r.getAs[String]("orig_md5"))).toMap
    val rows = TextAnalysis.redact(spark, sfDir).collect()
    assert(rows.length == docs.size)
    val pat = "\\b(customer|value|table)\\b".r
    rows.foreach { r =>
      val (text, origMd5) = docs(r.getAs[Long]("doc_id"))
      val expected = pat.findAllIn(text).size.toLong
      assert(r.getAs[Long]("n_hits") == expected)
      if (expected == 0) assert(r.getAs[String]("redacted_md5") == origMd5,
        s"doc ${r.getAs[Long]("doc_id")}: unredacted doc should hash unchanged")
      else assert(r.getAs[String]("redacted_md5") != origMd5)
    }
    assert(rows.exists(_.getAs[Long]("n_hits") > 0), "vacuous: no doc had any hit")
  }

  test("entropy is bounded by ln(n_distinct) and zero iff one distinct token") {
    val rows = TextAnalysis.entropy(spark, sfDir).collect()
    assert(rows.length == Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy")
      val d = r.getAs[Long]("n_distinct")
      assert(h >= -1e-9, s"doc ${r.getAs[Long]("doc_id")}: negative entropy $h")
      // uniform distribution maximizes H at ln(d); allow rounding slack
      assert(h <= math.log(d.toDouble) + 1e-4, s"doc ${r.getAs[Long]("doc_id")}: H=$h > ln($d)")
      assert(d > 1 || h < 1e-9)
      assert(d <= r.getAs[Long]("n_tokens"))
    }
  }

  test("langid eval: confusion matrix covers the corpus; diagonal dominates") {
    val rows = operators.TextAnalysis.langIdEval(spark, sfDir).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables.documents(spark, sfDir).count())
    val diag = rows.filter(r => r.getString(0) == r.getString(1)).map(_.getAs[Long]("n_docs")).sum
    assert(diag.toDouble / total > 0.2, s"accuracy $diag/$total below chance-ish floor")
  }

  test("repetition: top-ngram counts obey coverage bounds and agree with entropy's tallies") {
    val rep = operators.TextAnalysis.repetition(spark, sfDir)
    rep.collect().foreach { r =>
      val (n, d, top) = (r.getAs[Int]("n_words"), r.getAs[Int]("n_distinct_words"),
        r.getAs[Int]("top_word_count"))
      assert(top >= 1 && top <= n && d <= n)
      // pigeonhole: the max count can't be smaller than the mean bucket
      assert(top.toLong * d >= n, s"doc ${r.getAs[Long]("doc_id")}: top=$top d=$d n=$n")
      assert(r.getAs[Int]("n_bigrams") == math.max(n - 1, 0))
      assert(r.getAs[Int]("top_bigram_count") <= math.max(n - 1, 0))
      assert(r.getAs[Int]("n_distinct_bigrams") <= r.getAs[Int]("n_bigrams"))
      assert(r.getAs[String]("top_word") != null)
    }
    // the word tallies must agree with text_entropy's independent explode-based count
    val ent = operators.TextAnalysis.entropy(spark, sfDir)
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"))
    val mismatches = rep.select(col("doc_id"), col("n_words"), col("n_distinct_words"))
      .join(ent, "doc_id")
      .filter(col("n_words") =!= col("n_tokens") ||
        col("n_distinct_words") =!= col("n_distinct"))
    assert(mismatches.count() == 0)
  }

  test("text_keywords: top-3 per doc, rank consistent with rounded score") {
    val rows = operators.TextAnalysis.keywords(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length))
      assert(rs.length <= 3)
      // rank order must be monotone non-increasing in the rounded score
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      sorted.sliding(2).foreach {
        case Array(hi, lo) =>
          val sh = hi.getAs[Double]("score"); val sl = lo.getAs[Double]("score")
          assert(sh > sl || (sh == sl && hi.getAs[String]("word") < lo.getAs[String]("word")))
        case _ =>
      }
    }
    // a word occurring in every document scores exactly 0 (ln 1)
    rows.filter(r => r.getAs[Long]("df") == byDoc.size)
      .foreach(r => assert(r.getAs[Double]("score") == 0.0))
  }

  test("char classes partition every document's characters exactly") {
    val texts = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val rows = operators.TextAnalysis.charClasses(spark, sfDir).collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val t = texts(r.getAs[Long]("doc_id"))
      assert(r.getAs[Int]("n_chars_total") == t.length)
      assert(r.getAs[Int]("n_alpha") == t.count(_.isLetter))
      assert(r.getAs[Int]("n_digit") == t.count(_.isDigit))
      assert(r.getAs[Int]("n_space") == t.count(_ == ' '))
      assert(r.getAs[Int]("n_punct") == t.count(".,;:!?".contains(_)))
      assert(r.getAs[Int]("n_other") >= 0)
      assert(r.getAs[Int]("n_alpha") + r.getAs[Int]("n_digit") + r.getAs[Int]("n_space")
        + r.getAs[Int]("n_punct") + r.getAs[Int]("n_other") == t.length)
    }
  }

  test("fertility strata tally with the per-doc token counters") {
    val tok = operators.TextAnalysis.tokens(spark, sfDir)
      .agg(sum("n_ws_tokens"), sum("n_bpe_tokens")).head()
    val rows = operators.TextAnalysis.fertility(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_words")).sum == tok.getLong(0))
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == tok.getLong(1))
    rows.foreach { r =>
      val cpt = r.getAs[Double]("chars_per_token")
      val tpw = r.getAs[Double]("tokens_per_word")
      assert(cpt > 0 && cpt < 20, s"chars/token out of plausible band: $cpt")
      assert(tpw >= 1.0 - 1e-9, "BPE-ish segmentation never merges across whitespace")
      assert(r.getAs[Long]("n_chars") >= r.getAs[Long]("n_words"), "words cost at least one char")
    }
  }

  test("dup coverage matches a row-local recomputation on every document") {
    val texts = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(' ')).toMap
    val rows = operators.TextAnalysis.dupCoverage(spark, sfDir).collect()
    assert(rows.length == texts.count(_._2.length >= 3))
    var anyDup = false
    rows.foreach { r =>
      val ts = texts(r.getAs[Long]("doc_id"))
      val grams = ts.sliding(3).map(_.mkString(" ")).toArray
      val counts = grams.groupBy(identity).view.mapValues(_.length)
      val dupPos = grams.indices.filter(i => counts(grams(i)) >= 2)
      val covered = dupPos.flatMap(i => i until i + 3).distinct.length
      assert(r.getAs[Long]("n_words") == ts.length)
      assert(r.getAs[Long]("n_dup_grams") == counts.count(_._2 >= 2))
      assert(r.getAs[Long]("n_dup_occurrences") == dupPos.length)
      assert(r.getAs[Long]("n_words_covered") == covered)
      if (dupPos.nonEmpty) anyDup = true
    }
    assert(anyDup, "the corpus contains at least one internally repetitive document")
  }

  test("zipf: counts match recounts and the slope matches a driver-side OLS fit") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("text").split(' ')))
    val rows = operators.TextAnalysis.zipf(spark, sfDir).collect()
    val bySource = docs.groupBy(_._1).view.mapValues(_.flatMap(_._2)).toMap
    assert(rows.length == bySource.size)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val toks = bySource(src)
      assert(r.getAs[Long]("n_tokens") == toks.length)
      val freq = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
      assert(r.getAs[Long]("n_vocab") == freq.size)
      val slope = r.getAs[Double]("zipf_slope")
      assert(slope < 0, s"$src: Zipf slope must be negative, got $slope")
      // driver-side OLS of ln(freq) ~ ln(rank) with the same tie-break
      val ranked = freq.toSeq.sortBy { case (w, f) => (-f, w) }.zipWithIndex
        .map { case ((_, f), i) => (math.log(i + 1.0), math.log(f.toDouble)) }
      val n = ranked.length
      val mx = ranked.map(_._1).sum / n
      val my = ranked.map(_._2).sum / n
      val beta = ranked.map { case (x, y) => (x - mx) * (y - my) }.sum /
        ranked.map { case (x, _) => (x - mx) * (x - mx) }.sum
      assert(math.abs(slope - beta) < 2e-4, s"$src: engine $slope vs driver $beta")
    }
  }

  test("ngram novelty: every distinct gram is novel exactly once; first doc scores 1.0") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(' '))
      .filter(_._2.length >= 3)
    val rows = operators.TextAnalysis.ngramNovelty(spark, sfDir).collect()
    assert(rows.length == docs.length)
    val allGrams = docs.flatMap(_._2.sliding(3).map(_.mkString(" ")).toSeq.distinct.map(_ -> ()))
    val distinctGrams = allGrams.map(_._1).distinct.length
    assert(rows.map(_.getAs[Long]("n_novel")).sum == distinctGrams,
      "each distinct corpus gram must be counted novel at exactly its first document")
    val firstDoc = docs.map(_._1).min
    val firstRow = rows.find(_.getAs[Long]("doc_id") == firstDoc).get
    assert(firstRow.getAs[Double]("novelty") == 1.0)
    rows.foreach { r =>
      val nov = r.getAs[Double]("novelty")
      assert(nov >= 0.0 && nov <= 1.0)
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_grams"))
    }
  }
  test("readability: surface counts recomputed with java regex, bands partition the corpus") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .toMap
    val rows = operators.TextAnalysis.readability(spark, sfDir).collect()
    val sentRe = java.util.regex.Pattern.compile("[.!?]+")
    val sylRe = java.util.regex.Pattern.compile("[aeiouy]+")
    def count(p: java.util.regex.Pattern, t: String): Long = {
      val m = p.matcher(t); var n = 0L; while (m.find()) n += 1; n
    }
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val text = docs(r.getAs[Long]("doc_id"))
      val w = text.split(" ", -1).length.toLong
      val sent = math.max(count(sentRe, text), 1L)
      val syl = count(sylRe, text.toLowerCase)
      assert(r.getAs[Long]("n_words") == w)
      assert(r.getAs[Long]("n_sentences") == sent)
      assert(r.getAs[Long]("n_syllables") == syl)
      val grade = math.floor((0.39 * w / sent + 11.8 * syl / w - 15.59) * 10000 + 0.5) / 10000.0
      assert(math.abs(r.getAs[Double]("fk_grade") - grade) < 1e-9)
      val band = r.getAs[String]("band")
      if (grade < 8) assert(band == "accessible")
      else if (grade < 12) assert(band == "standard")
      else assert(band == "advanced")
    }
    // every (non-empty) document scores exactly once
    assert(rows.length == docs.count { case (_, t) => t.split(" ", -1).nonEmpty })
  }
}
