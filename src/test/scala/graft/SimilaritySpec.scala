package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("brute-force topk returns exactly k ranked neighbors per probe") {
    val rows = Similarity.bruteTopK(spark, sfDir).collect()
    val perProbe = rows.groupBy(_.getAs[Long]("probe_id"))
    assert(perProbe.size == 10)
    perProbe.foreach { case (_, rs) =>
      assert(rs.length == 5)
      val cs = rs.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("cos"))
      assert(cs.sameElements(cs.sortBy(-_)), "cos must be non-increasing in rank")
    }
  }

  test("no probe appears as its own neighbor") {
    assert(Similarity.bruteTopK(spark, sfDir)
      .filter(col("probe_id") === col("vec_id")).count() == 0)
    assert(Similarity.lshTopK(spark, sfDir)
      .filter(col("probe_id") === col("vec_id")).count() == 0)
  }

  test("LSH neighbors never beat the brute-force best") {
    val bruteBest = Similarity.bruteTopK(spark, sfDir)
      .filter(col("rnk") === 1).collect()
      .map(r => r.getAs[Long]("probe_id") -> r.getAs[Double]("cos")).toMap
    val lsh = Similarity.lshTopK(spark, sfDir).collect()
    lsh.foreach { r =>
      val p = r.getAs[Long]("probe_id")
      assert(r.getAs[Double]("cos") <= bruteBest(p) + 1e-9)
    }
  }

  test("LSH scores match brute-force scores for shared (probe, neighbor) pairs") {
    val brute = Similarity.bruteTopK(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id")) -> r.getAs[Double]("cos")).toMap
    val lsh = Similarity.lshTopK(spark, sfDir).collect()
    val shared = lsh.flatMap { r =>
      brute.get((r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id")))
        .map(_ -> r.getAs[Double]("cos"))
    }
    assert(shared.nonEmpty, "bucketing should recover at least one true top-5 neighbor")
    shared.foreach { case (b, l) => assert(math.abs(b - l) < 1e-9) }
  }

  test("adaptive plane count holds expected bucket occupancy constant") {
    // the integer formula: smallest p with 2^p * 16 >= n, floored at
    // 4, capped at the generated matrix — spot values at each test sf
    // plus the power-of-two boundaries libm log2 would get wrong
    assert(operators.Similarity.planesFor(1L) == 4)
    assert(operators.Similarity.planesFor(16L) == 4)
    assert(operators.Similarity.planesFor(256L) == 4)
    assert(operators.Similarity.planesFor(257L) == 5)
    assert(operators.Similarity.planesFor(500L) == 5)   // sf0.001/0.01
    assert(operators.Similarity.planesFor(2000L) == 7)  // sf0.1
    assert(operators.Similarity.planesFor(20000L) == 11) // sf1
    assert(operators.Similarity.planesFor(1L << 21) == 17) // ~2M vectors
    assert(operators.Similarity.planesFor(1L << 25) == 21) // ~34M (past the old 20-plane cap)
    assert(operators.Similarity.planesFor((1L << 32) * 16L) == 32) // exactly at cap
    assert(operators.Similarity.planesFor(1L << 40) == 32) // matrix cap (r9: 32 planes/table ~ 68B vectors)
    // occupancy invariant: n / 2^planes <= TargetBucket whenever the
    // cap hasn't kicked in -> the (table,bucket) self-join cost is
    // SUM(bucket^2) ~= n * TargetBucket, linear in the corpus
    Seq(100L, 500L, 2000L, 20000L, 200000L, 2000000L, 1L << 21, 1L << 25,
        1L << 30).foreach { n =>
      val p = operators.Similarity.planesFor(n)
      assert(p < operators.Similarity.MaxPlanesPerTable ==>
        (n.toDouble / (1L << p) <= operators.Similarity.TargetBucket),
        s"n=$n planes=$p occupancy=${n.toDouble / (1L << p)}")
    }
    // Spark's bin()-based SQL form computes the same plane count as
    // the Scala reference formula (and hence as the DuckDB oracle,
    // whose text uses the identical integer ops) — pinned through the
    // 2^21 / 2^25 / cap cases so the raised 32-plane cap is exercised
    val sqlPlanes = spark.sql(
      ("SELECT n, least(32, greatest(4, length(bin((n + 15) div 16 - 1)))) AS np " +
        "FROM VALUES (1L),(16L),(256L),(257L),(500L),(2000L),(20000L)," +
        s"(${1L << 21}L),(${1L << 25}L),(${(1L << 32) * 16L}L),(${1L << 40}L) AS t(n)"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    sqlPlanes.foreach { case (n, np) =>
      assert(np == operators.Similarity.planesFor(n), s"sql np($n)=$np")
    }
  }

  implicit class BoolOps(private val a: Boolean) {
    def ==>(b: => Boolean): Boolean = !a || b
  }

  test("hyperplane weights are deterministic ±1") {
    val w1 = (0 until 8).map(p => (0 until 64).map(d => Similarity.weight(p, d)))
    val w2 = (0 until 8).map(p => (0 until 64).map(d => Similarity.weight(p, d)))
    assert(w1 == w2)
    assert(w1.flatten.forall(v => v == 1 || v == -1))
    assert(w1.flatten.count(_ == 1) > 100, "parity should be roughly balanced")
  }

  test("int8 quantization: one row per dim, mae bounded by half a step") {
    val rows = Similarity.embQuantize(spark, sfDir).collect()
    assert(rows.length == 64)
    assert(rows.map(_.getAs[Long]("dim")).sorted.toSeq == (1L to 64L))
    rows.foreach { r =>
      val lo = r.getAs[Double]("lo"); val hi = r.getAs[Double]("hi")
      val scale = r.getAs[Double]("scale"); val mae = r.getAs[Double]("mae")
      assert(lo < hi)
      // scale is rounded from (hi-lo)/255 where lo/hi are rounded to 4dp
      assert(math.abs(scale - (hi - lo) / 255.0) < 1e-4)
      // |dequant - v| <= scale/2 pointwise, so the mean obeys it too
      assert(mae >= 0 && mae <= scale / 2 + 1e-9, s"dim ${r.getAs[Long]("dim")}: mae $mae > scale/2 ${scale / 2}")
    }
  }

  test("ann_hard_negatives: only cross-label candidates, similarity-ranked") {
    val rows = operators.Similarity.hardNegatives(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("probe_label") != r.getAs[Int]("neg_label"),
        "a hard negative must come from a different label than its probe")
      val c = r.getAs[Double]("cos")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
    val byProbe = rows.groupBy(_.getAs[Long]("probe_id"))
    byProbe.values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rnk")).sorted.toSeq == (1 to rs.length) && rs.length <= 5)
      val cs = rs.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("cos"))
      cs.sliding(2).foreach {
        case Array(a, b) => assert(a >= b - 1e-9, "cosine must be non-increasing in rank")
        case _ =>
      }
    }
  }

  test("ann_recall_eval: recall is hits/5 and hits recount against the two paths") {
    val rows = operators.Similarity.recallEval(spark, sfDir).collect()
    assert(rows.length == 10, "one row per probe")
    rows.foreach { r =>
      val h = r.getAs[Long]("n_hits")
      assert(h >= 0 && h <= 5)
      assert(math.abs(r.getAs[Double]("recall") - h / 5.0) < 1e-9)
    }
    // independent recount: intersect the two registered paths directly
    val truth = operators.Similarity.bruteTopK(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"))).toSet
    val approx = operators.Similarity.lshTopK(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"))).toSet
    rows.foreach { r =>
      val p = r.getAs[Long]("probe_id")
      val expect = truth.count { case (tp, tv) => tp == p && approx((tp, tv)) }
      assert(r.getAs[Long]("n_hits") == expect, s"probe $p recount mismatch")
    }
  }

  test("emb_outliers: per-label accounting bounded and stats sane") {
    val rows = operators.Similarity.embOutliers(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_vecs")).sum
    val corpus = graft.Tables.embeddings(spark, sfDir).count()
    assert(total == corpus, "every vector must be assigned to exactly one label group")
    rows.foreach { r =>
      val n = r.getAs[Long]("n_vecs"); val o = r.getAs[Long]("n_outliers")
      assert(o >= 0 && o < n, "a z>2 outlier set can never be the whole cluster")
      assert(r.getAs[Double]("mean_dist2") > 0)
      // if anything was flagged, the max z must itself exceed the threshold
      if (o > 0) assert(r.getAs[Double]("max_z") > 2.0)
    }
  }

  test("range search agrees with brute-force top-1 and respects the threshold") {
    val range = Similarity.rangeSearch(spark, sfDir).collect()
      .map(r => r.getAs[Long]("probe_id") ->
        (r.getAs[Long]("n_matches"), r.getAs[Double]("avg_cos"), r.getAs[Double]("max_cos"))).toMap
    range.values.foreach { case (n, avg, mx) =>
      assert(n >= 1)
      assert(avg >= 0.2 - 1e-9 && avg <= mx + 1e-9, "mean of a >=tau set sits in [tau, max]")
      assert(mx >= 0.2 - 1e-9)
    }
    // a probe whose brute-force best is over the threshold MUST appear,
    // and its max_cos must be exactly that best (both sides 4dp-rounded)
    val best = Similarity.bruteTopK(spark, sfDir)
      .filter(col("rnk") === 1).collect()
      .map(r => r.getAs[Long]("probe_id") -> r.getAs[Double]("cos")).toMap
    best.foreach { case (p, c) =>
      if (c >= 0.2) {
        assert(range.contains(p), s"probe $p has a >=tau neighbor but no range row")
        assert(math.abs(range(p)._3 - c) < 1e-9)
      }
    }
  }

  test("dimension correlations are ranked, bounded, and match a brute-force Pearson") {
    val rows = Similarity.dimCorr(spark, sfDir).collect()
    assert(rows.length == 20)
    val rs = rows.map(_.getAs[Double]("r"))
    assert(rs.forall(r => math.abs(r) <= 1.0 + 1e-9))
    assert(rs.map(math.abs).sameElements(rs.map(math.abs).sortBy(-(_: Double))),
      "rows must be ranked by |r| descending")
    val n = graft.Tables.embeddings(spark, sfDir).count()
    assert(rows.forall(_.getAs[Long]("n") == n), "every pair sees the full corpus")
    rows.foreach(r => assert(r.getAs[Long]("i") < r.getAs[Long]("j")))
    // brute-force the top pair on the same integer grid
    val top = rows.head
    val (ti, tj) = (top.getAs[Long]("i").toInt, top.getAs[Long]("j").toInt)
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .selectExpr("cast(embedding AS array<double>) AS e").collect()
      .map(_.getSeq[Double](0))
    val xs = vecs.map(v => math.floor(v(ti - 1) * 10000 + 0.5).toLong)
    val ys = vecs.map(v => math.floor(v(tj - 1) * 10000 + 0.5).toLong)
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val (sxx, syy) = (xs.map(a => a * a).sum, ys.map(a => a * a).sum)
    val num = (n * sxy - sx * sy).toDouble
    val den = math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)
    assert(math.abs(top.getAs[Double]("r") - math.round(num / den * 10000.0) / 10000.0) < 1e-9)
  }

  test("norm card covers the corpus with internally consistent ranges") {
    val rows = Similarity.normCard(spark, sfDir).collect()
    val corpus = graft.Tables.embeddings(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == corpus)
    rows.foreach { r =>
      val (lo, hi) = (r.getAs[Double]("min_norm"), r.getAs[Double]("max_norm"))
      val m2 = r.getAs[Double]("mean_norm2")
      assert(lo <= hi + 1e-9)
      assert(m2 >= lo * lo - 1e-3 && m2 <= hi * hi + 1e-3,
        "mean squared norm sits inside the squared range")
      assert(r.getAs[Long]("n_zero") == 0, "this corpus has no zero vectors")
      assert(lo > 0, "cosine consumers rely on nonzero norms")
    }
  }

  test("pca power step matches an exact integer recomputation and is unit-norm") {
    val grid = graft.Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "cast(embedding AS array<double>) AS e").collect()
      .map(_.getSeq[Double](1).map(x => math.floor(x * 10000 + 0.5).toLong).toArray)
    val n = grid.length.toLong
    val s = Array.tabulate(64)(i => grid.map(_(i)).sum)
    val bigS = s.sum
    val u = Array.tabulate(64)(i => grid.map(v => v(i) * v.sum).sum)
    val v1 = Array.tabulate(64)(i => n * u(i) - s(i) * bigS)
    val nsq = v1.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)
    val rows = Similarity.pcaPower(spark, sfDir).collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      val d = r.getAs[Long]("dim").toInt - 1
      assert(r.getAs[Long]("sum_q") == s(d))
      assert(r.getAs[Long]("v1") == v1(d), s"dim ${d + 1}: exact integer v1 mismatch")
      assert(r.getAs[Double]("loading") ==
        math.floor(v1(d) / math.sqrt(nsq) * 10000 + 0.5) / 10000.0)
    }
    val norm2 = rows.map(r => { val l = r.getAs[Double]("loading"); l * l }).sum
    assert(math.abs(norm2 - 1.0) < 0.01, s"loadings should be ~unit norm, got $norm2")
  }

  test("pq adc recall matches a full driver-side PQ recomputation") {
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "cast(embedding AS array<double>) AS e").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1).toArray).toMap
    def sub(v: Array[Double], j: Int): Array[Double] = v.slice(j * 16, j * 16 + 16)
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }; s
    }
    val cent = (0L until 16L).map(vecs).toArray
    val code = vecs.map { case (id, v) =>
      id -> (0 until 4).map { j =>
        val ds = cent.map(c => l2(sub(v, j), sub(c, j)))
        ds.indexOf(ds.min) // smallest centroid wins ties, as array_position does
      }.toArray
    }
    def top5(scores: Map[Long, Double]): Set[Long] =
      scores.toSeq.sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSet
    val expected = (0L until 10L).map { p =>
      val pv = vecs(p)
      val others = vecs.keySet - p
      val exact = top5(others.map(id => id -> l2(pv, vecs(id))).toMap)
      val adc = top5(others.map { id =>
        id -> (0 until 4).map(j => l2(sub(pv, j), sub(cent(code(id)(j)), j))).sum
      }.toMap)
      p -> (exact intersect adc).size.toLong
    }.toMap
    val rows = Similarity.pqAdc(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val p = r.getAs[Long]("probe_id")
      assert(r.getAs[Long]("n_hit") == expected(p),
        s"probe $p: reported ${r.getAs[Long]("n_hit")}, recomputed ${expected(p)}")
      assert(r.getAs[Double]("recall5") == expected(p) / 5.0)
    }
    assert(rows.map(_.getAs[Long]("n_hit")).sum > 0, "ADC must recover some exact neighbors")
  }

  test("knn graph: ranked per-node edges, exact cosines, never beats brute force") {
    val vecs = Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "cast(embedding AS array<double>) AS e").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1).toArray).toMap
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val rows = operators.Similarity.nnGraph(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val bySrc = rows.groupBy(_.getAs[Long]("src"))
    // a healthy LSH graph covers most of the corpus with full degree
    assert(bySrc.size > vecs.size / 2, s"graph covers only ${bySrc.size}/${vecs.size} nodes")
    bySrc.foreach { case (src, es) =>
      val sorted = es.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.map(_.getAs[Int]("rnk")).toSeq == (1 to es.length), s"$src: ranks")
      val cs = sorted.map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, s"$src: cos must be non-increasing")
      sorted.foreach { r =>
        val exact = math.rint(cosine(vecs(src), vecs(r.getAs[Long]("dst"))) * 10000) / 10000.0
        assert(math.abs(r.getAs[Double]("cos") - exact) <= 1e-4, s"$src->${r.getAs[Long]("dst")}")
      }
    }
    // approximate graph never beats exact search: for the brute-force
    // probes, the graph's best neighbor is at most the exact best
    val brute = operators.Similarity.bruteTopK(spark, sfDir).collect()
      .filter(_.getAs[Int]("rnk") == 1)
      .map(r => r.getAs[Long]("probe_id") -> r.getAs[Double]("cos")).toMap
    bySrc.filter(_._1 < 10).foreach { case (src, es) =>
      val best = es.map(_.getAs[Double]("cos")).max
      assert(best <= brute(src) + 1e-9, s"$src: graph $best beats exact ${brute(src)}")
    }
  }

  test("nn-descent: candidate-superset monotonicity, 2-hop provenance, exact cosines") {
    val base = operators.Similarity.nnGraph(spark, sfDir).collect()
    val refined = operators.Similarity.nnDescent(spark, sfDir).collect()
    assert(refined.nonEmpty)
    val baseBySrc = base.groupBy(_.getAs[Long]("src"))
    val refBySrc = refined.groupBy(_.getAs[Long]("src"))
    // same node set, and at least as many edges per node (candidates
    // are a superset of the round-0 edges)
    assert(refBySrc.keySet == baseBySrc.keySet)
    // per-rank monotonic improvement: the refined rank-r cosine never
    // drops below the round-0 rank-r cosine
    refBySrc.foreach { case (src, es) =>
      val r = es.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("cos"))
      val b = baseBySrc(src).sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("cos"))
      assert(r.length >= b.length, s"$src: refined degree ${r.length} < base ${b.length}")
      b.indices.foreach { i =>
        assert(r(i) >= b(i) - 1e-9, s"$src rank ${i + 1}: refined ${r(i)} < base ${b(i)}")
      }
      assert(es.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Int]("rnk")).toSeq == (1 to es.length))
    }
    // provenance: every refined edge lies within 2 undirected hops of
    // its source in the round-0 graph
    val und = base.flatMap { r =>
      val s0 = r.getAs[Long]("src"); val d0 = r.getAs[Long]("dst")
      Seq(s0 -> d0, d0 -> s0)
    }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    refined.foreach { r =>
      val s0 = r.getAs[Long]("src"); val d0 = r.getAs[Long]("dst")
      val oneHop = und.getOrElse(s0, Set.empty[Long])
      val twoHop = oneHop.flatMap(v => und.getOrElse(v, Set.empty[Long]))
      assert(oneHop.contains(d0) || twoHop.contains(d0), s"$s0->$d0 not within 2 hops")
    }
    // exact cosines on the refined edges
    val vecs = Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "cast(embedding AS array<double>) AS e").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1).toArray).toMap
    refined.foreach { r =>
      val a = vecs(r.getAs[Long]("src")); val bb = vecs(r.getAs[Long]("dst"))
      val dot = a.zip(bb).map { case (x, y) => x * y }.sum
      val exact = dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(bb.map(x => x * x).sum))
      assert(math.abs(r.getAs[Double]("cos") - math.rint(exact * 10000) / 10000.0) <= 1e-4)
    }
  }

  test("graph recall card: recomputed hits, and descent never loses recall vs round-0") {
    val rows = operators.Similarity.graphRecall(spark, sfDir).collect()
    assert(rows.length == 2)
    val byStage = rows.map(r => r.getAs[String]("stage") -> r).toMap
    assert(byStage.keySet == Set("graph", "descent"))
    // truth size: 3 exact neighbors per probe
    rows.foreach { r =>
      assert(r.getAs[Long]("n_true") == 30)
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_true"))
      val rec = r.getAs[Double]("recall3")
      assert(rec >= 0 && rec <= 1)
    }
    // monotone: any candidate displacing an exact-top-3 member from a
    // top-3-of-superset has higher cosine and is thus exact top-3 itself
    assert(byStage("descent").getAs[Long]("n_hit") >= byStage("graph").getAs[Long]("n_hit"))
    // recompute the graph-stage hits from the public operators
    val truth = operators.Similarity.bruteTopK(spark, sfDir).collect()
      .filter(_.getAs[Int]("rnk") <= 3)
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"))).toSet
    val gHits = operators.Similarity.nnGraph(spark, sfDir).collect()
      .filter(_.getAs[Long]("src") < 10)
      .count(r => truth.contains((r.getAs[Long]("src"), r.getAs[Long]("dst"))))
    assert(byStage("graph").getAs[Long]("n_hit") == gHits)
  }
}
