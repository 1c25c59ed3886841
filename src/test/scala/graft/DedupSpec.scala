package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  test("exact dedup: canonical id never exceeds doc id, all docs covered") {
    val df = Dedup.exact(spark, sfDir)
    assert(df.count() == Tables.documents(spark, sfDir).count())
    assert(df.filter(col("canonical_id") > col("doc_id")).count() == 0)
    assert(df.filter(col("is_canonical") && col("canonical_id") =!= col("doc_id")).count() == 0)
  }

  test("minhash LSH finds the planted near-dup pairs with high estimates") {
    val rows = Dedup.minhashLsh(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val e = r.getAs[Double]("est_jaccard"); e >= 0.5 && e <= 1.0
    })
    assert(rows.forall(r => r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b")))
  }

  test("simhash near-dups have hamming <= 3 and ordered pairs") {
    val rows = Dedup.simhash(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("hamming") <= 3))
    assert(rows.forall(r => r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b")))
  }

  test("simhash near-dups are also minhash candidates (cross-validation)") {
    // hamming ≤ 3 over token simhash is a *stricter* notion of near-dup
    // than banded minhash candidacy — every simhash pair should also be
    // surfaced by the minhash signature agreement.
    val sh = Dedup.simhash(spark, sfDir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = Dedup.minhashLsh(spark, sfDir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sh.nonEmpty)
    assert(sh.subsetOf(mh), s"simhash pairs missing from minhash: ${sh.diff(mh)}")
  }

  test("ngram jaccard values bounded and pairs blocked consistently") {
    val rows = Dedup.ngramJaccard(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val j = r.getAs[Double]("jaccard"); j >= 0.3 && j <= 1.0
    })
  }

  test("embedding cosine bounded in [-1, 1] and thresholded") {
    val rows = Dedup.embedCosine(spark, sfDir).collect()
    assert(rows.forall { r =>
      val c = r.getAs[Double]("cos"); c > 0.35 && c <= 1.0
    })
  }

  test("minhash recall accounting is internally consistent") {
    val r = operators.Dedup.minhashRecall(spark, sfDir).head()
    val (t, c, h) = (r.getAs[Long]("n_true"), r.getAs[Long]("n_candidates"), r.getAs[Long]("n_hit"))
    assert(h <= t && h <= c)
    assert(r.getAs[Double]("recall") >= 0 && r.getAs[Double]("recall") <= 1)
  }
}
