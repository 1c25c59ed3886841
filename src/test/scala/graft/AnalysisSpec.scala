package graft

import graft.operators.Analysis
import org.apache.spark.sql.functions._

class AnalysisSpec extends SparkSpec {

  test("fuzzy match scores bounded and above threshold") {
    val rows = Analysis.fuzzyMatch(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val sc = r.getAs[Double]("score"); sc >= 0.5 && sc <= 1.0
    })
    // exact name must score 1.0 if present
    val exact = rows.filter(_.getAs[String]("p_name") == "small widget")
    assert(exact.forall(_.getAs[Double]("score") == 1.0))
  }

  test("name normalization produces snake_case only") {
    val bad = Analysis.nameNormalize(spark, sfDir)
      .filter(!col("norm_name").rlike("^[a-z0-9_]+$"))
    assert(bad.count() == 0)
  }

  test("field extract parses every props payload") {
    val df = Analysis.fieldExtract(spark, sfDir)
    val total = df.agg(sum("n")).head().getLong(0)
    assert(total == Tables.events(spark, sfDir).count())
    assert(df.filter(col("avg_k").isNull).count() == 0)
  }

  test("quality scores within category bounds and grade consistent") {
    val df = Analysis.qualityScore(spark, sfDir)
    val bad = df.filter(
      col("naming_score") < 0 || col("naming_score") > 25 ||
        col("doc_score") < 0 || col("doc_score") > 25 ||
        col("type_score") < 0 || col("type_score") > 25 ||
        col("evolution_score") < 0 || col("evolution_score") > 25 ||
        col("overall") =!= col("naming_score") + col("doc_score") + col("type_score") + col("evolution_score"))
    assert(bad.count() == 0)
    val gradeBad = df.filter(col("overall") >= 90 && col("grade") =!= "A")
    assert(gradeBad.count() == 0)
  }
}
