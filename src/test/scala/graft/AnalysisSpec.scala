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

  test("field paths flatten nested payloads with data-driven presence") {
    val df = Analysis.fieldPaths(spark, sfDir)
    val rows = df.collect().map(r =>
      (r.getAs[String]("path"), r.getAs[String]("jtype")) -> r.getAs[Long]("n")).toMap
    val total = Tables.events(spark, sfDir).count()
    // envelope fields present on every row; conditional ones on a strict subset
    assert(rows(("meta", "object")) == total)
    assert(rows(("meta.etype", "string")) == total)
    assert(rows(("props.k", "number")) == total)
    assert(rows.contains(("meta.sev", "number")) && rows(("meta.sev", "number")) < total)
    assert(rows.contains(("usr", "number")) && rows(("usr", "number")) < total)
    // nested path separator proves depth-2 recursion, not a flat key list
    assert(rows.keys.exists(_._1.contains(".")))
  }

  test("proto field extraction parses exactly the field lines, with reference modifier semantics") {
    val nDocs = Tables.documents(spark, sfDir)
      .filter(size(split(col("text"), " ")) >= 6).count()
    val rows = Analysis.protoFields(spark, sfDir).collect()
    // the 6 generated lines hit exactly these modifier×type slots
    val expected = Set(
      ("", "string"), ("optional", "string"), ("optional", "int64"),
      ("repeated", "bool"), ("required", "int64"), ("required", "bool"))
    assert(rows.map(r => (r.getAs[String]("modifier"), r.getAs[String]("ftype"))).toSet == expected)
    rows.foreach { r =>
      // every document contributes one field per slot; the non-field
      // lines (comment, message header, reserved, brace) never parse
      assert(r.getAs[Long]("n_fields") == nDocs, r.toString)
      // required iff the modifier literal is `required` (fields.go:233)
      assert(r.getAs[Boolean]("required") == (r.getAs[String]("modifier") == "required"))
      assert(!Seq("message", "reserved").contains(r.getAs[String]("ftype")))
      val names = r.getAs[Long]("n_names")
      assert(names >= 1 && names <= nDocs)
    }
  }

  test("json paths expression handles malformed and non-object input") {
    graft.functions.Native.register(spark)
    import spark.implicits._
    val out = Seq("{\"a\":{\"b\":1}}", "not json", "[1,2]", "{\"x\":null}")
      .toDF("j")
      .selectExpr("graft_json_paths(j) AS p")
      .collect()
      .map(_.getSeq[org.apache.spark.sql.Row](0).map(r => (r.getString(0), r.getString(1))))
    assert(out(0) == Seq(("a", "object"), ("a.b", "number")))
    assert(out(1).isEmpty) // malformed → empty, not a crash
    assert(out(2).isEmpty) // non-object root has no named fields
    assert(out(3) == Seq(("x", "null")))
  }

  test("fuzzy candidates: exact variant scores 1.0 and plan is join not cartesian") {
    val df = Analysis.fuzzyCandidates(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every query derives from a real candidate name, so its space-variant
    // matches that candidate exactly → best_score 1.0 for at least one pair
    assert(rows.exists(_.getAs[Double]("best_score") == 1.0))
    assert(rows.forall { r =>
      val s = r.getAs[Double]("best_score"); s >= 0.75 && s <= 1.0
    })
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "blocked join must not be a cartesian product")
    assert(plan.contains("BroadcastHashJoin"), "variant side should broadcast")
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

  test("quality trend accounts every version and flags real regressions") {
    val rows = operators.Analysis.qualityTrend(spark, sfDir).collect()
    val nEvents = graft.Tables.events(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_versions")).sum == nEvents,
      "every registration event is a version of exactly one subject")
    rows.foreach { r =>
      val regs = r.getAs[Long]("n_regressions")
      assert(regs < r.getAs[Long]("n_versions"), "v1 can never regress")
      if (regs > 0)
        assert(r.getAs[Int]("worst_delta") < 0,
          "a regression means some delta went negative")
      val last = r.getAs[Int]("last_score")
      assert(last >= 0 && last <= 100)
    }
    // the event-class evolution component guarantees both directions occur
    assert(rows.exists(_.getAs[Long]("n_regressions") > 0))
    assert(rows.exists(r => r.getAs[Long]("n_regressions") < r.getAs[Long]("n_versions") - 1))
  }
}
