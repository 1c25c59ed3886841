package graft

/** Driver-contract invariants: every declared query must carry a
  * DuckDB oracle (the correctness gate hashes both), names must be
  * unique across operator groups, and the flagship entry must
  * produce rows at smoke scale.
  */
class ContractSpec extends SparkSpec {

  test("every query has an oracle and every oracle has a query") {
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet,
      s"asymmetric: ${SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)} / " +
        s"${SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)}")
  }

  test("no operator group shadows another group's query name") {
    val groups = Seq(
      operators.Analytics.queries, operators.Registry.queries,
      operators.Audit.queries, operators.Analysis.queries,
      operators.Compat.queries, operators.FormatCompat.queries,
      operators.Intelligence.queries,
      operators.Dedup.queries, operators.Pipeline.queries,
      operators.Similarity.queries, operators.TextAnalysis.queries,
      operators.Multimodal.queries, operators.Streaming.queries,
      operators.Temporal.queries)
    val allNames = groups.flatMap(_.keys)
    assert(allNames.size == allNames.distinct.size, "duplicate query names across groups")
    assert(allNames.toSet == SparkEntry.queries.keySet, "SparkEntry missing a group")
  }

  test("entry flagship returns rows at smoke scale") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs and returns a non-degenerate schema at smoke scale") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.schema.fields.nonEmpty, s"$name: empty schema")
      df.queryExecution.assertAnalyzed()
    }
  }
}
