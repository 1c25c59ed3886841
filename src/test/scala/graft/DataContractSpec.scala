package graft

import org.apache.spark.sql.functions._

/** Pins the generated-data properties the operators and their DuckDB
  * oracles are load-bearing on. If the test data is ever regenerated
  * differently, these fail with a named assumption instead of
  * surfacing as mysterious parity mismatches:
  *  - ids non-negative (Spark % and DuckDB % agree only then),
  *  - props parse as JSON with a numeric k (oracles TRY_CAST, Spark
  *    null-casts — but the field model derives from k),
  *  - part names stay short (fuzzy-candidate length-bucket window is
  *    derived from the observed max),
  *  - no empty documents (frame/window generators are guarded, but
  *    zero-length payloads would change mm_* row counts),
  *  - event values non-negative (log2 histogram bucket = bit length).
  */
class DataContractSpec extends SparkSpec {

  test("ids and keys are non-negative") {
    assert(Tables.events(spark, sfDir)
      .filter(col("user_id") < 0 || col("event_id") < 0).count() == 0)
    assert(Tables.documents(spark, sfDir).filter(col("doc_id") < 0).count() == 0)
    assert(Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 0 || col("label") < 0).count() == 0)
  }

  test("event props carry a numeric k") {
    assert(Tables.events(spark, sfDir)
      .filter(get_json_object(col("props"), "$.k").cast("bigint").isNull)
      .count() == 0)
  }

  test("part names stay within the fuzzy-blocking length assumption") {
    val maxLen = Tables.part(spark, sfDir)
      .agg(max(length(col("p_name")))).head().getInt(0)
    assert(maxLen <= 24, s"p_name max length $maxLen grew; re-derive fuzzy bucket window")
  }

  test("documents are non-empty and n_chars is consistent") {
    assert(Tables.documents(spark, sfDir)
      .filter(length(col("text")) === 0 || col("n_chars") =!= length(col("text")))
      .count() == 0)
  }

  test("event values are non-negative (histogram bit-length bucketing)") {
    assert(Tables.events(spark, sfDir).filter(col("value") < 0).count() == 0)
  }
}
