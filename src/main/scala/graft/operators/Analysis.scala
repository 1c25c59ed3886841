package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-analysis capabilities (reference internal/analysis/):
  * fuzzy matching, name normalization, field extraction from JSON
  * payloads, and multi-category quality scoring.
  *
  * Scale notes: all four are single-pass narrow scans (no join, no
  * shuffle except the final order): fuzzy scoring is a codegen'd
  * levenshtein over a pruned 2-column projection; quality scoring is
  * a CASE/higher-order-function pipeline that never leaves the row.
  */
object Analysis {

  /** FuzzyScore (analysis/fuzzy.go:41): 1 - lev(q,t)/max(len) on
    * lowercased strings, thresholded like MatchFuzzy (fuzzy.go:121).
    */
  def fuzzyMatch(s: SparkSession, dir: String): DataFrame = {
    val query = lit("small widget")
    Tables.spread(Tables.part(s, dir))
      .select(col("p_partkey"), col("p_name"))
      .withColumn("score",
        round(lit(1.0) - levenshtein(lower(query), lower(col("p_name"))).cast("double") /
          greatest(length(query), length(col("p_name"))), 4))
      .filter(col("score") >= 0.5)
      .orderBy(col("score").desc, col("p_partkey"))
  }

  /** NormalizeFieldName (analysis/fields.go:245): any-case →
    * snake_case. camelCase boundaries get an underscore, then
    * [-. ] → _ and lowercase — same order as the reference walk.
    */
  def nameNormalize(s: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.part(s, dir))
      .select(col("p_partkey"), col("p_name"),
        lower(regexp_replace(
          regexp_replace(col("p_name"), "([a-z0-9])([A-Z])", "$1_$2"),
          "[-. ]", "_")).as("norm_name"))
      .orderBy(col("p_partkey"))

  /** ExtractFields (analysis/fields.go:28) over JSON payloads:
    * pull `$.k` out of the props document and aggregate per type —
    * the JSON path never leaves the scan projection.
    */
  def fieldExtract(s: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.events(s, dir))
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))
      .groupBy(col("event_type"))
      .agg(round(avg(col("k")), 4).as("avg_k"),
        max(col("k")).as("max_k"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** ScoreSchemaQuality (analysis/quality.go:25): four 25-point
    * categories + A–F grade, re-expressed over document tokens.
    * Category shapes mirror the reference: fraction-of-good-items
    * with integer floor division (naming quality.go:42, type safety
    * quality.go:80), content-presence bonuses 10+8+7 (evolution
    * quality.go:88-113), percentage grading (quality.go:123).
    */
  def qualityScore(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val nToks = size(toks)
    val good = size(filter(toks, t => t.rlike("^[a-z_]+$")))
    val specific = size(filter(toks, t => !t.isin("the", "a", "data", "value")))
    val naming = floor(lit(25) * good / nToks).cast("int")
    val typeSafety = floor(lit(25) * specific / nToks).cast("int")
    val docScore = when(col("text").contains("data"), 25).otherwise(0)
    val evo = (when(col("text").contains("key"), 10).otherwise(0) +
      when(col("text").contains("table"), 8).otherwise(0) +
      when(col("text").contains("value"), 7).otherwise(0))
    Tables.spread(Tables.documents(s, dir))
      .select(col("doc_id"),
        naming.as("naming_score"),
        docScore.as("doc_score"),
        typeSafety.as("type_score"),
        evo.as("evolution_score"))
      .withColumn("overall", col("naming_score") + col("doc_score") + col("type_score") + col("evolution_score"))
      .withColumn("grade",
        when(col("overall") >= 90, "A")
          .when(col("overall") >= 80, "B")
          .when(col("overall") >= 70, "C")
          .when(col("overall") >= 60, "D")
          .otherwise("F"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "an_fuzzy_match" -> fuzzyMatch,
    "an_name_normalize" -> nameNormalize,
    "an_field_extract" -> fieldExtract,
    "an_quality_score" -> qualityScore)

  val oracleSql: Map[String, String] = Map(
    "an_fuzzy_match" ->
      """SELECT p_partkey, p_name,
        |  round(1.0 - levenshtein(lower('small widget'), lower(p_name)) /
        |    greatest(length('small widget'), length(p_name)), 4) AS score
        |FROM part
        |WHERE 1.0 - levenshtein(lower('small widget'), lower(p_name)) /
        |    greatest(length('small widget'), length(p_name)) >= 0.5
        |ORDER BY score DESC, p_partkey""".stripMargin,
    "an_name_normalize" ->
      """SELECT p_partkey, p_name,
        |  lower(regexp_replace(regexp_replace(p_name, '([a-z0-9])([A-Z])', '\1_\2', 'g'), '[-. ]', '_', 'g')) AS norm_name
        |FROM part ORDER BY p_partkey""".stripMargin,
    "an_field_extract" ->
      """SELECT event_type,
        |  round(avg(k), 4) AS avg_k, max(k) AS max_k, count(*) AS n
        |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events) t
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "an_quality_score" ->
      """WITH scored AS (
        |  SELECT doc_id,
        |    CAST(floor(25.0 * len(list_filter(string_split(text, ' '), t -> regexp_full_match(t, '[a-z_]+'))) / len(string_split(text, ' '))) AS INT) AS naming_score,
        |    CASE WHEN contains(text, 'data') THEN 25 ELSE 0 END AS doc_score,
        |    CAST(floor(25.0 * len(list_filter(string_split(text, ' '), t -> t NOT IN ('the','a','data','value'))) / len(string_split(text, ' '))) AS INT) AS type_score,
        |    (CASE WHEN contains(text, 'key') THEN 10 ELSE 0 END +
        |     CASE WHEN contains(text, 'table') THEN 8 ELSE 0 END +
        |     CASE WHEN contains(text, 'value') THEN 7 ELSE 0 END) AS evolution_score
        |  FROM documents)
        |SELECT doc_id, naming_score, doc_score, type_score, evolution_score,
        |  naming_score + doc_score + type_score + evolution_score AS overall,
        |  CASE WHEN naming_score + doc_score + type_score + evolution_score >= 90 THEN 'A'
        |       WHEN naming_score + doc_score + type_score + evolution_score >= 80 THEN 'B'
        |       WHEN naming_score + doc_score + type_score + evolution_score >= 70 THEN 'C'
        |       WHEN naming_score + doc_score + type_score + evolution_score >= 60 THEN 'D'
        |       ELSE 'F' END AS grade
        |FROM scored ORDER BY doc_id""".stripMargin)
}
