package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Registry metadata query semantics re-expressed over the test
  * tables: `events` plays the registry changelog (user_id ≈ subject
  * owner, event_type ≈ operation), `documents` play schema payloads
  * (content hashing / contexts), the TPC-H tables model config
  * hierarchies and reference graphs.
  *
  * Reference behaviors covered (cited file:line in each method):
  * subject listing, latest-version resolution, version numbering,
  * counts by type, config fallback (subject → global default),
  * content-hash lookup, referenced-by graphs, soft-delete filtering,
  * idempotent-register dedupe, context listing.
  *
  * Scale notes: every window partitions by a key (never global);
  * hash lookup groups on md5 so the shuffle key is uniform even when
  * payloads are skewed; fallback resolution is a broadcast join
  * against the (tiny) override dimension.
  */
object Registry {

  /** ListSubjects (reference internal/registry/registry.go:505):
    * sorted distinct listing.
    */
  def subjectList(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type").as("subject"))
      .distinct()
      .orderBy(col("subject"))

  /** GetLatestSchema (registry.go:495): latest row per key via a
    * partitioned row_number window — one pass, no self-join.
    */
  def latestVersion(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("latest_event_id"),
        col("ts").as("latest_ts"), col("event_type").as("latest_type"))
      .orderBy(col("user_id"))
  }

  /** GetVersions (registry.go:538): dense version numbering per
    * subject in registration order.
    */
  def versions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("version", row_number().over(w))
      .select(col("user_id"), col("event_id"), col("version"))
      .orderBy(col("user_id"), col("version"))
  }

  /** SchemaCountsByType (registry.go:521): groupBy counts over the
    * payload corpus, keyed by declared type (lang stands in).
    */
  def countsByType(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(col("lang").as("schema_type"))
      .agg(count(lit(1)).as("n_schemas"),
        sum(col("n_chars")).as("total_bytes"))
      .orderBy(col("schema_type"))

  /** GetMode / config fallback (registry.go:892): per-subject
    * override resolved against a global default via left join +
    * coalesce. The override dimension is derived deterministically
    * (every third nation pins FULL) and broadcast.
    */
  def configFallback(s: SparkSession, dir: String): DataFrame = {
    val overrides = Tables.nation(s, dir)
      .filter(col("n_nationkey") % 3 === 0)
      .select(col("n_nationkey").as("ov_nationkey"),
        lit("FULL").as("override_mode"))
    Tables.customer(s, dir)
      .join(broadcast(overrides), col("c_nationkey") === col("ov_nationkey"), "left")
      .select(col("c_custkey"),
        coalesce(col("override_mode"), lit("BACKWARD")).as("effective_mode"))
      .orderBy(col("c_custkey"))
  }

  /** LookupSchema by content (registry.go:553): canonical id per
    * content hash — md5 groupBy, min id wins (first registration).
    */
  def lookupByHash(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(md5(col("text")).as("content_hash"), col("doc_id"))
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("canonical_id"))

  /** GetReferencedBy (registry.go:1039): reverse reference counts —
    * orders referenced by their lineitems, heavily-referenced only.
    */
  def referencedBy(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(count(lit(1)).as("n_refs"))
      .filter(col("n_refs") >= 5)
      .orderBy(col("o_orderkey"))

  /** Soft-delete semantics (registry.go:591 DeleteSubject soft vs
    * permanent): per-group counts with and without "deleted" rows;
    * o_orderstatus 'F' plays the tombstone.
    */
  def softDelete(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("o_orderstatus") =!= "F", 1).otherwise(0)).as("n_active"))
      .orderBy(col("o_orderpriority"))

  /** RegisterSchema idempotency (registry.go:63 — re-registering an
    * identical payload returns the original record): first event per
    * (subject, operation), i.e. dedupe to the earliest registration.
    */
  def importDedupe(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id").as("first_event_id"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** ListContexts (registry.go:1141): sorted distinct namespaces. */
  def contexts(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source").as("context"))
      .distinct()
      .orderBy(col("context"))

  /** ValidateSchema (registry.go:1053): payload validity check —
    * each props document must parse as JSON and carry the required
    * key. Pure row-local projection; invalid rows are reported, not
    * dropped (the registry returns structured validation results).
    */
  def validatePayloads(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").isNotNull.as("is_valid"))
      .groupBy(col("is_valid"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("is_valid"))

  /** FormatSchema / export (registry.go:453, exporter.go): render
    * records to a canonical JSON changelog line — the exporter's
    * output format, produced engine-side.
    */
  def exportJson(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_id") < 100)
      .select(col("event_id"),
        concat(lit("{\"id\":"), col("event_id"),
          lit(",\"type\":\""), col("event_type"),
          lit("\",\"user\":"), col("user_id"), lit("}")).as("json_line"))
      .orderBy(col("event_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "reg_validate" -> validatePayloads,
    "reg_export_json" -> exportJson,
    "reg_subject_list" -> subjectList,
    "reg_latest_version" -> latestVersion,
    "reg_versions" -> versions,
    "reg_counts_by_type" -> countsByType,
    "reg_config_fallback" -> configFallback,
    "reg_lookup_by_hash" -> lookupByHash,
    "reg_referenced_by" -> referencedBy,
    "reg_soft_delete" -> softDelete,
    "reg_import_dedupe" -> importDedupe,
    "reg_contexts" -> contexts)

  val oracleSql: Map[String, String] = Map(
    "reg_validate" ->
      """SELECT json_extract_string(props, '$.k') IS NOT NULL AS is_valid, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY is_valid""".stripMargin,
    "reg_export_json" ->
      """SELECT event_id,
        |  '{"id":' || event_id || ',"type":"' || event_type || '","user":' || user_id || '}' AS json_line
        |FROM events WHERE event_id < 100 ORDER BY event_id""".stripMargin,
    "reg_subject_list" ->
      "SELECT DISTINCT event_type AS subject FROM events ORDER BY subject",
    "reg_latest_version" ->
      """SELECT user_id, event_id AS latest_event_id, ts AS latest_ts, event_type AS latest_type FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "reg_versions" ->
      """SELECT user_id, event_id, version FROM (
        |  SELECT user_id, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version
        |  FROM events) t
        |ORDER BY user_id, version""".stripMargin,
    "reg_counts_by_type" ->
      """SELECT lang AS schema_type, count(*) AS n_schemas, CAST(sum(n_chars) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY lang ORDER BY schema_type""".stripMargin,
    "reg_config_fallback" ->
      """SELECT c_custkey,
        |  coalesce(ov.override_mode, 'BACKWARD') AS effective_mode
        |FROM customer
        |LEFT JOIN (SELECT n_nationkey AS ov_nationkey, 'FULL' AS override_mode
        |           FROM nation WHERE n_nationkey % 3 = 0) ov
        |  ON c_nationkey = ov_nationkey
        |ORDER BY c_custkey""".stripMargin,
    "reg_lookup_by_hash" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS canonical_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY canonical_id""".stripMargin,
    "reg_referenced_by" ->
      """SELECT l_orderkey AS o_orderkey, count(*) AS n_refs
        |FROM lineitem GROUP BY l_orderkey HAVING count(*) >= 5
        |ORDER BY o_orderkey""".stripMargin,
    "reg_soft_delete" ->
      """SELECT o_orderpriority, count(*) AS n_total,
        |  CAST(sum(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_active
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "reg_import_dedupe" ->
      """SELECT user_id, event_type, event_id AS first_event_id FROM (
        |  SELECT user_id, event_type, event_id,
        |    row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "reg_contexts" ->
      "SELECT DISTINCT source AS context FROM documents ORDER BY context")
}
