package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as primitives, built with the
  * scalable compositions rather than brute force:
  *
  *  - AS-OF join via the union + sorted-window technique: both sides
  *    merge into one stream sorted by (key, ts), and a last_value
  *    window carries the most recent build-side row forward. One
  *    shuffle on the key, zero row explosion — the classic
  *    kdb/Flink-style merge as a Catalyst window.
  *  - Range join via time bucketing: probe rows join candidate
  *    buckets (bucket and bucket-1) instead of an inequality-only
  *    condition that would plan as a broadcast nested loop.
  */
object Temporal {

  /** AS-OF join: for every `purchase` event, the most recent prior
    * (or same-instant) `signup` event of the same user. The union
    * stream tags sides, the window carries the last signup forward.
    */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("is_probe"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("is_probe"))
    // signups sort before purchases at the same ts (is_probe asc) so
    // a same-instant signup is visible to the probe
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_probe"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionByName(signups)
      .withColumn("last_signup_ts",
        last(when(col("is_probe") === 0, col("ts")), ignoreNulls = true).over(w))
      .withColumn("last_signup_id",
        last(when(col("is_probe") === 0, col("event_id")), ignoreNulls = true).over(w))
      .filter(col("is_probe") === 1)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("last_signup_ts"), col("last_signup_id"))
      .orderBy(col("purchase_id"))
  }

  /** Range join: (click, purchase) pairs of the same user where the
    * purchase lands within 10 minutes after the click. Probe and
    * build join on (user, bucket) for the purchase's bucket and its
    * predecessor — a pure hash join whose per-task pair space is one
    * user-bucket, then the exact range filter.
    */
  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val winSec = 600L
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"),
        (col("ts").cast("long") / winSec).cast("long").as("bucket"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("buy_id"), col("ts").as("buy_ts"))
      .withColumn("b0", (col("buy_ts").cast("long") / winSec).cast("long"))
    val candidates = buys
      .withColumn("bucket", explode(array(col("b0") - 1, col("b0"))))
      .join(clicks, Seq("user_id", "bucket"))
    candidates
      .filter(col("buy_ts") >= col("click_ts") &&
        col("buy_ts").cast("long") - col("click_ts").cast("long") <= winSec)
      .select(col("user_id"), col("click_id"), col("buy_id"),
        (col("buy_ts").cast("long") - col("click_ts").cast("long")).as("delta_s"))
      .orderBy(col("user_id"), col("click_id"), col("buy_id"))
  }

  /** The same AS-OF semantics as [[asofJoin]], planned through the
    * custom Catalyst operator ([[graft.plans.AsOfJoin]] logical node
    * → AsOfJoinStrategy → AsOfJoinExec physical merge) registered
    * via SparkSessionExtensions / extraStrategies. One shuffle per
    * side (SortMergeJoin's distribution contract), O(1) merge state
    * per task — no union, no window buffering. Shares t_asof_join's
    * oracle: both plans must produce identical rows.
    */
  def asofCustom(s: SparkSession, dir: String): DataFrame = {
    import graft.plans.{AsOfJoin, AsOfJoinStrategy}
    AsOfJoinStrategy.ensureRegistered(s)
    val ev = Tables.events(s, dir)
    val probes = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"))
    val builds = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"),
        col("event_id").as("s_id"))
    val (lPlan, rPlan) = (probes.queryExecution.analyzed, builds.queryExecution.analyzed)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).get
    org.apache.spark.sql.graftshim.GraftShim.ofRows(s,
      AsOfJoin(lPlan, rPlan,
        attr(lPlan, "p_user"), attr(rPlan, "s_user"),
        attr(lPlan, "p_ts"), attr(rPlan, "s_ts"),
        Seq(attr(rPlan, "s_id"))))
      .select(col("p_id").as("purchase_id"), col("p_user").as("user_id"),
        col("p_ts").as("purchase_ts"), col("s_ts").as("last_signup_ts"),
        col("s_id").as("last_signup_id"))
      .orderBy(col("purchase_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_asof_join" -> asofJoin,
    "t_asof_custom" -> asofCustom,
    "t_range_join" -> rangeJoin)

  val oracleSql: Map[String, String] = Map(
    "t_asof_custom" ->
      """WITH u AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_probe
        |  FROM events WHERE event_type IN ('purchase', 'signup')),
        |w AS (
        |  SELECT *,
        |    last_value(CASE WHEN is_probe = 0 THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, is_probe, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_ts,
        |    last_value(CASE WHEN is_probe = 0 THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, is_probe, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_id
        |  FROM u)
        |SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, last_signup_ts, last_signup_id
        |FROM w WHERE is_probe = 1 ORDER BY purchase_id""".stripMargin,
    "t_asof_join" ->
      """WITH u AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_probe
        |  FROM events WHERE event_type IN ('purchase', 'signup')),
        |w AS (
        |  SELECT *,
        |    last_value(CASE WHEN is_probe = 0 THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, is_probe, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_ts,
        |    last_value(CASE WHEN is_probe = 0 THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, is_probe, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_id
        |  FROM u)
        |SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, last_signup_ts, last_signup_id
        |FROM w WHERE is_probe = 1 ORDER BY purchase_id""".stripMargin,
    "t_range_join" ->
      """SELECT c.user_id, c.event_id AS click_id, b.event_id AS buy_id,
        |  date_diff('second', c.ts, b.ts) AS delta_s
        |FROM events c JOIN events b
        |  ON c.user_id = b.user_id AND c.event_type = 'click' AND b.event_type = 'purchase'
        | AND b.ts >= c.ts AND date_diff('second', c.ts, b.ts) <= 600
        |ORDER BY c.user_id, click_id, buy_id""".stripMargin)
}
