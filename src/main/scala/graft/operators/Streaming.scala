package graft.operators

import graft.Tables
import graft.streaming.EventStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch face of the streaming operators: the exact transform from
  * [[graft.streaming.EventStream]] applied to the batch `events`
  * table — demonstrating the batch/stream unification that
  * Structured Streaming guarantees (same plan, incrementalized).
  * The streaming execution itself (MemoryStream source, watermark,
  * stateful sessions) is exercised in StreamingSpec.
  */
object Streaming {

  def windowCounts(s: SparkSession, dir: String): DataFrame =
    EventStream.windowedCounts(Tables.events(s, dir))
      .orderBy(col("hour"), col("event_type"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_window_counts" -> windowCounts)

  val oracleSql: Map[String, String] = Map(
    "stream_window_counts" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  count(*) AS n_events, round(sum(value), 4) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin)
}
