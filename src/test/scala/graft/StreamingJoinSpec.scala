package graft

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Stream-stream join and foreachBatch sink patterns — the remaining
  * Structured Streaming surface a pipeline needs.
  */
class StreamingJoinSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("watermarked stream-stream inner join correlates clicks with purchases") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp)]
    val cdf = clicks.toDF().toDF("user_id", "click_ts").withWatermark("click_ts", "30 minutes")
    val bdf = buys.toDF().toDF("buy_user", "buy_ts").withWatermark("buy_ts", "30 minutes")
    val joined = cdf.join(bdf,
      col("user_id") === col("buy_user") &&
        col("buy_ts") >= col("click_ts") &&
        col("buy_ts") <= col("click_ts") + expr("INTERVAL 20 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      clicks.addData((1L, ts(0)), (2L, ts(5)))
      buys.addData((1L, ts(10)), (2L, ts(40))) // user2 buys too late to attribute
      q.processAllAvailable()
      val rows = spark.table("attrib").collect()
      assert(rows.map(_.getAs[Long]("user_id")).toSeq == Seq(1L))
    } finally q.stop()
  }

  test("foreachBatch sink writes idempotent parquet batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val stream = MemoryStream[(Long, Timestamp, String, Double)]
    val df = stream.toDF().toDF("event_id", "ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
    val q = EventStream.windowedCounts(df)
      .writeStream
      .outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$out/latest")
      }
      .start()
    try {
      stream.addData((1L, ts(5), "click", 1.0), (2L, ts(65), "view", 2.0))
      q.processAllAvailable()
      stream.addData((3L, ts(70), "view", 3.0))
      q.processAllAvailable()
      val sunk = spark.read.parquet(s"$out/latest")
      assert(sunk.agg(sum("n_events")).head().getLong(0) == 3)
    } finally q.stop()
  }
}
