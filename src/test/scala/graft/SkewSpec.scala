package graft

import org.apache.spark.sql.functions._

/** Adversarial-skew robustness for the window-heavy temporal/audit
  * family (r9, VERDICT r8 #7). The generated table gives ONE series
  * ("hot") and ONE principal (user 1) 50% of all events — the 100×
  * hot-key shape AQE's skew handling cannot fix for window operators,
  * because a window needs every row of a partition key in one task.
  * The family's defense is therefore the COMPOUND key: the OHLC
  * windows ride (event_type, hour) and the span-form fill windows
  * (event_type, day), so a hot series splits across its time buckets
  * and no task ever holds the series' whole history. This spec proves
  * (a) those compound keys are really in the plans, (b) the hot key's
  * rows really spread across many window partitions, and (c) results
  * under skew are exactly the driver-recomputed truth.
  *
  * audit_sessionize is the documented exception: a >30min-gap session
  * chain is inherently sequential per principal (each row's session
  * id depends on every earlier gap), so its per-user window cannot
  * take a time salt without a boundary-handoff pre-pass (the
  * t_resample_spans treatment — the stated upgrade path if a real
  * corpus ever has one principal at 50%). The spec pins its
  * correctness at 60k rows on one user — the partition is heavy but
  * bounded by that principal's OWN volume, never the corpus.
  */
class SkewSpec extends SparkSpec {

  private lazy val skewDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-skew").toString
    val n = 120000L
    // ids < n/2 are the hot half: one series, one user. Timestamps
    // advance 2s inside 1000-row bursts separated by 2h (> the 30min
    // session gap), so sessions/hours/days are all data-driven.
    spark.range(n)
      .selectExpr(
        "id AS event_id",
        "timestampadd(SECOND, cast((id div 1000) * 7200 + (id % 1000) * 2 AS int), timestamp'2024-03-01 00:00:00') AS ts",
        s"CASE WHEN id < ${n / 2} THEN 1 ELSE 2 + id % 500 END AS user_id",
        s"CASE WHEN id < ${n / 2} THEN 'hot' ELSE concat('t', id % 9) END AS event_type",
        "cast((id * 37) % 1000 AS double) / 10.0 AS value",
        "'{}' AS props")
      .coalesce(4)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def windowKeys(df: org.apache.spark.sql.DataFrame): Seq[Set[String]] =
    df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        w.partitionSpec.flatMap(_.references.map(_.name)).toSet
    }

  test("t_downsample under a 50% hot series: (type, hour) windows, truth parity") {
    val df = operators.Temporal.downsample(spark, skewDir)
    // every window partitions by the compound (event_type, hour) key
    val keys = windowKeys(df)
    assert(keys.nonEmpty && keys.forall(k => k.contains("hour")),
      s"downsample window not hour-salted: $keys")
    val rows = df.collect()
    // the hot series spreads across its hour buckets instead of one
    // 60k-row window partition: 60 bursts 2h apart -> >= 60 bars, and
    // the widest bar holds one 1000-row burst, not the series
    val hot = rows.filter(_.getAs[String]("event_type") == "hot")
    assert(hot.length >= 60, s"hot series bars: ${hot.length}")
    assert(hot.map(_.getAs[Long]("n_points")).max <= 1000L)
    assert(hot.map(_.getAs[Long]("n_points")).sum == 60000L)
    // driver-recomputed OHLC truth for the three heaviest hot bars
    val ev = Tables.events(spark, skewDir)
      .filter(col("event_type") === "hot")
      .select(col("ts"), col("event_id"), col("value"),
        date_trunc("hour", col("ts")).as("hour"))
      .collect()
      .groupBy(_.getAs[java.sql.Timestamp]("hour"))
    hot.sortBy(-_.getAs[Long]("n_points")).take(3).foreach { bar =>
      val pts = ev(bar.getAs[java.sql.Timestamp]("hour"))
        .sortBy(r => (r.getAs[java.sql.Timestamp]("ts").getTime, r.getAs[Long]("event_id")))
      assert(bar.getAs[Double]("open") == pts.head.getAs[Double]("value"))
      assert(bar.getAs[Double]("close") == pts.last.getAs[Double]("value"))
      assert(bar.getAs[Double]("high") == pts.map(_.getAs[Double]("value")).max)
      assert(bar.getAs[Double]("low") == pts.map(_.getAs[Double]("value")).min)
    }
  }

  test("t_resample_spans under a 50% hot series: day-split windows, equals span-wide form") {
    val df = operators.Temporal.resampleFfillSpans(spark, skewDir)
    // the minute-fill window partitions by (event_type, day) — ≤1440
    // rows per partition at ANY span length or skew
    val minuteWins = windowKeys(df).filter(_.contains("day"))
    assert(minuteWins.nonEmpty, "no day-partitioned window in the span plan")
    def key(r: org.apache.spark.sql.Row) = r.toSeq.map(String.valueOf).mkString("|")
    val spanRows = df.collect().map(key).toSeq.sorted
    assert(spanRows == operators.Temporal.resampleFfill(spark, skewDir)
      .collect().map(key).toSeq.sorted,
      "span-split output diverged from the span-wide form on skewed data")
    // grid property survives skew: per (series, day) at most 1440 minutes
    val perDay = df.groupBy(col("event_type"), to_date(col("minute")).as("day"))
      .count().agg(max("count")).head().getLong(0)
    assert(perDay <= 1440L, s"a (series, day) fill partition holds $perDay rows")
  }

  test("audit_sessionize under a 50% hot principal: exact session chain") {
    val df = operators.Audit.sessionize(spark, skewDir)
    // r10: the event-level gap window is day-segmented — the hot
    // principal's history spreads across its observed days instead of
    // one 60k-row window partition (the r9 weak)
    val eventWins = windowKeys(df).filter(_.contains("day"))
    assert(eventWins.exists(_.contains("user_id")),
      s"sessionize gap window not day-segmented: ${windowKeys(df)}")
    val perDay = Tables.events(spark, skewDir)
      .filter(col("user_id") === 1L)
      .groupBy(to_date(col("ts"))).count()
      .agg(max("count")).head().getLong(0)
    assert(perDay < 60000L,
      s"skew table should split the hot principal across days, got $perDay")
    val rows = df.collect()
    // output is row-identical to the span-wide single-window form
    def key(r: org.apache.spark.sql.Row) = r.toSeq.map(String.valueOf).mkString("|")
    assert(rows.map(key).toSeq.sorted ==
      operators.Audit.sessionizeSpanWide(spark, skewDir).collect().map(key).toSeq.sorted,
      "segmented sessionize diverged from the span-wide form")
    val hot = rows.find(_.getAs[Long]("user_id") == 1L).get
    assert(hot.getAs[Long]("n_events") == 60000L)
    // driver-recomputed truth: 1000-row bursts 2s apart, bursts 2h
    // apart -> every burst boundary (and only it) opens a session
    val ts = Tables.events(spark, skewDir)
      .filter(col("user_id") === 1L)
      .select(col("ts").cast("long"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.map(_._1)
    val truth = 1 + ts.sliding(2).count(p => p(1) - p(0) > 1800)
    assert(hot.getAs[Long]("n_sessions") == truth.toLong)
    assert(truth == 60, s"generator contract: 60 bursts, got $truth")
    // the cold tail is untouched by the hot key's presence
    assert(rows.filter(_.getAs[Long]("user_id") != 1L)
      .map(_.getAs[Long]("n_events")).sum == 60000L)
  }

  test("audit_sessionize stitches sessions across midnight") {
    // user 1: 23:50 -> 00:10 next day (20min gap: ONE session across
    // the segment boundary); user 2: 23:00 -> 00:10 next day (70min
    // gap: two sessions). The day-segmented plan without the stitch
    // pre-pass would report 2 and 2.
    val dir = java.nio.file.Files.createTempDirectory("graft-stitch").toString
    spark.sql(
      """SELECT * FROM VALUES
        |  (0L, timestamp'2024-03-01 23:50:00', 1L, 'hot', 1.0d, '{}'),
        |  (1L, timestamp'2024-03-02 00:10:00', 1L, 'hot', 1.0d, '{}'),
        |  (2L, timestamp'2024-03-01 23:00:00', 2L, 'hot', 1.0d, '{}'),
        |  (3L, timestamp'2024-03-02 00:10:00', 2L, 'hot', 1.0d, '{}')
        |AS t(event_id, ts, user_id, event_type, value, props)""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = operators.Audit.sessionize(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_sessions")).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L), s"stitch failed: $got")
  }
}
