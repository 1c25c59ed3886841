package graft

import org.apache.spark.sql.functions._

/** Partitioned parquet sink + partition pruning — the storage-layout
  * half of the 100 TB story: daily-partitioned outputs let every
  * downstream date-ranged query skip irrelevant files entirely.
  */
class PartitionedSinkSpec extends SparkSpec {

  test("date-partitioned sink prunes partitions for day-filtered reads") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables.events(spark, sfDir)
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(out)

    val days = spark.read.parquet(out).select("day").distinct().count()
    assert(days > 1, "need multiple partitions for a meaningful test")

    val oneDay = spark.read.parquet(out)
      .filter(col("day") === lit("2024-01-02").cast("date"))
    val plan = oneDay.queryExecution.executedPlan.toString
    // the day filter must reach the file index, not the row scan
    assert(plan.contains("PartitionFilters: [isnotnull(day"),
      s"expected partition filters in:\n${plan.take(800)}")

    // pruned read returns exactly the day's rows
    val expected = Tables.events(spark, sfDir)
      .filter(to_date(col("ts")) === lit("2024-01-02").cast("date")).count()
    assert(oneDay.count() == expected)
  }

  test("round trip preserves values through the partitioned layout") {
    val out = java.nio.file.Files.createTempDirectory("graft-part2").toString
    val src = Tables.events(spark, sfDir)
      .withColumn("day", to_date(col("ts")))
    src.write.mode("overwrite").partitionBy("day").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() == src.count())
    val a = src.agg(sum("value")).head().getDouble(0)
    val b = back.agg(sum("value")).head().getDouble(0)
    assert(math.abs(a - b) < 1e-6)
  }
}
