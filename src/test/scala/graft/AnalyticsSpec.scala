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

  test("q6 global revenue agg is one positive number consistent with a manual filter") {
    import org.apache.spark.sql.functions._
    val rev = Analytics.q6Revenue(spark, sfDir).head().getAs[Double]("revenue")
    assert(rev > 0)
    val manual = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01" &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice") * col("l_discount"))).head().getDouble(0)
    assert(math.abs(rev - manual) < 1e-3)
  }

  test("q13 distribution covers every customer exactly once") {
    val rows = Analytics.q13Custdist(spark, sfDir).collect()
    val total = rows.map(_.getAs[Long]("custdist")).sum
    assert(total == Tables.customer(spark, sfDir).count())
    val counts = rows.map(_.getAs[Long]("c_count"))
    assert(counts.distinct.length == counts.length, "distribution keys must be unique")
  }

  test("q19 disjunctive filter derives pushed per-side conjuncts") {
    val plan = Analytics.q19Disjunct(spark, sfDir)
      .queryExecution.executedPlan.toString
    // both scans must carry a pushed Or-filter (brand/size on part,
    // quantity ranges on lineitem) — not a single post-join Filter
    assert(plan.contains("PushedFilters: [IsNotNull(p_partkey), Or("), "part side not pushed")
    assert(plan.contains("PushedFilters: [IsNotNull(l_partkey), Or("), "lineitem side not pushed")
    assert(Analytics.q19Disjunct(spark, sfDir).head().getAs[Long]("n_lines") > 0)
  }

  test("q15 picks exactly the supplier(s) with the maximum quarterly revenue") {
    import org.apache.spark.sql.functions._
    val rows = Analytics.q15TopSupplier(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val top = rows.map(_.getAs[Double]("total_revenue")).distinct
    assert(top.length == 1, "all returned rows must share the max revenue")
    // no supplier in the quarter out-earns the reported max
    val better = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-04-01")
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("r"))
      .filter(col("r") > top.head + 0.001).count()
    assert(better == 0)
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
