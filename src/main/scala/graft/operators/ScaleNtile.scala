package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-size-adaptive equi-depth bucketing (r10, VERDICT r9 #2).
  *
  * `ntile(b)` over `Window.partitionBy(key)` sorts EVERY row of a key
  * in one task — for low-cardinality keys (5 languages, 25 nations)
  * that is a corpus-sized single-partition sort at 100 TB, the one
  * window shape AQE cannot split (a rank needs the whole partition).
  * The scale form replaces the rank with per-key quantile CUTPOINTS:
  * one `approx_percentile` rollup (mergeable sketch, map-side
  * combined, output rows = key cardinality), broadcast back, and a
  * row-local comparison assigns the bucket — no corpus-sized sort
  * anywhere, identical report schema.
  *
  * The two forms agree except at bucket BOUNDARIES: ntile splits ties
  * by the tiebreak column to make bucket sizes exact (±1), while a
  * value cutpoint sends all tied values to one side and the sketch
  * carries rank error ≤ rows/accuracy. Oracle parity at driver scale
  * therefore keeps the rank form: [[bucketed]] picks it while the
  * largest key group fits a single sort task (`graft.ntile
  * .maxPartition`, default 2M rows — a 1-2s in-memory sort) and
  * switches to cutpoints above, the same size-adaptive-branch idiom
  * as [[Dedup]]'s pair generators. NtileScalePathSpec pins the
  * cutpoint branch against the rank form.
  *
  * Construction is EAGER like the Dedup branches: deciding the branch
  * runs one count job over `decisionCounts` (a key-cardinality
  * aggregate of the slim key frame, NOT the scored input) at
  * DataFrame-construction time.
  */
object ScaleNtile {
  private[graft] val DefaultMaxPartition = 2000000L
  private[graft] val Accuracy = 10000

  private def maxPartition(df: DataFrame): Long =
    df.sparkSession.conf.get("graft.ntile.maxPartition",
      DefaultMaxPartition.toString).toLong

  /** Adds `bucket_id` (1..buckets, IntegerType) to `df`, equi-depth
    * per `partCol` over `orderCol` (descending when `desc`; ties
    * toward the lower bucket id in the rank branch via `tieCol`).
    * `decisionCounts` is the cheapest frame carrying one row per
    * input row with `partCol` (e.g. the raw table's key column) —
    * its max group size picks the branch.
    */
  def bucketed(df: DataFrame, partCol: String, orderCol: String,
               tieCol: String, buckets: Int, desc: Boolean,
               decisionCounts: DataFrame): DataFrame = {
    val biggest = decisionCounts.groupBy(col(partCol)).count()
      .agg(max(col("count"))).head().get(0) match {
      case n: java.lang.Long => n.longValue()
      case _                 => 0L // empty input: branch choice is moot
    }
    if (biggest <= maxPartition(df)) {
      val ord: Seq[Column] =
        Seq(if (desc) col(orderCol).desc else col(orderCol).asc, col(tieCol))
      val w = Window.partitionBy(col(partCol)).orderBy(ord: _*)
      df.withColumn("bucket_id", ntile(buckets).over(w))
    } else {
      val qs = (1 until buckets).map(i => s"${i}d / $buckets").mkString(", ")
      val cuts = df.groupBy(col(partCol))
        .agg(expr(s"approx_percentile($orderCol, array($qs), $Accuracy)").as("__cuts"))
      // desc: bucket 1 holds the TOP values — count cutpoints above v;
      // asc: bucket 1 holds the BOTTOM — count cutpoints below v. A
      // value equal to a cutpoint lands in the better (lower-id)
      // bucket in both directions, mirroring ntile's <=-rank boundary.
      val cmp = if (desc) "<" else ">"
      df.join(broadcast(cuts), partCol)
        .withColumn("bucket_id",
          expr(s"cast(1 + aggregate(__cuts, 0, (a, c) -> a + IF($orderCol $cmp c, 1, 0)) AS int)"))
        .drop("__cuts")
    }
  }
}
