package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bridge into Spark's `private[sql] Dataset.ofRows` so library code
  * can materialize a DataFrame from a custom LogicalPlan — the
  * standard technique of Spark-native extension libraries (compare
  * the public Pathling/Sedona strategy-injection shims). Lives under
  * org.apache.spark.sql solely for access scope; everything else in
  * this library stays in the graft namespace.
  */
object GraftShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  /** Drain the async listener bus (`private[spark]` access), so a
    * task-metrics listener has observed every task of the job that
    * just returned — Bench snapshots summed executorRunTime/CpuTime
    * around each query and listener events are delivered
    * asynchronously.
    */
  def flushListeners(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Release the block-manager storage behind a `localCheckpoint`'d
    * frame. `Dataset.unpersist` only talks to the CacheManager, so a
    * checkpoint's MEMORY_AND_DISK blocks otherwise live until the
    * ContextCleaner happens to GC the underlying RDD — in a
    * driver-paced fixpoint loop that means every superseded round's
    * blocks pile up for the whole loop (measured: the sf10 closure
    * family OOMs an 8 GiB heap on exactly this). Callers free a
    * round's frame only once the NEXT round is materialized and the
    * old one is provably never read again — a freed localCheckpoint
    * cannot be recomputed (its lineage is truncated by design).
    */
  def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
