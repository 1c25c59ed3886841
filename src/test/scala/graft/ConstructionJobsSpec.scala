package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Construction must be plan-building, not execution (r11, VERDICT
  * r10 #7): constructing a registered DataFrame — what `Explain`, a
  * gated consumer, or a dry-run driver does — must launch ZERO Spark
  * jobs, so plan inspection never triggers cluster work. The
  * exceptions are the driver-paced ITERATIVE operators, whose result
  * plan is definitionally data-dependent (fixpoint closures,
  * connected-components rounds, power iteration, k-means, BPE merge
  * rounds): those run their loop at construction and are allow-listed
  * here BY NAME so any new operator that accidentally grows an eager
  * probe/checkpoint fails this spec loudly.
  */
class ConstructionJobsSpec extends SparkSpec {

  /** Operators whose construction legitimately runs jobs: every one is
    * a driver-paced loop (or composes one), where the NUMBER of plan
    * stages is decided by the data. Everything else must be lazy.
    */
  private val iterative = Set(
    // registry graph fixpoints (pointer-doubling / closure loops)
    "reg_refs_closure", "reg_dep_depth", "reg_gc_candidates",
    "reg_ref_cycles", "reg_pagerank", "reg_change_advice",
    // connected-components loops and their consumers
    "dedup_clusters", "dedup_cluster_stats", "dedup_survivors",
    "dedup_semantic_clusters", "dedup_semantic_rate", "corpus_funnel",
    // iterative ANN / embedding loops
    "ann_nn_descent", "ann_graph_recall", "ann_nn_graph",
    "emb_centroids", "emb_assign", "emb_pca_power",
    // BPE merge rounds are sequential by definition
    "tok_merge_apply"
  )

  test("constructing every registered query launches zero jobs (iterative ops excepted)") {
    // Warm the per-path schema cache: the FIRST load of a parquet path
    // legitimately runs one footer-inference job; after that, loads
    // pass the cached schema and construction must be job-free.
    Seq[(org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame](
      Tables.region, Tables.nation, Tables.customer, Tables.supplier,
      Tables.part, Tables.orders, Tables.lineitem, Tables.events,
      Tables.documents, Tables.embeddings
    ).foreach(t => t(spark, sfDir))

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) if !iterative(name) =>
          // drain listener bus so a previous construction's events
          // don't get charged to this one
          org.apache.spark.sql.graftshim.GraftShim.flushListeners(spark)
          jobs.set(0)
          fn(spark, sfDir) // construct only — no action
          org.apache.spark.sql.graftshim.GraftShim.flushListeners(spark)
          val n = jobs.get()
          if (n > 0) Some(s"$name ran $n construction job(s)") else None
        case _ => None
      }
      assert(offenders.isEmpty, offenders.mkString("\n"))
    } finally {
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("iterative allow-list stays tight: every listed op is registered") {
    val unknown = iterative -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"allow-listed but not registered: $unknown")
  }
}
