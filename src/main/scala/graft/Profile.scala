package graft

import org.apache.spark.sql.SparkSession

/** Timing-loop utility for chasing bench regressions: runs each named
  * query N times back-to-back (same materialization as Bench —
  * `toRdd.count()` so no column pruning hides projection cost) and
  * prints every iteration's seconds. Usage:
  *   runMain graft.Profile <sfDir> <iters> <query> [query ...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val names = if (args.length > 2) args.drop(2).toSeq else Seq("q4_priority_count", "q5_region_revenue")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Small-shuffle parallelism: AQE's size-driven coalescing
      // otherwise folds MB-scale shuffles into ONE post-shuffle task
      // and serializes the whole mid-query on a 32-core box (measured
      // 5-10x on the window-heavy scans). At cluster scale these are
      // no-ops: partitions are far above the floor.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Paired-conf experiments: SPARK_GRAFT_CONF="k=v;k=v" overrides
    // runtime SQL confs after session build (e.g. to A/B the AQE
    // coalescing knobs that differ between bench generations).
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v) })
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    // SPARK_GRAFT_PROFILE_MODE=count reproduces the r2 bench
    // materialization (df.count(), lets Catalyst prune aggregates);
    // default is the r3 bench shape (toRdd.count(), full columns).
    val mode = sys.env.getOrElse("SPARK_GRAFT_PROFILE_MODE", "toRdd")
    names.foreach { n =>
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, sfDir)
        if (mode == "count") df.count() else df.queryExecution.toRdd.count()
        val s = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        s
      }
      println(f"PROFILE $n ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
