package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Absorb session/codegen/parquet-footer warmup so the first
    // measured query isn't charged for it.
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Either[String, Double] = {
      val t0 = System.nanoTime()
      // toRdd materializes every output column — count() would let
      // Catalyst prune expensive projections and under-report.
      try {
        fn(spark, sfDir).queryExecution.toRdd.count()
        Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable => Left(e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage).take(200))
      }
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // Each query runs twice; the reported number is the second
      // (warm) run. The first run pays one-off JIT/codegen cost that
      // on a long-lived cluster amortizes to zero — reporting it
      // would grade JVM warmup, not the plan. Cold times are emitted
      // alongside for transparency.
      val cold = run(fn)
      val warm = if (cold.isRight) run(fn) else cold
      // drop caches an operator may have pinned so queries don't
      // contend for executor memory with one another
      spark.catalog.clearCache()
      (name, cold, warm)
    }
    def fmt(d: Double): String = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, _, w) => "\"" + k + "\":" + w.fold(_ => "-1", fmt) }
      .mkString("{", ",", "}")
    val colds = results.map { case (k, c, _) => "\"" + k + "\":" + c.fold(_ => "-1", fmt) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Left(m)) =>
      "\"" + k + "\":\"" + m.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }.mkString("{", ",", "}")
    val total = results.map(_._3.getOrElse(0.0)).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cold":$colds,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
