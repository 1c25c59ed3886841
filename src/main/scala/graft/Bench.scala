package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE compact JSON line on stdout (the driver
  * keeps only the last ~2000 chars of output, so the line must stay
  * small and must not be wrapped/prefixed by sbt's logger — see
  * build.sbt `run / outputStrategy := StdoutOutput`). Full-precision
  * cold+warm per-query detail is written to bench_detail.json.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    // Absorb session/codegen/parquet-footer warmup so the first
    // measured query isn't charged for it.
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    // Returns (seconds, post-execution plan string): with AQE the
    // final plan (real joins picked, codegen stages marked "*(n)")
    // only exists on the QueryExecution AFTER materialization.
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Either[String, (Double, String)] = {
      val t0 = System.nanoTime()
      // toRdd materializes every output column — count() would let
      // Catalyst prune expensive projections and under-report.
      try {
        val qe = fn(spark, sfDir).queryExecution
        qe.toRdd.count()
        val secs = (System.nanoTime() - t0) / 1e9
        Right((secs, qe.executedPlan.toString))
      } catch {
        case e: Throwable => Left(e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage).take(200))
      }
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // Each query runs three times; the reported number is the
      // MEDIAN. The first (cold) run pays one-off JIT/codegen cost
      // that amortizes to zero on a long-lived cluster, so the median
      // is normally a warm number — and unlike best-of-N it also
      // absorbs a transient GC/host stall hitting one warm run
      // without letting a single lucky run flatter the result
      // (round-over-round comparisons on this host exceeded the
      // assumed ±10% under best-of-two). Raw cold times stay in
      // bench_detail.json.
      val cold = run(fn)
      // Drop anything a run pinned with .cache() BEFORE the next
      // one: otherwise CacheManager swaps the warm plan for the
      // cold run's InMemoryRelation and the warm number measures a
      // cached-table read, not the plan.
      spark.catalog.clearCache()
      val warms = (1 to 2).map { _ =>
        val r = if (cold.isRight) run(fn) else cold
        spark.catalog.clearCache()
        r.map(_._1)
      }
      val coldT = cold.map(_._1)
      val median = for { c <- coldT; w1 <- warms(0); w2 <- warms(1) }
        yield Seq(c, w1, w2).sorted.apply(1)
      (name, coldT, median, cold.map(_._2).getOrElse(""))
    }
    // minimal-width rendering: 0.50 → "0.5", 1.00 → "1" (valid JSON,
    // saves ~1 char/query against the tail-window budget)
    def fmt(d: Double, dp: Int): String = {
      val bd = BigDecimal(d).setScale(dp, BigDecimal.RoundingMode.HALF_UP)
        .bigDecimal.stripTrailingZeros()
      if (bd.scale() < 0) bd.setScale(0).toPlainString else bd.toPlainString
    }
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"").replaceAll("[\\x00-\\x1f]", " ")
    def qmap(dp: Int, pick: ((String, Either[String, Double], Either[String, Double], String)) => Either[String, Double]): String =
      results.map { r => "\"" + r._1 + "\":" + pick(r).fold(_ => "-1", fmt(_, dp)) }
        .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Left(m), _) => "\"" + k + "\":\"" + esc(m) + "\"" }
      .mkString("{", ",", "}")
    // An errored query must not silently improve the headline total.
    val anyErr = results.exists(_._3.isLeft)
    val total = if (anyErr) -1.0 else results.map(_._3.getOrElse(0.0)).sum
    // errors only when non-empty: the compact line must stay inside
    // the driver's 2000-char tail window (see header comment).
    val errsPart = if (anyErr) s""","errors":$errs""" else ""
    // sf as a bare number (parsed from .../sfX.Y) instead of the dir
    // string: 22 chars of headroom for future per-query entries.
    val sfPart = "sf([0-9.]+)$".r.findFirstMatchIn(sfDir)
      .map(m => s""""sf":${m.group(1)}""").getOrElse(s""""sf":"$sfDir"""")
    def line(entries: Seq[String]): String =
      s"""{"metric":"total","value":${fmt(total, 3)},"unit":"sec","queries":${entries.mkString("{", ",", "}")}$errsPart,$sfPart}"""
    // The full per-query map no longer fits the ~1925 chars the tail
    // window leaves after sbt's trailing [success] line. Headline
    // policy: slowest-first at 2dp, as many as fit, the remainder
    // rolled into one "other" entry — the slow queries carry the
    // information; the complete 6dp map is in bench_detail.json.
    // errored queries sort LAST (they're already reported in the errors
    // map) so real slow queries keep the headline slots
    val byTimeDesc = results.sortBy(r => -r._3.getOrElse(0.0))
      .map(r => ("\"" + r._1 + "\":" + r._3.fold(_ => "-1", fmt(_, 2)), r._3.getOrElse(0.0)))
    val budget = 1880
    val keep = byTimeDesc.scanLeft(0)(_ + _._1.length + 1).tail
      .lastIndexWhere(_ <= budget - line(Nil).length) + 1
    val entries =
      if (keep >= byTimeDesc.length) byTimeDesc.map(_._1)
      else byTimeDesc.take(keep).map(_._1) :+
        ("\"other\":" + fmt(byTimeDesc.drop(keep).map(_._2).sum, 2))
    val compact = line(entries)
    // Static plan-shape metrics per query (shuffle exchanges,
    // broadcast exchanges, whole-stage-codegen spans): the evidence
    // behind SURVEY §4's claims, recorded next to the timings so a
    // regression in plan shape is visible without re-deriving plans.
    val planMetrics = results.map { case (name, _, _, pRaw) =>
      // post-execution AdaptiveSparkPlan prints "== Current Plan ==" +
      // "== Initial Plan ==" — count only the current (final) section
      val p = pRaw.split("== Initial Plan ==").head
      val m = if (p.isEmpty) "null" else {
        val sh = "[+:]- Exchange ".r.findAllIn(p).size
        val bc = "[+:]- BroadcastExchange ".r.findAllIn(p).size
        // simple-string plans mark codegen stages as "*(n) Operator"
        val ws = "\\*\\(\\d+\\)".r.findAllIn(p).toSet.size
        s"""{"sh":$sh,"bc":$bc,"ws":$ws}"""
      }
      "\"" + name + "\":" + m
    }.mkString("{", ",", "}")
    // Methodology note only — round-specific root-cause narratives
    // belong in SURVEY.md/VERDICT.md, not in every future run's
    // artifact (an r4 regression story was baked here and re-emitted
    // verbatim by each subsequent bench).
    val notes = "value = median of three runs per query (cold JIT/codegen " +
      "amortizes to zero on a long-lived cluster; the median also absorbs " +
      "one transient GC/host stall without letting a lucky run flatter " +
      "the number). Raw cold times in 'cold', plan-shape metrics " +
      "(shuffles/broadcasts/codegen spans) in 'plans'."
    val detail =
      s"""{"metric":"total","value":${fmt(total, 6)},"unit":"sec","queries":${qmap(6, _._3)},"cold":${qmap(6, _._2)},"plans":$planMetrics,"errors":$errs,"notes":"${esc(notes)}","sf":"$sfDir","cpus":$cpus}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_detail.json"),
      (detail + "\n").getBytes("UTF-8"))
    spark.stop()
    // Printed after spark.stop() so no shutdown log lines can land
    // between the JSON and the end of output.
    println(compact)
  }
}
