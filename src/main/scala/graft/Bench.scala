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

    // Summed executor task time per query (r9): wall medians on this
    // host swing ±30% between identical-code runs (BENCH_VARIANCE.md);
    // summed executorRunTime/CpuTime across a query's tasks is immune
    // to scheduler stalls and is the honest cross-round comparator.
    val taskRunMs = new java.util.concurrent.atomic.AtomicLong(0)
    val taskCpuNs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          taskRunMs.addAndGet(m.executorRunTime)
          taskCpuNs.addAndGet(m.executorCpuTime)
        }
      }
    })

    case class Run(wall: Double, plan: String, task: Double, cpu: Double)
    // Returns wall seconds, the post-execution plan string (with AQE
    // the final plan — real joins picked, codegen stages marked
    // "*(n)" — only exists on the QueryExecution AFTER
    // materialization), and the query's summed task run/cpu seconds.
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Either[String, Run] = {
      org.apache.spark.sql.graftshim.GraftShim.flushListeners(spark)
      val (r0, c0) = (taskRunMs.get(), taskCpuNs.get())
      val t0 = System.nanoTime()
      // toRdd materializes every output column — count() would let
      // Catalyst prune expensive projections and under-report.
      try {
        val qe = fn(spark, sfDir).queryExecution
        qe.toRdd.count()
        val secs = (System.nanoTime() - t0) / 1e9
        org.apache.spark.sql.graftshim.GraftShim.flushListeners(spark)
        Right(Run(secs, qe.executedPlan.toString,
          (taskRunMs.get() - r0) / 1e3, (taskCpuNs.get() - c0) / 1e9))
      } catch {
        case e: Throwable => Left(e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage).take(200))
      }
    }

    case class Res(name: String, cold: Either[String, Double],
                   median: Either[String, Double], plan: String,
                   task: Either[String, Double], cpu: Either[String, Double])
    def med3(a: Double, b: Double, c: Double): Double = Seq(a, b, c).sorted.apply(1)

    // Optional subset run (r9): SPARK_GRAFT_QUERIES=a,b,c benches only
    // the named queries — the sf10 scale-risk suite uses this; the
    // driver's full per-round run leaves it unset.
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // Evaluation-scale gate (r9, VERDICT r8 #2): the two
    // pairs-complete truth cards are quadratic BY DESIGN (exhaustive
    // ground truth for the sampled scale siblings). Above
    // Dedup.EvalScaleMaxDocs they are skipped with a note instead of
    // keeping a >8x-scaling tail alive in every at-scale suite; their
    // sampled siblings stay in.
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val evalOnly = Set("dedup_lsh_tuning", "dedup_minhash_recall")
    val gated: Set[String] =
      if (nDocs > operators.Dedup.EvalScaleMaxDocs) evalOnly else Set.empty
    val gateNote = s"pairs-complete evaluation card gated above " +
      s"${operators.Dedup.EvalScaleMaxDocs} docs (corpus has $nDocs); " +
      "the sampled scale sibling is the registered 100 TB form"

    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) && !gated(name) }
      .map { case (name, fn) =>
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
        r
      }
      def medOf(f: Run => Double): Either[String, Double] = for {
        c <- cold; w1 <- warms(0); w2 <- warms(1)
      } yield med3(f(c), f(w1), f(w2))
      Res(name, cold.map(_.wall), medOf(_.wall),
        cold.map(_.plan).getOrElse(""), medOf(_.task), medOf(_.cpu))
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
    def qmap(dp: Int, pick: Res => Either[String, Double]): String =
      results.map { r => "\"" + r.name + "\":" + pick(r).fold(_ => "-1", fmt(_, dp)) }
        .mkString("{", ",", "}")
    val errs = results.collect { case Res(k, _, Left(m), _, _, _) => "\"" + k + "\":\"" + esc(m) + "\"" }
      .mkString("{", ",", "}")
    // An errored query must not silently improve the headline total.
    val anyErr = results.exists(_.median.isLeft)
    val total = if (anyErr) -1.0 else results.map(_.median.getOrElse(0.0)).sum
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
    val byTimeDesc = results.sortBy(r => -r.median.getOrElse(0.0))
      .map(r => ("\"" + r.name + "\":" + r.median.fold(_ => "-1", fmt(_, 2)), r.median.getOrElse(0.0)))
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
    val planMetrics = results.map { r =>
      val name = r.name
      // post-execution AdaptiveSparkPlan prints "== Current Plan ==" +
      // "== Initial Plan ==" — count only the current (final) section
      val p = r.plan.split("== Initial Plan ==").head
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
      "(shuffles/broadcasts/codegen spans) in 'plans'. 'task'/'cpu' (r9) " +
      "are the median-of-three per-query summed executor task run/cpu " +
      "seconds across all tasks — scheduler-noise-free, the honest " +
      "cross-round and cross-scale comparator (plan_guard.py reads them). " +
      "Caveat: each task carries a ~0.2s runtime floor on this host, so " +
      "at KB/MB frame sizes task sums measure task count, not work — see " +
      "BENCH_VARIANCE.md (r9 calibration)."
    val skipped = gated.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
      .map(n => "\"" + n + "\":\"" + esc(gateNote) + "\"")
      .mkString("{", ",", "}")
    // Host-contention witness (r9): this box shares hardware with
    // co-tenants whose load is invisible to guest CPU/steal counters
    // but inflates real per-instruction cost 2-3x on CPU-saturating
    // queries (BENCH_VARIANCE.md). loadavg at run end is the one
    // guest-visible signal that correlates; recording it makes every
    // artifact carry its own "was the host quiet" context.
    val loadavg = scala.util.Try(
      scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ").take(3).mkString(",")
    ).getOrElse("")
    val detail =
      s"""{"metric":"total","value":${fmt(total, 6)},"unit":"sec","queries":${qmap(6, _.median)},"cold":${qmap(6, _.cold)},"task":${qmap(6, _.task)},"cpu":${qmap(6, _.cpu)},"plans":$planMetrics,"errors":$errs,"skipped":$skipped,"notes":"${esc(notes)}","sf":"$sfDir","cpus":$cpus,"loadavg":"$loadavg"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_detail.json"),
      (detail + "\n").getBytes("UTF-8"))
    spark.stop()
    // Printed after spark.stop() so no shutdown log lines can land
    // between the JSON and the end of output.
    println(compact)
  }
}
