package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated star schema.
  *
  * All operators read through these so that column pruning and filter
  * pushdown reach the parquet scan. Dimension tables (region, nation)
  * are small at every scale factor and are broadcast explicitly at the
  * join sites; fact tables (lineitem, orders, events, documents,
  * embeddings) scale with sf and are only ever shuffled on their join
  * or group keys.
  */
object Tables {
  def region(s: SparkSession, dir: String): DataFrame = load(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame = load(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame = load(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = load(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame = load(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame = load(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame = load(s, dir, "lineitem")
  /** `events.parquet` has stored `ts` as INT64 TIMESTAMP(NANOS)
    * (readable only via `spark.sql.legacy.parquet.nanosAsLong=true`,
    * as epoch-nanos longs) and, in newer drops, as TIMESTAMP(MICROS)
    * without a timezone (Spark 4 reads that as TIMESTAMP_NTZ, which
    * rejects the second-arithmetic casts the operators use).
    * Normalize both to a plain micros-precision TIMESTAMP here so
    * every operator sees one canonical column type — the session
    * timezone is pinned to UTC everywhere, so the NTZ→LTZ
    * reinterpretation is value-identical to DuckDB's TIMESTAMP.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = load(s, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame = load(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = load(s, dir, "embeddings")

  private def load(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Spread a table across tasks before an expression-heavy
    * projection. The driver's parquet files hold ONE row group, so a
    * scan is a single task no matter how wide the cluster — a cheap
    * round-robin repartition restores parallelism. On datasets with
    * many splits (any real 100 TB table) the input already
    * parallelizes and callers can drop this. Parallelism follows
    * `graft.spread.partitions` if set, else the session's shuffle
    * partition count — no magic constant on a cluster.
    */
  def spread(df: DataFrame): DataFrame = df.repartition(spreadWidth(df))

  /** Keyed variant of [[spread]]: hash-repartition on the given
    * columns with the same conf-driven parallelism — the co-location
    * shape pair-scoring joins need, without a hard-coded width.
    */
  def spreadBy(df: DataFrame, cols: org.apache.spark.sql.Column*): DataFrame =
    df.repartition(spreadWidth(df), cols: _*)

  private def spreadWidth(df: DataFrame): Int = {
    val s = df.sparkSession
    s.conf.getOption("graft.spread.partitions")
      .map { v =>
        val parsed = v.toIntOption.filter(_ > 0)
        require(parsed.nonEmpty, s"graft.spread.partitions must be a positive int, got '$v'")
        parsed.get
      }
      .getOrElse(s.sessionState.conf.numShufflePartitions)
  }

  /** Scopes AQE's coalescing knob for driver-paced iteration loops
    * (pointer-doubling closures, connected-components rounds): the
    * session-level `parallelismFirst=true` is right for MB-scale
    * document-scan shuffles (see Bench.scala) but multiplies the
    * fixed per-round task-dispatch cost of KB-scale iteration frames
    * by keeping every tiny shuffle at full width. Measured r7 (sf0.1,
    * warm): the registry closure family 3.4–4.3s with the session
    * conf vs 2.5–3.0s with size-driven coalescing. At cluster scale
    * flipping it off inside the loop is also right: iteration state
    * is metadata-sized next to the corpus, and size-based coalescing
    * still widens genuinely large rounds.
    */
  def withIterConf[T](s: SparkSession)(body: => T): T = {
    // parallelismFirst=false alone regressed the closure family 3x at
    // sf1 (7s -> 17-23s, r7 measurement): size-driven coalescing with
    // the DEFAULT 64 MB advisory folds a ~50 MB iteration frame into
    // ONE post-shuffle partition and serializes every round. A 4 MB
    // advisory keeps KB-scale rounds at 1-2 tasks (the sf0.1 fixed-
    // dispatch win this conf exists for) while a genuinely large
    // round still fans out to ~frame/4MB tasks.
    val ks = Seq(
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4m")
    val prev = ks.map { case (k, _) => k -> s.conf.getOption(k) }
    ks.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  /** A Filter that must stay EXACTLY where it is written. Catalyst
    * freely pushes deterministic predicates below joins and even into
    * join conditions — for an expensive post-join score threshold
    * (pair jaccard/cosine) that reorder evaluates the scoring
    * expression on far more pairs than survive the cheap conjuncts
    * (measured 5.7s vs 1.4s at sf0.1). The always-false
    * nondeterministic disjunct pins the Filter: the optimizer's
    * contract forbids reordering nondeterministic predicates, so the
    * plan keeps `cond` above the join, evaluated once per surviving
    * row. Single documented home for the idiom — do not inline it.
    */
  def filterBarrier(df: DataFrame, cond: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.functions.monotonically_increasing_id
    df.where(cond || monotonically_increasing_id() < 0)
  }

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view (plus the graft_* native
    * functions) so users can address the engine through plain
    * `spark.sql` — the SQL face of the library.
    */
  def registerAll(s: SparkSession, dir: String): Unit = {
    graft.functions.Native.register(s)
    names.foreach { n =>
      val df = n match {
        case "events" => events(s, dir)
        case other => load(s, dir, other)
      }
      df.createOrReplaceTempView(n)
    }
  }
}
