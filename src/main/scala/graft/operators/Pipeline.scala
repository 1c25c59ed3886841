package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators beyond pairwise dedup: duplicate-
  * cluster resolution, deterministic stratified sampling, sequence
  * packing, corpus boilerplate detection, and embedding centroids
  * (the IVF training step).
  *
  * Scale notes per operator are on each method; none touches the
  * driver except the duplicate-cluster fixpoint check (a 1-row
  * aggregate per iteration, the standard convergence probe of
  * iterative graph algorithms — GraphX does the same internally).
  */
object Pipeline {

  /** Duplicate clusters = connected components over the MinHash-LSH
    * near-dup pair graph (the step that turns pairwise candidates
    * into "keep one doc per cluster" at corpus scale). Min-label
    * propagation: every node starts labeled with its own id; each
    * round every node takes the min of its own and its neighbors'
    * labels; fixpoint = components labeled by their min member.
    *
    * Scale: each round is one shuffle join on doc_id + one partial-
    * aggregated groupBy min — no driver data movement; rounds =
    * component diameter. Near-dup clusters are shallow in practice,
    * so the cap of 20 is generous; a corpus with adversarially long
    * duplicate chains would want the O(log n)-round large-star/
    * small-star variant (Kiveris et al., "Connected Components in
    * MapReduce and Beyond") — same join/agg building blocks. Labels
    * only ever decrease, so sum(label) is a monotone convergence
    * witness: unchanged sum == fixpoint.
    * Output: (cluster_id = min doc_id, doc_id, n_docs) per member.
    */
  def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashPairs(s, dir).select(col("doc_a"), col("doc_b"))
    val edges = pairs
      .union(pairs.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst")
      .repartition(col("dst"))
      .cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .cache()
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum(col("label")), lit(0L))).first().getLong(0)
    var prevSum = -1L
    var curSum = labelSum(labels)
    var iter = 0
    while (curSum != prevSum && iter < 20) {
      val next = edges
        .join(labels.select(col("id").as("dst"), col("label").as("nl")), "dst")
        .select(col("src").as("id"), col("nl").as("label"))
        .union(labels)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .cache()
      prevSum = curSum
      curSum = labelSum(next)
      labels.unpersist()
      labels = next
      iter += 1
    }
    edges.unpersist()
    val members = labels.select(col("label").as("cluster_id"), col("id").as("doc_id"))
    val sizes = members.groupBy(col("cluster_id")).agg(count(lit(1)).as("n_docs"))
    members.join(sizes, "cluster_id")
      .select(col("cluster_id"), col("doc_id"), col("n_docs"))
      .orderBy(col("cluster_id"), col("doc_id"))
  }

  /** Deterministic stratified sampling: each (source, lang) stratum
    * keeps documents whose md5(doc_id) falls under the stratum's hex
    * threshold — 25% for the dominant 'en' stratum, 50% elsewhere.
    * Content-addressed sampling (hash, not rand()) is reproducible
    * across runs/engines and needs no state: the at-scale property
    * that makes pipeline re-runs and A/B slices line up. One scan +
    * one partial-aggregated groupBy; skew-free (strata are the
    * group keys). Lexicographic compare of md5 hex is a uniform
    * [0,1) draw in 1/16 steps ('4' = 4/16, '8' = 8/16).
    */
  def sampleStratified(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), col("lang"),
        (md5(col("doc_id").cast("string")) <
          when(col("lang") === "en", "4").otherwise("8")).cast("int").as("kept"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_total"), sum(col("kept")).as("n_sampled"))
      .withColumn("rate", round(col("n_sampled") / col("n_total").cast("double"), 4))
      .orderBy(col("source"), col("lang"))

  /** Concat-then-chunk sequence packing (GPT-style pretraining): per
    * source, documents are concatenated in doc_id order and cut into
    * 2048-token chunks; each document reports the chunk containing
    * its first token. chunk_id = (running token count before the doc)
    * div 2048 — one window cumsum per source partition, no shuffle
    * beyond the partitionBy. At 100 TB the source partitions pack
    * independently (the window key IS the parallelism unit), and the
    * chunk summary is a partial-aggregated groupBy.
    */
  def packSequences(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("bigint").as("tok"))
      .withColumn("chunk_id", expr("(sum(tok) OVER (PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - tok) div 2048"))
      .groupBy(col("source"), col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
      .orderBy(col("source"), col("chunk_id"))

  /** Corpus boilerplate detection (the C4-style "drop spans that
    * repeat across many documents" signal): word 5-grams that occur
    * in >= 3 distinct documents, with their document frequency.
    * Shingling is row-local (per-doc distinct before the explode, so
    * a span repeated inside one doc counts once); the only shuffle is
    * the partial-aggregated groupBy on the 5-gram — the exact shape
    * of a corpus-wide counting job at 100 TB.
    */
  def textBoilerplate(s: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(s, dir))
      .selectExpr("doc_id", "split(text, ' ') AS ts")
      .where("size(ts) >= 5")
      .selectExpr(
        """explode(array_distinct(transform(sequence(1, size(ts) - 4),
          |  i -> concat_ws(' ', element_at(ts, i), element_at(ts, i+1), element_at(ts, i+2),
          |                 element_at(ts, i+3), element_at(ts, i+4))))) AS ngram""".stripMargin)
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("df"))
      .where(col("df") >= 3)
      .orderBy(col("df").desc, col("ngram"))

  /** Per-label embedding centroids, one row per (label, dimension) —
    * the k-means/IVF training step ([[Similarity]]'s IVF quantizer
    * consumes exactly these). posexplode fans each vector into 64
    * (dim, value) rows that partial-aggregate map-side before the
    * label×dim shuffle (640 groups), so the shuffle volume is
    * O(partitions × labels × dims), independent of corpus size.
    */
  def embCentroids(s: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.embeddings(s, dir))
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("label"), (col("pos") + 1).cast("bigint").as("dim"), col("v").cast("double").as("v"))
      .groupBy(col("label"), col("dim"))
      .agg(round(avg(col("v")), 4).as("centroid"))
      .orderBy(col("label"), col("dim"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_clusters" -> dedupClusters,
    "sample_stratified" -> sampleStratified,
    "pack_sequences" -> packSequences,
    "text_boilerplate" -> textBoilerplate,
    "emb_centroids" -> embCentroids)

  val oracleSql: Map[String, String] = Map(
    "dedup_clusters" ->
      s"""WITH RECURSIVE ${Dedup.minhashPairsCte},
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(id, lab) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.src, r.lab FROM edges e JOIN reach r ON e.dst = r.id),
        |members AS (
        |  SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY id)
        |SELECT cluster_id, doc_id, n_docs
        |FROM members JOIN (SELECT cluster_id, count(*) AS n_docs FROM members GROUP BY 1) c
        |  USING (cluster_id)
        |ORDER BY cluster_id, doc_id""".stripMargin,
    "sample_stratified" ->
      """SELECT source, lang, n_total, n_sampled,
        |  round(n_sampled / CAST(n_total AS DOUBLE), 4) AS rate
        |FROM (
        |  SELECT source, lang, count(*) AS n_total,
        |    CAST(sum(CAST(md5(CAST(doc_id AS VARCHAR)) < (CASE WHEN lang = 'en' THEN '4' ELSE '8' END) AS INT)) AS BIGINT) AS n_sampled
        |  FROM documents GROUP BY source, lang) t
        |ORDER BY source, lang""".stripMargin,
    "pack_sequences" ->
      """SELECT source, chunk_id, count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS n_tokens FROM (
        |  SELECT source, doc_id, tok,
        |    (CAST(sum(tok) OVER (PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) - tok) // 2048 AS chunk_id
        |  FROM (SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok FROM documents) t) p
        |GROUP BY source, chunk_id ORDER BY source, chunk_id""".stripMargin,
    "text_boilerplate" ->
      """SELECT ngram, df FROM (
        |  SELECT ngram, count(*) AS df FROM (
        |    SELECT doc_id, unnest(list_distinct(
        |      [ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4]
        |       for i in range(1, len(ts) - 3)])) AS ngram
        |    FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents) t
        |    WHERE len(ts) >= 5) g
        |  GROUP BY ngram) d
        |WHERE df >= 3 ORDER BY df DESC, ngram""".stripMargin,
    "emb_centroids" ->
      """SELECT label, CAST(i AS BIGINT) AS dim, round(avg(CAST(embedding[i] AS DOUBLE)), 4) AS centroid
        |FROM embeddings, LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) t
        |GROUP BY label, dim ORDER BY label, dim""".stripMargin)
}
