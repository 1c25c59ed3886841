package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("every document yields typed metadata with plausible bounds") {
    val df = Multimodal.metaExtract(spark, sfDir)
    assert(df.count() == Tables.documents(spark, sfDir).count())
    val bad = df.filter(
      col("width") < 64 || col("width") >= 576 ||
        col("height") < 64 || col("height") >= 576 ||
        col("mean_luma") < 0 || col("mean_luma") > 1 ||
        length(col("checksum")) =!= 32)
    assert(bad.count() == 0)
  }

  test("payload byte length matches source text length (ascii corpus)") {
    val joined = Multimodal.metaExtract(spark, sfDir)
      .join(Tables.documents(spark, sfDir), "doc_id")
      .filter(col("n_bytes") =!= col("n_chars"))
    assert(joined.count() == 0)
  }

  test("decode is deterministic across runs") {
    val a = Multimodal.metaExtract(spark, sfDir).collect()
    val b = Multimodal.metaExtract(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq)
  }
}
