package graft

import graft.operators.Registry
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Path}

/** Source/sink coverage beyond parquet: the registry's JSON-lines
  * changelog export (exporter.go output format) must round-trip
  * through Spark's json source with an explicit schema — including
  * the PERMISSIVE corrupt-record path an importer needs (a registry
  * import job cannot abort on one bad line) — and CSV with explicit
  * schema for the config-table shape.
  */
class SourcesSpec extends SparkSpec {

  test("registry JSON-lines export round-trips through the json source") {
    val out = Files.createTempDirectory("graft_json").toString
    val df = Registry.exportJson(spark, sfDir)
    df.select("json_line").write.mode("overwrite").text(out)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("type", StringType),
      StructField("user", LongType)))
    val back = spark.read.schema(schema).json(out)
    assert(back.count() == df.count())
    assert(back.filter(col("id").isNull || col("type").isNull).count() == 0)
    // ids survive the trip exactly
    val a = df.select(col("event_id")).collect().map(_.getLong(0)).sorted
    val b = back.select(col("id")).collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
  }

  test("corrupt changelog lines surface via PERMISSIVE instead of failing the import") {
    val out = Files.createTempDirectory("graft_json_corrupt").toString
    Registry.exportJson(spark, sfDir).select("json_line")
      .write.mode("overwrite").text(out)
    Files.writeString(Path.of(out, "part-corrupt.txt"), "{this is not json\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("type", StringType),
      StructField("user", LongType), StructField("_corrupt_record", StringType)))
    // Spark disallows querying only the corrupt-record column of a raw
    // scan — materialize the parse first (what an import job does too).
    val perm = spark.read.schema(schema).option("mode", "PERMISSIVE").json(out).cache()
    try {
      assert(perm.filter(col("_corrupt_record").isNotNull).count() == 1)
      assert(perm.filter(col("_corrupt_record").isNull).count() ==
        Registry.exportJson(spark, sfDir).count())
    } finally perm.unpersist()
  }

  test("csv sink/source round-trip with explicit schema (config-table shape)") {
    val out = Files.createTempDirectory("graft_csv").toString
    val cfg = Registry.configFallback(spark, sfDir)
    cfg.write.mode("overwrite").option("header", "true").csv(out)
    val schema = StructType(Seq(
      StructField("c_custkey", LongType), StructField("effective_mode", StringType)))
    val back = spark.read.schema(schema).option("header", "true").csv(out)
    assert(back.count() == cfg.count())
    val modes = back.select("effective_mode").distinct()
      .collect().map(_.getString(0)).toSet
    assert(modes == Set("FULL", "BACKWARD"))
  }
}
