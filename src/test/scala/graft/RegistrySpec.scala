package graft

import graft.operators.Registry
import org.apache.spark.sql.functions._

class RegistrySpec extends SparkSpec {

  test("subject list is sorted distinct event types") {
    val subjects = Registry.subjectList(spark, sfDir).collect().map(_.getString(0))
    assert(subjects.sameElements(subjects.sorted))
    assert(subjects.toSet.size == subjects.length)
  }

  test("latest version picks exactly one row per user") {
    val df = Registry.latestVersion(spark, sfDir)
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(df.count() == users)
  }

  test("versions are dense starting at 1 per user") {
    val df = Registry.versions(spark, sfDir)
    val bad = df.groupBy("user_id")
      .agg(min("version").as("mn"), max("version").as("mx"), count(lit(1)).as("n"))
      .filter(col("mn") =!= 1 || col("mx") =!= col("n"))
    assert(bad.count() == 0)
  }

  test("config fallback covers every customer with a mode") {
    val df = Registry.configFallback(spark, sfDir)
    assert(df.filter(col("effective_mode").isNull).count() == 0)
    val modes = df.select("effective_mode").distinct().collect().map(_.getString(0)).toSet
    assert(modes.subsetOf(Set("FULL", "BACKWARD")))
  }

  test("lookup by hash: canonical id is the min doc per content hash") {
    val df = Registry.lookupByHash(spark, sfDir)
    assert(df.count() == df.select("content_hash").distinct().count())
  }

  test("import dedupe keeps one row per (user, type)") {
    val df = Registry.importDedupe(spark, sfDir)
    assert(df.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count() == 0)
  }
}
