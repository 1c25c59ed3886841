package graft

import graft.compat.SchemaCompat
import graft.compat.SchemaCompat._
import org.apache.spark.sql.types._

class CompatSpec extends SparkSpec {

  private def st(fields: (String, DataType, Boolean)*): StructType =
    StructType(fields.map { case (n, t, nb) => StructField(n, t, nb) })

  private val v1 = st(("id", LongType, false), ("name", StringType, true))

  test("NONE mode always passes") {
    val r = SchemaCompat.check(None_, st(("x", StringType, false)), Seq(v1))
    assert(r.isCompatible)
  }

  test("empty history always passes") {
    assert(SchemaCompat.check(Backward, v1, Nil).isCompatible)
  }

  test("backward: nullable added field ok, required added field fails") {
    val ok = v1.add(StructField("email", StringType, nullable = true))
    val bad = v1.add(StructField("email", StringType, nullable = false))
    assert(SchemaCompat.check(Backward, ok, Seq(v1)).isCompatible)
    val r = SchemaCompat.check(Backward, bad, Seq(v1))
    assert(!r.isCompatible && r.messages.head.contains("email"))
  }

  test("promotions: int->long ok both never narrows") {
    val oldS = st(("id", IntegerType, false))
    val newS = st(("id", LongType, false))
    assert(SchemaCompat.check(Backward, newS, Seq(oldS)).isCompatible)
    assert(!SchemaCompat.check(Backward, oldS, Seq(newS)).isCompatible)
  }

  test("full transitive checks every version in both directions") {
    val v0 = st(("id", LongType, false))
    val v2 = st(("id", LongType, false), ("name", StringType, true), ("tag", StringType, true))
    val r = SchemaCompat.check(FullTransitive, v2, Seq(v0, v1))
    assert(r.isCompatible) // all additions nullable → readable both ways
    val breaking = st(("id", StringType, false))
    assert(!SchemaCompat.check(FullTransitive, breaking, Seq(v0, v1)).isCompatible)
  }

  test("nested array/map element types are checked") {
    val oldS = st(("tags", ArrayType(IntegerType), true))
    val newS = st(("tags", ArrayType(LongType), true))
    assert(SchemaCompat.check(Backward, newS, Seq(oldS)).isCompatible)
    assert(!SchemaCompat.check(Backward, oldS, Seq(newS)).isCompatible)
  }

  test("mode parse roundtrip and unknown mode rejected") {
    assert(Mode.parse("full_transitive") == FullTransitive)
    intercept[IllegalArgumentException](Mode.parse("SIDEWAYS"))
  }

  test("battery query matches hand-traced verdicts") {
    val rows = operators.Compat.checkBattery(spark, sfDir).collect()
    assert(rows.length == 10)
    val verdicts = rows.map(r => r.getAs[Int]("case_id") -> r.getAs[Boolean]("compatible")).toMap
    assert(verdicts == Map(1 -> true, 2 -> false, 3 -> true, 4 -> false, 5 -> true,
      6 -> false, 7 -> true, 8 -> false, 9 -> false, 10 -> true))
  }
}
