package graft.operators

import graft.compat.SchemaCompat
import graft.compat.SchemaCompat._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Compatibility checking exposed as a query: a fixed battery of
  * schema-evolution cases run through [[SchemaCompat]] (the Spark
  * StructType re-expression of internal/compatibility/). The oracle
  * is the expected verdict table — semantics derived from the
  * reference's checker rules, hand-traced per case.
  */
object Compat {

  private def st(fields: (String, DataType, Boolean)*): StructType =
    StructType(fields.map { case (n, t, nullable) => StructField(n, t, nullable) })

  private val v1 = st(("id", LongType, false), ("name", StringType, true))

  /** (case_id, description, mode, new schema, history oldest→newest) */
  private val cases: Seq[(Int, String, Mode, StructType, Seq[StructType])] = Seq(
    (1, "add nullable field", Backward,
      st(("id", LongType, false), ("name", StringType, true), ("email", StringType, true)), Seq(v1)),
    (2, "add required field", Backward,
      st(("id", LongType, false), ("name", StringType, true), ("email", StringType, false)), Seq(v1)),
    (3, "remove field", Backward,
      st(("id", LongType, false)), Seq(v1)),
    (4, "remove field read by old required reader", Forward,
      st(("name", StringType, true)), Seq(v1)),
    (5, "widen int to long", Backward,
      st(("id", LongType, false), ("name", StringType, true)),
      Seq(st(("id", IntegerType, false), ("name", StringType, true)))),
    (6, "narrow long to int", Backward,
      st(("id", IntegerType, false), ("name", StringType, true)), Seq(v1)),
    (7, "string/binary interchange", Full,
      st(("id", LongType, false), ("name", BinaryType, true)), Seq(v1)),
    (8, "nested struct type break", Backward,
      st(("id", LongType, false), ("meta", st(("score", FloatType, true)), true)),
      Seq(st(("id", LongType, false), ("meta", st(("score", DoubleType, true)), true)))),
    (9, "transitive catches old break", BackwardTransitive,
      st(("id", LongType, false), ("name", StringType, false)),
      Seq(st(("id", LongType, false)), v1)),
    (10, "NONE ignores breaking change", None_,
      st(("totally", StringType, false)), Seq(v1)))

  def checkBattery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    cases.map { case (id, desc, mode, newSchema, history) =>
      val r = SchemaCompat.check(mode, newSchema, history)
      (id, desc, mode.name, r.isCompatible, r.messages.length.toLong)
    }.toDF("case_id", "description", "mode", "compatible", "n_messages")
      .orderBy("case_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "compat_check" -> checkBattery)

  /** Expected verdicts, hand-traced through the reference rules:
    * case 4: old reader requires `id` (non-nullable) which the new
    * writer no longer produces → FORWARD fails; case 9: vs v1
    * `name` is required in reader but v1-writer may write null →
    * fails, and vs the first version `name` is missing entirely.
    */
  val oracleSql: Map[String, String] = Map(
    "compat_check" ->
      """SELECT * FROM (VALUES
        |  (1, 'add nullable field', 'BACKWARD', true, CAST(0 AS BIGINT)),
        |  (2, 'add required field', 'BACKWARD', false, CAST(1 AS BIGINT)),
        |  (3, 'remove field', 'BACKWARD', true, CAST(0 AS BIGINT)),
        |  (4, 'remove field read by old required reader', 'FORWARD', false, CAST(1 AS BIGINT)),
        |  (5, 'widen int to long', 'BACKWARD', true, CAST(0 AS BIGINT)),
        |  (6, 'narrow long to int', 'BACKWARD', false, CAST(1 AS BIGINT)),
        |  (7, 'string/binary interchange', 'FULL', true, CAST(0 AS BIGINT)),
        |  (8, 'nested struct type break', 'BACKWARD', false, CAST(1 AS BIGINT)),
        |  (9, 'transitive catches old break', 'BACKWARD_TRANSITIVE', false, CAST(2 AS BIGINT)),
        |  (10, 'NONE ignores breaking change', 'NONE', true, CAST(0 AS BIGINT))
        |) AS t(case_id, description, mode, compatible, n_messages)
        |ORDER BY case_id""".stripMargin)
}
