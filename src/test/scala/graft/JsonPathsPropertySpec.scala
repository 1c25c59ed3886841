package graft

import graft.functions.Native
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generative properties for `graft_json_paths` (recursive field-path
  * flattening, fields.go:51): for random JSON object trees the
  * expression must emit exactly the document-order walk of every
  * object member — path dotted from the root, type from the JSON
  * value class, recursing into objects but not arrays — and
  * degenerate inputs (non-object roots, malformed JSON) must yield
  * the empty array rather than errors.
  */
class JsonPathsPropertySpec extends SparkSpec {

  private sealed trait Js
  private case class JStr(v: String) extends Js
  private case class JNum(v: Long) extends Js
  private case class JBool(v: Boolean) extends Js
  private case object JNull extends Js
  private case class JArr(vs: List[Js]) extends Js
  private case class JObj(fs: List[(String, Js)]) extends Js

  private val keyGen: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(3, Gen.alphaLowerChar)
  } yield (h :: t).mkString

  private def scalarGen: Gen[Js] = Gen.oneOf(
    Gen.alphaLowerStr.map(s => JStr(s.take(6))),
    Gen.choose(-999L, 999L).map(JNum),
    Gen.oneOf(true, false).map(JBool),
    Gen.const(JNull))

  private def jsGen(depth: Int): Gen[Js] =
    if (depth <= 0) scalarGen
    else Gen.frequency(
      4 -> scalarGen,
      1 -> Gen.listOfN(2, scalarGen).map(JArr),
      3 -> objGen(depth))

  private def objGen(depth: Int): Gen[JObj] = for {
    n <- Gen.choose(1, 4)
    keys <- Gen.listOfN(n, keyGen).map(_.distinct)
    vals <- Gen.listOfN(keys.length, jsGen(depth - 1))
  } yield JObj(keys.zip(vals))

  private def render(j: Js): String = j match {
    case JStr(v) => "\"" + v + "\""
    case JNum(v) => v.toString
    case JBool(v) => v.toString
    case JNull => "null"
    case JArr(vs) => vs.map(render).mkString("[", ",", "]")
    case JObj(fs) => fs.map { case (k, v) => "\"" + k + "\":" + render(v) }
      .mkString("{", ",", "}")
  }

  private def typeOf(j: Js): String = j match {
    case _: JObj => "object"
    case _: JArr => "array"
    case _: JStr => "string"
    case _: JBool => "boolean"
    case JNull => "null"
    case _: JNum => "number"
  }

  // the contract: document-order walk, dotted paths, recurse into
  // objects only
  private def expectedWalk(o: JObj, prefix: String = ""): List[(String, String)] =
    o.fs.flatMap { case (k, v) =>
      val p = if (prefix.isEmpty) k else s"$prefix.$k"
      (p, typeOf(v)) :: (v match {
        case nested: JObj => expectedWalk(nested, p)
        case _ => Nil
      })
    }

  private def pathsBatch(texts: Seq[String]): Seq[Seq[(String, String)]] = {
    Native.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    texts.toDF("t").withColumn("i", monotonically_increasing_id())
      .selectExpr("i", "graft_json_paths(t) AS p")
      .orderBy(col("i")).collect()
      .map(_.getSeq[org.apache.spark.sql.Row](1)
        .map(r => (r.getString(0), r.getString(1))).toSeq).toSeq
  }

  test("json paths equal the document-order object walk on 100 random trees") {
    val objs = Gen.listOfN(100, objGen(3))
      .apply(Gen.Parameters.default, Seed(5L))
      .getOrElse(sys.error("generator failed"))
    val got = pathsBatch(objs.map(render))
    objs.zip(got).foreach { case (o, g) =>
      val want = expectedWalk(o)
      assert(g == want, s"walk mismatch for ${render(o)}:\ngot:  $g\nwant: $want")
    }
  }

  test("degenerate inputs yield the empty path set, never an error") {
    val got = pathsBatch(Seq("[1,2]", "\"str\"", "42", "null", "{broken", ""))
    got.foreach(paths => assert(paths.isEmpty, s"expected empty, got $paths"))
  }
}
