package graft

import graft.functions.Native
import org.apache.spark.sql.functions._

/** The native expressions must be bit-identical to the declarative
  * HOF formulations they replaced (which the DuckDB oracles mirror).
  */
class NativeFunctionsSpec extends SparkSpec {

  private def docs = {
    Native.register(spark)
    Tables.documents(spark, sfDir)
  }

  test("graft_simhash64 equals the HOF md5-bit formulation") {
    val native = docs.selectExpr("doc_id", "graft_simhash64(split(text, ' ')) AS ch")
    val hof = docs
      .selectExpr("doc_id", "transform(split(text, ' '), t -> substring(md5(t), 1, 16)) AS th")
      .selectExpr("doc_id",
        """transform(sequence(0, 63), j -> CASE WHEN aggregate(th, 0, (acc, h) ->
          |  acc + CASE WHEN (shiftright(instr('0123456789abcdef', substring(h, cast(j div 4 AS int) + 1, 1)) - 1,
          |                   3 - cast(j % 4 AS int)) & 1) = 1 THEN 1 ELSE -1 END) > 0 THEN 1 ELSE 0 END) AS bits""".stripMargin)
      .selectExpr("doc_id",
        """transform(sequence(0, 3), k ->
          |  aggregate(sequence(0, 15), 0, (acc, i) -> acc + element_at(bits, k * 16 + i + 1) * shiftleft(1, 15 - i))) AS ch""".stripMargin)
    assert(native.exceptAll(hof).count() == 0 && hof.exceptAll(native).count() == 0)
  }

  test("graft_minhash16 equals the HOF array_min(md5) formulation") {
    val sh = docs
      .selectExpr("doc_id", "split(text, ' ') AS ts").where("size(ts) >= 3")
      .selectExpr("doc_id",
        """transform(sequence(1, size(ts) - 2),
          |  i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1), ' ', element_at(ts, i + 2))) AS shingles""".stripMargin)
    val native = sh.selectExpr("doc_id", "graft_minhash16(shingles) AS m")
    val hof = sh.selectExpr("doc_id",
      """transform(sequence(0, 15),
        |  sd -> array_min(transform(shingles, x -> md5(concat(cast(sd AS string), ':', x))))) AS m""".stripMargin)
    assert(native.exceptAll(hof).count() == 0 && hof.exceptAll(native).count() == 0)
  }

  test("graft_jaccard equals array_intersect/array_union on sorted sets") {
    val sh = docs
      .selectExpr("doc_id", "split(text, ' ') AS ts").where("size(ts) >= 3")
      .selectExpr("doc_id", "array_sort(array_distinct(ts)) AS s")
      .limit(50).cache()
    val pairs = sh.as("a").crossJoin(sh.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
    val native = pairs.selectExpr("a.doc_id", "b.doc_id", "round(graft_jaccard(a.s, b.s), 10) AS j")
    val hof = pairs.selectExpr("a.doc_id", "b.doc_id",
      "round(size(array_intersect(a.s, b.s)) / cast(size(array_union(a.s, b.s)) AS double), 10) AS j")
    assert(native.exceptAll(hof).count() == 0 && hof.exceptAll(native).count() == 0)
  }

  test("graft_avro_pcf: reference canonicalization semantics, case by case") {
    Native.register(spark)
    import spark.implicits._
    def pcf(s: String): String =
      Seq(s).toDF("t").selectExpr("graft_avro_pcf(t) AS c").head().getString(0)
    // whitespace + separate-namespace variant collapses to the qualified form
    assert(pcf("""{ "type" : "record" , "namespace" : "com.x" , "name" : "R" , "fields" : [ ] }""")
      == """{"name":"com.x.R","type":"record","fields":[]}""")
    // doc/aliases/order stripped; raw key order irrelevant
    assert(pcf("""{"doc":"d","fields":[{"name":"a","order":"ascending","type":"int"}],"name":"com.x.R","type":"record","aliases":["Z"]}""")
      == """{"name":"com.x.R","type":"record","fields":[{"name":"a","type":"int"}]}""")
    // field default KEPT (fingerprint-relevant, parser.go:288); type-level default stripped
    assert(pcf("""{"type":"record","name":"R","fields":[{"name":"a","type":"int","default":3}]}""")
      == """{"name":"R","type":"record","fields":[{"name":"a","type":"int","default":3}]}""")
    // namespace inheritance: nested unqualified record takes the enclosing
    // EXPLICIT namespace; an inline-dotted parent name does NOT establish one
    assert(pcf("""{"type":"record","namespace":"com.x","name":"R","fields":[{"name":"a","type":{"type":"record","name":"I","fields":[]}}]}""")
      == """{"name":"com.x.R","type":"record","fields":[{"name":"a","type":{"name":"com.x.I","type":"record","fields":[]}}]}""")
    assert(pcf("""{"type":"record","name":"com.x.R","fields":[{"name":"a","type":{"type":"record","name":"I","fields":[]}}]}""")
      == """{"name":"com.x.R","type":"record","fields":[{"name":"a","type":{"name":"I","type":"record","fields":[]}}]}""")
    // enum symbol order preserved; union arrays keep element order
    assert(pcf("""{"namespace":"n","type":"enum","name":"E","doc":"x","symbols":["B","A"]}""")
      == """{"name":"n.E","type":"enum","symbols":["B","A"]}""")
    assert(pcf("""{"type":"record","name":"R","fields":[{"name":"u","type":["null","string"]}]}""")
      == """{"name":"R","type":"record","fields":[{"name":"u","type":["null","string"]}]}""")
    // array/map/fixed canonical key orders
    assert(pcf("""{"items":"int","type":"array"}""") == """{"type":"array","items":"int"}""")
    assert(pcf("""{"values":"long","type":"map"}""") == """{"type":"map","values":"long"}""")
    assert(pcf("""{"size":16,"name":"F","type":"fixed","namespace":"n"}""")
      == """{"name":"n.F","type":"fixed","size":16}""")
    // invalid JSON → trimmed input (primitive type names)
    assert(pcf("  \"int\" ") == "\"int\"")
    assert(pcf(" long ") == "long")
  }

  test("graft_json_canon: sorted keys, Go number rendering, boolean-root passthrough") {
    Native.register(spark)
    def canon(in: String): String = {
      import spark.implicits._
      // Dataset literal rather than a SQL string literal — the input
      // contains backslash escapes the SQL parser would consume.
      Seq(in).toDS().selectExpr("graft_json_canon(value) AS c").head().getString(0)
    }
    // key sorting + compact separators, recursive
    assert(canon("""{ "b" : 1 , "a" : { "y" : true , "x" : null } }""")
      == """{"a":{"x":null,"y":true},"b":1}""")
    // Go encoding/json float64: integral value prints as an integer
    assert(canon("""{"n":5.0,"m":0.5}""") == """{"m":0.5,"n":5}""")
    // arrays keep element order; strings keep JSON escaping
    assert(canon("""{"r":["b","a"],"t":"x\"y"}""") == """{"r":["b","a"],"t":"x\"y"}""")
    // boolean root schemas preserved raw-trimmed (parser.go:113)
    assert(canon("  true ") == "true")
    assert(canon("false") == "false")
    // idempotence: canonical input is a fixed point
    val c1 = canon("""{"type":"object","title":"S","properties":{"a":{"maxLength":5,"type":"string"}}}""")
    assert(canon(c1) == c1)
    // invalid JSON → trimmed input
    assert(canon(" {oops ") == "{oops")
  }

  test("graft_cosine equals the zip_with/aggregate formulation") {
    Native.register(spark)
    val e = Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "cast(embedding AS array<double>) AS e").limit(40).cache()
    val pairs = e.as("a").crossJoin(e.as("b")).filter(col("a.vec_id") < col("b.vec_id"))
    val native = pairs.selectExpr("a.vec_id", "b.vec_id", "graft_cosine(a.e, b.e) AS c")
    val hof = pairs.selectExpr("a.vec_id", "b.vec_id",
      """aggregate(zip_with(a.e, b.e, (x, y) -> x * y), cast(0 AS double), (acc, x) -> acc + x) /
        |(sqrt(aggregate(a.e, cast(0 AS double), (acc, x) -> acc + x * x)) *
        | sqrt(aggregate(b.e, cast(0 AS double), (acc, x) -> acc + x * x))) AS c""".stripMargin)
    assert(native.exceptAll(hof).count() == 0 && hof.exceptAll(native).count() == 0)
  }
}
