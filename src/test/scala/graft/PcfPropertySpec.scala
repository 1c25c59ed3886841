package graft

import graft.functions.Native
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generative properties for `graft_avro_pcf` (the Avro Parsing
  * Canonical Form expression): random schema ASTs are rendered under
  * random formatting noise — JSON key order, whitespace, doc/aliases/
  * order attributes — and every rendering of one AST must
  * canonicalize to the SAME string; canonicalization must also be a
  * fixpoint (pcf ∘ pcf = pcf). The case-by-case spec in
  * NativeFunctionsSpec pins the reference semantics; this suite
  * sweeps the combinatorial rendering space those cases can't.
  *
  * The namespace REPRESENTATION (explicit key vs inline-dotted name
  * vs bare) is part of the AST, not the noise: the reference
  * canonicalizer intentionally distinguishes them for nested types
  * (parser.go:163), so flipping representation is a semantic change,
  * not formatting.
  */
class PcfPropertySpec extends SparkSpec {

  // ---- schema AST ----
  private sealed trait Ast
  private case class Prim(n: String) extends Ast
  private case class Fld(name: String, t: Ast, default: Option[Int])
  private case class Rec(name: String, ns: Option[String], fields: List[Fld]) extends Ast
  private case class Enm(name: String, ns: Option[String], syms: List[String]) extends Ast
  private case class Arr(t: Ast) extends Ast
  private case class MapT(t: Ast) extends Ast
  private case class Fixd(name: String, ns: Option[String], size: Int) extends Ast
  private case class Un(ts: List[Ast]) extends Ast

  private val primGen = Gen.oneOf("null", "boolean", "int", "long",
    "float", "double", "bytes", "string").map(Prim)
  private val nameGen = for {
    h <- Gen.alphaUpperChar
    t <- Gen.listOfN(4, Gen.alphaLowerChar)
  } yield (h :: t).mkString
  private val nsGen = Gen.option(Gen.oneOf("com.a", "com.b", "org.x.y"))

  private def astGen(depth: Int): Gen[Ast] =
    if (depth <= 0) primGen
    else Gen.frequency(
      3 -> primGen,
      3 -> recGen(depth),
      1 -> enmGen,
      1 -> (for { t <- astGen(depth - 1) } yield Arr(t)),
      1 -> (for { t <- astGen(depth - 1) } yield MapT(t)),
      1 -> (for { n <- nameGen; ns <- nsGen; s <- Gen.choose(1, 32) } yield Fixd(n, ns, s)),
      1 -> (for {
        n <- Gen.choose(2, 3)
        ps <- Gen.pick(n, Seq("null", "int", "long", "string", "bytes", "boolean"))
      } yield Un(ps.toList.map(Prim))))

  private def recGen(depth: Int): Gen[Ast] = for {
    n <- nameGen
    ns <- nsGen
    nf <- Gen.choose(1, 4)
    fs <- Gen.listOfN(nf, for {
      fn <- nameGen
      t <- astGen(depth - 1)
      d <- Gen.option(Gen.choose(0, 99))
    } yield Fld(fn, t, d))
  } yield Rec(n, ns, fs.distinctBy(_.name))

  private val enmGen: Gen[Ast] = for {
    n <- nameGen
    ns <- nsGen
    k <- Gen.choose(1, 4)
    ss <- Gen.listOfN(k, nameGen)
  } yield Enm(n, ns, ss.distinct)

  // ---- noisy renderer ----
  private def render(ast: Ast, rnd: scala.util.Random, noisy: Boolean): String = {
    def sp: String = if (noisy && rnd.nextBoolean()) " " else ""
    def joinObj(kvs: List[(String, String)]): String = {
      val order = if (noisy) rnd.shuffle(kvs) else kvs
      order.map { case (k, v) => s"""$sp"$k"$sp:$sp$v""" }.mkString("{", s",$sp", s"$sp}")
    }
    def go(a: Ast): String = a match {
      case Prim(n) => "\"" + n + "\""
      case Un(ts) => ts.map(go).mkString(s"[$sp", s",$sp", s"$sp]")
      case Arr(t) => joinObj(List("type" -> "\"array\"", "items" -> go(t)))
      case MapT(t) => joinObj(List("type" -> "\"map\"", "values" -> go(t)))
      case Fixd(n, ns, size) =>
        joinObj(List("type" -> "\"fixed\"", "name" -> s""""$n"""", "size" -> size.toString) ++
          ns.map(x => "namespace" -> s""""$x"""") ++ noiseAttrs)
      case Enm(n, ns, syms) =>
        joinObj(List("type" -> "\"enum\"", "name" -> s""""$n"""",
          "symbols" -> syms.map("\"" + _ + "\"").mkString(s"[$sp", s",$sp", s"$sp]")) ++
          ns.map(x => "namespace" -> s""""$x"""") ++ noiseAttrs)
      case Rec(n, ns, fields) =>
        val fs = fields.map { f =>
          joinObj(List("name" -> s""""${f.name}"""", "type" -> go(f.t)) ++
            f.default.map("default" -> _.toString) ++ fieldNoise)
        }.mkString(s"[$sp", s",$sp", s"$sp]")
        joinObj(List("type" -> "\"record\"", "name" -> s""""$n"""", "fields" -> fs) ++
          ns.map(x => "namespace" -> s""""$x"""") ++ noiseAttrs)
    }
    def noiseAttrs: List[(String, String)] =
      if (noisy && rnd.nextBoolean()) List("doc" -> "\"generated\"") else Nil
    def fieldNoise: List[(String, String)] =
      if (noisy && rnd.nextBoolean()) List("order" -> "\"ascending\"") else Nil
    go(ast)
  }

  private def pcfBatch(texts: Seq[String]): Seq[String] = {
    Native.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    texts.toDF("t").withColumn("i", monotonically_increasing_id())
      .selectExpr("i", "graft_avro_pcf(t) AS c")
      .orderBy(col("i")).collect().map(_.getString(1)).toSeq
  }

  private val asts: List[Ast] = {
    val g = Gen.listOfN(120, astGen(3))
    g.apply(Gen.Parameters.default, Seed(42L))
      .getOrElse(sys.error("generator failed"))
  }

  test("pcf is invariant under key order, whitespace, and non-canonical attributes") {
    val rnd = new scala.util.Random(7)
    // 3 independently-noised renderings per AST, one clean
    val variants = asts.map { a =>
      (render(a, rnd, noisy = false),
        List.fill(3)(render(a, rnd, noisy = true)))
    }
    val flat = variants.flatMap { case (clean, noisy) => clean :: noisy }
    val canon = pcfBatch(flat)
    var idx = 0
    variants.zip(asts).foreach { case ((clean, noisy), ast) =>
      val group = canon.slice(idx, idx + 1 + noisy.length)
      idx += 1 + noisy.length
      assert(group.distinct.size == 1,
        s"renderings of one AST diverged:\nAST: $ast\nclean: $clean\ncanon: ${group.distinct}")
    }
  }

  test("pcf is a fixpoint: canonicalizing a canonical form is the identity") {
    val rnd = new scala.util.Random(11)
    val once = pcfBatch(asts.map(a => render(a, rnd, noisy = true)))
    val twice = pcfBatch(once)
    once.zip(twice).zipWithIndex.foreach { case ((c1, c2), i) =>
      assert(c1 == c2, s"not a fixpoint for AST ${asts(i)}:\n1st: $c1\n2nd: $c2")
    }
  }

  test("pcf discriminates: distinct enum symbol orders and distinct defaults keep distinct forms") {
    // Canonical form must NOT over-normalize the fingerprint-relevant
    // dimensions: symbol order and field defaults survive.
    val texts = Seq(
      """{"type":"enum","name":"E","symbols":["A","B"]}""",
      """{"type":"enum","name":"E","symbols":["B","A"]}""",
      """{"type":"record","name":"R","fields":[{"name":"a","type":"int","default":1}]}""",
      """{"type":"record","name":"R","fields":[{"name":"a","type":"int","default":2}]}""",
      """{"type":"record","name":"R","fields":[{"name":"a","type":"int"}]}""")
    val canon = pcfBatch(texts)
    assert(canon.distinct.size == texts.size, s"over-normalized: $canon")
  }
}
