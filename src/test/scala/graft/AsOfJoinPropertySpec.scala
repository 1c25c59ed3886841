package graft

import graft.plans.{AsOfJoin, AsOfJoinStrategy}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generative equivalence for the custom AsOfJoinExec physical merge:
  * random probe/build sets — including keys with no build rows, build
  * rows after every probe, single-row keys, and dense timestamp
  * collisions BETWEEN sides (probe ts == build ts must match, the
  * `<=` contract) — are joined through the custom operator and
  * through a driver-side brute force; the (probe, matched build time)
  * relation must be identical. Build (key, time) pairs are unique by
  * construction so the expected relation is a function — within-side
  * tie payload choice is explicitly not part of the contract.
  *
  * This sweeps the buffered-state edge cases (key switches with
  * leftover build rows, copy-on-buffer aliasing) that one fixed
  * corpus can't.
  */
class AsOfJoinPropertySpec extends SparkSpec {

  private case class Ev(key: Long, ts: Long, id: Long)

  private val caseGen: Gen[(List[Ev], List[Ev])] = for {
    nKeys <- Gen.choose(1, 8)
    // small ts domain on purpose: forces cross-side collisions
    probes <- Gen.listOf(for {
      k <- Gen.choose(0L, nKeys.toLong)
      t <- Gen.choose(0L, 30L)
    } yield (k, t))
    builds <- Gen.listOf(for {
      k <- Gen.choose(0L, nKeys.toLong)
      t <- Gen.choose(0L, 30L)
    } yield (k, t))
  } yield {
    val ps = probes.zipWithIndex.map { case ((k, t), i) => Ev(k, t, i.toLong) }
    val bs = builds.distinct.zipWithIndex.map { case ((k, t), i) => Ev(k, t, 1000L + i) }
    (ps, bs)
  }

  private def viaExec(ps: List[Ev], bs: List[Ev]): Array[(Long, Option[Long])] = {
    AsOfJoinStrategy.ensureRegistered(spark)
    import spark.implicits._
    val l = ps.map(e => (e.key, e.ts, e.id)).toDF("p_key", "p_ts", "p_id")
    val r = bs.map(e => (e.key, e.ts, e.id)).toDF("b_key", "b_ts", "b_id")
    val (lp, rp) = (l.queryExecution.analyzed, r.queryExecution.analyzed)
    def a(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).get
    val joined: DataFrame = org.apache.spark.sql.graftshim.GraftShim.ofRows(spark,
      AsOfJoin(lp, rp, a(lp, "p_key"), a(rp, "b_key"),
        a(lp, "p_ts"), a(rp, "b_ts"), Seq(a(rp, "b_id"))))
    joined.select(col("p_id"), col("b_ts")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .sortBy(_._1)
  }

  private def brute(ps: List[Ev], bs: List[Ev]): Array[(Long, Option[Long])] =
    ps.map { p =>
      val cands = bs.filter(b => b.key == p.key && b.ts <= p.ts)
      (p.id, if (cands.isEmpty) None else Some(cands.map(_.ts).max))
    }.sortBy(_._1).toArray

  test("AsOfJoinExec matches driver-side brute force on 40 random probe/build sets") {
    val cases = Gen.listOfN(40, caseGen)
      .apply(Gen.Parameters.default, Seed(99L))
      .getOrElse(sys.error("generator failed"))
    cases.zipWithIndex.foreach { case ((ps, bs), i) =>
      if (ps.nonEmpty) {
        val got = viaExec(ps, bs)
        val want = brute(ps, bs)
        assert(got.sameElements(want),
          s"case $i mismatch (${ps.length} probes, ${bs.length} builds):\n" +
            s"got:  ${got.take(12).mkString(", ")}\nwant: ${want.take(12).mkString(", ")}")
      }
    }
  }
}
