package graft

import graft.operators.FormatCompat
import org.apache.spark.sql.functions._

class FormatCompatSpec extends SparkSpec {

  test("proto scan: renames happen and never violate alone (number-keyed matching)") {
    val rows = FormatCompat.protoScan(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // renames occur on the corpus (num 2 flips name<->title with k's parity)
    assert(rows.exists(_.getAs[Long]("n_renames") > 0), "expected renames in the corpus")
    // and a rename is not a violation: some step renames yet stays compatible
    assert(rows.exists(r => r.getAs[Long]("n_renames") > 0 && r.getAs[Boolean]("proto_ok")),
      "a pure rename step must be wire-compatible — the name-keyed model would flag it")
    // both verdicts are data-driven
    assert(rows.exists(_.getAs[Boolean]("proto_ok")))
    assert(rows.exists(!_.getAs[Boolean]("proto_ok")))
    rows.foreach { r =>
      assert(r.getAs[Boolean]("proto_ok") == (r.getAs[Long]("n_violations") +
        r.getAs[Long]("n_msg_removed") + r.getAs[Long]("n_svc_removed") +
        r.getAs[Long]("n_method_removed") + r.getAs[Long]("n_method_changed") == 0L))
      assert(r.getAs[Long]("n_fields") >= 3L, "id/name-or-title/score are always present")
    }
  }

  test("proto scan: file-level surface — message/service/method rules break, enum rules stay lenient") {
    val rows = FormatCompat.protoScan(spark, sfDir).collect()
    // every file-level rule fires somewhere in the corpus
    for (c <- Seq("n_msg_removed", "n_svc_removed", "n_method_removed",
        "n_method_changed", "n_enum_relaxed"))
      assert(rows.exists(_.getAs[Long](c) > 0), s"expected $c > 0 somewhere")
    // a file-level break alone (no field violations) flips the verdict —
    // checkMessages/checkServices report independently of field rules
    assert(rows.exists(r => r.getAs[Long]("n_violations") == 0L &&
      r.getAs[Long]("n_msg_removed") + r.getAs[Long]("n_svc_removed") +
        r.getAs[Long]("n_method_removed") + r.getAs[Long]("n_method_changed") > 0L &&
      !r.getAs[Boolean]("proto_ok")), "file-level break must flip proto_ok on its own")
    // enum type/value removal and value renames are wire-compatible
    // (checker.go:545/:563/:573): relaxations co-exist with a green verdict
    assert(rows.exists(r => r.getAs[Long]("n_enum_relaxed") > 0L &&
      r.getAs[Boolean]("proto_ok")), "enum relaxations must not break compat")
  }

  test("proto scan: field count matches the model's presence predicates") {
    // reader field count per version must equal the model: 3 always-present
    // + email (k%3 != 2) + status (k%3 < 2)
    val model = FormatCompat.pbFieldArrays(spark, sfDir)
      .filter(col("version") > 1)
      .select(col("subject"), col("version"), size(col("pb")).cast("long").as("expected"))
    val scan = FormatCompat.protoScan(spark, sfDir)
      .select(col("subject"), col("version"), col("n_fields"))
    val mismatches = scan.join(model, Seq("subject", "version"))
      .filter(col("n_fields") =!= col("expected")).count()
    assert(mismatches == 0)
  }

  test("proto scan: nested/map-entry keys break at depth, invisible to the flat keys") {
    import org.apache.spark.sql.functions._
    // Rebuild the per-step verdicts restricted to the FLAT keys
    // (1-5): steps that are flat-clean but flagged by the full scan
    // prove the nested surface (6.*, 7.*) carries its own breaks.
    val pb = FormatCompat.pbFieldArrays(spark, sfDir).filter(col("version") > 1)
    val zipBreaks = pb.select(
      expr("get(filter(pb, x -> x.fkey = '6.zip'), 0).kind").as("r_zip"),
      expr("get(filter(w_pb, x -> x.fkey = '6.zip'), 0).kind").as("w_zip"),
      expr("get(filter(pb, x -> x.fkey = '7.value'), 0).kind").as("r_val"),
      expr("get(filter(w_pb, x -> x.fkey = '7.value'), 0).kind").as("w_val"))
      .collect()
    // the nested wire-group transitions fire BOTH ways in the data
    assert(zipBreaks.exists(r => r.getAs[String]("w_zip") == "int32" && r.getAs[String]("r_zip") == "fixed64"))
    assert(zipBreaks.exists(r => r.getAs[String]("w_zip") == "fixed64" && r.getAs[String]("r_zip") == "int32"))
    assert(zipBreaks.exists(r => r.getAs[String]("w_val") == "int64" && r.getAs[String]("r_val") == "string"))
    assert(zipBreaks.exists(r => r.getAs[String]("w_val") == "int32" && r.getAs[String]("r_val") == "int64"))
    val scan = FormatCompat.protoScan(spark, sfDir)
    // some step must be flagged WITH a nested/map kind change live —
    // the depth surface participates in real verdicts
    val deep = pb.select(col("subject"), col("version"),
      expr("""size(filter(pb, x -> x.fkey IN ('6.zip', '7.value') AND
        get(filter(w_pb, w -> w.fkey = x.fkey), 0).kind IS NOT NULL AND
        get(filter(w_pb, w -> w.fkey = x.fkey), 0).kind != x.kind)) AS n_deep_kind_changes"""))
      .join(scan, Seq("subject", "version"))
    assert(deep.filter(col("n_deep_kind_changes") > 0 && !col("proto_ok")).count() > 0)
  }

  test("json scan: $ref resolution — ref swaps are invisible, def changes break") {
    import org.apache.spark.sql.functions._
    // home transitions with RESOLVED types on both sides: a
    // ref⇄inline move with equal resolution must never contribute a
    // v_type, while an unchanged 'ref:addr' whose definition flips
    // must. Reconstruct per-step home resolution from the model and
    // check against the scan's v_type accounting minus the other
    // type-changing props (tags is the only other v_type source).
    val base = FormatCompat.jsFieldArrays(spark, sfDir).filter(col("version") > 1)
      .select(col("subject"), col("version"),
        expr("get(filter(props_all, p -> p.pname = 'home'), 0).ptype").as("r_home"),
        expr("get(filter(w_all, p -> p.pname = 'home'), 0).ptype").as("w_home"),
        col("defaddr"), col("w_defaddr"))
      .withColumn("r_res", when(col("r_home") === "ref:addr", col("defaddr")).otherwise(col("r_home")))
      .withColumn("w_res", when(col("w_home") === "ref:addr", col("w_defaddr")).otherwise(col("w_home")))
    val swaps = base.filter(col("r_home") =!= col("w_home") && col("r_res") === col("w_res"))
    val defChanges = base.filter(col("r_home") === "ref:addr" && col("w_home") === "ref:addr" &&
      col("defaddr") =!= col("w_defaddr"))
    assert(swaps.count() > 0, "ref⇄inline swaps with equal resolution must occur")
    assert(defChanges.count() > 0, "definition changes under an unchanged $ref must occur")
    // resolution-aware v_type: join the scan and verify both directions
    val scan = FormatCompat.jsonScan(spark, sfDir).select(col("subject"), col("version"), col("v_type"))
    val joined = base.join(scan, Seq("subject", "version"))
    // a def change under unchanged ref MUST be counted
    assert(joined.filter(col("r_home") === "ref:addr" && col("w_home") === "ref:addr" &&
      col("defaddr") =!= col("w_defaddr") && col("v_type") === 0).count() == 0)
  }

  test("json scan: every violation class fires somewhere, counts reconcile") {
    val rows = FormatCompat.jsonScan(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val classes = Seq("v_type", "v_removed", "v_req_added", "v_open_added",
      "v_opt_req", "v_enum", "v_bounds", "v_sum", "v_dep", "v_tuple", "v_all",
      "v_pattern", "v_multiple", "v_items", "v_unique", "v_const", "v_dsch",
      "v_itemsb", "v_ap", "v_propcount", "v_not")
    classes.foreach { c =>
      assert(rows.exists(_.getAs[Long](c) > 0), s"$c never fires on the corpus")
    }
    rows.foreach { r =>
      val total = classes.map(r.getAs[Long](_)).sum
      assert(r.getAs[Long]("n_violations") == total, "class counts must sum to the total")
      assert(r.getAs[Boolean]("json_ok") == (total == 0L))
    }
    // both verdicts are data-driven
    assert(rows.exists(_.getAs[Boolean]("json_ok")))
    assert(rows.exists(!_.getAs[Boolean]("json_ok")))
  }

  test("json scan: root `not` constraint — added/type-changed/broadened break, narrowed relaxes") {
    import org.apache.spark.sql.functions.col
    val scan = FormatCompat.jsonScan(spark, sfDir).collect()
    assert(scan.exists(_.getAs[Long]("v_not") > 0), "v_not must fire somewhere")
    assert(scan.exists(_.getAs[Long]("v_not") == 0), "v_not must not fire everywhere")
    // cross-check the scan against the model row by row: v_not fires
    // exactly on added / type-changed / broadened (fewer keywords)
    // steps, and a NARROWING step (reader adds a keyword to the same
    // not-type, e.g. s1 -> s2) never fires
    val m = FormatCompat.jsFieldArrays(spark, sfDir)
      .filter(col("version") > 1)
      .select(col("subject"), col("version"), col("jnot"), col("w_jnot"))
      .collect().map(r => (r.getAs[Long]("subject"), r.getAs[Int]("version")) ->
        (Option(r.getAs[String]("jnot")), Option(r.getAs[String]("w_jnot")))).toMap
    scan.foreach { r =>
      val key = (r.getAs[Long]("subject"), r.getAs[Int]("version"))
      val (jn, wn) = m(key)
      val expected = (jn, wn) match {
        case (Some(j), None) => 1L                        // added
        case (Some(j), Some(w)) if j(0) != w(0) => 1L     // type changed
        case (Some(j), Some(w)) if j(1) < w(1) => 1L      // broadened
        case _ => 0L
      }
      assert(r.getAs[Long]("v_not") == expected, s"$key: $jn vs $wn")
    }
  }

  test("json scan: external $ref resolves against the partner subject's registry state") {
    // checker.go:133-:155 buildExternalRefMap: `org` references the
    // xor-partner subject's addr definition. An equal ref⇄inline swap
    // must stay invisible to v_type; a partner definition change
    // under an unchanged xref must break.
    val base = FormatCompat.jsFieldArrays(spark, sfDir).filter(col("version") > 1)
      .select(col("subject"), col("version"),
        expr("get(filter(props_all, p -> p.pname = 'org'), 0).ptype").as("r_org"),
        expr("get(filter(w_all, p -> p.pname = 'org'), 0).ptype").as("w_org"),
        col("xaddr"), col("w_xaddr"))
      .withColumn("r_res", when(col("r_org") === "xref:org",
        coalesce(col("xaddr"), lit("unresolved"))).otherwise(col("r_org")))
      .withColumn("w_res", when(col("w_org") === "xref:org",
        coalesce(col("w_xaddr"), lit("unresolved"))).otherwise(col("w_org")))
    val swaps = base.filter(col("r_org") =!= col("w_org") && col("r_res") === col("w_res"))
    val defChanges = base.filter(col("r_org") === "xref:org" && col("w_org") === "xref:org" &&
      coalesce(col("xaddr"), lit("?")) =!= coalesce(col("w_xaddr"), lit("?")))
    assert(swaps.count() > 0, "xref⇄inline swaps with equal resolution must occur")
    assert(defChanges.count() > 0,
      "partner definition changes under an unchanged xref must occur")
    val scan = FormatCompat.jsonScan(spark, sfDir)
      .select(col("subject"), col("version"), col("v_type"))
    val joined = base.join(scan, Seq("subject", "version"))
    assert(joined.filter(col("r_org") === "xref:org" && col("w_org") === "xref:org" &&
      coalesce(col("xaddr"), lit("?")) =!= coalesce(col("w_xaddr"), lit("?")) &&
      col("v_type") === 0).count() == 0,
      "a partner def change under an unchanged xref must be counted in v_type")
  }

  test("json scan: open reader absorbs removals, closed reader flags them") {
    // Directly exercise the content-model asymmetry (:323): among steps
    // where a property disappeared, closed readers must report v_removed
    // and open readers must not.
    val base = FormatCompat.jsFieldArrays(spark, sfDir)
      .filter(col("version") > 1)
      .withColumn("n_removed_names",
        size(expr("filter(w_props, w -> !exists(props_arr, p -> p.pname = w.pname))")))
    val joined = base
      .select(col("subject"), col("version"), col("open"), col("n_removed_names"))
      .join(FormatCompat.jsonScan(spark, sfDir), Seq("subject", "version"))
    val openFlagged = joined
      .filter(col("open") && col("n_removed_names") > 0 && col("v_removed") > 0).count()
    assert(openFlagged == 0, "open readers must absorb property removals")
    val closedMissed = joined
      .filter(!col("open") && col("n_removed_names") > 0 &&
        col("v_removed") =!= col("n_removed_names").cast("long")).count()
    assert(closedMissed == 0, "closed readers must flag every removed property")
  }
}
