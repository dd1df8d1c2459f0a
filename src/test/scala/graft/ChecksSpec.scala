package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Checks

class ChecksSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("audit counts row violations, null predicates, and duplicate keys") {
    val df = Seq(
      (1L, Some(10.0), "ok"),
      (2L, Some(-5.0), "ok"),   // negative → positive_price violation
      (3L, None, "ok"),         // NULL price → predicate null → violation
      (3L, Some(7.0), "bad"),   // duplicate key + unknown status
      (5L, Some(1.0), "ok"))
      .toDF("id", "price", "status")
    val out = Checks.audit(df,
        rowRules = Seq(
          "positive_price" -> ($"price" > 0),
          "status_known" -> $"status".isin("ok")),
        uniqueKeys = Seq("unique_id" -> Seq("id")))
      .as[(String, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("positive_price") === ((2L, false)))
    assert(out("status_known") === ((1L, false)))
    assert(out("unique_id") === ((1L, false)))
  }

  test("audit passes a clean table and plans a single aggregation") {
    val df = (1L to 100L).toDF("id")
    val audit = Checks.audit(df,
      rowRules = Seq("id_positive" -> ($"id" > 0)),
      uniqueKeys = Seq("unique_id" -> Seq("id")))
    val out = audit.as[(String, Long, Boolean)].collect().toSet
    assert(out === Set(("id_positive", 0L, true), ("unique_id", 0L, true)))
    // every rule rides ONE scan: exactly one parquet-free local scan and
    // no join/union fan-out in the plan
    val plan = audit.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Union") && !plan.contains("Join"), plan.take(2000))
  }

  test("audit rejects backticked and duplicate rule names up front") {
    val df = Seq((1L, 1.0)).toDF("id", "price")
    intercept[IllegalArgumentException] {
      Checks.audit(df, rowRules = Seq("price`chk" -> ($"price" > 0)))
    }
    intercept[IllegalArgumentException] {
      Checks.audit(df, rowRules = Seq(
        "dup" -> ($"price" > 0), "dup" -> ($"id" > 0)))
    }
  }

  test("audit on an empty table reports zero violations everywhere") {
    val out = Checks.audit(spark.range(0).toDF("id"),
        rowRules = Seq("id_positive" -> ($"id" > 0)),
        uniqueKeys = Seq("unique_id" -> Seq("id")))
      .as[(String, Long, Boolean)].collect().toSet
    assert(out === Set(("id_positive", 0L, true), ("unique_id", 0L, true)))
  }

  test("tableFingerprint is layout-invariant and content-sensitive") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, Option.empty[String].orNull),
      (4L, "")).toDF("id", "v")
    val cols = Seq("id", "v")
    def fp(df: org.apache.spark.sql.DataFrame): (Long, Long) =
      Checks.tableFingerprint(df, cols).as[(Long, Long)].collect().head
    val want = fp(base)
    // row order, partitioning, and physical layout all drop out
    assert(fp(base.orderBy($"v".desc)) === want)
    assert(fp(base.repartition(7)) === want)
    assert(fp(base.coalesce(1)) === want)
    // a single changed cell changes the fingerprint; row count unchanged
    val changed = fp(Seq((1L, "a"), (2L, "B"), (3L, Option.empty[String].orNull),
      (4L, "")).toDF("id", "v"))
    assert(changed._1 === want._1 && changed._2 != want._2)
    // NULL and empty string fold differently
    val nullAsEmpty = fp(Seq((1L, "a"), (2L, "b"), (3L, ""),
      (4L, "")).toDF("id", "v"))
    assert(nullAsEmpty._2 != want._2)
    // documented caveat: an even-multiplicity duplicate cancels in the
    // XOR (every row hash appears twice → fingerprint 0) — n_rows is
    // what catches pure duplication
    val doubled = fp(base.unionAll(base))
    assert(doubled === ((2 * want._1, 0L)))
    // empty table: count 0, fingerprint 0 (not null)
    assert(fp(base.where($"id" < 0)) === ((0L, 0L)))
    // mergeable (the CDC shape): fp(base ∪ delta) = fp(base) XOR
    // fp(delta) for disjoint parts — an incremental pipeline maintains
    // the corpus fingerprint from batch fingerprints alone
    val delta = Seq((9L, "z"), (10L, "y")).toDF("id", "v")
    val merged = fp(base.unionAll(delta))
    assert(merged === ((want._1 + 2, want._2 ^ fp(delta)._2)))
  }

  test("psiDrift: identical snapshots score ~0, a shifted group scores high") {
    val rnd = new scala.util.Random(7)
    val oldRows = (1 to 2000).map(_ => ("stable", 40 + rnd.nextInt(20))) ++
      (1 to 2000).map(_ => ("shifted", 40 + rnd.nextInt(20)))
    // stable keeps its distribution; shifted moves up by 30
    val newRows = (1 to 2000).map(_ => ("stable", 40 + rnd.nextInt(20))) ++
      (1 to 2000).map(_ => ("shifted", 70 + rnd.nextInt(20)))
    val out = Checks.psiDrift(oldRows.toDF("g", "v"), newRows.toDF("g", "v"),
        Seq("g"), "v", lo = 0.0, hi = 100.0, nBins = 10)
      .select("g", "psi").as[(String, Double)].collect().toMap
    assert(out("stable") < 0.05, s"stable drifted: ${out("stable")}")
    assert(out("shifted") > 1.0, s"shift not detected: ${out("shifted")}")
  }

  test("psiDrift: out-of-range values clamp to edge bins and still register") {
    val o = (1 to 100).map(_ => ("g", 50)).toDF("g", "v")
    val n = (1 to 100).map(_ => ("g", 5000)).toDF("g", "v") // far past hi
    val psi = Checks.psiDrift(o, n, Seq("g"), "v", 0.0, 100.0, 10)
      .select("psi").as[Double].collect()(0)
    assert(psi > 1.0, s"tail drift missed: $psi")
  }

  test("psiDrift: a group present on one side only keeps a finite row") {
    val o = (1 to 50).map(i => ("only_old", i)).toDF("g", "v")
    val n = (1 to 50).map(i => ("only_new", i)).toDF("g", "v")
    val out = Checks.psiDrift(o, n, Seq("g"), "v", 0.0, 100.0, 10)
      .select("g", "psi", "n_old", "n_new")
      .as[(String, Double, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet === Set("only_old", "only_new"))
    assert(out("only_old")._3 === 50L && out("only_old")._4 === 0L)
    assert(out.values.forall(r => !r._2.isNaN && !r._2.isInfinite))
  }

  test("fdAudit: clean FD passes, dirty FD localizes, null dependents don't conflict") {
    val df = Seq(
      // key 1: region constant (clean), status varies (dirty)
      (1L, "eu", "open"), (1L, "eu", "closed"),
      // key 2: clean on both
      (2L, "us", "open"), (2L, "us", "open"),
      // key 3: region {x, NULL} → 1 distinct non-null, still clean
      (3L, "ap", null), (3L, null, "open"))
      .toDF("k", "region", "status")
    val got = Checks.fdAudit(df, Seq("k"), Seq("region", "status"))
      .orderBy($"rule").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toSeq
    assert(got == Seq(
      ("k->region", 3L, 0L, 0.0, true),
      ("k->status", 3L, 1L, 0.333333, false)))
  }

  test("integrityAudit: matched/unmatched ids, multiplicity, exact row counts") {
    // fact ids: 1 twice, 2, 3; dim ids: 1, 2 twice, 4
    val fact = Seq(1L, 1L, 2L, 3L).toDF("fk")
    val dim = Seq(1L, 2L, 2L, 4L).toDF("pk")
    val r = Checks.integrityAudit(fact, dim, "fk", "pk").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6)) ==
      ((4L, 4L, 2L, 1L, 1L, 1L, 1L)))
  }
}
