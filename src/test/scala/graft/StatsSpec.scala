package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Stats

class StatsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("exactPercentiles matches the built-in percentile aggregate") {
    val orders = spark.read.parquet(s"${SparkTestSession.sfDir}/orders.parquet")
    val ps = Seq(0.0, 0.25, 0.5, 0.95, 0.99, 1.0)
    val got = Stats
      .exactPercentiles(orders, "o_totalprice", ps, partitions = 5)
      .collect().head
    val want = orders
      .agg(expr(s"percentile(o_totalprice, array(${ps.mkString(",")}))"))
      .collect().head.getSeq[Double](0)
    ps.indices.foreach { i =>
      assert(math.abs(got.getDouble(i) - want(i)) < 1e-6,
        s"p=${ps(i)}: got ${got.getDouble(i)}, want ${want(i)}")
    }
  }

  test("exactPercentiles: nulls dropped, duplicate-heavy data, 1 partition") {
    val df = (Seq.fill(40)(Some(7.0)) ++ Seq.fill(39)(Some(1.0)) ++ Seq(None))
      .toDF("v")
    val got = Stats
      .exactPercentiles(df, "v", Seq(0.5), Seq("med"), partitions = 1)
      .collect().head.getDouble(0)
    // 79 non-null values sorted: ranks 0..38 are 1.0, 39..78 are 7.0;
    // rank 0.5*(79-1)=39 → 7.0
    assert(got == 7.0)
  }

  test("adaptive percentiles: both paths agree") {
    val orders = spark.read.parquet(s"${SparkTestSession.sfDir}/orders.parquet")
    val ps = Seq(0.5, 0.95)
    val viaBuiltin = Stats
      .percentiles(orders, "o_totalprice", ps, threshold = Long.MaxValue)
      .collect().head
    val viaDistributed = Stats
      .percentiles(orders, "o_totalprice", ps, threshold = 0L)
      .collect().head
    ps.indices.foreach { i =>
      assert(math.abs(viaBuiltin.getDouble(i) - viaDistributed.getDouble(i)) < 1e-6)
    }
  }

  test("exactPercentiles on empty input returns nulls") {
    val row = Stats
      .exactPercentiles(Seq.empty[Double].toDF("v"), "v", Seq(0.5, 0.9))
      .collect().head
    assert(row.isNullAt(0) && row.isNullAt(1))
  }

  test("histogram: equi-width buckets, max folds into the last, constants in bucket 0") {
    val df = (0 until 100).map(_.toDouble).toDF("v")
    val h = Stats.histogram(df, "v", bins = 10)
      .orderBy("bucket")
      .as[(Int, Double, Double, Long)].collect().toSeq
    assert(h.size === 10)
    assert(h.map(_._4).forall(_ === 10L)) // uniform data → 10 per bucket
    assert(h.head._2 === 0.0 && math.abs(h.last._3 - 99.0) < 1e-9)
    // the max value (99.0) belongs to the last bucket, not an 11th
    val const = Stats.histogram(Seq(5.0, 5.0, 5.0).toDF("v"), "v", bins = 4)
      .as[(Int, Double, Double, Long)].collect().toSeq
    assert(const === Seq((0, 5.0, 5.0, 3L)))
    // nulls don't surface as a phantom (null, null, null) bin
    val withNulls = Stats.histogram(
      Seq(Some(1.0), None, Some(2.0), None).toDF("v"), "v", bins = 2)
      .orderBy("bucket")
      .as[(Int, Double, Double, Long)].collect().toSeq
    assert(withNulls === Seq((0, 1.0, 1.5, 1L), (1, 1.5, 2.0, 1L)))
  }

  test("winsorize clips into the exact percentile range, keeps inliers") {
    // 1..100: p10 = 10.9, p90 = 90.1 (interpolated)
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val out = Stats.winsorize(df, "v", lo = 0.1, hi = 0.9)
      .select("v", "clipped").as[(Double, Double)].collect().toMap
    assert(math.abs(out(1.0) - 10.9) < 1e-9)   // below p10 → p10
    assert(math.abs(out(100.0) - 90.1) < 1e-9) // above p90 → p90
    assert(out(50.0) === 50.0)                 // inlier untouched
    assert(out.values.forall(c => c >= 10.9 - 1e-9 && c <= 90.1 + 1e-9))
  }

  test("robustScale: median-centered, MAD-scaled, null-safe, degenerate-safe") {
    val df = ((1 to 99).map(i => Some(i.toDouble)) :+ None).toDF("v")
    val out = Stats.robustScale(df, "v")
      .select($"v", $"robust_z").as[(Option[Double], Option[Double])]
      .collect().toMap
    // median 50, MAD 25: rz(50) = 0, rz(75) = 25/(1.4826*25) = 1/1.4826
    assert(math.abs(out(Some(50.0)).get) < 1e-12)
    assert(math.abs(out(Some(75.0)).get - 1.0 / 1.4826) < 1e-9)
    assert(out(None).isEmpty, "null input must stay null")
    // constant column: MAD = 0 → null, never ±Infinity
    val const = Seq.fill(10)(7.0).toDF("v")
    assert(Stats.robustScale(const, "v")
      .where($"robust_z".isNotNull).count() === 0)
    // all-null column with rows: the row count clears the n==0 guard but
    // the collected values are empty — must yield the documented null
    // column, not an ArrayIndexOutOfBounds from indexing an empty sort
    val allNull = Seq.fill(5)(Option.empty[Double]).toDF("v")
    val nz = Stats.robustScale(allNull, "v")
    assert(nz.count() === 5)
    assert(nz.where($"robust_z".isNotNull).count() === 0)
  }

  test("robustScale: distributed (ranged-reuse) path agrees with the driver path") {
    val df = ((1 to 99).map(i => Some(i.toDouble)) :+ None).toDF("v")
    // threshold 0 forces the range-partitioned plan the 100 TB case takes;
    // both paths must produce identical z-scores (same med/MAD arithmetic)
    val big = Stats.robustScale(df, "v", threshold = 0L)
      .select($"v", $"robust_z").as[(Option[Double], Option[Double])]
      .collect().toMap
    val small = Stats.robustScale(df, "v")
      .select($"v", $"robust_z").as[(Option[Double], Option[Double])]
      .collect().toMap
    assert(big === small)
    assert(math.abs(big(Some(50.0)).get) < 1e-12)
  }

  test("winsorize leaves NULL values null instead of clipping them to the floor") {
    // least/greatest skip nulls — an unguarded clip would fabricate the
    // lower percentile bound for every null input
    val df = ((1 to 100).map(i => Some(i.toDouble)) :+ None).toDF("v")
    val out = Stats.winsorize(df, "v", lo = 0.1, hi = 0.9)
    assert(out.where($"v".isNull && $"clipped".isNotNull).count() === 0)
    assert(out.where($"v".isNull).count() === 1)
    assert(out.where($"clipped".isNotNull).count() === 100)
  }

  test("merged partial stats equal the single-pass aggregate") {
    val docs = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet")
    val merged = Stats.finalizeStats(
      Stats.mergeStats(Seq("source"),
        Stats.partialStats(docs.where($"doc_id" % 3 === 0), Seq("source"), "n_chars"),
        Stats.partialStats(docs.where($"doc_id" % 3 === 1), Seq("source"), "n_chars"),
        Stats.partialStats(docs.where($"doc_id" % 3 === 2), Seq("source"), "n_chars")),
      Seq("source"))
      .orderBy("source").collect()
    val direct = docs.groupBy($"source").agg(
        count($"n_chars").as("n"), sum($"n_chars".cast("double")).as("sum"),
        avg($"n_chars").as("mean"), stddev_samp($"n_chars").as("sd"),
        min($"n_chars".cast("double")).as("min"), max($"n_chars".cast("double")).as("max"))
      .orderBy("source").collect()
    assert(merged.length === direct.length && merged.nonEmpty)
    merged.zip(direct).foreach { case (m, d) =>
      assert(m.getString(0) === d.getString(0))
      assert(m.getLong(1) === d.getLong(1))
      for (i <- 2 to 6 if !d.isNullAt(i))
        assert(math.abs(m.getDouble(i) - d.getDouble(i)) < 1e-6,
          s"source=${m.getString(0)} col=$i ${m.getDouble(i)} vs ${d.getDouble(i)}")
    }
  }

  test("mergeStatsTable: the stored state equals a single pass over all merged batches") {
    val root = java.nio.file.Files.createTempDirectory("graft-stats").toString
    val docs = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet")
    val thirds = (0 to 2).map(i => docs.where($"doc_id" % 3 === i))
    // merge three batches in sequence; group set differs per batch
    thirds.foreach { b =>
      Stats.mergeStatsTable(spark, root, "doc_stats",
        Stats.partialStats(b, Seq("source"), "n_chars"), Seq("source"))
    }
    val stored = Stats.finalizeStats(
      graft.sources.Catalog.table(spark, root, "doc_stats"), Seq("source"))
      .orderBy("source").collect()
    val direct = Stats.finalizeStats(
      Stats.partialStats(docs, Seq("source"), "n_chars"), Seq("source"))
      .orderBy("source").collect()
    assert(stored.length === direct.length && stored.nonEmpty)
    stored.zip(direct).foreach { case (s, d) =>
      assert(s.getString(0) === d.getString(0))
      assert(s.getLong(1) === d.getLong(1))
      for (i <- 2 to 6 if !d.isNullAt(i))
        assert(math.abs(s.getDouble(i) - d.getDouble(i)) < 1e-6,
          s"source=${s.getString(0)} col=$i")
    }
  }

  test("mergeStats is order-insensitive and handles degenerate groups") {
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("b", Some(5.0)),
      ("c", Option.empty[Double])).toDF("k", "v")
    val p1 = Stats.partialStats(df.where($"k" === "a"), Seq("k"), "v")
    val p2 = Stats.partialStats(df.where($"k" =!= "a"), Seq("k"), "v")
    val ab = Stats.finalizeStats(Stats.mergeStats(Seq("k"), p1, p2), Seq("k"))
      .orderBy("k").collect()
    val ba = Stats.finalizeStats(Stats.mergeStats(Seq("k"), p2, p1), Seq("k"))
      .orderBy("k").collect()
    assert(ab.map(_.toString).toSeq === ba.map(_.toString).toSeq)
    val byK = ab.map(r => r.getString(0) -> r).toMap
    // two-value group: mean 2, sample sd sqrt(2)
    assert(byK("a").getLong(1) === 2L)
    assert(math.abs(byK("a").getDouble(3) - 2.0) < 1e-12)
    assert(math.abs(byK("a").getDouble(4) - math.sqrt(2.0)) < 1e-12)
    // single value: sd null, mean = value
    assert(byK("b").getLong(1) === 1L && byK("b").isNullAt(4))
    assert(math.abs(byK("b").getDouble(3) - 5.0) < 1e-12)
    // all-null group: n 0, mean and sd null (not NaN)
    assert(byK("c").getLong(1) === 0L && byK("c").isNullAt(3) && byK("c").isNullAt(4))
  }

  test("partialHist/mergeHist: merged halves equal one pass; clamping; null drop") {
    val df = Seq(("a", Some(-5.0)), ("a", Some(0.0)), ("a", Some(9.9)),
      ("a", Some(10.0)), ("a", Some(55.0)), ("a", Some(200.0)), ("a", None),
      ("b", Some(35.0))).toDF("k", "v").withColumn("i", monotonically_increasing_id())
    def hist(d: org.apache.spark.sql.DataFrame) =
      Stats.partialHist(d, Seq("k"), "v", lo = 0.0, hi = 100.0, bins = 10)
    val merged = Stats.mergeHist(Seq("k"), bins = 10,
        hist(df.where(col("i") % 2 === 0)), hist(df.where(col("i") % 2 === 1)))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val onePass = hist(df)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(merged == onePass)
    // a: -5 clamps into bin 0 (with 0.0, 9.9); 10.0 → bin 1; 55 → bin 5;
    // 200 clamps into bin 9; the null contributes nowhere
    assert(merged("a") == Seq(3L, 1L, 0L, 0L, 0L, 1L, 0L, 0L, 0L, 1L))
    assert(merged("b") == Seq(0L, 0L, 0L, 1L, 0L, 0L, 0L, 0L, 0L, 0L))
  }

  test("mergeHist rejects a bins mismatch instead of silently nulling state") {
    // zip_with over different-length vectors yields null elements — a
    // cutpoint mismatch must raise, not corrupt the durable state
    val df = Seq(("a", Some(5.0)), ("a", Some(15.0))).toDF("k", "v")
    val ten = Stats.partialHist(df, Seq("k"), "v", lo = 0.0, hi = 100.0,
      bins = 10)
    val e = intercept[Exception] {
      Stats.mergeHist(Seq("k"), bins = 8, ten).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage}\n${msgs(t.getCause)}"
    assert(msgs(e).contains("mergeHist"), msgs(e))
  }

  test("histQuantiles: interpolation arithmetic and empty-bin-free pick") {
    // one key, 4 bins over [0,40): counts [2, 0, 2, 0] → n=4;
    // p50: target 2.0, first bin with cum>=2 is bin 0 → 0 + 10*(0 + 2/2) = 10
    // p75: target 3.0, first bin with cum>=3 is bin 2 → 10*(2 + (3-2)/2) = 25
    val state = Seq(("k", Seq(2L, 0L, 2L, 0L))).toDF("k", "__hist")
    val got = Stats.histQuantiles(state, Seq("k"),
      lo = 0.0, hi = 40.0, bins = 4, qs = Seq(0.5, 0.75)).collect().head
    assert(got.getLong(1) == 4L)
    assert(math.abs(got.getDouble(2) - 10.0) < 1e-12)
    assert(math.abs(got.getDouble(3) - 25.0) < 1e-12)
  }

  test("mergeHistTable: stored state equals one pass; partial batches touch only their groups") {
    val root = "/tmp/graft/statsspec_hist_state"
    def wipe() = {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }
      rm(new java.io.File(root))
    }
    wipe()
    val df = Seq(("a", 1.0), ("a", 3.0), ("a", 9.0), ("b", 5.0), ("b", 7.0),
      ("c", 2.0)).toDF("k", "v").withColumn("i", monotonically_increasing_id())
    def ph(d: org.apache.spark.sql.DataFrame) =
      Stats.partialHist(d, Seq("k"), "v", lo = 0.0, hi = 10.0, bins = 5)
    // batch 1: first rows; batch 2 touches only "a" and "b"; "c" must be
    // carried over untouched by the upsert
    Stats.mergeHistTable(spark, root, "hist", ph(df.where(col("i") % 2 === 0)),
      Seq("k"), bins = 5)
    Stats.mergeHistTable(spark, root, "hist", ph(df.where(col("i") % 2 === 1)),
      Seq("k"), bins = 5)
    val stored = graft.sources.Catalog.table(spark, root, "hist")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val onePass = ph(df).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(stored == onePass && stored.keySet == Set("a", "b", "c"))
    wipe()
  }

  test("cohenKappa: perfect agreement 1, independence ~0, degenerate null") {
    def k(rows: Seq[(Boolean, Boolean)]): org.apache.spark.sql.Row =
      Stats.cohenKappa(rows.toDF("a", "b"), "a", "b").collect().head
    val perfect = k(Seq((true, true), (false, false), (true, true)))
    assert(perfect.getLong(0) == 3L && perfect.getDouble(3) == 1.0)
    // balanced independence: every cell once → po 0.5, pe 0.5, kappa 0
    val indep = k(Seq((true, true), (true, false), (false, true), (false, false)))
    assert(indep.getDouble(1) == 0.5 && indep.getDouble(2) == 0.5
      && indep.getDouble(3) == 0.0)
    // both raters constant → pe 1, kappa null (not NaN/divide-by-zero)
    val degen = k(Seq((true, true), (true, true)))
    assert(degen.getDouble(2) == 1.0 && degen.isNullAt(3))
    // total disagreement with symmetric marginals → kappa -1
    val anti = k(Seq((true, false), (false, true)))
    assert(anti.getDouble(3) == -1.0)
  }
}
