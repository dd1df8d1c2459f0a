package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Catalog

class CatalogSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("tableName parses proj:ds.table / ds.table / bare forms") {
    assert(Catalog.tableName("proj:ds.table") === "table")
    assert(Catalog.tableName("ds.table") === "table")
    assert(Catalog.tableName("table") === "table")
  }

  test("partitioned write prunes at file listing on a partition filter") {
    val root = Files.createTempDirectory("graft-part").toString
    val df = (1L to 100L).map(i => (i, if (i % 2 == 0) "A" else "B", i * 1.5))
      .toDF("id", "seg", "v")
    Catalog.writePartitioned(df, root, "t", Seq("seg"))

    val filtered = Catalog.table(spark, root, "t").where($"seg" === "A")
    assert(filtered.count() === 50)
    // pruning happens at listing: the executed scan selects only the seg=A
    // directory (inputFiles would show the unfiltered relation)
    filtered.collect()
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val executed = filtered.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
    val scan = executed.collectLeaves().collectFirst { case s: FileSourceScanExec => s }.get
    assert(scan.metrics("numPartitions").value === 1,
      s"expected 1 hive partition read, metrics=${scan.metrics.view.mapValues(_.value).toMap}")
  }

  test("same-bucketing join plans without a shuffle exchange") {
    val left = (1L to 1000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (1L to 1000L).map(i => (i, i * 2.0)).toDF("k", "rv")
    Catalog.writeBucketed(left, "bkt_left", Seq("k"), buckets = 4)
    Catalog.writeBucketed(right, "bkt_right", Seq("k"), buckets = 4)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force the sort-merge path so the assertion targets bucketing, not
      // a broadcast that would hide the exchange anyway
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      assert(joined.count() === 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  test("compact rewrites a many-file table into few files, data intact") {
    val root = Files.createTempDirectory("graft-compact").toString
    val df = (1L to 1000L).toDF("id")
    Catalog.writeTruncate(df.repartition(20), root, "frag")
    def nFiles = new java.io.File(s"$root/frag.parquet").listFiles
      .count(f => f.getName.endsWith(".parquet"))
    assert(nFiles === 20)
    Catalog.compact(spark, root, "frag")
    assert(nFiles === 1) // 20 tiny files ≪ 128 MB target → one output file
    val back = Catalog.table(spark, root, "frag")
    assert(back.count() === 1000 && back.agg(sum("id")).as[Long].head() === 500500)
  }

  test("fanOut feeds multiple sinks from one cached source") {
    val root = Files.createTempDirectory("graft-fan").toString
    val src = (1L to 10L).toDF("id")
    Catalog.fanOut(src, cache = true)(
      d => Catalog.writeTruncate(d, root, "raw"),
      d => Catalog.writeTruncate(d.withColumn("id2", $"id" * 2), root, "derived"))
    assert(Catalog.table(spark, root, "raw").count() === 10)
    assert(Catalog.table(spark, root, "derived").agg(sum("id2")).as[Long].head() === 110)
  }
}
