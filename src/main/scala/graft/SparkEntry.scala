package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{RelOps, Transpose}
import graft.pipelines.Pipelines
import graft.sources.Catalog

/** Driver contract — one `queries` entry (+ DuckDB `oracleSql` where
  * SQL-expressible) per implemented operator from SURVEY.md §2 and per
  * LLM-pipeline extension operator.
  *
  * Determinism rules: every query ends in a total `orderBy` and every
  * floating aggregate is `round`ed identically on both sides, so the
  * driver's row/schema/hash compare is stable regardless of partition
  * scheduling. (Benchmarks use their own unordered variants — see Bench.)
  */
object SparkEntry {

  /** Flagship query on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q1Agg(spark, "/root/testdata/sf0.001")

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  // ---- headline pricing-summary agg (A1/A2/A8: partial+final hash agg) ----
  private def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> ((s, dir) => q1Agg(s, dir)),

    // S1: CSV source round-trip (header + declared schema; reference
    // `csv_to_bq.py:41-42`). Writes the dimension out as CSV and reads it
    // back, proving parse fidelity against the parquet oracle.
    "s1_csv_roundtrip" -> ((s, dir) => {
      val nation = t(s, dir, "nation")
      val p = s"/tmp/graft/s1_csv_${dir.replaceAll("[^0-9.]", "")}"
      Catalog.writeCsv(nation, p)
      Catalog.csv(s, p, nation.schema).orderBy(col("n_nationkey"))
    }),

    // S3: in-memory literal source (`beam.Create`), fixture F1.
    "s3_literal_rows" -> ((s, _) => {
      import s.implicits._
      Seq((123L, "AAA", 101.44), (123L, "BBB", 345.44), (1234L, "AAA", 458.44))
        .toDF("ID", "CLASS", "SALES")
        .orderBy(col("ID"), col("CLASS"))
    }),

    // P2: name-binding projection/rename.
    "p2_projection" -> ((s, dir) =>
      t(s, dir, "customer")
        .select(col("c_custkey").as("cust_id"), col("c_name").as("name"),
          col("c_acctbal").as("acctbal"))
        .orderBy(col("cust_id"))),

    // P4: timestamp arithmetic — per-line shipping delay in seconds.
    "p4_duration" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o  = t(s, dir, "orders")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (unix_timestamp(col("l_shipdate")) - unix_timestamp(col("o_orderdate")))
            .as("ship_delay_sec"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // P5: row → CSV string (`",".join`, `pipeline.py:63`).
    "p5_csv_format" -> ((s, dir) =>
      RelOps.toCsvLine(t(s, dir, "region"), Seq("r_regionkey", "r_name"))
        .orderBy(col("line"))),

    // P8: case-insensitive equality filter (`Flask_app/main.py:25-29`).
    "p8_ci_filter" -> ((s, dir) =>
      RelOps.ciEquals(t(s, dir, "customer"), "c_mktsegment", "BuIlDiNg")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))),

    // P9: point lookup with miss-defaults (`Fast_API/main.py:25-36`).
    "p9_point_lookup" -> ((s, dir) => {
      import s.implicits._
      val dim = t(s, dir, "nation")
        .select(lower(col("n_name")).as("qname"), col("n_name"),
          col("n_nationkey"), col("n_regionkey"))
      val keys = Seq("algeria", "argentina", "nowhere").toDF("qname")
      RelOps.pointLookup(keys, dim, "qname",
        Map("n_name" -> lit("Not found"), "n_nationkey" -> lit(-1), "n_regionkey" -> lit(-1)))
        .orderBy(col("qname"))
    }),

    // P10: arithmetic map (`AddTen` draft).
    "p10_arith_map" -> ((s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"), round(col("p_retailprice") + 10, 2).as("adj_price"))
        .orderBy(col("p_partkey"))),

    // J1: broadcast hash lookup join (side-input dict join, `pipeline.py:54-61`).
    "j1_broadcast_lookup" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      RelOps.broadcastLookup(
        sup.withColumnRenamed("s_nationkey", "n_nationkey"), nat, Seq("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"))
        .orderBy(col("s_suppkey"))
    }),

    // J2 + A1: NYC pipeline shape — count per key, left-enrich with dim.
    "j2_count_enrich" -> ((s, dir) => {
      val counts = RelOps.countPerKey(
        t(s, dir, "customer").withColumnRenamed("c_nationkey", "n_nationkey"),
        Seq("n_nationkey"), as = "count_listings")
      RelOps.enrich(counts, t(s, dir, "nation"), Seq("n_nationkey"))
        .select(col("n_nationkey"), col("n_name"), col("count_listings"))
        .orderBy(col("n_nationkey"))
    }),

    // A2: mean per key.
    "a2_mean_per_key" -> ((s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(round(avg(col("c_acctbal")), 4).as("avg_acctbal"))
        .orderBy(col("c_mktsegment"))),

    // A4: within-group sorted distinct (UniqueList).
    "a4_distinct_per_key" -> ((s, dir) => {
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      RelOps.distinctPerKey(
        nat.withColumnRenamed("n_regionkey", "r_regionkey")
          .join(broadcast(reg), Seq("r_regionkey")),
        Seq("r_name"), "n_name", as = "nations_arr")
        .select(col("r_name"), array_join(col("nations_arr"), ",").as("nations"))
        .orderBy(col("r_name"))
    }),

    // A5: global collect-to-list (schema-branch style; tiny by construction).
    "a5_global_collect" -> ((s, dir) =>
      t(s, dir, "orders")
        .agg(array_join(sort_array(collect_set(col("o_orderpriority"))), "|").as("priorities"))),

    // A6: dynamic transpose (flagship) — single key, single value.
    "a6_transpose" -> ((s, dir) => {
      val base = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"))
      Transpose(base, Seq("l_returnflag"), "l_linestatus", Seq("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // A6 multi-value: `{pivotValue}_{valueField}` naming across 2 value cols.
    "a6_transpose_multi" -> ((s, dir) => {
      val base = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"))
      Transpose(base, Seq("l_returnflag"), "l_linestatus", Seq("sum_qty", "sum_price"))
        .orderBy(col("l_returnflag"))
    }),

    // A7: distinct.
    "a7_distinct" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // U1: union of branches (Flatten).
    "u1_union" -> ((s, dir) => {
      val r = t(s, dir, "region").select(col("r_name").as("name"), lit("region").as("src"))
      val n = t(s, dir, "nation").select(col("n_name").as("name"), lit("nation").as("src"))
      RelOps.union(Seq(r, n)).orderBy(col("src"), col("name"))
    }),

    // K3: overwrite sink round-trip.
    "k3_overwrite_roundtrip" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
      val p = s"/tmp/graft/k3_parquet_${dir.replaceAll("[^0-9.]", "")}"
      sup.write.mode("overwrite").parquet(p)
      s.read.parquet(p).orderBy(col("s_suppkey"))
    }),

    // §3.1 pipeline shape on testdata: session duration per user →
    // broadcast-join a dimension → mean per group (weblog-by-country analog).
    "pipeline_weblog" -> ((s, dir) => {
      val ev = Catalog.events(s, dir)
      val nat = t(s, dir, "nation")
      val durations = ev.groupBy(col("user_id"))
        .agg((unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
          .cast("double").as("duration"))
        .withColumn("n_nationkey", (col("user_id") % 25).cast("int"))
      RelOps.broadcastLookup(durations, nat, Seq("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(avg(col("duration")), 2).as("time_duration"))
        .orderBy(col("n_name"))
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "s1_csv_roundtrip" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "s3_literal_rows" ->
      """SELECT * FROM (VALUES (CAST(123 AS BIGINT), 'AAA', CAST(101.44 AS DOUBLE)),
        | (123, 'BBB', 345.44), (1234, 'AAA', 458.44)) AS t(ID, CLASS, SALES)
        |ORDER BY ID, CLASS""".stripMargin,
    "p2_projection" ->
      """SELECT c_custkey AS cust_id, c_name AS name, c_acctbal AS acctbal
        |FROM customer ORDER BY cust_id""".stripMargin,
    "p4_duration" ->
      """SELECT l_orderkey, l_linenumber,
        |  date_diff('second', o_orderdate, l_shipdate) AS ship_delay_sec
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "p5_csv_format" ->
      """SELECT CAST(r_regionkey AS VARCHAR) || ',' || r_name AS line
        |FROM region ORDER BY line""".stripMargin,
    "p8_ci_filter" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE lower(c_mktsegment) = 'building' ORDER BY c_custkey""".stripMargin,
    "p9_point_lookup" ->
      """WITH k(qname) AS (VALUES ('algeria'), ('argentina'), ('nowhere'))
        |SELECT k.qname, coalesce(n_name, 'Not found') AS n_name,
        |  coalesce(n_nationkey, -1) AS n_nationkey,
        |  coalesce(n_regionkey, -1) AS n_regionkey
        |FROM k LEFT JOIN nation ON lower(n_name) = k.qname
        |ORDER BY qname""".stripMargin,
    "p10_arith_map" ->
      """SELECT p_partkey, round(p_retailprice + 10, 2) AS adj_price
        |FROM part ORDER BY p_partkey""".stripMargin,
    "j1_broadcast_lookup" ->
      """SELECT s_suppkey, s_name, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY s_suppkey""".stripMargin,
    "j2_count_enrich" ->
      """SELECT c_nationkey AS n_nationkey, n_name, count(*) AS count_listings
        |FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY c_nationkey, n_name ORDER BY n_nationkey""".stripMargin,
    "a2_mean_per_key" ->
      """SELECT c_mktsegment, round(avg(c_acctbal), 4) AS avg_acctbal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "a4_distinct_per_key" ->
      """SELECT r_name, string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "a5_global_collect" ->
      """SELECT string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority)
        |  AS priorities FROM orders""".stripMargin,
    "a6_transpose" ->
      """WITH base AS (
        |  SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag,
        |  max(CASE WHEN l_linestatus = 'F' THEN sum_qty END) AS F_sum_qty,
        |  max(CASE WHEN l_linestatus = 'O' THEN sum_qty END) AS O_sum_qty
        |FROM base GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a6_transpose_multi" ->
      """WITH base AS (
        |  SELECT l_returnflag, l_linestatus,
        |    round(sum(l_quantity), 2) AS sum_qty,
        |    round(sum(l_extendedprice), 2) AS sum_price
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag,
        |  max(CASE WHEN l_linestatus = 'F' THEN sum_qty END) AS F_sum_qty,
        |  max(CASE WHEN l_linestatus = 'F' THEN sum_price END) AS F_sum_price,
        |  max(CASE WHEN l_linestatus = 'O' THEN sum_qty END) AS O_sum_qty,
        |  max(CASE WHEN l_linestatus = 'O' THEN sum_price END) AS O_sum_price
        |FROM base GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a7_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "u1_union" ->
      """SELECT name, src FROM (
        |  SELECT r_name AS name, 'region' AS src FROM region
        |  UNION ALL
        |  SELECT n_name AS name, 'nation' AS src FROM nation)
        |ORDER BY src, name""".stripMargin,
    "k3_overwrite_roundtrip" ->
      "SELECT * FROM supplier ORDER BY s_suppkey",
    "pipeline_weblog" ->
      """WITH durations AS (
        |  SELECT user_id,
        |    date_diff('second', min(ts), max(ts)) AS duration,
        |    CAST(user_id % 25 AS INTEGER) AS n_nationkey
        |  FROM events GROUP BY user_id)
        |SELECT n_name, round(avg(duration), 2) AS time_duration
        |FROM durations JOIN nation USING (n_nationkey)
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
  )
}
