package graft

import graft.model.Triples
import graft.query._
import graft.sources.Tpch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query routes through the triple-store engine (relational parquet →
  * triples → match/pull/datalog → flat DataFrame), and every key has an
  * equivalent ANSI-SQL oracle over the RAW tables in `oracleSql` — the
  * round-trip through the EAV model must reproduce exactly what DuckDB
  * computes relationally (SURVEY.md §5 t2 gate).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exercises W2+W3 (ingest), Q2 (match), Q7a (pull) in one round-trip. */
  def entry(spark: SparkSession): DataFrame =
    q01(spark, "/root/testdata/sf0.001")

  private def q01(s: SparkSession, dir: String): DataFrame =
    Tpch.store(s, dir, "customer")
      .pullMany(
        Seq("customer:mktsegment" -> MEq("BUILDING")),
        Seq(PAttr("customer:custkey"), PAttr("customer:name"),
          PAttr("customer:acctbal")))
      .drop("e")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1/Q2/Q7a: single-attr equality match + flat pull
    "q01_match_pull" -> ((s, dir) => q01(s, dir)),

    // Q2: conjunctive match (two attrs, intersection semantics)
    "q02_match_conj" -> ((s, dir) =>
      Tpch.store(s, dir, "orders")
        .pullMany(
          Seq("orders:orderstatus" -> MEq("F"),
            "orders:orderpriority" -> MEq("1-URGENT")),
          Seq(PAttr("orders:orderkey"), PAttr("orders:totalprice")))
        .drop("e")),

    // Q1: IN-list lookup (tripl.py:596-602 list-value semantics)
    "q03_match_in" -> ((s, dir) =>
      Tpch.store(s, dir, "customer")
        .pullMany(
          Seq("customer:mktsegment" -> MIn(Seq("BUILDING", "MACHINERY"))),
          Seq(PAttr("customer:custkey"), PAttr("customer:mktsegment")))
        .drop("e")),

    // Q2 nested sub-pattern: 2-level graph semi-join through ref attrs
    "q04_match_nested" -> ((s, dir) =>
      Tpch.store(s, dir, "customer", "nation", "region")
        .pullMany(
          Seq("customer:nation" -> MSub(Seq(
            "nation:region" -> MSub(Seq("region:name" -> MEq("ASIA")))))),
          Seq(PAttr("customer:custkey"), PAttr("customer:name")))
        .drop("e")),

    // Q7c reverse lookup: who points at me (customers per nation)
    "q05_rev_lookup" -> ((s, dir) =>
      Tpch.store(s, dir, "customer", "nation")
        .pullMany(
          Seq(Triples.TypeAttr -> MEq("nation")),
          Seq(PAttr("nation:name"), PRevIds("customer:nation", Some("custs"))))
        .select(col("name"),
          coalesce(size(col("custs")), lit(0)).cast("long").as("n_customers"))),

    // Q7b wildcard pull: dynamic attr map (proves eid convention too)
    "q06_pull_wildcard" -> ((s, dir) =>
      Tpch.store(s, dir, "region")
        .pullMany(Seq(Triples.TypeAttr -> MEq("region")), Seq(PWild))
        .select(col("e"),
          size(map_keys(col("attrs"))).cast("long").as("n_attrs"))),

    // W1 cardinality-one upsert: re-assert at txId=1 → latest wins
    "q07_upsert" -> ((s, dir) => {
      val ts = Tpch.store(s, dir, "customer")
      val updated = ts.triples
        .where(col("a") === "customer:acctbal")
        .withColumn("vdbl", col("vdbl") + lit(100.0))
        .withColumn("txId", lit(1L))
      ts.assertTriples(updated)
        .pullMany(Seq(Triples.TypeAttr -> MEq("customer")),
          Seq(PAttr("customer:custkey"), PAttr("customer:acctbal")))
        .drop("e")
    }),

    // W6 retraction (clean semantics; broken in reference, SURVEY §1.4)
    "q08_retract" -> ((s, dir) =>
      Tpch.store(s, dir, "customer")
        .retractWhere(col("a") === "customer:acctbal")
        .pullMany(Seq(Triples.TypeAttr -> MEq("customer")),
          Seq(PAttr("customer:custkey"), PAttr("customer:acctbal")))
        .drop("e")),

    // W5 store merge (graph union) + nested match across the merged graph
    "q09_store_merge" -> ((s, dir) => {
      val merged = Tpch.store(s, dir, "customer")
        .merge(Tpch.store(s, dir, "nation"))
      merged.pullMany(
        Seq("customer:nation" -> MSub(Seq("nation:name" -> MEq("NATION_7")))),
        Seq(PAttr("customer:custkey")))
        .drop("e")
    }),

    // Q10 Datalog-lite: triple-pattern self-joins with shared variables
    "q10_datalog" -> ((s, dir) =>
      Tpch.store(s, dir, "customer", "nation")
        .datalog(
          find = Seq("?cname", "?nname"),
          where = Seq(
            ("?c", "customer:name", "?cname"),
            ("?c", "customer:nation", "?n"),
            ("?n", "nation:name", "?nname")))
        .toDF("cname", "nname")),

    // §2.6 relational agg over pull output (TPC-H Q1-lite via triples)
    "q11_agg" -> ((s, dir) =>
      Tpch.store(s, dir, "lineitem")
        .pullMany(Seq(Triples.TypeAttr -> MEq("lineitem")),
          Seq(PAttr("lineitem:returnflag"), PAttr("lineitem:linestatus"),
            PAttr("lineitem:quantity"), PAttr("lineitem:extendedprice")))
        .groupBy(col("returnflag"), col("linestatus"))
        .agg(sum(col("quantity")).as("sum_qty"),
          round(sum(col("extendedprice")), 2).as("sum_price"),
          count(lit(1)).as("n"))),

    // Q8 pull_many sort + limit (lowers to TakeOrderedAndProject)
    "q12_sort_limit" -> ((s, dir) =>
      Tpch.store(s, dir, "customer")
        .pullMany(Seq(Triples.TypeAttr -> MEq("customer")),
          Seq(PAttr("customer:custkey"), PAttr("customer:name"),
            PAttr("customer:acctbal")))
        .orderBy(col("acctbal").desc, col("custkey").asc)
        .limit(10)
        .drop("e")),

    // Q7e '...' recursion: BFS fixpoint over ref edges, depth histogram
    "q13_reachable" -> ((s, dir) => {
      val ts = Tpch.store(s, dir, "customer", "nation", "region")
      val roots = ts.matchEntities(Seq(Triples.TypeAttr -> MEq("customer")))
      ts.reachable(roots, Some(Seq("customer:nation", "nation:region")))
        .groupBy(col("depth")).agg(count(lit(1)).as("n"))
        .orderBy(col("depth"))
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_match_pull" ->
      """SELECT c_custkey AS custkey, c_name AS name, c_acctbal AS acctbal
        |FROM customer WHERE c_mktsegment = 'BUILDING'""".stripMargin,
    "q02_match_conj" ->
      """SELECT o_orderkey AS orderkey, o_totalprice AS totalprice
        |FROM orders WHERE o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'""".stripMargin,
    "q03_match_in" ->
      """SELECT c_custkey AS custkey, c_mktsegment AS mktsegment
        |FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')""".stripMargin,
    "q04_match_nested" ->
      """SELECT c_custkey AS custkey, c_name AS name
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'""".stripMargin,
    "q05_rev_lookup" ->
      """SELECT n_name AS name, count(c_custkey) AS n_customers
        |FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q06_pull_wildcard" ->
      """SELECT sha256('region:' || CAST(r_regionkey AS VARCHAR)) AS e,
        |       CAST(4 AS BIGINT) AS n_attrs
        |FROM region""".stripMargin,
    "q07_upsert" ->
      """SELECT c_custkey AS custkey, c_acctbal + 100.0 AS acctbal
        |FROM customer""".stripMargin,
    "q08_retract" ->
      """SELECT c_custkey AS custkey, CAST(NULL AS DOUBLE) AS acctbal
        |FROM customer""".stripMargin,
    "q09_store_merge" ->
      """SELECT c_custkey AS custkey
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE n_name = 'NATION_7'""".stripMargin,
    "q10_datalog" ->
      """SELECT DISTINCT c_name AS cname, n_name AS nname
        |FROM customer JOIN nation ON c_nationkey = n_nationkey""".stripMargin,
    "q11_agg" ->
      """SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
        |       sum(l_quantity) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_price,
        |       count(*) AS n
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q12_sort_limit" ->
      """SELECT c_custkey AS custkey, c_name AS name, c_acctbal AS acctbal
        |FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 10""".stripMargin,
    "q13_reachable" ->
      """SELECT 0 AS depth, count(*) AS n FROM customer
        |UNION ALL SELECT 1 AS depth, count(*) AS n FROM customer
        |UNION ALL SELECT 2 AS depth, count(*) AS n FROM customer""".stripMargin,
  )
}
