package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.engine.{Governance, Tables}

/** Dataset-level governance audits: k-anonymity ladder, functional-
  * dependency conformance, inclusion-dependency (FK) discovery. */
object GovernanceQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def specs: Seq[QuerySpec] = Seq(

    // l-diversity audit (the attribute-disclosure complement of
    // q_k_anonymity): distinct users per (event type, day) group at
    // l = 3 — group size protects identity, sensitive-value diversity
    // protects the attribute.
    QuerySpec("q_l_diversity", (s, dir) => {
      // day via the timezone-free epoch div (the events-tier convention
      // — to_date would shift midnight-adjacent rows under a non-UTC
      // session while DuckDB's date cast would not)
      Governance.lDiversity(
        Tables.events(s, dir).withColumn("day",
          expr("unix_micros(ts) div 86400000000")),
        Seq("event_type", "day"), "user_id", l = 3)
    }, Some(
      """WITH g AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |         COUNT(*) AS cnt,
        |         COUNT(DISTINCT user_id) AS div
        |  FROM events GROUP BY event_type, epoch_us(ts) // 86400000000)
        |SELECT COUNT(*) AS n_groups, MIN(div) AS min_diversity,
        |       CAST(SUM(CASE WHEN div < 3 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS groups_below_l,
        |       CAST(SUM(CASE WHEN div < 3 THEN cnt ELSE 0 END) AS BIGINT)
        |         AS rows_below_l,
        |       ROUND(CAST(1.0 AS DOUBLE)
        |             - CAST(SUM(CASE WHEN div < 3 THEN cnt ELSE 0 END)
        |                    AS DOUBLE)
        |               / CAST(SUM(cnt) AS DOUBLE), 8) AS diverse_frac
        |FROM g""".stripMargin)),

    // t-closeness audit (completes the privacy triad): per-returnflag
    // EMD of the quantity distribution vs the table's, ordered ground
    // metric, exact integer cumulative-difference numerators.
    QuerySpec("q_t_closeness", (s, dir) => {
      Governance.tCloseness(t(s, dir, "lineitem"), Seq("l_returnflag"),
          "l_quantity", t = 0.05)
        .orderBy("l_returnflag")
    }, Some(
      """WITH b AS (
        |  SELECT l_returnflag AS g, l_quantity AS v
        |  FROM lineitem WHERE l_quantity IS NOT NULL),
        |cnt AS (SELECT g, v, COUNT(*) AS c FROM b GROUP BY g, v),
        |dom AS (SELECT v, COUNT(*) AS gc FROM b GROUP BY v),
        |gl AS (
        |  SELECT v, SUM(gc) OVER (ORDER BY v) AS cum,
        |         COUNT(*) OVER () AS m, SUM(gc) OVER () AS n
        |  FROM dom),
        |grp AS (SELECT g, CAST(SUM(c) AS BIGINT) AS ng FROM cnt GROUP BY g),
        |grid AS (
        |  SELECT grp.g, grp.ng, gl.v, gl.cum, gl.m, gl.n,
        |         COALESCE(cnt.c, 0) AS c
        |  FROM grp CROSS JOIN gl
        |  LEFT JOIN cnt ON cnt.g = grp.g AND cnt.v = gl.v),
        |cm AS (
        |  SELECT g, ng, m, n, cum,
        |         SUM(c) OVER (PARTITION BY g ORDER BY v) AS cumg
        |  FROM grid),
        |sm AS (
        |  SELECT g, ng, m, n,
        |         SUM(ABS(CAST(cumg AS DECIMAL(19,0))
        |                 * CAST(n AS DECIMAL(19,0))
        |                 - CAST(cum AS DECIMAL(19,0))
        |                 * CAST(ng AS DECIMAL(19,0)))) AS sn
        |  FROM cm GROUP BY g, ng, m, n)
        |SELECT g AS l_returnflag, ng AS n,
        |       ROUND(CAST(sn AS DOUBLE)
        |             / (CAST(ng AS DOUBLE) * CAST(n AS DOUBLE)
        |                * CAST(m - 1 AS DOUBLE)), 8) AS emd,
        |       ROUND(CAST(sn AS DOUBLE)
        |             / (CAST(ng AS DOUBLE) * CAST(n AS DOUBLE)
        |                * CAST(m - 1 AS DOUBLE)), 8) > 0.05 AS above_t
        |FROM sm ORDER BY l_returnflag""".stripMargin)),

    // k-anonymity ladder over (nation, segment) quasi-identifiers at
    // k = 5 — one rollup pass gives every generalization level.
    QuerySpec("q_k_anonymity", (s, dir) => {
      Governance.kAnonymity(t(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"), k = 5)
    }, Some(
      """WITH g AS (
        |  SELECT CAST(GROUPING(c_nationkey, c_mktsegment) AS BIGINT)
        |           AS level,
        |         COUNT(*) AS cnt
        |  FROM customer GROUP BY ROLLUP (c_nationkey, c_mktsegment))
        |SELECT level, COUNT(*) AS n_groups, MIN(cnt) AS min_group,
        |       CAST(SUM(CASE WHEN cnt < 5 THEN cnt ELSE 0 END) AS BIGINT)
        |         AS rows_below_k,
        |       ROUND(CAST(1.0 AS DOUBLE)
        |             - CAST(SUM(CASE WHEN cnt < 5 THEN cnt ELSE 0 END)
        |                    AS DOUBLE)
        |               / CAST(SUM(cnt) AS DOUBLE), 8) AS anon_frac
        |FROM g GROUP BY level ORDER BY level""".stripMargin)),

    // FD conformance matrix: two FDs that hold (PK-derived) and two
    // that violate, with the g3 repair measure for each.
    QuerySpec("q_fd_violations", (s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      Governance.fdAudit(li, "l_orderkey", "l_shipdate")
        .unionByName(Governance.fdAudit(li, "l_partkey", "l_suppkey"))
        .unionByName(Governance.fdAudit(o, "o_orderkey", "o_orderstatus"))
        .unionByName(Governance.fdAudit(o, "o_custkey", "o_orderpriority"))
        .orderBy("lhs", "rhs")
    }, Some {
      def one(table: String, lhs: String, rhs: String) =
        s"""SELECT '$lhs' AS lhs, '$rhs' AS rhs,
           |       COUNT(*) AS n_keys,
           |       CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |         AS violating_keys,
           |       CAST(SUM(rows - max_cnt) AS BIGINT) AS g3_rows,
           |       ROUND(CAST(SUM(rows - max_cnt) AS DOUBLE)
           |             / CAST(SUM(rows) AS DOUBLE), 8) AS g3
           |FROM (
           |  SELECT a, COUNT(*) AS n_rhs, CAST(SUM(cnt) AS BIGINT) AS rows,
           |         MAX(cnt) AS max_cnt
           |  FROM (SELECT $lhs AS a, $rhs AS b, COUNT(*) AS cnt
           |        FROM $table
           |        WHERE $lhs IS NOT NULL AND $rhs IS NOT NULL
           |        GROUP BY 1, 2)
           |  GROUP BY a)""".stripMargin
      Seq(one("lineitem", "l_orderkey", "l_shipdate"),
        one("lineitem", "l_partkey", "l_suppkey"),
        one("orders", "o_orderkey", "o_orderstatus"),
        one("orders", "o_custkey", "o_orderpriority"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY lhs, rhs")
    }),

    // FK discovery screen: three true inclusion dependencies
    // (coverage 1.0) and one deliberate near-miss (customers without
    // orders).
    QuerySpec("q_inclusion_dep", (s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val p = t(s, dir, "part")
      val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      Governance.inclusionDep(li, "l_partkey", p, "p_partkey",
          "lineitem.l_partkey", "part.p_partkey")
        .unionByName(Governance.inclusionDep(o, "o_custkey", c, "c_custkey",
          "orders.o_custkey", "customer.c_custkey"))
        .unionByName(Governance.inclusionDep(c, "c_custkey", o, "o_custkey",
          "customer.c_custkey", "orders.o_custkey"))
        .unionByName(Governance.inclusionDep(su, "s_nationkey",
          n, "n_nationkey", "supplier.s_nationkey", "nation.n_nationkey"))
        .orderBy("a")
    }, Some {
      def one(ta: String, ca: String, tb: String, cb: String) =
        s"""SELECT '$ta.$ca' AS a, '$tb.$cb' AS b,
           |       (SELECT COUNT(DISTINCT $ca) FROM $ta
           |        WHERE $ca IS NOT NULL) AS n_a,
           |       COUNT(*) AS n_matched,
           |       ROUND(CAST(COUNT(*) AS DOUBLE)
           |             / CAST((SELECT COUNT(DISTINCT $ca) FROM $ta
           |                     WHERE $ca IS NOT NULL) AS DOUBLE), 8)
           |         AS coverage
           |FROM (SELECT DISTINCT CAST($ca AS VARCHAR) AS k FROM $ta
           |      WHERE $ca IS NOT NULL) x
           |WHERE k IN (SELECT CAST($cb AS VARCHAR) FROM $tb
           |            WHERE $cb IS NOT NULL)"""
          .stripMargin
      Seq(one("lineitem", "l_partkey", "part", "p_partkey"),
        one("orders", "o_custkey", "customer", "c_custkey"),
        one("customer", "c_custkey", "orders", "o_custkey"),
        one("supplier", "s_nationkey", "nation", "n_nationkey"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY a")
    })
  )
}
