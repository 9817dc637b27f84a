package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2; entries with
  * a DuckDB-expressible oracle appear in `oracleSql` (column names
  * aligned on both sides), the rest are rows-only checks backed by
  * Scala oracles in the test suite.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TokenEngine.extractFlat(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational recasts (SURVEY §2.4-2.8) — DuckDB-checked
    "q1_agg" -> (Relational.q1Agg _),
    "q_join_agg" -> (Relational.qJoinAgg _),
    "q_broadcast_join" -> (Relational.qBroadcastJoin _),
    "q_semi_join" -> (Relational.qSemiJoin _),
    "q_anti_join" -> (Relational.qAntiJoin _),
    "q_window_topk" -> (Relational.qWindowTopk _),
    "q_window_running" -> (Relational.qWindowRunning _),
    "q_set_ops" -> (Relational.qSetOps _),
    "q_string_funcs" -> (Relational.qStringFuncs _),
    "q_rollup" -> (Relational.qRollup _),
    "q_tumbling" -> (Relational.qTumbling _),
    "q_sliding" -> (Relational.qSliding _),
    "q_session" -> (Relational.qSessionWindow _),
    "q_distinct" -> (Relational.qDistinct _),
    // token-domain engine (north_star pipeline, batch form) — Scala-oracle-checked
    "extract_flat" -> (TokenEngine.extractFlat _),
    "source_stats" -> (TokenEngine.sourceStats _),
    "token_pattern" -> (TokenEngine.tokenPattern _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        |  SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
        |  SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_join_agg" ->
      """SELECT n_name, COUNT(*) AS n_orders,
        |  SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total_price
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_broadcast_join" ->
      """SELECT p_brand, COUNT(*) AS n_items,
        |  SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_window_topk" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice, rnk
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        ROW_NUMBER() OVER (PARTITION BY o_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |      FROM orders) t
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,
    "q_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
        |FROM lineitem WHERE l_suppkey <= 10
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "q_set_ops" ->
      """WITH a AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
        |     b AS (SELECT o_custkey FROM orders WHERE o_totalprice > 300000),
        |     u AS (SELECT DISTINCT o_custkey, 'union' AS op FROM (SELECT * FROM a UNION SELECT * FROM b)),
        |     i AS (SELECT o_custkey, 'intersect' AS op FROM (SELECT * FROM a INTERSECT SELECT * FROM b)),
        |     e AS (SELECT o_custkey, 'except' AS op FROM (SELECT * FROM a EXCEPT SELECT * FROM b))
        |SELECT op, COUNT(*) AS n FROM (
        |  SELECT * FROM u UNION ALL SELECT * FROM i UNION ALL SELECT * FROM e)
        |GROUP BY op ORDER BY op""".stripMargin,
    "q_string_funcs" ->
      """SELECT p_partkey,
        |  lower(trim(p_name)) AS name_lower,
        |  upper(p_brand) AS brand_upper,
        |  CAST(length(p_name) AS INT) AS name_len
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q_tumbling" ->
      """SELECT CAST(FLOOR(EPOCH(ts)/3600)*3600000 AS BIGINT) AS w_start,
        |  event_type, COUNT(*) AS n,
        |  SUM(CAST(value AS DECIMAL(18,2))) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_sliding" ->
      """SELECT CAST(FLOOR(EPOCH(ts)/1800)*1800000 - k.k AS BIGINT) AS w_start,
        |  event_type, COUNT(*) AS n,
        |  SUM(CAST(value AS DECIMAL(18,2))) AS total_value
        |FROM events CROSS JOIN (VALUES (0), (1800000)) k(k)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_session" ->
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
        |           OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sessions AS (
        |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM marked)
        |SELECT user_id, EPOCH_MS(MIN(ts)) AS sess_start,
        |  EPOCH_MS(MAX(ts)) + 1800000 AS sess_end, COUNT(*) AS n,
        |  SUM(CAST(value AS DECIMAL(18,2))) AS total_value
        |FROM sessions GROUP BY user_id, sess_id
        |ORDER BY user_id, sess_start""".stripMargin,
    "q_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
        |  COUNT(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
