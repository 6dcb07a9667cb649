package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 that is implemented has a `queries`
  * entry; SQL-expressible ones also have an `oracleSql` entry (DuckDB,
  * same parquet tables). Column names are aliased identically on both
  * sides, float aggregates are rounded (order-independence), and every
  * query carries a total ORDER BY so results are bit-deterministic.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.revenueByNation(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational core (SURVEY §2.3/§2.4/§2.5) ----
    "q_pricing_summary"   -> ((s, d) => Relational.pricingSummary(s, d)),
    "q_revenue_by_nation" -> ((s, d) => Relational.revenueByNation(s, d)),
    "q_enrich_supplier"   -> ((s, d) => Relational.enrichSupplier(s, d)),
    "q_top_order_per_cust"-> ((s, d) => Relational.topOrderPerCustomer(s, d)),
    "q_sort_limit"        -> ((s, d) => Relational.topOrders(s, d)),
    "q_union_scans"       -> ((s, d) => Relational.unionScans(s, d)),
    "q_dedup_first"       -> ((s, d) => Relational.dedupFirstEvent(s, d)),
    "q_coerce_props"      -> ((s, d) => Relational.coerceProps(s, d)),
    "q_monthly_sales"     -> ((s, d) => Relational.monthlySales(s, d)),
  )

  def oracleSql: Map[String, String] = Map(
    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 4) AS sum_qty,
         round(sum(l_extendedprice), 4) AS sum_base_price,
         round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
         round(avg(l_quantity), 6) AS avg_qty,
         round(avg(l_discount), 6) AS avg_disc,
         count(*) AS count_order
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_revenue_by_nation" ->
      """SELECT r_name, n_name,
         round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_enrich_supplier" ->
      """SELECT s_suppkey, s_name, n_name AS nation, r_name AS region,
         round(s_acctbal, 4) AS acctbal
         FROM supplier
         LEFT JOIN nation ON s_nationkey = n_nationkey
         LEFT JOIN region ON n_regionkey = r_regionkey
         ORDER BY s_suppkey""",
    "q_top_order_per_cust" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS best_price
         FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
               FROM orders)
         WHERE rn = 1 ORDER BY o_custkey""",
    "q_sort_limit" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS o_totalprice
         FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 24""",
    "q_union_scans" ->
      """SELECT event_id, user_id, event_type, batch FROM (
           SELECT event_id, user_id, event_type, 'filtered' AS batch
             FROM events WHERE event_type = 'purchase'
           UNION ALL
           SELECT event_id, user_id, event_type, 'unfiltered' AS batch
             FROM events WHERE event_type = 'signup')
         ORDER BY event_id""",
    "q_dedup_first" ->
      """SELECT user_id, event_type, event_id, round(value, 4) AS value
         FROM (SELECT user_id, event_type, event_id, value,
                 row_number() OVER (PARTITION BY user_id, event_type
                   ORDER BY ts ASC, event_id ASC) AS rn
               FROM events)
         WHERE rn = 1 ORDER BY user_id, event_type""",
    "q_coerce_props" ->
      """SELECT k, count(*) AS n FROM (
           SELECT CAST(NULLIF(regexp_extract(props, '(\d+)', 1), '') AS INT) AS k
           FROM events)
         WHERE k IS NOT NULL GROUP BY k ORDER BY k""",
    "q_monthly_sales" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         CAST(year(o_orderdate) AS INT) AS yr,
         round(sum(o_totalprice), 4) AS total, count(*) AS n_orders
         FROM orders GROUP BY 1, 2 ORDER BY 1""",
  )
}
