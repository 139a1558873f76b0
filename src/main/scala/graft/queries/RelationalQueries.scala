package graft.queries

import org.apache.spark.sql.functions._
import QH._

/** Aggregation / scalar-function operator families (SURVEY.md §2.3, §2.5,
  * §2.7, §2.8) re-expressed over the TPC-H-ish corpus. Citations are
  * file:line in /root/reference. All plans are single-shuffle hash
  * aggregates (partial + final by Catalyst) — linear scale-out.
  */
object RelationalQueries {

  val qs: Seq[Q] = Seq(
    // A1/A2 hash agg with sums/avgs/counts — the hourly-agg idiom
    // (zetadex-transactions-helius-pipeline.py:777–793).
    Q("q01_pricing_summary",
      (s, d) => {
        t(s, d, "lineitem")
          .filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            decSum(col("l_quantity")).as("sum_qty"),
            decSum(col("l_extendedprice")).as("sum_base_price"),
            decSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
              .as("sum_disc_price"),
            decSum(col("l_extendedprice") * (lit(1) - col("l_discount"))
              * (lit(1) + col("l_tax"))).as("sum_charge"),
            decAvg(col("l_quantity")).as("avg_qty"),
            decAvg(col("l_extendedprice")).as("avg_price"),
            decAvg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
          CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
          CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
          CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
          CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sum_charge,
          CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty,
          CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_price,
          CAST(CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_disc,
          COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // A2/A3 avg/min/max incl. per-group extremes (orderbook:247, rewards:212).
    Q("q02_priority_stats",
      (s, d) =>
        t(s, d, "orders")
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).as("n_orders"),
            min(col("o_totalprice")).as("min_price"),
            max(col("o_totalprice")).as("max_price"),
            decAvg(col("o_totalprice")).as("avg_price"))
          .orderBy("o_orderpriority"),
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n_orders,
          MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
          CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_price
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // J1 fact-dim join + agg + top-k (leaderboard idiom, transactions:1656–1663).
    // spread: the test lineitem parquet is ONE row group, so without an
    // explicit repartition the scan→join→partial-agg chain runs on a
    // single core (a row group is the minimum split). At real scale the
    // scan has thousands of row groups and the exchange is redundant —
    // but it lands on the same key the aggregation shuffles on anyway.
    Q("q03_top_revenue_orders",
      (s, d) => {
        val o = t(s, d, "orders")
        val l = QH.spread(s, col("l_orderkey"))(t(s, d, "lineitem"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderkey", "o_orderdate")
          .agg(decSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some("""
        SELECT o_orderkey, o_orderdate,
          CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey LIMIT 10""")),

    // A5 countDistinct (rewards:94–96, madwars:58–59).
    Q("q04_count_distinct",
      (s, d) =>
        t(s, d, "orders")
          .groupBy("o_orderstatus")
          .agg(
            countDistinct(col("o_custkey")).as("n_cust"),
            count(lit(1)).as("n_orders"))
          .orderBy("o_orderstatus"),
      Some("""
        SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // A6 conditional aggregation (orderbook:585, transactions:1716–1717).
    Q("q05_conditional_agg",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            decSum(when(col("l_discount") > 0.05, col("l_extendedprice"))
              .otherwise(lit(0.0))).as("disc_revenue"),
            sum(when(col("l_quantity") > 25, 1).otherwise(0)).cast("long")
              .as("high_qty_cnt"))
          .orderBy("l_returnflag"),
      Some("""
        SELECT l_returnflag,
          CAST(CAST(SUM(CAST(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0.0 END AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS disc_revenue,
          CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS high_qty_cnt
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // A7 ratio-of-sums (VWAP, orderbook:495–498).
    Q("q06_vwap",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy("l_linestatus")
          .agg((decSum(col("l_extendedprice") * col("l_quantity"))
            / decSum(col("l_quantity"))).as("vwap"))
          .orderBy("l_linestatus"),
      Some("""
        SELECT l_linestatus,
          CAST(CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE)
            / CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS vwap
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // A9 median (mm-uptime-v3:121–123).
    Q("q07_median",
      (s, d) =>
        t(s, d, "events")
          .groupBy("event_type")
          .agg(median(col("value")).as("med_value"), count(lit(1)).as("n"))
          .orderBy("event_type"),
      Some("""
        SELECT event_type, MEDIAN(value) AS med_value, COUNT(*) AS n
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // A10 rollup with ALL sentinel (zetadex-serving-v2.py:623–631).
    Q("q08_rollup_all",
      (s, d) =>
        t(s, d, "lineitem")
          .rollup("l_returnflag")
          .agg(decSum(col("l_quantity")).as("sum_qty"),
            count(lit(1)).as("n"))
          .withColumn("l_returnflag", coalesce(col("l_returnflag"), lit("ALL")))
          .orderBy("l_returnflag"),
      Some("""
        SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
          CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
          COUNT(*) AS n
        FROM lineitem GROUP BY ROLLUP(l_returnflag) ORDER BY l_returnflag""")),

    // O-family completion: INTERSECT / EXCEPT (both DISTINCT-flavored,
    // Spark's .intersect/.except semantics) — q09 covers UNION
    // DISTINCT; these are the other two set operators a reference user
    // has. Both plan as aggregates over a tagged union (no join), so
    // they shuffle once on the full row as key — the same shape as
    // distinct(), and the tag column is a constant that costs nothing.
    Q("q121_set_ops",
      (s, d) => {
        val ev = t(s, d, "events")
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"))
        val e = ev.filter(col("event_type") === "error")
          .select(col("user_id"))
        p.intersect(e).withColumn("tag", lit("both"))
          .union(p.except(e).withColumn("tag", lit("purchase_only")))
          .select(col("tag"), col("user_id"))
          .orderBy("tag", "user_id")
      },
      Some("""
        SELECT 'both' AS tag, user_id FROM (
          SELECT user_id FROM events WHERE event_type = 'purchase'
          INTERSECT
          SELECT user_id FROM events WHERE event_type = 'error')
        UNION ALL
        SELECT 'purchase_only' AS tag, user_id FROM (
          SELECT user_id FROM events WHERE event_type = 'purchase'
          EXCEPT
          SELECT user_id FROM events WHERE event_type = 'error')
        ORDER BY tag, user_id""")),

    // A10 extension: full CUBE with grouping-id disambiguation — q08
    // covers ROLLUP's prefix lattice; CUBE emits all 2^k slices, and
    // grouping_id() is what lets a reader tell a real NULL key from a
    // subtotal row (the ALL sentinel covers display, the id covers
    // machine consumers). Two dims stay distinct via the id even when
    // both coalesce to 'ALL'. Map-side combined like any hash agg; the
    // expand operator multiplies rows 4× BEFORE the shuffle, which is
    // the documented Spark cost model for cube at scale (rows × 2^k).
    Q("q119_cube",
      (s, d) => {
        val o = t(s, d, "orders").join(
          t(s, d, "customer").select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        o.cube(col("o_orderpriority"), col("c_mktsegment"))
          .agg(grouping_id().as("gid"),
            count(lit(1)).as("n"),
            decSum(col("o_totalprice")).as("revenue"))
          .select(
            coalesce(col("o_orderpriority"), lit("ALL"))
              .as("o_orderpriority"),
            coalesce(col("c_mktsegment"), lit("ALL")).as("c_mktsegment"),
            col("gid"), col("n"), col("revenue"))
          .orderBy("gid", "o_orderpriority", "c_mktsegment")
      },
      Some("""
        SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
          COALESCE(c_mktsegment, 'ALL') AS c_mktsegment,
          CAST(GROUPING(o_orderpriority) * 2 + GROUPING(c_mktsegment)
            AS BIGINT) AS gid,
          COUNT(*) AS n,
          CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS VARCHAR)
            AS DOUBLE) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY CUBE(o_orderpriority, c_mktsegment)
        ORDER BY gid, o_orderpriority, c_mktsegment""")),

    // O3/O4 union + distinct (mm-uptime-v2:91–104 UNION dedup semantics).
    Q("q09_union_distinct",
      (s, d) => {
        val c = t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        val su = t(s, d, "supplier").select(col("s_nationkey").as("nationkey"))
        c.union(su).distinct().orderBy("nationkey")
      },
      Some("""
        SELECT c_nationkey AS nationkey FROM customer
        UNION SELECT s_nationkey FROM supplier ORDER BY nationkey""")),

    // §2.8 scalar-function surface: date/string/math parity row-level ops.
    Q("q10_scalar_funcs",
      (s, d) =>
        t(s, d, "orders")
          .select(
            col("o_orderkey"),
            upper(col("o_orderstatus")).as("status_u"),
            concat_ws("#", col("o_orderpriority"),
              (col("o_orderkey") % 7).cast("string")).as("pri_code"),
            year(col("o_orderdate")).as("o_year"),
            date_trunc("week", col("o_orderdate")).as("week_start"),
            least(greatest(col("o_totalprice"), lit(5000.0)), lit(200000.0))
              .as("bal_clamp"),
            sqrt(col("o_totalprice")).as("root_price"),
            abs(col("o_totalprice") - 150000.0).as("abs_diff"))
          .orderBy("o_orderkey"),
      Some("""
        SELECT o_orderkey,
          UPPER(o_orderstatus) AS status_u,
          CONCAT_WS('#', o_orderpriority, CAST(o_orderkey % 7 AS VARCHAR)) AS pri_code,
          CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
          CAST(DATE_TRUNC('week', o_orderdate) AS TIMESTAMP) AS week_start,
          LEAST(GREATEST(o_totalprice, 5000.0), 200000.0) AS bal_clamp,
          SQRT(o_totalprice) AS root_price,
          ABS(o_totalprice - 150000.0) AS abs_diff
        FROM orders ORDER BY o_orderkey"""))
  )
}
