package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Core relational operator coverage (SURVEY.md §2.3-§2.9) with DuckDB
  * oracle SQL for the driver's correctness gate.
  *
  * Cross-engine determinism rules used throughout (BASELINE.md caveats):
  *  - Money/measure sums go through DECIMAL so both engines do exact
  *    arithmetic, then surface as DOUBLE (identical IEEE value) — a raw
  *    double sum differs between engines in summation order.
  *  - Averages are decimal-sum ÷ count, evaluated in double on both
  *    sides with the same expression shape.
  *  - DuckDB `sum(BIGINT)` returns HUGEINT and `count(*)`'s sum rules
  *    differ — integer sums are CAST AS BIGINT in the oracle.
  *  - Every query orders by a non-null unique key so row order is
  *    deterministic on both engines.
  *  - Timestamp columns are CAST to µs TIMESTAMP in the oracle (parquet
  *    ms/ns physical types surface as TIMESTAMP_MS/NS in DuckDB).
  */
object QueriesCore {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  /** exact decimal sum of a 2-dp money column, surfaced as double */
  private def moneySum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.5 aggregation: GROUP BY + agg function battery (TPC-H Q1 shape)
    "q_agg_pricing" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity").as("sum_qty"),
          moneySum($"l_extendedprice").as("sum_base_price"),
          sum(($"l_extendedprice".cast(DecimalType(18, 2)) *
               (lit(1) - $"l_discount".cast(DecimalType(18, 2)))))
            .cast(DoubleType).as("sum_disc_price"),
          (sum($"l_discount".cast(DecimalType(18, 2))).cast(DoubleType) /
             count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // ---- §2.3 projection + filter pushdown (row-level, exact values)
    "q_filter_project" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_quantity" > 45 && $"l_discount" <= 0.05)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
        .orderBy($"l_orderkey", $"l_linenumber")
    },

    // ---- §2.4 multi-way join with broadcast dims (TPC-H Q5 shape)
    "q_join_revenue_by_nation" -> { (s, dir) =>
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      li.join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(c), $"o_custkey" === $"c_custkey")
        .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(
          sum(($"l_extendedprice".cast(DecimalType(18, 2)) *
               (lit(1) - $"l_discount".cast(DecimalType(18, 2)))))
            .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"r_name", $"n_name")
    },

    // ---- TPC-H Q5 analog (r10): the six-table star with the
    // supplier⋈customer NATION CORRELATION (local-supplier revenue) —
    // dims broadcast, the fact table never shuffles for the dim joins;
    // decimal-exact revenue so the oracle replays bit-for-bit
    "q_tpch_q5" -> { (s, dir) =>
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      li.join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(su), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(c),
          $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .filter($"r_name" === "ASIA" &&
          $"o_orderdate" >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          $"o_orderdate" < lit("1998-01-01 00:00:00").cast("timestamp"))
        .groupBy($"n_name")
        .agg(sum(($"l_extendedprice".cast(DecimalType(18, 2)) *
               (lit(1) - $"l_discount".cast(DecimalType(18, 2)))))
            .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"revenue".desc, $"n_name")
    },

    // ---- TPC-H Q14 analog (r10): promo revenue share — lineitem ⋈
    // part (dim broadcast) with a ship-date window, conditional
    // decimal sums, one-division ratio
    "q_tpch_q14" -> { (s, dir) =>
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      val rev = ($"l_extendedprice".cast(DecimalType(18, 2)) *
        (lit(1) - $"l_discount".cast(DecimalType(18, 2))))
      li.join(broadcast(p), $"l_partkey" === $"p_partkey")
        .filter($"l_shipdate" >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          $"l_shipdate" < lit("1997-01-01 00:00:00").cast("timestamp"))
        .agg(
          round(lit(100.0) *
            sum(when($"p_type" === "PROMO", rev).otherwise(lit(0))).cast(DoubleType) /
            sum(rev).cast(DoubleType), 6).as("promo_share"),
          count(lit(1)).as("n_items"))
    },

    // ---- §2.4 left join + null handling
    "q_join_left_order_counts" -> { (s, dir) =>
      import s.implicits._
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, $"c_custkey" === $"o_custkey", "left")
        .groupBy($"c_custkey", $"c_name")
        .agg(count($"o_orderkey").as("n_orders"),
             coalesce(moneySum($"o_totalprice"), lit(0.0)).as("total_spent"))
        .orderBy($"c_custkey")
    },

    // ---- §2.4 semi / anti joins
    "q_semi_join" -> { (s, dir) =>
      import s.implicits._
      val o = t(s, dir, "orders")
      val big = t(s, dir, "lineitem").filter($"l_quantity" >= 48)
      o.join(big, $"o_orderkey" === $"l_orderkey", "left_semi")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_orderkey")
    },
    "q_anti_join" -> { (s, dir) =>
      import s.implicits._
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o.filter($"o_totalprice" > 200000), $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
        .orderBy($"c_custkey")
    },

    // ---- §2.6 window functions: rank per partition (top-3 orders / customer)
    "q_window_topk_per_cust" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      t(s, dir, "orders")
        .withColumn("rk", row_number().over(w).cast(LongType))
        .filter($"rk" <= 3)
        .select($"o_custkey", $"rk", $"o_orderkey", $"o_totalprice")
        .orderBy($"o_custkey", $"rk")
    },

    // ---- §2.6 window: running sum + lag over event time
    "q_window_running" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"event_id")
      t(s, dir, "events")
        .withColumn("running_value",
          sum($"value".cast(DecimalType(18, 6))).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast(DoubleType))
        .withColumn("prev_type", lag($"event_type", 1).over(w))
        .select($"user_id", $"event_id", $"running_value", $"prev_type")
        .orderBy($"user_id", $"event_id")
    },

    // ---- §2.7 ORDER BY / LIMIT / OFFSET (top-K with deterministic tiebreak)
    "q_topk_orders" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "orders")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(100)
        .select($"o_orderkey", $"o_totalprice")
    },
    "q_offset_limit" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "orders")
        .orderBy($"o_orderkey")
        .offset(50).limit(25)
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus")
    },

    // ---- §2.8 set operations
    "q_set_ops" -> { (s, dir) =>
      import s.implicits._
      val custNations = t(s, dir, "customer").select($"c_nationkey".as("nk"))
      val suppNations = t(s, dir, "supplier").select($"s_nationkey".as("nk"))
      custNations.intersect(suppNations)
        .union(custNations.except(suppNations).withColumn("nk", $"nk" + 1000))
        .distinct()
        .orderBy($"nk")
    },

    // ---- §2.5 DISTINCT + countDistinct + approx sketch sanity
    "q_distinct_counts" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "lineitem")
        .agg(
          countDistinct($"l_orderkey").as("n_orders"),
          countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_returnflag", $"l_linestatus").as("n_flag_status"))
    },

    // ---- §2.5 DISTINCT ON (JSON-DSL distinct_on semantics: latest order per cust)
    "q_distinct_on" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
      t(s, dir, "orders")
        .withColumn("__rn", row_number().over(w))
        .filter($"__rn" === 1).drop("__rn")
        .select($"o_custkey", $"o_orderkey", $"o_totalprice")
        .orderBy($"o_custkey")
    },

    // ---- §2.5 GROUPING SETS (rollup)
    "q_rollup" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity").as("sum_qty"), count(lit(1)).as("n"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    },

    // ---- §2.9 scalar function battery (string/math/datetime)
    "q_scalar_funcs" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "orders")
        .select(
          $"o_orderkey",
          upper($"o_orderstatus").as("status_u"),
          substring($"o_orderpriority", 1, 1).as("prio_code"),
          length($"o_orderpriority").as("prio_len"),
          concat($"o_orderstatus", lit("/"), $"o_orderpriority").as("combo"),
          year($"o_orderdate").as("y"),
          month($"o_orderdate").as("m"),
          dayofmonth($"o_orderdate").as("d"),
          ($"o_orderkey" % 7).as("key_mod"),
          abs($"o_totalprice" * -1).as("abs_price"),
          round($"o_totalprice" / 1000, 1).as("price_k"))
        .orderBy($"o_orderkey")
    },

    // ---- §2.9 conditional: CASE WHEN + coalesce-label pattern
    "q_case_when" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "orders")
        .select(
          $"o_orderkey",
          when($"o_totalprice" > 300000, "high")
            .when($"o_totalprice" > 100000, "mid")
            .otherwise("low").as("bucket"),
          when($"o_orderstatus" === "O", $"o_totalprice").as("open_price"))
        .orderBy($"o_orderkey")
    },

    // ---- §2.9 try_arrow_cast semantics (NULL on failure)
    "q_try_cast" -> { (s, dir) =>
      import s.implicits._
      graft.GraftSession.configure(s)
      t(s, dir, "orders")
        .select(
          $"o_orderkey",
          expr("try_arrow_cast(substring(o_orderpriority, 1, 1), 'Int64')").as("prio_num"),
          expr("try_arrow_cast(o_orderstatus, 'Int64')").as("status_num"))
        .orderBy($"o_orderkey")
    },

    // ---- events: ns-timestamp normalization + date_trunc time windows
    "q_events_daily" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "events")
        .groupBy(date_trunc("day", $"ts").as("day"), $"event_type")
        .agg(count(lit(1)).as("n"),
             sum($"value".cast(DecimalType(18, 6))).cast(DoubleType).as("total_value"))
        .orderBy($"day", $"event_type")
    },

    // ---- ns-precision bridge: ingest clients hand the engine raw
    // epoch-ns Longs (the reference's native time unit); the registered
    // SQL surface turns them back into engine µs timestamps without
    // precision surprises. The gate derives the ns Longs from the table
    // (whatever physical flavor the generator wrote — see
    // [[graft.Tables.normalize]]) so the bridge round-trip is exercised
    // end-to-end; the sub-µs remainder path (ns_submicros, floor
    // semantics for pre-epoch instants) is spec-pinned because DuckDB's
    // parquet scan truncates ns and cannot see it (SURVEY §7.3 item 4)
    "q_ns_timestamps" -> { (s, dir) =>
      graft.GraftSession.configure(s)
      Tables.load(s, dir, "events")
        .select(col("event_id"), (unix_micros(col("ts")) * 1000L).as("ts_ns"))
        .createOrReplaceTempView("ns_events")
      s.sql("""SELECT event_id, ns_to_timestamp(ts_ns) AS ts_us
               FROM ns_events WHERE event_id < 2000""")
        .orderBy(col("event_id"))
    },

    // ---- HAVING (post-aggregation filter)
    "q_having" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_partkey")
        .agg(sum($"l_quantity").as("total_qty"), count(lit(1)).as("n"))
        .filter($"total_qty" > 300)
        .orderBy($"l_partkey")
    },
  )

  val oracles: Map[String, String] = Map(
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
         CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
         count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         FROM lineitem WHERE l_quantity > 45 AND l_discount <= 0.05
         ORDER BY l_orderkey, l_linenumber""",
    "q_tpch_q5" ->
      """SELECT n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "q_tpch_q14" ->
      """SELECT round(100.0 *
             CAST(sum(CASE WHEN p_type = 'PROMO'
               THEN CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2))) ELSE 0 END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6)
           AS promo_share,
           count(*) AS n_items
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'""",
    "q_join_revenue_by_nation" ->
      """SELECT r_name, n_name,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q_join_left_order_counts" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
         coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spent
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey, c_name ORDER BY c_custkey""",
    "q_semi_join" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
         ORDER BY o_orderkey""",
    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 200000)
         ORDER BY c_custkey""",
    "q_window_topk_per_cust" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
           FROM orders) WHERE rk <= 3
         ORDER BY o_custkey, rk""",
    "q_window_running" ->
      """SELECT user_id, event_id,
         CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
              PARTITION BY user_id ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
         lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_type
         FROM events ORDER BY user_id, event_id""",
    "q_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""",
    "q_offset_limit" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
         ORDER BY o_orderkey LIMIT 25 OFFSET 50""",
    "q_set_ops" ->
      """SELECT nk FROM (
           SELECT nk FROM (SELECT c_nationkey AS nk FROM customer
                           INTERSECT SELECT s_nationkey AS nk FROM supplier)
           UNION ALL
           SELECT nk + 1000 AS nk FROM (SELECT c_nationkey AS nk FROM customer
                                        EXCEPT SELECT s_nationkey AS nk FROM supplier))
         GROUP BY nk ORDER BY nk""",
    "q_distinct_counts" ->
      """SELECT count(DISTINCT l_orderkey) AS n_orders,
                count(DISTINCT l_partkey) AS n_parts,
                count(DISTINCT (l_returnflag, l_linestatus)) AS n_flag_status
         FROM lineitem""",
    "q_distinct_on" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
           FROM orders) WHERE rn = 1
         ORDER BY o_custkey""",
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "q_scalar_funcs" ->
      """SELECT o_orderkey,
         upper(o_orderstatus) AS status_u,
         substring(o_orderpriority, 1, 1) AS prio_code,
         CAST(length(o_orderpriority) AS INTEGER) AS prio_len,
         concat(o_orderstatus, '/', o_orderpriority) AS combo,
         CAST(year(o_orderdate) AS INTEGER) AS y,
         CAST(month(o_orderdate) AS INTEGER) AS m,
         CAST(day(o_orderdate) AS INTEGER) AS d,
         o_orderkey % 7 AS key_mod,
         abs(o_totalprice * -1) AS abs_price,
         round(o_totalprice / 1000, 1) AS price_k
         FROM orders ORDER BY o_orderkey""",
    "q_case_when" ->
      """SELECT o_orderkey,
         CASE WHEN o_totalprice > 300000 THEN 'high'
              WHEN o_totalprice > 100000 THEN 'mid'
              ELSE 'low' END AS bucket,
         CASE WHEN o_orderstatus = 'O' THEN o_totalprice END AS open_price
         FROM orders ORDER BY o_orderkey""",
    "q_try_cast" ->
      """SELECT o_orderkey,
         TRY_CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS prio_num,
         TRY_CAST(o_orderstatus AS BIGINT) AS status_num
         FROM orders ORDER BY o_orderkey""",
    "q_events_daily" ->
      """SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day, event_type,
         count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY day, event_type""",
    "q_ns_timestamps" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts_us
         FROM events WHERE event_id < 2000 ORDER BY event_id""",
    "q_having" ->
      """SELECT l_partkey, sum(l_quantity) AS total_qty, count(*) AS n
         FROM lineitem GROUP BY l_partkey
         HAVING sum(l_quantity) > 300 ORDER BY l_partkey""",
  )
}
