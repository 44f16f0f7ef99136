package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Tables
import graft.ops.{AsOf, Cumulative}

/** Core relational operator battery over the driver testdata, one query
  * per operator family from SURVEY.md §2 (scan/filter/join/agg/window/
  * asof/point-in-time/set-op/scalar-function). Each re-expresses a
  * behavior of the reference pipeline (citations inline) on the TPC-H-ish
  * tables so DuckDB can act as the oracle.
  */
object CoreQueries {

  /** Exact decimal view of a raw ≤4dp numeric column (both engines round
    * the binary double to the same nearest 4dp value — no tie risk).
    */
  private def dec4(c: Column): Column = c.cast(DecimalType(18, 4))
  private val one4 = lit(1).cast(DecimalType(18, 4))

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val defs: Seq[QueryDef] = Seq(

    // ---- A2/A4 group aggregates (reference: per-day cash sums
    // factor_builder.py:328; manifest min/max/count ingest.py:349-354) ----
    QueryDef("q01_agg_pricing",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val discPrice = (dec4(col("l_extendedprice")) * (one4 - dec4(col("l_discount"))))
          .cast(DecimalType(18, 4))
        val charge = (discPrice * (one4 + dec4(col("l_tax")))).cast(DecimalType(18, 6))
        li.filter(col("l_shipdate") < lit("1998-09-01").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(dec4(col("l_quantity"))).cast("double").as("sum_qty"),
            sum(dec4(col("l_extendedprice"))).cast("double").as("sum_base_price"),
            sum(discPrice).cast("double").as("sum_disc_price"),
            sum(charge).cast("double").as("sum_charge"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) + CAST(l_tax AS DECIMAL(18,4))) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""")),

    // ---- P3/P6 time-range + equality filter with projection (reference:
    // lake_io.py:170-178 inclusive bounds; ingest.py:249-252 --only) ----
    QueryDef("q02_filter_project",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp") &&
          col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_discount"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
        strftime(l_shipdate, '%Y-%m-%d') AS ship_date
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
          AND l_returnflag = 'R'
        ORDER BY l_orderkey, l_linenumber""")),

    // ---- J1-family multi-way equi join against small dims (reference:
    // identity attach factor_builder.py:148-180 is bars ⋈ broadcast dim) ----
    QueryDef("q03_join_nation_revenue",
      (s, dir) => t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("order_count"),
          sum(dec4(col("o_totalprice"))).cast("double").as("total_revenue"))
        .orderBy(col("r_name"), col("n_name")),
      Some("""SELECT r_name, n_name, COUNT(*) AS order_count,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name ORDER BY r_name, n_name""")),

    // ---- P4 membership filter as left-semi join (reference: watchlist
    // filters ingest.py:254-257, lake_io.py:324-326) ----
    QueryDef("q04_semi_join",
      (s, dir) => t(s, dir, "orders")
        .join(t(s, dir, "customer").filter(col("c_acctbal") > 5000)
          .select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          sum(dec4(col("o_totalprice"))).cast("double").as("total"))
        .orderBy(col("o_orderstatus")),
      Some("""SELECT o_orderstatus, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM orders WHERE o_custkey IN
          (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- anti join (complement of P4 membership) ----
    QueryDef("q05_anti_join",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders").select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        ORDER BY c_custkey""")),

    // ---- J2 forward as-of join (reference: merge_asof direction=forward,
    // factor_builder.py:261-267 — events snap to first trading day >=,
    // unmatched dropped). Here: each click snaps to the user's next
    // purchase at-or-after it. ----
    QueryDef("q06_asof_next_purchase",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(min(col("event_id")).as("purchase_id"))
          .withColumn("next_purchase_ts", col("ts"))
        AsOf.joinForward(clicks, purchases, Seq("user_id"), "ts", "ts",
            Seq("next_purchase_ts", "purchase_id"))
          .filter(col("next_purchase_ts").isNotNull)
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"),
            unix_micros(col("next_purchase_ts")).as("next_purchase_us"),
            col("purchase_id"))
          .orderBy(col("event_id"))
      },
      Some("""WITH p AS (
          SELECT user_id, ts, MIN(event_id) AS purchase_id
          FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
        c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        m AS (
          SELECT c.event_id, c.user_id, c.ts, MIN(p.ts) AS next_purchase_ts
          FROM c JOIN p ON p.user_id = c.user_id AND p.ts >= c.ts
          GROUP BY c.event_id, c.user_id, c.ts)
        SELECT m.event_id, m.user_id, epoch_us(m.ts) AS ts_us,
          epoch_us(m.next_purchase_ts) AS next_purchase_us, p.purchase_id
        FROM m JOIN p ON p.user_id = m.user_id AND p.ts = m.next_purchase_ts
        ORDER BY m.event_id""")),

    // ---- W1 lag per group (reference: prior_base shift(1) within id,
    // factor_builder.py:297-299) ----
    QueryDef("q07_window_lag",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("value"),
            lag(col("value"), 1).over(w).as("prev_value"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id, value,
        LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
        FROM events ORDER BY event_id""")),

    // ---- W2 grouped cumulative product (reference: F = ratio.cumprod()
    // factor_builder.py:272; exact ordered multiply, not exp-sum-log) ----
    QueryDef("q08_cumprod_discount",
      (s, dir) => {
        // (l_orderkey, l_linenumber) is NOT unique in the testdata, so the
        // order needs a value tiebreak to be deterministic; equal
        // (linenumber, discount) duplicates then yield identical factors
        // regardless of their relative order. No rounding: sequential IEEE
        // multiply from identical inputs is bit-deterministic.
        val w = Window.partitionBy(col("l_orderkey"))
          .orderBy(col("l_linenumber"), col("l_discount"))
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_discount"),
            Cumulative.cumprodExact(lit(1.0) - col("l_discount"), w)
              .as("cum_factor"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_discount"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_discount,
        PRODUCT(1.0 - l_discount) OVER (PARTITION BY l_orderkey
          ORDER BY l_linenumber, l_discount
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_factor
        FROM lineitem ORDER BY l_orderkey, l_linenumber, l_discount""")),

    // ---- W3 anchor-to-last normalization (reference: factors divided by
    // last-day value so latest bar == raw, factor_builder.py:273-276) ----
    QueryDef("q09_anchor_last",
      (s, dir) => {
        val w = Window.partitionBy(col("l_orderkey"))
          .orderBy(col("l_linenumber"), col("l_extendedprice"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
            (col("l_extendedprice") / last(col("l_extendedprice")).over(w))
              .as("anchored"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice,
        l_extendedprice / LAST_VALUE(l_extendedprice) OVER (
          PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS anchored
        FROM lineitem ORDER BY l_orderkey, l_linenumber, l_extendedprice""")),

    // ---- W4/O4 dedup-rank keep-best-row (reference: drop_duplicates
    // keep=last after sort, factor_builder.py:176-177) ----
    QueryDef("q10_top1_per_group",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
            ROW_NUMBER() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) WHERE rn = 1 ORDER BY o_custkey""")),

    // ---- U1/U2 union + distinct (reference: pd.concat everywhere;
    // universe set-union build_index_universes.py:47) ----
    QueryDef("q11_union_distinct",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val big = o.filter(col("o_totalprice") > 400000)
          .select(col("o_orderkey"), lit("big").as("tag"))
        val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"), lit("urgent").as("tag"))
        big.unionByName(urgent).distinct()
          .orderBy(col("o_orderkey"), col("tag"))
      },
      Some("""SELECT DISTINCT * FROM (
          SELECT o_orderkey, 'big' AS tag FROM orders WHERE o_totalprice > 400000
          UNION ALL
          SELECT o_orderkey, 'urgent' AS tag FROM orders WHERE o_orderpriority = '1-URGENT')
        ORDER BY o_orderkey, tag""")),

    // ---- A5 distinct (reference: unique event days factor_builder.py:244) ----
    QueryDef("q12_distinct_types",
      (s, dir) => t(s, dir, "events").select(col("event_type")).distinct()
        .orderBy(col("event_type")),
      Some("SELECT DISTINCT event_type FROM events ORDER BY event_type")),

    // ---- S6/A4 manifest aggregate: per-group min/max/count (reference:
    // manifest build ingest.py:345-422) ----
    QueryDef("q13_manifest_stats",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(
          date_format(min(col("l_shipdate")), "yyyy-MM-dd").as("min_ship"),
          date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("max_ship"),
          count(lit(1)).as("rows"))
        .orderBy(col("l_suppkey")),
      Some("""SELECT l_suppkey, strftime(MIN(l_shipdate), '%Y-%m-%d') AS min_ship,
        strftime(MAX(l_shipdate), '%Y-%m-%d') AS max_ship, COUNT(*) AS rows
        FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""")),

    // ---- A7 first/last element per sorted group (reference: day-edge
    // close extraction factor_builder.py:707-725) ----
    QueryDef("q14_group_edges",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(
          // struct ordering = (linenumber, price) lexicographic — the
          // price tiebreak makes edge extraction deterministic under the
          // testdata's duplicated (orderkey, linenumber) pairs
          min_by(col("l_extendedprice"),
            struct(col("l_linenumber"), col("l_extendedprice"))).as("first_price"),
          max_by(col("l_extendedprice"),
            struct(col("l_linenumber"), col("l_extendedprice"))).as("last_price"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("l_orderkey")),
      Some("""WITH r AS (
          SELECT l_orderkey, l_extendedprice,
            ROW_NUMBER() OVER (PARTITION BY l_orderkey
              ORDER BY l_linenumber, l_extendedprice) AS rn_a,
            ROW_NUMBER() OVER (PARTITION BY l_orderkey
              ORDER BY l_linenumber DESC, l_extendedprice DESC) AS rn_d
          FROM lineitem)
        SELECT l_orderkey,
          MIN(CASE WHEN rn_a = 1 THEN l_extendedprice END) AS first_price,
          MAX(CASE WHEN rn_d = 1 THEN l_extendedprice END) AS last_price,
          COUNT(*) AS n_lines
        FROM r GROUP BY l_orderkey ORDER BY l_orderkey""")),

    // ---- W7 resample/tumbling window (reference: resample('1H').first()
    // notebooks/03; Spark window() is the streaming-compatible form) ----
    QueryDef("q15_resample_hourly",
      (s, dir) => t(s, dir, "events")
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(dec4(col("value"))).cast("double").as("sum_value"))
        .orderBy(col("hour"), col("event_type")),
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY hour, event_type""")),

    // ---- W5 pct_change per group (reference: notebooks/03 QA returns) ----
    QueryDef("q16_pct_change",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("value"),
            // nullif guards prior==0 (ANSI div-by-zero); those rows drop,
            // mirroring the reference's prior>0 mask (factor_builder.py:331-333)
            (col("value") / nullif(lag(col("value"), 1).over(w), lit(0.0)) - 1.0)
              .as("ret"))
          .filter(col("ret").isNotNull)
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id, value, ret FROM (
          SELECT event_id, user_id, value,
            value / NULLIF(LAG(value, 1) OVER (PARTITION BY user_id
              ORDER BY ts, event_id), 0) - 1.0 AS ret
          FROM events) WHERE ret IS NOT NULL ORDER BY event_id""")),

    // ---- J1 point-in-time interval join (reference: prices × security
    // master validity windows factor_builder.py:148-180: row valid when
    // event_day in [effective_start, effective_end), NULL end = open) ----
    QueryDef("q17_pit_versions",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val wDim = Window.partitionBy(col("d_custkey"))
          .orderBy(col("vstart"), col("version"))
        val dim = o.select(
            col("o_custkey").as("d_custkey"),
            col("o_orderdate").as("vstart"),
            col("o_orderkey").as("version"),
            col("o_orderpriority").as("ver_priority"))
          .withColumn("vend", lead(col("vstart"), 1).over(wDim))
        val fact = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
          .join(o.select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
        fact.join(dim,
            fact("o_custkey") === dim("d_custkey") &&
              fact("l_shipdate") >= dim("vstart") &&
              (dim("vend").isNull || fact("l_shipdate") < dim("vend")))
          .select(col("l_orderkey"), col("l_linenumber"), col("version"),
            col("ver_priority"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""WITH dim AS (
          SELECT o_custkey AS d_custkey, o_orderdate AS vstart, o_orderkey AS version,
            o_orderpriority AS ver_priority,
            LEAD(o_orderdate) OVER (PARTITION BY o_custkey
              ORDER BY o_orderdate, o_orderkey) AS vend
          FROM orders),
        fact AS (
          SELECT l.l_orderkey, l.l_linenumber, l.l_shipdate, o.o_custkey
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        SELECT f.l_orderkey, f.l_linenumber, d.version, d.ver_priority
        FROM fact f JOIN dim d ON f.o_custkey = d.d_custkey
          AND f.l_shipdate >= d.vstart
          AND (d.vend IS NULL OR f.l_shipdate < d.vend)
        ORDER BY f.l_orderkey, f.l_linenumber""")),

    // ---- A1 group product (reference: same-day split-ratio product
    // factor_builder.py:269) ----
    QueryDef("q18_group_product",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        // productAgg sorts struct(order, value) — value tiebreak keeps the
        // multiply sequence deterministic despite duplicate linenumbers
        .agg(Cumulative.productAgg(lit(1.0) + col("l_tax"), col("l_linenumber"))
          .as("tax_product"))
        .orderBy(col("l_orderkey")),
      Some("""SELECT l_orderkey,
        PRODUCT(1.0 + l_tax ORDER BY l_linenumber, l_tax) AS tax_product
        FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""")),

    // ---- F10-F14 conditional scalar functions (reference: zero-guarded
    // ratio polygon_pullers/__init__.py:207, np.where factor_builder.py:208,
    // fillna factor_builder.py:271) ----
    QueryDef("q19_conditional",
      (s, dir) => t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          when(col("l_discount") > 0.05, "HIGH")
            .when(col("l_discount") > 0, "LOW")
            .otherwise("NONE").as("disc_band"),
          (col("l_quantity") / nullif(col("l_discount"), lit(0)))
            .as("qty_per_disc"),
          coalesce(nullif(col("l_tax"), lit(0)), lit(-1.0)).as("tax_or_neg1"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber,
        CASE WHEN l_discount > 0.05 THEN 'HIGH'
             WHEN l_discount > 0 THEN 'LOW' ELSE 'NONE' END AS disc_band,
        l_quantity / NULLIF(l_discount, 0) AS qty_per_disc,
        COALESCE(NULLIF(l_tax, 0), -1.0) AS tax_or_neg1
        FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // ---- F3-F5 date part extraction + formatting (reference:
    // ingest.py:264-267 partition keys; strftime day keys
    // factor_builder.py:919) ----
    QueryDef("q20_date_parts",
      (s, dir) => t(s, dir, "orders")
        .groupBy(
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          quarter(col("o_orderdate")).as("qtr"))
        .agg(count(lit(1)).as("n"),
          sum(dec4(col("o_totalprice"))).cast("double").as("total"))
        .orderBy(col("ym")),
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS ym,
        CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
        CAST(quarter(o_orderdate) AS INT) AS qtr,
        COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM orders GROUP BY 1, 2, 3, 4 ORDER BY ym""")),

    // ---- F6-F8 string normalization (reference: ticker cleanup
    // run_pullers.py:25-36: upper/strip, separator → '.', first token) ----
    QueryDef("q21_string_norm",
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey"),
          upper(trim(col("p_brand"))).as("brand_norm"),
          regexp_replace(col("p_name"), "\\s+", ".").as("dotted"),
          regexp_extract(col("p_name"), "^(\\S+)", 1).as("first_token"),
          length(col("p_name")).as("name_len"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey, UPPER(TRIM(p_brand)) AS brand_norm,
        regexp_replace(p_name, '\s+', '.', 'g') AS dotted,
        regexp_extract(p_name, '^(\S+)', 1) AS first_token,
        CAST(LENGTH(p_name) AS INT) AS name_len
        FROM part ORDER BY p_partkey""")),

    // ---- F1 epoch unit sniffing (reference: ingest.py:165-176 and
    // factor_builder.py:40-44 — magnitude thresholds 1e17/1e14/1e11 pick
    // ns/us/ms/s). Mixed-unit epochs are synthesized from ts, then
    // recovered via the same thresholds. ----
    QueryDef("q22_epoch_sniff",
      (s, dir) => {
        val us = unix_micros(col("ts"))
        val epoch = when(col("event_id") % 4 === 0, expr("unix_micros(ts) div 1000000"))
          .when(col("event_id") % 4 === 1, expr("unix_micros(ts) div 1000"))
          .when(col("event_id") % 4 === 2, us)
          .otherwise(us * 1000)
        val recoveredUs = when(col("epoch") > 100000000000000000L, expr("epoch div 1000"))
          .when(col("epoch") > 100000000000000L, col("epoch"))
          .when(col("epoch") > 100000000000L, col("epoch") * 1000)
          .otherwise(col("epoch") * 1000000)
        t(s, dir, "events")
          .withColumn("epoch", epoch)
          .select(col("event_id"), col("epoch"),
            (col("event_id") % 4).cast("int").as("unit_code"),
            recoveredUs.as("recovered_us"))
          .orderBy(col("event_id"))
      },
      Some("""WITH e AS (
          SELECT event_id,
            CASE CAST(event_id % 4 AS INT)
              WHEN 0 THEN epoch_us(ts) // 1000000
              WHEN 1 THEN epoch_us(ts) // 1000
              WHEN 2 THEN epoch_us(ts)
              ELSE epoch_us(ts) * 1000 END AS epoch
          FROM events)
        SELECT event_id, epoch, CAST(event_id % 4 AS INT) AS unit_code,
          CASE WHEN epoch > 100000000000000000 THEN epoch // 1000
               WHEN epoch > 100000000000000 THEN epoch
               WHEN epoch > 100000000000 THEN epoch * 1000
               ELSE epoch * 1000000 END AS recovered_us
        FROM e ORDER BY event_id""")),

    // ---- F18 JSON extraction (reference: JSON watchlist/manifest loads
    // ingest.py:461-462, lake_io.py:127-128) ----
    QueryDef("q23_json_extract",
      (s, dir) => t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        FROM events GROUP BY event_type ORDER BY event_type"""))
  )
}
