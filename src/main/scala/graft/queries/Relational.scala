package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Q
import graft.core.{Tables, Det}

/** Core relational surface: scans, filters, aggregation, joins (broadcast +
  * shuffle), window functions, semi-joins, distinct, top-k — exercised over
  * the driver's TPC-H-ish tables.
  *
  * Determinism notes: money aggregates are summed as exact integer cents
  * (LongType; DuckDB side CASTs its HUGEINT sum back to BIGINT) and divided
  * to doubles only at the end, so Spark and DuckDB hash-match bit-for-bit
  * regardless of summation order. `l_quantity` is integer-valued.
  */
object Relational {

  val qs: Seq[Q] = Seq(
    // -- TPC-H Q1-style pricing summary: single-pass partial+final agg, no join.
    Q("q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT)/100.0 AS sum_base_price,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT)/10000.0 AS sum_disc_price,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) * (100 + CAST(ROUND(l_tax*100) AS BIGINT))) AS BIGINT)/1000000.0 AS sum_charge,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val ext = Det.cents(col("l_extendedprice"))
      val disc = lit(100L) - Det.pct(col("l_discount"))
      val tax = lit(100L) + Det.pct(col("l_tax"))
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          (sum(ext) / 100.0).as("sum_base_price"),
          (sum(ext * disc) / 10000.0).as("sum_disc_price"),
          (sum(ext * disc * tax) / 1000000.0).as("sum_charge"),
          count(lit(1)).as("count_order"))
    },

    // -- Broadcast join lineitem x part, top-10 brands by exact revenue.
    Q("q02_top_brands",
      """SELECT p_brand,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT)/10000.0 AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY revenue DESC, p_brand LIMIT 10""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val pt = Tables.part(s, dir).select("p_partkey", "p_brand")
      val rev = Det.cents(col("l_extendedprice")) * (lit(100L) - Det.pct(col("l_discount")))
      li.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg((sum(rev) / 10000.0).as("revenue"), count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("p_brand").asc)
        .limit(10)
    },

    // -- 5-way star join: revenue by region/nation (all dims broadcast).
    Q("q03_revenue_by_nation",
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT)/10000.0 AS revenue
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY r_name, n_name""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir).select("l_orderkey", "l_extendedprice", "l_discount")
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      val rev = Det.cents(col("l_extendedprice")) * (lit(100L) - Det.pct(col("l_discount")))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg((sum(rev) / 10000.0).as("revenue"))
    },

    // -- Semi-join (EXISTS): orders with any line shipped >60 days after order.
    Q("q04_order_priority",
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey
        |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate")
      o.join(li, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
    },

    // -- Window functions: per-supplier running quantity + rank. NOTE:
    //    (l_orderkey, l_linenumber) is NOT unique in this generator, so
    //    l_quantity joins the ordering — rows still tied after that are
    //    fully interchangeable (equal increments), keeping the output
    //    multiset engine-independent.
    Q("q05_supplier_running",
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) OVER (
        |    PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_qty,
        |  ROW_NUMBER() OVER (
        |    PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity) AS rn
        |FROM lineitem""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val w = Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")
      li.select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        sum(col("l_quantity").cast("long"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("running_qty"),
        row_number().over(w).cast("long").as("rn"))
    },

    // -- Distinct aggregation.
    Q("q06_distinct_counts",
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
    },

    // -- Big-big join: lineitem x orders are BOTH fact-sized at 100 TB, so
    //    neither side broadcasts — a sort-merge join (hinted here because
    //    the test tables fit under the auto-broadcast threshold) feeding a
    //    partial+final rollup. AQE coalesces the post-shuffle partitions.
    Q("q08_customer_ltv",
      """SELECT o_custkey,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS cents,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_custkey""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir).select("l_orderkey", "l_extendedprice")
      val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
      li.join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(sum(Det.cents(col("l_extendedprice"))).as("cents"),
          count(lit(1)).as("n_items"))
    },

    // -- ROLLUP super-aggregates (hierarchical totals in one pass).
    Q("q10_rollup",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast("long")).as("qty"),
          count(lit(1)).as("n"))
    },

    // -- the window-function family in one pass: LAG/LEAD (offsets),
    //    FIRST_VALUE (frame edge), NTILE (bucketing) and DENSE_RANK over
    //    one customer-keyed, date-ordered window — integer surfaces only.
    Q("q18_window_family",
      """SELECT o_orderkey, o_custkey,
        |  LAG(o_orderkey) OVER w AS prev_key,
        |  LEAD(o_orderkey) OVER w AS next_key,
        |  FIRST_VALUE(o_orderkey) OVER w AS first_key,
        |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
        |  CAST(DENSE_RANK() OVER w AS BIGINT) AS rk
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_custkey"),
        lag(col("o_orderkey"), 1).over(w).as("prev_key"),
        lead(col("o_orderkey"), 1).over(w).as("next_key"),
        first(col("o_orderkey")).over(w).as("first_key"),
        ntile(4).over(w).cast("long").as("quartile"),
        dense_rank().over(w).cast("long").as("rk"))
    },

    // -- correlated scalar subquery: customers above their own nation's
    //    average balance (integer-cents averages on both sides). Catalyst
    //    decorrelates this into an aggregate + join — the plan shape that
    //    makes correlated SQL scale; the text below runs verbatim on both
    //    engines through spark.sql.
    Q("q17_correlated", {
      val sql =
        """SELECT c_custkey, c_nationkey,
          |  CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
          |FROM customer o
          |WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) > (
          |  SELECT AVG(CAST(ROUND(i.c_acctbal * 100) AS BIGINT))
          |  FROM customer i WHERE i.c_nationkey = o.c_nationkey)""".stripMargin
      sql
    }) { (s, dir) =>
      graft.core.Tables.customer(s, dir).createOrReplaceTempView("customer")
      s.sql(
        """SELECT c_custkey, c_nationkey,
          |  CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
          |FROM customer o
          |WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) > (
          |  SELECT AVG(CAST(ROUND(i.c_acctbal * 100) AS BIGINT))
          |  FROM customer i WHERE i.c_nationkey = o.c_nationkey)""".stripMargin)
    },

    // -- CUBE: all four grouping combinations in one pass (rounds out the
    //    ROLLUP/pivot grouping-set family).
    Q("q16_cube",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .cube("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast("long")).as("qty"),
          count(lit(1)).as("n"))
    },

    // -- pivot: per-returnflag quantity totals spread over line statuses
    //    (oracle states the equivalent conditional aggregation).
    Q("q11_pivot",
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS F,
        |  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS O
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(col("l_quantity").cast("long")))
    },

    // -- SQL entry point: the same engine surface through spark.sql over
    //    registered temp views (the text below runs verbatim on BOTH
    //    engines).
    Q("q09_sql_interface",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          |  CAST(COUNT(*) AS BIGINT) AS n,
          |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
          |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)
    },

    // -- Anti-join: customers with no orders in window.
    Q("q07_inactive_customers",
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer WHERE NOT EXISTS (
        |  SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
    },

    // -- top-2 parts by revenue per brand: partitioned window ranking
    //    over a broadcast-dimension join (the per-group top-k idiom that
    //    needs NO global sort — each brand ranks inside its partition).
    Q("q12_top_part_per_brand",
      """WITH rev AS (
        |  SELECT p_brand, l_partkey,
        |    CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
        |      * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand, l_partkey)
        |SELECT p_brand, l_partkey, cents, rnk FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
        |    ORDER BY cents DESC, l_partkey) AS BIGINT) AS rnk
        |  FROM rev) WHERE rnk <= 2""".stripMargin) { (s, dir) =>
      val p = broadcast(Tables.part(s, dir).select("p_partkey", "p_brand"))
      val cents = Det.cents(col("l_extendedprice")) *
        (lit(100L) - Det.pct(col("l_discount")))
      val rev = Tables.lineitem(s, dir)
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "l_partkey")
        .agg(sum(cents).as("cents"))
      rev.withColumn("rnk", row_number().over(
          Window.partitionBy("p_brand")
            .orderBy(col("cents").desc, col("l_partkey"))).cast("long"))
        .filter(col("rnk") <= 2)
        .select("p_brand", "l_partkey", "cents", "rnk")
    },

    // -- semi + anti join composition: customers holding at least one
    //    high-value order but NO returned lineitem across any of their
    //    orders (EXISTS ∧ NOT EXISTS — leftsemi then leftanti, both
    //    shuffle-keyed by customer; the returns side aggregates to
    //    customer cardinality before the anti join).
    Q("q13_good_big_customers",
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 200000)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |    WHERE o_custkey = c_custkey AND l_returnflag = 'R')""".stripMargin) {
      (s, dir) =>
      val c = Tables.customer(s, dir).select("c_custkey", "c_mktsegment")
      val big = Tables.orders(s, dir).filter(col("o_totalprice") > 200000)
        .select(col("o_custkey").as("bk"))
      val returned = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
        .join(Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
          .select("l_orderkey"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("rk"))
      c.join(big, col("c_custkey") === col("bk"), "left_semi")
        .join(returned, col("c_custkey") === col("rk"), "left_anti")
    },

    // -- conditional-aggregate ratio: promo revenue share per ship month
    //    (TPC-H Q14 shape). Both numerator and denominator are exact cent
    //    sums; the single closing division is the only inexact op.
    Q("q14_promo_share",
      """SELECT CAST(month(l_shipdate) AS BIGINT) AS mo,
        |  CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
        |    THEN CAST(ROUND(l_extendedprice*100) AS BIGINT)
        |      * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) ELSE 0 END) AS BIGINT) AS promo_cents,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
        |    * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS total_cents,
        |  CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
        |    THEN CAST(ROUND(l_extendedprice*100) AS BIGINT)
        |      * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) ELSE 0 END) AS BIGINT)
        |  / CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
        |    * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY month(l_shipdate)""".stripMargin) { (s, dir) =>
      val p = broadcast(Tables.part(s, dir).select("p_partkey", "p_type"))
      val cents = Det.cents(col("l_extendedprice")) *
        (lit(100L) - Det.pct(col("l_discount")))
      Tables.lineitem(s, dir)
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(month(col("l_shipdate")).cast("long").as("mo"))
        .agg(
          sum(when(col("p_type").startsWith("PROMO"), cents).otherwise(0L))
            .as("promo_cents"),
          sum(cents).as("total_cents"))
        .select(col("mo"), col("promo_cents"), col("total_cents"),
          (col("promo_cents").cast("double") / col("total_cents").cast("double"))
            .as("promo_share"))
    },

    // -- exact per-group quantiles as order statistics: value at rank
    //    ceil(q·n) of the cents-sorted group. Integer cents + integer rank
    //    arithmetic -> the selected value is exact and tie-order-free (the
    //    value at a given rank is determined by the sorted multiset even
    //    when row_number breaks ties arbitrarily). This is the EXACT
    //    quantile path (one shuffle + per-group sort); at 100 TB the same
    //    query swaps to percentile_approx/t-digest sketches — the exact
    //    form here is what such a sketch is verified against.
    // Exact per-flag price quantiles. The SPARK plan deliberately does
    // NOT mirror the oracle's row_number formulation: l_returnflag has 3
    // values, so a flag-partitioned window over RAW rows sorts n/3 rows
    // on ONE task — invisible at sf0.1, a 20M-row single-task sort at the
    // 100x replica (the round-11 bench caught it at 148x = superlinear).
    // Scale-correct exact equivalent: shuffle-aggregate to DISTINCT
    // (flag, cents) counts first (map-side combined; the distinct-value
    // frame is value-bounded — constant across replicas), then one
    // window over the distinct frame cumulates counts, and the quantile
    // at rank t is the smallest cents whose cumulative count reaches t —
    // identical multiset semantics, bit-identical result.
    Q("q15_price_quantiles",
      """WITH r AS (
        |  SELECT l_returnflag AS flag,
        |    CAST(ROUND(l_extendedprice*100) AS BIGINT) AS cents
        |  FROM lineitem),
        |o AS (
        |  SELECT flag, cents,
        |    ROW_NUMBER() OVER (PARTITION BY flag ORDER BY cents) AS rn,
        |    COUNT(*) OVER (PARTITION BY flag) AS n
        |  FROM r)
        |SELECT flag,
        |  MAX(CASE WHEN rn = (n*50 + 99) // 100 THEN cents END) AS p50_cents,
        |  MAX(CASE WHEN rn = (n*90 + 99) // 100 THEN cents END) AS p90_cents,
        |  MAX(CASE WHEN rn = (n*99 + 99) // 100 THEN cents END) AS p99_cents,
        |  CAST(MAX(n) AS BIGINT) AS n
        |FROM o GROUP BY flag""".stripMargin) { (s, dir) =>
      val byVal = Tables.lineitem(s, dir)
        .select(col("l_returnflag").as("flag"),
          Det.cents(col("l_extendedprice")).as("cents"))
        .groupBy("flag", "cents").agg(count(lit(1)).as("c"))
      val wq = Window.partitionBy("flag")
      val cum = byVal
        .withColumn("cum", sum(col("c")).over(wq.orderBy("cents")))
        .withColumn("n", sum(col("c")).over(wq))
      cum.groupBy("flag").agg(
        min(when(col("cum") >= expr("(n*50 + 99) div 100"), col("cents")))
          .as("p50_cents"),
        min(when(col("cum") >= expr("(n*90 + 99) div 100"), col("cents")))
          .as("p90_cents"),
        min(when(col("cum") >= expr("(n*99 + 99) div 100"), col("cents")))
          .as("p99_cents"),
        max(col("n")).as("n"))
    },

    // -- set operators INTERSECT / EXCEPT (§2.12): the customers who
    //    ordered in both 1996 and 1997, and those who ordered in 1996
    //    only — Dataset.intersect/except are the INTERSECT/EXCEPT
    //    DISTINCT logical operators (distinct-semantics on both engines),
    //    planned as null-aware hash joins after AQE. One tagged union
    //    puts both results under a single hashed surface.
    Q("q19_set_ops",
      """WITH y96 AS (
        |  SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01'),
        |y97 AS (
        |  SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01')
        |SELECT 'both' AS tag, o_custkey
        |FROM (SELECT o_custkey FROM y96 INTERSECT SELECT o_custkey FROM y97)
        |UNION ALL
        |SELECT 'only96' AS tag, o_custkey
        |FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y97)""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir)
      def year(y: Int) = o
        .filter(col("o_orderdate") >= lit(s"$y-01-01").cast("timestamp") &&
          col("o_orderdate") < lit(s"${y + 1}-01-01").cast("timestamp"))
        .select("o_custkey")
      val y96 = year(1996); val y97 = year(1997)
      y96.intersect(y97).select(lit("both").as("tag"), col("o_custkey"))
        .unionAll(
          y96.except(y97).select(lit("only96").as("tag"), col("o_custkey")))
    },

    // -- MERGE / upsert (the incremental-refresh primitive Spark SQL has
    //    no built-in for without a table format): an update batch lands on
    //    the document corpus as FULL OUTER JOIN + COALESCE — matched rows
    //    take the new text, unmatched-left stay, unmatched-right insert.
    //    The batch is synthesized from the corpus (every doc_id % 7 = 3
    //    revised, 20 fresh ids appended) so both engines state it exactly.
    //    One keyed shuffle per side at any scale; the action tag makes the
    //    merge decision itself part of the hashed surface.
    Q("q20_upsert",
      """WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
        |upd AS (
        |  SELECT doc_id, 'REV:' || CAST(doc_id AS VARCHAR) AS new_text
        |  FROM documents WHERE doc_id % 7 = 3
        |  UNION ALL
        |  SELECT m + 1 + x.x AS doc_id,
        |    'NEW:' || CAST(m + 1 + x.x AS VARCHAR) AS new_text
        |  FROM mx, (SELECT unnest(generate_series(0, 19)) AS x) x),
        |mg AS (
        |  SELECT COALESCE(b.doc_id, u.doc_id) AS doc_id,
        |    COALESCE(u.new_text, b.text) AS text,
        |    CASE WHEN b.doc_id IS NULL THEN 'insert'
        |         WHEN u.doc_id IS NULL THEN 'keep'
        |         ELSE 'update' END AS action
        |  FROM documents b FULL OUTER JOIN upd u ON b.doc_id = u.doc_id)
        |SELECT doc_id, action, md5(text) AS text_md5,
        |  CAST(length(text) AS BIGINT) AS n_chars
        |FROM mg""".stripMargin) { (s, dir) =>
      val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val mx = base.agg(max("doc_id").as("m"))
      val revised = base.filter(col("doc_id") % 7 === 3)
        .select(col("doc_id"),
          concat(lit("REV:"), col("doc_id").cast("string")).as("new_text"))
      val fresh = s.range(0, 20).crossJoin(broadcast(mx))
        .select((col("m") + 1 + col("id")).as("doc_id"),
          concat(lit("NEW:"), (col("m") + 1 + col("id")).cast("string"))
            .as("new_text"))
      val upd = revised.unionAll(fresh)
        .select(col("doc_id").as("u_id"), col("new_text"))
      base.join(upd, col("doc_id") === col("u_id"), "full_outer")
        .select(
          coalesce(col("doc_id"), col("u_id")).as("doc_id"),
          coalesce(col("new_text"), col("text")).as("text"),
          when(col("doc_id").isNull, "insert")
            .when(col("u_id").isNull, "keep")
            .otherwise("update").as("action"))
        .select(col("doc_id"), col("action"), md5(col("text")).as("text_md5"),
          length(col("text")).cast("long").as("n_chars"))
    })
}
