"""TPC-H shape completion (round 7): the query SHAPES from the TPC-H
suite not yet represented in the catalog, adapted to the driver
testdata's columns (no partsupp table, no l_commitdate/l_receiptdate/
l_shipmode/c_phone — each adaptation keeps the SHAPE: the join graph,
subquery nesting, and aggregate structure the optimizer must handle).

Complete 22-shape mapping (authoritative; test_tpch_shapes.py pins it):

  Q1  pricing summary ............ q01_pricing_summary
  Q2  correlated min-per-group ... z42_min_cost_supplier   (this file)
  Q3  shipping priority .......... q15_shipping_priority
  Q4  EXISTS + grouped count ..... z51_priority_exists_count (this file)
  Q5  local supplier volume ...... q16_local_supplier_volume
  Q6  single-table filtered agg .. z43_revenue_forecast    (this file)
  Q7  nation-pair volume ......... z44_volume_shipping     (this file)
  Q8  market share ............... y23_market_share
  Q9  product-type profit ........ z45_product_profit      (this file)
  Q10 returned-item top-k ........ z46_returned_items      (this file)
  Q11 agg vs global-scalar HAVING  z47_important_parts     (this file)
  Q12 conditional two-way agg .... z39_filtered_agg (FILTER-clause form
      of Q12's CASE pyramid; no l_shipmode column to group by)
  Q13 outer-join count distrib ... q11_outer_join_agg
  Q14 conditional revenue ratio .. z23_part_type_revenue
  Q15 top supplier (scalar max) .. z53_top_supplier        (this file)
  Q16 NOT IN + count distinct .... z52_supplier_relation   (this file)
  Q17 correlated scalar avg ...... z40_scalar_subqueries (+ z17)
  Q18 HAVING-filtered IN join .... z22_big_orders
  Q19 disjunctive join predicate . z54_disjunctive_join    (this file)
  Q20 nested IN + correlated agg . z48_promo_suppliers     (this file)
  Q21 multi-EXISTS/NOT EXISTS .... z49_waiting_suppliers   (this file)
  Q22 bucket + scalar avg + anti . z50_sales_opportunity   (this file)

Every entry here is a SHARED-SQL query: the identical statement runs on
Spark (via api.sql) and DuckDB (as its own oracle), so the parity check
is the SQL semantics themselves. Determinism rules follow catalog.py:
money math in DECIMAL (exact, engine-independent) with one terminal
ROUND(CAST(.. AS DOUBLE), n); avg comparisons phrased as exact
cross-multiplication (bal*n > sum) so no engine's AVG type promotion
participates; counts CAST to BIGINT; total ORDER BY for stable hashing.

100 TB notes: these are declarative plans — Catalyst handles the
physical strategy (broadcast dims, semi/anti decorrelation, partial
aggs). The correlated scalar subqueries (z42/z48) decorrelate into
aggregate joins on the correlation key; the EXISTS pairs (z49/z51)
become left-semi/left-anti joins on l_orderkey; nothing here collects
or loops on the driver.

z-prefix: past the driver's 50-name gate window by design;
tools/check.py + the sf0.1 sweep oracle-check every entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pw_etl_scrumptious_squad_spark.catalog import register

# ---------------------------------------------------------------------------
# Q2: correlated min-per-group + multi-join (min "supply price" per part
# via lineitem, part/supplier/nation/region dims). No partsupp table:
# l_extendedprice stands in for ps_supplycost; 2-dp doubles compare
# exactly because both engines see the same stored values.
# ---------------------------------------------------------------------------

_Z42_SQL = (
    "SELECT DISTINCT p.p_partkey, p.p_name, s.s_name, n.n_name,"
    " ROUND(CAST(l.l_extendedprice AS DOUBLE), 2) AS supply_price"
    " FROM part p"
    " JOIN lineitem l ON l.l_partkey = p.p_partkey"
    " JOIN supplier s ON s.s_suppkey = l.l_suppkey"
    " JOIN nation n ON n.n_nationkey = s.s_nationkey"
    " WHERE p.p_size <= 5"
    " AND l.l_extendedprice = (SELECT MIN(l2.l_extendedprice)"
    " FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)"
    " ORDER BY p.p_partkey, s.s_name"
)


@register(
    "z42_min_cost_supplier",
    _Z42_SQL,
    "TPC-H Q2 shape: correlated MIN-per-group scalar subquery selecting"
    " the cheapest supplier row per part, joined through"
    " supplier->nation. Catalyst decorrelates the MIN into an aggregate"
    " + join on l_partkey; identical SQL runs on DuckDB."
    " z-prefix: past the gate window by design; tools/check.py covers it",
)
def z42(spark: SparkSession, sf: str) -> DataFrame:
    from pw_etl_scrumptious_squad_spark import api

    return api.sql(spark, sf, _Z42_SQL)


# ---------------------------------------------------------------------------
# Q6: the simplest TPC-H shape — single-table scan, conjunctive band
# predicates, one global aggregate. Discount band compared on exact
# integer cents (both engines compute the identical IEEE double*100).
# ---------------------------------------------------------------------------

_Z43_SQL = (
    "SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE), 4) AS revenue,"
    " CAST(COUNT(*) AS BIGINT) AS n_items"
    " FROM lineitem"
    " WHERE EXTRACT(YEAR FROM l_shipdate) = 1996"
    " AND CAST(ROUND(l_discount * 100, 0) AS INT) BETWEEN 5 AND 7"
    " AND l_quantity < 24"
)


@register(
    "z43_revenue_forecast",
    _Z43_SQL,
    "TPC-H Q6 shape: single-table filtered global aggregate (year band,"
    " discount band on exact cents, quantity cap); revenue ="
    " sum(extendedprice*discount) in exact DECIMAL."
    " z-prefix: past the gate window by design; tools/check.py covers it",
)
def z43(spark: SparkSession, sf: str) -> DataFrame:
    from pw_etl_scrumptious_squad_spark import api

    return api.sql(spark, sf, _Z43_SQL)


# ---------------------------------------------------------------------------
# Q7: nation-pair shipping volume — lineitem joined to BOTH its
# supplier's and its customer's nation, grouped by (pair, year).
# ---------------------------------------------------------------------------

_Z44_SQL = (
    "WITH shipping AS ("
    " SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,"
    " CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) AS l_year,"
    " CAST(l.l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume"
    " FROM lineitem l"
    " JOIN orders o ON o.o_orderkey = l.l_orderkey"
    " JOIN supplier s ON s.s_suppkey = l.l_suppkey"
    " JOIN customer c ON c.c_custkey = o.o_custkey"
    " JOIN nation n1 ON n1.n_nationkey = s.s_nationkey"
    " JOIN nation n2 ON n2.n_nationkey = c.c_nationkey"
    " WHERE n1.n_name < n2.n_name)"
    " SELECT supp_nation, cust_nation, l_year,"
    " ROUND(CAST(SUM(volume) AS DOUBLE), 4) AS revenue,"
    " CAST(COUNT(*) AS BIGINT) AS n_shipments"
    " FROM shipping GROUP BY supp_nation, cust_nation, l_year"
    " ORDER BY supp_nation, cust_nation, l_year"
)


@register(
    "z44_volume_shipping",
    _Z44_SQL,
    "TPC-H Q7 shape: six-way join routing each lineitem to its"
    " supplier's AND its customer's nation (two aliases of the same dim"
    " table), revenue by (nation pair, ship year). Both nation joins"
    " broadcast; the orders join is the only shuffle candidate."
    " z-prefix: past the gate window by design; tools/check.py covers it",
)
def z44(spark: SparkSession, sf: str) -> DataFrame:
    from pw_etl_scrumptious_squad_spark import api

    return api.sql(spark, sf, _Z44_SQL)


# ---------------------------------------------------------------------------
# Q9: product-type profit by nation and year. No ps_supplycost: cost is
# proxied as half the part's retail price per unit, keeping Q9's
# profit = revenue - cost two-sided aggregate over a part-filtered
# six-way join. All math in DECIMAL (0.5 is exact).
# ---------------------------------------------------------------------------

_Z45_SQL = (
    "WITH profit AS ("
    " SELECT n.n_name AS nation,"
    " CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,"
    " CAST(l.l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l.l_discount AS DECIMAL(18,2)))"
    " - CAST(0.5 AS DECIMAL(2,1)) * CAST(p.p_retailprice AS DECIMAL(18,2))"
    " * CAST(l.l_quantity AS DECIMAL(18,2)) AS amount"
    " FROM lineitem l"
    " JOIN part p ON p.p_partkey = l.l_partkey"
    " JOIN supplier s ON s.s_suppkey = l.l_suppkey"
    " JOIN nation n ON n.n_nationkey = s.s_nationkey"
    " JOIN orders o ON o.o_orderkey = l.l_orderkey"
    " WHERE p.p_name LIKE 'red%')"
    " SELECT nation, o_year,"
    " ROUND(CAST(SUM(amount) AS DOUBLE), 4) AS sum_profit"
    " FROM profit GROUP BY nation, o_year"
    " ORDER BY nation, o_year DESC"
)


@register(
    "z45_product_profit",
    _Z45_SQL,
    "TPC-H Q9 shape: part-name-filtered six-way join, profit ="
    " revenue - unit cost (retail-price proxy for the absent"
    " ps_supplycost), grouped by supplier nation x order year."
    " z-prefix: past the gate window by design; tools/check.py covers it",
)
def z45(spark: SparkSession, sf: str) -> DataFrame:
    from pw_etl_scrumptious_squad_spark import api

    return api.sql(spark, sf, _Z45_SQL)


# ---------------------------------------------------------------------------
# Q10: returned-item reporting — revenue lost to returns per customer,
# top 20. Total order (revenue DESC, custkey) makes LIMIT deterministic.
# ---------------------------------------------------------------------------

_Z46_SQL = (
    "SELECT c.c_custkey, c.c_name, n.n_name,"
    " ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4)"
    " AS revenue"
    " FROM customer c"
    " JOIN orders o ON o.o_custkey = c.c_custkey"
    " JOIN lineitem l ON l.l_orderkey = o.o_orderkey"
    " JOIN nation n ON n.n_nationkey = c.c_nationkey"
    " WHERE l.l_returnflag = 'R'"
    " AND EXTRACT(YEAR FROM o.o_orderdate) = 1996"
    " GROUP BY c.c_custkey, c.c_name, n.n_name"
    " ORDER BY revenue DESC, c.c_custkey LIMIT 20"
)


@register(
    "z46_returned_items",
    _Z46_SQL,
    "TPC-H Q10 shape: four-way join filtered to returned items in one"
    " order-year, grouped revenue per customer, deterministic top-20"
    " (DECIMAL-exact revenue, custkey tiebreak)."
    " z-prefix: past the gate window by design; tools/check.py covers it",
)
def z46(spark: SparkSession, sf: str) -> DataFrame:
    from pw_etl_scrumptious_squad_spark import api

    return api.sql(spark, sf, _Z46_SQL)


# ---------------------------------------------------------------------------
# Q11: per-group value vs a GLOBAL-total scalar threshold (the
# uncorrelated-scalar-in-HAVING shape; Q11's partsupp value proxied by
# lineitem extended price per part). Threshold math stays DECIMAL.
# ---------------------------------------------------------------------------

_Z47_SQL = (
    "WITH pv AS (SELECT l_partkey,"
    " SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value"
    " FROM lineitem GROUP BY l_partkey)"
    " SELECT l_partkey AS p_partkey,"
    " ROUND(CAST(value AS DOUBLE), 2) AS part_value"
    " FROM pv"
    " WHERE value > (SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2)))"
    " * CAST(0.0007 AS DECIMAL(5,4)) FROM lineitem)"
    " ORDER BY part_value DESC, p_partkey"
)


@register(
    "z47_important_parts",
    _Z47_SQL,
    "TPC-H Q11 shape: grouped value filtered against an uncorrelated"
    " global-aggregate scalar (value > 0.07% of total) — the"
    " aggregate-vs-scalar-of-same-table pattern, all in exact DECIMAL."
    " z-prefix: past the gate window by design; tools/check.py covers it",
)
def z47(spark: SparkSession, sf: str) -> DataFrame:
    from pw_etl_scrumptious_squad_spark import api

    return api.sql(spark, sf, _Z47_SQL)


# ---------------------------------------------------------------------------
# Q20: nested IN with a correlated aggregate threshold — suppliers who
# shipped more than 15% of some red part's total volume. qty*20 >
# total*3 keeps the comparison in exact integers-scaled DECIMAL.
# ---------------------------------------------------------------------------

_Z48_SQL = (
    "SELECT s.s_suppkey, s.s_name, n.n_name"
    " FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey"
    " WHERE s.s_suppkey IN ("
    " SELECT sp.l_suppkey FROM ("
    " SELECT l_suppkey, l_partkey,"
    " SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty"
    " FROM lineitem GROUP BY l_suppkey, l_partkey) sp"
    " WHERE sp.l_partkey IN"
    " (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')"
    " AND sp.qty * 20 > (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))"
    " * 3 FROM lineitem l2 WHERE l2.l_partkey = sp.l_partkey))"
    " ORDER BY s.s_suppkey"
)


@register(
    "z48_promo_suppliers",
    _Z48_SQL,
    "TPC-H Q20 shape: IN-subquery containing a nested IN (part filter)"
    " AND a correlated scalar aggregate threshold (15% of the part's"
    " total shipped quantity, phrased as exact cross-multiplication)."
    " z-prefix: past the gate window by design; tools/check.py covers it",
)
def z48(spark: SparkSession, sf: str) -> DataFrame:
    from pw_etl_scrumptious_squad_spark import api

    return api.sql(spark, sf, _Z48_SQL)


# ---------------------------------------------------------------------------
# Q21: the multi-EXISTS shape — suppliers who were the ONLY supplier
# with a returned item in a multi-supplier finished order (EXISTS other
# supplier in order, NOT EXISTS other supplier with a return).
# ---------------------------------------------------------------------------

_Z49_SQL = (
    "SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait"
    " FROM supplier s"
    " JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey"
    " JOIN orders o ON o.o_orderkey = l1.l_orderkey"
    " WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'"
    " AND EXISTS (SELECT 1 FROM lineitem l2"
    " WHERE l2.l_orderkey = l1.l_orderkey"
    " AND l2.l_suppkey <> l1.l_suppkey)"
    " AND NOT EXISTS (SELECT 1 FROM lineitem l3"
    " WHERE l3.l_orderkey = l1.l_orderkey"
    " AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')"
    " GROUP BY s.s_suppkey, s.s_name"
    " ORDER BY numwait DESC, s.s_suppkey LIMIT 25"
)


@register(
    "z49_waiting_suppliers",
    _Z49_SQL,
    "TPC-H Q21 shape: EXISTS + NOT EXISTS against the SAME fact table"
    " with non-equality correlated predicates (other-supplier lineitems"
    " of the same order) — decorrelates to a semi join and an anti join"
    " on l_orderkey with residual conditions; deterministic top-25."
    " z-prefix: past the gate window by design; tools/check.py covers it",
)
def z49(spark: SparkSession, sf: str) -> DataFrame:
    from pw_etl_scrumptious_squad_spark import api

    return api.sql(spark, sf, _Z49_SQL)


# ---------------------------------------------------------------------------
# Q22: bucket + global-scalar-average filter + anti join. No c_phone:
# bucket = last two digits of the fixed-width c_name; "no recent order"
# (no 2001 order) replaces "no order ever" because every testdata
# customer has orders. avg comparison is exact cross-multiplication.
# ---------------------------------------------------------------------------

_Z50_SQL = (
    "WITH pos AS (SELECT CAST(COUNT(*) AS DECIMAL(18,0)) AS n,"
    " SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s"
    " FROM customer WHERE c_acctbal > 0),"
    " sel AS (SELECT SUBSTRING(c.c_name, 17, 2) AS cbucket,"
    " CAST(c.c_acctbal AS DECIMAL(18,2)) AS bal"
    " FROM customer c CROSS JOIN pos"
    " WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * pos.n > pos.s"
    " AND NOT EXISTS (SELECT 1 FROM orders o"
    " WHERE o.o_custkey = c.c_custkey"
    " AND EXTRACT(YEAR FROM o.o_orderdate) = 2001))"
    " SELECT cbucket, CAST(COUNT(*) AS BIGINT) AS n_custs,"
    " ROUND(CAST(SUM(bal) AS DOUBLE), 2) AS total_bal"
    " FROM sel GROUP BY cbucket ORDER BY cbucket"
)


@register(
    "z50_sales_opportunity",
    _Z50_SQL,
    "TPC-H Q22 shape: substring bucketing, a global-average filter"
    " phrased as exact cross-multiplication (bal*n > sum — no"
    " engine-specific AVG promotion), and a NOT EXISTS anti join,"
    " aggregated per bucket."
    " z-prefix: past the gate window by design; tools/check.py covers it",
)
def z50(spark: SparkSession, sf: str) -> DataFrame:
    from pw_etl_scrumptious_squad_spark import api

    return api.sql(spark, sf, _Z50_SQL)


# ---------------------------------------------------------------------------
# Q4: EXISTS semi-join + grouped count per priority (returned-item
# proxy for the absent commit/receipt-date lateness predicate).
# ---------------------------------------------------------------------------

_Z51_SQL = (
    "SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count"
    " FROM orders o"
    " WHERE EXTRACT(YEAR FROM o.o_orderdate) = 1997"
    " AND EXISTS (SELECT 1 FROM lineitem l"
    " WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')"
    " GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority"
)


@register(
    "z51_priority_exists_count",
    _Z51_SQL,
    "TPC-H Q4 shape: correlated EXISTS semi join (orders with at least"
    " one returned lineitem) followed by a grouped count per priority."
    " z-prefix: past the gate window by design; tools/check.py covers it",
)
def z51(spark: SparkSession, sf: str) -> DataFrame:
    from pw_etl_scrumptious_squad_spark import api

    return api.sql(spark, sf, _Z51_SQL)


# ---------------------------------------------------------------------------
# Q16: NOT IN (null-aware anti join) + COUNT DISTINCT per group.
# ---------------------------------------------------------------------------

_Z52_SQL = (
    "SELECT p.p_brand, p.p_type,"
    " CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt"
    " FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey"
    " WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 5, 9, 13)"
    " AND l.l_suppkey NOT IN"
    " (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)"
    " GROUP BY p.p_brand, p.p_type"
    " ORDER BY supplier_cnt DESC, p.p_brand, p.p_type"
)


@register(
    "z52_supplier_relation",
    _Z52_SQL,
    "TPC-H Q16 shape: NOT IN subquery (null-aware anti join against the"
    " negative-balance suppliers) + COUNT DISTINCT per (brand, type)"
    " with an IN-list size filter."
    " z-prefix: past the gate window by design; tools/check.py covers it",
)
def z52(spark: SparkSession, sf: str) -> DataFrame:
    from pw_etl_scrumptious_squad_spark import api

    return api.sql(spark, sf, _Z52_SQL)


# ---------------------------------------------------------------------------
# Q15: top supplier — a CTE aggregate consumed twice: once as the rows,
# once as a scalar MAX the rows are filtered against (exact DECIMAL
# equality, so ties surface deterministically instead of arbitrarily).
# ---------------------------------------------------------------------------

_Z53_SQL = (
    "WITH rev AS (SELECT l_suppkey,"
    " SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev"
    " FROM lineitem WHERE EXTRACT(YEAR FROM l_shipdate) = 1997"
    " GROUP BY l_suppkey)"
    " SELECT s.s_suppkey, s.s_name,"
    " ROUND(CAST(r.total_rev AS DOUBLE), 4) AS total_rev"
    " FROM supplier s JOIN rev r ON r.l_suppkey = s.s_suppkey"
    " WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)"
    " ORDER BY s.s_suppkey"
)


@register(
    "z53_top_supplier",
    _Z53_SQL,
    "TPC-H Q15 shape: an aggregate CTE consumed as both rows and an"
    " uncorrelated scalar MAX filter over itself (the view-based top"
    " supplier), with DECIMAL-exact equality."
    " z-prefix: past the gate window by design; tools/check.py covers it",
)
def z53(spark: SparkSession, sf: str) -> DataFrame:
    from pw_etl_scrumptious_squad_spark import api

    return api.sql(spark, sf, _Z53_SQL)


# ---------------------------------------------------------------------------
# Q19: the disjunctive join-predicate shape — OR of conjunctions mixing
# both tables' columns, which the optimizer must not turn into a
# cartesian product (the common p_partkey = l_partkey equality stays a
# hash-join key; the OR becomes a residual filter).
# ---------------------------------------------------------------------------

_Z54_SQL = (
    "SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4)"
    " AS revenue,"
    " CAST(COUNT(*) AS BIGINT) AS n_items"
    " FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey"
    " WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5"
    " AND l.l_quantity BETWEEN 1 AND 11)"
    " OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10"
    " AND l.l_quantity BETWEEN 10 AND 20)"
    " OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15"
    " AND l.l_quantity BETWEEN 20 AND 30)"
)


@register(
    "z54_disjunctive_join",
    _Z54_SQL,
    "TPC-H Q19 shape: equi join with an OR-of-conjunctions residual"
    " predicate mixing both sides' columns; the shared p_partkey ="
    " l_partkey equality must remain the hash-join key."
    " z-prefix: past the gate window by design; tools/check.py covers it",
)
def z54(spark: SparkSession, sf: str) -> DataFrame:
    from pw_etl_scrumptious_squad_spark import api

    return api.sql(spark, sf, _Z54_SQL)
