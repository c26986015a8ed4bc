"""TPC-H query corpus, adapted to the driver's reduced schema.

The reference's declared correctness contract is TPC-H q1–q22 except q15
(``rust/benchmarks/tpch/queries/*.sql``; q15 absent — SURVEY.md §5), with the
integration gate on q1,3,5,6,10,12 (``rust/benchmarks/tpch/run.sh:6``).

The driver's synthetic tables (TESTDATA.md) are a *reduced* TPC-H: there is
no ``partsupp`` table and several columns are missing (l_shipmode,
l_commitdate/receiptdate, c_phone/c_address, p_container/p_mfgr,
o_shippriority/o_clerk, …).  Each query below keeps the *operator shape* of
its reference counterpart (same joins/subquery/aggregation pattern, cited per
query) with constants and missing columns adapted to the available schema:

- partsupp links are replaced by the (l_partkey, l_suppkey) pairs in lineitem;
- commit/receipt lateness is modeled as ``l_shipdate > o_orderdate + INTERVAL``;
- c_phone country codes become the trailing digits of ``c_name``;
- l_shipmode buckets become ``l_returnflag``, p_container filters are dropped.

Every aggregate follows the hash-stability discipline of
:mod:`ballista_spark.queries.base`.  LIMIT queries carry unique tie-break sort
keys so the selected row *set* is deterministic across engines.
"""

from __future__ import annotations

from ballista_spark.queries.base import Query, big_sum, dec_avg, dec_sum, year_of

REV = "l_extendedprice * (1 - l_discount)"

TPCH_QUERIES: dict[str, Query] = {}


def _q(name: str, doc: str, sql: str, oracle: str | None = None) -> None:
    TPCH_QUERIES[name] = Query(doc=doc, sql=sql, oracle=oracle)


# --------------------------------------------------------------------------
_q(
    "tpch_q1",
    "Pricing summary report (rust/benchmarks/tpch/queries/q1.sql) — "
    "filter + 8-agg groupBy; Spark plans partial/final hash agg "
    "(ballista.proto:370-384 equivalent) automatically.",
    f"""
SELECT l_returnflag,
       l_linestatus,
       {dec_sum("l_quantity", "sum_qty")},
       {dec_sum("l_extendedprice", "sum_base_price")},
       {dec_sum(REV, "sum_disc_price")},
       {dec_sum(f"{REV} * (1 + l_tax)", "sum_charge")},
       {dec_avg("l_quantity", "avg_qty")},
       {dec_avg("l_extendedprice", "avg_price")},
       {dec_avg("l_discount", "avg_disc")},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '2001-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)

_q(
    "tpch_q2",
    "Minimum-cost supplier (queries/q2.sql) — correlated scalar MIN subquery "
    "+ 5-way join; partsupp replaced by lineitem part-supplier pairs.  The "
    "Spark side runs the single-scan window form: Catalyst's decorrelation "
    "of the scalar subquery scans the lineitem-supplier-nation-region "
    "EUROPE join TWICE (once for the outer rows, once aggregated for the "
    "per-part minimum); a MIN window over l_partkey computes the same "
    "minimum on one scan — the correlated minimum ranges over ALL EUROPE "
    "lineitems of the partkey, which is exactly the window partition "
    "(r10: 0.48 s → 0.39 s at sf0.1, 10 → 6 jobs).  r11 moves the "
    "p_size=15 part join BELOW the window (the q17 argument: p_partkey "
    "is unique, the join key is the window partition key, and p_size "
    "filters whole partitions — every partition's row set is unchanged), "
    "so the window exchange carries only the ~2% of rows whose partkey "
    "survives the part filter instead of the whole EUROPE join — the "
    "r10 form's full-width window shuffle was measured flat-to-slower "
    "than classic at SF10 (guide §2.3: shuffle fewer bytes).  The oracle "
    "keeps the classic correlated form, so the gate re-checks the "
    "equivalence every run.",
    """
SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name,
       l_extendedprice AS min_price
FROM (
  SELECT p_partkey, p_name, s_acctbal, s_name, n_name, l_extendedprice,
         MIN(l_extendedprice) OVER (PARTITION BY l_partkey) AS minp
  FROM lineitem, supplier, nation, region, part
  WHERE s_suppkey = l_suppkey
    AND n_nationkey = s_nationkey
    AND r_regionkey = n_regionkey
    AND r_name = 'EUROPE'
    AND p_partkey = l_partkey
    AND p_size = 15
) eur
WHERE l_extendedprice = minp
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
    oracle="""
SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name,
       l_extendedprice AS min_price
FROM part, supplier, lineitem, nation, region
WHERE p_partkey = l_partkey
  AND s_suppkey = l_suppkey
  AND p_size = 15
  AND n_nationkey = s_nationkey
  AND r_regionkey = n_regionkey
  AND r_name = 'EUROPE'
  AND l_extendedprice = (
      SELECT MIN(l2.l_extendedprice)
      FROM lineitem l2, supplier s2, nation n2, region r2
      WHERE l2.l_partkey = p_partkey
        AND s2.s_suppkey = l2.l_suppkey
        AND n2.n_nationkey = s2.s_nationkey
        AND r2.r_regionkey = n2.n_regionkey
        AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
)

_q(
    "tpch_q3",
    "Shipping-priority (queries/q3.sql) — 3-way join + groupBy + top-10 "
    "(Spark fuses sort+limit into TakeOrderedAndProject); o_shippriority "
    "replaced by o_orderpriority.  FROM lists lineitem first: Spark's "
    "left-deep join build follows the FROM order, and customer-first made "
    "it broadcast the 319k-row filtered lineitem (17 MiB) to probe orders "
    "— lineitem-first streams the big table through broadcast dims "
    "instead (r10: 0.57 s → 0.49 s at sf0.1; identical result set, join "
    "order cannot change an inner-join result).",
    f"""
SELECT l_orderkey,
       {dec_sum(REV, "revenue")},
       o_orderdate,
       o_orderpriority
FROM lineitem, orders, customer
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < DATE '1998-03-15'
  AND l_shipdate > DATE '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
)

_q(
    "tpch_q4",
    "Order-priority checking (queries/q4.sql) — EXISTS correlated subquery; "
    "lateness modeled as shipdate > orderdate + 60 days (no commit/receipt "
    "dates in schema).  The Spark side runs the aggregate form: EXISTS(a "
    "lineitem with shipdate > X) ⟺ the order has lineitems AND its "
    "MAX(l_shipdate) > X (MAX ignores NULLs; an all-NULL or empty group "
    "fails both forms), so a map-side-partial MAX per order replaces the "
    "left-semi join whose build side was a 600k-row lineitem broadcast — "
    "r10: 0.97 s → 0.49 s at sf0.1, and at scale the partial aggregation "
    "shrinks the shuffle ~rows-per-order-fold while the semi join shipped "
    "every row.  The oracle keeps the classic EXISTS form, so the gate "
    "re-checks the equivalence every run.",
    """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
JOIN (
    SELECT l_orderkey, MAX(l_shipdate) AS max_ship
    FROM lineitem GROUP BY l_orderkey
) lx ON l_orderkey = o_orderkey
WHERE o_orderdate >= DATE '1997-07-01'
  AND o_orderdate < DATE '1997-07-01' + INTERVAL 3 MONTH
  AND max_ship > o_orderdate + INTERVAL 60 DAY
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1997-07-01'
  AND o_orderdate < DATE '1997-07-01' + INTERVAL 3 MONTH
  AND EXISTS (
      SELECT * FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)

_q(
    "tpch_q5",
    "Local-supplier volume (queries/q5.sql) — 6-way join incl. the "
    "customer-nation = supplier-nation constraint.  FROM lists lineitem "
    "first (same rationale as q3: customer-first made Spark broadcast the "
    "whole 600k-row lineitem, 33 MiB built single-threaded, to probe the "
    "150k-row orders; lineitem-first streams it through broadcast dims — "
    "r10: 0.92 s → 0.44 s at sf0.1, 9 → 6 jobs, identical results).",
    f"""
SELECT n_name, {dec_sum(REV, "revenue")}
FROM lineitem, orders, customer, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01'
  AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
)

_q(
    "tpch_q6",
    "Revenue-change forecast (queries/q6.sql) — pure scan+filter+agg; the "
    "predicate pushes to the parquet scan.",
    f"""
SELECT {dec_sum("l_extendedprice * l_discount", "revenue")}
FROM lineitem
WHERE l_shipdate >= DATE '1997-01-01'
  AND l_shipdate < DATE '1998-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
)

_q(
    "tpch_q7",
    "Volume shipping between two nations (queries/q7.sql) — self-joined "
    "nation dims + EXTRACT(YEAR) + disjunctive nation pairing.",
    f"""
SELECT supp_nation, cust_nation, l_year, {dec_sum("volume", "revenue")}
FROM (
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           {year_of("l_shipdate")} AS l_year,
           {REV} AS volume
    FROM supplier, lineitem, orders, customer, nation n1, nation n2
    WHERE s_suppkey = l_suppkey
      AND o_orderkey = l_orderkey
      AND c_custkey = o_custkey
      AND s_nationkey = n1.n_nationkey
      AND c_nationkey = n2.n_nationkey
      AND ((n1.n_name IN ('NATION_1', 'NATION_2') AND n2.n_name IN ('NATION_3', 'NATION_4'))
        OR (n1.n_name IN ('NATION_3', 'NATION_4') AND n2.n_name IN ('NATION_1', 'NATION_2')))
      AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)

_q(
    "tpch_q8",
    "National market share (queries/q8.sql) — 8-way join, CASE-in-SUM "
    "ratio; decimal-exact numerator/denominator.",
    f"""
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN nation = 'NATION_3'
                     THEN CAST(volume AS DECIMAL(18,6))
                     ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
       / CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE), 9) AS mkt_share
FROM (
    SELECT {year_of("o_orderdate")} AS o_year,
           {REV} AS volume,
           n2.n_name AS nation
    FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
    WHERE p_partkey = l_partkey
      AND s_suppkey = l_suppkey
      AND l_orderkey = o_orderkey
      AND o_custkey = c_custkey
      AND c_nationkey = n1.n_nationkey
      AND n1.n_regionkey = r_regionkey
      AND r_name = 'AMERICA'
      AND s_nationkey = n2.n_nationkey
      AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
      AND p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
ORDER BY o_year
""",
)

_q(
    "tpch_q9",
    "Product-type profit (queries/q9.sql) — LIKE filter + 5-way join + "
    "year/nation rollup; ps_supplycost replaced by a p_retailprice-based "
    "cost model.",
    f"""
SELECT nation, o_year, {dec_sum("amount", "sum_profit")}
FROM (
    SELECT n_name AS nation,
           {year_of("o_orderdate")} AS o_year,
           {REV} - p_retailprice * l_quantity * 0.01 AS amount
    FROM part, supplier, lineitem, orders, nation
    WHERE s_suppkey = l_suppkey
      AND p_partkey = l_partkey
      AND o_orderkey = l_orderkey
      AND s_nationkey = n_nationkey
      AND p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
)

_q(
    "tpch_q10",
    "Returned-item reporting (queries/q10.sql) — 4-way join + groupBy + "
    "top-20 by revenue.  FROM lists lineitem first (q3/q5 rationale: "
    "customer-first broadcast the 200k-row returnflag-filtered lineitem; "
    "lineitem-first streams it — r10: 0.56 s → 0.42 s at sf0.1).",
    f"""
SELECT c_custkey, c_name, {dec_sum(REV, "revenue")}, c_acctbal, n_name
FROM lineitem, orders, customer, nation
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate >= DATE '1997-10-01'
  AND o_orderdate < DATE '1997-10-01' + INTERVAL 3 MONTH
  AND l_returnflag = 'R'
  AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)

_q(
    "tpch_q11",
    "Important stock identification (queries/q11.sql) — HAVING over an "
    "uncorrelated scalar subquery (fraction-of-total); partsupp value "
    "replaced by lineitem extendedprice*quantity.",
    f"""
SELECT l_partkey AS ps_partkey, {dec_sum("l_extendedprice * l_quantity", "part_value")}
FROM lineitem, supplier, nation
WHERE l_suppkey = s_suppkey
  AND s_nationkey = n_nationkey
  AND n_name = 'NATION_8'
GROUP BY l_partkey
HAVING SUM(CAST((l_extendedprice * l_quantity) AS DECIMAL(18,6))) > (
    SELECT SUM(CAST((l_extendedprice * l_quantity) AS DECIMAL(18,6))) * 0.002
    FROM lineitem, supplier, nation
    WHERE l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
      AND n_name = 'NATION_8')
ORDER BY part_value DESC, ps_partkey
""",
)

_q(
    "tpch_q12",
    "Shipping-mode / priority classes (queries/q12.sql) — CASE-in-SUM "
    "conditional counts; l_shipmode buckets replaced by l_returnflag.",
    """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_shipdate >= DATE '1997-01-01'
  AND l_shipdate < DATE '1998-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)

_q(
    "tpch_q13",
    "Customer order-count distribution (queries/q13.sql) — LEFT OUTER JOIN "
    "with an extra join predicate + double aggregation.",
    """
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer LEFT OUTER JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
    GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)

_q(
    "tpch_q14",
    "Promotion effect (queries/q14.sql) — CASE-in-SUM percentage with "
    "decimal-exact numerator/denominator.",
    f"""
SELECT ROUND(CAST(100.00 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN CAST(({REV}) AS DECIMAL(18,6))
                              ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
       / CAST(SUM(CAST(({REV}) AS DECIMAL(18,6))) AS DOUBLE) , 9) AS promo_revenue
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= DATE '1997-09-01'
  AND l_shipdate < DATE '1997-10-01'
""",
)

# q15 is absent in the reference corpus (view-based; confirmed by
# python/examples/testquery.py excluding it) — omitted here for parity.

_q(
    "tpch_q16",
    "Part/supplier relationship (queries/q16.sql) — COUNT(DISTINCT) + "
    "NOT IN subquery; partsupp replaced by lineitem pairs, the complaints "
    "filter by negative supplier balance.",
    """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand <> 'Brand#1'
  AND p_size IN (1, 2, 3, 4, 5)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)

_q(
    "tpch_q17",
    "Small-quantity-order revenue (queries/q17.sql) — correlated AVG scalar "
    "subquery per part.  The Spark side runs the single-scan window form: "
    "Catalyst decorrelates the subquery into a SECOND, *unfiltered* "
    "aggregation of the whole lineitem by partkey (a full-table shuffle at "
    "100 TB); an AVG window over l_partkey on the Brand#3-joined rows "
    "computes the same per-part mean on one scan — part is unique per "
    "partkey, so the join drops no lineitem rows of a selected part and "
    "the window partition is exactly the correlated set (r10: 0.39 s → "
    "0.35 s at sf0.1; the scale win is the removed whole-table "
    "aggregation).  The oracle keeps the classic correlated form, so the "
    "gate re-checks the equivalence every run.",
    """
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0, 2)
       AS avg_yearly
FROM (
  SELECT l_extendedprice, l_quantity,
         AVG(l_quantity) OVER (PARTITION BY l_partkey) AS avgq
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#3'
) t
WHERE l_quantity < 0.2 * avgq
""",
    oracle="""
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0, 2)
       AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#3'
  AND l_quantity < (
      SELECT 0.2 * AVG(l2.l_quantity)
      FROM lineitem l2
      WHERE l2.l_partkey = p_partkey)
""",
)

_q(
    "tpch_q18",
    "Large-volume customers (queries/q18.sql) — top-100 by order value.  "
    "The Spark side runs the single-scan form: the per-order quantity sum "
    "is computed ONCE (it both filters >300 and is the output sum_qty — "
    "the orderkey determines the output group, so the two sums are the "
    "same number), replacing the classic IN-over-HAVING-subquery's second "
    "lineitem scan.  Verified equal at sf0.01/sf0.1/SF1/SF10 (SF10: "
    "8.2 s → 4.4 s); the oracle keeps the classic IN form so the gate "
    "re-checks the equivalence every run.",
    f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM (
    SELECT l_orderkey,
           {dec_sum("l_quantity", "sum_qty")}
    FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 300
) oq
JOIN orders ON o_orderkey = oq.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
""",
    oracle=f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       {dec_sum("l_quantity", "sum_qty")}
FROM customer, orders, lineitem
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 300)
  AND c_custkey = o_custkey
  AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
""",
)

_q(
    "tpch_q19",
    "Discounted revenue, disjunctive predicates (queries/q19.sql) — OR of "
    "three brand/size/quantity conjunctions (container/shipmode filters "
    "dropped with their columns).",
    f"""
SELECT {dec_sum(REV, "revenue")}
FROM lineitem, part
WHERE (p_partkey = l_partkey AND p_brand = 'Brand#1'
       AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 11)
   OR (p_partkey = l_partkey AND p_brand = 'Brand#2'
       AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 10 AND 20)
   OR (p_partkey = l_partkey AND p_brand = 'Brand#3'
       AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 20 AND 30)
""",
)

_q(
    "tpch_q20",
    "Potential part promotion (queries/q20.sql) — nested IN + HAVING "
    "subqueries over part-filtered lineitem volume.",
    """
SELECT s_name, s_acctbal
FROM supplier, nation
WHERE s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND p_name LIKE 'small%'
      AND l_shipdate >= DATE '1997-01-01'
      AND l_shipdate < DATE '1998-01-01'
    GROUP BY l_suppkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 100)
  AND s_nationkey = n_nationkey
  AND n_name = 'NATION_3'
ORDER BY s_name
""",
)

_q(
    "tpch_q21",
    "Suppliers who kept orders waiting (queries/q21.sql) — lateness "
    "modeled via shipdate vs orderdate.  The Spark side runs the "
    "single-scan window form: per-order distinct-supplier sets via "
    "COLLECT_SET windows replace the EXISTS + NOT EXISTS lineitem "
    "self-joins (a row qualifies iff it is late, its order has another "
    "supplier, and it is the order's ONLY late supplier), cutting three "
    "lineitem scans + two sort-merge join passes to one scan + one "
    "window shuffle — measured 13.2 s → 5.7 s at SF10, per-decade "
    "scaling 4.1× → 2.9×.  r10 replaces the two COLLECT_SET windows "
    "with four MIN/MAX windows (>1 distinct supplier ⟺ min ≠ max; "
    "exactly one distinct late supplier ⟺ min = max of the late-only "
    "values, which MIN/MAX see because they ignore the CASE's NULLs): "
    "O(1) window state instead of per-order hash sets — 0.56 s → "
    "0.49 s at sf0.1, and no set buffering on a skewed giant order.  "
    "The oracle keeps the classic EXISTS/NOT EXISTS formulation, so "
    "the correctness gate cross-checks the rewrite against the "
    "textbook semantics every run (verified equal at sf0.01/sf0.1/"
    "SF1/SF10; minmax twin re-verified at SF1/SF10 in r10).",
    """
SELECT s_name, COUNT(*) AS numwait
FROM (
  SELECT l_suppkey, late,
         MIN(l_suppkey) OVER w <> MAX(l_suppkey) OVER w AS multi_supp,
         MIN(CASE WHEN late THEN l_suppkey END) OVER w
           = MAX(CASE WHEN late THEN l_suppkey END) OVER w AS single_late
  FROM (
    SELECT l_orderkey, l_suppkey,
           l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE o_orderstatus = 'F'
  ) lo
  WINDOW w AS (PARTITION BY l_orderkey)
) t
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE late AND multi_supp AND single_late
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
    oracle="""
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
      SELECT * FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey
        AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
      SELECT * FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey
        AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
  AND s_nationkey = n_nationkey
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
)

_q(
    "tpch_q22",
    "Global sales opportunity (queries/q22.sql) — substring country code "
    "(from c_name digits; no c_phone in schema), uncorrelated AVG subquery, "
    "NOT EXISTS anti-join on large orders.",
    f"""
SELECT cntrycode, COUNT(*) AS numcust, {dec_sum("c_acctbal", "totacctbal")}
FROM (
    SELECT SUBSTRING(c_name FROM 17 FOR 2) AS cntrycode, c_acctbal, c_custkey
    FROM customer
    WHERE SUBSTRING(c_name FROM 17 FOR 2) IN ('01', '02', '12', '13', '23', '24', '34', '35', '45', '46', '56', '57')
      AND c_acctbal > (
          SELECT AVG(c_acctbal) FROM customer
          WHERE c_acctbal > 0.00
            AND SUBSTRING(c_name FROM 17 FOR 2)
                IN ('01', '02', '12', '13', '23', '24', '34', '35', '45', '46', '56', '57'))
) custsale
WHERE NOT EXISTS (
    SELECT * FROM orders
    WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
GROUP BY cntrycode
ORDER BY cntrycode
""",
)
