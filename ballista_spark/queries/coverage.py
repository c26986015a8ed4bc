"""Operator-coverage corpus — one entry per SURVEY.md §2 operator/expression
family not already pinned down by the TPC-H suite.

Coverage map (reference citation → entry):

- logical operators (ballista.proto:164-179): projection/selection →
  cov_select_filter; sort → cov_sort_limit; limit/offset → cov_sort_limit,
  cov_limit_offset; aggregate → cov_agg_basic; join (INNER/LEFT/RIGHT wire
  enum, ballista.proto:266-270) → cov_join_*; repartition
  (ballista.proto:219-230) → cov_repartition_hash/roundrobin;
  empty relation (ballista.proto:232-234) → cov_empty_relation.
- expressions (ballista.proto:14-78,134-161): between/in/like/isnull/case/
  cast/negative → cov_predicates, cov_case_cast.
- aggregates (ballista.proto:121-127 + count_distinct) → cov_agg_basic.
- scalar fns (ballista.proto:80-114) → cov_scalar_math, cov_scalar_string,
  cov_scalar_hash, cov_datetime, cov_nullif.
- beyond-parity upgrades called out in SURVEY.md §2.7/§2.8 (full/semi/anti
  joins, set ops, windows, rollup/cube, pivot) → cov_join_full/semi/anti,
  cov_setops_*, cov_window_*, cov_rollup, cov_cube, cov_pivot.

Spark side uses the BallistaDataFrame API for the operators the reference
exposed as client methods (joins, repartition, sort, aggregate) so the
wrapper surface itself is exercised; pure-SQL entries share text with the
oracle.  Hash-stability discipline per queries/base.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ballista_spark.dataframe import BallistaDataFrame
from ballista_spark.queries.base import Query, dec_sum
from ballista_spark.sources.registry import load_table, register_tables

COVERAGE_QUERIES: dict[str, Query] = {}

_DEC = "decimal(18,6)"


def _q(name: str, doc: str, sql: str, oracle: str | None = None) -> None:
    COVERAGE_QUERIES[name] = Query(doc=doc, sql=sql, oracle=oracle)


def _b(name: str, doc: str, builder, oracle: str) -> None:
    COVERAGE_QUERIES[name] = Query(doc=doc, builder=builder, oracle=oracle)


def _dsum(col: str) -> F.Column:
    """DataFrame-side decimal-exact sum (mirror of base.dec_sum, incl. the
    money-granularity ROUND that absorbs large-scale halfway-cast drift)."""
    return F.round(F.sum(F.col(col).cast(_DEC)), 2).cast("double")


# --- projection / selection / predicates ------------------------------------

_q(
    "cov_select_filter",
    "Projection + Selection (ballista.proto:204-212) with BETWEEN / IN / "
    "LIKE / IS NOT NULL / NOT / negation (proto:47-78,134-139).",
    """
SELECT p_partkey, p_name, -p_retailprice AS neg_price
FROM part
WHERE p_size BETWEEN 10 AND 30
  AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
  AND p_name LIKE '%a%'
  AND p_type IS NOT NULL
  AND NOT (p_size = 20)
ORDER BY p_partkey
""",
)

_q(
    "cov_predicates",
    "Boolean operator matrix (And/Or/Eq/NotEq/Lt/LtEq/Gt/GtEq — "
    "ballista.proto:64-68) as filter counts.",
    """
SELECT COUNT(*) AS n_all,
       CAST(SUM(CASE WHEN o_totalprice > 100000.0 AND o_orderstatus = 'O'
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_and,
       CAST(SUM(CASE WHEN o_totalprice <= 2000.0 OR o_orderstatus <> 'O'
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_or,
       CAST(SUM(CASE WHEN o_totalprice >= 499000.0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_ge,
       CAST(SUM(CASE WHEN o_totalprice < 1100.0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_lt
FROM orders
""",
)

# --- sort / limit -----------------------------------------------------------

_q(
    "cov_sort_limit",
    "Multi-key Sort with explicit asc/desc + nulls ordering "
    "(ballista.proto:157-161,214-217) fused with Limit → Spark "
    "TakeOrderedAndProject.",
    """
SELECT c_custkey, c_acctbal, c_mktsegment
FROM customer
ORDER BY c_mktsegment ASC NULLS FIRST, c_acctbal DESC NULLS LAST, c_custkey
LIMIT 50
""",
)

_q(
    "cov_limit_offset",
    "LIMIT + OFFSET pagination over a total order (beyond-parity; reference "
    "had global/local limit only, ballista.proto:391-399).",
    """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_orderkey
LIMIT 25 OFFSET 100
""",
)

# --- joins (wire enum inner/left/right + Spark upgrades) --------------------


def _join_builder(how: str, select_sql: str):
    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        cust = BallistaDataFrame(load_table(spark, sf_dir, "customer"))
        orders = BallistaDataFrame(load_table(spark, sf_dir, "orders"))
        joined = cust.join(orders, on=[cust.df.c_custkey == orders.df.o_custkey], how=how)
        joined.df.createOrReplaceTempView(f"cov_join_{how.replace('_', '')}")
        return spark.sql(select_sql.format(v=f"cov_join_{how.replace('_', '')}"))

    return build


_b(
    "cov_join_inner",
    "INNER hash equi-join via the DataFrame API (ballista.proto:266-270; "
    "reference client left join TODO — context.rs:287-290).",
    _join_builder(
        "inner",
        "SELECT c_mktsegment, COUNT(*) AS n, "
        "CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total "
        "FROM {v} GROUP BY c_mktsegment ORDER BY c_mktsegment",
    ),
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
)

_b(
    "cov_join_left",
    "LEFT outer join via DataFrame API; null-extension counted.",
    _join_builder(
        "left",
        "SELECT c_mktsegment, COUNT(*) AS n, COUNT(o_orderkey) AS n_matched "
        "FROM {v} GROUP BY c_mktsegment ORDER BY c_mktsegment",
    ),
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n, COUNT(o_orderkey) AS n_matched
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
)

_b(
    "cov_join_right",
    "RIGHT outer join via DataFrame API (wire enum's third type).",
    _join_builder(
        "right",
        "SELECT o_orderstatus, COUNT(*) AS n, COUNT(c_custkey) AS n_matched "
        "FROM {v} GROUP BY o_orderstatus ORDER BY o_orderstatus",
    ),
    oracle="""
SELECT o_orderstatus, COUNT(*) AS n, COUNT(c_custkey) AS n_matched
FROM customer RIGHT JOIN orders ON c_custkey = o_custkey
GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
)

_b(
    "cov_join_full",
    "FULL outer join (beyond wire enum — SURVEY.md §2.7 upgrade).",
    _join_builder(
        "full",
        "SELECT COUNT(*) AS n, COUNT(c_custkey) AS n_left, "
        "COUNT(o_orderkey) AS n_right FROM {v}",
    ),
    oracle="""
SELECT COUNT(*) AS n, COUNT(c_custkey) AS n_left, COUNT(o_orderkey) AS n_right
FROM customer FULL JOIN orders ON c_custkey = o_custkey
""",
)


def _semi_anti_builder(how: str):
    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        cust = BallistaDataFrame(load_table(spark, sf_dir, "customer"))
        big = BallistaDataFrame(
            load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
        )
        out = cust.join(big, on=[cust.df.c_custkey == big.df.o_custkey], how=how)
        return out.df.select("c_custkey", "c_name").orderBy("c_custkey")

    return build


_b(
    "cov_join_semi",
    "LEFT SEMI join = EXISTS (Catalyst-native; reference reached this only "
    "through SQL subqueries — SURVEY.md §2.7).",
    _semi_anti_builder("left_semi"),
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
ORDER BY c_custkey
""",
)

_b(
    "cov_join_anti",
    "LEFT ANTI join = NOT EXISTS.",
    _semi_anti_builder("left_anti"),
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
ORDER BY c_custkey
""",
)

_q(
    "cov_join_cross",
    "CROSS join (beyond wire enum) — small dims only; at scale this is a "
    "broadcast nested-loop, never a shuffle.",
    """
SELECT r_name, n_name
FROM region CROSS JOIN nation
ORDER BY r_name, n_name
""",
)

# --- set operations (absent in reference — SURVEY.md §2.8) ------------------

_q(
    "cov_setops_union_all",
    "UNION ALL of two filtered projections.",
    """
SELECT c_custkey AS k, 'hi' AS tag FROM customer WHERE c_acctbal > 9000.0
UNION ALL
SELECT c_custkey AS k, 'lo' AS tag FROM customer WHERE c_acctbal < -900.0
ORDER BY k, tag
""",
)

_q(
    "cov_setops_union",
    "UNION DISTINCT (dedup across branches).",
    """
SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 5000.0
UNION
SELECT s_nationkey AS k FROM supplier WHERE s_acctbal > 5000.0
ORDER BY k
""",
)

_q(
    "cov_setops_intersect",
    "INTERSECT of customer and supplier nation sets.",
    """
SELECT c_nationkey AS k FROM customer
INTERSECT
SELECT s_nationkey AS k FROM supplier
ORDER BY k
""",
)

_q(
    "cov_setops_except",
    "EXCEPT (nations with customers but no suppliers).",
    """
SELECT c_nationkey AS k FROM customer
EXCEPT
SELECT s_nationkey AS k FROM supplier
ORDER BY k
""",
)

_q(
    "cov_distinct",
    "SELECT DISTINCT over a multi-column projection.",
    """
SELECT DISTINCT o_orderstatus, o_orderpriority
FROM orders
ORDER BY o_orderstatus, o_orderpriority
""",
)

# --- aggregates -------------------------------------------------------------

_q(
    "cov_agg_basic",
    "Full wire aggregate enum MIN/MAX/SUM/AVG/COUNT (ballista.proto:121-127) "
    "+ COUNT(DISTINCT) (python/src/functions.rs:59-64).",
    f"""
SELECT o_orderstatus,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       {dec_sum("o_totalprice", "sum_price")},
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(o_totalprice), 6) AS avg_price,
       COUNT(*) AS n,
       COUNT(DISTINCT o_custkey) AS n_cust
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)

_q(
    "cov_agg_global",
    "Aggregation without GROUP BY (single global group).",
    f"""
SELECT COUNT(*) AS n, MIN(l_shipdate) AS first_ship, MAX(l_shipdate) AS last_ship,
       {dec_sum("l_quantity", "total_qty")}
FROM lineitem
""",
)

_q(
    "cov_rollup",
    "ROLLUP hierarchy region→nation (beyond reference — SURVEY.md §2.8).",
    """
SELECT r_name, n_name, COUNT(*) AS n_suppliers
FROM supplier, nation, region
WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
""",
)

_q(
    "cov_cube",
    "CUBE over two independent dimensions.",
    f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       {dec_sum("o_totalprice", "total")}
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
)


def _pivot_builder(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2).cast("double"))
        .orderBy("o_orderpriority")
    )


_b(
    "cov_pivot",
    "Pivot (DataFrame API; oracle via CASE-in-SUM) — beyond reference.",
    _pivot_builder,
    oracle="""
SELECT o_orderpriority,
       CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'O'
                THEN CAST(o_totalprice AS DECIMAL(18,6)) END), 2) AS DOUBLE) AS "O",
       CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'F'
                THEN CAST(o_totalprice AS DECIMAL(18,6)) END), 2) AS DOUBLE) AS "F",
       CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'P'
                THEN CAST(o_totalprice AS DECIMAL(18,6)) END), 2) AS DOUBLE) AS "P"
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)

# --- window functions (absent in reference — SURVEY.md §2.8) ----------------


def _window_rank_builder(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        cust.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("c_mktsegment", "rn")
    )


_b(
    "cov_window_rank",
    "Top-3-per-group via row_number/rank/dense_rank windows.",
    _window_rank_builder,
    oracle="""
SELECT c_mktsegment, c_custkey, c_acctbal, rn, rnk, drnk FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
         CAST(RANK() OVER w AS BIGINT) AS rnk,
         CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
  FROM customer
  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
) t WHERE rn <= 3 ORDER BY c_mktsegment, rn
""",
)


def _window_agg_builder(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lagw = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(F.col("o_totalprice").cast(_DEC)).over(w), 2).cast("double").alias("running_total"),
        F.lag("o_totalprice", 1).over(lagw).alias("prev_price"),
        F.lead("o_totalprice", 1).over(lagw).alias("next_price"),
    ).orderBy("o_custkey", "o_orderkey")


_b(
    "cov_window_agg",
    "Running SUM + LAG/LEAD over an ordered per-customer window "
    "(decimal-exact running totals).",
    _window_agg_builder,
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
           AS running_total,
       LAG(o_totalprice, 1) OVER w AS prev_price,
       LEAD(o_totalprice, 1) OVER w AS next_price
FROM orders WHERE o_custkey < 50
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
""",
)

# --- CASE / CAST ------------------------------------------------------------

_q(
    "cov_case_cast",
    "Searched + simple CASE (ballista.proto:141-150) and CAST matrix "
    "(proto:152-155): string→int, int→double, timestamp→date, int→string.",
    """
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000.0 THEN 'big'
            WHEN o_totalprice > 100000.0 THEN 'mid'
            ELSE 'small' END AS size_class,
       CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'final'
            ELSE 'other' END AS status_word,
       CAST(SUBSTRING(CAST(o_orderkey AS VARCHAR(20)), 1, 1) AS BIGINT) AS first_digit,
       CAST(o_custkey AS DOUBLE) AS cust_d,
       CAST(o_orderdate AS DATE) AS od
FROM orders
WHERE o_orderkey <= 500
ORDER BY o_orderkey
""",
)

# --- scalar functions -------------------------------------------------------

_q(
    "cov_scalar_math",
    "Math function enum (ballista.proto:81-97) over the 100 distinct part "
    "sizes; ROUND(…, 9) absorbs cross-libm ulp differences.",
    """
SELECT p_size,
       ROUND(SQRT(CAST(p_size AS DOUBLE)), 9) AS f_sqrt,
       ROUND(EXP(CAST(p_size AS DOUBLE) / 50.0), 9) AS f_exp,
       ROUND(LN(CAST(p_size AS DOUBLE) + 1.0), 9) AS f_ln,
       ROUND(LOG2(CAST(p_size AS DOUBLE) + 1.0), 9) AS f_log2,
       ROUND(LOG10(CAST(p_size AS DOUBLE) + 1.0), 9) AS f_log10,
       ROUND(SIN(CAST(p_size AS DOUBLE)), 9) AS f_sin,
       ROUND(COS(CAST(p_size AS DOUBLE)), 9) AS f_cos,
       ROUND(ATAN(CAST(p_size AS DOUBLE)), 9) AS f_atan,
       CAST(FLOOR(p_retailprice) AS DOUBLE) AS f_floor,
       CAST(CEIL(p_retailprice) AS DOUBLE) AS f_ceil,
       ABS(-p_retailprice) AS f_abs,
       CAST(SIGN(p_retailprice - 1000.0) AS DOUBLE) AS f_sign,
       ROUND(p_retailprice / 7.0, 3) AS f_round
FROM (SELECT DISTINCT p_size, MIN(p_retailprice) AS p_retailprice
      FROM part GROUP BY p_size) t
ORDER BY p_size
""",
)

_q(
    "cov_scalar_string",
    "String function enum (ballista.proto:98-105): lower/upper/trim/ltrim/"
    "rtrim/concat/octet_length + substring.",
    """
SELECT c_custkey,
       LOWER(c_name) AS lo,
       UPPER(c_mktsegment) AS up,
       TRIM('  ' || c_mktsegment || ' ') AS trimmed,
       LTRIM('  ' || c_mktsegment) AS ltrimmed,
       RTRIM(c_mktsegment || '  ') AS rtrimmed,
       CONCAT(c_name, ':', c_mktsegment) AS joined,
       CAST(OCTET_LENGTH(c_name) AS BIGINT) AS blen,
       SUBSTRING(c_name FROM 1 FOR 8) AS prefix
FROM customer
WHERE c_custkey <= 100
ORDER BY c_custkey
""",
    oracle="""
SELECT c_custkey,
       LOWER(c_name) AS lo,
       UPPER(c_mktsegment) AS up,
       TRIM('  ' || c_mktsegment || ' ') AS trimmed,
       LTRIM('  ' || c_mktsegment) AS ltrimmed,
       RTRIM(c_mktsegment || '  ') AS rtrimmed,
       CONCAT(c_name, ':', c_mktsegment) AS joined,
       CAST(STRLEN(c_name) AS BIGINT) AS blen,
       SUBSTRING(c_name FROM 1 FOR 8) AS prefix
FROM customer
WHERE c_custkey <= 100
ORDER BY c_custkey
""",
)

_q(
    "cov_scalar_hash",
    "Hash enum subset shared by both engines: MD5 + SHA256 "
    "(ballista.proto:110-114; sha224/384/512 covered in unit tests).",
    """
SELECT c_custkey, MD5(c_name) AS h_md5, SHA2(c_name, 256) AS h_sha256
FROM customer
WHERE c_custkey <= 100
ORDER BY c_custkey
""",
    oracle="""
SELECT c_custkey, MD5(c_name) AS h_md5, SHA256(c_name) AS h_sha256
FROM customer
WHERE c_custkey <= 100
ORDER BY c_custkey
""",
)

_q(
    "cov_datetime",
    "DATE_TRUNC (ballista.proto:108 DATETRUNC) + EXTRACT family over the "
    "events stream table.",
    """
SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
       CAST(EXTRACT(YEAR FROM ts) AS BIGINT) AS y,
       CAST(EXTRACT(MONTH FROM ts) AS BIGINT) AS m,
       CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS h,
       COUNT(*) AS n
FROM events
GROUP BY 1, 2, 3, 4
ORDER BY day, h
""",
    oracle="""
SELECT CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
       CAST(EXTRACT(YEAR FROM CAST(ts AS TIMESTAMP)) AS BIGINT) AS y,
       CAST(EXTRACT(MONTH FROM CAST(ts AS TIMESTAMP)) AS BIGINT) AS m,
       CAST(EXTRACT(HOUR FROM CAST(ts AS TIMESTAMP)) AS BIGINT) AS h,
       COUNT(*) AS n
FROM events
GROUP BY 1, 2, 3, 4
ORDER BY day, h
""",
)

_q(
    "cov_nullif",
    "NULLIF (ballista.proto:107) + COALESCE null plumbing.",
    """
SELECT c_custkey,
       NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'was_building') AS coalesced
FROM customer
WHERE c_custkey <= 200
ORDER BY c_custkey
""",
)

_q(
    "cov_events_json",
    "JSON field extraction from the events props column (beyond reference — "
    "semi-structured support).",
    """
SELECT event_type,
       CAST(SUM(CAST(GET_JSON_OBJECT(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       COUNT(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       COUNT(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)

# --- repartition / empty relation ------------------------------------------


def _repartition_builder(kind: str):
    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = BallistaDataFrame(load_table(spark, sf_dir, "lineitem"))
        if kind == "hash":
            rep = li.repartition(8, F.col("l_orderkey"))
        else:
            rep = li.repartition(8)
        return (
            rep.aggregate(
                [F.col("l_returnflag")],
                [F.count(F.lit(1)).alias("n"), _dsum("l_quantity").alias("qty")],
            )
            .sort(F.col("l_returnflag").asc_nulls_first())
            .df
        )

    return build


_REPART_ORACLE = """
SELECT l_returnflag,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""

_b(
    "cov_repartition_hash",
    "Hash repartition (ballista.proto:219-230) — results invariant to "
    "partitioning, so the oracle is the plain aggregate.",
    _repartition_builder("hash"),
    oracle=_REPART_ORACLE,
)

_b(
    "cov_repartition_roundrobin",
    "Round-robin repartition (row placement nondeterministic, results "
    "partition-invariant — SURVEY.md §7.4).",
    _repartition_builder("rr"),
    oracle=_REPART_ORACLE,
)

_q(
    "cov_empty_relation",
    "EmptyRelation (ballista.proto:232-234): a WHERE FALSE scan keeps "
    "schema with zero rows.",
    """
SELECT o_orderkey, o_totalprice FROM orders WHERE 1 = 0
""",
)

# --- subquery shapes not already in TPC-H -----------------------------------

_q(
    "cov_in_subquery",
    "IN (uncorrelated subquery) — ballista.proto:74-78 generalized.",
    """
SELECT COUNT(*) AS n
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9500.0)
""",
)

_q(
    "cov_scalar_subquery",
    "Uncorrelated scalar subquery in a predicate.",
    """
SELECT COUNT(*) AS n_above_avg
FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
""",
)

# --- as-of join / sessionization / percentiles / grouping sets --------------
# (beyond-reference operators the guide calls out for time-series and OLAP)


def _asof_builder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ballista_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase")
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    return (
        asof_join(purchases, views, on="ts", by="user_id",
                  value_cols=["event_id", "value"])
        .select(
            "event_id",
            "user_id",
            F.col("event_id_asof").alias("view_event_id"),
            F.col("value_asof").alias("view_value"),
        )
        .orderBy("event_id")
    )


_b(
    "cov_asof_join",
    "Backward as-of join (operators.asof.asof_join — union+window "
    "composition, one shuffle): each purchase matched to the user's latest "
    "prior view.  Oracle uses DuckDB's native ASOF LEFT JOIN.",
    _asof_builder,
    oracle="""
SELECT l.event_id, l.user_id,
       r.event_id AS view_event_id, r.value AS view_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY l.event_id
""",
)

_q(
    "cov_sessionize_batch",
    "Batch sessionization via LAG + gap threshold (10 min) — the windowed "
    "counterpart of streaming session_window.",
    """
SELECT user_id,
       CAST(1 + SUM(CASE WHEN ts - prev > INTERVAL 10 MINUTE THEN 1 ELSE 0 END)
            AS BIGINT) AS n_sessions,
       COUNT(*) + 1 AS n_events
FROM (
    SELECT user_id, ts,
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
    FROM events
) t
WHERE prev IS NOT NULL
GROUP BY user_id
ORDER BY user_id
""",
)

_q(
    "cov_percentile",
    "Exact MEDIAN / PERCENTILE aggregates (beyond the 5-function wire enum).",
    """
SELECT l_returnflag,
       MEDIAN(l_quantity) AS med_qty,
       PERCENTILE(l_quantity, 0.25) AS q1_qty,
       PERCENTILE(l_quantity, 0.75) AS q3_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    oracle="""
SELECT l_returnflag,
       MEDIAN(l_quantity) AS med_qty,
       QUANTILE_CONT(l_quantity, 0.25) AS q1_qty,
       QUANTILE_CONT(l_quantity, 0.75) AS q3_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)

_q(
    "cov_grouping_sets",
    "Explicit GROUPING SETS (beyond reference — SURVEY.md §2.8).",
    f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       {dec_sum("o_totalprice", "total")}
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
)


def _range_join_builder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ballista_spark.operators.rangejoin import range_join

    ev = load_table(spark, sf_dir, "events")
    intervals = (
        ev.where(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.col("event_id").alias("signup_id"),
            F.col("ts").alias("start"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTE")).alias("end"),
        )
    )
    joined = range_join(
        ev.select("user_id", "ts", "event_id"),
        intervals,
        by="user_id",
        bin_width="30 minute",
    )
    return (
        joined.groupBy("signup_id")
        .agg(F.count("*").alias("n_events"))
        .orderBy("signup_id")
    )


_b(
    "cov_range_join",
    "Point-in-interval range join (operators.rangejoin.range_join — "
    "bin-bucketed equi-join + exact filter, no n^2): events within 30 "
    "minutes after each signup, per user.  Oracle is DuckDB's native "
    "inequality join.",
    _range_join_builder,
    oracle="""
SELECT s.signup_id, COUNT(*) AS n_events
FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events) e
JOIN (
  SELECT user_id, event_id AS signup_id,
         CAST(ts AS TIMESTAMP) AS s_ts,
         CAST(ts AS TIMESTAMP) + INTERVAL 30 MINUTE AS e_ts
  FROM events WHERE event_type = 'signup'
) s
  ON e.user_id = s.user_id AND e.ts >= s.s_ts AND e.ts < s.e_ts
GROUP BY s.signup_id
ORDER BY s.signup_id
""",
)


def _approx_distinct_builder(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .withColumn(
            "within_5pct",
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                <= F.col("exact_parts") * 0.05
            ),
        )
        .select("l_returnflag", "exact_parts", "within_5pct")
        .orderBy("l_returnflag")
    )


_b(
    "cov_approx_distinct",
    "HyperLogLog++ approx_count_distinct (the sketch path for 100 TB "
    "cardinalities) — the oracle checks the exact count and that the "
    "sketch landed within 5% (sketch values themselves are "
    "engine-specific).",
    _approx_distinct_builder,
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       TRUE AS within_5pct
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)

_q(
    "cov_funnel",
    "Event funnel: users reaching signup -> view -> purchase in order "
    "(MIN-timestamp staging per user; the standard conversion query).",
    """
SELECT COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN v_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS viewed,
       CAST(SUM(CASE WHEN p_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS purchased
FROM (
    SELECT s.user_id,
           MIN(v.ts) AS v_ts,
           MIN(p.ts) AS p_ts
    FROM (SELECT user_id, MIN(ts) AS s_ts FROM events
          WHERE event_type = 'signup' GROUP BY user_id) s
    LEFT JOIN events v
      ON v.user_id = s.user_id AND v.event_type = 'view' AND v.ts > s.s_ts
    LEFT JOIN events p
      ON p.user_id = s.user_id AND p.event_type = 'purchase' AND p.ts > s.s_ts
    GROUP BY s.user_id
) funnel
""",
)

_q(
    "cov_retention",
    "Daily retention cohorts: first-activity day x activity day counts.",
    """
SELECT cohort_day, activity_day, COUNT(DISTINCT user_id) AS n_users
FROM (
    SELECT e.user_id,
           CAST(DATE_TRUNC('day', f.first_ts) AS DATE) AS cohort_day,
           CAST(DATE_TRUNC('day', e.ts) AS DATE) AS activity_day
    FROM events e
    JOIN (SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id) f
      ON e.user_id = f.user_id
) t
WHERE activity_day <= cohort_day + INTERVAL 3 DAY
GROUP BY cohort_day, activity_day
ORDER BY cohort_day, activity_day
""",
    oracle="""
SELECT cohort_day, activity_day, COUNT(DISTINCT user_id) AS n_users
FROM (
    SELECT e.user_id,
           CAST(DATE_TRUNC('day', CAST(f.first_ts AS TIMESTAMP)) AS DATE) AS cohort_day,
           CAST(DATE_TRUNC('day', CAST(e.ts AS TIMESTAMP)) AS DATE) AS activity_day
    FROM events e
    JOIN (SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS first_ts
          FROM events GROUP BY user_id) f
      ON e.user_id = f.user_id
) t
WHERE activity_day <= cohort_day + INTERVAL 3 DAY
GROUP BY cohort_day, activity_day
ORDER BY cohort_day, activity_day
""",
)


def _union_by_name_builder(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = BallistaDataFrame(load_table(spark, sf_dir, "customer"))
    hi = cust.filter(F.col("c_acctbal") > 9000.0).select(
        F.col("c_custkey").alias("k"), F.lit("hi").alias("tag")
    )
    # deliberately reversed column order: unionByName must align by name
    lo = cust.filter(F.col("c_acctbal") < -900.0).select(
        F.lit("lo").alias("tag"), F.col("c_custkey").alias("k")
    )
    return hi.union(lo).sort(F.col("k").asc(), F.col("tag").asc()).df


_b(
    "cov_union_by_name",
    "unionByName with reversed column order (BallistaDataFrame.union aligns "
    "by name, not position — a positional UNION would cross-type here).",
    _union_by_name_builder,
    oracle="""
SELECT c_custkey AS k, 'hi' AS tag FROM customer WHERE c_acctbal > 9000.0
UNION ALL BY NAME
SELECT 'lo' AS tag, c_custkey AS k FROM customer WHERE c_acctbal < -900.0
ORDER BY k, tag
""",
)


_q(
    "cov_window_distribution",
    "Distribution window functions: NTILE / PERCENT_RANK / CUME_DIST "
    "(integer-ratio semantics — exact cross-engine).",
    """
SELECT c_custkey,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       PERCENT_RANK() OVER w AS pr,
       CUME_DIST() OVER w AS cd
FROM customer
WHERE c_custkey < 200
WINDOW w AS (ORDER BY c_acctbal, c_custkey)
ORDER BY c_custkey
""",
)

_q(
    "cov_string_advanced",
    "Extended string surface: regexp_replace, lpad/rpad, split_part, "
    "reverse, repeat, translate, strpos-family.",
    """
SELECT c_custkey,
       REGEXP_REPLACE(c_name, '[0-9]+', '#') AS squashed,
       LPAD(c_mktsegment, 12, '.') AS padded_l,
       RPAD(c_mktsegment, 12, '.') AS padded_r,
       SPLIT_PART(c_name, '#', 2) AS num_part,
       REVERSE(c_mktsegment) AS rev,
       REPEAT('ab', 3) AS rep,
       TRANSLATE(c_mktsegment, 'AEIOU', 'aeiou') AS translated,
       CAST(INSTR(c_name, '#') AS BIGINT) AS hash_pos
FROM customer
WHERE c_custkey <= 100
ORDER BY c_custkey
""",
)
