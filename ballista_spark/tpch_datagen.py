"""Deterministic full-schema TPC-H generator (all 8 tables, incl.
``partsupp``) at configurable tiny scales — the value-parity fixture for
the reference's *verbatim* SQL corpus.

The driver's synthetic testdata (TESTDATA.md) is a *reduced* TPC-H: no
``partsupp`` and no ``l_shipmode``/``l_commitdate``/``l_receiptdate``, so
the graded ``tpch_q2/q11/q16/q20`` run shape-preserving adaptations.
This module closes the remaining fidelity gap: it emits the canonical
schemas of ``ballista_spark.tpch.TPCH_SCHEMAS`` (= the reference's
``get_schema``, rust/benchmarks/tpch/src/main.rs:267-359) with
dbgen-faithful value domains, so the reference's untouched
``rust/benchmarks/tpch/queries/q{1..22}.sql`` files run against it and
return non-empty, DuckDB-verifiable results
(tests/test_tpch_fullschema_values.py).

Faithfulness notes (all from the public TPC-H specification):

- value domains mirror dbgen: brands ``Brand#MN`` derived from the
  manufacturer, three-syllable types, container pairs, the 92-word
  p_name vocabulary, 7 ship modes, 4 ship instructions, 5 priorities,
  5 market segments, phone numbers ``<10+nationkey>-...``;
- ``partsupp`` uses dbgen's supplier-spreading formula (4 distinct
  suppliers per part) and **lineitem draws l_suppkey from the part's
  own partsupp suppliers**, so q9's ``(l_partkey, l_suppkey)`` join into
  partsupp hits, as it does on real dbgen output;
- customers ≡ 0 (mod 3) place no orders (q22's no-order population);
- ``l_returnflag``/``l_linestatus``/``o_orderstatus`` follow the spec's
  receipt/ship-date rules, ``o_totalprice`` is the line aggregate;
- a small deterministic block of parts is pinned to the constants the
  query corpus probes (Brand#23+MED BOX for q17, the q19 brand/container
  triples, ``forest%`` names for q20, size-15 ``%BRASS`` for q2,
  ``ECONOMY ANODIZED STEEL`` for q8) so every query stays non-empty at
  scales tiny enough for a per-commit test;
- supplier/customer nations round-robin over all 25 nations, so every
  single-nation query (q7/q8/q11/q20/q21) has its population.

Pure numpy + pyarrow — no Spark needed to generate, and the parquet it
writes is read identically by Spark and DuckDB.
"""

from __future__ import annotations

from datetime import date

import numpy as np
import pyarrow as pa

EPOCH = date(1970, 1, 1).toordinal()


def _d(y: int, m: int, dd: int) -> int:
    """days-since-epoch for a calendar date (arrow date32 unit)."""
    return date(y, m, dd).toordinal() - EPOCH


# --- fixed dimensions (public TPC-H spec, Clause 4.2.3) ---------------

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]

NATIONS: list[tuple[int, str, int]] = [
    (0, "ALGERIA", 0), (1, "ARGENTINA", 1), (2, "BRAZIL", 1),
    (3, "CANADA", 1), (4, "EGYPT", 4), (5, "ETHIOPIA", 0),
    (6, "FRANCE", 3), (7, "GERMANY", 3), (8, "INDIA", 2),
    (9, "INDONESIA", 2), (10, "IRAN", 4), (11, "IRAQ", 4),
    (12, "JAPAN", 2), (13, "JORDAN", 4), (14, "KENYA", 0),
    (15, "MOROCCO", 0), (16, "MOZAMBIQUE", 0), (17, "PERU", 1),
    (18, "CHINA", 2), (19, "ROMANIA", 3), (20, "SAUDI ARABIA", 4),
    (21, "VIETNAM", 2), (22, "RUSSIA", 3), (23, "UNITED KINGDOM", 3),
    (24, "UNITED STATES", 1),
]

P_NAME_WORDS = (
    "almond antique aquamarine azure beige bisque black blanched blue "
    "blush brown burlywood burnished chartreuse chiffon chocolate coral "
    "cornflower cornsilk cream cyan dark deep dim dodger drab firebrick "
    "floral forest frosted gainsboro ghost goldenrod green grey honeydew "
    "hot indian ivory khaki lace lavender lawn lemon light lime linen "
    "magenta maroon medium metallic midnight mint misty moccasin navajo "
    "navy olive orange orchid pale papaya peach peru pink plum powder "
    "puff purple red rose rosy royal saddle salmon sandy seashell sienna "
    "sky slate smoke snow spring steel tan thistle tomato turquoise "
    "violet wheat white yellow"
).split()

TYPE_S1 = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
TYPE_S2 = ["ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"]
TYPE_S3 = ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]
CONTAINER_S1 = ["SM", "LG", "MED", "JUMBO", "WRAP"]
CONTAINER_S2 = ["CASE", "BOX", "BAG", "JAR", "PKG", "PACK", "CAN", "DRUM"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
INSTRUCTIONS = ["DELIVER IN PERSON", "COLLECT COD", "NONE", "TAKE BACK RETURN"]
MODES = ["REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB"]

SUPPLIERS_PER_PART = 4

#: order/ship date window (dbgen: STARTDATE..ENDDATE-151days)
ORDER_LO, ORDER_HI = _d(1992, 1, 1), _d(1998, 8, 2)
#: the spec's "current date" pivot for returnflag/linestatus
CUTOFF = _d(1995, 6, 17)


def _words(rng: np.random.Generator, n_rows: int, n_words: int) -> np.ndarray:
    idx = rng.integers(0, len(P_NAME_WORDS), size=(n_rows, n_words))
    vocab = np.array(P_NAME_WORDS)
    return np.array([" ".join(row) for row in vocab[idx]])


def _phones(rng: np.random.Generator, nationkeys: np.ndarray) -> np.ndarray:
    a = rng.integers(100, 1000, len(nationkeys))
    b = rng.integers(100, 1000, len(nationkeys))
    c = rng.integers(1000, 10000, len(nationkeys))
    return np.array(
        [f"{10 + nk}-{x}-{y}-{z}" for nk, x, y, z in zip(nationkeys, a, b, c)]
    )


def _partsupp_suppliers(partkeys: np.ndarray, i: int, n_supp: int) -> np.ndarray:
    """dbgen's spreading formula: the i-th (0..3) supplier of a part —
    4 *distinct* suppliers per part, deterministic, join-consistent."""
    j = (partkeys - 1) // n_supp
    return (partkeys + i * (n_supp // SUPPLIERS_PER_PART + j)) % n_supp + 1


def generate_tpch(
    n_part: int = 2000,
    n_supp: int = 100,
    n_cust: int = 1500,
    n_orders: int = 15000,
    seed: int = 20260814,
) -> dict[str, pa.Table]:
    """All 8 TPC-H tables as arrow tables (schemas = TPCH_SCHEMAS)."""
    rng = np.random.default_rng(seed)

    region = pa.table(
        {
            "r_regionkey": pa.array(range(5), pa.int32()),
            "r_name": REGIONS,
            "r_comment": list(_words(rng, 5, 6)),
        }
    )
    nation = pa.table(
        {
            "n_nationkey": pa.array([n[0] for n in NATIONS], pa.int32()),
            "n_name": [n[1] for n in NATIONS],
            "n_regionkey": pa.array([n[2] for n in NATIONS], pa.int32()),
            "n_comment": list(_words(rng, 25, 6)),
        }
    )

    # --- part ---------------------------------------------------------
    pk = np.arange(1, n_part + 1)
    name_idx = rng.integers(0, len(P_NAME_WORDS), size=(n_part, 5))
    vocab = np.array(P_NAME_WORDS)
    p_name = np.array([" ".join(r) for r in vocab[name_idx]], dtype=object)
    mfgr_n = rng.integers(1, 6, n_part)
    brand_n = rng.integers(1, 6, n_part)
    p_brand = np.array([f"Brand#{m}{b}" for m, b in zip(mfgr_n, brand_n)], dtype=object)
    p_type = np.array(
        [
            f"{TYPE_S1[a]} {TYPE_S2[b]} {TYPE_S3[c]}"
            for a, b, c in zip(
                rng.integers(0, 6, n_part),
                rng.integers(0, 5, n_part),
                rng.integers(0, 5, n_part),
            )
        ],
        dtype=object,
    )
    p_size = rng.integers(1, 51, n_part)
    p_container = np.array(
        [
            f"{CONTAINER_S1[a]} {CONTAINER_S2[b]}"
            for a, b in zip(rng.integers(0, 5, n_part), rng.integers(0, 8, n_part))
        ],
        dtype=object,
    )
    # deterministic pins so the corpus constants always have a population
    for i in range(10, 20):   # q17: Brand#23 + MED BOX
        p_brand[i], p_container[i] = "Brand#23", "MED BOX"
    for i in range(20, 30):   # q19 branch 1
        p_brand[i] = "Brand#12"
        p_container[i] = ["SM CASE", "SM BOX", "SM PACK", "SM PKG"][i % 4]
        p_size[i] = 1 + (i % 5)
    for i in range(30, 40):   # q19 branch 2
        p_brand[i] = "Brand#23"
        p_container[i] = ["MED BAG", "MED BOX", "MED PKG", "MED PACK"][i % 4]
        p_size[i] = 1 + (i % 10)
    for i in range(40, 50):   # q19 branch 3
        p_brand[i] = "Brand#34"
        p_container[i] = ["LG CASE", "LG BOX", "LG PACK", "LG PKG"][i % 4]
        p_size[i] = 1 + (i % 15)
    for i in range(50, 60):   # q20: forest% names
        p_name[i] = "forest " + p_name[i]
    for i in range(60, 70):   # q2: size 15, %BRASS
        p_size[i] = 15
        p_type[i] = f"{TYPE_S1[i % 6]} {TYPE_S2[i % 5]} BRASS"
    for i in range(70, 80):   # q8: exact type
        p_type[i] = "ECONOMY ANODIZED STEEL"
    # dbgen's retail price formula
    p_retail = (90000 + ((pk // 10) % 20001) + 100 * (pk % 1000)) / 100.0
    part = pa.table(
        {
            "p_partkey": pa.array(pk, pa.int32()),
            "p_name": p_name.tolist(),
            "p_mfgr": [f"Manufacturer#{m}" for m in mfgr_n],
            "p_brand": p_brand.tolist(),
            "p_type": p_type.tolist(),
            "p_size": pa.array(p_size, pa.int32()),
            "p_container": p_container.tolist(),
            "p_retailprice": p_retail,
            "p_comment": list(_words(rng, n_part, 4)),
        }
    )

    # --- supplier -----------------------------------------------------
    sk = np.arange(1, n_supp + 1)
    s_nation = (sk - 1) % 25  # round-robin: every nation populated
    s_comment = _words(rng, n_supp, 8).astype(object)
    for i in range(0, n_supp, 13):  # q16's excluded complainers
        s_comment[i] = s_comment[i] + " Customer slow unhappy Complaints"
    supplier = pa.table(
        {
            "s_suppkey": pa.array(sk, pa.int32()),
            "s_name": [f"Supplier#{k:09d}" for k in sk],
            "s_address": list(_words(rng, n_supp, 3)),
            "s_nationkey": pa.array(s_nation, pa.int32()),
            "s_phone": list(_phones(rng, s_nation)),
            "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2),
            "s_comment": s_comment.tolist(),
        }
    )

    # --- partsupp -----------------------------------------------------
    ps_part = np.repeat(pk, SUPPLIERS_PER_PART)
    ps_i = np.tile(np.arange(SUPPLIERS_PER_PART), n_part)
    ps_supp = _partsupp_suppliers(ps_part, 0, n_supp)
    for i in range(1, SUPPLIERS_PER_PART):
        ps_supp = np.where(ps_i == i, _partsupp_suppliers(ps_part, i, n_supp), ps_supp)
    n_ps = len(ps_part)
    partsupp = pa.table(
        {
            "ps_partkey": pa.array(ps_part, pa.int32()),
            "ps_suppkey": pa.array(ps_supp, pa.int32()),
            "ps_availqty": pa.array(rng.integers(1, 10000, n_ps), pa.int32()),
            "ps_supplycost": np.round(rng.uniform(1.0, 1000.0, n_ps), 2),
            "ps_comment": list(_words(rng, n_ps, 6)),
        }
    )

    # --- customer -----------------------------------------------------
    ck = np.arange(1, n_cust + 1)
    c_nation = (ck - 1) % 25
    customer = pa.table(
        {
            "c_custkey": pa.array(ck, pa.int32()),
            "c_name": [f"Customer#{k:09d}" for k in ck],
            "c_address": list(_words(rng, n_cust, 3)),
            "c_nationkey": pa.array(c_nation, pa.int32()),
            "c_phone": list(_phones(rng, c_nation)),
            "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
            "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, n_cust)],
            "c_comment": list(_words(rng, n_cust, 8)),
        }
    )

    # --- orders + lineitem (built together for consistency) ----------
    ok = np.arange(1, n_orders + 1)
    # customers ≡ 0 (mod 3) never order (q22's anti-join population)
    ordering_custs = ck[ck % 3 != 0]
    o_cust = rng.choice(ordering_custs, n_orders)
    o_date = rng.integers(ORDER_LO, ORDER_HI + 1, n_orders)
    o_comment = _words(rng, n_orders, 8).astype(object)
    for i in range(0, n_orders, 10):  # q13's filtered pattern
        o_comment[i] = o_comment[i] + " special deposits among requests"

    lines_per_order = rng.integers(1, 8, n_orders)
    # q18 probes sum(l_quantity) > 300 per order — a ~1e-5-rate shape on
    # real dbgen; pin the first five orders to 7 max-quantity lines so
    # the query stays non-empty at test scale
    lines_per_order[:5] = 7
    l_order = np.repeat(ok, lines_per_order)
    l_odate = np.repeat(o_date, lines_per_order)
    n_l = len(l_order)
    l_linenumber = (
        np.arange(n_l) - np.repeat(np.cumsum(lines_per_order) - lines_per_order, lines_per_order) + 1
    )
    l_part = rng.integers(1, n_part + 1, n_l)
    # supplier drawn from the part's OWN partsupp suppliers (q9 joins
    # lineitem→partsupp on both keys; dbgen guarantees the hit, so do we)
    l_supp = _partsupp_suppliers(l_part, 0, n_supp)
    pick = rng.integers(0, SUPPLIERS_PER_PART, n_l)
    for i in range(1, SUPPLIERS_PER_PART):
        l_supp = np.where(pick == i, _partsupp_suppliers(l_part, i, n_supp), l_supp)
    l_qty = rng.integers(1, 51, n_l).astype(np.float64)
    l_qty[l_order <= 5] = 50.0  # the q18 pin (sum = 350 > 300)
    l_extended = np.round(l_qty * p_retail[l_part - 1], 2)
    l_discount = np.round(rng.integers(0, 11, n_l) / 100.0, 2)
    l_tax = np.round(rng.integers(0, 9, n_l) / 100.0, 2)
    l_ship = l_odate + rng.integers(1, 122, n_l)
    l_commit = l_odate + rng.integers(30, 91, n_l)
    l_receipt = l_ship + rng.integers(1, 31, n_l)
    l_status = np.where(l_ship > CUTOFF, "O", "F")
    l_flag = np.where(
        l_receipt <= CUTOFF, np.where(rng.random(n_l) < 0.5, "R", "A"), "N"
    )

    # order-level rollups (lines of one order are contiguous)
    starts = np.cumsum(lines_per_order) - lines_per_order
    gross = l_extended * (1 + l_tax) * (1 - l_discount)
    o_total = np.round(np.add.reduceat(gross, starts), 2)
    n_open = np.add.reduceat((l_status == "O").astype(np.int64), starts)
    o_status = np.where(
        n_open == lines_per_order, "O", np.where(n_open == 0, "F", "P")
    )

    orders = pa.table(
        {
            "o_orderkey": pa.array(ok, pa.int32()),
            "o_custkey": pa.array(o_cust, pa.int32()),
            "o_orderstatus": o_status.tolist(),
            "o_totalprice": o_total,
            "o_orderdate": pa.array(o_date.astype("int32"), pa.date32()),
            "o_orderpriority": [PRIORITIES[i] for i in rng.integers(0, 5, n_orders)],
            "o_clerk": [f"Clerk#{i:09d}" for i in rng.integers(1, 1001, n_orders)],
            "o_shippriority": pa.array(np.zeros(n_orders, np.int32), pa.int32()),
            "o_comment": o_comment.tolist(),
        }
    )
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(l_order, pa.int32()),
            "l_partkey": pa.array(l_part, pa.int32()),
            "l_suppkey": pa.array(l_supp, pa.int32()),
            "l_linenumber": pa.array(l_linenumber, pa.int32()),
            "l_quantity": l_qty,
            "l_extendedprice": l_extended,
            "l_discount": l_discount,
            "l_tax": l_tax,
            "l_returnflag": l_flag.tolist(),
            "l_linestatus": l_status.tolist(),
            "l_shipdate": pa.array(l_ship.astype("int32"), pa.date32()),
            "l_commitdate": pa.array(l_commit.astype("int32"), pa.date32()),
            "l_receiptdate": pa.array(l_receipt.astype("int32"), pa.date32()),
            "l_shipinstruct": [INSTRUCTIONS[i] for i in rng.integers(0, 4, n_l)],
            "l_shipmode": [MODES[i] for i in rng.integers(0, 7, n_l)],
            "l_comment": list(_words(rng, n_l, 4)),
        }
    )

    return {
        "region": region,
        "nation": nation,
        "part": part,
        "supplier": supplier,
        "partsupp": partsupp,
        "customer": customer,
        "orders": orders,
        "lineitem": lineitem,
    }


def write_tpch(out_dir: str, **kwargs) -> dict[str, str]:
    """Generate and write ``<out_dir>/<table>.parquet``; returns paths."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name, table in generate_tpch(**kwargs).items():
        path = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(table, path)
        paths[name] = path
    return paths
