"""TPC-H schema stub — parity with the reference's schema-only helper
(flock/src/datasource/tpch/mod.rs; the reference registers schemas without a
generator, and so do we)."""

from __future__ import annotations

from flock_tpu.sql.catalog import Catalog, Table

TPCH_TABLES = {
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate", "l_commitdate",
                 "l_receiptdate"),
    "orders": ("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
               "o_orderdate", "o_orderpriority", "o_shippriority"),
    "customer": ("c_custkey", "c_name", "c_nationkey", "c_acctbal",
                 "c_mktsegment"),
    "part": ("p_partkey", "p_name", "p_brand", "p_type", "p_size"),
    "supplier": ("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "nation": ("n_nationkey", "n_name", "n_regionkey"),
    "region": ("r_regionkey", "r_name"),
}

_UNIQUE = {"orders": "o_orderkey", "customer": "c_custkey",
           "part": "p_partkey", "supplier": "s_suppkey",
           "nation": "n_nationkey", "region": "r_regionkey"}


def tpch_catalog() -> Catalog:
    c = Catalog()
    for name, cols in TPCH_TABLES.items():
        c.register(Table(name, cols, unique_key=_UNIQUE.get(name)))
    return c
