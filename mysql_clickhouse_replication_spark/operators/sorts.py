"""Sorts, limits, top-k (SURVEY.md section 2.G).

Reference parity: ClickHouse ORDER BY / LIMIT over replicated tables
(SURVEY.md section 3.1; [P:med]).

Scale notes: global ORDER BY is a range-partitioned shuffle (sampled
boundaries) — fine; ORDER BY + LIMIT k must plan as TakeOrderedAndProject
(per-partition heap + driver merge, no global sort) — asserted in
tests/test_plans.py. Top-k per group is one window shuffle on the group key.
Every ordering below carries a unique tiebreak column: a LIMIT over a tied
sort key is nondeterministic in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..session import table


@register(
    "sort_multi_key",
    oracle="""
SELECT c_custkey, c_name, NULLIF(c_nationkey, 5) AS nation_or_null, c_acctbal
FROM customer
ORDER BY NULLIF(c_nationkey, 5) ASC NULLS FIRST, c_acctbal DESC, c_custkey ASC
LIMIT 50
""",
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null placement (Spark's ASC default is
    NULLS FIRST, DuckDB's is NULLS LAST — always spell it out). LIMIT makes
    the ordering observable under the driver's order-insensitive hash."""
    c = table(spark, sf_dir, "customer")
    nation_or_null = F.nullif(F.col("c_nationkey"), F.lit(5))
    return (
        c.select(
            "c_custkey", "c_name", nation_or_null.alias("nation_or_null"), "c_acctbal"
        )
        .orderBy(
            F.col("nation_or_null").asc_nulls_first(),
            F.col("c_acctbal").desc(),
            F.col("c_custkey").asc(),
        )
        .limit(50)
    )


@register(
    "topk_global",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
""",
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (ClickHouse ORDER BY .. LIMIT): per-partition heaps,
    merged on the driver — O(k) memory, no global sort at any scale."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@register(
    "topk_per_group",
    oracle="""
SELECT o_orderpriority, o_orderkey, o_totalprice
FROM orders
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY o_orderpriority
    ORDER BY o_totalprice DESC, o_orderkey ASC) <= 3
""",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group: one shuffle on the group key; Spark rewrites
    rank<=k windows into a per-partition top-k (WindowGroupLimit) instead
    of fully sorting each partition."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    )


@register(
    "limit_offset",
    oracle="""
SELECT c_custkey, c_name FROM customer
ORDER BY c_custkey LIMIT 20 OFFSET 40
""",
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination — only deterministic over a total order (unique key)."""
    c = table(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_name").orderBy("c_custkey").offset(40).limit(20)
