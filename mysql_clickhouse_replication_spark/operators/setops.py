"""Set operations (SURVEY.md section 2.H).

Reference parity: ClickHouse UNION [ALL|DISTINCT] / INTERSECT / EXCEPT over
replicated tables (SURVEY.md section 3.1; [P:med]).

Scale notes: UNION ALL is free (no shuffle); DISTINCT/INTERSECT/EXCEPT each
hash-shuffle on the full row — at 100 TB prefer pre-aggregated keys (as the
queries below do: project to the key column first, then set-op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..session import table


def _cust_keys(spark, sf_dir):
    return table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key")
    )


def _supp_keys(spark, sf_dir):
    return table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("key")
    )


@register(
    "set_union_all",
    oracle="""
SELECT c_custkey AS key FROM customer
UNION ALL
SELECT s_suppkey AS key FROM supplier
""",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_keys(spark, sf_dir).unionByName(_supp_keys(spark, sf_dir))


@register(
    "set_union_distinct",
    oracle="""
SELECT c_custkey AS key FROM customer
UNION
SELECT s_suppkey AS key FROM supplier
""",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_keys(spark, sf_dir).unionByName(_supp_keys(spark, sf_dir)).distinct()


@register(
    "set_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@register(
    "set_except",
    oracle="""
SELECT o_custkey AS key FROM orders
EXCEPT ALL
SELECT c_custkey AS key FROM customer
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset semantics. Orders-side custkeys carry
    multiplicity = #orders per customer, the customer side exactly 1, so
    the difference keeps each custkey (#orders - 1) times — a non-empty,
    duplicate-preserving result that actually exercises the multiset path
    (customer EXCEPT orders is empty on the fixtures: every customer has
    an order)."""
    o = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("key"))
    c = _cust_keys(spark, sf_dir)
    return o.exceptAll(c)
