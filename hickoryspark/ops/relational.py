"""Relational analytics over the TPC-H-ish tables — the joins /
aggregations / sorts / top-k the reference lacks (SURVEY.md §2.8),
expressed the way a 100 TB Spark job should be:

- dimension tables (region/nation/customer) are broadcast — the fact
  scan never shuffles for them;
- monetary aggregates run in DECIMAL(18,4) INTERNALLY: exact,
  associative, reproducible regardless of partitioning/add order (a
  DOUBLE sum's value depends on reduction order, which would break
  exact cross-engine parity). Final OUTPUT columns are cast to
  ROUND(double, 6): pandas-path collection renders DECIMAL as float64
  with different formatting than fetchall()'s Decimal, which broke
  value hashes in CORRECTNESS_r03 despite identical values;
- top-k is agg-then-rank over the already-tiny grouped result, never a
  global sort of the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders ⋈ customer ⋈ nation(broadcast): exact revenue
    sum(extendedprice*(1-discount)) per nation, only open orders."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") != "F")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.sum(rev).alias("_rev"),
            F.count("*").alias("n_lineitems"),
        )
        .select(
            "n_name",
            F.round(F.col("_rev").cast("double"), 6).alias("revenue"),
            "n_lineitems",
        )
    )


def top_customers(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Top-k customers by exact order revenue: agg first (tiny result),
    rank second — never a full sort of the joined fact table."""
    from pyspark.sql.window import Window

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            # exact decimal sum internally; hash-stable double out
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
                .cast("double"),
                6,
            ).alias("total"),
            F.count("*").alias("n_orders"),
        )
    )
    ranked = per_cust.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("total").desc(), F.col("o_custkey"))
        ),
    ).where(F.col("rank") <= k)
    return (
        ranked.join(F.broadcast(cust), ranked["o_custkey"] == cust["c_custkey"])
        .select(
            "rank",
            F.col("c_custkey").alias("custkey"),
            "c_mktsegment",
            "total",
            "n_orders",
        )
    )


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: per (returnflag, linestatus)
    exact sums/averages over lineitem with a shipdate filter pushed to
    the parquet scan."""
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-01")
    )
    dec = lambda c: F.col(c).cast("decimal(18,4)")
    disc_price = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount"))
    as_out = lambda c: F.round(c.cast("double"), 6)
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            as_out(F.sum(dec("l_quantity"))).alias("sum_qty"),
            as_out(F.sum(dec("l_extendedprice"))).alias("sum_base"),
            as_out(F.sum(disc_price)).alias("sum_disc_price"),
            F.count("*").alias("n_rows"),
        )
    )
