"""TPC-H-style relational coverage queries, rounds 2+ (Q2..Q22).

Together with the round-1 set (Q1/Q3/Q4/Q5/Q10/Q16/Q17/Q18 in
``__spark_entry__``) this completes all 22 TPC-H query *shapes* on the
driver's TPC-H-ish testdata.  The testdata has no ``partsupp`` table and
lacks a few columns (``l_shipmode``, ``l_commitdate``, ``l_receiptdate``,
``c_phone``, ``p_container``, comments), so the queries marked *adapted*
keep the structural skeleton of the spec query — correlated scalar
subqueries, EXISTS/NOT-EXISTS decorrelation, OR-of-AND predicate pushdown,
left-outer + double aggregation — on the columns that exist:

* Q2: ``partsupp`` is replaced by the observed offer relation
  ``min(l_extendedprice / l_quantity)`` per (part, supplier).
* Q9: ``ps_supplycost`` is proxied by ``0.5 * p_retailprice``.
* Q12: ``l_shipmode`` groups become lateness bands over
  ``l_shipdate - o_orderdate`` (the commit/receipt comparison).
* Q13: the comment filter becomes an order-priority filter.
* Q19: the container/shipmode conjuncts become size/quantity ranges.
* Q20: availqty/partsupp becomes shipped-quantity-per-supplier.
* Q21: receipt/commit lateness becomes ship-after-order+30d; the
  EXISTS / NOT EXISTS pair is decorrelated into per-order supplier
  counts (same semantics, shuffle-friendly at scale).
* Q22: the phone-prefix country code becomes ``c_nationkey``; "no
  orders" (vacuous here: every customer orders) becomes "no URGENT
  order".

Scale notes: every dimension side (region, nation, supplier, filtered
part/customer subsets, single-row aggregates) is broadcast; only
lineitem⋈orders shuffles, keyed on the uniform order key.  Reference
behaviour: these are beyond-reference relational coverage
(reference repo has no SQL engine; see SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 (adapted): min-cost supplier per European part.

    The correlated scalar subquery ``supply_cost = (select min ...)`` is
    decorrelated into a per-part min-aggregate joined back on equality —
    one extra small shuffle instead of a per-row subquery.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supply_cost")
    )
    eu = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            nation.n_regionkey == region.r_regionkey,
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    wanted = part.filter((F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY")).select(
        "p_partkey"
    )
    cand = offers.join(F.broadcast(eu), offers.l_suppkey == eu.s_suppkey).join(
        F.broadcast(wanted), offers.l_partkey == wanted.p_partkey
    )
    mincost = cand.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("supply_cost").alias("mincost")
    )
    return (
        cand.join(F.broadcast(mincost), cand.l_partkey == mincost.mk)
        .filter(F.col("supply_cost") == F.col("mincost"))
        .select(
            F.round("s_acctbal", 6).alias("s_acctbal"),
            "s_name",
            "n_name",
            "l_partkey",
            F.round("supply_cost", 6).alias("supply_cost"),
        )
    )


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: forecasting revenue change — pure scan-filter-aggregate.

    The whole query is one whole-stage-codegen span over the parquet
    scan; all three predicates push down to the reader.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 6).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: volume shipping between two nations, by year and direction."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.filter(F.col("l_shipdate").between("1995-01-01", "1996-12-31"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
    )


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: national market share inside one region's market, per year."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    wanted_part = part.filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    volume = (
        li.join(F.broadcast(wanted_part), li.l_partkey == F.col("p_partkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
            F.col("n2_region") == region.r_regionkey,
        )
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    return (
        volume.groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
                        0.0
                    )
                )
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
    )


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 (adapted): product-type profit by supplier nation and year.

    ``ps_supplycost`` does not exist here; cost is proxied by
    ``0.5 * p_retailprice`` per unit, keeping the join DAG and the
    two-level aggregate of the spec query.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part")
    nation = _t(spark, sf_dir, "nation")
    gear = part.filter(F.col("p_name").like("%gear%")).select(
        "p_partkey", "p_retailprice"
    )
    return (
        li.join(F.broadcast(gear), li.l_partkey == gear.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
                ),
                6,
            ).alias("profit")
        )
    )


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 (adapted): important stock — parts whose traded value for one
    nation's suppliers exceeds a fraction of that nation's total.

    The scalar subquery threshold is a single-row aggregate broadcast
    back over the grouped values (no second scan of the fact table).
    """
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    nat_supp = supp.join(
        F.broadcast(nation.filter(F.col("n_name") == "NATION_7")),
        supp.s_nationkey == nation.n_nationkey,
    ).select("s_suppkey")
    val = (
        li.join(F.broadcast(nat_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("v"))
    )
    thr = val.agg((F.sum("v") * F.lit(0.001)).alias("thr"))
    return (
        val.crossJoin(F.broadcast(thr))
        .filter(F.col("v") > F.col("thr"))
        .select("l_partkey", F.round("v", 6).alias("part_value"))
    )


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 (adapted): priority mix of late shipments, by lateness band.

    ``l_shipmode`` does not exist; the group key is the lateness band of
    ``l_shipdate - o_orderdate`` (late: 61..120 days, very_late: >120),
    keeping Q12's CASE-sum priority split.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    days_late = F.datediff("l_shipdate", "o_orderdate")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(days_late > 60)
        .withColumn(
            "band", F.when(days_late > 120, "very_late").otherwise("late")
        )
        .groupBy("band")
        .agg(
            F.sum(
                F.when(
                    F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
                ).otherwise(0)
            ).alias("high_cnt"),
            F.sum(
                F.when(
                    F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0
                ).otherwise(1)
            ).alias("low_cnt"),
        )
    )


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 (adapted): customer distribution by order count.

    Left outer join so zero-order customers survive, then a second
    aggregation over the counts; the comment filter of the spec becomes
    an order-priority filter.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: promotion revenue share in one month — CASE-sum ratio."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .join(F.broadcast(part.select("p_partkey", "p_type")), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(0.0))
                / F.sum(disc),
                6,
            ).alias("promo_revenue")
        )
    )


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: top supplier — revenue view + max scalar subquery.

    The ``max(total_revenue)`` subquery is a single-row aggregate
    broadcast against the grouped view; revenue is rounded to 6 decimals
    on both engines *before* the max/equality so the tie test is exact.
    """
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("l_suppkey", "s_name", "total_revenue")
    )


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 (adapted): discounted revenue under OR-of-AND predicates.

    Container/shipmode conjuncts become size/quantity ranges; the point
    of the query — a disjunction spanning both join sides that must not
    block pushdown of the shared part join — is preserved.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
        li.l_partkey == part.p_partkey,
    )
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & q.between(20, 30))
    )
    return j.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 (adapted): suppliers moving real volume of 'small%' parts.

    The partsupp availqty subquery becomes shipped-quantity-per-supplier
    with a HAVING threshold; the part name semi-join survives.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    small = part.filter(F.col("p_name").like("small%")).select("p_partkey")
    heavy = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .join(F.broadcast(small), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 400)
    )
    return (
        supp.join(F.broadcast(heavy), supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", F.round("s_acctbal", 6).alias("s_acctbal"))
    )


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 (adapted): suppliers who kept finished orders waiting.

    The spec's correlated ``EXISTS l2 / NOT EXISTS l3`` pair is
    decorrelated into per-order supplier counts: an order qualifies for
    supplier s when it has >1 distinct supplier but exactly 1 distinct
    *late* supplier (which is then s).  Identical semantics, two
    shuffle-friendly aggregates instead of two correlated probes.
    Lateness is ship > order date + 30 days (no receipt/commit dates).
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    late = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    n_supp = li.groupBy(F.col("l_orderkey").alias("k1")).agg(
        F.countDistinct("l_suppkey").alias("ns")
    )
    n_late = late.groupBy(F.col("l_orderkey").alias("k2")).agg(
        F.count(F.lit(1)).alias("nl")
    )
    return (
        late.join(n_supp, late.l_orderkey == F.col("k1"))
        .join(n_late, late.l_orderkey == F.col("k2"))
        .filter((F.col("ns") > 1) & (F.col("nl") == 1))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 (adapted): global sales opportunity.

    Country code is ``c_nationkey`` (no phone column); "customers with
    no orders" is vacuous at this order density, so the anti-join target
    is "no URGENT order".  Shape preserved: scalar avg subquery +
    NOT EXISTS anti-join + grouped rollup.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    pool = cust.filter(F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
    thr = pool.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("thr")
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        pool.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("thr"))
        .join(urgent, pool.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 6).alias("totacctbal"),
        )
    )
