"""Named query registry — every implemented operator as a (Spark query,
ANSI-SQL oracle) pair over the synthetic catalog (TESTDATA.md).

Each entry transposes a SURVEY.md §2 operator (reference file:line cited
on each query) onto the driver's TPC-H-ish tables. Conventions that make
the DuckDB hash-compare deterministic:

- every computed column is aliased IDENTICALLY in Spark and SQL;
- multi-row float aggregates (sum/avg over doubles) are rounded to 4
  decimals in BOTH engines at output (summation order differs between
  engines; per-row arithmetic is left exact — IEEE ops are
  deterministic);
- every top-k / rank has a unique tie-break key;
- regexes are RE2-safe (no lookarounds) so Spark (Java regex) and DuckDB
  (RE2) agree;
- a rounded value that can be zero gets `+ 0.0` appended on BOTH sides
  (engines disagree on the sign of an IEEE -0.0 rounding result);
- DuckDB returns BIGINT from year/week/row_number/ntile (CAST AS INT to
  match Spark) and HUGEINT from sum(int) (CAST AS BIGINT);
- engine-specific sketch values (HLL, quantile sketches) are never
  hash-compared — the checked contract is an error bound against the
  exact value, which IS deterministic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from covid19_etl_pipeline_spark.catalog import TABLES, load_table
from covid19_etl_pipeline_spark.operators import dedup, graph, similarity, text
from covid19_etl_pipeline_spark.operators.joins import (
    anti_join_membership,
    broadcast_dim_join,
    equi_join,
    semi_join_membership,
)
from covid19_etl_pipeline_spark.operators.partitioning import salted_equi_join, spread
from covid19_etl_pipeline_spark.operators.projection import guarded_ratio
from covid19_etl_pipeline_spark.operators.setops import upsert_on_key
from covid19_etl_pipeline_spark.operators.windows import moving_average, top_n_per_group


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str


REGISTRY: dict[str, QuerySpec] = {}


def _register(name: str, oracle: str | None, description: str):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        assert name not in REGISTRY, f"duplicate registry entry: {name}"
        REGISTRY[name] = QuerySpec(name, fn, oracle, description)
        return fn

    return deco


# ---------------------------------------------------------------------------
# DuckDB SQL fragments shared by the text/dedup oracles (kept in exact
# lockstep with operators/text.py + operators/dedup.py expressions).
# ---------------------------------------------------------------------------

_D_TOKS = r"regexp_split_to_array(trim(text), '\s+')"
_D_SHINGLES = (
    f"CASE WHEN len({_D_TOKS}) >= 3 "
    f"THEN list_transform(range(1, len({_D_TOKS}) - 1), "
    f"i -> array_to_string({_D_TOKS}[i:i+2], ' ')) "
    f"ELSE [] END"
)


def _d_minhash(index: int, shingles_expr: str = "sh") -> str:
    # mirrors dedup.minhash_value: hash <index> = 8-hex-digit word
    # <index%4> of md5('<index//4>|' || shingle) — 4 hashes per digest
    g, w = index // 4, index % 4
    return (
        f"list_min(list_transform({shingles_expr}, "
        f"s -> substr(md5('{g}|' || s), {1 + 8 * w}, 8)))"
    )


def _d_lang_score(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in text.STOPWORDS[lang])
    return (
        f"len(list_intersect(list_distinct(list_transform({_D_TOKS}, t -> lower(t))), "
        f"[{words}]))"
    )


# ---------------------------------------------------------------------------
# Parity surface — scans, projections, filters (SURVEY §2.1, §2.2, §2.8)
# ---------------------------------------------------------------------------


@_register(
    "rollup_entity",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4)                            AS sum_qty,
           round(sum(l_extendedprice), 4)                       AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4)    AS sum_disc_price,
           round(avg(l_quantity), 4)                            AS avg_qty,
           round(avg(l_discount), 4)                            AS avg_disc,
           max(CAST(l_shipdate AS DATE))                        AS last_shipdate,
           count(*)                                             AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    "FLAGSHIP — multi-key multi-measure hash rollup (A1+A3+O1; "
    "aggregate_by_country shape, data_transformer.py:219-256)",
)
def rollup_entity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.max(F.to_date("l_shipdate")).alias("last_shipdate"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@_register(
    "daily_rollup_7day",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS event_date,
               sum(value)       AS tv,
               count(user_id)   AS users_reporting
        FROM events GROUP BY 1
    )
    SELECT event_date,
           round(tv, 4) AS total_value,
           users_reporting,
           round(avg(tv) OVER (ORDER BY event_date
                               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
               AS value_7day_avg
    FROM daily ORDER BY event_date
    """,
    "global daily rollup + unpartitioned 7-day moving average "
    "(A2+W1; aggregate_by_date, data_transformer.py:258-295)",
)
def daily_rollup_7day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("event_date")).agg(
        F.sum("value").alias("tv"),
        F.count("user_id").alias("users_reporting"),
    )
    smoothed = moving_average(daily, ["tv"], "event_date", periods=7, suffix="_7day_avg")
    return smoothed.select(
        "event_date",
        F.round("tv", 4).alias("total_value"),
        "users_reporting",
        F.round("tv_7day_avg", 4).alias("value_7day_avg"),
    ).orderBy("event_date")


@_register(
    "date_parts",
    """
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE)                 AS order_date,
           CAST(year(o_orderdate) AS INT)            AS order_year,
           CAST(month(o_orderdate) AS INT)           AS order_month,
           CAST(weekofyear(o_orderdate) AS INT)      AS order_week
    FROM orders
    """,
    "to_date + year/month/ISO-week derivation (P3, F1-F4; "
    "data_transformer.py:113,156-160)",
)
def date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        d.alias("order_date"),
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.weekofyear(d).alias("order_week"),
    )


@_register(
    "guarded_ratio",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity > 0
                THEN l_extendedprice / l_quantity * 100 END AS unit_price_x100
    FROM lineitem
    """,
    "null-guarded division (P6/P8/F5/F6; case_fatality_rate guard, "
    "data_transformer.py:148-154)",
)
def q_guarded_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        guarded_ratio("l_extendedprice", "l_quantity", scale=100.0).alias("unit_price_x100"),
    )


@_register(
    "inlist_filter",
    """
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    """,
    "IN-list membership filter (P4/P5; filter_countries_of_interest, "
    "data_transformer.py:297-317)",
)
def inlist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")).select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )


@_register(
    "notnull_threshold",
    """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE value IS NOT NULL AND value > 0
    """,
    "not-null + threshold predicates (P7/P8; dashboard.py:307-310, "
    "data_transformer.py:151)",
)
def notnull_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("value").isNotNull() & (F.col("value") > 0)).select(
        "event_id", "user_id", "event_type", "value"
    )


# ---------------------------------------------------------------------------
# Sorts / top-k (SURVEY §2.6)
# ---------------------------------------------------------------------------


@_register(
    "topk_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
    "top-k sort+limit → TakeOrderedAndProject (O3; dashboard.py:99-100)",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(50)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@_register(
    "recent_days",
    """
    SELECT event_id, user_id, event_type, CAST(ts AS DATE) AS event_date
    FROM events
    WHERE CAST(ts AS DATE) >= (SELECT max(CAST(ts AS DATE)) - 6 FROM events)
    """,
    "most-recent-N-days as a date-range predicate (O5; dashboard.py:359)",
)
def recent_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    from covid19_etl_pipeline_spark.operators.sorts import most_recent_days

    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    return (
        most_recent_days(ev, "event_date", 7)
        .select("event_id", "user_id", "event_type", "event_date")
    )


@_register(
    "top_orders_per_priority",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               CAST(row_number() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
    "top-N-per-group via row_number window (SURVEY §2.5 generalization of "
    "dashboard nlargest, dashboard.py:187-189)",
)
def top_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return top_n_per_group(
        o.select("o_orderpriority", "o_orderkey", "o_totalprice"),
        partition_cols=("o_orderpriority",),
        order_by=(F.col("o_totalprice").desc(), F.col("o_orderkey")),
        n=3,
        keep_rank=True,
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3)
# ---------------------------------------------------------------------------


@_register(
    "dim_join_rollup",
    """
    SELECT r_name, n_name,
           count(*)                      AS n_customers,
           round(sum(c_acctbal), 4)      AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name
    """,
    "broadcast dimension join chain fact⋈nation⋈region + rollup "
    "(SURVEY §2.3)",
)
def dim_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = broadcast_dim_join(
        broadcast_dim_join(c, n, on=F.col("c_nationkey") == F.col("n_nationkey")),
        r,
        on=F.col("n_regionkey") == F.col("r_regionkey"),
    )
    return (
        joined.groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 4).alias("total_acctbal"),
        )
        .orderBy("r_name", "n_name")
    )


@_register(
    "fact_join_agg",
    """
    SELECT o_orderpriority,
           count(*)                                          AS n_line_items,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    "fact-fact equi join + rollup (orders⋈lineitem; SURVEY §2.3)",
)
def fact_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        equi_join(o, li, on=F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_line_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
        )
        .orderBy("o_orderpriority")
    )


@_register(
    "semi_join_customers",
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "left-semi membership join (EXISTS; scalable form of P4)",
)
def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return semi_join_membership(
        c, o.select(F.col("o_custkey").alias("c_custkey")), on="c_custkey"
    ).select("c_custkey", "c_name", "c_acctbal")


@_register(
    "anti_join_customers",
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND year(CAST(o_orderdate AS DATE)) = 1998)
    """,
    "left-anti membership join (NOT EXISTS): customers with no 1998 "
    "order — the recent-inactivity form, chosen over the bare "
    "no-orders-ever form because the synthetic catalog gives every "
    "customer at least one order, which made the result (and hence "
    "the oracle comparison) degenerately EMPTY at every scale; this "
    "predicate leaves ~20% of customers at each SF so the anti join's "
    "semantics are actually exercised by the hash check",
)
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.year(F.to_date("o_orderdate")) == 1998
    )
    return anti_join_membership(
        c, o.select(F.col("o_custkey").alias("c_custkey")), on="c_custkey"
    ).select("c_custkey", "c_name", "c_acctbal")


# ---------------------------------------------------------------------------
# Windows (SURVEY §2.5) — partitioned generalizations of W1
# ---------------------------------------------------------------------------


@_register(
    "user_daily_7day_avg",
    """
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS event_date, sum(value) AS dv
        FROM events GROUP BY 1, 2
    )
    SELECT user_id, event_date,
           round(dv, 4) AS daily_value,
           round(avg(dv) OVER (PARTITION BY user_id ORDER BY event_date
                               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
               AS value_7day_avg
    FROM daily
    """,
    "PARTITIONED 7-day moving average per entity (the scalable form of W1 "
    "— data_transformer.py:279-289 note in SURVEY §2.5)",
)
def user_daily_7day_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("event_date")).agg(
        F.sum("value").alias("dv")
    )
    sm = moving_average(
        daily, ["dv"], "event_date", partition_cols=("user_id",), periods=7, suffix="_7day_avg"
    )
    return sm.select(
        "user_id",
        "event_date",
        F.round("dv", 4).alias("daily_value"),
        F.round("dv_7day_avg", 4).alias("value_7day_avg"),
    )


@_register(
    "user_daily_delta",
    """
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS event_date, sum(value) AS dv
        FROM events GROUP BY 1, 2
    )
    SELECT user_id, event_date,
           round(dv, 4) AS daily_value,
           round(dv - lag(dv) OVER (PARTITION BY user_id ORDER BY event_date), 4)
               AS value_delta
    FROM daily
    """,
    "lag/lead daily delta per entity (SURVEY §2.5 gap: no lag in reference)",
)
def user_daily_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("event_date")).agg(
        F.sum("value").alias("dv")
    )
    w = Window.partitionBy("user_id").orderBy("event_date")
    return daily.select(
        "user_id",
        "event_date",
        F.round("dv", 4).alias("daily_value"),
        F.round(F.col("dv") - F.lag("dv").over(w), 4).alias("value_delta"),
    )


# ---------------------------------------------------------------------------
# Set ops / incremental load (SURVEY §2.7)
# ---------------------------------------------------------------------------


@_register(
    "incremental_upsert",
    """
    WITH u AS (
        SELECT o_orderkey, o_totalprice * 1.1 AS price, 'new' AS src, 0 AS pri
        FROM orders WHERE o_orderstatus = 'O'
    ),
    c AS (
        SELECT o_orderkey, o_totalprice AS price, 'old' AS src, 1 AS pri
        FROM orders
    ),
    all_rows AS (SELECT * FROM u UNION ALL SELECT * FROM c),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY pri) AS rn
        FROM all_rows
    )
    SELECT o_orderkey, round(price, 4) AS price, src FROM ranked WHERE rn = 1
    """,
    "incremental upsert: unionByName + dedup-on-key, updates win "
    "(SURVEY §2.7 — the incremental loading README.md:328 claims but "
    "never implements)",
)
def incremental_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    updates = o.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey",
        (F.col("o_totalprice") * 1.1).alias("price"),
        F.lit("new").alias("src"),
    )
    current = o.select(
        "o_orderkey", F.col("o_totalprice").alias("price"), F.lit("old").alias("src")
    )
    merged = upsert_on_key(current, updates, keys=("o_orderkey",))
    return merged.select("o_orderkey", F.round("price", 4).alias("price"), "src")


# ---------------------------------------------------------------------------
# Aggregates / stats (SURVEY §2.4, S10)
# ---------------------------------------------------------------------------


@_register(
    "distinct_agg",
    """
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS n_customers,
           count(*)                  AS n_orders
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "distinct aggregate (SURVEY §2.4 'not present in reference; free from "
    "Spark' — countries_reporting done right)",
)
def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


@_register(
    "global_stats",
    "\nUNION ALL\n".join(
        f"SELECT '{t}' AS table_name, count(*) AS n_rows FROM {t}" for t in TABLES
    ),
    "per-table row counts (S10/A5; print_database_stats, "
    "data_loader.py:393-404)",
)
def global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = [
        load_table(spark, sf_dir, t)
        .agg(F.count("*").alias("n_rows"))
        .select(F.lit(t).alias("table_name"), "n_rows")
        for t in TABLES
    ]
    return reduce(DataFrame.unionByName, counts)


# ---------------------------------------------------------------------------
# Extension surface — dedup (exact / MinHash-LSH / Jaccard / SimHash)
# ---------------------------------------------------------------------------


@_register(
    "exact_dedup",
    """
    SELECT md5(text) AS fp, min(doc_id) AS keeper_doc_id, count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
    "exact deduplication via content fingerprint hash-groupBy "
    "(extension: training-data pipeline)",
)
def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.exact_dup_groups(docs, "doc_id")


@_register(
    "minhash_signatures",
    "SELECT doc_id, "
    + ", ".join(
        f"{_d_minhash(i, _D_SHINGLES)} AS mh{i}" for i in range(4)
    )
    + " FROM documents",
    "deterministic MinHash signatures over 3-token shingles "
    "(extension: near-dup, md5-based so engine-portable)",
)
def minhash_signatures_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_signatures(docs, "doc_id", num_hashes=4)


@_register(
    "lsh_candidate_pairs",
    f"""
    WITH sigs AS (
        SELECT doc_id, sh,
               {_d_minhash(0)} AS mh0, {_d_minhash(1)} AS mh1,
               {_d_minhash(2)} AS mh2, {_d_minhash(3)} AS mh3,
               {_d_minhash(4)} AS mh4, {_d_minhash(5)} AS mh5,
               {_d_minhash(6)} AS mh6, {_d_minhash(7)} AS mh7
        FROM (SELECT doc_id, {_D_SHINGLES} AS sh FROM documents)
    ),
    bands AS (
        SELECT doc_id, 0 AS band, concat_ws('|', mh0, mh1) AS sig FROM sigs
        UNION ALL SELECT doc_id, 1, concat_ws('|', mh2, mh3) FROM sigs
        UNION ALL SELECT doc_id, 2, concat_ws('|', mh4, mh5) FROM sigs
        UNION ALL SELECT doc_id, 3, concat_ws('|', mh6, mh7) FROM sigs
    ),
    filt AS (SELECT * FROM bands WHERE sig IS NOT NULL AND sig <> '')
    SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
    FROM filt a JOIN filt b ON a.band = b.band AND a.sig = b.sig
                            AND a.doc_id < b.doc_id
    """,
    "MinHash-LSH banding: candidate near-dup pairs via band-signature "
    "equi-join (extension: the 100 TB near-dup path — no O(n²) scan)",
)
def lsh_candidate_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.lsh_candidate_pairs(docs, "doc_id", num_hashes=8, bands=4)


@_register(
    "ngram_jaccard_pairs",
    f"""
    WITH s AS (
        SELECT doc_id, source,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS blk,
               list_distinct({_D_SHINGLES}) AS sh
        FROM documents
    ),
    pairs AS (
        SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               CASE WHEN len(list_distinct(list_cat(a.sh, b.sh))) > 0
                    THEN len(list_intersect(a.sh, b.sh)) * 1.0
                         / len(list_distinct(list_cat(a.sh, b.sh)))
               END AS jaccard
        FROM s a JOIN s b
          ON a.source = b.source AND a.blk = b.blk AND a.doc_id < b.doc_id
    )
    SELECT * FROM pairs WHERE jaccard IS NOT NULL AND jaccard >= 0.0
    """,
    "exact n-gram Jaccard similarity on blocked pairs (near-dup "
    "verification stage). Blocking key = (source, 16-way md5 "
    "sub-block): all-pairs-within-source is O(n^2/sources) and "
    "detonates at scale — the sub-block bounds pairs per block, the "
    "knob a 100 TB run turns (in production the candidate set comes "
    "from LSH banding instead: `lsh_candidate_pairs`, and the "
    "composed form in `training_corpus`). Content-free md5 keeps the "
    "blocking reproducible across engines and repartitioning",
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    a = docs.select(
        "doc_id",
        "source",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("blk"),
    )
    candidates = (
        a.alias("a")
        .join(a.alias("b"), on=["source", "blk"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
    )
    pairs = dedup.jaccard_pairs(docs, "doc_id", candidates=candidates)
    return pairs.filter(F.col("jaccard").isNotNull() & (F.col("jaccard") >= 0.0))


@_register(
    "simhash_signatures",
    r"""
    WITH tok AS (
        SELECT doc_id,
               unnest(list_distinct(regexp_split_to_array(trim(norm), '\s+'))) AS tok
        FROM (SELECT doc_id,
                     regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
              FROM documents)
    ),
    h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM tok),
    bits AS (
        SELECT doc_id, b.bit,
               CASE WHEN ((h >> b.bit) & 1) = 1 THEN 1 ELSE -1 END AS vote
        FROM h, (SELECT unnest(range(0, 32)) AS bit) b
    ),
    votes AS (SELECT doc_id, bit, sum(vote) AS v FROM bits GROUP BY 1, 2)
    SELECT doc_id,
           CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT)
               AS simhash
    FROM votes GROUP BY doc_id
    """,
    "32-bit SimHash signatures via md5 bit-majority vote "
    "(extension: near-dup)",
)
def simhash_signatures_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash(docs, "doc_id", bits=32)


# ---------------------------------------------------------------------------
# Extension surface — text analysis
# ---------------------------------------------------------------------------


@_register(
    "text_quality",
    f"""
    SELECT doc_id,
           length(text) AS n_chars_measured,
           CAST(len({_D_TOKS}) AS INT) AS n_tokens,
           CAST(len(regexp_extract_all(text,
               '{text.BPE_TOKEN_PATTERN.replace("'", "''")}')) AS INT) AS n_bpe_tokens,
           CASE WHEN length(text) > 0
                THEN length(regexp_replace(text, '[^.!?,;:]', '', 'g'))
                     * 1.0 / length(text) END AS punct_ratio,
           CASE WHEN len({_D_TOKS}) > 0
                THEN len(list_filter({_D_TOKS},
                         t -> list_contains(['the','a','and','of','to','in','is','that','it','for'],
                                            lower(t))))
                     * 1.0 / len({_D_TOKS}) END AS stopword_ratio
    FROM documents
    """,
    "per-document quality features: char/token/BPE-token counts, "
    "punctuation + stopword ratios (extension: quality scoring)",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # regex feature extraction is the hot loop — spread the small scan
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_measured"),
        text.token_count("text").alias("n_tokens"),
        text.bpe_token_count("text").alias("n_bpe_tokens"),
        text.punct_ratio("text").alias("punct_ratio"),
        text.stopword_ratio("text").alias("stopword_ratio"),
    )


@_register(
    "lang_id",
    f"""
    WITH scored AS (
        SELECT doc_id, lang,
               {_d_lang_score('de')} AS s_de,
               {_d_lang_score('en')} AS s_en,
               {_d_lang_score('es')} AS s_es,
               {_d_lang_score('fr')} AS s_fr
        FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN greatest(s_de, s_en, s_es, s_fr) <= 0 THEN 'und'
                WHEN s_fr = greatest(s_de, s_en, s_es, s_fr) THEN 'fr'
                WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                ELSE 'de' END AS lang_pred
    FROM scored
    """,
    "heuristic language ID: stopword-coverage argmax "
    "(extension: language identification)",
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    return text.language_id(docs.select("doc_id", "lang", "text"), "text").drop("text")


@_register(
    "doc_fingerprint",
    r"""
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
    FROM documents
    """,
    "canonical document fingerprint: md5 over normalized text "
    "(extension: fingerprinting)",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", text.fingerprint("text").alias("fp"))


# ---------------------------------------------------------------------------
# Extension surface — similarity search over embeddings
# ---------------------------------------------------------------------------


@_register(
    "sim_bruteforce_topk",
    """
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id < 5
    ),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
    s AS (
        SELECT query_id, vec_id,
               list_dot_product(qv, cv)
                 / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                 AS sim
        FROM q JOIN c ON vec_id <> query_id
    ),
    r AS (
        SELECT query_id, vec_id, sim,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, vec_id) AS INT) AS rank
        FROM s
    )
    SELECT query_id, vec_id, round(sim, 6) AS cosine_sim, rank
    FROM r WHERE rank <= 10
    """,
    "exact cosine top-k per query vector — brute-force baseline "
    "(extension: similarity search; zip_with+aggregate dot products)",
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.brute_force_topk(emb, emb.filter(F.col("vec_id") < 5), k=10)
    return out.select(
        "query_id", "vec_id", F.round("cosine_sim", 6).alias("cosine_sim"), "rank"
    )


def _d_plane_signature(vec_expr: str, n_planes: int = 4, dim: int = 64) -> str:
    """DuckDB twin of similarity.hyperplane_signature: the SAME
    deterministic md5-derived hyperplanes, embedded as literals."""
    cases = []
    for plane in similarity._hyperplanes(dim, n_planes, seed=42):
        lits = ", ".join(repr(w) for w in plane)
        cases.append(
            f"CASE WHEN list_dot_product({vec_expr}, [{lits}]) > 0 "
            f"THEN '1' ELSE '0' END"
        )
    return "concat(" + ", ".join(cases) + ")"


@_register(
    "sim_lsh_ann_topk",
    f"""
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    sigc AS (SELECT vec_id, v, {_d_plane_signature('v')} AS bucket FROM c),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM sigc WHERE vec_id < 5),
    s AS (
        SELECT q.query_id, sigc.vec_id,
               list_dot_product(q.qv, sigc.v)
                 / (sqrt(list_dot_product(q.qv, q.qv))
                    * sqrt(list_dot_product(sigc.v, sigc.v))) AS sim
        FROM sigc JOIN q ON sigc.bucket = q.bucket AND sigc.vec_id <> q.query_id
    ),
    r AS (
        SELECT query_id, vec_id, sim,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, vec_id) AS INT) AS rank
        FROM s
    )
    SELECT query_id, vec_id, round(sim, 6) AS cosine_sim, rank
    FROM r WHERE rank <= 10
    """,
    "LSH-bucketed approximate top-k (deterministic random-hyperplane "
    "signatures + in-bucket exact re-rank — the 100 TB ANN path)",
)
def sim_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.lsh_ann_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=10, n_planes=4
    )
    return out.select(
        "query_id", "vec_id", F.round("cosine_sim", 6).alias("cosine_sim"), "rank"
    )


# ---------------------------------------------------------------------------
# Extended aggregates: percentiles, grouping sets, pivot (SURVEY §2.4
# "not present in reference — engine gets them free from Spark")
# ---------------------------------------------------------------------------


@_register(
    "percentile_agg",
    """
    SELECT o_orderpriority,
           round(CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE), 4) AS median_price,
           round(CAST(quantile_cont(o_totalprice, 0.9) AS DOUBLE), 4) AS p90_price,
           count(*) AS n_orders
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "exact percentiles (linear interpolation) per group — sort-based "
    "aggregate (extension of A1)",
)
def percentile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(F.percentile("o_totalprice", 0.5), 4).alias("median_price"),
            F.round(F.percentile("o_totalprice", 0.9), 4).alias("p90_price"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


@_register(
    "rollup_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_rows,
           round(sum(l_quantity), 4) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "hierarchical grouping sets (ROLLUP): per-group + subtotal + grand "
    "total in one pass (SURVEY §2.4 gap)",
)
def rollup_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
    )


@_register(
    "pivot_linestatus",
    """
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 4) AS "F",
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 4) AS "O"
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "pivot: one column per l_linestatus value (explicit value list — no "
    "extra distinct-discovery scan)",
)
def pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 4))
        .orderBy("l_returnflag")
    )


@_register(
    "json_extract_props",
    """
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS INT) AS prop_k
    FROM events
    """,
    "semi-structured extraction: JSON path over a string column "
    "(get_json_object; events.props)",
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
    )


# ---------------------------------------------------------------------------
# Sessionization + as-of join (custom operators Spark lacks natively)
# ---------------------------------------------------------------------------


@_register(
    "sessionize",
    """
    WITH lagged AS (
        SELECT user_id, event_id, epoch_us(ts) AS t_us,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                       ORDER BY epoch_us(ts), event_id) AS prev_us
        FROM events
    )
    SELECT user_id, event_id,
           CAST(sum(CASE WHEN prev_us IS NULL
                          OR t_us - prev_us > 1800000000 THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY t_us, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
               AS session_id
    FROM lagged
    """,
    "sessionization: 30-min-gap cumulative-flag sessions via lag + "
    "running sum (custom stateful op composed from windows)",
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # compare epoch MICROseconds on both engines: the parquet stores
    # nanos; Spark truncates to micros, DuckDB's epoch_us does the same
    t_us = F.unix_micros(F.col("ts"))
    lagged = ev.select("user_id", "event_id", t_us.alias("t_us")).withColumn(
        "prev_us", F.lag("t_us").over(Window.partitionBy("user_id").orderBy("t_us", "event_id"))
    )
    new_sess = F.when(
        F.col("prev_us").isNull() | (F.col("t_us") - F.col("prev_us") > 1_800_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return lagged.select(
        "user_id",
        "event_id",
        F.sum(new_sess).over(w_run).cast("int").alias("session_id"),
    )


@_register(
    "asof_join_orders",
    """
    WITH od AS (
        SELECT o_custkey, CAST(o_orderdate AS DATE) AS od_date,
               max(o_totalprice) AS last_order_price
        FROM orders GROUP BY 1, 2
    ),
    ev AS (
        SELECT event_id, user_id, CAST(ts AS DATE) AS event_date FROM events
    )
    SELECT ev.event_id, ev.user_id, ev.event_date,
           round(od.last_order_price, 4) AS last_order_price
    FROM ev ASOF LEFT JOIN od
      ON ev.user_id = od.o_custkey AND ev.event_date >= od.od_date
    """,
    "as-of join (most-recent-match): events pick up the latest prior "
    "order per customer — union-merge windowed implementation, checked "
    "against DuckDB's native ASOF JOIN",
)
def asof_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from covid19_etl_pipeline_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.to_date("ts").alias("event_date")
    )
    od = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.to_date("o_orderdate").alias("od_date"),
        )
        .agg(F.max("o_totalprice").alias("last_order_price"))
    )
    out = asof_join(
        ev,
        od,
        on="user_id",
        left_time="event_date",
        right_time="od_date",
        value_cols=["last_order_price"],
    )
    return out.select(
        "event_id",
        "user_id",
        "event_date",
        F.round("last_order_price", 4).alias("last_order_price"),
    )


# ---------------------------------------------------------------------------
# Final extension batch: word counts, embedding near-dup, decorrelated
# subquery
# ---------------------------------------------------------------------------


@_register(
    "word_count_topk",
    r"""
    SELECT tok AS word, count(*) AS n
    FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
          FROM documents)
    WHERE tok <> ''
    GROUP BY tok ORDER BY n DESC, word LIMIT 20
    """,
    "corpus word frequencies: tokenize → explode → count → top-k "
    "(SURVEY §7.2 step 8; deterministic count-then-word tie-break)",
)
def word_count_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    return (
        docs.select(F.explode(text.tokens("text")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(20)
    )


@_register(
    "embedding_neardup_pairs",
    """
    WITH c AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    u AS (
        SELECT vec_id, label,
               list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS uv
        FROM c WHERE list_dot_product(v, v) > 0
    )
    SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
           a.label AS label_a, b.label AS label_b,
           round(list_dot_product(a.uv, b.uv), 6) AS cosine_sim
    FROM u a JOIN u b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.uv, b.uv) >= 0.35
    """,
    "embedding-cosine near-dup pairs (brute-force form; the scale path "
    "buckets via sim_lsh_ann_topk's hyperplane signatures first). "
    "Vectors are UNIT-NORMALIZED once before the pair join — cosine "
    "inside the O(n^2) loop is then a single dot product instead of "
    "three (norms move from n^2 to n cost; measured 3x on the pair "
    "stage). The normalized table is materialized once and feeds both "
    "join sides",
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    v = F.transform("embedding", lambda x: x.cast("double"))
    # the normalized table materializes once and feeds both join sides
    unit = (
        emb.select("vec_id", "label", v.alias("__v"))
        .filter(similarity.dot(F.col("__v"), F.col("__v")) > 0)
        .select(
            "vec_id",
            "label",
            F.transform(
                "__v", lambda x: x / F.sqrt(similarity.dot(F.col("__v"), F.col("__v")))
            ).alias("uv"),
        )
        .localCheckpoint(eager=False)
    )
    a = unit.select(
        F.col("vec_id").alias("vec_id_a"),
        F.col("label").alias("label_a"),
        F.col("uv").alias("__ua"),
    )
    b = unit.select(
        F.col("vec_id").alias("vec_id_b"),
        F.col("label").alias("label_b"),
        F.col("uv").alias("__ub"),
    )
    sim = similarity.dot(F.col("__ua"), F.col("__ub"))
    return (
        a.join(b, on=F.col("vec_id_a") < F.col("vec_id_b"))
        .withColumn("__sim", sim)
        .filter(F.col("__sim") >= 0.35)
        .select(
            "vec_id_a",
            "vec_id_b",
            "label_a",
            "label_b",
            F.round("__sim", 6).alias("cosine_sim"),
        )
    )


@_register(
    "above_avg_orders",
    """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS price
    FROM (
        SELECT o_orderkey, o_custkey, o_totalprice,
               avg(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg
        FROM orders
    )
    WHERE o_totalprice > cust_avg
    """,
    "decorrelated correlated subquery: orders above their customer's "
    "average, as a windowed aggregate (one shuffle instead of a "
    "per-row subquery)",
)
def above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        o.withColumn("cust_avg", F.avg("o_totalprice").over(w))
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 4).alias("price"))
    )


@_register(
    "cube_agg",
    """
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_rows,
           round(avg(l_discount), 4) AS avg_disc
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "full cube: all grouping-set combinations in one pass "
    "(SURVEY §2.4 gap — free from Spark)",
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
    )


@_register(
    "winnowing_fingerprints",
    f"""
    WITH hs AS (
        SELECT doc_id,
               list_transform({_D_SHINGLES}, s -> md5(s)) AS hv
        FROM documents
    ),
    fp AS (
        SELECT doc_id,
               CASE WHEN len(hv) >= 4
                    THEN list_distinct(list_transform(range(1, len(hv) - 2),
                                       i -> list_min(hv[i:i+3])))
                    ELSE [] END AS fps
        FROM hs
    )
    SELECT doc_id,
           CAST(len(fps) AS INT) AS n_fingerprints,
           list_min(fps) AS min_fp,
           list_max(fps) AS max_fp
    FROM fp
    """,
    "winnowing document fingerprints: rolling min over windows of "
    "shingle hashes (Schleimer et al. local fingerprinting; the "
    "plagiarism/near-dup sketch the md5 whole-doc fingerprint can't give)",
)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = 4  # winnow window: min over every w consecutive shingle hashes
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    hv = F.transform(text.shingles(text.tokens("text")), F.md5)
    out = docs.select(F.col("doc_id"), hv.alias("hv"))
    n = F.size("hv")
    fps = F.when(
        n >= w,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - (w - 1)),
                lambda i: F.array_min(F.slice(F.col("hv"), i, w)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return out.select(
        "doc_id",
        F.size(fps).alias("n_fingerprints"),
        F.array_min(fps).alias("min_fp"),
        F.array_max(fps).alias("max_fp"),
    )


@_register(
    "sim_ivf_topk",
    """
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (SELECT vec_id AS cid, v AS cv FROM c WHERE vec_id < 8),
    sims AS (
        SELECT c.vec_id, cent.cid,
               list_dot_product(c.v, cent.cv)
                 / (sqrt(list_dot_product(c.v, c.v))
                    * sqrt(list_dot_product(cent.cv, cent.cv))) AS csim
        FROM c, cent
    ),
    assign AS (
        SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY csim DESC, cid) AS rn
            FROM sims
        ) WHERE rn = 1
    ),
    members AS (SELECT a.vec_id, a.cid, c.v FROM assign a JOIN c USING (vec_id)),
    q AS (SELECT vec_id AS query_id, cid AS qcid, v AS qv
          FROM members WHERE vec_id < 5),
    scored AS (
        SELECT q.query_id, m.vec_id,
               list_dot_product(q.qv, m.v)
                 / (sqrt(list_dot_product(q.qv, q.qv))
                    * sqrt(list_dot_product(m.v, m.v))) AS sim
        FROM q JOIN members m ON m.cid = q.qcid AND m.vec_id <> q.query_id
    ),
    r AS (
        SELECT query_id, vec_id, sim,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, vec_id) AS INT) AS rank
        FROM scored
    )
    SELECT query_id, vec_id, round(sim, 6) AS cosine_sim, rank
    FROM r WHERE rank <= 10
    """,
    "IVF-flat ANN: deterministic coarse quantizer (first-C centroids), "
    "cosine cell assignment, single-probe in-cell exact re-rank — the "
    "inverted-file alternative to hyperplane LSH",
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF: assign every vector to its nearest of C fixed centroids
    (broadcast nested-loop over C rows — no shuffle), then search only
    the query's cell. At scale the assignment is written once
    (partitioned by cell) and reused; a real deployment would k-means
    the centroids — deterministic first-C keeps the oracle exact."""
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    c = emb.select("vec_id", F.col("embedding").alias("v"))
    cent = (
        emb.filter(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    )
    sims = c.join(F.broadcast(cent)).withColumn(
        "csim", similarity.cosine(F.col("v"), F.col("cv"))
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), F.col("cid"))
    # the assignment is consumed twice (query selection + cell search);
    # materialize it once — the docstring's "written once, partitioned
    # by cell, reused" policy, realized locally as a checkpoint.
    members = (
        sims.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid", "v")
        .localCheckpoint(eager=False)
    )
    q = members.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("cid").alias("qcid"),
        F.col("v").alias("qv"),
    )
    scored = (
        members.join(F.broadcast(q), on=F.col("cid") == F.col("qcid"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("sim", similarity.cosine(F.col("qv"), F.col("v")))
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w_rank).cast("int"))
        .filter(F.col("rank") <= 10)
        .select("query_id", "vec_id", F.round("sim", 6).alias("cosine_sim"), "rank")
    )


@_register(
    "intersect_customers",
    """
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    "INTERSECT set op: customers holding both open and finished orders "
    "(SURVEY §2.7 — set ops absent from reference)",
)
def intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    open_c = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    done_c = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return open_c.intersect(done_c)


@_register(
    "string_funcs",
    """
    SELECT c_custkey,
           upper(c_name)                                   AS name_upper,
           substr(c_name, 1, 8)                            AS name_prefix,
           CAST(length(c_name) AS INT)                     AS name_len,
           concat(c_mktsegment, '#', CAST(c_custkey AS VARCHAR)) AS seg_key,
           replace(lower(c_name), 'customer', 'cust')      AS name_short,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0')       AS key_padded
    FROM customer
    """,
    "string function surface: upper/substr/length/concat/replace/lpad "
    "(SURVEY §2.8 breadth)",
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat(
            F.col("c_mktsegment"), F.lit("#"), F.col("c_custkey").cast("string")
        ).alias("seg_key"),
        F.replace(F.lower("c_name"), F.lit("customer"), F.lit("cust")).alias("name_short"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
    )


@_register(
    "date_arithmetic",
    """
    SELECT o_orderpriority,
           round(avg(datediff('day', CAST(o_orderdate AS DATE),
                              CAST(l_shipdate AS DATE))), 4) AS avg_days_to_ship,
           CAST(min(datediff('day', CAST(o_orderdate AS DATE),
                             CAST(l_shipdate AS DATE))) AS INT) AS min_days,
           CAST(max(datediff('day', CAST(o_orderdate AS DATE),
                             CAST(l_shipdate AS DATE))) AS INT) AS max_days
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "date arithmetic: datediff order→ship latency per priority "
    "(SURVEY §2.8 breadth; F1-F4 family)",
)
def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dd = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.avg(dd), 4).alias("avg_days_to_ship"),
            F.min(dd).alias("min_days"),
            F.max(dd).alias("max_days"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Set-op / window / aggregate breadth — round-1 widening batch
# (SURVEY §2.4-2.7 gaps the reference lacks; engine exposes as built-ins)
# ---------------------------------------------------------------------------


@_register(
    "except_customers",
    """
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    "EXCEPT set op: customers with urgent orders but no finished orders "
    "(SURVEY §2.7 — set ops absent from reference; complement of "
    "intersect_customers)",
)
def except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    finished = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    # .subtract == EXCEPT DISTINCT; Catalyst plans it as a left-anti
    # hash-aggregate join, broadcastable when the right side is small.
    return urgent.subtract(finished)


@_register(
    "rank_distribution",
    """
    SELECT c_custkey, c_mktsegment,
           CAST(ntile(4) OVER w AS INT)        AS quartile,
           round(percent_rank() OVER w, 6)     AS pct_rank,
           round(cume_dist() OVER w, 6)        AS cum_dist
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    "distribution windows: ntile/percent_rank/cume_dist per segment "
    "(SURVEY §2.5 gap — no ranking in reference; unique (acctbal, custkey) "
    "tie-break)",
)
def rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
    )


@_register(
    "running_total_user",
    """
    SELECT user_id, event_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
               AS running_value,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS INT) AS seq
    FROM events
    """,
    "running total per entity: unbounded-preceding rows frame + sequence "
    "number (SURVEY §2.5 gap; partitioned => scales with #users)",
)
def running_total_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4).alias(
            "running_value"
        ),
        F.row_number().over(w).cast("int").alias("seq"),
    )


@_register(
    "user_range_7day_avg",
    """
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS event_date,
               datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS unix_day,
               sum(value) AS dv
        FROM events GROUP BY 1, 2, 3
    )
    SELECT user_id, event_date,
           round(dv, 4) AS daily_value,
           round(avg(dv) OVER (PARTITION BY user_id ORDER BY unix_day
                               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
               AS value_7day_range_avg
    FROM daily
    """,
    "VALUE-based range frame: 7 calendar-day average per entity — unlike "
    "the rows frame (user_daily_7day_avg), gaps in the date series do not "
    "widen the window (SURVEY §2.5: reference W1 is rows-only)",
)
def user_range_7day_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id",
        F.to_date("ts").alias("event_date"),
        F.unix_date(F.to_date("ts")).alias("unix_day"),
    ).agg(F.sum("value").alias("dv"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("unix_day")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "user_id",
        "event_date",
        F.round("dv", 4).alias("daily_value"),
        F.round(F.avg("dv").over(w), 4).alias("value_7day_range_avg"),
    )


@_register(
    "histogram_totalprice",
    """
    SELECT CAST(floor(o_totalprice / 50000) AS INT) AS bucket,
           count(*)                                 AS n_orders,
           round(sum(o_totalprice), 4)              AS sum_price,
           round(min(o_totalprice), 4)              AS min_price,
           round(max(o_totalprice), 4)              AS max_price
    FROM orders
    GROUP BY bucket
    ORDER BY bucket
    """,
    "histogram binning: fixed-width floor buckets over a measure "
    "(engine breadth — width_bucket semantics via floor arithmetic, "
    "identical IEEE division both engines)",
)
def histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000).cast("int").alias("bucket")
    return (
        o.groupBy(bucket)
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
            F.round(F.min("o_totalprice"), 4).alias("min_price"),
            F.round(F.max("o_totalprice"), 4).alias("max_price"),
        )
        .orderBy("bucket")
    )


@_register(
    "minmax_by_priority",
    """
    SELECT o_orderpriority,
           max(struct_pack(p := o_totalprice, k := o_orderkey)).k AS max_price_orderkey,
           min(struct_pack(p := o_totalprice, k := o_orderkey)).k AS min_price_orderkey,
           round(max(o_totalprice), 4) AS max_price,
           round(min(o_totalprice), 4) AS min_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    "argmax/argmin per group via lexicographic struct max — deterministic "
    "(orderkey tie-break inside the struct), single hash-agg pass, no "
    "window/self-join (SURVEY §2.4 breadth)",
)
def minmax_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    pk = F.struct(F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k"))
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.max(pk).getField("k").alias("max_price_orderkey"),
            F.min(pk).getField("k").alias("min_price_orderkey"),
            F.round(F.max("o_totalprice"), 4).alias("max_price"),
            F.round(F.min("o_totalprice"), 4).alias("min_price"),
        )
        .orderBy("o_orderpriority")
    )


@_register(
    "approx_distinct_users",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS n_users_exact,
           TRUE                    AS hll_ok
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    "approx_count_distinct (HyperLogLog++, rsd=0.01) validated against the "
    "exact distinct count within 5% — the sketch value itself is "
    "engine-specific, so the contract checked is the error bound "
    "(the 100 TB path: HLL is mergeable across partitions, exact "
    "countDistinct is a full shuffle of the key space)",
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    exact = F.countDistinct("user_id")
    approx = F.approx_count_distinct("user_id", rsd=0.01)
    return (
        ev.groupBy("event_type")
        .agg(
            exact.alias("n_users_exact"),
            (F.abs(approx - exact) <= 0.05 * exact).alias("hll_ok"),
        )
        .orderBy("event_type")
    )


@_register(
    "events_before_purchase",
    """
    SELECT p.event_id AS purchase_id,
           count(*) AS n_prior_events,
           round(sum(e.value), 4) AS sum_prior_value
    FROM events p JOIN events e
      ON p.user_id = e.user_id
     AND p.event_type = 'purchase'
     AND e.ts >= p.ts - INTERVAL 60 MINUTE
     AND e.ts < p.ts
    GROUP BY p.event_id
    ORDER BY p.event_id
    """,
    "time-range (interval) self-join: activity in the 60 min before each "
    "purchase. Spark plan: equi-join on user_id co-partitions both sides "
    "(one shuffle, AQE-broadcastable), range predicate applied post-join — "
    "at 100 TB, bucket events by user_id and partition by time so the "
    "range filter prunes files (SURVEY §2.3: no range join in reference)",
)
def events_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    e = ev.select("user_id", F.col("ts").alias("e_ts"), "value")
    joined = p.join(
        e,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("e_ts") >= F.col("p_ts") - F.expr("INTERVAL 60 MINUTES"))
        & (F.col("e_ts") < F.col("p_ts")),
    )
    return (
        joined.groupBy("purchase_id")
        .agg(
            F.count("*").alias("n_prior_events"),
            F.round(F.sum("value"), 4).alias("sum_prior_value"),
        )
        .orderBy("purchase_id")
    )


@_register(
    "scalar_subquery_ratio",
    """
    SELECT o_orderkey,
           round(o_totalprice, 4) AS totalprice,
           round(o_totalprice / (SELECT avg(o_totalprice) FROM orders), 6)
               AS price_ratio
    FROM orders
    WHERE o_totalprice > 1.8 * (SELECT avg(o_totalprice) FROM orders)
    """,
    "uncorrelated scalar subquery: global average computed once and "
    "broadcast to every row (Spark: 1-row agg + broadcast cross join — "
    "no per-row recomputation, no driver collect; SURVEY §2.4 breadth)",
)
def scalar_subquery_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    avg_df = o.agg(F.avg("o_totalprice").alias("_global_avg"))
    return (
        o.crossJoin(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > 1.8 * F.col("_global_avg"))
        .select(
            "o_orderkey",
            F.round("o_totalprice", 4).alias("totalprice"),
            F.round(F.col("o_totalprice") / F.col("_global_avg"), 6).alias("price_ratio"),
        )
    )


@_register(
    "collect_orders_list",
    """
    SELECT o_custkey,
           list_sort(list(o_orderkey)) AS orderkeys,
           count(*)                    AS n_orders
    FROM orders
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
    "array-building aggregate: per-customer sorted order list — "
    "collect_list is unordered across partitions, so array_sort makes "
    "the result deterministic (SURVEY §2.4 breadth; array type surface)",
)
def collect_orders_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.array_sort(F.collect_list("o_orderkey")).alias("orderkeys"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("o_custkey")
    )


@_register(
    "stats_by_returnflag",
    """
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4)                  AS qty_stddev,
           round(var_samp(l_quantity), 4)                     AS qty_var,
           round(corr(l_quantity, l_extendedprice), 6)        AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 4)  AS qty_price_covar
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    "statistical aggregates: stddev/variance/correlation/covariance per "
    "group — single hash-agg pass, partial-aggregable (moment sketches "
    "merge across partitions) so it scales like sum() (SURVEY §2.4 "
    "breadth)",
)
def stats_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 4).alias("qty_stddev"),
            F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
                "qty_price_covar"
            ),
        )
        .orderBy("l_returnflag")
    )


@_register(
    "embedding_component_stats",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INT)                                   AS dim,
           round(CAST(list_max(embedding) AS DOUBLE), 4)                 AS max_comp,
           round(CAST(list_min(embedding) AS DOUBLE), 4)                 AS min_comp,
           round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))
                 / len(embedding), 4) + 0.0                              AS mean_comp,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT)          AS n_positive
    FROM embeddings
    """,
    "higher-order array functions over the embedding column: size / "
    "array_max / array_min / aggregate-fold mean / filter count — all "
    "JVM-side (no UDF), the building blocks of the similarity operators "
    "(extension surface; vector columns as array<float>)",
)
def embedding_component_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.array_max("embedding").cast("double"), 4).alias("max_comp"),
        F.round(F.array_min("embedding").cast("double"), 4).alias("min_comp"),
        # + 0.0 canonicalizes IEEE -0.0 to 0.0 (engines disagree on the
        # sign of a zero rounding result)
        (
            F.round(
                F.aggregate(
                    "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")
                )
                / F.size("embedding"),
                4,
            )
            + 0.0
        ).alias("mean_comp"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


@_register(
    "top_unshipped_orders",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND CAST(o_orderdate AS DATE) < DATE '1998-03-15'
      AND CAST(l_shipdate AS DATE) > DATE '1998-03-15'
    GROUP BY l_orderkey, orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    "TPC-H Q3 shape: 3-table join, segment+date filters pushed to the "
    "scans, revenue rollup, top-10 (TakeOrderedAndProject — no global "
    "sort). The dimension side (filtered customer) broadcasts; unique "
    "l_orderkey tie-break",
)
def top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate") < F.lit("1998-03-15")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate") > F.lit("1998-03-15")
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "l_orderkey",
            F.to_date("o_orderdate").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@_register(
    "regional_revenue",
    """
    SELECT r_name AS region, n_name AS nation,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           count(*) AS n_lineitems
    FROM region JOIN nation   ON n_regionkey = r_regionkey
                JOIN customer ON c_nationkey = n_nationkey
                JOIN orders   ON o_custkey   = c_custkey
                JOIN lineitem ON l_orderkey  = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY r_name, n_name
    ORDER BY r_name, revenue DESC, n_name
    """,
    "TPC-H Q5 shape: 5-table star join — region/nation broadcast as tiny "
    "dims, customer broadcasts under AQE, the orders-to-lineitem fact join "
    "is the only shuffle; per-(region, nation) revenue rollup",
)
def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
        .orderBy("region", F.col("revenue").desc(), "nation")
    )


@_register(
    "price_quantity_regression",
    """
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 4)     AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6)        AS r2
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    "per-group OLS fit (price ~ quantity) from second-moment aggregates: "
    "slope = covar_pop/var_pop, intercept = mean_y - slope*mean_x, "
    "r2 = corr^2 — pure built-in partial-aggregable moments, no "
    "applyInPandas needed (Spark-first answer to a per-group model fit)",
)
def price_quantity_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    slope = F.covar_pop("l_quantity", "l_extendedprice") / F.var_pop("l_quantity")
    intercept = F.avg("l_extendedprice") - slope * F.avg("l_quantity")
    r2 = F.pow(F.corr("l_quantity", "l_extendedprice"), 2)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(slope, 4).alias("slope"),
            F.round(intercept, 4).alias("intercept"),
            F.round(r2, 6).alias("r2"),
        )
        .orderBy("l_returnflag")
    )


# One SQL text, two engines: the ad-hoc SQL surface (S9,
# data_loader.py:406-416) demonstrated with a dialect-neutral statement
# that Spark SQL and DuckDB both execute verbatim.
_SQL_SURFACE = """
    SELECT o_orderstatus,
           count(*)                    AS n_orders,
           round(sum(o_totalprice), 4) AS total_revenue,
           round(avg(o_totalprice), 4) AS avg_price
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
"""


@_register(
    "sql_surface_revenue",
    _SQL_SURFACE,
    "ad-hoc SQL surface (S9): register_tables + spark.sql running the "
    "IDENTICAL SQL text the oracle runs — the engine's query entry point "
    "is ANSI SQL over temp views, not a bespoke DSL",
)
def sql_surface_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from covid19_etl_pipeline_spark.catalog import query, register_tables

    register_tables(spark, sf_dir, tables=("orders",))
    return query(spark, _SQL_SURFACE)


@_register(
    "null_profile_enriched",
    """
    SELECT count(*) AS n_rows,
           CAST(sum(CASE WHEN o_totalprice IS NULL OR isnan(o_totalprice)
                         THEN 1 ELSE 0 END) AS BIGINT) AS o_totalprice_nulls,
           CAST(sum(CASE WHEN user_value IS NULL OR isnan(user_value)
                         THEN 1 ELSE 0 END) AS BIGINT) AS user_value_nulls
    FROM orders LEFT JOIN (
        SELECT user_id, sum(value) AS user_value FROM events GROUP BY user_id
    ) e ON o_custkey = user_id
    """,
    "one-pass null/NaN profile over a LEFT-JOIN enrichment (reference "
    "parity: debugdb.py NaN checks, which scan once PER column; this is "
    "one aggregation pass for all columns). Unmatched join keys surface "
    "as user_value nulls — the standard post-enrichment quality gate",
)
def null_profile_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    from covid19_etl_pipeline_spark.operators.aggregates import null_profile

    o = load_table(spark, sf_dir, "orders")
    ev = load_table(spark, sf_dir, "events")
    totals = ev.groupBy("user_id").agg(F.sum("value").alias("user_value"))
    enriched = o.join(totals, o["o_custkey"] == totals["user_id"], "left")
    return null_profile(enriched, ["o_totalprice", "user_value"])


@_register(
    "tumbling_6h_rollup",
    """
    SELECT time_bucket(INTERVAL 6 HOUR, ts) AS bucket_start,
           count(*)                         AS n_events,
           round(sum(value), 4)             AS total_value
    FROM events
    GROUP BY bucket_start
    ORDER BY bucket_start
    """,
    "batch tumbling window: F.window('ts', '6 hours') — the SAME "
    "operator the streaming daily rollup uses, epoch-aligned like "
    "DuckDB's time_bucket, so batch and streaming share one "
    "windowing semantics (SURVEY §2.9 bridge)",
)
def tumbling_6h_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "n_events",
            "total_value",
        )
        .orderBy("bucket_start")
    )


@_register(
    "gap_fill_daily",
    """
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS d, sum(value) AS dv
        FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT user_id, min(d) AS dmin, max(d) AS dmax FROM daily GROUP BY 1),
    cal AS (
        SELECT user_id,
               CAST(unnest(generate_series(dmin, dmax, INTERVAL 1 DAY)) AS DATE) AS d
        FROM bounds
    )
    SELECT cal.user_id, cal.d AS event_date,
           coalesce(round(dv, 4), 0.0) AS daily_value,
           dv IS NOT NULL           AS observed
    FROM cal LEFT JOIN daily ON cal.user_id = daily.user_id AND cal.d = daily.d
    """,
    "calendar gap-fill: densify each entity's daily series between its "
    "own min/max date. Spark side is the LEAD-window form: each daily "
    "row explodes the INCLUSIVE day range [d, next_d) — its own day "
    "(observed, real value) plus the gap days to its successor "
    "(zero-filled). One branch, no self-join, no union: exactly two "
    "shuffles (daily agg + per-entity window). The oracle states the "
    "same result as the naive bounds+calendar LEFT JOIN, which would "
    "cost a third shuffle and recompute the daily aggregate",
)
def gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.sum("value").alias("dv")
    )
    w = Window.partitionBy("user_id").orderBy("d")
    with_next = daily.withColumn("next_d", F.lead("d").over(w))
    day = F.explode(
        F.sequence(
            "d", F.coalesce(F.date_sub("next_d", 1), F.col("d"))
        )
    )
    return with_next.select(
        "user_id", F.col("d").alias("_d"), F.col("dv").alias("_dv"), day.alias("event_date")
    ).select(
        "user_id",
        "event_date",
        F.when(F.col("event_date") == F.col("_d"), F.round("_dv", 4))
        .otherwise(F.lit(0.0))
        .alias("daily_value"),
        (F.col("event_date") == F.col("_d")).alias("observed"),
    )


@_register(
    "hash_split_documents",
    """
    WITH tagged AS (
        SELECT lang,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                         BETWEEN '0' AND 'b'                          THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                         IN ('c', 'd')                                THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT split, lang, count(*) AS n_docs
    FROM tagged GROUP BY split, lang ORDER BY split, lang
    """,
    "deterministic train/val/test assignment by content-key hash "
    "(md5 of the stable doc key -> 12/2/2 sixteenths). Unlike "
    "df.sample(), the split is reproducible across runs, engines, and "
    "repartitioning — the required property for training-data splits; "
    "embarrassingly parallel, no shuffle until the audit rollup",
)
def hash_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    first_hex = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1)
    split = (
        F.when(first_hex.between("0", "b"), "train")
        .when(first_hex.isin("c", "d"), "val")
        .otherwise("test")
    )
    return (
        docs.select("lang", split.alias("split"))
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("split", "lang")
    )


@_register(
    "text_normalize_redact",
    """
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS norm_fingerprint,
           CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
                AS INT) AS n_digits_redacted,
           CAST(length(regexp_replace(text, '[A-Za-z0-9._]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'))
                AS INT) AS len_after_email_mask
    FROM documents
    """,
    "text normalization + PII-style masking: whitespace collapse + "
    "casefold (fingerprinted via md5 so the oracle compares content, "
    "not layout), digit redaction count, email-pattern masking — "
    "RE2-safe patterns, all JVM-side regexp (extension: the cleaning "
    "pass before dedup/tokenization)",
)
def text_normalize_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    norm = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    return docs.select(
        "doc_id",
        F.md5(norm.cast("binary")).alias("norm_fingerprint"),
        (
            F.length("text") - F.length(F.regexp_replace("text", "[0-9]", ""))
        ).cast("int").alias("n_digits_redacted"),
        F.length(
            F.regexp_replace("text", "[A-Za-z0-9._]+@[A-Za-z0-9.]+", "<EMAIL>")
        ).cast("int").alias("len_after_email_mask"),
    )


@_register(
    "chunk_documents",
    f"""
    WITH t AS (
        SELECT doc_id, {_D_TOKS} AS toks FROM documents
    ),
    n AS (
        SELECT doc_id, toks,
               CASE WHEN len(toks) <= 50 THEN 1
                    ELSE CAST(ceil((len(toks) - 50) / 25.0) AS INT) + 1
               END AS n_chunks
        FROM t
    ),
    c AS (
        SELECT doc_id, unnest(range(0, n_chunks)) AS chunk_idx, toks FROM n
    )
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(len(toks[chunk_idx*25 + 1 : chunk_idx*25 + 50]) AS INT) AS chunk_len,
           md5(array_to_string(toks[chunk_idx*25 + 1 : chunk_idx*25 + 50], ' '))
               AS chunk_hash
    FROM c
    """,
    "document chunking: overlapping 50-token windows with stride 25 via "
    "sequence+explode+slice — one narrow pass, no shuffle, rows fan out "
    "~n_tokens/stride per doc (the context-window preparation step for "
    "training pipelines; chunk content compared by md5 fingerprint)",
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = text.tokens("text")
    with_chunks = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(F.sequence(F.lit(0), text.n_chunks(toks) - 1)).alias("chunk_idx"),
    )
    chunk = F.slice("toks", F.col("chunk_idx") * 25 + 1, 50)
    return with_chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(chunk).alias("chunk_len"),
        F.md5(F.concat_ws(" ", chunk).cast("binary")).alias("chunk_hash"),
    )


@_register(
    "equidepth_deciles",
    """
    WITH ranked AS (
        SELECT o_totalprice,
               CAST(ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS INT)
                   AS decile
        FROM orders
    )
    SELECT decile,
           count(*)                    AS n_orders,
           round(min(o_totalprice), 4) AS lo,
           round(max(o_totalprice), 4) AS hi
    FROM ranked GROUP BY decile ORDER BY decile
    """,
    "equi-depth histogram: ntile deciles with per-bucket bounds — the "
    "statistics shape optimizers collect (equal COUNT per bucket, "
    "variable width; complement of the equi-WIDTH histogram_totalprice). "
    "Unique (price, orderkey) tie-break keeps bucket edges deterministic. "
    "SCALE NOTE: the global ntile is single-task by definition — exact "
    "equi-depth needs a total order. The 100 TB path derives approximate "
    "edges from percentile_approx (see approx_percentile_check) and bins "
    "with range predicates instead",
)
def equidepth_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select("o_totalprice", F.ntile(10).over(w).alias("decile"))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), 4).alias("lo"),
            F.round(F.max("o_totalprice"), 4).alias("hi"),
        )
        .orderBy("decile")
    )


@_register(
    "approx_percentile_check",
    """
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4)  AS p50_exact,
           round(quantile_cont(o_totalprice, 0.95), 4) AS p95_exact,
           TRUE AS sketch_ok
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    "percentile_approx (mergeable quantile sketch, accuracy 10000) "
    "validated within 2% of the exact interpolated percentile — like "
    "the HLL check, the contract is the error bound, since the sketch "
    "value is engine-specific. At 100 TB the sketch is the only option: "
    "exact percentiles need a full sort of the key space per group",
)
def approx_percentile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    p50e = F.expr("percentile(o_totalprice, 0.5)")
    p95e = F.expr("percentile(o_totalprice, 0.95)")
    p50a = F.percentile_approx("o_totalprice", 0.5, 10000)
    p95a = F.percentile_approx("o_totalprice", 0.95, 10000)
    tol = 0.02
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(p50e, 4).alias("p50_exact"),
            F.round(p95e, 4).alias("p95_exact"),
            (
                (F.abs(p50a - p50e) <= tol * p50e)
                & (F.abs(p95a - p95e) <= tol * p95e)
            ).alias("sketch_ok"),
        )
        .orderBy("o_orderpriority")
    )


@_register(
    "dup_clusters",
    """
    WITH RECURSIVE c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    pairs AS (
        SELECT a.vec_id AS pa, b.vec_id AS pb
        FROM c a JOIN c b ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v))) >= 0.35
    ),
    edges AS (SELECT pa AS s, pb AS d FROM pairs
              UNION ALL SELECT pb, pa FROM pairs),
    nodes AS (SELECT DISTINCT s AS node FROM edges),
    reach(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.d, r.label FROM reach r JOIN edges e ON r.node = e.s
    ),
    labels AS (SELECT node, min(label) AS cluster_id FROM reach GROUP BY node)
    SELECT node AS vec_id, cluster_id,
           CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
    FROM labels ORDER BY vec_id
    """,
    "dup-cluster formation: near-dup candidate pairs -> undirected "
    "connected components (iterative distributed min-label propagation, "
    "O(diameter) join+agg rounds — see dedup.connected_components) -> "
    "one cluster id + size per member. The step between pair generation "
    "and survivor selection in every dedup pipeline; oracle is the "
    "recursive-CTE transitive closure, tractable at test scale only",
)
def dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = embedding_neardup_pairs(spark, sf_dir).select("vec_id_a", "vec_id_b")
    labels = dedup.connected_components(pairs, "vec_id_a", "vec_id_b")
    w = Window.partitionBy("cluster_id")
    return (
        labels.select(F.col("node").alias("vec_id"), F.col("label").alias("cluster_id"))
        .withColumn("cluster_size", F.count("*").over(w))
        .orderBy("vec_id")
    )


@_register(
    "near_dedup_survivors",
    """
    WITH RECURSIVE c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    pairs AS (
        SELECT a.vec_id AS pa, b.vec_id AS pb
        FROM c a JOIN c b ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v))) >= 0.35
    ),
    edges AS (SELECT pa AS s, pb AS d FROM pairs
              UNION ALL SELECT pb, pa FROM pairs),
    nodes AS (SELECT DISTINCT s AS node FROM edges),
    reach(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.d, r.label FROM reach r JOIN edges e ON r.node = e.s
    ),
    labels AS (SELECT node, min(label) AS cluster_id FROM reach GROUP BY node)
    SELECT e.vec_id, e.label AS class_label
    FROM embeddings e LEFT JOIN labels l ON e.vec_id = l.node
    WHERE l.node IS NULL OR l.node = l.cluster_id
    ORDER BY e.vec_id
    """,
    "end of the dedup chain: survivors = unclustered rows + the min-id "
    "representative per dup cluster (pairs -> components -> "
    "drop_near_dups). What actually ships to training after near-dedup",
)
def near_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = embedding_neardup_pairs(spark, sf_dir).select("vec_id_a", "vec_id_b")
    labels = dedup.connected_components(pairs, "vec_id_a", "vec_id_b")
    return (
        dedup.drop_near_dups(emb, "vec_id", labels)
        .select("vec_id", F.col("label").alias("class_label"))
        .orderBy("vec_id")
    )


@_register(
    "supplier_nation_profit",
    """
    SELECT n_name AS nation,
           CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS ship_year,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN part     ON p_partkey   = l_partkey
    JOIN supplier ON s_suppkey   = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_retailprice > 910
    GROUP BY n_name, ship_year
    ORDER BY nation, ship_year
    """,
    "TPC-H Q9 shape: fact joined to TWO broadcast dimension chains "
    "(part via l_partkey; supplier→nation via l_suppkey) with the part "
    "filter (retailprice > 910 — inside every SF's price range, so "
    "the result is never degenerately empty) pushed below the join, profit rolled up per supplier-nation "
    "and ship year — completes catalog coverage (part + supplier)",
)
def supplier_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_retailprice") > 910)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.to_date("l_shipdate")).alias("ship_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("nation", "ship_year")
    )


@_register(
    "unpivot_measures",
    """
    WITH agg AS (
        SELECT l_returnflag,
               round(sum(l_quantity), 4)      AS sum_qty,
               round(sum(l_extendedprice), 4) AS sum_price,
               round(sum(l_discount), 4)      AS sum_disc
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM agg
    UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM agg
    UNION ALL SELECT l_returnflag, 'sum_disc',  sum_disc  FROM agg
    ORDER BY l_returnflag, measure
    """,
    "unpivot/melt — the inverse of pivot_linestatus: wide per-flag "
    "measures to long (flag, measure, value) rows via df.unpivot "
    "(Catalyst Expand node: one pass, rows x n_measures output, no "
    "join or union re-scan; the oracle states it as UNION ALL)",
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
        F.round(F.sum("l_discount"), 4).alias("sum_disc"),
    )
    return agg.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "sum_disc"],
        variableColumnName="measure",
        valueColumnName="value",
    ).orderBy("l_returnflag", "measure")


@_register(
    "training_corpus",
    f"""
    WITH RECURSIVE
    norm AS (
        SELECT doc_id, lang, text,
               lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS ntext
        FROM documents
    ),
    qual AS (SELECT * FROM norm WHERE len({_D_TOKS}) >= 5),
    exact_keep AS (SELECT min(doc_id) AS doc_id FROM qual GROUP BY md5(ntext)),
    docs1 AS (SELECT q.* FROM qual q JOIN exact_keep e ON q.doc_id = e.doc_id),
    sigs AS (
        SELECT doc_id,
               {_d_minhash(0)} AS mh0, {_d_minhash(1)} AS mh1,
               {_d_minhash(2)} AS mh2, {_d_minhash(3)} AS mh3,
               {_d_minhash(4)} AS mh4, {_d_minhash(5)} AS mh5,
               {_d_minhash(6)} AS mh6, {_d_minhash(7)} AS mh7
        FROM (SELECT doc_id, {_D_SHINGLES} AS sh FROM docs1)
    ),
    bands AS (
        SELECT doc_id, 0 AS band, concat_ws('|', mh0, mh1) AS sig FROM sigs
        UNION ALL SELECT doc_id, 1, concat_ws('|', mh2, mh3) FROM sigs
        UNION ALL SELECT doc_id, 2, concat_ws('|', mh4, mh5) FROM sigs
        UNION ALL SELECT doc_id, 3, concat_ws('|', mh6, mh7) FROM sigs
    ),
    filt AS (SELECT * FROM bands WHERE sig IS NOT NULL AND sig <> ''),
    pairs AS (
        SELECT DISTINCT a.doc_id AS pa, b.doc_id AS pb
        FROM filt a JOIN filt b ON a.band = b.band AND a.sig = b.sig
                                AND a.doc_id < b.doc_id
    ),
    edges AS (SELECT pa AS s, pb AS d FROM pairs UNION ALL SELECT pb, pa FROM pairs),
    nodes AS (SELECT DISTINCT s AS node FROM edges),
    reach(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.d, r.label FROM reach r JOIN edges e ON r.node = e.s
    ),
    labels AS (SELECT node, min(label) AS cluster_id FROM reach GROUP BY node)
    SELECT d.doc_id, d.lang,
           CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 1)
                     BETWEEN '0' AND 'b' THEN 'train'
                WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 1)
                     IN ('c', 'd') THEN 'val'
                ELSE 'test' END AS split,
           CAST(len(regexp_split_to_array(trim(d.text), '\\s+')) AS INT) AS n_tokens,
           md5(d.ntext) AS fingerprint
    FROM docs1 d LEFT JOIN labels l ON d.doc_id = l.node
    WHERE l.node IS NULL OR l.node = l.cluster_id
    ORDER BY d.doc_id
    """,
    "CAPSTONE — the full training-corpus preparation chain in one "
    "composed plan: normalize -> quality gate (>=5 tokens) -> exact "
    "dedup on the normalized fingerprint -> MinHash-LSH near-dup pairs "
    "-> connected-components clustering -> survivor selection -> "
    "deterministic train/val/test split. Every stage is an operator "
    "verified standalone elsewhere; this proves they COMPOSE, against "
    "one composed oracle (recursive CTE for the iterative stage). "
    "Narrow stages fuse; the only shuffles are the two dedup "
    "aggregations, the LSH band join, and the O(diameter) cluster "
    "rounds on the (tiny) clustered subset",
)
def training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    qual = docs.withColumn("__ntext", text.normalized_text("text")).filter(
        text.token_count("text") >= 5
    )
    # docs1 feeds BOTH the LSH pair generation and the survivor join;
    # a barrier keeps the scan + normalize + exact-dedup from running
    # twice (at 100 TB: a reliable checkpoint / staging write). LAZY:
    # its blocks materialize inside connected_components' eager edge
    # barrier (the first action over this subtree) instead of paying a
    # separate job. distinct=False: a pair repeated per shared band is
    # absorbed by the components' min-aggregate, so the pairs-dedup
    # shuffle is pure overhead in this composition.
    docs1 = dedup.drop_exact_dups(qual, "doc_id", "__ntext").localCheckpoint(
        eager=False
    )
    pairs = dedup.lsh_candidate_pairs(docs1, "doc_id", "text", distinct=False)
    labels = dedup.connected_components(pairs, "doc_id_a", "doc_id_b")
    survivors = dedup.drop_near_dups(docs1, "doc_id", labels)
    first_hex = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1)
    split = (
        F.when(first_hex.between("0", "b"), "train")
        .when(first_hex.isin("c", "d"), "val")
        .otherwise("test")
    )
    return survivors.select(
        "doc_id",
        "lang",
        split.alias("split"),
        text.token_count("text").alias("n_tokens"),
        F.md5(F.col("__ntext").cast("binary")).alias("fingerprint"),
    ).orderBy("doc_id")


@_register(
    "anomaly_mad_events",
    """
    WITH med AS (
        SELECT user_id, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY user_id
    ),
    dev AS (
        SELECT e.user_id, e.event_id, e.value, m.med,
               abs(e.value - m.med) AS adev
        FROM events e JOIN med m USING (user_id)
    ),
    mad AS (
        SELECT user_id, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY user_id
    )
    SELECT d.event_id, d.user_id,
           round(d.value, 4) AS value,
           round((d.value - d.med) / (1.4826 * t.mad), 4) AS robust_z
    FROM dev d JOIN mad t USING (user_id)
    WHERE t.mad > 0 AND abs(d.value - d.med) > 3 * 1.4826 * t.mad
    ORDER BY d.event_id
    """,
    "robust per-entity anomaly detection: median absolute deviation "
    "(MAD) flags events >3 robust sigmas from the user's median — "
    "outlier-resistant where mean/stddev are not. Two percentile "
    "aggregations + broadcastable per-user stats joins, all built-in "
    "(no UDF; exact percentiles swap for percentile_approx at 100 TB)",
)
def anomaly_mad_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # dev is consumed twice (the MAD aggregate and the final join);
    # without a barrier each consumer re-runs the per-user median
    # aggregation over the full fact. localCheckpoint materializes the
    # TINY per-user stats once (#users rows) — the duplicated part
    # left is a bare scan + broadcast join, which is the cheap half.
    med = (
        ev.groupBy("user_id")
        .agg(F.expr("percentile(value, 0.5)").alias("med"))
        .localCheckpoint(eager=False)
    )
    dev = ev.join(F.broadcast(med), "user_id").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("user_id").agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "user_id")
        .filter((F.col("mad") > 0) & (F.col("adev") > 3 * 1.4826 * F.col("mad")))
        .select(
            "event_id",
            "user_id",
            F.round("value", 4).alias("value"),
            F.round(
                (F.col("value") - F.col("med")) / (1.4826 * F.col("mad")), 4
            ).alias("robust_z"),
        )
        .orderBy("event_id")
    )


@_register(
    "funnel_conversion",
    """
    WITH firsts AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN ts END)   AS t_signup,
               min(CASE WHEN event_type = 'click' THEN ts END)    AS t_click,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id
    )
    SELECT count(*) FILTER (t_signup IS NOT NULL) AS n_signup,
           count(*) FILTER (t_click > t_signup)   AS n_click_after_signup,
           count(*) FILTER (t_purchase > t_click AND t_click > t_signup)
               AS n_full_funnel
    FROM firsts
    """,
    "funnel analysis: ordered signup -> click -> purchase conversion "
    "via conditional-min first-touch timestamps — ONE pass over events "
    "(conditional aggregation), one tiny per-user row set, no "
    "per-step self-joins (the naive N-step funnel is N-1 joins)",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    firsts = ev.groupBy("user_id").agg(
        first_ts("signup").alias("t_signup"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )

    def count_if(cond):
        return F.coalesce(F.sum(cond.cast("long")), F.lit(0).cast("long"))

    return firsts.agg(
        count_if(F.col("t_signup").isNotNull()).alias("n_signup"),
        count_if(F.col("t_click") > F.col("t_signup")).alias("n_click_after_signup"),
        count_if(
            (F.col("t_purchase") > F.col("t_click"))
            & (F.col("t_click") > F.col("t_signup"))
        ).alias("n_full_funnel"),
    )


@_register(
    "cohort_retention",
    """
    WITH cohort AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS first_day
        FROM events GROUP BY user_id
    )
    SELECT CAST(floor(datediff('day', DATE '2024-01-01', first_day) / 7) AS INT)
               AS cohort_week,
           CAST(floor(datediff('day', c.first_day, CAST(e.ts AS DATE)) / 7) AS INT)
               AS week_offset,
           count(DISTINCT e.user_id) AS active_users
    FROM events e JOIN cohort c USING (user_id)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    "cohort retention: users bucketed by first-activity week, activity "
    "counted per week offset since their cohort start — first-touch "
    "agg + broadcastable cohort join + distinct-count rollup (the "
    "standard retention triangle; distinct goes approx at 100 TB)",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("first_day"))
    return (
        ev.join(F.broadcast(cohort), "user_id")
        .select(
            F.floor(
                F.datediff("first_day", F.lit("2024-01-01")) / 7
            ).cast("int").alias("cohort_week"),
            F.floor(
                F.datediff(F.to_date("ts"), F.col("first_day")) / 7
            ).cast("int").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


@_register(
    "interpolate_daily",
    """
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS d, sum(value) AS dv
        FROM events GROUP BY 1, 2
    ),
    nxt AS (
        SELECT user_id, d, dv,
               lead(d)  OVER (PARTITION BY user_id ORDER BY d) AS next_d,
               lead(dv) OVER (PARTITION BY user_id ORDER BY d) AS next_dv
        FROM daily
    ),
    expanded AS (
        SELECT user_id, d, dv, next_d, next_dv,
               CAST(unnest(generate_series(d, coalesce(next_d - INTERVAL 1 DAY, d),
                                           INTERVAL 1 DAY)) AS DATE) AS day
        FROM nxt
    )
    SELECT user_id, day AS event_date,
           round(CASE WHEN day = d THEN dv
                      ELSE dv + (next_dv - dv) * datediff('day', d, day)
                                / datediff('day', d, next_d) END, 4) AS value_interp,
           day = d AS observed
    FROM expanded
    ORDER BY user_id, event_date
    """,
    "resample with LINEAR interpolation: gap days get the straight-line "
    "value between the surrounding observations (vs gap_fill_daily's "
    "zero-fill) — same single-branch lead-window explode, two shuffles, "
    "identical IEEE interpolation formula both engines",
)
def interpolate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.sum("value").alias("dv")
    )
    w = Window.partitionBy("user_id").orderBy("d")
    nxt = daily.withColumn("next_d", F.lead("d").over(w)).withColumn(
        "next_dv", F.lead("dv").over(w)
    )
    expanded = nxt.withColumn(
        "day",
        F.explode(F.sequence("d", F.coalesce(F.date_sub("next_d", 1), F.col("d")))),
    )
    interp = F.when(F.col("day") == F.col("d"), F.col("dv")).otherwise(
        F.col("dv")
        + (F.col("next_dv") - F.col("dv"))
        * F.datediff("day", "d")
        / F.datediff("next_d", "d")
    )
    return expanded.select(
        "user_id",
        F.col("day").alias("event_date"),
        F.round(interp, 4).alias("value_interp"),
        (F.col("day") == F.col("d")).alias("observed"),
    ).orderBy("user_id", "event_date")


@_register(
    "sliding_window_rollup",
    """
    WITH starts AS (
        SELECT time_bucket(INTERVAL 12 HOUR, ts) AS w_start, value FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL 12 HOUR, ts) - INTERVAL 12 HOUR, value
        FROM events
    )
    SELECT w_start, count(*) AS n_events, round(sum(value), 4) AS total_value
    FROM starts GROUP BY w_start ORDER BY w_start
    """,
    "sliding (hopping) window: 1-day windows every 12 hours — each "
    "event lands in windowLength/slide = 2 windows (Spark's Expand "
    "node duplicates rows per window; the oracle states the same via "
    "UNION ALL of the two shifted bucket families). The overlap factor "
    "is the scale knob: cost = overlap x input",
)
def sliding_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day", "12 hours").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(F.col("w.start").alias("w_start"), "n_events", "total_value")
        .orderBy("w_start")
    )


@_register(
    "locf_fill_daily",
    """
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS d, sum(value) AS dv
        FROM events GROUP BY 1, 2
    ),
    nxt AS (
        SELECT user_id, d, dv,
               lead(d) OVER (PARTITION BY user_id ORDER BY d) AS next_d
        FROM daily
    )
    SELECT user_id,
           CAST(unnest(generate_series(d, coalesce(next_d - INTERVAL 1 DAY, d),
                                       INTERVAL 1 DAY)) AS DATE) AS event_date,
           round(dv, 4) AS value_filled,
           CAST(unnest(generate_series(d, coalesce(next_d - INTERVAL 1 DAY, d),
                                       INTERVAL 1 DAY)) AS DATE) = d AS observed
    FROM nxt
    ORDER BY user_id, event_date
    """,
    "LOCF resample (last observation carried forward): gap days repeat "
    "the previous observed value — completing the fill-strategy family "
    "(zero-fill gap_fill_daily / linear interpolate_daily / LOCF). Same "
    "two-shuffle lead-window explode; LOCF is the right fill for "
    "state-like series (prices, counters) where zero/linear fabricate",
)
def locf_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.sum("value").alias("dv")
    )
    w = Window.partitionBy("user_id").orderBy("d")
    nxt = daily.withColumn("next_d", F.lead("d").over(w))
    return (
        nxt.withColumn(
            "event_date",
            F.explode(F.sequence("d", F.coalesce(F.date_sub("next_d", 1), F.col("d")))),
        )
        .select(
            "user_id",
            "event_date",
            F.round("dv", 4).alias("value_filled"),
            (F.col("event_date") == F.col("d")).alias("observed"),
        )
        .orderBy("user_id", "event_date")
    )


@_register(
    "winsorize_values",
    """
    WITH q AS (
        SELECT event_type,
               quantile_cont(value, 0.05) AS p05,
               quantile_cont(value, 0.95) AS p95
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           round(sum(least(greatest(e.value, q.p05), q.p95)), 4) AS winsorized_sum,
           round(sum(e.value), 4) AS raw_sum,
           CAST(count(*) FILTER (e.value < q.p05 OR e.value > q.p95) AS BIGINT)
               AS n_clamped
    FROM events e JOIN q USING (event_type)
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
    "per-group winsorization: clamp values to the [p05, p95] band "
    "before aggregating — the outlier-robust cleaning pass (exact "
    "percentiles here; percentile_approx at 100 TB). Broadcastable "
    "per-group bounds join + one aggregation",
)
def winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("p05"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )
    clamped = F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
    outlier = (F.col("value") < F.col("p05")) | (F.col("value") > F.col("p95"))
    return (
        ev.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.sum(clamped), 4).alias("winsorized_sum"),
            F.round(F.sum("value"), 4).alias("raw_sum"),
            F.coalesce(F.sum(outlier.cast("long")), F.lit(0).cast("long")).alias(
                "n_clamped"
            ),
        )
        .orderBy("event_type")
    )


@_register(
    "sample_k_per_group",
    """
    WITH ranked AS (
        SELECT doc_id, lang,
               CAST(row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS INT) AS rk
        FROM documents
    )
    SELECT lang, doc_id, rk FROM ranked WHERE rk <= 3 ORDER BY lang, rk
    """,
    "deterministic K-per-group sampling: rank by content-key hash and "
    "keep the first K — a reproducible 'pick 3 examples per language' "
    "(eval sets, few-shot prompts) that is stable across runs, engines, "
    "and partitioning, unlike df.sample(). One partitioned window pass",
)
def sample_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id"
    )
    return (
        docs.select("lang", "doc_id", F.row_number().over(w).cast("int").alias("rk"))
        .filter(F.col("rk") <= 3)
        .orderBy("lang", "rk")
    )


@_register(
    "ewma_daily_value",
    """
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS d, sum(value) AS dv
        FROM events GROUP BY 1, 2
    ),
    idx AS (
        SELECT user_id, d, dv,
               CAST(row_number() OVER w - 1 AS INT) AS t,
               first_value(dv) OVER w AS x0
        FROM daily
        WINDOW w AS (PARTITION BY user_id ORDER BY d)
    ),
    acc AS (
        SELECT user_id, d, dv, t, x0,
               sum(CASE WHEN t > 0 THEN dv * pow(0.8, -t) ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY d
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        FROM idx
    )
    SELECT user_id, d AS event_date, round(dv, 4) AS daily_value,
           round(pow(0.8, t) * x0 + 0.2 * pow(0.8, t) * s, 4) AS ewma
    FROM acc ORDER BY user_id, event_date
    """,
    "per-entity EWMA (alpha=0.2) via applyInPandas — the sequential "
    "recurrence no Spark window expresses, Arrow-batched per group. "
    "The oracle uses the closed form (y_t = (1-a)^t x_0 + "
    "a * sum (1-a)^(t-i) x_i), valid at 4dp for bounded series — the "
    "ONE Pandas-path query on the surface, and it still carries a full "
    "value-level oracle",
)
def ewma_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from covid19_etl_pipeline_spark.operators.windows import ewma_by_group

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("event_date")).agg(
        F.sum("value").alias("dv")
    )
    out = ewma_by_group(daily, "user_id", "event_date", "dv", alpha=0.2)
    # lazy barrier: the presentation sort's range partitioner SAMPLES
    # its child, which would re-execute the whole Arrow stage for the
    # boundary pass (measured 2x) — the checkpoint makes the sampling
    # read materialized blocks instead
    return (
        out.localCheckpoint(eager=False)
        .select(
            "user_id",
            "event_date",
            F.round("dv", 4).alias("daily_value"),
            F.round("ewma", 4).alias("ewma"),
        )
        .orderBy("user_id", "event_date")
    )


@_register(
    "humanized_revenue",
    """
    SELECT o_orderpriority,
           round(sum(o_totalprice), 2) AS revenue,
           CASE WHEN abs(sum(o_totalprice)) >= 1e9
                    THEN printf('%.2f', sum(o_totalprice) / 1e9) || 'B'
                WHEN abs(sum(o_totalprice)) >= 1e6
                    THEN printf('%.2f', sum(o_totalprice) / 1e6) || 'M'
                WHEN abs(sum(o_totalprice)) >= 1e3
                    THEN printf('%.2f', sum(o_totalprice) / 1e3) || 'K'
                ELSE printf('%.2f', sum(o_totalprice)) END AS revenue_human
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    "engine-side number humanization (F10 — the reference formats "
    "f'{x/1e6:.2f}M' client-side, dashboard.py:200-202): "
    "scalars.humanize_number emits '757.70M'-style strings in the "
    "serving plan, so dashboards need no client formatting pass",
)
def humanized_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from covid19_etl_pipeline_spark.functions.scalars import humanize_number

    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(F.sum("o_totalprice").alias("__t"))
        .select(
            "o_orderpriority",
            F.round("__t", 2).alias("revenue"),
            humanize_number("__t").alias("revenue_human"),
        )
        .orderBy("o_orderpriority")
    )


@_register(
    "source_mixture_weights",
    """
    WITH counts AS (
        SELECT source, count(*) AS n_docs,
               sum(n_chars) AS n_chars_total
        FROM documents GROUP BY source
    )
    SELECT source, n_docs,
           round(pow(n_docs, 0.7) / sum(pow(n_docs, 0.7)) OVER (), 6)
               AS mixture_weight,
           CAST(round(1000 * pow(n_docs, 0.7)
                      / sum(pow(n_docs, 0.7)) OVER (), 0) AS BIGINT)
               AS docs_at_budget_1k,
           CAST(n_chars_total AS BIGINT) AS n_chars_total
    FROM counts
    ORDER BY source
    """,
    "temperature-scaled source mixing (w_s proportional to n_s^0.7, the "
    "standard upweight-the-tail recipe for multi-source training "
    "corpora): per-source counts -> normalized sampling weights -> "
    "expected docs at a fixed budget. One aggregation + a global window "
    "over #sources rows (tiny)",
)
def source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("n_chars_total"),
    )
    w_all = Window.partitionBy()
    raw = F.pow("n_docs", 0.7)
    weight = raw / F.sum(raw).over(w_all)
    return counts.select(
        "source",
        "n_docs",
        F.round(weight, 6).alias("mixture_weight"),
        F.round(1000 * weight, 0).cast("bigint").alias("docs_at_budget_1k"),
        F.col("n_chars_total").cast("bigint").alias("n_chars_total"),
    ).orderBy("source")


@_register(
    "salted_brand_revenue",
    """
    SELECT p_brand,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    "skew-resistant fact-dim join via explicit salting "
    "(operators/partitioning.salted_equi_join): the big side gets a "
    "per-row salt, the dim side is replicated salt ways, the join key "
    "becomes (partkey, salt) — a power-law hot key that would pin one "
    "shuffle partition is scattered across 8. Results are IDENTICAL to "
    "the plain join (the oracle is the unsalted join), which is the "
    "point: salting changes the physical distribution only. At 100 TB "
    "this is the fallback when even AQE's skew split leaves a "
    "straggler (SURVEY §7.4)",
)
def salted_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"), "l_extendedprice", "l_discount"
    )
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = salted_equi_join(li, pt, "p_partkey", salt=8)
    return (
        joined.groupBy("p_brand")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("p_brand")
    )


_SKEW_STRESS_ORACLE = """
    WITH big AS (
        SELECT CASE WHEN l_partkey % 10 < 3 THEN 1 ELSE l_partkey END AS k,
               l_extendedprice, l_discount
        FROM lineitem
    ),
    dim AS (
        SELECT p_partkey AS k, p_brand FROM part WHERE p_partkey % 10 >= 3
        UNION ALL SELECT 1, 'Brand#HOT'
    )
    SELECT p_brand,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           count(*) AS n_lines
    FROM big JOIN dim USING (k)
    GROUP BY p_brand
    ORDER BY p_brand
    """


def _skew_stress_frames(spark: SparkSession, sf_dir: str):
    """Deliberately skewed join inputs for the salting stress bench:
    ~30% of lineitem rows collapse onto ONE hot key (partkeys ending
    0-2 all map to key 1), the dim side keeps unique keys. The same
    frames feed the plain and the salted variant so BENCH measures the
    strategy, not the data."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_partkey") % 10 < 3, F.lit(1))
        .otherwise(F.col("l_partkey"))
        .alias("k"),
        "l_extendedprice",
        "l_discount",
    )
    pt = load_table(spark, sf_dir, "part")
    dim = (
        pt.filter(F.col("p_partkey") % 10 >= 3)
        .select(F.col("p_partkey").alias("k"), "p_brand")
        .unionByName(
            spark.createDataFrame([(1, "Brand#HOT")], "k long, p_brand string")
        )
    )
    return li, dim


def _skew_stress_rollup(joined: DataFrame) -> DataFrame:
    return (
        joined.groupBy("p_brand")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("p_brand")
    )


@_register(
    "skewed_key_rollup_plain",
    _SKEW_STRESS_ORACLE,
    "skew-stress CONTROL: the deliberately hot key (one key = ~30% of "
    "the fact) joined with a plain shuffle-hash join — the broadcast "
    "path is hinted off because the scenario under test is the "
    "shuffle-join regime where a dim side is too big to broadcast (at "
    "100 TB a billion-row dim). One reducer owns the hot key unless "
    "AQE's skew split intervenes; BENCH records this against the "
    "salted twin `skewed_key_rollup_salted` so the salting payoff is "
    "a measured number (SCALE.md §9), not an assertion",
)
def skewed_key_rollup_plain(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, dim = _skew_stress_frames(spark, sf_dir)
    return _skew_stress_rollup(li.join(dim.hint("shuffle_hash"), "k"))


@_register(
    "skewed_key_rollup_salted",
    _SKEW_STRESS_ORACLE,
    "skew-stress TREATMENT: identical inputs and result as "
    "`skewed_key_rollup_plain`, but through "
    "partitioning.salted_equi_join (per-row salt on the fact, dim "
    "replicated salt ways, join key (k, salt)) — the hot key's rows "
    "scatter across 8 partitions instead of pinning one reducer. "
    "Oracle is the SAME unsalted SQL: salting is physical only",
)
def skewed_key_rollup_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, dim = _skew_stress_frames(spark, sf_dir)
    return _skew_stress_rollup(
        salted_equi_join(li, dim.hint("shuffle_hash"), "k", salt=8)
    )


@_register(
    "order_count_distribution",
    """
    WITH per_cust AS (
        SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
        FROM customer c LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT n_orders, count(*) AS n_customers
    FROM per_cust
    GROUP BY n_orders
    ORDER BY n_customers DESC, n_orders DESC
    """,
    "TPC-H Q13 shape — customer order-count distribution: left outer "
    "join with a join-side predicate (priority filter must live in the "
    "ON clause, not WHERE, or zero-order customers vanish), count per "
    "customer, then histogram the counts. Plan: one shuffle to "
    "co-partition customer and orders on custkey, the per-customer "
    "aggregate reuses that partitioning (no extra exchange), and the "
    "second aggregate is over #distinct-counts rows (tiny). The "
    "reference has no outer joins (SURVEY §2.3) — this is the "
    "capability-parity demo for them",
)
def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count("*").alias("n_customers"))
        .orderBy(F.col("n_customers").desc(), F.col("n_orders").desc())
    )


@_register(
    "sole_returner_suppliers",
    """
    WITH l AS (SELECT l_orderkey, l_suppkey, l_returnflag FROM lineitem)
    SELECT s.s_name, count(DISTINCT l1.l_orderkey) AS n_orders
    FROM supplier s
    JOIN l l1 ON l1.l_suppkey = s.s_suppkey AND l1.l_returnflag = 'R'
    WHERE EXISTS (
            SELECT 1 FROM l l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
            SELECT 1 FROM l l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY n_orders DESC, s.s_name
    LIMIT 20
    """,
    "TPC-H Q21 shape — suppliers who are the SOLE returner in "
    "multi-supplier orders: correlated EXISTS (another supplier in the "
    "order) + NOT EXISTS (no other supplier returned) composed as "
    "left-semi + left-anti self-joins on lineitem, then a broadcast "
    "supplier join and distinct-count rollup. All three lineitem scans "
    "shuffle on l_orderkey, so AQE plans them into one co-partitioned "
    "exchange reuse; the reference has no semi/anti joins (SURVEY "
    "§2.3) — this composes both in one query with a unique "
    "(n_orders desc, s_name) tie-break",
)
def sole_returner_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    r_lines = li.filter(F.col("l_returnflag") == "R")
    others = li.select(
        F.col("l_orderkey").alias("o_key"),
        F.col("l_suppkey").alias("o_supp"),
        F.col("l_returnflag").alias("o_flag"),
    )
    multi_cond = (F.col("l_orderkey") == F.col("o_key")) & (
        F.col("l_suppkey") != F.col("o_supp")
    )
    in_multi = r_lines.join(others, multi_cond, "left_semi")
    sole = in_multi.join(
        others.filter(F.col("o_flag") == "R"), multi_cond, "left_anti"
    )
    return (
        sole.join(F.broadcast(sup), sole["l_suppkey"] == sup["s_suppkey"])
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "s_name")
        .limit(20)
    )


@_register(
    "multimodal_asset_stats",
    """
    WITH assets AS (
        SELECT doc_id,
               CASE CAST(substr(source, 4, 10) AS INT) % 3
                    WHEN 0 THEN 'image/png'
                    WHEN 1 THEN 'audio/wav'
                    ELSE 'video/mp4' END AS mime_type,
               octet_length(encode(text)) AS n_bytes,
               md5(text) AS payload_md5
        FROM documents
    )
    SELECT mime_type,
           count(*) AS n_assets,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           round(avg(n_bytes), 4) AS avg_bytes,
           min(payload_md5) AS min_payload_md5
    FROM assets
    GROUP BY mime_type
    ORDER BY mime_type
    """,
    "multimodal-column plumbing, oracle-checked end: documents ingested "
    "as opaque binary assets (payload = utf-8 bytes standing in for "
    "image/audio blobs, mime type as typed metadata per "
    "operators/multimodal.ASSET_SCHEMA), then a metadata-only rollup — "
    "byte sizes and content hashes computed FROM the binary column, "
    "grouped by mime. The decode/featurize half (mapInPandas over "
    "Arrow batches, stubbed codec) is exercised by the multimodal "
    "operator tests; this query pins the part an oracle CAN check: "
    "binary payload round-trip, octet counting, hash stability. At "
    "100 TB the mime/size predicates are plain columns, so Catalyst "
    "prunes files before any blob is read",
)
def multimodal_asset_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    src_num = F.substring("source", 4, 10).cast("int") % 3
    assets = docs.select(
        "doc_id",
        F.when(src_num == 0, "image/png")
        .when(src_num == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("mime_type"),
        F.col("text").cast("binary").alias("payload"),
    )
    return (
        assets.groupBy("mime_type")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum(F.octet_length("payload")).cast("bigint").alias("total_bytes"),
            F.round(F.avg(F.octet_length("payload")), 4).alias("avg_bytes"),
            F.min(F.md5("payload")).alias("min_payload_md5"),
        )
        .orderBy("mime_type")
    )


@_register(
    "heavy_hitters_cms",
    """
    WITH topk AS (
        SELECT event_type, count(*) AS n_events_exact
        FROM events
        GROUP BY event_type
        ORDER BY n_events_exact DESC, event_type
        LIMIT 20
    )
    SELECT event_type, n_events_exact, TRUE AS cms_ok
    FROM topk
    ORDER BY event_type
    """,
    "count-min-sketch heavy hitters validated against exact counts: the "
    "CMS estimate is engine-specific (seeded, mergeable across "
    "partitions), so — like the HLL query — the checked contract is "
    "the CMS guarantee: estimate >= exact and estimate <= exact + "
    "eps * N (eps=0.001, confidence 0.99). The sketch is built "
    "distributed (one pass, partial sketches merged tree-wise) and "
    "probed on the driver against the TOP-K of the exact rollup only — "
    "every driver-side structure is bounded by k=20 (TakeOrdered, not "
    "an unbounded collect), so the audit is safe on an arbitrarily "
    "high-cardinality key; N comes from the sketch's own totalCount, "
    "not a second pass over the fact",
)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    eps, confidence, seed = 0.001, 0.99, 42
    k = 20
    raw = ev.agg(
        F.expr(
            f"count_min_sketch(event_type, {eps}d, {confidence}d, {seed})"
        ).alias("s")
    ).head()["s"]
    jvm = spark._jvm
    sketch = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(raw))
    )
    # bounded driver state: top-k heavy hitters only (k rows, whatever
    # the key cardinality), and the stream total from the sketch itself
    topk = (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("n_events_exact"))
        .orderBy(F.col("n_events_exact").desc(), "event_type")
        .limit(k)
        .collect()
    )
    total = sketch.totalCount()
    rows = [
        (
            r["event_type"],
            r["n_events_exact"],
            r["n_events_exact"]
            <= sketch.estimateCount(r["event_type"])
            <= r["n_events_exact"] + eps * total,
        )
        for r in topk
    ]
    return spark.createDataFrame(
        rows, "event_type string, n_events_exact bigint, cms_ok boolean"
    ).orderBy("event_type")


@_register(
    "scd2_customer_tiers",
    """
    WITH h AS (
        SELECT o_custkey,
               CAST(o_orderdate AS DATE) AS order_date,
               CAST(least(floor(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) / 250000), 5) AS INT)
                   AS tier
        FROM orders
    ),
    changes AS (
        SELECT o_custkey, order_date, tier,
               lag(tier) OVER (PARTITION BY o_custkey
                               ORDER BY order_date, tier) AS prev_tier
        FROM h
    ),
    versions AS (
        SELECT o_custkey, tier, order_date AS valid_from,
               lead(order_date) OVER (PARTITION BY o_custkey
                                      ORDER BY order_date, tier) AS valid_to
        FROM changes
        WHERE prev_tier IS NULL OR tier <> prev_tier
    )
    SELECT o_custkey, tier, valid_from, valid_to,
           valid_to IS NULL AS is_current
    FROM versions
    ORDER BY o_custkey, valid_from
    """,
    "SCD2 (type-2 slowly-changing dimension) build from history: "
    "cumulative customer spend -> derived tier attribute -> "
    "change-detection (lag) keeps only rows where the tier moves -> "
    "validity intervals (lead) + is_current flag. The warehouse-"
    "standard versioned-dimension pattern the reference's "
    "truncate-and-reload serving layer (data_loader.py:252-262) cannot "
    "express. Plan: one shuffle on custkey; all three windows share "
    "the same partitioning, so Catalyst plans them into a single "
    "sort+exchange. The running sum is ordered by the unique "
    "(o_orderdate, o_orderkey) key, so float accumulation order — and "
    "therefore every tier boundary — is engine-deterministic",
)
def scd2_customer_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w_cum = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    h = o.select(
        "o_custkey",
        F.to_date("o_orderdate").alias("order_date"),
        F.least(
            F.floor(F.sum("o_totalprice").over(w_cum) / 250000), F.lit(5)
        )
        .cast("int")
        .alias("tier"),
    )
    w_chg = Window.partitionBy("o_custkey").orderBy("order_date", "tier")
    changes = h.withColumn("prev_tier", F.lag("tier").over(w_chg)).filter(
        F.col("prev_tier").isNull() | (F.col("tier") != F.col("prev_tier"))
    )
    w_ver = Window.partitionBy("o_custkey").orderBy("order_date", "tier")
    return (
        changes.select(
            "o_custkey",
            "tier",
            F.col("order_date").alias("valid_from"),
            F.lead("order_date").over(w_ver).alias("valid_to"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
        .orderBy("o_custkey", "valid_from")
    )


@_register(
    "stratified_sample_documents",
    """
    SELECT doc_id, lang, source
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <=
          CASE lang WHEN 'en' THEN '7' WHEN 'de' THEN '3' ELSE '1' END
    ORDER BY doc_id
    """,
    "deterministic stratified sampling: per-language rates (en 8/16, "
    "de 4/16, others 2/16) applied as a content-key hash threshold — "
    "downsample the over-represented stratum, keep the tail. Unlike "
    "df.sample(fraction, seed) the selection is reproducible across "
    "engines, runs, and repartitioning (the property training-data "
    "curation needs for auditable corpus composition); "
    "embarrassingly parallel — a pure filter, no shuffle, and the "
    "hash predicate pushes to the scan",
)
def stratified_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    first_hex = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1)
    thresh = (
        F.when(F.col("lang") == "en", "7")
        .when(F.col("lang") == "de", "3")
        .otherwise("1")
    )
    return (
        docs.filter(first_hex <= thresh)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


@_register(
    "fuzzy_name_matches",
    """
    WITH names AS (SELECT DISTINCT p_name FROM part),
    blocked AS (
        SELECT p_name, split_part(p_name, ' ', 2) AS block_key FROM names
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
    FROM blocked a JOIN blocked b
      ON a.block_key = b.block_key AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 5
    ORDER BY name_a, name_b
    """,
    "blocked fuzzy matching (entity resolution): candidate pairs only "
    "within a blocking key (the product noun), then edit-distance "
    "filter — the record-linkage pattern for catalog/author/entity "
    "dedup in training-data curation. Blocking turns the O(n^2) "
    "all-pairs comparison into per-block quadratic on distinct keys "
    "(dedup to DISTINCT names first — the 100 TB move: compare "
    "canonical strings, not rows); levenshtein is a JVM built-in, no "
    "UDF. Same shape scales to token-sort keys or phonetic blocks",
)
def fuzzy_name_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = load_table(spark, sf_dir, "part").select("p_name").distinct()
    blocked = names.withColumn("block_key", F.split("p_name", " ").getItem(1))
    a = blocked.select(
        F.col("p_name").alias("name_a"), F.col("block_key").alias("bk_a")
    )
    b = blocked.select(
        F.col("p_name").alias("name_b"), F.col("block_key").alias("bk_b")
    )
    return (
        a.join(b, (F.col("bk_a") == F.col("bk_b")) & (F.col("name_a") < F.col("name_b")))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= 5)
        .select("name_a", "name_b", "edit_dist")
        .orderBy("name_a", "name_b")
    )


@_register(
    "kmeans_refined_centroids",
    """
    WITH pts AS (
        SELECT vec_id AS pid, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    c0 AS (
        SELECT pid AS cid, list_transform(v, x -> round(x, 6)) AS cv
        FROM pts WHERE pid < 8
    ),
    s1 AS (
        SELECT p.pid, c.cid, p.v,
               list_dot_product(p.v, p.v) - 2 * list_dot_product(p.v, c.cv)
                 + list_dot_product(c.cv, c.cv) AS d2
        FROM pts p, c0 c
    ),
    a1 AS (
        SELECT pid, cid, v FROM (
            SELECT pid, cid, v,
                   row_number() OVER (PARTITION BY pid ORDER BY d2, cid) AS rn
            FROM s1) WHERE rn = 1
    ),
    c1 AS (
        SELECT cid, list(m ORDER BY pos) AS cv FROM (
            SELECT a.cid, g.pos, round(avg(a.v[g.pos]), 6) AS m
            FROM a1 a, generate_series(1, 64) g(pos)
            GROUP BY a.cid, g.pos) GROUP BY cid
    ),
    s2 AS (
        SELECT p.pid, c.cid, p.v,
               list_dot_product(p.v, p.v) - 2 * list_dot_product(p.v, c.cv)
                 + list_dot_product(c.cv, c.cv) AS d2
        FROM pts p, c1 c
    ),
    a2 AS (
        SELECT pid, cid, v FROM (
            SELECT pid, cid, v,
                   row_number() OVER (PARTITION BY pid ORDER BY d2, cid) AS rn
            FROM s2) WHERE rn = 1
    ),
    c2 AS (
        SELECT cid, list(m ORDER BY pos) AS cv FROM (
            SELECT a.cid, g.pos, round(avg(a.v[g.pos]), 6) AS m
            FROM a2 a, generate_series(1, 64) g(pos)
            GROUP BY a.cid, g.pos) GROUP BY cid
    ),
    s3 AS (
        SELECT p.pid, c.cid,
               list_dot_product(p.v, p.v) - 2 * list_dot_product(p.v, c.cv)
                 + list_dot_product(c.cv, c.cv) AS d2
        FROM pts p, c2 c
    ),
    a3 AS (
        SELECT pid, cid, d2 FROM (
            SELECT pid, cid, d2,
                   row_number() OVER (PARTITION BY pid ORDER BY d2, cid) AS rn
            FROM s3) WHERE rn = 1
    )
    SELECT a3.cid, count(*) AS n_members,
           round(sqrt(list_dot_product(c2.cv, c2.cv)), 4) + 0.0 AS centroid_norm,
           round(avg(a3.d2), 4) + 0.0 AS inertia
    FROM a3 JOIN c2 ON a3.cid = c2.cid
    GROUP BY a3.cid, c2.cv
    ORDER BY a3.cid
    """,
    "fixed-iteration Lloyd k-means (2 rounds, deterministic first-k "
    "init) refining the coarse quantizer `sim_ivf_topk` stubs: "
    "broadcast nested-loop assignment (no shuffle), per-(cluster,dim) "
    "mean update whose shuffle is k*dim cells regardless of corpus "
    "size, centroids re-rounded to 6dp each round so float summation "
    "order cannot drift the next assignment — which is what makes a "
    "genuinely iterative ML algorithm oracle-comparable (the oracle "
    "unrolls both rounds as CTEs). Driver loop controls iteration "
    "only, like connected_components",
)
def kmeans_refined_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    assigned, cent = similarity.lloyd_iterations(emb, k=8, iters=2)
    norm = F.round(F.sqrt(similarity.dot(F.col("cv"), F.col("cv"))), 4) + 0.0
    return (
        assigned.groupBy("cid")
        .agg(
            F.count("*").alias("n_members"),
            (F.round(F.avg("d2"), 4) + 0.0).alias("inertia"),
        )
        .join(cent.select("cid", norm.alias("centroid_norm")), "cid")
        .select("cid", "n_members", "centroid_norm", "inertia")
        .orderBy("cid")
    )


@_register(
    "repetition_quality",
    f"""
    WITH sh AS (
        SELECT doc_id, lang,
               len({_D_TOKS}) - 2 AS n_tri,
               len(list_distinct({_D_SHINGLES})) AS n_distinct
        FROM documents
        WHERE len({_D_TOKS}) >= 3
    )
    SELECT doc_id, lang,
           CAST(n_tri AS INT) AS n_trigrams,
           round(1.0 - CAST(n_distinct AS DOUBLE) / n_tri, 4)
               AS dup_trigram_frac,
           (1.0 - CAST(n_distinct AS DOUBLE) / n_tri) > 0.2 AS flagged
    FROM sh
    ORDER BY doc_id
    """,
    "intra-document repetition scoring (the Gopher-style quality "
    "filter): fraction of duplicate token trigrams within each doc — "
    "boilerplate/spam/generation loops score high and get flagged "
    "(>0.2). Reuses the dedup shingle machinery (text.shingles); "
    "embarrassingly parallel narrow compute, no shuffle before the "
    "final sort, and per-row integer-ratio arithmetic so both engines "
    "agree exactly",
)
def repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The quality gate filters on the CHEAP token count (>=3 tokens <=>
    # >=1 trigram): Catalyst substitutes filter expressions through
    # projections and pushes them below the spread() exchange, so a
    # filter phrased on the shingle array would rebuild every trigram
    # string on the (single-split) pre-spread side. n_trigrams is
    # likewise derived arithmetically (n_toks - 2) so the trigram array
    # is constructed exactly once, in the post-spread parallel project.
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    n_toks = F.size(text.tokens("text"))
    tri = text.shingles(text.tokens("text"), k=3)
    sized = docs.filter(n_toks >= 3).select(
        "doc_id",
        "lang",
        (n_toks - 2).alias("n_trigrams"),
        F.size(F.array_distinct(tri)).alias("n_distinct"),
    )
    frac = 1.0 - F.col("n_distinct").cast("double") / F.col("n_trigrams")
    return sized.select(
        "doc_id",
        "lang",
        "n_trigrams",
        F.round(frac, 4).alias("dup_trigram_frac"),
        (frac > 0.2).alias("flagged"),
    ).orderBy("doc_id")


@_register(
    "tfidf_top_terms",
    r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_transform(regexp_split_to_array(trim(text), '\s+'),
                                     t -> lower(t))) AS term
        FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
        FROM tf JOIN df ON tf.term = df.term, n
    ),
    r AS (
        SELECT doc_id, term, tfidf,
               CAST(row_number() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, term) AS INT) AS rank
        FROM scored
    )
    SELECT doc_id, term, tfidf, rank
    FROM r WHERE rank <= 3
    ORDER BY doc_id, rank
    """,
    "per-document TF-IDF top terms: explode tokens -> term frequency "
    "per doc -> document frequency (count over the already-distinct "
    "doc-term pairs, no second distinct pass) -> tf * ln(N/df) -> "
    "top-3 per doc. The doc-count scalar joins in as a broadcast "
    "1-row aggregate (no driver round-trip); scores are rounded "
    "BEFORE ranking so the (tfidf desc, term) order is engine-"
    "deterministic. The keyword-extraction primitive for corpus "
    "labeling/retrieval indexing",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    # df (document frequency) is a WINDOW count over the tf rollup, not
    # a groupBy + join-back: the join-back form duplicates the whole
    # tokenize->explode->tf subtree in the physical plan (expression
    # ids differ, so ReusedExchange never kicks in) — at 100 TB that
    # doubles the dominant cost. The window adds one exchange on term
    # but tokenizes once. The doc-count scalar reads the UNspread
    # table: it needs no parallel compute, so no repartition branch.
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = docs.select(
        "doc_id",
        F.explode(F.transform(text.tokens("text"), F.lower)).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    n = load_table(spark, sf_dir, "documents").agg(F.count("*").alias("n_docs"))
    scored = (
        tf.withColumn("df", F.count("*").over(Window.partitionBy("term")))
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tfidf", "rank")
        .orderBy("doc_id", "rank")
    )


@_register(
    "semantic_doc_retrieval",
    r"""
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id < 3
    ),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
    s AS (
        SELECT query_id, vec_id,
               list_dot_product(qv, cv)
                 / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                 AS sim
        FROM q JOIN c ON vec_id <> query_id
    ),
    r AS (
        SELECT query_id, vec_id, sim,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, vec_id) AS INT) AS rank
        FROM s
    )
    SELECT r.query_id, r.rank, d.doc_id, d.lang,
           round(r.sim, 6) AS cosine_sim,
           CAST(len(regexp_split_to_array(trim(d.text), '\s+')) AS INT) AS n_tokens
    FROM r JOIN documents d ON r.vec_id = d.doc_id
    WHERE r.rank <= 5
    ORDER BY r.query_id, r.rank
    """,
    "retrieval pipeline (the RAG serving shape): ANN top-k over the "
    "embedding column, then hydrate the hit list by joining doc ids "
    "back to the documents table for text metadata. The hydration join "
    "input is |Q| x k rows — tiny — so it broadcasts against the "
    "(partition-pruned) documents scan; the expensive half is the "
    "similarity search, which swaps to the LSH/IVF variants at scale "
    "without touching the hydration stage",
)
def semantic_doc_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    hits = similarity.brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 3), k=5
    )
    return (
        docs.join(
            F.broadcast(hits), hits["vec_id"] == docs["doc_id"]
        )
        .select(
            "query_id",
            "rank",
            "doc_id",
            "lang",
            F.round("cosine_sim", 6).alias("cosine_sim"),
            F.size(text.tokens("text")).alias("n_tokens"),
        )
        .orderBy("query_id", "rank")
    )


@_register(
    "small_order_revenue",
    """
    WITH pa AS (
        SELECT l_partkey, avg(l_quantity) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT round(sum(l.l_extendedprice) / 7.0, 4) AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
    WHERE l.l_quantity < 0.5 * pa.avg_qty
    """,
    "TPC-H Q17 shape — correlated scalar aggregate subquery "
    "(per-part average quantity) decorrelated as a WINDOW: the "
    "correlated bound is avg OVER (PARTITION BY l_partkey), so the "
    "fact scans once and shuffles once (the pre-agg + join-back "
    "form, which the oracle uses, duplicates the scan subtree; the "
    "per-row-subquery anti-pattern is O(n) scans). Engines agree "
    "exactly: integer quantities sum exactly in double, so the "
    "window avg equals the grouped avg bit-for-bit",
)
def small_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Window form, not pre-agg + join-back: the join-back duplicates
    # the lineitem scan subtree (no exchange reuse across expression
    # ids), while avg OVER (PARTITION BY l_partkey) computes the
    # correlated bound in the SAME shuffle that would feed the join —
    # one scan, one exchange. Determinism: quantities are small
    # integers, their double sum is exact in any order, so the window
    # avg equals the oracle's grouped avg bit-for-bit.
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    return (
        li.withColumn("avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


@_register(
    "price_percentile_ranks",
    """
    SELECT o_orderkey, o_orderpriority,
           round(percent_rank() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice, o_orderkey), 6)
               AS price_percent_rank,
           round(cume_dist() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice, o_orderkey), 6)
               AS price_cume_dist
    FROM orders
    WHERE o_custkey < 100
    ORDER BY o_orderkey
    """,
    "relative-standing window functions (percent_rank, cume_dist) per "
    "priority class — the remaining ranking-family members after "
    "row_number/rank/dense_rank (`rank_distribution`) and ntile "
    "(`equidepth_deciles`). Both are exact integer ratios "
    "((rank-1)/(n-1), n_le/n), so engine-deterministic; the unique "
    "(o_totalprice, o_orderkey) ordering pins tie behavior identically "
    "on both sides. One shuffle on the partition key",
)
def price_percentile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("price_percent_rank"),
        F.round(F.cume_dist().over(w), 6).alias("price_cume_dist"),
    ).orderBy("o_orderkey")


@_register(
    "referential_integrity_audit",
    """
    SELECT 'customer_pk_dups' AS check_name,
           (SELECT count(*) FROM (
               SELECT c_custkey FROM customer
               GROUP BY c_custkey HAVING count(*) > 1)) AS n_violations
    UNION ALL
    SELECT 'lineitem_null_keys',
           (SELECT count(*) FROM lineitem
            WHERE l_orderkey IS NULL OR l_partkey IS NULL)
    UNION ALL
    SELECT 'lineitem_orphans',
           (SELECT count(*) FROM lineitem l
            LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderkey IS NULL)
    UNION ALL
    SELECT 'orders_orphan_customers',
           (SELECT count(*) FROM orders o
            LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_custkey IS NULL)
    ORDER BY check_name
    """,
    "referential-integrity audit — the constraint checks a lakehouse "
    "must run itself (parquet enforces nothing): PK uniqueness, "
    "NOT-NULL key columns, and FK orphan detection in both fact "
    "directions. Orphan checks are left-ANTI joins (only the key "
    "column shuffles, and a broadcast when the parent side is small); "
    "the four audit scalars union into one tiny report. The engine "
    "twin of the reference's NaN/row-count diagnostics (debugdb.py)",
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def one(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").alias("n_violations")).select(
            F.lit(name).alias("check_name"), "n_violations"
        )

    pk_dups = (
        c.groupBy("c_custkey").agg(F.count("*").alias("n")).filter(F.col("n") > 1)
    )
    null_keys = li.filter(
        F.col("l_orderkey").isNull() | F.col("l_partkey").isNull()
    )
    li_orphans = li.join(
        o.select("o_orderkey"),
        li["l_orderkey"] == o["o_orderkey"],
        "left_anti",
    )
    o_orphans = o.join(
        c.select("c_custkey"), o["o_custkey"] == c["c_custkey"], "left_anti"
    )
    return (
        one("customer_pk_dups", pk_dups)
        .unionByName(one("lineitem_null_keys", null_keys))
        .unionByName(one("lineitem_orphans", li_orphans))
        .unionByName(one("orders_orphan_customers", o_orphans))
        .orderBy("check_name")
    )


@_register(
    "join_key_skew_profile",
    """
    WITH k AS (
        SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
    )
    SELECT count(*) AS n_keys,
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           CAST(max(cnt) AS BIGINT) AS max_rows_per_key,
           round(avg(cnt), 4) AS avg_rows_per_key,
           round(CAST(quantile_cont(CAST(cnt AS DOUBLE), 0.99) AS DOUBLE), 4)
               AS p99_rows_per_key,
           round(CAST(max(cnt) AS DOUBLE) / avg(cnt), 4) AS skew_factor
    FROM k
    """,
    "join-key skew diagnostic — the measurement that decides between a "
    "plain shuffle join, AQE skew split, and explicit salting "
    "(`salted_brand_revenue`): per-key row counts, p99, and the "
    "max/avg skew factor. Two partial-aggregable passes (key rollup, "
    "then a 1-row profile); at 100 TB this runs on a sample or on the "
    "key rollup you were about to shuffle anyway. Run it BEFORE "
    "picking a join strategy, not after the straggler shows up",
)
def join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    return k.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.max("cnt").cast("bigint").alias("max_rows_per_key"),
        F.round(F.avg("cnt"), 4).alias("avg_rows_per_key"),
        F.round(F.percentile(F.col("cnt").cast("double"), 0.99), 4).alias(
            "p99_rows_per_key"
        ),
        F.round(F.max("cnt").cast("double") / F.avg("cnt"), 4).alias("skew_factor"),
    )


@_register(
    "nation_pair_trade_volume",
    """
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(CAST(l.l_shipdate AS DATE)) AS INT) AS ship_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS volume,
           count(*) AS n_lines
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE sn.n_name <> cn.n_name
      AND year(CAST(l.l_shipdate AS DATE)) BETWEEN 1996 AND 1997
    GROUP BY sn.n_name, cn.n_name, year(CAST(l.l_shipdate AS DATE))
    HAVING sum(l.l_extendedprice * (1 - l.l_discount)) > 0
    ORDER BY volume DESC, supp_nation, cust_nation, ship_year
    LIMIT 25
    """,
    "TPC-H Q7 shape — cross-border trade volume with the SAME "
    "dimension (nation) joined in TWO roles (supplier's vs customer's "
    "nation): one fact⋈fact shuffle (lineitem⋈orders on orderkey), "
    "every dimension chain broadcast, the inequality filter applied "
    "after both roles resolve. Year-banded predicate prunes at the "
    "scan. Completes the multi-join matrix (Q3/Q5/Q9/Q13/Q17/Q21 "
    "elsewhere); unique tie-broken top-25",
)
def nation_pair_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    ship_year = F.year(F.to_date("l_shipdate"))
    joined = (
        li.withColumn("ship_year", ship_year)
        .filter(F.col("ship_year").between(1996, 1997))
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), F.col("o_custkey") == c["c_custkey"])
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .join(
            F.broadcast(n.select(
                F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
            )),
            F.col("c_nationkey") == F.col("cn_key"),
        )
        .join(
            F.broadcast(n.select(
                F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
            )),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    vol = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        joined.groupBy("supp_nation", "cust_nation", "ship_year")
        .agg(F.round(vol, 4).alias("volume"), F.count("*").alias("n_lines"))
        .filter(F.col("volume") > 0)
        .orderBy(
            F.col("volume").desc(), "supp_nation", "cust_nation", "ship_year"
        )
        .limit(25)
    )


@_register(
    "price_extremes_window",
    """
    SELECT o_orderkey, o_orderpriority,
           round(first_value(o_totalprice) OVER w, 4) AS cheapest_in_class,
           round(last_value(o_totalprice) OVER w, 4)  AS priciest_in_class,
           round(nth_value(o_totalprice, 2) OVER w, 4) AS second_cheapest
    FROM orders
    WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_orderkey
    """,
    "value-navigation window family (first_value / last_value / "
    "nth_value) with an explicit unbounded-both ROWS frame — "
    "last_value under the DEFAULT frame is the notorious footgun (it "
    "sees only up to CURRENT ROW); pinning the frame makes the "
    "semantics explicit and engine-identical. Unique (price, orderkey) "
    "ordering; one shuffle on the partition key",
)
def price_extremes_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.first("o_totalprice").over(w), 4).alias("cheapest_in_class"),
        F.round(F.last("o_totalprice").over(w), 4).alias("priciest_in_class"),
        F.round(F.nth_value("o_totalprice", 2).over(w), 4).alias("second_cheapest"),
    ).orderBy("o_orderkey")


@_register(
    "cdc_latest_user_state",
    """
    WITH ranked AS (
        SELECT user_id, event_id, event_type, value, ts,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT user_id,
           event_id AS last_event_id,
           event_type AS last_event_type,
           round(value, 4) AS last_value,
           CAST(epoch_us(ts) AS BIGINT) AS last_ts_us
    FROM ranked WHERE rn = 1
    ORDER BY user_id
    """,
    "CDC log compaction: collapse an append-only change log to the "
    "current snapshot — one row per key, the latest by (ts, event_id). "
    "The batch twin of streaming.joins.latest_per_key (which uses the "
    "single-pass struct-argmax form); here the window form, one "
    "shuffle on the key. At 100 TB this is the materialization step "
    "between a CDC feed and a serving table, run incrementally via "
    "foreachBatch MERGE (streaming/joins.py)",
)
def cdc_latest_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.round("value", 4).alias("last_value"),
            F.unix_micros("ts").alias("last_ts_us"),
        )
        .orderBy("user_id")
    )


@_register(
    "revenue_contribution",
    """
    WITH nat AS (
        SELECT r.r_name AS region_name, n.n_name AS nation_name,
               sum(o.o_totalprice) AS rev
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name
    )
    SELECT region_name, nation_name,
           round(rev, 4) AS revenue,
           round(rev / sum(rev) OVER (PARTITION BY region_name), 6) + 0.0
               AS share_of_region,
           round(rev / sum(rev) OVER (), 6) + 0.0 AS share_of_total
    FROM nat
    ORDER BY region_name, nation_name
    """,
    "contribution analysis (percent-of-parent at two grains): "
    "per-nation revenue as a share of its region and of the world — "
    "aggregate once, then two window sums over the tiny rollup (25 "
    "nations), so the expensive pass is the single fact aggregation; "
    "dims broadcast. The BI 'share of wallet' pattern generalizing the "
    "reference's per-country aggregates (data_transformer.py:219-256)",
)
def revenue_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    # customer is fact-key-sized — NOT broadcast (AQE may still choose
    # to at small SF); only the true dims (25 nations, 5 regions) ship.
    nat = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), F.col("c_nationkey") == n["n_nationkey"])
        .join(F.broadcast(r), F.col("n_regionkey") == r["r_regionkey"])
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    w_region = Window.partitionBy("region_name")
    w_all = Window.partitionBy()
    return nat.select(
        "region_name",
        "nation_name",
        F.round("rev", 4).alias("revenue"),
        (F.round(F.col("rev") / F.sum("rev").over(w_region), 6) + 0.0).alias(
            "share_of_region"
        ),
        (F.round(F.col("rev") / F.sum("rev").over(w_all), 6) + 0.0).alias(
            "share_of_total"
        ),
    ).orderBy("region_name", "nation_name")


@_register(
    "cheapest_supplier_per_part",
    """
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    best AS (
        SELECT l_partkey, min(unit_cost) AS best_cost
        FROM cost GROUP BY l_partkey
    )
    SELECT c.l_partkey AS partkey, s.s_name,
           round(c.unit_cost, 4) AS unit_cost
    FROM cost c
    JOIN best b ON c.l_partkey = b.l_partkey AND c.unit_cost = b.best_cost
    JOIN supplier s ON c.l_suppkey = s.s_suppkey
    JOIN part p ON c.l_partkey = p.p_partkey
    WHERE p.p_size > 45
    ORDER BY unit_cost, partkey, s.s_name
    LIMIT 20
    """,
    "TPC-H Q2 shape — min-cost supplier per part via join-back on "
    "(key, min): unlike the struct-argmin (`minmax_by_priority`, which "
    "keeps ONE winner), the equality join back to the minimum keeps "
    "ALL tied suppliers — Q2's correlated `= (SELECT min ...)` "
    "semantics. The min-join-back equality is on a double both "
    "engines derived from identical per-row divisions, so it is "
    "exact; part dim broadcasts, both aggregates hash on partkey. "
    "Unique (cost, partkey, name) tie-broken top-20",
)
def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_size")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    best = cost.groupBy("l_partkey").agg(F.min("unit_cost").alias("best_cost"))
    return (
        cost.join(
            best.withColumnRenamed("l_partkey", "b_partkey"),
            (F.col("l_partkey") == F.col("b_partkey"))
            & (F.col("unit_cost") == F.col("best_cost")),
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == sup["s_suppkey"])
        .join(
            F.broadcast(part.filter(F.col("p_size") > 45)),
            F.col("l_partkey") == part["p_partkey"],
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            "s_name",
            F.round("unit_cost", 4).alias("unit_cost"),
        )
        .orderBy("unit_cost", "partkey", "s_name")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H decision-support shapes, second batch (SURVEY §2.3/§2.4: the
# reference has no joins; these complete the standard multi-join matrix
# so every canonical join/agg strategy has a named, oracle-checked query).
# ---------------------------------------------------------------------------


@_register(
    "late_shipment_priority_count",
    """
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate <  DATE '1997-01-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    "TPC-H Q4 shape — order-priority checking: EXISTS over lineitem "
    "becomes a LEFT SEMI join with a non-equi residual (shipped >60 "
    "days after order date), then a tiny per-priority count. The date "
    "band prunes the orders scan; the semi join never widens rows "
    "(each order emitted once no matter how many late lines) — the "
    "property that makes EXISTS safe at 100 TB where an inner join "
    "would double-count. (reference has no subqueries: SURVEY §2.3)",
)
def late_shipment_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    banded = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    late = banded.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@_register(
    "returned_item_top_customers",
    """
    SELECT c.c_custkey, c.c_name, n.n_name AS nation_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate <  DATE '1996-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    "TPC-H Q10 shape — returned-item reporting: lineitem filtered to "
    "returns joins orders (fact⋈fact shuffle on orderkey), then the "
    "customer and nation dimensions broadcast; per-customer revenue "
    "rollup, unique-tie-broken top-20 (TakeOrderedAndProject — no "
    "global sort). Return-flag + date predicates push to the scans "
    "so the shuffle carries only returned lines",
)
def returned_item_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        joined.groupBy("c_custkey", "c_name", F.col("n_name").alias("nation_name"))
        .agg(F.round(rev, 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@_register(
    "priority_class_line_counts",
    """
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= DATE '1997-01-01'
      AND l.l_shipdate <  DATE '1998-01-01'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
    "TPC-H Q12 shape — shipping-mode priority matrix as conditional "
    "aggregation: ONE pass over the fact⋈fact join computes both the "
    "high- and low-priority counts via sum(CASE ...) — no second scan, "
    "no pivot shuffle. The year band pushes to the lineitem scan. "
    "(count-if as partial-aggregable sum: SURVEY §2.4 A1 note)",
)
def priority_class_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    joined = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias(
                "low_line_count"
            ),
        )
        .orderBy("l_returnflag")
    )


@_register(
    "promo_revenue_ratio",
    """
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4) + 0.0
               AS promo_revenue_pct,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= DATE '1996-09-01'
      AND l.l_shipdate <  DATE '1996-10-01'
    """,
    "TPC-H Q14 shape — promotion-revenue share: broadcast part dim "
    "onto the month-banded lineitem scan, numerator and denominator "
    "as two partial-aggregable sums in one grand aggregate (no "
    "separate promo subquery, no second join). Month predicate is the "
    "partition-pruning hook at scale",
)
def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    ).join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    promo = F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0)))
    return joined.agg(
        (F.round(100.0 * promo / F.sum(disc), 4) + 0.0).alias("promo_revenue_pct"),
        F.count("*").alias("n_lines"),
    )


@_register(
    "large_volume_customers",
    """
    WITH big AS (
        SELECT l_orderkey, sum(l_quantity) AS total_qty
        FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS order_date,
           round(o.o_totalprice, 4) AS total_price,
           round(b.total_qty, 4) AS total_qty
    FROM big b
    JOIN orders o   ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY total_price DESC, o.o_orderkey
    LIMIT 20
    """,
    "TPC-H Q18 shape — large-volume customers: the HAVING-filtered "
    "per-order quantity rollup (map-side partial agg shrinks the "
    "shuffle to one row per order) joins back to orders ON the SAME "
    "key it was grouped on — with orderkey-bucketed tables this join "
    "needs no exchange at all — then the customer dim broadcasts. "
    "Unique-tie-broken top-20 via TakeOrderedAndProject",
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            F.round("o_totalprice", 4).alias("total_price"),
            F.round("total_qty", 4).alias("total_qty"),
        )
        .orderBy(F.col("total_price").desc(), "o_orderkey")
        .limit(20)
    )


@_register(
    "disjunctive_brand_revenue",
    """
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    "TPC-H Q19 shape — disjunctive (OR-of-ANDs) join predicate: the "
    "quantity disjuncts union to l_quantity BETWEEN 1 AND 30 and the "
    "brand disjuncts to an IN-list, so Catalyst derives pushable "
    "per-side filters from the OR (constraint propagation) while the "
    "full mixed predicate evaluates post-join; part side broadcasts. "
    "The classic case where naive engines fall back to cross-join "
    "filtering",
)
def disjunctive_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    joined = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return joined.filter(cond).agg(
        F.round(rev, 4).alias("revenue"), F.count("*").alias("n_lines")
    )


@_register(
    "supplier_value_concentration",
    """
    WITH sv AS (
        SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS supply_value
        FROM lineitem GROUP BY l_suppkey
    ),
    sh AS (
        SELECT l_suppkey, supply_value,
               100.0 * supply_value / sum(supply_value) OVER () AS pct,
               avg(supply_value) OVER () AS avg_value
        FROM sv
    )
    SELECT s.s_name, sh.l_suppkey AS s_suppkey,
           round(sh.supply_value, 4) AS supply_value,
           round(sh.pct, 4) AS pct_of_total
    FROM sh JOIN supplier s ON s.s_suppkey = sh.l_suppkey
    WHERE sh.supply_value > 1.05 * sh.avg_value
    ORDER BY supply_value DESC, s_suppkey
    """,
    "TPC-H Q11 shape — value concentration: per-supplier revenue "
    "rollup kept IF above a fraction-of-global-average threshold "
    "(1.05x mean — scale-free, unlike Q11's literal fraction which "
    "empties as supplier count grows). The global sum and avg are "
    "unpartitioned window aggs over the already-tiny rollup (one row "
    "per supplier) — NOT a second scan of lineitem and not a "
    "join-back; the same window feeds both the threshold and the "
    "reported share. Supplier dim broadcasts",
)
def supplier_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    sv = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "supply_value"
        )
    )
    w = Window.partitionBy()
    return (
        sv.withColumn("total_value", F.sum("supply_value").over(w))
        .withColumn("avg_value", F.avg("supply_value").over(w))
        .filter(F.col("supply_value") > 1.05 * F.col("avg_value"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_name",
            F.col("l_suppkey").alias("s_suppkey"),
            F.round("supply_value", 4).alias("supply_value"),
            F.round(100.0 * F.col("supply_value") / F.col("total_value"), 4).alias(
                "pct_of_total"
            ),
        )
        .orderBy(F.col("supply_value").desc(), "s_suppkey")
    )


@_register(
    "dormant_premium_customers",
    """
    WITH ab AS (
        SELECT avg(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment, count(*) AS n_custs,
           round(sum(c.c_acctbal), 4) AS total_bal
    FROM customer c, ab
    WHERE c.c_acctbal > ab.avg_bal
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderpriority = '1-URGENT'
      )
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    "TPC-H Q22 shape — dormant premium accounts: an uncorrelated "
    "scalar subquery (global positive-balance average, 1 row, "
    "broadcast) gates the customer scan, then NOT EXISTS over urgent "
    "orders becomes a LEFT ANTI join (the filter pushes into the "
    "orders scan BEFORE the anti join, so the join state holds only "
    "urgent orders), finishing in a tiny per-segment rollup. "
    "(every-customer-has-orders gotcha: the anti join must be on the "
    "filtered orders, not all orders)",
)
def dormant_premium_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_custs"),
            F.round(F.sum("c_acctbal"), 4).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Analytics extensions, third batch: multi-level aggregation matrix,
# time-series autocorrelation, mergeable-sketch union, BM25 retrieval.
# ---------------------------------------------------------------------------


@_register(
    "grouping_sets_matrix",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
           count(*) AS n_lines,
           round(sum(l_extendedprice), 4) AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    ORDER BY gid, l_returnflag, l_linestatus
    """,
    "explicit GROUPING SETS with grouping_id disambiguation — the "
    "general form behind `rollup_grouping_sets`/`cube_agg`: all three "
    "granularities (pair, flag subtotal, grand total) computed in ONE "
    "Expand+hash-agg pass over one scan, with gid telling a NULL key "
    "from a subtotal row. (SURVEY §2.4: reference lacks multi-level "
    "aggregation entirely)",
)
def grouping_sets_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count("*").alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


@_register(
    "autocorr_lag1_users",
    """
    WITH dd AS (
        SELECT user_id, CAST(ts AS DATE) AS d, sum(value) AS v
        FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    lg AS (
        SELECT user_id, v,
               lag(v) OVER (PARTITION BY user_id ORDER BY d) AS pv
        FROM dd
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(corr(v, pv), 4) + 0.0 AS autocorr_lag1
    FROM lg
    WHERE pv IS NOT NULL
    GROUP BY user_id
    HAVING count(*) >= 10
    ORDER BY user_id
    """,
    "per-entity lag-1 autocorrelation of the daily value series — the "
    "seasonality/momentum diagnostic: daily rollup, lag window, then "
    "corr as partial-aggregable moments per user. The rollup and the "
    "window partition on the SAME key (user_id), so one exchange "
    "serves both; corr never leaves the JVM. Pair floor keeps the "
    "estimate meaningful (and sidesteps n<2 NULL-vs-NaN engine "
    "disagreement)",
)
def autocorr_lag1_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    # repartition on user_id ALONE up front: HashPartitioning(user_id)
    # satisfies the (user_id, d) rollup's clustering requirement AND
    # the lag window's, so the whole chain runs on ONE exchange
    # (same single-exchange discipline as scd2_customer_tiers).
    ev = load_table(spark, sf_dir, "events").repartition("user_id")
    dd = ev.groupBy(
        "user_id", F.to_date("ts").alias("d")
    ).agg(F.sum("value").alias("v"))
    w = Window.partitionBy("user_id").orderBy("d")
    lg = dd.withColumn("pv", F.lag("v").over(w)).filter(F.col("pv").isNotNull())
    return (
        lg.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            (F.round(F.corr("v", "pv"), 4) + 0.0).alias("autocorr_lag1"),
        )
        .filter(F.col("n_pairs") >= 10)
        .orderBy("user_id")
    )


@_register(
    "hll_union_event_types",
    """
    SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
           TRUE AS union_ok
    FROM events
    """,
    "mergeable-sketch union: one HLL sketch per event_type (the "
    "per-partition / per-day rollup you'd store at 100 TB), then "
    "hll_union_agg merges the 5 sketches into the global "
    "distinct-user estimate WITHOUT re-scanning events — the "
    "re-aggregability property that lets pre-computed daily sketches "
    "answer any date-range distinct query. Sketch bytes are "
    "engine-specific, so the checked contract is the union estimate "
    "within 5% of the exact global distinct (same convention as "
    "`approx_distinct_users`/`heavy_hitters_cms`)",
)
def hll_union_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("n_type_exact"),
    )
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n_users_est"),
        F.sum("n_type_exact").alias("_ignore"),
    )
    exact = ev.agg(F.countDistinct("user_id").alias("n_users_exact"))
    return (
        exact.crossJoin(F.broadcast(merged))
        .select(
            F.col("n_users_exact").cast("bigint").alias("n_users_exact"),
            (
                F.abs(F.col("n_users_est") - F.col("n_users_exact"))
                <= 0.05 * F.col("n_users_exact")
            ).alias("union_ok"),
        )
    )


@_register(
    "bm25_doc_retrieval",
    r"""
    WITH base AS (
        SELECT doc_id,
               list_transform(regexp_split_to_array(trim(text), '\s+'),
                              t -> lower(t)) AS toks
        FROM documents
    ),
    stats AS (
        SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM base
    ),
    hits AS (
        SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM base
    ),
    tf AS (
        SELECT doc_id, dl, term, count(*) AS tf
        FROM hits WHERE term IN ('join', 'window', 'scan')
        GROUP BY doc_id, dl, term
    ),
    scored AS (
        SELECT tf.doc_id,
               sum(ln(1.0 + (stats.n_docs - dfc.df + 0.5) / (dfc.df + 0.5))
                   * tf.tf * 2.2
                   / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / stats.avgdl)))
                   AS score
        FROM tf
        JOIN (SELECT term, count(*) AS df FROM tf GROUP BY term) dfc
          ON tf.term = dfc.term, stats
        GROUP BY tf.doc_id
    )
    SELECT doc_id, round(score, 6) AS bm25_score,
           CAST(row_number() OVER (ORDER BY round(score, 6) DESC, doc_id)
                AS INT) AS rank
    FROM scored
    ORDER BY rank
    LIMIT 10
    """,
    "BM25 ranked retrieval (k1=1.2, b=0.75) for a fixed term query — "
    "the lexical side of a retrieval stack (pairs with "
    "`semantic_doc_retrieval`'s dense side). Doc length comes "
    "arithmetically from the token array (no pre-filter explode of "
    "the whole corpus reaches the shuffle: the IN-list on term cuts "
    "the exploded stream to query terms only); corpus stats (N, "
    "avgdl) ride in as ONE broadcast 1-row aggregate; df is a window "
    "over the tf rollup (single tokenize, same trick as "
    "`tfidf_top_terms`). Scores round before ranking for "
    "engine-stable order",
)
def bm25_doc_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    terms = ["join", "window", "scan"]
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    base = docs.select(
        "doc_id", F.transform(text.tokens("text"), F.lower).alias("toks")
    )
    stats = (
        load_table(spark, sf_dir, "documents")
        .select(F.transform(text.tokens("text"), F.lower).alias("toks"))
        .agg(
            F.count("*").alias("n_docs"),
            F.avg(F.size("toks")).alias("avgdl"),
        )
    )
    tf = (
        base.select(
            "doc_id",
            F.size("toks").alias("dl"),
            F.explode(F.filter("toks", lambda t: t.isin(terms))).alias("term"),
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    scored = (
        tf.withColumn("df", F.count("*").over(Window.partitionBy("term")))
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "contrib",
            F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
            * F.col("tf")
            * 2.2
            / (
                F.col("tf")
                + 1.2 * (1 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("bm25_score"))
    )
    w = Window.orderBy(F.col("bm25_score").desc(), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .orderBy("rank")
        .limit(10)
    )


@_register(
    "minhash_estimate_accuracy",
    f"""
    WITH s AS (
        SELECT doc_id, source, {_D_SHINGLES} AS sh FROM documents
    ),
    sig AS (
        SELECT doc_id, source,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS blk,
               list_distinct(sh) AS shd,
               {", ".join(_d_minhash(i) + f" AS mh{i}" for i in range(8))}
        FROM s
    ),
    pairs AS (
        SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               ({" + ".join(f"CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END" for i in range(8))}) / 8.0
                   AS est_jaccard,
               len(list_intersect(a.shd, b.shd)) * 1.0
                   / len(list_distinct(list_cat(a.shd, b.shd))) AS exact_jaccard
        FROM sig a JOIN sig b
          ON a.source = b.source AND a.blk = b.blk AND a.doc_id < b.doc_id
        WHERE len(list_distinct(list_cat(a.shd, b.shd))) > 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(abs(est_jaccard - exact_jaccard)), 4) + 0.0 AS avg_abs_err,
           round(max(abs(est_jaccard - exact_jaccard)), 4) + 0.0 AS max_abs_err,
           round(corr(est_jaccard, exact_jaccard), 4) + 0.0 AS est_exact_corr
    FROM pairs
    """,
    "sketch-accuracy audit for the MinHash pipeline: on (source, md5 "
    "sub-block)-blocked pairs, the 8-component signature-match fraction (the estimate LSH "
    "banding acts on) against the exact shingle Jaccard — one summary "
    "row of avg/max absolute error + estimate-truth correlation. "
    "md5-derived hashes make the estimate bit-identical in both "
    "engines, so this is full value parity, not a tolerance contract. "
    "The measurement that justifies num_hashes/bands settings before "
    "a 100 TB dedup run; signatures are materialized once and joined "
    "twice (same barrier discipline as jaccard_pairs)",
)
def minhash_estimate_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sigs = (
        dedup.minhash_signatures(docs, "doc_id")
        .join(docs.select("doc_id", "source"), "doc_id")
        .withColumn(
            "blk", F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
        )
        .localCheckpoint(eager=False)
    )
    pairs = (
        sigs.alias("a")
        .join(sigs.alias("b"), ["source", "blk"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            (
                sum(
                    F.when(F.col(f"a.mh{i}") == F.col(f"b.mh{i}"), 1).otherwise(0)
                    for i in range(8)
                )
                / 8.0
            ).alias("est_jaccard"),
        )
    )
    exact = dedup.jaccard_pairs(
        docs, "doc_id", candidates=pairs.select("doc_id_a", "doc_id_b")
    ).filter(F.col("jaccard").isNotNull())
    joined = pairs.join(exact, ["doc_id_a", "doc_id_b"])
    err = F.abs(F.col("est_jaccard") - F.col("jaccard"))
    return joined.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        (F.round(F.avg(err), 4) + 0.0).alias("avg_abs_err"),
        (F.round(F.max(err), 4) + 0.0).alias("max_abs_err"),
        (F.round(F.corr("est_jaccard", "jaccard"), 4) + 0.0).alias("est_exact_corr"),
    )


@_register(
    "multimodal_feature_extract",
    """
    WITH assets AS (
        SELECT doc_id,
               CASE CAST(substr(source, 4, 10) AS INT) % 3
                    WHEN 0 THEN 'image/png'
                    WHEN 1 THEN 'audio/wav'
                    ELSE 'video/mp4' END AS mime_type,
               octet_length(encode(text)) AS n_bytes
        FROM documents
    )
    SELECT mime_type,
           count(*) AS n_assets,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           TRUE AS features_ok
    FROM assets
    GROUP BY mime_type
    ORDER BY mime_type
    """,
    "the decode/featurize half of the multimodal path as a driver-"
    "checkable query: binary assets -> mapInPandas featurizer (Arrow "
    "batches, deterministic byte-histogram stub standing in for a "
    "codec+CNN; operators/multimodal.extract_features) -> per-mime "
    "rollup. The oracle pins what SQL can see (asset counts, byte "
    "totals through the UDF — proving no rows/bytes are lost in the "
    "Arrow round-trip); features_ok asserts the featurizer contract "
    "engine-side: every non-empty payload yields a dim-length "
    "histogram summing to ~1. At 100 TB this is THE pattern for "
    "media: metadata prunes first, blobs decode once, per-batch "
    "memory is bounded by the Arrow batch size",
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from covid19_etl_pipeline_spark.operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    src_num = F.substring("source", 4, 10).cast("int") % 3
    assets = spread(docs, "doc_id").select(
        F.col("doc_id").alias("asset_id"),
        F.when(src_num == 0, "image/png")
        .when(src_num == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("mime_type"),
        F.col("text").cast("binary").alias("payload"),
    )
    feats = multimodal.extract_features(assets)
    dim_ok = F.size("features") == multimodal.FEATURE_DIM
    mass = F.aggregate(
        "features", F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    sum_ok = (F.col("n_bytes") == 0) | (F.abs(mass - 1.0) <= 1e-3)
    return (
        feats.groupBy("mime_type")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
            F.min(dim_ok & sum_ok).alias("features_ok"),
        )
        .orderBy("mime_type")
    )


@_register(
    "multimodal_wav_rms",
    """
    WITH base AS (
        SELECT doc_id, 400 + (doc_id % 5) * 100 AS n
        FROM documents WHERE doc_id < 200
    ),
    segs AS (
        SELECT doc_id, n, unnest(range(0, n, 80)) AS s FROM base
    )
    SELECT doc_id AS asset_id,
           CAST(n AS INT) AS n_samples,
           CAST(s AS INT) AS seg_start,
           round(sqrt(list_aggregate(
               list_transform(range(s, least(s + 160, n)),
                              k -> CAST(((doc_id * 31 + k * 7) % 2003) - 1001
                                        AS DOUBLE)
                                   * CAST(((doc_id * 31 + k * 7) % 2003) - 1001
                                          AS DOUBLE)),
               'avg')), 4) + 0.0 AS rms
    FROM segs ORDER BY asset_id, seg_start
    """,
    "REAL audio decode in the multimodal codec slot: deterministic "
    "PCM-16 streams (s[k] = ((id*31+k*7) % 2003) - 1001) are packed "
    "into genuine RIFF/WAVE blobs with stdlib struct "
    "(multimodal.synth_wav_assets), then DECODED back by walking the "
    "chunk list (multimodal.decode_wav — magic check, fmt validation, "
    "word-aligned chunk skip) and featurized as true RMS energy over "
    "overlapping 160-sample windows at an 80-sample hop "
    "(multimodal.wav_rms_segments). Both halves are Arrow-batched "
    "mapInPandas — one batch in flight per task, the codec the only "
    "Python. The oracle recomputes every window's RMS from the CLOSED "
    "FORM without ever touching bytes, so a hash match proves the "
    "encode->decode round trip is byte-exact end to end (window sums "
    "of int squares are <2^53, hence order-independent and "
    "engine-identical). Image decode stays honestly stubbed (no codec "
    "in the environment); PCM needs none",
)
def multimodal_wav_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from covid19_etl_pipeline_spark.operators import multimodal

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    # cap fan-out at 8: each partition costs a Python worker (codec
    # runs in Arrow batches); 200 fixture assets over 32 workers is
    # pool-startup-dominated, over 8 it is work-dominated. At real
    # scale the asset count, not the worker pool, sets parallelism.
    base = spread(docs, "doc_id", partitions=8).select(
        F.col("doc_id").alias("asset_id"),
        (F.lit(400) + (F.col("doc_id") % 5) * 100).cast("int").alias("n_samples"),
    )
    assets = multimodal.synth_wav_assets(base, "asset_id", "n_samples")
    segs = multimodal.wav_rms_segments(assets, window=160, hop=80)
    return segs.select(
        "asset_id",
        "n_samples",
        "seg_start",
        (F.round("rms", 4) + F.lit(0.0)).alias("rms"),
    ).orderBy("asset_id", "seg_start")


@_register(
    "multimodal_png_stats",
    """
    WITH base AS (
        SELECT doc_id, 16 + (doc_id % 4) * 8 AS w, 12 + (doc_id % 3) * 6 AS h
        FROM documents WHERE doc_id < 150
    ),
    ys AS (SELECT doc_id, w, h, unnest(range(0, h)) AS y FROM base),
    xs AS (SELECT doc_id, w, h, y, unnest(range(0, w)) AS x FROM ys),
    px AS (
        SELECT doc_id, w, h, y, x, unnest(range(0, 3)) AS c FROM xs
    )
    SELECT doc_id AS asset_id,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(c AS INT) AS channel,
           CAST(sum((doc_id * 31 + y * 7 + x * 3 + c * 11) % 256) AS BIGINT)
               AS sum_value,
           round(sum((doc_id * 31 + y * 7 + x * 3 + c * 11) % 256) * 1.0
                 / (w * h), 4) + 0.0 AS mean_value,
           CAST(min((doc_id * 31 + y * 7 + x * 3 + c * 11) % 256) AS INT)
               AS min_value,
           CAST(max((doc_id * 31 + y * 7 + x * 3 + c * 11) % 256) AS INT)
               AS max_value
    FROM px
    GROUP BY doc_id, w, h, c
    ORDER BY asset_id, channel
    """,
    "REAL image decode in the multimodal codec slot: deterministic RGB "
    "grids (p[y,x,c] = (id*31+y*7+x*3+c*11) % 256) are encoded as "
    "genuine PNG blobs — stdlib zlib, scanline filters cycling through "
    "all five PNG filter types (multimodal.encode_png) — then DECODED "
    "back (chunk walk, IHDR validation, zlib inflate, "
    "None/Sub/Up/Average/Paeth unfilter; multimodal.decode_png) and "
    "reduced to per-channel pixel statistics. Both halves are "
    "Arrow-batched mapInPandas, the codec the only Python. The oracle "
    "recomputes every pixel from the CLOSED FORM without touching "
    "bytes, so a hash match proves the zlib round trip and all five "
    "unfilter paths reconstruct every pixel exactly (sum_value is an "
    "exact integer; the mean divides it by w*h). Closes VERDICT r2 "
    "missing-item #1: pixels, not byte proxies",
)
def multimodal_png_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from covid19_etl_pipeline_spark.operators import multimodal

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    base = spread(docs, "doc_id", partitions=8).select(
        F.col("doc_id").alias("asset_id"),
        (F.lit(16) + (F.col("doc_id") % 4) * 8).cast("int").alias("w"),
        (F.lit(12) + (F.col("doc_id") % 3) * 6).cast("int").alias("h"),
    )
    assets = multimodal.synth_png_assets(base, "asset_id", "w", "h")
    stats = multimodal.png_channel_stats(assets)
    return stats.select(
        "asset_id",
        "width",
        "height",
        "channel",
        "sum_value",
        (F.round("mean_value", 4) + F.lit(0.0)).alias("mean_value"),
        "min_value",
        "max_value",
    ).orderBy("asset_id", "channel")


@_register(
    "multimodal_png_resize",
    """
    WITH base AS (
        SELECT doc_id,
               12 + (doc_id % 5) * 7 AS w,
               10 + (doc_id % 4) * 5 AS h
        FROM documents WHERE doc_id < 120
    ),
    dims AS (
        SELECT doc_id, w, h,
               greatest(CAST(w * 16 // greatest(w, h) AS BIGINT), 1) AS ow,
               greatest(CAST(h * 16 // greatest(w, h) AS BIGINT), 1) AS oh
        FROM base
    ),
    ys AS (SELECT doc_id, w, h, ow, oh, unnest(range(0, oh)) AS yo FROM dims),
    xs AS (SELECT doc_id, w, h, ow, oh, yo, unnest(range(0, ow)) AS xo FROM ys),
    px AS (
        SELECT doc_id, ow, oh, c,
               (doc_id * 31 + ((yo * h) // oh) * 7
                + ((xo * w) // ow) * 3 + c * 11) % 256 AS v
        FROM (SELECT doc_id, w, h, ow, oh, yo, xo, unnest(range(0, 3)) AS c
              FROM xs)
    )
    SELECT doc_id AS asset_id,
           CAST(ow AS INT) AS out_width,
           CAST(oh AS INT) AS out_height,
           CAST(c AS INT) AS channel,
           CAST(sum(v) AS BIGINT) AS sum_value,
           CAST(min(v) AS INT) AS min_value,
           CAST(max(v) AS INT) AS max_value
    FROM px
    GROUP BY doc_id, ow, oh, c
    ORDER BY asset_id, channel
    """,
    "the full image-curation chain on REAL pixels: synth closed-form "
    "RGB -> PNG encode -> decode -> nearest-neighbor resize into a "
    "16px box (aspect-preserving, src = out*src_dim//out_dim in pure "
    "integer math) -> PNG re-encode -> SECOND decode -> per-channel "
    "stats of the resized image (multimodal.png_resize_nn + "
    "png_channel_stats). Two independent encode->decode round trips "
    "chained through a geometric transform; the oracle mirrors the "
    "integer NN sampling over the closed-form grid, so a hash match "
    "pins the resize semantics AND both codec passes. The live "
    "counterpart of the resize_images stub, for the one format the "
    "container can decode without external codecs",
)
def multimodal_png_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from covid19_etl_pipeline_spark.operators import multimodal

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    base = spread(docs, "doc_id", partitions=8).select(
        F.col("doc_id").alias("asset_id"),
        (F.lit(12) + (F.col("doc_id") % 5) * 7).cast("int").alias("w"),
        (F.lit(10) + (F.col("doc_id") % 4) * 5).cast("int").alias("h"),
    )
    assets = multimodal.synth_png_assets(base, "asset_id", "w", "h")
    resized = multimodal.png_resize_nn(assets, box=16)
    stats = multimodal.png_channel_stats(resized)
    return stats.select(
        "asset_id",
        F.col("width").alias("out_width"),
        F.col("height").alias("out_height"),
        "channel",
        "sum_value",
        "min_value",
        "max_value",
    ).orderBy("asset_id", "channel")


@_register(
    "multimodal_bmp_stats",
    """
    WITH base AS (
        SELECT doc_id, 15 + (doc_id % 4) * 7 AS w, 9 + (doc_id % 3) * 5 AS h
        FROM documents WHERE doc_id < 150
    ),
    ys AS (SELECT doc_id, w, h, unnest(range(0, h)) AS y FROM base),
    xs AS (SELECT doc_id, w, h, y, unnest(range(0, w)) AS x FROM ys),
    px AS (
        SELECT doc_id, w, h, y, x, unnest(range(0, 3)) AS c FROM xs
    )
    SELECT doc_id AS asset_id,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(c AS INT) AS channel,
           CAST(sum((doc_id * 31 + y * 7 + x * 3 + c * 11) % 256) AS BIGINT)
               AS sum_value,
           round(sum((doc_id * 31 + y * 7 + x * 3 + c * 11) % 256) * 1.0
                 / (w * h), 4) + 0.0 AS mean_value,
           CAST(min((doc_id * 31 + y * 7 + x * 3 + c * 11) % 256) AS INT)
               AS min_value,
           CAST(max((doc_id * 31 + y * 7 + x * 3 + c * 11) % 256) AS INT)
               AS max_value
    FROM px
    GROUP BY doc_id, w, h, c
    ORDER BY asset_id, channel
    """,
    "second REAL raster codec in the multimodal slot (VERDICT r3 next-"
    "round #4): the closed-form RGB grids are encoded as genuine "
    "uncompressed 24-bit BI_RGB Windows bitmaps — bottom-up rows, BGR "
    "byte order, 4-byte row padding, pure stdlib struct "
    "(multimodal.encode_bmp) — then DECODED back "
    "(multimodal.decode_bmp: file/info header walk, declared pixel "
    "offset, row inversion, channel swap, pad strip) and reduced to "
    "per-channel pixel statistics through the SAME featurizer as the "
    "PNG path (multimodal.image_channel_stats). Widths are chosen so "
    "3*w is never a multiple of 4 for three of the four size classes — "
    "the pad-handling path is exercised, not dodged. The oracle "
    "recomputes every pixel from the closed form; a hash match proves "
    "the BMP layout round trip is byte-exact. With PNG + BMP + WAV "
    "real, only formats needing external codec libs remain stubbed",
)
def multimodal_bmp_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from covid19_etl_pipeline_spark.operators import multimodal

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    base = spread(docs, "doc_id", partitions=8).select(
        F.col("doc_id").alias("asset_id"),
        (F.lit(15) + (F.col("doc_id") % 4) * 7).cast("int").alias("w"),
        (F.lit(9) + (F.col("doc_id") % 3) * 5).cast("int").alias("h"),
    )
    assets = multimodal.synth_bmp_assets(base, "asset_id", "w", "h")
    stats = multimodal.bmp_channel_stats(assets)
    return stats.select(
        "asset_id",
        "width",
        "height",
        "channel",
        "sum_value",
        (F.round("mean_value", 4) + F.lit(0.0)).alias("mean_value"),
        "min_value",
        "max_value",
    ).orderBy("asset_id", "channel")


@_register(
    "pack_training_sequences",
    r"""
    WITH d AS (
        SELECT doc_id,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::INT
                    % 8 AS INT) AS pack_group,
               md5(CAST(doc_id AS VARCHAR)) AS ord_key
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tokens, pack_group,
               CAST(coalesce(sum(n_tokens) OVER (
                   PARTITION BY pack_group ORDER BY ord_key
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS toks_before
        FROM d
    ),
    b AS (
        SELECT pack_group,
               CAST(toks_before // 512 AS INT) AS bin_id,
               doc_id, n_tokens
        FROM c
    )
    SELECT pack_group, bin_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM b
    GROUP BY pack_group, bin_id
    ORDER BY pack_group, bin_id
    """,
    "token-budget sequence packing (the batch-construction step of an "
    "LLM training pipeline): documents are hashed into independent "
    "pack groups, deterministically ordered by content-free md5 "
    "within each, and assigned to 512-token bins by the RUNNING token "
    "count before each doc (a doc straddling a boundary starts a new "
    "bin's overflow — the streaming-friendly first-fit-in-order "
    "discipline). Greedy global packing is inherently sequential; "
    "hash-grouping makes it embarrassingly parallel with bounded "
    "per-group state — the 100 TB answer (one window per group, no "
    "global order). Reproducible across engines AND repartitioning",
)
def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ord_key = F.md5(F.col("doc_id").cast("string"))
    d = docs.select(
        "doc_id",
        F.size(text.tokens("text")).alias("n_tokens"),
        F.conv(F.substring(ord_key, 1, 2), 16, 10).cast("int").__mod__(8)
        .cast("int").alias("pack_group"),
        ord_key.alias("ord_key"),
    )
    w = (
        Window.partitionBy("pack_group")
        .orderBy("ord_key")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = d.withColumn(
        "toks_before",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint"),
    )
    return (
        c.withColumn(
            "bin_id", F.floor(F.col("toks_before") / F.lit(512)).cast("int")
        )
        .groupBy("pack_group", "bin_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
        .orderBy("pack_group", "bin_id")
    )


@_register(
    "quantize_embeddings_int8",
    """
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x
        FROM embeddings WHERE vec_id < 200
    ),
    s AS (
        SELECT vec_id, x,
               list_max(list_transform(x, e -> abs(e))) AS scale
        FROM v
    ),
    q AS (
        SELECT vec_id, scale,
               list_transform(x, e -> CAST(floor(e * 127.0 / scale + 0.5)
                                           AS BIGINT)) AS qv,
               x
        FROM s WHERE scale > 0
    )
    SELECT vec_id,
           round(scale, 6) AS scale,
           CAST(list_sum(qv) AS BIGINT) AS q_checksum,
           round(list_max(list_transform(range(1, len(x) + 1),
                 i -> abs(x[i] - qv[i] * scale / 127.0))), 6) + 0.0
               AS max_abs_err
    FROM q
    ORDER BY vec_id
    """,
    "int8 symmetric per-vector quantization of the embedding column — "
    "the 4x storage/bandwidth compression step before an ANN index "
    "ships to serving. Per-vector absmax scale, floor(x*127/scale+0.5) "
    "code assignment (floor-form, NOT round(): both engines agree on "
    "floor while round() half-case conventions differ), and the "
    "reconstruction-error audit max|x - q*scale/127| <= scale/254. "
    "Pure higher-order array functions — JVM-side, narrow, zero "
    "shuffle before the final sort; at 100 TB this runs as a "
    "map-only rewrite of the vector store",
)
def quantize_embeddings_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    v = spread(emb, "vec_id").select(
        "vec_id",
        F.transform("embedding", lambda e: e.cast("double")).alias("x"),
    )
    s = v.withColumn(
        "scale", F.array_max(F.transform("x", lambda e: F.abs(e)))
    ).filter(F.col("scale") > 0)
    q = s.withColumn(
        "qv",
        F.transform(
            "x", lambda e: F.floor(e * 127.0 / F.col("scale") + 0.5).cast("bigint")
        ),
    )
    err = F.array_max(
        F.zip_with(
            "x", "qv", lambda e, c: F.abs(e - c * F.col("scale") / 127.0)
        )
    )
    # two selects, NOT one: aliasing round(scale) AS "scale" in the same
    # select as `err` would shadow the input column via lateral column
    # alias resolution — err would silently use the ROUNDED scale.
    raw = q.select(
        "vec_id",
        "scale",
        F.aggregate("qv", F.lit(0).cast("bigint"), lambda a, b: a + b).alias(
            "q_checksum"
        ),
        err.alias("raw_err"),
    )
    return raw.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        "q_checksum",
        (F.round("raw_err", 6) + 0.0).alias("max_abs_err"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# Corpus-curation batch: decontamination, entropy quality, collocations,
# vocabulary growth
# ---------------------------------------------------------------------------


@_register(
    "decontaminate_eval_overlap",
    f"""
    WITH s AS (
        SELECT doc_id,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0' AS is_eval,
               list_distinct({_D_SHINGLES}) AS sh
        FROM documents
    ),
    tr AS (
        SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS g
        FROM s WHERE NOT is_eval AND len(sh) > 0
    ),
    ev AS (SELECT doc_id AS eval_id, unnest(sh) AS g FROM s WHERE is_eval)
    SELECT tr.doc_id,
           count(DISTINCT tr.g) AS shared_shingles,
           count(DISTINCT ev.eval_id) AS matched_eval_docs,
           round(count(DISTINCT tr.g) * 1.0 / min(tr.n_sh), 4) + 0.0
               AS contamination
    FROM tr JOIN ev ON tr.g = ev.g
    GROUP BY tr.doc_id
    ORDER BY shared_shingles DESC, doc_id
    """,
    "benchmark decontamination: flag training documents sharing 3-token "
    "shingles with a held-out eval set (here a deterministic md5 1/16 "
    "slice stands in for the benchmark suite). Eval shingles are "
    "BROADCAST — eval sets stay small while the training corpus scales "
    "to 100 TB, so the overlap probe is a map-side hash join against "
    "the full shingle stream, no shuffle of the corpus. Output = per "
    "contaminated doc: distinct shared shingles, distinct eval docs "
    "hit, and the contaminated fraction of its shingle set "
    "(extension: the n-gram-overlap decontamination step every "
    "training pipeline runs before a data release)",
)
def decontaminate_eval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    base = docs.select(
        "doc_id",
        (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0").alias(
            "is_eval"
        ),
        F.array_distinct(text.shingles(text.tokens("text"))).alias("sh"),
    ).localCheckpoint(eager=False)  # shingle sets feed BOTH the eval and train branches
    ev = base.filter("is_eval").select(
        F.col("doc_id").alias("eval_id"), F.explode("sh").alias("g")
    )
    tr = (
        base.filter(~F.col("is_eval"))
        .filter(F.size("sh") > 0)
        .select("doc_id", F.size("sh").alias("n_sh"), F.explode("sh").alias("g"))
    )
    return (
        tr.join(F.broadcast(ev), "g")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("g").alias("shared_shingles"),
            F.countDistinct("eval_id").alias("matched_eval_docs"),
            (
                F.round(F.countDistinct("g") / F.min("n_sh"), 4) + 0.0
            ).alias("contamination"),
        )
        .orderBy(F.col("shared_shingles").desc(), "doc_id")
    )


@_register(
    "token_entropy_quality",
    r"""
    WITH t AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents
    ),
    c AS (
        SELECT doc_id, tok, count(*) AS n
        FROM t WHERE tok <> '' GROUP BY doc_id, tok
    )
    SELECT doc_id,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           count(*) AS distinct_tokens,
           round(ln(sum(n)) - sum(n * ln(n)) / sum(n), 4) + 0.0
               AS token_entropy
    FROM c GROUP BY doc_id ORDER BY doc_id
    """,
    "per-document Shannon entropy of the token distribution — the "
    "lexical-diversity quality signal (near-zero entropy = a document "
    "that repeats one token; complements repetition_quality's "
    "duplicate-trigram fraction). H = ln N - sum(n ln n)/N from the "
    "per-(doc, token) counts: two partial-aggregable hash aggs on the "
    "same doc_id key (one Exchange), no window, no UDF",
)
def token_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    c = (
        docs.select("doc_id", F.explode(text.tokens("text")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("n"))
    )
    return (
        c.groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_tokens"),
            F.count("*").alias("distinct_tokens"),
            (
                F.round(
                    F.log(F.sum("n"))
                    - F.sum(F.col("n") * F.log("n")) / F.sum("n"),
                    4,
                )
                + 0.0
            ).alias("token_entropy"),
        )
        .orderBy("doc_id")
    )


@_register(
    "bigram_pmi_collocations",
    r"""
    WITH t AS (
        SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents
    ),
    u AS (SELECT tok, count(*) AS c FROM t WHERE tok <> '' GROUP BY tok),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM u),
    toks AS (
        SELECT regexp_split_to_array(trim(text), '\s+') AS tk FROM documents
    ),
    bg AS (
        SELECT unnest(CASE WHEN len(tk) >= 2
                      THEN list_transform(range(1, len(tk)),
                                          i -> tk[i] || ' ' || tk[i+1])
                      ELSE [] END) AS bigram
        FROM toks
    ),
    bc AS (
        SELECT bigram, count(*) AS cab
        FROM bg GROUP BY bigram HAVING count(*) >= 3
    )
    SELECT bc.bigram,
           bc.cab AS pair_count,
           round(ln(bc.cab * 1.0 * (SELECT total FROM n)
                    / (ua.c * 1.0 * ub.c)), 4) + 0.0 AS pmi
    FROM bc
    JOIN u ua ON split_part(bc.bigram, ' ', 1) = ua.tok
    JOIN u ub ON split_part(bc.bigram, ' ', 2) = ub.tok
    ORDER BY pmi DESC, bigram LIMIT 25
    """,
    "top bigram collocations by pointwise mutual information: "
    "PMI = ln(c_ab * N / (c_a * c_b)) over corpus-wide unigram/bigram "
    "counts with a frequency floor (c_ab >= 3). The unigram vocabulary "
    "is materialized once and BROADCAST to both join roles (a "
    "vocabulary is millions of rows while the corpus is billions — the "
    "classic small-side of a 100 TB text job); the scalar token total "
    "rides a broadcast 1-row cross join. Round-before-rank keeps the "
    "top-25 engine-stable (extension: phrase mining / tokenizer-merge "
    "candidate discovery)",
)
def bigram_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    u = (
        docs.select(F.explode(text.tokens("text")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)  # feeds the total AND both unigram join roles
    )
    total = u.agg(F.sum("c").alias("total"))
    bc = (
        docs.select(
            F.explode(text.shingles(text.tokens("text"), k=2)).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count("*").alias("cab"))
        .filter(F.col("cab") >= 3)
    )
    w = F.split(F.col("bigram"), " ")
    ua = u.select(F.col("tok").alias("tok_a"), F.col("c").alias("ca"))
    ub = u.select(F.col("tok").alias("tok_b"), F.col("c").alias("cb"))
    return (
        bc.join(F.broadcast(ua), w.getItem(0) == F.col("tok_a"))
        .join(F.broadcast(ub), w.getItem(1) == F.col("tok_b"))
        .crossJoin(F.broadcast(total))
        .select(
            "bigram",
            F.col("cab").alias("pair_count"),
            (
                F.round(
                    F.log(F.col("cab") * 1.0 * F.col("total") / (F.col("ca") * 1.0 * F.col("cb"))),
                    4,
                )
                + 0.0
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "bigram")
        .limit(25)
    )


@_register(
    "vocab_growth_by_source",
    r"""
    WITH f AS (
        SELECT source, doc_id,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents
    )
    SELECT source,
           count(DISTINCT doc_id) AS n_docs,
           count(*) AS total_tokens,
           count(DISTINCT tok) AS distinct_tokens,
           round(count(DISTINCT tok) * 1.0 / count(*), 4) + 0.0
               AS type_token_ratio
    FROM f WHERE tok <> ''
    GROUP BY source ORDER BY source
    """,
    "per-source vocabulary growth profile: document count, token "
    "volume, distinct vocabulary, and type-token ratio — the "
    "source-level diversity diagnostic that feeds mixture weighting "
    "(source_mixture_weights) and flags template-heavy sources (low "
    "TTR). Multiple COUNT(DISTINCT) in one pass rides Spark's Expand "
    "rewrite — still a single scan of the exploded token stream",
)
def vocab_growth_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    return (
        docs.select("source", "doc_id", F.explode(text.tokens("text")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("total_tokens"),
            F.countDistinct("tok").alias("distinct_tokens"),
            (
                F.round(F.countDistinct("tok") / F.count("*"), 4) + 0.0
            ).alias("type_token_ratio"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# TPC-H batch 3: Q6, Q8, Q15, Q16, Q20 shapes
# ---------------------------------------------------------------------------


@_register(
    "discount_revenue_forecast",
    """
    SELECT round(sum(l_extendedprice * l_discount), 4)
               AS forecast_revenue_delta,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24
    """,
    "TPC-H Q6 shape — what-if revenue from dropping small discounts: "
    "a pure scan-and-aggregate with every predicate (date band, "
    "discount band, quantity cap) pushed to the parquet scan and a "
    "2-column ReadSchema beyond the filter columns — the query whose "
    "entire cost at 100 TB is I/O after partition pruning on the "
    "ship-date band. No join, no shuffle beyond the 1-row final agg "
    "(reference parity: the what-if aggregate in "
    "data_transformer.py's summary stats, src/transform/"
    "data_transformer.py:219-256, generalized to a banded filter)",
)
def discount_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "forecast_revenue_delta"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@_register(
    "national_market_share",
    """
    SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
           round(sum(CASE WHEN sn.n_name = 'NATION_3'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4) + 0.0
               AS mkt_share,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
               AS region_revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN region r   ON cn.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    JOIN part p     ON l.l_partkey  = p.p_partkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
      AND o.o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1998-12-31'
    GROUP BY o_year ORDER BY o_year
    """,
    "TPC-H Q8 shape — national market share: one supplier nation's "
    "slice of a region's ECONOMY-part revenue per year. The widest "
    "join tree in the registry (lineitem + orders + customer + part + "
    "supplier + nation x2 roles + region): the two facts meet in one "
    "shuffle join while part/supplier/nation/region broadcast, and the "
    "share is a conditional-sum-over-sum in the same grand aggregate — "
    "no per-nation subquery. The part + region filters are the "
    "selectivity levers Catalyst pushes below the joins",
)
def national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    od = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") <= F.lit("1998-12-31").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cn = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    reg = (
        load_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("sn_name")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat_rev = F.sum(F.when(F.col("sn_name") == "NATION_3", rev).otherwise(F.lit(0.0)))
    return (
        li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(reg), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.round(nat_rev / F.sum(rev), 4) + 0.0).alias("mkt_share"),
            F.round(F.sum(rev), 4).alias("region_revenue"),
        )
        .orderBy("o_year")
    )


@_register(
    "top_revenue_supplier",
    """
    WITH rev AS (
        SELECT l_suppkey,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    ORDER BY s.s_suppkey
    """,
    "TPC-H Q15 shape — top supplier by quarterly revenue: the CREATE "
    "VIEW + scalar-max of the original becomes a window max OVER the "
    "per-supplier rollup (one pass, ties kept), so the revenue rollup "
    "is computed ONCE instead of once for the view and once for the "
    "subquery. The global window is safe because its input is already "
    "one row per supplier — the same deliberate tiny-rollup exception "
    "as supplier_value_concentration. Revenue is rounded BEFORE the "
    "max comparison so the tie set is engine-stable",
)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "total_rev"
            )
        )
    )
    top = rev.withColumn(
        "__max_rev", F.max("total_rev").over(Window.partitionBy())
    ).filter(F.col("total_rev") == F.col("__max_rev"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        top.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


@_register(
    "supplier_part_variety",
    """
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM ps JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND ps.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    "TPC-H Q16 shape — supplier variety per part segment: the "
    "part-supplier relationship is DERIVED as distinct (partkey, "
    "suppkey) pairs from lineitem (this catalog has no partsupp "
    "table), the NOT-IN complaint-supplier exclusion runs as a "
    "broadcast anti join BEFORE the expensive distinct-count, and the "
    "brand/size filters broadcast with the part dim. The distinct on "
    "the fact pairs is the one big shuffle; count(DISTINCT) then "
    "reuses its clustering",
)
def supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    excl = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        ps.join(F.broadcast(excl), ps["l_suppkey"] == excl["s_suppkey"], "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@_register(
    "promo_heavy_suppliers",
    """
    WITH shipped AS (
        SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        GROUP BY l_suppkey, l_partkey
    ),
    heavy AS (
        SELECT DISTINCT sh.l_suppkey
        FROM shipped sh JOIN part p ON p.p_partkey = sh.l_partkey
        WHERE p.p_type = 'PROMO' AND sh.qty > 60
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
      AND s.s_suppkey IN (SELECT l_suppkey FROM heavy)
    ORDER BY s.s_suppkey
    """,
    "TPC-H Q20 shape — suppliers shipping promo parts in volume: the "
    "correlated availqty subquery of the original becomes a per-(supp, "
    "part) year-banded quantity rollup (partsupp is derived from "
    "lineitem in this catalog), gated by the broadcast promo-part "
    "filter, collapsed to a distinct supplier set, and applied to the "
    "EUROPE supplier dim as a broadcast LEFT SEMI join — the nested "
    "IN-subqueries never materialize a row wider than a key",
)
def promo_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    promo = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    heavy = (
        shipped.join(F.broadcast(promo), F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("qty") > 60)
        .select("l_suppkey")
        .distinct()
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    reg = (
        load_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == "EUROPE")
        .select("r_regionkey")
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        sup.join(
            F.broadcast(heavy), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Sequence-modeling prep: temporal split, next-event transition pairs
# ---------------------------------------------------------------------------


@_register(
    "temporal_split_events",
    """
    WITH ranked AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts) DESC, event_id DESC)
                   AS rn
        FROM events
    ),
    labeled AS (
        SELECT event_type,
               CASE WHEN rn <= 2 THEN 'test' ELSE 'train' END AS split
        FROM ranked
    )
    SELECT split, event_type, count(*) AS n_events
    FROM labeled GROUP BY split, event_type ORDER BY split, event_type
    """,
    "temporal (leave-last-out) train/test split: each user's 2 most "
    "recent events become the held-out set — the time-respecting split "
    "sequence models need (a random split would leak future events "
    "into training). One row_number window per user on the epoch-us "
    "timeline (micros on BOTH engines, event_id tie-break), then a "
    "split x event_type audit rollup that shares the user_id "
    "exchange's output. At 100 TB the window is per-user state — "
    "scales with executors like every raw-grain window here",
)
def temporal_split_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t_us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("t_us").desc(), F.col("event_id").desc()
    )
    ranked = ev.select(
        "user_id", "event_type", "event_id", t_us.alias("t_us")
    ).withColumn("rn", F.row_number().over(w))
    labeled = ranked.select(
        "event_type",
        F.when(F.col("rn") <= 2, F.lit("test")).otherwise(F.lit("train")).alias(
            "split"
        ),
    )
    return (
        labeled.groupBy("split", "event_type")
        .agg(F.count("*").alias("n_events"))
        .orderBy("split", "event_type")
    )


@_register(
    "next_event_training_pairs",
    """
    WITH seq AS (
        SELECT user_id, event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id)
                   AS to_type
        FROM events
    ),
    pairs AS (SELECT from_type, to_type FROM seq WHERE to_type IS NOT NULL),
    c AS (
        SELECT from_type, to_type, count(*) AS n FROM pairs
        GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           round(n * 1.0 / sum(n) OVER (PARTITION BY from_type), 4) + 0.0
               AS transition_p
    FROM c ORDER BY from_type, to_type
    """,
    "next-event prediction pairs: each user's event stream becomes "
    "(current, next) training pairs via a lead window, rolled into the "
    "event-type transition matrix with per-source-state probabilities "
    "— the label-generation step for next-action models AND a Markov "
    "baseline in one query. The transition-probability window runs "
    "over the tiny type x type rollup, not the event stream; the only "
    "full-data shuffle is the per-user lead window",
)
def next_event_training_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t_us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    seq = ev.select(
        "user_id", F.col("event_type").alias("from_type"), t_us.alias("t_us"), "event_id"
    ).withColumn("to_type", F.lead("from_type").over(w))
    c = (
        seq.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )
    wp = Window.partitionBy("from_type")
    return c.select(
        "from_type",
        "to_type",
        "n",
        (F.round(F.col("n") / F.sum("n").over(wp), 4) + 0.0).alias("transition_p"),
    ).orderBy("from_type", "to_type")


@_register(
    "dup_cluster_size_distribution",
    """
    WITH RECURSIVE c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    pairs AS (
        SELECT a.vec_id AS pa, b.vec_id AS pb
        FROM c a JOIN c b ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v))) >= 0.35
    ),
    edges AS (SELECT pa AS s, pb AS d FROM pairs
              UNION ALL SELECT pb, pa FROM pairs),
    nodes AS (SELECT DISTINCT s AS node FROM edges),
    reach(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.d, r.label FROM reach r JOIN edges e ON r.node = e.s
    ),
    labels AS (SELECT node, min(label) AS cluster_id FROM reach GROUP BY node),
    sizes AS (
        SELECT cluster_id, count(*) AS cluster_size
        FROM labels GROUP BY cluster_id
    )
    SELECT cluster_size,
           count(*) AS n_clusters,
           cluster_size * count(*) AS n_members,
           (cluster_size - 1) * count(*) AS n_removable
    FROM sizes GROUP BY cluster_size ORDER BY cluster_size
    """,
    "dedup audit: the cluster-size histogram of the near-dup graph — "
    "how much of the corpus is duplicated, at what multiplicity, and "
    "how many rows survivor-selection will drop (n_removable). The "
    "capacity-planning number a 100 TB dedup run reports before anyone "
    "commits to the rewrite. Spark side reuses the distributed "
    "connected-components labels; after the per-cluster count the "
    "histogram aggregates rows = #clusters, then #distinct-sizes — "
    "cost collapses with each step",
)
def dup_cluster_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = embedding_neardup_pairs(spark, sf_dir).select("vec_id_a", "vec_id_b")
    labels = dedup.connected_components(pairs, "vec_id_a", "vec_id_b")
    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_members"),
            ((F.col("cluster_size") - 1) * F.col("n_clusters")).alias("n_removable"),
        )
        .orderBy("cluster_size")
    )


@_register(
    "rolling_median_value",
    """
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               round(sum(value), 4) AS day_value
        FROM events GROUP BY user_id, CAST(ts AS DATE)
    )
    SELECT user_id, d,
           round(median(day_value) OVER (
               PARTITION BY user_id ORDER BY d
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) + 0.0
               AS rolling_median_7
    FROM daily ORDER BY user_id, d
    """,
    "7-row rolling median of per-user daily value — the robust "
    "(outlier-immune) twin of the 7-day moving average W1. Spark has "
    "no median window aggregate; the engine composes one JVM-side: "
    "sort_array(collect_list(v) over the frame) + element_at middle "
    "picks — whole-stage-codegen eligible, no UDF, and the frame is "
    "bounded (7 elements) so the per-row array never grows with data "
    "size. Shares the user_id exchange between the daily rollup and "
    "the window (subset rule). Day values round to 4dp BEFORE the "
    "median so both engines pick middles from identical inputs",
)
def rolling_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("user_id", F.col("ts").cast("date").alias("d"))
        .agg(F.round(F.sum("value"), 4).alias("day_value"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(-6, Window.currentRow)
    )
    arr = F.sort_array(F.collect_list("day_value").over(w))
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    med = (lo + hi) / 2.0
    return daily.select(
        "user_id",
        "d",
        (F.round(med, 4) + 0.0).alias("rolling_median_7"),
    ).orderBy("user_id", "d")


@_register(
    "ivf_multiprobe_recall",
    """
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (SELECT vec_id AS cid, v AS cv FROM c WHERE vec_id < 8),
    sims AS (
        SELECT c.vec_id, cent.cid,
               list_dot_product(c.v, cent.cv)
                 / (sqrt(list_dot_product(c.v, c.v))
                    * sqrt(list_dot_product(cent.cv, cent.cv))) AS csim
        FROM c, cent
    ),
    ranked AS (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY csim DESC, cid) AS rn
        FROM sims
    ),
    members AS (
        SELECT r.vec_id, r.cid, c.v FROM ranked r JOIN c USING (vec_id)
        WHERE r.rn = 1
    ),
    probes AS (SELECT vec_id AS query_id, cid AS pcid FROM ranked
               WHERE rn <= 2 AND vec_id < 5),
    qv AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < 5),
    ivf AS (
        SELECT query_id, vec_id FROM (
            SELECT p.query_id, m.vec_id,
                   row_number() OVER (
                       PARTITION BY p.query_id
                       ORDER BY list_dot_product(q.qv, m.v)
                             / (sqrt(list_dot_product(q.qv, q.qv))
                                * sqrt(list_dot_product(m.v, m.v))) DESC,
                             m.vec_id) AS rank
            FROM probes p
            JOIN qv q ON q.query_id = p.query_id
            JOIN members m ON m.cid = p.pcid AND m.vec_id <> p.query_id
        ) WHERE rank <= 10
    ),
    exact AS (
        SELECT query_id, vec_id FROM (
            SELECT q.query_id, c.vec_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY list_dot_product(q.qv, c.v)
                             / (sqrt(list_dot_product(q.qv, q.qv))
                                * sqrt(list_dot_product(c.v, c.v))) DESC,
                             c.vec_id) AS rank
            FROM qv q JOIN c ON c.vec_id <> q.query_id
        ) WHERE rank <= 10
    )
    SELECT e.query_id,
           count(i.vec_id) AS ivf_hits,
           round(count(i.vec_id) / 10.0, 4) + 0.0 AS recall_at_10
    FROM exact e
    LEFT JOIN ivf i ON e.query_id = i.query_id AND e.vec_id = i.vec_id
    GROUP BY e.query_id ORDER BY e.query_id
    """,
    "ANN quality audit: IVF recall@10 at probe=2 against the exact "
    "brute-force top-10 — the measurement that sizes the probe count "
    "(the recall/cost knob every IVF deployment tunes; probe=1 is "
    "sim_ivf_topk's shape, full-probe is brute force). Queries search "
    "their TWO nearest cells: probing rides the same centroid-rank "
    "window as assignment (rn=1 assigns members, rn<=2 probes), so "
    "multi-probe costs one extra window filter, not a second "
    "assignment pass. The exact baseline is the small-n oracle only — "
    "at 100 TB recall is estimated on a query sample exactly like "
    "this one",
)
def ivf_multiprobe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    c = emb.select("vec_id", F.col("embedding").alias("v"))
    cent = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), F.col("cid"))
    # one centroid-rank pass feeds BOTH member assignment (rn=1) and
    # query probing (rn<=2) — materialize it once.
    ranked = (
        c.join(F.broadcast(cent))
        .withColumn("csim", similarity.cosine(F.col("v"), F.col("cv")))
        .withColumn("rn", F.row_number().over(w_assign))
        .select("vec_id", "cid", "rn")
        .localCheckpoint(eager=False)
    )
    members = (
        ranked.filter(F.col("rn") == 1)
        .join(c, "vec_id")
        .select("vec_id", "cid", "v")
    )
    qv = c.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    probes = (
        ranked.filter((F.col("rn") <= 2) & (F.col("vec_id") < 5))
        .select(F.col("vec_id").alias("query_id"), F.col("cid").alias("pcid"))
        .join(F.broadcast(qv), "query_id")
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id")
    )
    ivf = (
        members.join(F.broadcast(probes), on=F.col("cid") == F.col("pcid"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("sim", similarity.cosine(F.col("qv"), F.col("v")))
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= 10)
        .select("query_id", "vec_id")
    )
    exact = (
        c.join(F.broadcast(qv), on=F.col("vec_id") != F.col("query_id"))
        .withColumn("sim", similarity.cosine(F.col("qv"), F.col("v")))
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= 10)
        .select("query_id", "vec_id")
    )
    hits = F.count(ivf["vec_id"])
    return (
        exact.alias("e")
        .join(
            ivf.alias("i"),
            (F.col("e.query_id") == F.col("i.query_id"))
            & (F.col("e.vec_id") == F.col("i.vec_id")),
            "left",
        )
        .groupBy(F.col("e.query_id").alias("query_id"))
        .agg(
            F.count(F.col("i.vec_id")).alias("ivf_hits"),
            (F.round(F.count(F.col("i.vec_id")) / 10.0, 4) + 0.0).alias(
                "recall_at_10"
            ),
        )
        .orderBy("query_id")
    )


@_register(
    "lsh_banding_recall",
    f"""
    WITH s AS (
        SELECT doc_id, source, {_D_SHINGLES} AS sh
        FROM documents
    ),
    sigs AS (
        SELECT doc_id, source, list_distinct(sh) AS shd,
               {_d_minhash(0)} AS mh0, {_d_minhash(1)} AS mh1,
               {_d_minhash(2)} AS mh2, {_d_minhash(3)} AS mh3,
               {_d_minhash(4)} AS mh4, {_d_minhash(5)} AS mh5,
               {_d_minhash(6)} AS mh6, {_d_minhash(7)} AS mh7
        FROM s
    ),
    bands AS (
        SELECT doc_id, 0 AS band, concat_ws('|', mh0, mh1) AS sig FROM sigs
        UNION ALL SELECT doc_id, 1, concat_ws('|', mh2, mh3) FROM sigs
        UNION ALL SELECT doc_id, 2, concat_ws('|', mh4, mh5) FROM sigs
        UNION ALL SELECT doc_id, 3, concat_ws('|', mh6, mh7) FROM sigs
    ),
    filt AS (SELECT * FROM bands WHERE sig IS NOT NULL AND sig <> ''),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
        FROM filt a JOIN filt b ON a.band = b.band AND a.sig = b.sig
                                AND a.doc_id < b.doc_id
    ),
    truth AS (
        SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
        FROM sigs a JOIN sigs b
          ON a.source = b.source AND a.doc_id < b.doc_id
        WHERE len(list_distinct(list_cat(a.shd, b.shd))) > 0
          AND len(list_intersect(a.shd, b.shd)) * 1.0
              / len(list_distinct(list_cat(a.shd, b.shd))) >= 0.5
    )
    SELECT count(*) AS n_true_pairs,
           count(c.doc_id_a) AS n_captured,
           round(CASE WHEN count(*) > 0
                      THEN count(c.doc_id_a) * 1.0 / count(*) END, 4) + 0.0
               AS recall
    FROM truth t
    LEFT JOIN cand c ON t.doc_id_a = c.doc_id_a AND t.doc_id_b = c.doc_id_b
    """,
    "dedup-pipeline quality audit: banding recall — what fraction of "
    "true near-dup pairs (exact Jaccard >= 0.5, measured on the "
    "tractable source-blocked sample) the 4-band x 2-row LSH "
    "candidate join captures. The companion to "
    "minhash_estimate_accuracy (sketch error) and "
    "ivf_multiprobe_recall (ANN recall): together they size "
    "num_hashes, bands, and probes — the three knobs a 100 TB "
    "dedup/similarity deployment tunes. At scale the truth set is "
    "exactly this kind of blocked sample; the candidate set is the "
    "full banding join",
)
def lsh_banding_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sets = (
        spread(docs, "doc_id")
        .select(
            "doc_id",
            "source",
            F.array_distinct(text.shingles(text.tokens("text"))).alias("shd"),
        )
        .localCheckpoint(eager=False)  # feeds both truth-join sides
    )
    a = sets.select(
        F.col("doc_id").alias("doc_id_a"), "source", F.col("shd").alias("sh_a")
    )
    b = sets.select(
        F.col("doc_id").alias("doc_id_b"), "source", F.col("shd").alias("sh_b")
    )
    union_sz = F.size(F.array_union("sh_a", "sh_b"))
    # when()-guarded: a bare union_sz > 0 pre-filter is NOT enough —
    # Catalyst may reorder conjunctive predicates and evaluate the
    # division first, which under ANSI mode throws on empty unions.
    jac = F.when(
        union_sz > 0, F.size(F.array_intersect("sh_a", "sh_b")) / union_sz
    )
    truth = (
        a.join(b, on=["source"])
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .filter(jac >= 0.5)
        .select("doc_id_a", "doc_id_b")
    )
    cand = dedup.lsh_candidate_pairs(docs, "doc_id", num_hashes=8, bands=4).select(
        F.col("doc_id_a").alias("c_a"), F.col("doc_id_b").alias("c_b")
    )
    return (
        truth.join(
            cand,
            (F.col("doc_id_a") == F.col("c_a")) & (F.col("doc_id_b") == F.col("c_b")),
            "left",
        )
        .agg(
            F.count("*").alias("n_true_pairs"),
            F.count("c_a").alias("n_captured"),
            (
                F.round(
                    F.when(F.count("*") > 0, F.count("c_a") / F.count("*")), 4
                )
                + 0.0
            ).alias("recall"),
        )
    )


@_register(
    "simhash_near_pairs",
    r"""
    WITH tok AS (
        SELECT doc_id,
               unnest(list_distinct(regexp_split_to_array(trim(norm), '\s+')))
                   AS tok
        FROM (SELECT doc_id,
                     regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
              FROM documents)
    ),
    h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM tok),
    bits AS (
        SELECT doc_id, b.bit,
               CASE WHEN ((h >> b.bit) & 1) = 1 THEN 1 ELSE -1 END AS vote
        FROM h, (SELECT unnest(range(0, 32)) AS bit) b
    ),
    votes AS (SELECT doc_id, bit, sum(vote) AS v FROM bits GROUP BY 1, 2),
    sig AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END)
                    AS BIGINT) AS simhash
        FROM votes GROUP BY doc_id
    ),
    j AS (SELECT s.doc_id, d.source, s.simhash
          FROM sig s JOIN documents d USING (doc_id))
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM j a JOIN j b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 4
    ORDER BY doc_id_a, doc_id_b
    """,
    "SimHash near-dup pairs: source-blocked signature pairs within "
    "Hamming distance 4 — the verification-free fast path of the "
    "SimHash family (signatures: simhash_signatures; this is the pair "
    "stage MinHash runs as LSH banding). bit_count(xor) is a 2-cycle "
    "integer op per pair — the cheapest near-dup compare there is; at "
    "100 TB the blocking key becomes the signature's high bits "
    "(near-identical docs share them), turning the pair join into an "
    "equi-join exactly like LSH bands",
)
def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # signature build is one pipeline; the self-join consumes it twice
    sig = (
        dedup.simhash(docs, "doc_id", bits=32)
        .join(docs.select("doc_id", "source"), "doc_id")
        .localCheckpoint(eager=False)
    )
    a = sig.select(
        F.col("doc_id").alias("doc_id_a"), "source", F.col("simhash").alias("sig_a")
    )
    b = sig.select(
        F.col("doc_id").alias("doc_id_b"), "source", F.col("simhash").alias("sig_b")
    )
    hd = dedup.hamming_distance(F.col("sig_a"), F.col("sig_b"))
    return (
        a.join(b, "source")
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .withColumn("hamming", hd.cast("int"))
        .filter(F.col("hamming") <= 4)
        .select("doc_id_a", "doc_id_b", "hamming")
        .orderBy("doc_id_a", "doc_id_b")
    )


# ---------------------------------------------------------------------------
# Corpus-curation batch 2: cross-doc duplication audit, random projection,
# cluster-balanced sampling, Zipf vocabulary fit
# ---------------------------------------------------------------------------


@_register(
    "corpus_duplicate_ngrams",
    f"""
    WITH s AS (
        SELECT doc_id, list_distinct({_D_SHINGLES}) AS sh FROM documents
    ),
    ex AS (
        SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS g
        FROM s WHERE len(sh) > 0
    ),
    freq AS (
        SELECT g FROM ex GROUP BY g HAVING count(DISTINCT doc_id) >= 4
    )
    SELECT e.doc_id,
           CAST(e.n_sh AS INT) AS n_shingles,
           count(*) AS dup_shingles,
           round(count(*) * 1.0 / e.n_sh, 4) + 0.0 AS dup_fraction
    FROM ex e JOIN freq USING (g)
    GROUP BY e.doc_id, e.n_sh
    ORDER BY dup_fraction DESC, doc_id
    """,
    "cross-document duplicated-content audit (the Gopher/C4 'fraction "
    "of text in corpus-frequent n-grams' filter): 3-token shingle "
    "document frequencies over the whole corpus, then per doc the "
    "fraction of its distinct shingles that >= 4 documents share. One "
    "shuffle on the shingle hash builds the frequency table; the "
    "frequent-shingle set (heavy tail only) broadcasts back onto the "
    "shingle stream, so the corpus itself is never re-shuffled. At "
    "100 TB the exact distinct-doc count becomes a count-min/HLL "
    "sketch per shingle and the df >= 4 gate is applied to the sketch "
    "estimate — same plan shape. Complements repetition_quality "
    "(intra-doc) with the cross-doc signal",
)
def corpus_duplicate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    # emptiness gate BEFORE the projection (size(tokens) >= 3 ⟺
    # non-empty trigram set) — a post-projection size(sh) filter would be
    # pushed down and re-evaluate the whole shingle expression per row
    # shingles hash to 64-bit ints up front (the prefix_filter trick):
    # every downstream exchange ships 8-byte longs instead of k-token
    # strings, and the output counts are hash-invariant absent
    # collisions — which the oracle hash-match audits exactly
    sh = docs.filter(F.size(text.tokens("text")) >= 3).select(
        "doc_id",
        F.array_distinct(
            F.transform(text.shingles(text.tokens("text")), lambda s: F.xxhash64(s))
        ).alias("sh"),
    )
    # the exploded shingle stream is consumed twice (df count +
    # join-back) within ONE action — lazy, both consumers share the RDD
    ex = sh.select(
        "doc_id", F.size("sh").alias("n_sh"), F.explode("sh").alias("g")
    ).localCheckpoint(eager=False)
    freq = (
        # per-doc shingles are array_distinct'd, so (doc_id, g) rows are
        # unique and the document frequency is a plain count — the
        # two-phase distinct aggregate was pure overhead
        ex.groupBy("g")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= 4)
        .select("g")
    )
    return (
        ex.join(F.broadcast(freq), "g")
        .groupBy("doc_id", "n_sh")
        .agg(F.count("*").alias("dup_shingles"))
        .select(
            "doc_id",
            F.col("n_sh").alias("n_shingles"),
            "dup_shingles",
            (F.round(F.col("dup_shingles") / F.col("n_sh"), 4) + 0.0).alias(
                "dup_fraction"
            ),
        )
        .orderBy(F.col("dup_fraction").desc(), "doc_id")
    )


@_register(
    "random_projection_embeddings",
    """
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
    r AS (
        SELECT vec_id, x,
               list_transform(range(0, 8), j ->
                   list_sum(list_transform(range(1, len(x) + 1), i ->
                       x[i] * CASE WHEN (((i - 1) * 2654435761 + j * 40503)
                                         % 97) % 2 = 1
                                   THEN 1.0 ELSE -1.0 END))) AS yraw
        FROM v
    )
    SELECT vec_id,
           list_transform(yraw, y -> round(y, 4) + 0.0) AS projection,
           CASE WHEN list_sum(list_transform(x, e -> e * e)) > 0
                THEN round(list_sum(list_transform(yraw, y -> y * y))
                           / (8.0 * list_sum(list_transform(x, e -> e * e))),
                           4) + 0.0
           END AS norm_ratio
    FROM r
    ORDER BY vec_id
    """,
    "sign-random-projection (Johnson-Lindenstrauss) dimensionality "
    "reduction 64 -> 8 of the embedding column: y_j = sum_i x_i * "
    "sign(h(i, j)) with a deterministic arithmetic hash in place of the "
    "usual seeded Gaussian (reproducible across engines, partitioning, "
    "and runs). norm_ratio = |y|^2 / (k |x|^2) audits the JL isometry "
    "(expectation 1). Pure higher-order array functions, map-only, zero "
    "shuffle before the output sort — at 100 TB this is the cheap "
    "pre-reduction in front of ANN indexing or clustering, cutting "
    "vector bytes 8x before any distance pass",
)
def random_projection_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = 8
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    v = emb.select(
        "vec_id", F.transform("embedding", lambda e: e.cast("double")).alias("x")
    )

    def srp_sign(i, j):
        h = ((i * F.lit(2654435761) + j * F.lit(40503)) % 97) % 2
        return F.when(h == 1, F.lit(1.0)).otherwise(F.lit(-1.0))

    raw = v.select(
        "vec_id",
        "x",
        F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda j: F.aggregate(
                F.sequence(F.lit(0), F.size("x") - 1),
                F.lit(0.0),
                lambda acc, i: acc + F.element_at(F.col("x"), i + 1) * srp_sign(i, j),
            ),
        ).alias("yraw"),
    )
    sq_sum = lambda c: F.aggregate(c, F.lit(0.0), lambda a, e: a + e * e)  # noqa: E731
    return raw.select(
        "vec_id",
        F.transform("yraw", lambda y: F.round(y, 4) + 0.0).alias("projection"),
        F.when(
            sq_sum(F.col("x")) > 0,
            F.round(sq_sum(F.col("yraw")) / (F.lit(float(k)) * sq_sum(F.col("x"))), 4)
            + 0.0,
        ).alias("norm_ratio"),
    ).orderBy("vec_id")


@_register(
    "cluster_balanced_sample",
    """
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (SELECT vec_id AS cid, v AS cv FROM c WHERE vec_id < 8),
    sims AS (
        SELECT c.vec_id, cent.cid,
               list_dot_product(c.v, cent.cv)
                 / (sqrt(list_dot_product(c.v, c.v))
                    * sqrt(list_dot_product(cent.cv, cent.cv))) AS csim
        FROM c, cent
    ),
    assign AS (
        SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY csim DESC, cid) AS rn
            FROM sims
        ) WHERE rn = 1
    ),
    sized AS (
        SELECT vec_id, cid, count(*) OVER (PARTITION BY cid) AS cluster_size
        FROM assign
    ),
    ranked AS (
        SELECT cid, vec_id, cluster_size,
               CAST(row_number() OVER (
                   PARTITION BY cid
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
               ) AS INT) AS rk
        FROM sized
    )
    SELECT cid AS cluster_id, vec_id, CAST(cluster_size AS BIGINT) AS cluster_size,
           rk
    FROM ranked WHERE rk <= 5
    ORDER BY cluster_id, rk
    """,
    "diversity-balanced sampling: assign every embedding to its nearest "
    "coarse centroid (broadcast nested-loop, same deterministic "
    "first-C quantizer as sim_ivf_topk), then take a deterministic "
    "hash-ordered 5 per cluster — the 'cover every mode of the "
    "distribution' eval-set/seed-data selection that uniform sampling "
    "misses on skewed corpora. cluster_size rides along so the sample "
    "carries its own coverage audit. One shuffle on the cluster id; "
    "the per-cluster window never sees more than a cluster's rows",
)
def cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    c = emb.select("vec_id", F.col("embedding").alias("v"))
    cent = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    sims = c.join(F.broadcast(cent)).withColumn(
        "csim", similarity.cosine(F.col("v"), F.col("cv"))
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), F.col("cid"))
    assign = (
        sims.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid")
    )
    w_size = Window.partitionBy("cid")
    w_rank = Window.partitionBy("cid").orderBy(
        F.md5(F.col("vec_id").cast("string").cast("binary")), "vec_id"
    )
    return (
        assign.withColumn("cluster_size", F.count("*").over(w_size))
        .withColumn("rk", F.row_number().over(w_rank).cast("int"))
        .filter(F.col("rk") <= 5)
        .select(
            F.col("cid").alias("cluster_id"), "vec_id", "cluster_size", "rk"
        )
        .orderBy("cluster_id", "rk")
    )


@_register(
    "zipf_term_slope",
    rf"""
    WITH tok AS (
        SELECT lower(unnest({_D_TOKS})) AS t FROM documents
    ),
    counts AS (SELECT t, count(*) AS cnt FROM tok GROUP BY t),
    ranked AS (
        SELECT t, cnt,
               CAST(row_number() OVER (ORDER BY cnt DESC, t) AS INT) AS rk
        FROM counts
    ),
    top AS (SELECT * FROM ranked WHERE rk <= 100)
    SELECT count(*) AS n_terms,
           round(regr_slope(ln(cnt), ln(rk)), 4) AS zipf_slope,
           round(regr_intercept(ln(cnt), ln(rk)), 4) AS zipf_intercept,
           round(regr_r2(ln(cnt), ln(rk)), 6) AS r2
    FROM top
    """,
    "Zipf fit of the corpus vocabulary: term counts, frequency-ranked, "
    "OLS of ln(count) ~ ln(rank) over the top-100 terms — slope near -1 "
    "is the natural-language signature, a flat or cliff-shaped fit "
    "flags templated/synthetic text (corpus-health audit alongside "
    "token_entropy_quality's per-doc signal). The rank window runs on "
    "the post-aggregation vocabulary (tiny vs the corpus), the fit is "
    "pure partial-aggregable moments — token counting is the only "
    "corpus-scale pass",
)
def zipf_term_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    counts = (
        docs.select(F.explode(text.tokens("text")).alias("t0"))
        .select(F.lower("t0").alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), "t")
    top = (
        counts.select("t", "cnt", F.row_number().over(w).cast("int").alias("rk"))
        .filter(F.col("rk") <= 100)
    )
    lnr, lnc = F.log("rk"), F.log("cnt")
    slope = F.covar_pop(lnr, lnc) / F.var_pop(lnr)
    intercept = F.avg(lnc) - slope * F.avg(lnr)
    r2 = F.pow(F.corr(lnr, lnc), 2)
    return top.agg(
        F.count("*").alias("n_terms"),
        F.round(slope, 4).alias("zipf_slope"),
        F.round(intercept, 4).alias("zipf_intercept"),
        F.round(r2, 6).alias("r2"),
    )


@_register(
    "unigram_logprob_quality",
    rf"""
    WITH tok AS (
        SELECT doc_id, lower(unnest({_D_TOKS})) AS t FROM documents
    ),
    vocab AS (SELECT t, count(*) AS cnt FROM tok GROUP BY t),
    total AS (SELECT sum(cnt) AS n FROM vocab),
    scored AS (
        SELECT tok.doc_id, ln(vocab.cnt * 1.0 / total.n) AS logp
        FROM tok JOIN vocab USING (t) CROSS JOIN total
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(logp), 4) AS mean_logprob,
           round(exp(-avg(logp)), 4) AS perplexity
    FROM scored
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    "unigram language-model quality score (the CCNet/Wikipedia-LM "
    "perplexity filter, reduced to its unigram core): corpus token "
    "probabilities p(t) = cnt/N, then per doc the mean token log-prob "
    "and its perplexity — documents far off the corpus distribution "
    "(boilerplate, wrong language, gibberish) score high-perplexity "
    "and get filtered. The vocabulary (small vs the corpus) broadcasts "
    "back onto the token stream and the corpus total is a broadcast "
    "1-row aggregate, so the corpus-side cost is one doc_id shuffle "
    "for the per-doc mean; at 100 TB the vocab table is the trained "
    "'model' artifact, reused across runs",
)
def unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    tok = docs.select("doc_id", F.explode(text.tokens("text")).alias("t0")).select(
        "doc_id", F.lower("t0").alias("t")
    )
    # the vocab rollup feeds BOTH the broadcast join and the corpus
    # total — materialize the tiny table once so the corpus tokenize
    # isn't re-run per consumer (at 100 TB: the persisted LM artifact)
    vocab = tok.groupBy("t").agg(F.count("*").alias("cnt")).localCheckpoint(eager=False)
    total = vocab.agg(F.sum("cnt").alias("n"))
    scored = (
        tok.join(F.broadcast(vocab), "t")
        .join(F.broadcast(total))
        .withColumn("logp", F.log(F.col("cnt") * 1.0 / F.col("n")))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg("logp"), 4).alias("mean_logprob"),
            F.round(F.exp(-F.avg("logp")), 4).alias("perplexity"),
        )
        .orderBy("doc_id")
    )


@_register(
    "distribution_moments",
    """
    WITH s AS (
        SELECT l_returnflag, count(*) AS n, avg(l_extendedprice) AS mu
        FROM lineitem GROUP BY l_returnflag
    ),
    m AS (
        SELECT l.l_returnflag,
               max(s.n) AS n,
               stddev_samp(l.l_extendedprice) AS sd,
               sum(pow(l.l_extendedprice - s.mu, 2)) / max(s.n) AS m2,
               sum(pow(l.l_extendedprice - s.mu, 3)) / max(s.n) AS m3,
               sum(pow(l.l_extendedprice - s.mu, 4)) / max(s.n) AS m4
        FROM lineitem l JOIN s ON l.l_returnflag = s.l_returnflag
        GROUP BY l.l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT)                      AS n_rows,
           round(sd, 4)                           AS std_price,
           round(m3 / pow(m2, 1.5), 4) + 0.0      AS skew_price,
           round(m4 / pow(m2, 2) - 3, 4) + 0.0    AS kurt_price
    FROM m ORDER BY l_returnflag
    """,
    "distribution-shape statistics per group: sample stddev, population "
    "skewness m3/m2^1.5 and population excess kurtosis m4/m2^2 - 3 of "
    "the price column — the data-profiling layer over the reference's "
    "plain avg/max stats (get_statistics, data_transformer.py:434-448). "
    "Spark's skewness/kurtosis are ONE-PASS streaming central-moment "
    "aggregates (partial-aggregable, map-side combine, no second scan); "
    "the oracle states the same population formulas as an explicit "
    "two-pass moment computation, pinning the exact semantics (DuckDB's "
    "own skewness()/kurtosis() are sample-corrected and would NOT match)",
)
def distribution_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
            (F.round(F.skewness("l_extendedprice"), 4) + F.lit(0.0)).alias("skew_price"),
            (F.round(F.kurtosis("l_extendedprice"), 4) + F.lit(0.0)).alias("kurt_price"),
        )
        .orderBy("l_returnflag")
    )


@_register(
    "bloom_pruned_revenue",
    """
    SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS order_month,
           round(sum(l_extendedprice * (1 - l_discount)), 4)            AS revenue,
           count(*)                                                     AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY order_month
    ORDER BY order_month
    """,
    "selective fact-fact join shaped for Catalyst runtime bloom-filter "
    "injection (InjectRuntimeFilter): the urgent-orders side is "
    "selective but — at 100 TB — too large to broadcast, so the join is "
    "pinned sort-merge and Spark builds a bloom filter from the "
    "filtered creation side and pushes might_contain() down into the "
    "lineitem scan, pruning most of the probe-side shuffle at the "
    "source. Locally the 10 GB application-side threshold keeps the "
    "filter off (results identical either way — it is pure pruning); "
    "the plan test forces the thresholds down and pins the "
    "might_contain shape the query runs with at scale",
)
def bloom_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", F.col("o_orderdate").cast("date").alias("od"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
    return (
        j.groupBy(F.date_trunc("month", "od").cast("date").alias("order_month"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
        .orderBy("order_month")
    )


@_register(
    "close_order_pairs",
    """
    WITH o AS (
        SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od FROM orders
    )
    SELECT a.o_custkey,
           count(*)                                              AS n_pairs,
           CAST(min(abs(datediff('day', a.od, b.od))) AS INT)    AS min_gap_days,
           round(avg(abs(datediff('day', a.od, b.od))), 4)       AS avg_gap_days
    FROM o a JOIN o b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND abs(datediff('day', a.od, b.od)) <= 30
    GROUP BY a.o_custkey
    ORDER BY a.o_custkey
    """,
    "range-interval self-join: per customer, pairs of orders placed "
    "within 30 days of each other (burst-purchase detection). The "
    "scalable shape is equi-key + range predicate: Spark shuffles BOTH "
    "sides once on the customer key and evaluates the date-range "
    "predicate inside each co-partitioned group, so fan-out is bounded "
    "by orders-per-customer, never O(n^2). (A range join with NO equi "
    "key is the degenerate case — then you bucket the time axis into "
    "band keys first, the events_before_purchase pattern)",
)
def close_order_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", F.col("o_orderdate").cast("date").alias("od")
    )
    a, b = o.alias("a"), o.alias("b")
    gap = F.abs(F.datediff(F.col("b.od"), F.col("a.od")))
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
            & (gap <= 30),
        )
        .groupBy(F.col("a.o_custkey").alias("o_custkey"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.min(gap).alias("min_gap_days"),
            F.round(F.avg(gap), 4).alias("avg_gap_days"),
        )
        .orderBy("o_custkey")
    )


@_register(
    "prefix_jaccard_pairs",
    f"""
    WITH sets AS (
        SELECT doc_id, list_distinct({_D_SHINGLES}) AS sh FROM documents
    ),
    ne AS (SELECT * FROM sets WHERE len(sh) > 0),
    p AS (
        SELECT a.doc_id AS da, b.doc_id AS db,
               len(list_intersect(a.sh, b.sh)) AS i,
               len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS u
        FROM ne a JOIN ne b ON a.doc_id < b.doc_id
    )
    SELECT da AS doc_id_a, db AS doc_id_b, round(i * 1.0 / u, 4) AS jaccard
    FROM p WHERE i * 1.0 / u >= 0.6
    ORDER BY doc_id_a, doc_id_b
    """,
    "exact all-pairs near-dup join via PREFIX FILTERING (AllPairs/"
    "PPJoin family): trigram-shingle sets ordered rarest-shingle-first; "
    "only the first |S| - ceil(0.6|S|) + 1 shingles of each doc enter "
    "the candidate equi-join (two sets reaching Jaccard >= 0.6 MUST "
    "share a prefix shingle), a PPJoin size bound prunes length-"
    "incompatible candidates, then an exact verify pass. LSH's "
    "complement: zero false negatives at far below O(n^2) cost — the "
    "oracle is the brute-force cross-join statement of the same "
    "semantics, so the hash-match PROVES the pruning is lossless. At "
    "100 TB the rare-first order is what kills the skew: corpus-common "
    "shingles never enter any prefix (and shingle size k must keep the "
    "universe diverse — see operator docstring)",
)
def prefix_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.prefix_filter_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.6, shingle_k=3
    )
    return pairs.select(
        "doc_id_a", "doc_id_b", F.round("jaccard", 4).alias("jaccard")
    ).orderBy("doc_id_a", "doc_id_b")


@_register(
    "nation_trade_pagerank",
    """
    WITH edges AS (
        SELECT cn.n_name AS src, sn.n_name AS dst, CAST(count(*) AS DOUBLE) AS w
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey  = c.c_custkey
        JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
        JOIN supplier s ON l.l_suppkey  = s.s_suppkey
        JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
        GROUP BY cn.n_name, sn.n_name
    ),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    trans AS (
        SELECT e.src, e.dst, e.w / ow.ow AS p
        FROM edges e
        JOIN (SELECT src, sum(w) AS ow FROM edges GROUP BY src) ow USING (src)
    ),
    r0 AS (SELECT node, 1.0 / nn.n AS r FROM nodes, nn),
    r1 AS (
        SELECT nd.node,
               round(0.15 / max(nn.n) + 0.85 * coalesce(sum(t.p * r0.r), 0), 8) AS r
        FROM nodes nd CROSS JOIN nn
        LEFT JOIN trans t ON t.dst = nd.node
        LEFT JOIN r0 ON r0.node = t.src
        GROUP BY nd.node
    ),
    r2 AS (
        SELECT nd.node,
               round(0.15 / max(nn.n) + 0.85 * coalesce(sum(t.p * r1.r), 0), 8) AS r
        FROM nodes nd CROSS JOIN nn
        LEFT JOIN trans t ON t.dst = nd.node
        LEFT JOIN r1 ON r1.node = t.src
        GROUP BY nd.node
    ),
    r3 AS (
        SELECT nd.node,
               round(0.15 / max(nn.n) + 0.85 * coalesce(sum(t.p * r2.r), 0), 8) AS r
        FROM nodes nd CROSS JOIN nn
        LEFT JOIN trans t ON t.dst = nd.node
        LEFT JOIN r2 ON r2.node = t.src
        GROUP BY nd.node
    )
    SELECT node AS nation,
           round(r, 6) + 0.0 AS pagerank,
           CAST(row_number() OVER (ORDER BY r DESC, node) AS INT) AS rk
    FROM r3
    ORDER BY rk
    """,
    "link-analysis quality scoring (the web/domain-graph rank signal "
    "used to weight crawl data): weighted PageRank by power iteration "
    "over the customer-nation -> supplier-nation trade graph. The "
    "corpus-scale work is ONE pass building the edge list (lineitem "
    "joins orders on the only real shuffle; all four dims broadcast); "
    "the 3 unrolled iterations then run on the aggregated graph, each "
    "one join + one sum keyed on dst. Per-iteration 8dp rounding pins "
    "float drift so the iterative result stays hash-comparable (the "
    "kmeans-rounds trick); dangling mass deliberately not "
    "redistributed, semantics stated and matched in the oracle. At "
    "web scale the same loop shuffles (dst, contribution) pairs per "
    "round with localCheckpoint lineage cuts — connected_components' "
    "pattern",
)
def nation_trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), F.col("o_custkey") == c["c_custkey"])
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .join(
            F.broadcast(
                n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("src"))
            ),
            F.col("c_nationkey") == F.col("cn_key"),
        )
        .join(
            F.broadcast(
                n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("dst"))
            ),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("w"))
    )
    ranks = graph.pagerank(edges, "src", "dst", weight="w", iterations=3)
    w_rk = Window.orderBy(F.col("rank").desc(), "node")
    return ranks.select(
        F.col("node").alias("nation"),
        (F.round("rank", 6) + F.lit(0.0)).alias("pagerank"),
        F.row_number().over(w_rk).cast("int").alias("rk"),
    ).orderBy("rk")


@_register(
    "approx_top_event_types",
    """
    SELECT CAST(row_number() OVER (ORDER BY count(*) DESC, event_type) AS INT) AS rk,
           event_type,
           count(*) AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY n_events DESC, event_type
    LIMIT 3
    """,
    "Spark-4-native approx_top_k sketch for bounded-cardinality heavy "
    "hitters: one mergeable sketch aggregate (no full groupBy shuffle "
    "of distinct keys at 100 TB — partial sketches merge tree-wise), "
    "exploded to ranked rows. The sketch is EXACT by construction when "
    "maxItemsTracked >= NDV (here 100 >> 5 event types) — which is what "
    "makes it hash-comparable against the exact GROUP BY oracle; the "
    "unbounded-NDV regime is heavy_hitters_cms' error-bound contract",
)
def approx_top_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sketch = ev.agg(F.expr("approx_top_k(event_type, 3, 100)").alias("tk"))
    # re-rank the exploded sketch rows explicitly: the sketch's internal
    # order leaves equal counts in insertion order, which need not match
    # the oracle's (count desc, event_type) tie-break. 3 rows — the
    # single-partition window is free.
    exploded = sketch.select(F.explode("tk").alias("s")).select(
        F.col("s.item").alias("event_type"),
        F.col("s.count").alias("n_events"),
    )
    w = Window.orderBy(F.col("n_events").desc(), "event_type")
    return exploded.select(
        F.row_number().over(w).cast("int").alias("rk"),
        "event_type",
        "n_events",
    ).orderBy("rk")


def _staged_events_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage a stream-readable copy of ``events`` (micros timestamps,
    fixed schema — the nanos repair is a batch-reader concern) under a
    DETERMINISTIC path keyed on sf_dir, written once and reused: a fresh
    mkdtemp per invocation leaks a full events copy on every bench /
    driver run."""
    import hashlib
    import os
    import tempfile

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    staging = os.path.join(tempfile.gettempdir(), f"spark_graft_stage_events_{key}")
    if not os.path.exists(os.path.join(staging, "_SUCCESS")):
        # write-to-temp + atomic rename: concurrent stagers race benignly
        # (one rename wins, losers read the winner's complete copy)
        tmp = staging + f".tmp{os.getpid()}"
        load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, staging)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return staging


@_register(
    "streaming_daily_rollup_live",
    None,  # genuinely streaming — driver records the rows-only check;
    # tests/test_sources_streaming.py proves stream == batch rollup
    "LIVE Structured Streaming execution of the daily rollup (SURVEY "
    "§2.9 extension): file-source readStream over a staged copy of "
    "events -> 1-day watermark -> 1-day tumbling window -> sum/"
    "non-null-count (the reference's aggregate_by_date semantics, "
    "data_transformer.py:258-276) -> memory sink driven to completion. "
    "Incremental state replaces the reference's daily full-table "
    "recompute; the watermark bounds state for late data. Not "
    "SQL-expressible (stateful incremental execution), so no oracle — "
    "the batch twin daily_rollup_7day carries the hash check, and the "
    "stream==batch equality test carries this one",
)
def streaming_daily_rollup_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    from covid19_etl_pipeline_spark.streaming.daily_rollup import (
        read_events_stream,
        run_to_memory_sink,
        streaming_daily_rollup,
    )

    staging = _staged_events_dir(spark, sf_dir)
    rollup = streaming_daily_rollup(read_events_stream(spark, staging, 8))
    run_to_memory_sink(rollup, "streaming_daily_rollup_live")
    return spark.table("streaming_daily_rollup_live").orderBy("event_date")


@_register(
    "period_revenue_reconciliation",
    """
    WITH a AS (
        SELECT o_custkey, round(sum(o_totalprice), 4) AS rev_early
        FROM orders WHERE year(CAST(o_orderdate AS DATE)) BETWEEN 1995 AND 1996
        GROUP BY o_custkey
    ),
    b AS (
        SELECT o_custkey, round(sum(o_totalprice), 4) AS rev_late
        FROM orders WHERE year(CAST(o_orderdate AS DATE)) BETWEEN 1997 AND 1998
        GROUP BY o_custkey
    )
    SELECT coalesce(a.o_custkey, b.o_custkey) AS o_custkey,
           a.rev_early,
           b.rev_late,
           CASE WHEN a.o_custkey IS NULL THEN 'late_only'
                WHEN b.o_custkey IS NULL THEN 'early_only'
                ELSE 'both' END AS presence,
           round(b.rev_late - a.rev_early, 4) AS rev_delta
    FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
    ORDER BY o_custkey
    """,
    "FULL OUTER reconciliation — the join type the registry lacked: "
    "per-customer revenue in two adjacent periods, full-outer on the "
    "customer key so the result carries matched, early-only, and "
    "late-only rows with a presence class and a period delta (the "
    "period-over-period drift report every serving layer grows). Both "
    "inputs aggregate BEFORE the join, so the full-outer runs on "
    "per-key rollups (small) rather than raw facts, and both rollups "
    "share the same custkey partitioning — one exchange each, no "
    "re-shuffle for the join",
)
def period_revenue_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", F.year(F.col("o_orderdate").cast("date")).alias("yr")
    )

    def window_rev(lo: int, hi: int, out: str) -> DataFrame:
        return (
            o.filter(F.col("yr").between(lo, hi))
            .groupBy("o_custkey")
            .agg(F.round(F.sum("o_totalprice"), 4).alias(out))
        )

    a = window_rev(1995, 1996, "rev_early")
    b = window_rev(1997, 1998, "rev_late")
    joined = a.alias("a").join(
        b.alias("b"), F.col("a.o_custkey") == F.col("b.o_custkey"), "full_outer"
    )
    presence = (
        F.when(F.col("a.o_custkey").isNull(), "late_only")
        .when(F.col("b.o_custkey").isNull(), "early_only")
        .otherwise("both")
    )
    return joined.select(
        F.coalesce(F.col("a.o_custkey"), F.col("b.o_custkey")).alias("o_custkey"),
        "rev_early",
        "rev_late",
        presence.alias("presence"),
        F.round(F.col("rev_late") - F.col("rev_early"), 4).alias("rev_delta"),
    ).orderBy("o_custkey")


def _bpe_pair_counts(symdf: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts over a (sym, freq) vocabulary — the
    BPE statistics pass. Runs on the VOCABULARY, never the corpus."""
    pairs = (
        "CASE WHEN size(a) >= 2 THEN transform(sequence(1, size(a) - 1), "
        "i -> concat(element_at(a, i), ' ', element_at(a, i + 1))) "
        "ELSE CAST(array() AS array<string>) END"
    )
    return (
        symdf.select(F.split("sym", " ").alias("a"), "freq")
        .select(F.explode(F.expr(pairs)).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
    )


def _bpe_apply_merge(symdf: DataFrame, top1: DataFrame) -> DataFrame:
    """Apply one merge rule to every vocabulary entry: left-to-right
    non-overlapping replace of the space-separated pair (identical
    replace() semantics in Spark and DuckDB, including the consumed-
    boundary case — stated, not hidden)."""
    return symdf.crossJoin(F.broadcast(top1.select("pair", "new_symbol"))).select(
        F.trim(
            F.expr(
                "replace(concat(' ', sym, ' '), "
                "concat(' ', pair, ' '), concat(' ', new_symbol, ' '))"
            )
        ).alias("sym"),
        "freq",
    )


@_register(
    "bpe_merge_induction",
    r"""
    WITH words AS (
        SELECT w, count(*) AS freq FROM (
            SELECT lower(unnest(regexp_split_to_array(trim(text), '\s+'))) AS w
            FROM documents
        ) WHERE regexp_matches(w, '^[a-z]+$') AND len(w) >= 2
        GROUP BY w
    ),
    sym0 AS (
        SELECT array_to_string(regexp_split_to_array(w, ''), ' ') AS sym, freq
        FROM words
    ),
    p1 AS (
        SELECT pair, sum(freq) AS cnt FROM (
            SELECT unnest(list_transform(range(1, len(a)),
                                         i -> a[i] || ' ' || a[i+1])) AS pair,
                   freq
            FROM (SELECT regexp_split_to_array(sym, ' ') AS a, freq FROM sym0)
        ) GROUP BY pair
    ),
    t1 AS (
        SELECT pair, replace(pair, ' ', '') AS new_symbol, cnt
        FROM p1 ORDER BY cnt DESC, pair LIMIT 1
    ),
    sym1 AS (
        SELECT trim(replace(' ' || s.sym || ' ',
                            ' ' || t1.pair || ' ',
                            ' ' || t1.new_symbol || ' ')) AS sym, s.freq
        FROM sym0 s, t1
    ),
    p2 AS (
        SELECT pair, sum(freq) AS cnt FROM (
            SELECT unnest(list_transform(range(1, len(a)),
                                         i -> a[i] || ' ' || a[i+1])) AS pair,
                   freq
            FROM (SELECT regexp_split_to_array(sym, ' ') AS a, freq FROM sym1)
        ) GROUP BY pair
    ),
    t2 AS (
        SELECT pair, replace(pair, ' ', '') AS new_symbol, cnt
        FROM p2 ORDER BY cnt DESC, pair LIMIT 1
    )
    SELECT CAST(1 AS INT) AS merge_rank, pair, new_symbol, cnt AS pair_count FROM t1
    UNION ALL
    SELECT CAST(2 AS INT), pair, new_symbol, cnt FROM t2
    ORDER BY merge_rank
    """,
    "BPE vocabulary induction, 2 unrolled merge rounds: lowercase "
    "alphabetic word frequencies -> char-symbol spelling -> adjacent-"
    "pair counts -> merge the max pair (count desc, pair asc "
    "tie-break) -> recount -> second merge. THE tokenizer-training "
    "core, in pure built-ins. The classic BPE trick is the scale "
    "story: pair statistics run over the (word, freq) VOCABULARY "
    "(tiny), never the corpus — the corpus contributes one token-count "
    "pass; each round is then a vocab-sized map + one pair-key "
    "shuffle. Merge application is engine-portable left-to-right "
    "replace (both engines consume the shared boundary space "
    "identically — semantics stated and oracle-matched). The merged "
    "top-1 rule broadcasts; driver never sees the data",
)
def bpe_merge_induction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    words = (
        docs.select(F.explode(text.tokens("text")).alias("t0"))
        .select(F.lower("t0").alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$") & (F.length("w") >= 2))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    # the vocabulary feeds round-1 counting AND merge application —
    # materialize once (at corpus scale this is the persisted vocab)
    sym0 = words.select(
        F.array_join(F.split("w", ""), " ").alias("sym"), "freq"
    ).localCheckpoint(eager=False)
    top = F.row_number().over(Window.orderBy(F.col("cnt").desc(), "pair"))
    t1 = (
        _bpe_pair_counts(sym0)
        .withColumn("rn", top)
        .filter(F.col("rn") == 1)
        .select("pair", F.expr("replace(pair, ' ', '')").alias("new_symbol"), "cnt")
        .localCheckpoint(eager=False)
    )
    sym1 = _bpe_apply_merge(sym0, t1)
    t2 = (
        _bpe_pair_counts(sym1)
        .withColumn("rn", top)
        .filter(F.col("rn") == 1)
        .select("pair", F.expr("replace(pair, ' ', '')").alias("new_symbol"), "cnt")
    )
    r1 = t1.select(
        F.lit(1).cast("int").alias("merge_rank"), "pair", "new_symbol",
        F.col("cnt").alias("pair_count"),
    )
    r2 = t2.select(
        F.lit(2).cast("int").alias("merge_rank"), "pair", "new_symbol",
        F.col("cnt").alias("pair_count"),
    )
    return r1.unionByName(r2).orderBy("merge_rank")


@_register(
    "bpe_apply_merges",
    r"""
    WITH words AS (
        SELECT w, count(*) AS freq FROM (
            SELECT lower(unnest(regexp_split_to_array(trim(text), '\s+'))) AS w
            FROM documents
        ) WHERE regexp_matches(w, '^[a-z]+$') AND len(w) >= 2
        GROUP BY w
    ),
    sym0 AS (
        SELECT array_to_string(regexp_split_to_array(w, ''), ' ') AS sym, freq
        FROM words
    ),
    p1 AS (
        SELECT pair, sum(freq) AS cnt FROM (
            SELECT unnest(list_transform(range(1, len(a)),
                                         i -> a[i] || ' ' || a[i+1])) AS pair,
                   freq
            FROM (SELECT regexp_split_to_array(sym, ' ') AS a, freq FROM sym0)
        ) GROUP BY pair
    ),
    t1 AS (
        SELECT pair, replace(pair, ' ', '') AS new_symbol, cnt
        FROM p1 ORDER BY cnt DESC, pair LIMIT 1
    ),
    sym1 AS (
        SELECT trim(replace(' ' || s.sym || ' ',
                            ' ' || t1.pair || ' ',
                            ' ' || t1.new_symbol || ' ')) AS sym, s.freq
        FROM sym0 s, t1
    ),
    p2 AS (
        SELECT pair, sum(freq) AS cnt FROM (
            SELECT unnest(list_transform(range(1, len(a)),
                                         i -> a[i] || ' ' || a[i+1])) AS pair,
                   freq
            FROM (SELECT regexp_split_to_array(sym, ' ') AS a, freq FROM sym1)
        ) GROUP BY pair
    ),
    t2 AS (
        SELECT pair, replace(pair, ' ', '') AS new_symbol, cnt
        FROM p2 ORDER BY cnt DESC, pair LIMIT 1
    ),
    dw AS (
        SELECT doc_id, w FROM (
            SELECT doc_id,
                   lower(unnest(regexp_split_to_array(trim(text), '\s+'))) AS w
            FROM documents
        ) WHERE regexp_matches(w, '^[a-z]+$') AND len(w) >= 2
    ),
    sp AS (
        SELECT doc_id,
               array_to_string(regexp_split_to_array(w, ''), ' ') AS sym
        FROM dw
    ),
    ap1 AS (
        SELECT doc_id, sym,
               trim(replace(' ' || sym || ' ',
                            ' ' || t1.pair || ' ',
                            ' ' || t1.new_symbol || ' ')) AS sym1
        FROM sp, t1
    ),
    ap2 AS (
        SELECT doc_id, sym,
               trim(replace(' ' || sym1 || ' ',
                            ' ' || t2.pair || ' ',
                            ' ' || t2.new_symbol || ' ')) AS sym2
        FROM ap1, t2
    )
    SELECT doc_id,
           CAST(count(*) AS INT) AS n_words,
           CAST(sum(len(regexp_split_to_array(sym, ' '))) AS BIGINT)
               AS n_symbols_before,
           CAST(sum(len(regexp_split_to_array(sym2, ' '))) AS BIGINT)
               AS n_symbols_after
    FROM ap2 GROUP BY doc_id
    ORDER BY doc_id
    """,
    "tokenizer APPLICATION — the other half of bpe_merge_induction: "
    "the two induced merge rules are applied in rank order to every "
    "document's word stream (char-spelled symbols, left-to-right "
    "non-overlapping replace — round 2 can consume round 1's merged "
    "symbol, so application is strictly sequential), then per-doc "
    "symbol counts before/after measure the compression the learned "
    "vocabulary buys. The scale split is the point: induction runs on "
    "the (word, freq) VOCABULARY, application is a MAP-ONLY corpus "
    "pass with the rank-ordered merge table BROADCAST — exactly how a "
    "learned tokenizer deploys at 100 TB (rules are driver-free: the "
    "1-row rule tables cross-broadcast onto the stream)",
)
def bpe_apply_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    dw = (
        docs.select("doc_id", F.explode(text.tokens("text")).alias("t0"))
        .select("doc_id", F.lower("t0").alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$") & (F.length("w") >= 2))
    )
    words = dw.groupBy("w").agg(F.count("*").alias("freq"))
    sym0v = words.select(
        F.array_join(F.split("w", ""), " ").alias("sym"), "freq"
    ).localCheckpoint(eager=False)
    top = F.row_number().over(Window.orderBy(F.col("cnt").desc(), "pair"))
    t1 = (
        _bpe_pair_counts(sym0v)
        .withColumn("rn", top)
        .filter(F.col("rn") == 1)
        .select("pair", F.expr("replace(pair, ' ', '')").alias("new_symbol"))
        .localCheckpoint(eager=False)
    )
    sym1v = _bpe_apply_merge(sym0v, t1)
    t2 = (
        _bpe_pair_counts(sym1v)
        .withColumn("rn", top)
        .filter(F.col("rn") == 1)
        .select("pair", F.expr("replace(pair, ' ', '')").alias("new_symbol"))
        .localCheckpoint(eager=False)
    )
    apply1 = F.trim(
        F.expr(
            "replace(concat(' ', sym, ' '), concat(' ', t1_pair, ' '), "
            "concat(' ', t1_sym, ' '))"
        )
    )
    apply2 = F.trim(
        F.expr(
            "replace(concat(' ', sym1, ' '), concat(' ', t2_pair, ' '), "
            "concat(' ', t2_sym, ' '))"
        )
    )
    spelled = dw.select(
        "doc_id", F.array_join(F.split("w", ""), " ").alias("sym")
    )
    applied = (
        spelled.crossJoin(
            F.broadcast(
                t1.select(
                    F.col("pair").alias("t1_pair"), F.col("new_symbol").alias("t1_sym")
                )
            )
        )
        .withColumn("sym1", apply1)
        .crossJoin(
            F.broadcast(
                t2.select(
                    F.col("pair").alias("t2_pair"), F.col("new_symbol").alias("t2_sym")
                )
            )
        )
        .withColumn("sym2", apply2)
    )
    return (
        applied.groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_words"),
            F.sum(F.size(F.split("sym", " "))).cast("bigint").alias("n_symbols_before"),
            F.sum(F.size(F.split("sym2", " "))).cast("bigint").alias("n_symbols_after"),
        )
        .orderBy("doc_id")
    )


@_register(
    "doc_novelty_fraction",
    f"""
    WITH sh AS (
        SELECT doc_id, unnest(list_distinct({_D_SHINGLES})) AS s FROM documents
    ),
    fs AS (SELECT s, min(doc_id) AS first_seen FROM sh GROUP BY s),
    per AS (
        SELECT sh.doc_id,
               count(*) AS n_shingles,
               sum(CASE WHEN fs.first_seen = sh.doc_id THEN 1 ELSE 0 END)
                   AS n_novel
        FROM sh JOIN fs ON sh.s = fs.s
        GROUP BY sh.doc_id
    )
    SELECT doc_id, CAST(n_shingles AS INT) AS n_shingles,
           round(n_novel * 1.0 / n_shingles, 4) AS novel_frac
    FROM per ORDER BY doc_id
    """,
    "per-document novelty scoring: the fraction of a doc's distinct "
    "trigram shingles whose FIRST corpus appearance (min doc_id over "
    "the ingestion order) is this document — the freshness/"
    "contribution curve data-ordering and crawl-frontier decisions "
    "read (a near-zero novelty tail means the crawl is re-reading "
    "itself). One shingle-keyed shuffle builds the first-seen table, "
    "one join-back scores docs; first-seen is universe-sized so it "
    "stays a shuffle join (NOT broadcast), the same shape as "
    "corpus_duplicate_ngrams, and at 100 TB it is the incrementally-"
    "maintained artifact a streaming ingest would update per batch",
)
def doc_novelty_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    sh = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(text.shingles(text.tokens("text"), k=3))
        ).alias("s"),
    )
    fs = sh.groupBy("s").agg(F.min("doc_id").alias("first_seen"))
    per = (
        sh.join(fs, "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(
                F.when(F.col("first_seen") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    return per.select(
        "doc_id",
        F.col("n_shingles").cast("int").alias("n_shingles"),
        F.round(F.col("n_novel") / F.col("n_shingles"), 4).alias("novel_frac"),
    ).orderBy("doc_id")


@_register(
    "rfm_customer_segments",
    """
    WITH rfm AS (
        SELECT o_custkey,
               CAST(datediff('day', max(CAST(o_orderdate AS DATE)),
                             DATE '2001-09-01') AS INT)  AS recency_days,
               count(*)                                  AS frequency,
               round(sum(o_totalprice), 4)               AS monetary
        FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, recency_days, frequency, monetary,
           CAST(ntile(4) OVER (ORDER BY recency_days, o_custkey) AS INT) AS r_quartile,
           CAST(ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS INT) AS f_quartile,
           CAST(ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS INT) AS m_quartile
    FROM rfm
    ORDER BY o_custkey
    """,
    "RFM feature assembly + quartile scoring — the canonical customer-"
    "segmentation feature pipeline (recency from a pinned reference "
    "date for determinism, frequency, monetary) with ntile quartiles "
    "on unique tie-broken orderings (quartile 1 = best). One fact "
    "rollup shuffle; the three ntile windows run on the per-customer "
    "rollup (entity-sized, not fact-sized). At 100 TB swap exact ntile "
    "for percentile_approx threshold lookups to avoid the global sort "
    "of even the rollup",
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("2001-09-01").cast("date"), F.max(F.col("o_orderdate").cast("date"))
        ).alias("recency_days"),
        F.count("*").alias("frequency"),
        F.round(F.sum("o_totalprice"), 4).alias("monetary"),
    )
    q = lambda order: F.ntile(4).over(Window.orderBy(*order)).cast("int")  # noqa: E731
    return rfm.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        q([F.col("recency_days"), F.col("o_custkey")]).alias("r_quartile"),
        q([F.col("frequency").desc(), F.col("o_custkey")]).alias("f_quartile"),
        q([F.col("monetary").desc(), F.col("o_custkey")]).alias("m_quartile"),
    ).orderBy("o_custkey")


@_register(
    "dow_seasonality_profile",
    """
    WITH daily AS (
        SELECT event_type,
               CAST(dayofweek(CAST(ts AS DATE)) + 1 AS INT) AS dow,
               value
        FROM events WHERE value IS NOT NULL
    ),
    per_dow AS (
        SELECT event_type, dow, count(*) AS n_events, avg(value) AS avg_value
        FROM daily GROUP BY event_type, dow
    )
    SELECT event_type, dow, n_events,
           round(avg_value, 4) AS avg_value,
           round(avg_value / (sum(avg_value * n_events) OVER (PARTITION BY event_type)
                              / sum(n_events) OVER (PARTITION BY event_type)), 4)
               AS seasonal_index
    FROM per_dow
    ORDER BY event_type, dow
    """,
    "day-of-week seasonality profile per event type: mean value per "
    "(type, dow) and its ratio to the type's overall mean — the "
    "seasonal-index baseline that turns raw activity into "
    "calendar-adjusted anomaly inputs. The overall mean is recovered "
    "from the per-dow rollup itself (weighted window over 7 rows per "
    "type), so the fact is scanned ONCE and the windows run on 7xtypes "
    "rows. dow is Sunday=1 in both engines after the +1 alignment",
)
def dow_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    per_dow = (
        ev.select(
            "event_type", F.dayofweek(F.col("ts").cast("date")).alias("dow"), "value"
        )
        .groupBy("event_type", "dow")
        .agg(F.count("*").alias("n_events"), F.avg("value").alias("avg_value"))
    )
    w = Window.partitionBy("event_type")
    overall = F.sum(F.col("avg_value") * F.col("n_events")).over(w) / F.sum(
        "n_events"
    ).over(w)
    return per_dow.select(
        "event_type",
        "dow",
        "n_events",
        F.round("avg_value", 4).alias("avg_value"),
        F.round(F.col("avg_value") / overall, 4).alias("seasonal_index"),
    ).orderBy("event_type", "dow")


@_register(
    "source_calibrated_quality",
    """
    SELECT doc_id, source, n_chars,
           round(percent_rank() OVER (PARTITION BY source
                                      ORDER BY n_chars, doc_id), 6) + 0.0 AS source_pctl
    FROM documents
    ORDER BY doc_id
    """,
    "cross-source score calibration: a raw quality feature (length "
    "here; any scorer in production) is rank-normalized WITHIN its "
    "source via percent_rank, so thresholds mean the same thing for "
    "every source before corpus mixing — the fix for 'source A's "
    "median is source B's top decile'. One window partitioned by "
    "source (horizontally scalable); unique doc_id tie-break keeps "
    "ranks deterministic",
)
def source_calibrated_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    return docs.select(
        "doc_id",
        "source",
        "n_chars",
        (F.round(F.percent_rank().over(w), 6) + F.lit(0.0)).alias("source_pctl"),
    ).orderBy("doc_id")


@_register(
    "hard_negative_mining",
    """
    WITH c AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    u AS (
        SELECT vec_id, label,
               list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS uv
        FROM c WHERE list_dot_product(v, v) > 0
    ),
    q AS (SELECT vec_id AS q_id, label AS q_label, uv AS q_uv FROM u WHERE vec_id < 5),
    s AS (
        SELECT q.q_id, q.q_label, u.vec_id AS neighbor_id, u.label AS neighbor_label,
               list_dot_product(u.uv, q.q_uv) AS cs,
               row_number() OVER (PARTITION BY q.q_id
                                  ORDER BY list_dot_product(u.uv, q.q_uv) DESC,
                                           u.vec_id) AS rk
        FROM u JOIN q ON u.label <> q.q_label
    )
    SELECT q_id, CAST(rk AS INT) AS rk, neighbor_id, q_label, neighbor_label,
           round(cs, 6) + 0.0 AS cosine_sim
    FROM s WHERE rk <= 3
    ORDER BY q_id, rk
    """,
    "hard-negative mining for contrastive training: per query vector, "
    "the top-3 most-similar vectors with a DIFFERENT label — maximally "
    "confusing negatives, the batch-construction core of embedding-"
    "model training. Queries broadcast (points never move — the "
    "cluster_balanced_sample shape); cosine is one dot product on "
    "pre-unit-normalized vectors; the rank window partitions by query. "
    "At 100 TB the candidate side narrows through the IVF/LSH index "
    "first (sim_ivf_topk) — this exact form is the correctness oracle "
    "for that path, with float-deterministic element-order dot products",
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    n = similarity.norm(F.col("v"))
    pts = (
        emb.withColumn("nm", n)
        .filter(F.col("nm") > 0)
        .select(
            "vec_id",
            "label",
            F.transform("v", lambda x: x / F.col("nm")).alias("uv"),
        )
        # no checkpoint: both consumers (the tiny broadcast query side and
        # the candidate scan) recompute the map-only normalization cheaper
        # than materializing the corpus-sized array column would cost
    )
    q = pts.select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("uv").alias("q_uv"),
    ).filter(F.col("q_id") < 5)
    cs = similarity.dot(F.col("uv"), F.col("q_uv"))
    w = Window.partitionBy("q_id").orderBy(F.col("cs").desc(), "vec_id")
    return (
        pts.crossJoin(F.broadcast(q))
        .filter(F.col("label") != F.col("q_label"))
        .withColumn("cs", cs)
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 3)
        .select(
            "q_id",
            "rk",
            F.col("vec_id").alias("neighbor_id"),
            "q_label",
            F.col("label").alias("neighbor_label"),
            (F.round("cs", 6) + F.lit(0.0)).alias("cosine_sim"),
        )
        .orderBy("q_id", "rk")
    )


@_register(
    "truncation_audit",
    r"""
    SELECT source,
           count(*) AS n_docs,
           CAST(count(*) FILTER (n_tokens > 60) AS BIGINT) AS n_over_limit,
           round(avg(CASE WHEN n_tokens > 60 THEN n_tokens - 60 ELSE 0 END), 4)
               AS avg_truncated_tokens,
           round(sum(least(n_tokens, 60)) * 1.0 / sum(n_tokens), 4)
               AS kept_token_fraction
    FROM (
        SELECT source, len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
        FROM documents
    )
    GROUP BY source
    ORDER BY source
    """,
    "context-length truncation audit per source: how many documents "
    "exceed the training context budget (60 tokens here), the mean "
    "tokens a hard truncation would discard, and the kept-token "
    "fraction — the go/no-go stat for choosing truncate vs chunk "
    "(chunk_documents) per source before corpus assembly. One narrow "
    "token-count pass + one source-keyed rollup; every measure is "
    "partial-aggregable (conditional sums), no second scan",
)
def truncation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    nt = text.token_count("text")
    over = nt > 60
    return (
        docs.select("source", nt.alias("n_tokens"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("n_tokens") > 60, 1).otherwise(0))
            .cast("bigint")
            .alias("n_over_limit"),
            F.round(
                F.avg(
                    F.when(F.col("n_tokens") > 60, F.col("n_tokens") - 60).otherwise(0)
                ),
                4,
            ).alias("avg_truncated_tokens"),
            F.round(
                F.sum(F.least(F.col("n_tokens"), F.lit(60))) * 1.0 / F.sum("n_tokens"),
                4,
            ).alias("kept_token_fraction"),
        )
        .orderBy("source")
    )


@_register(
    "cumulative_distinct_users",
    """
    WITH firsts AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS first_date
        FROM events GROUP BY user_id
    ),
    new_per_day AS (
        SELECT first_date AS event_date, count(*) AS new_users
        FROM firsts GROUP BY first_date
    ),
    days AS (SELECT DISTINCT CAST(ts AS DATE) AS event_date FROM events)
    SELECT d.event_date,
           CAST(coalesce(n.new_users, 0) AS BIGINT) AS new_users,
           CAST(sum(coalesce(n.new_users, 0)) OVER (ORDER BY d.event_date)
                AS BIGINT) AS cumulative_users
    FROM days d LEFT JOIN new_per_day n USING (event_date)
    ORDER BY d.event_date
    """,
    "cumulative distinct-user curve — COUNT(DISTINCT) OVER, which "
    "Spark's window functions lack, composed from built-ins: each "
    "user's first-seen date (one user-keyed agg), new-user counts per "
    "day, then a running sum over the DAY-GRAIN rollup. The naive "
    "form (distinct-count per expanding window) rescans the fact once "
    "per day; this is two partial-aggregable shuffles + a window over "
    "#days rows. The unpartitioned running-sum window is post-"
    "aggregation only (the W1 exemption)",
)
def cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("event_date")
    )
    firsts = ev.groupBy("user_id").agg(F.min("event_date").alias("first_date"))
    new_per_day = firsts.groupBy(F.col("first_date").alias("event_date")).agg(
        F.count("*").alias("new_users")
    )
    days = ev.select("event_date").distinct()
    joined = days.join(new_per_day, "event_date", "left").select(
        "event_date", F.coalesce("new_users", F.lit(0)).alias("new_users")
    )
    w = Window.orderBy("event_date").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        "event_date",
        F.col("new_users").cast("bigint").alias("new_users"),
        F.sum("new_users").over(w).cast("bigint").alias("cumulative_users"),
    ).orderBy("event_date")


@_register(
    "weighted_sample_documents",
    """
    WITH keyed AS (
        SELECT doc_id, n_chars,
               round(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::UBIGINT
                         % 1000003 + 1) / 1000004.0) / n_chars, 8) AS sample_key
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, n_chars, sample_key,
               CAST(row_number() OVER (ORDER BY sample_key DESC, doc_id) AS INT) AS rk
        FROM keyed
    )
    SELECT rk, doc_id, n_chars, sample_key FROM ranked
    WHERE rk <= 20 ORDER BY rk
    """,
    "weight-proportional sampling without replacement (Efraimidis-"
    "Spirakis exponential keys): key = ln(u)/w with u a DETERMINISTIC "
    "content-hash uniform (md5 hex -> integer, identical in both "
    "engines) and w = n_chars, top-k by key = a w-weighted sample — "
    "how a corpus is length/quality-weighted WITHOUT materializing "
    "per-row random state or a resample loop. One narrow keying pass "
    "+ TakeOrderedAndProject top-k (per-partition heaps, no global "
    "sort); reproducible across runs, engines, and repartitioning — "
    "the auditability property df.sample(weights=...) cannot give",
)
def weighted_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hx = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10).cast(
        "long"
    )
    u = (hx % 1000003 + 1) / F.lit(1000004.0)
    keyed = docs.select(
        "doc_id",
        "n_chars",
        F.round(F.log(u) / F.col("n_chars"), 8).alias("sample_key"),
    )
    w = Window.orderBy(F.col("sample_key").desc(), "doc_id")
    return (
        keyed.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 20)
        .select("rk", "doc_id", "n_chars", "sample_key")
        .orderBy("rk")
    )


@_register(
    "variant_props_stats",
    """
    SELECT event_type,
           count(*) AS n_events,
           round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
    FROM events
    WHERE props IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
    "Spark-4 VARIANT semi-structured path: parse_json shreds the "
    "props string to a binary variant ONCE, variant_get pulls a TYPED "
    "field without per-access string re-parsing (vs get_json_object, "
    "which re-parses the JSON text for every path expression — at "
    "100 TB with several extracted fields that is the difference "
    "between one parse and N parses per row), then a standard rollup. "
    "Oracle states the same semantics with JSON string functions",
)
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").cast("int").alias("max_k"),
        )
        .orderBy("event_type")
    )


@_register(
    "epoch_upsample_documents",
    """
    WITH weighted AS (
        SELECT doc_id, source,
               CASE WHEN source IN ('src0', 'src1', 'src2') THEN 2.5
                    WHEN source IN ('src3', 'src4')         THEN 1.5
                    ELSE 1.0 END AS repeat_factor
        FROM documents
    ),
    counted AS (
        SELECT doc_id, source,
               CAST(floor(repeat_factor) AS INT)
               + CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                           < lpad(to_hex(CAST(256 * (repeat_factor
                                                     - floor(repeat_factor))
                                         AS INT)), 2, '0')
                      THEN 1 ELSE 0 END AS n_repeats
        FROM weighted
    )
    SELECT doc_id, source, CAST(r AS INT) AS repeat_idx
    FROM counted, LATERAL unnest(range(1, n_repeats + 1)) AS t(r)
    ORDER BY doc_id, repeat_idx
    """,
    "epoch up-sampling by mixture weight — the corpus-assembly stage "
    "that materializes per-source repeat factors (e.g. quality source "
    "x2.5): integer part via sequence-explode, FRACTIONAL part as a "
    "deterministic content-hash Bernoulli (hash prefix < threshold "
    "byte), so 2.5 means every doc twice plus a reproducible half of "
    "docs a third time. Pure narrow ops (no shuffle before the output "
    "sort) and auditable: the same doc always gets the same repeat "
    "count across runs, engines, and partitionings",
)
def epoch_upsample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rf = (
        F.when(F.col("source").isin("src0", "src1", "src2"), 2.5)
        .when(F.col("source").isin("src3", "src4"), 1.5)
        .otherwise(1.0)
    )
    frac_threshold = F.lpad(
        F.hex((256 * (F.col("repeat_factor") - F.floor("repeat_factor"))).cast("int")),
        2,
        "0",
    )
    extra = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < F.lower(frac_threshold),
        1,
    ).otherwise(0)
    counted = (
        docs.select("doc_id", "source", rf.alias("repeat_factor"))
        .withColumn(
            "n_repeats", (F.floor("repeat_factor").cast("int") + extra).cast("int")
        )
    )
    return (
        counted.select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(1), F.col("n_repeats"))).alias("repeat_idx"),
        )
        .select("doc_id", "source", F.col("repeat_idx").cast("int").alias("repeat_idx"))
        .orderBy("doc_id", "repeat_idx")
    )


@_register(
    "recsys_negative_samples",
    """
    WITH np AS (SELECT count(*) AS n FROM part),
    pidx AS (
        SELECT p_partkey,
               CAST(row_number() OVER (ORDER BY p_partkey) AS BIGINT) AS pi
        FROM part
    ),
    draws AS (
        SELECT c.c_custkey, t.i,
               (('0x' || substr(md5(CAST(c.c_custkey AS VARCHAR) || '|'
                                   || CAST(t.i AS VARCHAR)), 1, 12))::UBIGINT
                % np.n) + 1 AS pi
        FROM customer c CROSS JOIN np, LATERAL unnest(range(1, 9)) AS t(i)
    ),
    cand AS (
        SELECT d.c_custkey, p.p_partkey, min(d.i) AS i
        FROM draws d JOIN pidx p ON d.pi = p.pi
        GROUP BY d.c_custkey, p.p_partkey
    ),
    interacted AS (
        SELECT DISTINCT o.o_custkey, l.l_partkey
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    negatives AS (
        SELECT c.c_custkey, c.p_partkey, c.i,
               row_number() OVER (PARTITION BY c.c_custkey
                                  ORDER BY c.i, c.p_partkey) AS rk
        FROM cand c
        WHERE NOT EXISTS (SELECT 1 FROM interacted x
                          WHERE x.o_custkey = c.c_custkey
                            AND x.l_partkey = c.p_partkey)
    )
    SELECT c_custkey, CAST(rk AS INT) AS neg_rank, p_partkey
    FROM negatives WHERE rk <= 3
    ORDER BY c_custkey, neg_rank
    """,
    "negative sampling for recommender/contrastive training over the "
    "user-item interaction graph: per customer, 8 deterministic hash "
    "draws index into the part dimension (draw-and-join — NEVER the "
    "O(users x items) cross join), collisions collapse keeping the "
    "earliest draw, interactions are anti-joined away, first 3 "
    "survivors per user kept. At 100 TB: draws are narrow arithmetic, "
    "the item index broadcasts (dims are small), and the anti join "
    "shuffles only the sampled candidates — sampling cost scales with "
    "users x draws, independent of catalog size. Content-hash draws "
    "make the negatives reproducible across engines and runs",
)
def recsys_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    n_parts = part.count()  # dimension-table scalar, a stats lookup at scale
    # small-dim global window: single partition is fine on a dimension
    pidx = part.select(
        "p_partkey",
        F.row_number().over(Window.orderBy("p_partkey")).cast("bigint").alias("pi"),
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    hx = F.conv(
        F.substring(
            F.md5(F.concat(F.col("c_custkey").cast("string"), F.lit("|"), F.col("i").cast("string"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    draws = cust.select(
        "c_custkey", F.explode(F.sequence(F.lit(1), F.lit(8))).alias("i")
    ).select("c_custkey", "i", ((hx % n_parts) + 1).alias("pi"))
    cand = (
        draws.join(F.broadcast(pidx), "pi")
        .groupBy("c_custkey", "p_partkey")
        .agg(F.min("i").alias("i"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    interacted = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c_custkey"), F.col("l_partkey").alias("p_partkey"))
        # no distinct: LEFT ANTI against duplicated interaction rows is
        # identical, and the dedup was a full extra fact shuffle (the
        # oracle keeps DISTINCT for the NOT-EXISTS formulation only)
    )
    negatives = cand.join(interacted, ["c_custkey", "p_partkey"], "left_anti")
    w = Window.partitionBy("c_custkey").orderBy("i", "p_partkey")
    return (
        negatives.withColumn("neg_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("neg_rank") <= 3)
        .select("c_custkey", "neg_rank", "p_partkey")
        .orderBy("c_custkey", "neg_rank")
    )


@_register(
    "containment_doc_pairs",
    f"""
    WITH sets AS (
        SELECT doc_id, list_distinct({_D_SHINGLES}) AS sh FROM documents
    ),
    ne AS (SELECT * FROM sets WHERE len(sh) > 0),
    p AS (
        SELECT a.doc_id AS id_inner, b.doc_id AS id_outer,
               len(list_intersect(a.sh, b.sh)) * 1.0 / len(a.sh) AS containment
        FROM ne a JOIN ne b ON a.doc_id <> b.doc_id
    )
    SELECT id_inner, id_outer, round(containment, 4) AS containment
    FROM p WHERE containment >= 0.8
    ORDER BY id_inner, id_outer
    """,
    "asymmetric CONTAINMENT join |A-intersect-B| / |A| >= 0.8 — the "
    "quote/boilerplate detector Jaccard misses (a paragraph quoted in "
    "a much larger page has tiny Jaccard, containment ~1). One-sided "
    "prefix bound: only the inner side's rarest-shingle prefix joins, "
    "against all outer shingles, plus the |B| >= t|A| size bound; "
    "exact verify after. Oracle is the brute-force double-direction "
    "cross join of the same semantics — the hash-match proves the "
    "one-sided pruning lossless",
)
def containment_doc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.containment_pairs(docs, "doc_id", "text", threshold=0.8, shingle_k=3)
    return (
        pairs.select(
            F.col("id_inner"),
            F.col("id_outer"),
            F.round("containment", 4).alias("containment"),
        )
        .orderBy("id_inner", "id_outer")
    )


#: Deterministic user sample for the sketch-overlap audit: md5 first two
#: hex chars < 0x40 → p = 64/256 = 1/4, bit-identical in DuckDB via
#: ('0x'||substr(md5(...),1,2))::UBIGINT. At 100 TB the threshold drops
#: (e.g. < 1 → p = 1/256) — the audit cost scales with p², the estimate
#: cost not at all.
_OVERLAP_SAMPLE_THRESHOLD = 64
_OVERLAP_SAMPLE_P = _OVERLAP_SAMPLE_THRESHOLD / 256.0
#: Below this many sampled users the binomial error swamps any sketch
#: signal — the audit abstains (trivially true) rather than flapping.
_OVERLAP_MIN_SAMPLE = 30


@_register(
    "hll_user_overlap_estimate",
    f"""
    WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
    ds AS (
        SELECT * FROM du
        WHERE ('0x' || substr(md5(user_id::VARCHAR), 1, 2))::UBIGINT
              < {_OVERLAP_SAMPLE_THRESHOLD}
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           count(*) AS n_overlap_sampled,
           TRUE AS overlap_ok
    FROM ds a JOIN ds b ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
    ORDER BY type_a, type_b
    """,
    "audience-overlap estimation from sketches alone: per event-type "
    "pair, |A-intersect-B| estimated by inclusion-exclusion over HLL "
    "sketches (est_A + est_B - est(A union B), the union via hll_union "
    "on the two binary sketches). THE pre-aggregated-audience pattern: "
    "at 100 TB the per-segment sketches are tiny persisted artifacts "
    "and ANY pairwise overlap is answered WITHOUT rejoining the fact. "
    "The audit side never touches the full fact either — a "
    "deterministic md5 hash-sample of users (p=1/4 here, smaller at "
    "scale) bounds the exact pairwise join to the sample, and the "
    "contract abstains below 30 sampled users where binomial noise "
    "swamps the sketch signal. Sketch values are engine-specific, so "
    "the hash-checked columns are the portable sampled overlap and the "
    "error-bound boolean (the approx_distinct_users convention); "
    "hll_user_overlap_audit is the full-exact variant",
)
def hll_user_overlap_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    sk = ev.groupBy("event_type").agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
    a = sk.select(F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a"))
    b = sk.select(F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b"))
    est = (
        F.expr("hll_sketch_estimate(sk_a)")
        + F.expr("hll_sketch_estimate(sk_b)")
        - F.expr("hll_sketch_estimate(hll_union(sk_a, sk_b))")
    )
    # deterministic, engine-portable user sample: the exact join runs on
    # p of the users, never the full audience
    ds = (
        ev.filter(
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 2), 16, 10)
            .cast("bigint")
            < _OVERLAP_SAMPLE_THRESHOLD
        )
        .distinct()
    )
    sampled = (
        ds.alias("x")
        .join(ds.alias("y"), "user_id")
        .filter(F.col("x.event_type") < F.col("y.event_type"))
        .groupBy(
            F.col("x.event_type").alias("type_a"), F.col("y.event_type").alias("type_b")
        )
        .agg(F.count("*").alias("n_overlap_sampled"))
    )
    pairs = (
        a.crossJoin(b)
        .filter(F.col("type_a") < F.col("type_b"))
        .withColumn("est_overlap", est)
    )
    scaled = F.col("n_overlap_sampled") / F.lit(_OVERLAP_SAMPLE_P)
    return (
        pairs.join(sampled, ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            "n_overlap_sampled",
            (
                (F.col("n_overlap_sampled") < _OVERLAP_MIN_SAMPLE)
                | (F.abs(F.col("est_overlap") - scaled) <= 0.30 * scaled)
            ).alias("overlap_ok"),
        )
        .orderBy("type_a", "type_b")
    )


@_register(
    "hll_user_overlap_audit",
    """
    WITH du AS (SELECT DISTINCT event_type, user_id FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           count(DISTINCT a.user_id) AS n_overlap_exact,
           TRUE AS overlap_ok
    FROM du a JOIN du b ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
    ORDER BY type_a, type_b
    """,
    "AUDIT variant of hll_user_overlap_estimate: the exact pairwise "
    "user-overlap self-join, checked against the sketch estimate within "
    "10%. Deliberately NOT the production path — the exact join "
    "re-shuffles the full distinct (segment, user) stream and is the "
    "one query here that must not run at 100 TB grain; run it on "
    "samples or small segments to calibrate the sketch error bound",
)
def hll_user_overlap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    sk = ev.groupBy("event_type").agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
    a = sk.select(F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a"))
    b = sk.select(F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b"))
    est = (
        F.expr("hll_sketch_estimate(sk_a)")
        + F.expr("hll_sketch_estimate(sk_b)")
        - F.expr("hll_sketch_estimate(hll_union(sk_a, sk_b))")
    )
    du = ev.distinct()
    exact = (
        du.alias("x")
        .join(du.alias("y"), "user_id")
        .filter(F.col("x.event_type") < F.col("y.event_type"))
        .groupBy(
            F.col("x.event_type").alias("type_a"), F.col("y.event_type").alias("type_b")
        )
        .agg(F.countDistinct("user_id").alias("n_overlap_exact"))
    )
    pairs = (
        a.crossJoin(b)
        .filter(F.col("type_a") < F.col("type_b"))
        .withColumn("est_overlap", est)
    )
    return (
        pairs.join(exact, ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            "n_overlap_exact",
            (
                F.abs(F.col("est_overlap") - F.col("n_overlap_exact"))
                <= 0.10 * F.col("n_overlap_exact")
            ).alias("overlap_ok"),
        )
        .orderBy("type_a", "type_b")
    )


@_register(
    "leakage_safe_split",
    f"""
    WITH RECURSIVE
    sigs AS (
        SELECT doc_id,
               {_d_minhash(0)} AS mh0, {_d_minhash(1)} AS mh1,
               {_d_minhash(2)} AS mh2, {_d_minhash(3)} AS mh3,
               {_d_minhash(4)} AS mh4, {_d_minhash(5)} AS mh5,
               {_d_minhash(6)} AS mh6, {_d_minhash(7)} AS mh7
        FROM (SELECT doc_id, {_D_SHINGLES} AS sh FROM documents)
    ),
    bands AS (
        SELECT doc_id, 0 AS band, concat_ws('|', mh0, mh1) AS sig FROM sigs
        UNION ALL SELECT doc_id, 1, concat_ws('|', mh2, mh3) FROM sigs
        UNION ALL SELECT doc_id, 2, concat_ws('|', mh4, mh5) FROM sigs
        UNION ALL SELECT doc_id, 3, concat_ws('|', mh6, mh7) FROM sigs
    ),
    filt AS (SELECT * FROM bands WHERE sig IS NOT NULL AND sig <> ''),
    pairs AS (
        SELECT DISTINCT a.doc_id AS pa, b.doc_id AS pb
        FROM filt a JOIN filt b ON a.band = b.band AND a.sig = b.sig
                                AND a.doc_id < b.doc_id
    ),
    edges AS (SELECT pa AS s, pb AS d FROM pairs UNION ALL SELECT pb, pa FROM pairs),
    nodes AS (SELECT DISTINCT s AS node FROM edges),
    reach(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.d, r.label FROM reach r JOIN edges e ON r.node = e.s
    ),
    labels AS (SELECT node, min(label) AS cluster_id FROM reach GROUP BY node)
    SELECT d.doc_id,
           coalesce(l.cluster_id, d.doc_id) AS cluster_id,
           CASE WHEN substr(md5(CAST(coalesce(l.cluster_id, d.doc_id) AS VARCHAR)),
                            1, 1) BETWEEN '0' AND 'b' THEN 'train'
                WHEN substr(md5(CAST(coalesce(l.cluster_id, d.doc_id) AS VARCHAR)),
                            1, 1) IN ('c', 'd') THEN 'val'
                ELSE 'test' END AS split
    FROM documents d LEFT JOIN labels l ON d.doc_id = l.node
    ORDER BY d.doc_id
    """,
    "LEAKAGE-SAFE train/val/test split: hash-splitting on doc_id lets "
    "near-duplicates straddle train and test (silent eval "
    "contamination); here the split key is the near-dup CLUSTER id "
    "(LSH pairs -> connected components; singletons are their own "
    "cluster), so every near-dup family lands in ONE split by "
    "construction. The per-doc hash split (hash_split_documents) and "
    "the dedup pipeline compose into eval hygiene — same "
    "deterministic md5 split thresholds, same 12/2/2 ratios",
)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.lsh_candidate_pairs(docs, "doc_id", "text")
    labels = dedup.connected_components(pairs, "doc_id_a", "doc_id_b").select(
        F.col("node").alias("doc_id"), F.col("label").alias("cl")
    )
    joined = docs.select("doc_id").join(labels, "doc_id", "left")
    cid = F.coalesce(F.col("cl"), F.col("doc_id"))
    first_hex = F.substring(F.md5(cid.cast("string")), 1, 1)
    split = (
        F.when(first_hex.between("0", "b"), "train")
        .when(first_hex.isin("c", "d"), "val")
        .otherwise("test")
    )
    return joined.select(
        "doc_id", cid.alias("cluster_id"), split.alias("split")
    ).orderBy("doc_id")


@_register(
    "price_distribution_psi",
    """
    WITH binned AS (
        SELECT CASE WHEN year(CAST(o_orderdate AS DATE)) <= 1997
                    THEN 'baseline' ELSE 'current' END AS period,
               least(CAST(floor(o_totalprice / 50000) AS INT), 9) AS bin
        FROM orders
    ),
    counts AS (
        SELECT period, bin, count(*) AS n FROM binned GROUP BY period, bin
    ),
    totals AS (
        SELECT period, sum(n) AS tot FROM counts GROUP BY period
    ),
    fracs AS (
        SELECT c.bin,
               max(CASE WHEN c.period = 'baseline'
                        THEN (c.n + 0.5) / (t.tot + 5.0) END) AS p_base,
               max(CASE WHEN c.period = 'current'
                        THEN (c.n + 0.5) / (t.tot + 5.0) END) AS p_curr
        FROM counts c JOIN totals t USING (period)
        GROUP BY c.bin
    ),
    tw AS (
        SELECT max(CASE WHEN period = 'baseline' THEN tot END) AS tot_base,
               max(CASE WHEN period = 'current'  THEN tot END) AS tot_curr
        FROM totals
    ),
    contrib AS (
        SELECT bin,
               coalesce(p_base, 0.5 / (tot_base + 5.0)) AS pb,
               coalesce(p_curr, 0.5 / (tot_curr + 5.0)) AS pc
        FROM fracs, tw
    )
    SELECT bin,
           round(pb, 6) AS p_baseline,
           round(pc, 6) AS p_current,
           round((pc - pb) * ln(pc / pb), 6) + 0.0 AS psi_contribution
    FROM contrib
    ORDER BY bin
    """,
    "population stability index (PSI) — the standard drift metric "
    "between a baseline and a current snapshot: fixed-width price "
    "bins, smoothed bin fractions ((n+0.5)/(N+5) Laplace smoothing so "
    "empty bins stay finite), per-bin (p_c - p_b)*ln(p_c/p_b) "
    "contributions. PSI > 0.2 on any feature gates a retrain/"
    "re-ingest. Two partial-aggregable passes over one scan (period "
    "tag is a map-side CASE); the bin matrix is tiny thereafter",
)
def price_distribution_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    period = F.when(
        F.year(F.col("o_orderdate").cast("date")) <= 1997, "baseline"
    ).otherwise("current")
    bin_ = F.least(F.floor(F.col("o_totalprice") / 50000).cast("int"), F.lit(9))
    # counts feeds BOTH the totals rollup and the fraction join — the
    # barrier materializes the tiny (period x bin) matrix once so the
    # orders scan runs once, not per consumer
    counts = (
        o.select(period.alias("period"), bin_.alias("bin"))
        .groupBy("period", "bin")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=False)
    )
    totals = counts.groupBy("period").agg(F.sum("n").alias("tot"))
    fr = (F.col("n") + 0.5) / (F.col("tot") + 5.0)
    fracs = (
        counts.join(totals, "period")
        .groupBy("bin")
        .agg(
            F.max(F.when(F.col("period") == "baseline", fr)).alias("p_base"),
            F.max(F.when(F.col("period") == "current", fr)).alias("p_curr"),
        )
    )
    # an absent bin gets the true Laplace floor 0.5/(N_period+5), not a
    # population-blind constant — the 1-row period-totals matrix
    # broadcasts onto the bin rows
    totals_wide = totals.agg(
        F.max(F.when(F.col("period") == "baseline", F.col("tot"))).alias("tot_base"),
        F.max(F.when(F.col("period") == "current", F.col("tot"))).alias("tot_curr"),
    )
    fracs = fracs.crossJoin(F.broadcast(totals_wide))
    pb = F.coalesce(F.col("p_base"), 0.5 / (F.col("tot_base") + 5.0))
    pc = F.coalesce(F.col("p_curr"), 0.5 / (F.col("tot_curr") + 5.0))
    return (
        fracs.select(
            "bin",
            F.round(pb, 6).alias("p_baseline"),
            F.round(pc, 6).alias("p_current"),
            (F.round((pc - pb) * F.log(pc / pb), 6) + F.lit(0.0)).alias(
                "psi_contribution"
            ),
        )
        .orderBy("bin")
    )


@_register(
    "timed_conversion_rate",
    """
    WITH signups AS (
        SELECT user_id, min(ts) AS t_signup
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    converted AS (
        SELECT s.user_id, s.t_signup,
               min(e.ts) AS t_purchase
        FROM signups s JOIN events e
          ON e.user_id = s.user_id
         AND e.event_type = 'purchase'
         AND e.ts >= s.t_signup
         AND e.ts <= s.t_signup + INTERVAL 7 DAY
        GROUP BY s.user_id, s.t_signup
    )
    SELECT CAST(s.t_signup AS DATE) AS signup_date,
           count(*) AS n_signups,
           CAST(count(c.user_id) AS BIGINT) AS n_converted_7d,
           round(count(c.user_id) * 1.0 / count(*), 4) AS conversion_rate,
           round(avg((epoch_us(c.t_purchase) - epoch_us(c.t_signup)) / 1e6), 1)
               AS avg_seconds_to_convert
    FROM signups s LEFT JOIN converted c USING (user_id)
    GROUP BY signup_date
    ORDER BY signup_date
    """,
    "TIMED funnel conversion: signup -> purchase counts only within a "
    "7-day window after each user's first signup (funnel_conversion's "
    "untimed first-touch form overstates conversion). Per-user firsts "
    "are one user-keyed agg; the window predicate rides the user "
    "equi-join (the events_before_purchase range-join shape); the "
    "epoch-seconds average pins identical timestamp arithmetic in "
    "both engines. Cohorted by signup date with rate and "
    "time-to-convert — the funnel health dashboard row",
)
def timed_conversion_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("t_p")
    )
    converted = (
        signups.join(purchases, "user_id")
        .filter(
            (F.col("t_p") >= F.col("t_signup"))
            & (F.col("t_p") <= F.col("t_signup") + F.expr("INTERVAL 7 DAY"))
        )
        .groupBy("user_id", "t_signup")
        .agg(F.min("t_p").alias("t_purchase"))
        .select("user_id", "t_purchase")
    )
    joined = signups.join(converted, "user_id", "left")
    secs = (F.unix_micros("t_purchase") - F.unix_micros("t_signup")) / 1e6
    return (
        joined.groupBy(F.col("t_signup").cast("date").alias("signup_date"))
        .agg(
            F.count("*").alias("n_signups"),
            F.count("t_purchase").cast("bigint").alias("n_converted_7d"),
            F.round(F.count("t_purchase") * 1.0 / F.count("*"), 4).alias(
                "conversion_rate"
            ),
            F.round(F.avg(secs), 1).alias("avg_seconds_to_convert"),
        )
        .orderBy("signup_date")
    )


@_register(
    "streaming_session_rollup_live",
    None,  # stateful streaming (merging session windows) — rows-only;
    # tests prove batch == streaming session semantics
    "LIVE streaming session windows (SURVEY §2.9 extension): "
    "file-source stream -> 10-min watermark -> dynamic-gap "
    "session_window per user -> per-session count/sum, driven to "
    "completion through a memory sink in complete mode. Session "
    "windows MERGE as events arrive — state the watermark bounds and "
    "evicts; the batch twin (sessionize / session_rollup tests) "
    "carries the value checks, this entry proves the incremental "
    "execution path end-to-end",
)
def streaming_session_rollup_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    from covid19_etl_pipeline_spark.streaming.daily_rollup import (
        read_events_stream,
        run_to_memory_sink,
    )
    from covid19_etl_pipeline_spark.streaming.stateful import streaming_session_rollup

    staging = _staged_events_dir(spark, sf_dir)
    rollup = streaming_session_rollup(read_events_stream(spark, staging, 8))
    run_to_memory_sink(rollup, "streaming_session_rollup_live")
    return spark.table("streaming_session_rollup_live").orderBy(
        "user_id", "session_start"
    )


@_register(
    "scd2_point_in_time_lookup",
    """
    WITH h AS (
        SELECT o_custkey,
               CAST(o_orderdate AS DATE) AS order_date,
               CAST(least(floor(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) / 250000), 5) AS INT)
                   AS tier
        FROM orders
    ),
    changes AS (
        SELECT o_custkey, order_date, tier,
               lag(tier) OVER (PARTITION BY o_custkey
                               ORDER BY order_date, tier) AS prev_tier
        FROM h
    ),
    versions AS (
        SELECT o_custkey, tier, order_date AS valid_from,
               lead(order_date) OVER (PARTITION BY o_custkey
                                      ORDER BY order_date, tier) AS valid_to
        FROM changes
        WHERE prev_tier IS NULL OR tier <> prev_tier
    )
    SELECT o.o_orderkey, o.o_custkey,
           CAST(o.o_orderdate AS DATE) AS order_date,
           v.tier AS tier_at_order
    FROM orders o JOIN versions v
      ON o.o_custkey = v.o_custkey
     AND CAST(o.o_orderdate AS DATE) >= v.valid_from
     AND (v.valid_to IS NULL OR CAST(o.o_orderdate AS DATE) < v.valid_to)
    WHERE year(CAST(o.o_orderdate AS DATE)) = 1996
    ORDER BY o.o_orderkey
    """,
    "SCD2 POINT-IN-TIME lookup — the feature-store join half of the "
    "versioned-dimension story (scd2_customer_tiers is the build "
    "half): each 1996 order joined to the customer-tier version valid "
    "AT ITS DATE via equi key + half-open interval residual "
    "[valid_from, valid_to). Zero-width versions (two tier bumps on "
    "one date) are excluded by the strict upper bound, so every order "
    "matches exactly one version — the training-time leak-free "
    "feature join (no future tier leaks into a past order). Same "
    "custkey partitioning serves the build windows AND the lookup "
    "join",
)
def scd2_point_in_time_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    versions = REGISTRY["scd2_customer_tiers"].fn(spark, sf_dir).select(
        F.col("o_custkey").alias("v_custkey"), "tier", "valid_from", "valid_to"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.col("o_orderdate").cast("date").alias("order_date")
    ).filter(F.year("order_date") == 1996)
    j = o.join(
        versions,
        (o.o_custkey == versions.v_custkey)
        & (F.col("order_date") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("order_date") < F.col("valid_to"))),
    )
    return j.select(
        "o_orderkey", "o_custkey", "order_date", F.col("tier").alias("tier_at_order")
    ).orderBy("o_orderkey")


@_register(
    "event_path_funnel_users",
    """
    WITH seq AS (
        SELECT user_id,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(regexp_split_to_array(path, '>')) AS INT) AS n_events,
           regexp_matches(path, 'signup.*click.*purchase') AS did_funnel_path
    FROM seq
    ORDER BY user_id
    """,
    "complex-event path matching: each user's time-ordered event-type "
    "sequence serialized to one string (deterministic (ts, event_id) "
    "order inside the aggregate), then the funnel pattern "
    "signup-then-click-then-purchase matched as an RE2-safe regex — "
    "CEP subsequence detection without a self-join per stage (the "
    "N-stage generalization of funnel_conversion's conditional-min "
    "pairs). One user-keyed shuffle; per-user state is the path "
    "string, bounded by events-per-user",
)
def event_path_funnel_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("event_type")))
    )
    path = F.array_join(F.transform(ordered, lambda s: s["event_type"]), ">")
    seq = ev.groupBy("user_id").agg(path.alias("path"))
    return seq.select(
        "user_id",
        F.size(F.split("path", ">")).cast("int").alias("n_events"),
        F.col("path").rlike("signup.*click.*purchase").alias("did_funnel_path"),
    ).orderBy("user_id")


@_register(
    "brand_affinity_lift",
    """
    WITH ob AS (
        SELECT DISTINCT l.l_orderkey, p.p_brand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n_orders AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n FROM ob),
    brand_f AS (SELECT p_brand, count(*) AS n_b FROM ob GROUP BY p_brand),
    pair_f AS (
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS n_ab
        FROM ob a JOIN ob b
          ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        GROUP BY a.p_brand, b.p_brand
    )
    SELECT p.brand_a, p.brand_b, CAST(p.n_ab AS BIGINT) AS n_cooccur,
           round((p.n_ab / n.n) / ((fa.n_b / n.n) * (fb.n_b / n.n)), 4) AS lift
    FROM pair_f p
    JOIN brand_f fa ON fa.p_brand = p.brand_a
    JOIN brand_f fb ON fb.p_brand = p.brand_b
    CROSS JOIN n_orders n
    WHERE p.n_ab >= 20
    ORDER BY lift DESC, brand_a, brand_b
    LIMIT 25
    """,
    "market-basket affinity: brand pairs co-occurring in one order, "
    "scored by lift P(a,b)/(P(a)P(b)) — the co-purchase signal behind "
    "recommendations and assortment planning. The pair join is keyed "
    "on the ORDER (fan-out bounded by lines-per-order, never brand x "
    "brand over the catalog); brand marginals and the order total are "
    "tiny broadcast rollups; a min-support gate (n>=20) cuts noise "
    "pairs before ranking — the Apriori support-pruning idea in one "
    "SQL-shaped pass",
)
def brand_affinity_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
        .localCheckpoint(eager=False)  # feeds marginals, the total, AND both pair-join sides
    )
    n_total = ob.select("l_orderkey").distinct().count()
    brand_f = ob.groupBy("p_brand").agg(F.count("*").alias("n_b"))
    a, b = ob.alias("a"), ob.alias("b")
    pair_f = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"), F.col("b.p_brand").alias("brand_b")
        )
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= 20)
    )
    fa = brand_f.select(F.col("p_brand").alias("brand_a"), F.col("n_b").alias("n_a"))
    fb = brand_f.select(F.col("p_brand").alias("brand_b"), F.col("n_b").alias("n_bb"))
    n = float(n_total)
    lift = (F.col("n_ab") / n) / ((F.col("n_a") / n) * (F.col("n_bb") / n))
    return (
        pair_f.join(F.broadcast(fa), "brand_a")
        .join(F.broadcast(fb), "brand_b")
        .select(
            "brand_a",
            "brand_b",
            F.col("n_ab").cast("bigint").alias("n_cooccur"),
            F.round(lift, 4).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "brand_a", "brand_b")
        .limit(25)
    )


@_register(
    "rolling_corr_activity_value",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS event_date,
               CAST(count(*) AS DOUBLE) AS n_events,
               avg(value) AS avg_value
        FROM events WHERE value IS NOT NULL
        GROUP BY event_type, event_date
    )
    SELECT event_type, event_date,
           round(corr(n_events, avg_value) OVER (
               PARTITION BY event_type ORDER BY event_date
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) + 0.0
               AS corr_7d
    FROM daily
    ORDER BY event_type, event_date
    """,
    "rolling 7-day correlation between activity volume and mean value "
    "per event type — the windowed co-movement diagnostic (is heavier "
    "traffic cheaper or pricier this week?): a 2-variable moment "
    "aggregate over a bounded ROWS frame, W1's moving-average shape "
    "generalized from avg to corr. The window runs on the day-grain "
    "rollup (tiny), partitioned by type; the fact contributes one "
    "partial-aggregable pass",
)
def rolling_corr_activity_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("event_date"))
        .agg(
            F.count("*").cast("double").alias("n_events"),
            F.avg("value").alias("avg_value"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_date")
        .rowsBetween(-6, 0)
    )
    # ANSI mode makes corr() error on zero-variance frames (single-row
    # or constant series) where SQL semantics want NULL — state corr as
    # guarded moment ratios instead (pop/sample factors cancel, so this
    # equals the oracle's sample corr on non-degenerate frames)
    sx = F.stddev_pop("n_events").over(w)
    sy = F.stddev_pop("avg_value").over(w)
    cxy = F.covar_pop("n_events", "avg_value").over(w)
    corr = F.when((sx > 0) & (sy > 0), cxy / (sx * sy))
    return daily.select(
        "event_type",
        "event_date",
        (F.round(corr, 4) + F.lit(0.0)).alias("corr_7d"),
    ).orderBy("event_type", "event_date")


@_register(
    "customer_revenue_gini",
    """
    WITH rev AS (
        SELECT o_custkey, sum(o_totalprice) AS r FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT r, row_number() OVER (ORDER BY r, o_custkey) AS i FROM rev
    )
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(r), 4) AS total_revenue,
           round(2.0 * sum(i * r) / (count(*) * sum(r))
                 - (count(*) + 1.0) / count(*), 6) AS gini
    FROM ranked
    """,
    "revenue concentration as a Gini coefficient: per-customer revenue "
    "rollup, rank-weighted Lorenz sum 2*sum(i*x)/(n*sum(x)) - (n+1)/n "
    "with a unique (revenue, custkey) rank order for determinism. The "
    "single-number inequality audit behind 'top 1% of customers drive "
    "X%' — one entity rollup + one rank window over the rollup + one "
    "grand aggregate; the fact is scanned once. At 100 TB swap the "
    "exact rank for an equi-depth histogram approximation of the "
    "Lorenz curve",
)
def customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("r"))
    ranked = rev.select(
        "r", F.row_number().over(Window.orderBy("r", "o_custkey")).alias("i")
    )
    n = F.count("*")
    gini = 2.0 * F.sum(F.col("i") * F.col("r")) / (n * F.sum("r")) - (n + 1.0) / n
    return ranked.agg(
        n.cast("bigint").alias("n_customers"),
        F.round(F.sum("r"), 4).alias("total_revenue"),
        F.round(gini, 6).alias("gini"),
    )


@_register(
    "longest_daily_streak",
    """
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    grp AS (
        SELECT user_id, d,
               d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                        AS INT) AS g
        FROM days
    ),
    runs AS (
        SELECT user_id, g, count(*) AS run_len, min(d) AS run_start
        FROM grp GROUP BY user_id, g
    )
    SELECT user_id,
           CAST(max(run_len) AS INT) AS longest_streak_days,
           min(run_start) FILTER (run_len = max_len) AS first_longest_start
    FROM (SELECT *, max(run_len) OVER (PARTITION BY user_id) AS max_len FROM runs)
    GROUP BY user_id
    ORDER BY user_id
    """,
    "gaps-and-islands: longest consecutive-active-day streak per user "
    "via the date-minus-rank idiom (consecutive days share the "
    "constant d - row_number group key — no self-join, no recursive "
    "walk). Engagement-streak analytics in two user-partitioned "
    "windows + two rollups, all on the distinct (user, day) grain; "
    "ties on streak length resolve to the earliest start",
)
def longest_daily_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("d")).cast("int")
    grp = days.select("user_id", "d", F.date_sub(F.col("d"), rn).alias("g"))
    runs = grp.groupBy("user_id", "g").agg(
        F.count("*").alias("run_len"), F.min("d").alias("run_start")
    )
    w = Window.partitionBy("user_id")
    runs2 = runs.withColumn("max_len", F.max("run_len").over(w))
    return (
        runs2.groupBy("user_id")
        .agg(
            F.max("run_len").cast("int").alias("longest_streak_days"),
            F.min(F.when(F.col("run_len") == F.col("max_len"), F.col("run_start"))).alias(
                "first_longest_start"
            ),
        )
        .orderBy("user_id")
    )


@_register(
    "lead_time_percentiles",
    """
    WITH lt AS (
        SELECT o.o_orderpriority,
               datediff('day', CAST(o.o_orderdate AS DATE),
                        CAST(l.l_shipdate AS DATE)) AS lead_days
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(quantile_cont(lead_days, 0.50), 4) AS p50_days,
           round(quantile_cont(lead_days, 0.90), 4) AS p90_days,
           round(quantile_cont(lead_days, 0.99), 4) AS p99_days,
           CAST(max(lead_days) AS INT) AS max_days
    FROM lt
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    "operational-latency SLO profile: order-to-ship lead time in days "
    "per priority class with exact p50/p90/p99 tails (linear "
    "interpolation, matching DuckDB quantile_cont) — the "
    "fulfillment-latency twin of a service's latency dashboard, and "
    "the per-group percentile shape every SLO report needs. One "
    "fact-fact join + one grouped percentile pass; at 100 TB exact "
    "percentiles swap for percentile_approx (approx_percentile_check "
    "pins that error contract)",
)
def lead_time_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.col("o_orderdate").cast("date").alias("od")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("sd")
    )
    lt = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority", F.datediff("sd", "od").alias("lead_days")
    )
    return (
        lt.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.round(F.expr("percentile(lead_days, 0.50)"), 4).alias("p50_days"),
            F.round(F.expr("percentile(lead_days, 0.90)"), 4).alias("p90_days"),
            F.round(F.expr("percentile(lead_days, 0.99)"), 4).alias("p99_days"),
            F.max("lead_days").cast("int").alias("max_days"),
        )
        .orderBy("o_orderpriority")
    )


@_register(
    "windowed_funnel_conversion",
    """
    WITH s1 AS (
        SELECT user_id, min(ts) AS t1
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = 'click'
          AND e.ts >= s1.t1 AND e.ts <= s1.t1 + INTERVAL 7 DAY
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e
        JOIN s1 USING (user_id) JOIN s2 USING (user_id)
        WHERE e.event_type = 'purchase'
          AND e.ts >= s2.t2 AND e.ts <= s1.t1 + INTERVAL 7 DAY
        GROUP BY e.user_id
    ),
    staged AS (
        SELECT s1.user_id,
               CASE WHEN s3.user_id IS NOT NULL THEN 3
                    WHEN s2.user_id IS NOT NULL THEN 2
                    ELSE 1 END AS funnel_step
        FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
    )
    SELECT funnel_step, count(*) AS n_users
    FROM staged GROUP BY funnel_step ORDER BY funnel_step
    """,
    "ordered multi-step windowed funnel (the ClickHouse windowFunnel "
    "shape): signup -> click -> purchase must occur IN ORDER inside a "
    "7-day window anchored at the first signup; per-user max step "
    "reached, rolled up to step counts. Each step is a min-aggregate "
    "join against the previous step's anchor — at 100 TB every stage "
    "shuffles on user_id, so all three stages co-partition and AQE "
    "plans them as one exchange reuse; no window-function state, no "
    "per-user event array materialization",
)
def windowed_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(
            (F.col("ts") >= F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 7 DAY"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s1, "user_id")
        .join(s2, "user_id")
        .filter(
            (F.col("ts") >= F.col("t2"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 7 DAY"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    staged = (
        s1.join(s2.select("user_id", F.lit(2).alias("st2")), "user_id", "left")
        .join(s3.select("user_id", F.lit(3).alias("st3")), "user_id", "left")
        .select(
            F.coalesce(F.col("st3"), F.col("st2"), F.lit(1)).alias("funnel_step")
        )
    )
    return (
        staged.groupBy("funnel_step")
        .agg(F.count("*").alias("n_users"))
        .orderBy("funnel_step")
    )


@_register(
    "cohort_retention_matrix",
    """
    WITH firsts AS (
        SELECT user_id,
               CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               CAST(date_diff('day', f.cohort_week,
                    CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS INT)
                   AS week_offset
        FROM events e JOIN firsts f USING (user_id)
    ),
    sizes AS (
        SELECT cohort_week, count(*) AS cohort_size
        FROM firsts GROUP BY cohort_week
    )
    SELECT a.cohort_week, a.week_offset,
           count(*) AS n_active,
           round(count(*) * 1.0 / max(s.cohort_size), 4) AS retention
    FROM activity a JOIN sizes s USING (cohort_week)
    GROUP BY a.cohort_week, a.week_offset
    ORDER BY cohort_week, week_offset
    """,
    "cohort retention matrix — the product-analytics staple: users "
    "bucketed by first-activity week, per (cohort, week-offset) active "
    "share. Plan: one shuffle on user_id builds first-touch, the "
    "distinct (user, offset) grid rides the same partitioning, and the "
    "cohort-size join is a broadcast (cohort count ~ weeks, tiny). At "
    "100 TB the distinct is the heavy stage and is exactly "
    "partial-aggregable; no windows, no skew (weeks are uniform)",
)
def cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")).cast("date"), F.col("cohort_week"))
                / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .distinct()
    )
    sizes = firsts.groupBy("cohort_week").agg(F.count("*").alias("cohort_size"))
    return (
        activity.join(F.broadcast(sizes), "cohort_week")
        .groupBy("cohort_week", "week_offset")
        .agg(
            F.count("*").alias("n_active"),
            F.round(F.count("*") / F.max("cohort_size"), 4).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


@_register(
    "user_value_ohlc_daily",
    """
    WITH ranked AS (
        SELECT user_id, CAST(ts AS DATE) AS d, value,
               row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                  ORDER BY epoch_us(ts), event_id) AS rn_open,
               row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                  ORDER BY epoch_us(ts) DESC, event_id DESC)
                   AS rn_close
        FROM events WHERE value IS NOT NULL
    )
    SELECT user_id, d,
           round(max(CASE WHEN rn_open  = 1 THEN value END), 4) AS open,
           round(max(value), 4) AS high,
           round(min(value), 4) AS low,
           round(max(CASE WHEN rn_close = 1 THEN value END), 4) AS close,
           count(*) AS n_ticks
    FROM ranked
    GROUP BY user_id, d
    ORDER BY user_id, d
    """,
    "OHLC bar construction (open/high/low/close per entity-day) — the "
    "time-series downsampling primitive for tick/metric streams: "
    "first/last by the unique (ts, event_id) order plus min/max, in "
    "one grouped pass. Plan: a single shuffle on (user, day); the "
    "open/close selection is two row_number windows SHARING that "
    "partitioning (one sort, Catalyst fuses them), then a plain "
    "partial-aggregable rollup — no self-join against min/max ts",
)
def user_value_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    d = F.col("ts").cast("date")
    w_open = Window.partitionBy("user_id", "d").orderBy(
        F.unix_micros("ts"), "event_id"
    )
    w_close = Window.partitionBy("user_id", "d").orderBy(
        F.unix_micros("ts").desc(), F.col("event_id").desc()
    )
    ranked = ev.select(
        "user_id", d.alias("d"), "value", "ts", "event_id"
    ).withColumns(
        {
            "rn_open": F.row_number().over(w_open),
            "rn_close": F.row_number().over(w_close),
        }
    )
    return (
        ranked.groupBy("user_id", "d")
        .agg(
            F.round(F.max(F.when(F.col("rn_open") == 1, F.col("value"))), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max(F.when(F.col("rn_close") == 1, F.col("value"))), 4).alias("close"),
            F.count("*").alias("n_ticks"),
        )
        .orderBy("user_id", "d")
    )


@_register(
    "nation_trade_triangles",
    """
    WITH raw_edges AS (
        SELECT DISTINCT
               least(cn.n_name, sn.n_name)    AS a,
               greatest(cn.n_name, sn.n_name) AS b
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey  = c.c_custkey
        JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
        JOIN supplier s ON l.l_suppkey  = s.s_suppkey
        JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
        WHERE cn.n_name <> sn.n_name
    ),
    tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM raw_edges e1
        JOIN raw_edges e2 ON e2.a = e1.b
        JOIN raw_edges e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    members AS (
        SELECT x AS nation FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
    )
    SELECT nation, count(*) AS n_triangles
    FROM members
    GROUP BY nation
    ORDER BY n_triangles DESC, nation
    """,
    "per-node triangle counting on the nation trade graph — the "
    "clustering/community primitive: canonicalize to undirected "
    "(least, greatest) distinct edges, re-orient each edge by "
    "DEGREE-ordered rank (graph.orient_by_degree — lower (deg, id) "
    "endpoint first), enumerate oriented triangles via two "
    "equi-joins (a strict total order, so every triangle is produced "
    "exactly once), then count per member. Degree orientation is the "
    "100 TB skew defense: a hub node sits on the probe side of "
    "(almost) all its edges, capping join fan-out by arboricity "
    "~O(sqrt(|E|)) instead of the hub degree; orientation is purely "
    "physical, so the result (and oracle hash, which uses the "
    "lexicographic orientation) is identical. The edge list itself "
    "is the deduped distinct, never the fact",
)
def nation_trade_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .select(
            F.least("cust_nation", "supp_nation").alias("a"),
            F.greatest("cust_nation", "supp_nation").alias("b"),
        )
        .distinct()
    )
    edges = (
        # degree-ordered physical orientation (see description) — then
        # the oriented list is consumed three times by the triangle
        # joins: materialize once (vocabulary-sized, not fact-sized)
        graph.orient_by_degree(edges, "a", "b").localCheckpoint(eager=False)
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(e3, (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")))
        .select(F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z"))
    )
    members = (
        tri.select(F.col("x").alias("nation"))
        .unionAll(tri.select(F.col("y").alias("nation")))
        .unionAll(tri.select(F.col("z").alias("nation")))
    )
    return (
        members.groupBy("nation")
        .agg(F.count("*").alias("n_triangles"))
        .orderBy(F.col("n_triangles").desc(), "nation")
    )


@_register(
    "embedding_dimension_whitening",
    """
    WITH flat AS (
        SELECT vec_id,
               generate_subscripts(embedding, 1) AS dim,
               CAST(unnest(embedding) AS DOUBLE) AS val
        FROM embeddings
    ),
    stats AS (
        SELECT dim, avg(val) AS mu, stddev_pop(val) AS sigma
        FROM flat GROUP BY dim
    )
    SELECT f.vec_id, f.dim,
           round((f.val - s.mu) / s.sigma, 4) AS z
    FROM flat f JOIN stats s USING (dim)
    WHERE f.vec_id < 10
    ORDER BY f.vec_id, f.dim
    """,
    "per-dimension whitening (z-scoring) of the embedding table — the "
    "feature-normalization pass before ANN indexing or clustering so "
    "no dimension dominates the metric: posexplode to (vec, dim, val), "
    "population mean/std per dimension (64 rows — broadcasts back), "
    "normalize. At 100 TB the explode is map-side only and the stats "
    "rollup is partial-aggregable with a dims-sized result; the final "
    "vec_id<10 slice keeps the oracle surface small while the full "
    "normalized stream is what a pipeline would re-assemble via "
    "array_agg. 1-based dim to match SQL subscripts",
)
def embedding_dimension_whitening(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "valf")
    ).select(
        "vec_id", (F.col("pos") + 1).alias("dim"), F.col("valf").cast("double").alias("val")
    )
    stats = flat.groupBy("dim").agg(
        F.avg("val").alias("mu"), F.stddev_pop("val").alias("sigma")
    )
    return (
        flat.join(F.broadcast(stats), "dim")
        .filter(F.col("vec_id") < 10)
        .select(
            "vec_id",
            "dim",
            F.round((F.col("val") - F.col("mu")) / F.col("sigma"), 4).alias("z"),
        )
        .orderBy("vec_id", "dim")
    )


@_register(
    "join_key_skew_report",
    """
    WITH k AS (
        SELECT l_suppkey, count(*) AS n_lines
        FROM lineitem GROUP BY l_suppkey
    ),
    s AS (SELECT avg(n_lines) AS mean_lines FROM k)
    SELECT k.l_suppkey, k.n_lines,
           round(k.n_lines / s.mean_lines, 4) AS skew_factor
    FROM k, s
    ORDER BY k.n_lines DESC, k.l_suppkey
    LIMIT 10
    """,
    "join-key skew diagnosis — the operational pre-flight before any "
    "big shuffle join: per-key row counts on the join column, top "
    "offenders expressed as a multiple of the mean key load. The "
    "number that decides between a plain shuffle join, salting, or "
    "AQE skew-split. Partial-aggregable rollup + a 1-row broadcast "
    "mean + TakeOrdered(10) — nothing driver-side grows with key "
    "cardinality",
)
def join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    k = li.groupBy("l_suppkey").agg(F.count("*").alias("n_lines"))
    mean_ = k.agg(F.avg("n_lines").alias("mean_lines"))
    return (
        k.crossJoin(F.broadcast(mean_))
        .select(
            "l_suppkey",
            "n_lines",
            F.round(F.col("n_lines") / F.col("mean_lines"), 4).alias("skew_factor"),
        )
        .orderBy(F.col("n_lines").desc(), "l_suppkey")
        .limit(10)
    )


@_register(
    "customers_active_every_quarter",
    """
    WITH q AS (
        SELECT o_custkey,
               quarter(CAST(o_orderdate AS DATE)) AS yq,
               o_totalprice
        FROM orders
        WHERE year(CAST(o_orderdate AS DATE)) = 1995
    ),
    universe AS (SELECT count(DISTINCT yq) AS n_quarters FROM q)
    SELECT o_custkey,
           CAST(count(DISTINCT yq) AS BIGINT) AS quarters_active,
           count(*) AS n_orders,
           round(sum(o_totalprice), 4) AS revenue
    FROM q, universe
    GROUP BY o_custkey, universe.n_quarters
    HAVING count(DISTINCT yq) = universe.n_quarters
    ORDER BY o_custkey
    """,
    "relational DIVISION — 'customers with at least one order in EVERY "
    "quarter of 1995': the classic for-all query SQL can only state "
    "as double-negated NOT EXISTS or, as here, the count-distinct "
    "equality form (distinct periods per customer == period universe). "
    "The count form is the 100 TB shape: one partial-aggregable "
    "countDistinct per customer + a 1-row broadcast universe, vs the "
    "anti-join double negation that shuffles the customer x period "
    "cross space. Consecutive-streak cousin lives in the gaps-and-"
    "islands query; this is exact set coverage",
)
def customers_active_every_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    q = o.filter(F.year(d) == 1995).select(
        "o_custkey",
        F.quarter(d).alias("yq"),
        "o_totalprice",
    )
    universe = q.agg(F.countDistinct("yq").alias("n_quarters"))
    return (
        q.crossJoin(F.broadcast(universe))
        .groupBy("o_custkey", "n_quarters")
        .agg(
            F.countDistinct("yq").alias("quarters_active"),
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
        )
        .filter(F.col("quarters_active") == F.col("n_quarters"))
        .drop("n_quarters")
        .orderBy("o_custkey")
    )


@_register(
    "cusum_changepoint_days",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, sum(value) AS day_total
        FROM events WHERE value IS NOT NULL
        GROUP BY event_type, CAST(ts AS DATE)
    ),
    stats AS (
        SELECT event_type,
               avg(day_total) AS mu,
               stddev_pop(day_total) AS sigma
        FROM daily GROUP BY event_type
    ),
    cusum AS (
        SELECT d.event_type, d.d,
               round(d.day_total, 4) AS day_total,
               round(sum(d.day_total - s.mu) OVER (
                   PARTITION BY d.event_type ORDER BY d.d), 4) + 0.0 AS cusum,
               s.sigma
        FROM daily d JOIN stats s USING (event_type)
    )
    SELECT event_type, d, day_total, cusum,
           abs(cusum) > 3 * sigma AS is_changepoint
    FROM cusum
    ORDER BY event_type, d
    """,
    "CUSUM change-point scan per series: cumulative sum of deviations "
    "from the series mean, flagged where |CUSUM| exceeds 3 sigma — the "
    "classic drift detector for metric streams (PSI's sequential "
    "cousin: PSI compares two snapshots, CUSUM localizes WHEN the "
    "shift happened). Plan: the fact collapses to per-(series, day) "
    "SUMS first (partial-aggregable; sums, not means — a mean's "
    "small-divisor quotient can land exactly on a 4dp half-boundary "
    "where engines' last-bit rounding diverges), the series-stats "
    "join broadcasts, and the running window orders each series by "
    "day — state per series is one partial sum, days-sized, never "
    "fact-sized. The series-final CUSUM is a mathematical zero; "
    "+ 0.0 normalizes its float sign",
)
def cusum_changepoint_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.sum("value").alias("day_total"))
    )
    stats = daily.groupBy("event_type").agg(
        F.avg("day_total").alias("mu"), F.stddev_pop("day_total").alias("sigma")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    cs = (
        daily.join(F.broadcast(stats), "event_type")
        .withColumn(
            "cusum",
            F.round(F.sum(F.col("day_total") - F.col("mu")).over(w), 4) + F.lit(0.0),
        )
    )
    return cs.select(
        "event_type",
        "d",
        F.round("day_total", 4).alias("day_total"),
        "cusum",
        (F.abs(F.col("cusum")) > 3 * F.col("sigma")).alias("is_changepoint"),
    ).orderBy("event_type", "d")


@_register(
    "first_touch_attribution",
    """
    WITH lagged AS (
        SELECT user_id, event_id, event_type, value, epoch_us(ts) AS t_us,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                       ORDER BY epoch_us(ts), event_id) AS prev_us
        FROM events
    ),
    sess AS (
        SELECT user_id, event_id, event_type, value, t_us,
               CAST(sum(CASE WHEN prev_us IS NULL
                              OR t_us - prev_us > 1800000000 THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY t_us, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
                   AS session_id
        FROM lagged
    ),
    tagged AS (
        SELECT user_id, session_id, event_type, value, t_us, event_id,
               first_value(event_type) OVER (
                   PARTITION BY user_id, session_id
                   ORDER BY t_us, event_id) AS entry_channel
        FROM sess
    )
    SELECT entry_channel,
           CAST(count(DISTINCT (user_id, session_id)) AS BIGINT) AS n_sessions,
           count(*) FILTER (event_type = 'purchase') AS n_purchases,
           round(coalesce(sum(value) FILTER (event_type = 'purchase'), 0), 4)
               AS attributed_revenue
    FROM tagged
    GROUP BY entry_channel
    ORDER BY entry_channel
    """,
    "first-touch revenue attribution: 30-min-gap sessions (the "
    "sessionize primitive), each session's ENTRY event type becomes "
    "the acquisition channel, and every purchase inside the session "
    "attributes its value to that channel — the marketing-analytics "
    "join of sessionization + windowed first_value + conditional "
    "rollup. All three windows share the per-user exchange (the "
    "session window's partition keys are a superset), so the fact "
    "shuffles once; the channel rollup is partial-aggregable",
)
def first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t_us = F.unix_micros(F.col("ts"))
    lagged = ev.select(
        "user_id", "event_id", "event_type", "value", t_us.alias("t_us")
    ).withColumn(
        "prev_us",
        F.lag("t_us").over(Window.partitionBy("user_id").orderBy("t_us", "event_id")),
    )
    new_sess = F.when(
        F.col("prev_us").isNull() | (F.col("t_us") - F.col("prev_us") > 1_800_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess = lagged.withColumn(
        "session_id",
        F.sum(new_sess)
        .over(
            Window.partitionBy("user_id")
            .orderBy("t_us", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("int"),
    )
    tagged = sess.withColumn(
        "entry_channel",
        F.first("event_type").over(
            Window.partitionBy("user_id", "session_id").orderBy("t_us", "event_id")
        ),
    )
    is_purchase = F.col("event_type") == "purchase"
    return (
        tagged.groupBy("entry_channel")
        .agg(
            F.countDistinct("user_id", "session_id").alias("n_sessions"),
            F.count(F.when(is_purchase, 1)).alias("n_purchases"),
            F.round(
                F.coalesce(F.sum(F.when(is_purchase, F.col("value"))), F.lit(0.0)), 4
            ).alias("attributed_revenue"),
        )
        .orderBy("entry_channel")
    )


@_register(
    "weighted_median_unit_price",
    """
    WITH pts AS (
        SELECT l_returnflag,
               round(l_extendedprice / l_quantity, 4) AS unit_price,
               l_quantity AS w
        FROM lineitem WHERE l_quantity > 0
    ),
    cum AS (
        SELECT l_returnflag, unit_price, w,
               sum(w) OVER (PARTITION BY l_returnflag
                            ORDER BY unit_price
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cw,
               sum(w) OVER (PARTITION BY l_returnflag) AS tw
        FROM pts
    )
    SELECT l_returnflag,
           round(min(unit_price), 4) AS weighted_median_price,
           round(max(tw), 4) AS total_weight
    FROM cum
    WHERE cw >= tw / 2
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    "WEIGHTED median — the inventory-weighted price statistic plain "
    "percentile cannot express: each line's unit price carries its "
    "quantity as mass; the weighted median is the smallest price whose "
    "cumulative mass reaches half the group total. One partitioned "
    "sort-window builds the cumulative mass (ties collapse by "
    "accumulating equal prices together — deterministic without a "
    "unique tie-break because the FILTER-then-MIN form only reads the "
    "crossing point), then a min-aggregate. At 100 TB: same shape on "
    "pre-binned (price-bucket, mass) rollups — the window runs over "
    "buckets, not lines",
)
def weighted_median_unit_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    pts = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") / F.col("l_quantity"), 4).alias("unit_price"),
        F.col("l_quantity").alias("w"),
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("unit_price")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("l_returnflag")
    cum = pts.withColumns(
        {"cw": F.sum("w").over(w_cum), "tw": F.sum("w").over(w_tot)}
    )
    return (
        cum.filter(F.col("cw") >= F.col("tw") / 2)
        .groupBy("l_returnflag")
        .agg(
            F.round(F.min("unit_price"), 4).alias("weighted_median_price"),
            F.round(F.max("tw"), 4).alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


@_register(
    "open_orders_timeline",
    """
    WITH closes AS (
        SELECT l_orderkey AS o_orderkey,
               CAST(max(l_shipdate) AS DATE) + INTERVAL 1 DAY AS close_d
        FROM lineitem GROUP BY l_orderkey
    ),
    deltas AS (
        SELECT CAST(o_orderdate AS DATE) AS d, 1 AS delta FROM orders
        UNION ALL
        SELECT CAST(c.close_d AS DATE) AS d, -1 AS delta
        FROM closes c JOIN orders o USING (o_orderkey)
    ),
    daily AS (
        SELECT d, sum(delta) AS net FROM deltas GROUP BY d
    )
    SELECT d,
           CAST(sum(net) OVER (ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS open_orders
    FROM daily
    ORDER BY d
    """,
    "sweep-line concurrency: how many orders are OPEN (placed, not yet "
    "fully shipped) on each day — the interval-stabbing problem solved "
    "without an interval join: each order contributes +1 at placement "
    "and -1 the day after its last shipment; per-day net deltas then a "
    "running sum. The O(n log n) sweep replaces the O(n * days) "
    "point-in-interval join. Plan: per-order close rollup rides the "
    "orderkey join; the daily net is partial-aggregable to days-sized "
    "data BEFORE the single ordered window — the 100 TB concurrency "
    "timeline costs one fact shuffle",
)
def open_orders_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    closes = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.date_add(F.max(F.col("l_shipdate").cast("date")), 1).alias("close_d")
    )
    deltas = (
        o.select(F.col("o_orderdate").cast("date").alias("d"), F.lit(1).alias("delta"))
        .unionAll(
            closes.join(o, "o_orderkey").select(
                F.col("close_d").alias("d"), F.lit(-1).alias("delta")
            )
        )
    )
    daily = deltas.groupBy("d").agg(F.sum("delta").alias("net"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "d", F.sum("net").over(w).cast("bigint").alias("open_orders")
    ).orderBy("d")


@_register(
    "bitmap_exact_distinct_users",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           count(*) AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    "EXACT distinct counting from mergeable bitmap partials (Spark's "
    "bitmap_bucket_number / bitmap_bit_position / bitmap_construct_agg "
    "— the RoaringBitmap-style materialization ClickHouse/Delta use): "
    "ids bucket into fixed 32k-bit ranges, each (key, bucket) holds a "
    "bitmap partial, and the exact distinct count is the SUM of "
    "per-bucket bitmap cardinalities. Unlike HLL this path is exact — "
    "the hash check is value equality with count(DISTINCT), no error "
    "contract needed — and unlike count(DISTINCT) the partials are "
    "persistable/re-aggregable artifacts: at 100 TB the per-day "
    "(segment, bucket) bitmaps are stored once and any date-range "
    "exact distinct is a bitmap-OR + popcount away, never a re-scan "
    "of the fact. Both aggregation levels partial-aggregate map-side",
)
def bitmap_exact_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    partials = (
        ev.withColumn("bucket", F.expr("bitmap_bucket_number(user_id)"))
        .groupBy("event_type", "bucket")
        .agg(
            F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm"),
            F.count("*").alias("n_ev"),
        )
    )
    return (
        partials.groupBy("event_type")
        .agg(
            F.sum(F.expr("bitmap_count(bm)")).alias("n_users"),
            F.sum("n_ev").alias("n_events"),
        )
        .orderBy("event_type")
    )


@_register(
    "seasonal_decomposition_daily",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, sum(value) AS y
        FROM events WHERE value IS NOT NULL
        GROUP BY CAST(ts AS DATE)
    ),
    trended AS (
        SELECT d, y,
               CASE WHEN count(*) OVER w = 7
                    THEN avg(y) OVER w END AS trend
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    detrended AS (
        SELECT d, y, trend,
               CAST(dayofweek(d) + 1 AS INT) AS dow,
               y - trend AS resid0
        FROM trended
    ),
    seasonal AS (
        SELECT dow, avg(resid0) AS s
        FROM detrended WHERE resid0 IS NOT NULL GROUP BY dow
    )
    SELECT t.d,
           round(t.y, 4) AS y,
           round(t.trend, 4) AS trend,
           round(s.s, 4) AS seasonal,
           round(t.y - t.trend - s.s, 4) AS residual
    FROM detrended t JOIN seasonal s USING (dow)
    WHERE t.trend IS NOT NULL
    ORDER BY t.d
    """,
    "classical seasonal decomposition (moving-average flavor of STL): "
    "7-day CENTERED moving average as trend (only full windows — "
    "edges yield NULL, excluded like statsmodels does), day-of-week "
    "mean of the detrended series as the seasonal component, rest "
    "residual — the anomaly-detection preprocessor that separates "
    "'weekends are low' from 'this day is wrong'. Plan: the fact "
    "collapses to a days-sized series first; the centered window and "
    "the 7-row seasonal rollup both run on days-sized data (the "
    "documented post-agg global-window pattern); the seasonal table "
    "broadcasts back. DOW normalized to Spark's 1-based convention",
)
def seasonal_decomposition_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.sum("value").alias("y")
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    trended = daily.withColumn(
        "trend", F.when(F.count("*").over(w) == 7, F.avg("y").over(w))
    )
    detrended = trended.withColumns(
        {
            "dow": F.dayofweek("d").cast("int"),
            "resid0": F.col("y") - F.col("trend"),
        }
    )
    seasonal = (
        detrended.filter(F.col("resid0").isNotNull())
        .groupBy("dow")
        .agg(F.avg("resid0").alias("s"))
    )
    return (
        detrended.join(F.broadcast(seasonal), "dow")
        .filter(F.col("trend").isNotNull())
        .select(
            "d",
            F.round("y", 4).alias("y"),
            F.round("trend", 4).alias("trend"),
            F.round("s", 4).alias("seasonal"),
            F.round(F.col("y") - F.col("trend") - F.col("s"), 4).alias("residual"),
        )
        .orderBy("d")
    )


@_register(
    "k_anonymity_audit",
    """
    WITH cells AS (
        SELECT c_mktsegment, c_nationkey, count(*) AS cell_size
        FROM customer
        GROUP BY c_mktsegment, c_nationkey
    )
    SELECT c_mktsegment, c_nationkey, cell_size,
           cell_size < 5 AS violates_k5,
           cell_size < 20 AS small_cell
    FROM cells
    ORDER BY cell_size, c_mktsegment, c_nationkey
    LIMIT 10
    """,
    "k-anonymity audit over quasi-identifier cells — the privacy "
    "pre-flight for releasing or training on user-adjacent tables: "
    "group by the quasi-identifier tuple (segment x nation here), "
    "report the 10 SMALLEST cells with k=5 violation and small-cell "
    "(<20) flags — the bounded worst-offenders view stays non-empty "
    "at every scale (a pure <threshold filter goes vacuous once the "
    "data outgrows the cutoff), and the smallest cells are exactly "
    "what the privacy review reads first. One partial-aggregable "
    "rollup + TakeOrderedAndProject. The remediation (generalize "
    "or suppress small cells) composes with the masking ops in "
    "text_normalize_redact",
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    cells = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count("*").alias("cell_size")
    )
    return (
        cells.select(
            "c_mktsegment",
            "c_nationkey",
            "cell_size",
            (F.col("cell_size") < 5).alias("violates_k5"),
            (F.col("cell_size") < 20).alias("small_cell"),
        )
        .orderBy("cell_size", "c_mktsegment", "c_nationkey")
        .limit(10)
    )


@_register(
    "ab_test_conversion_lift",
    """
    WITH assigned AS (
        SELECT DISTINCT user_id,
               CASE WHEN ('0x' || substr(md5(user_id::VARCHAR), 1, 2))::UBIGINT
                         % 2 = 0
                    THEN 'A' ELSE 'B' END AS variant
        FROM events
    ),
    converted AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ),
    per_variant AS (
        SELECT a.variant,
               count(*) AS n_users,
               CAST(count(c.user_id) AS BIGINT) AS n_converted,
               count(c.user_id) * 1.0 / count(*) AS rate
        FROM assigned a LEFT JOIN converted c USING (user_id)
        GROUP BY a.variant
    ),
    wide AS (
        SELECT max(CASE WHEN variant = 'A' THEN n_users END)     AS na,
               max(CASE WHEN variant = 'A' THEN n_converted END) AS ca,
               max(CASE WHEN variant = 'A' THEN rate END)        AS ra,
               max(CASE WHEN variant = 'B' THEN n_users END)     AS nb,
               max(CASE WHEN variant = 'B' THEN n_converted END) AS cb,
               max(CASE WHEN variant = 'B' THEN rate END)        AS rb
        FROM per_variant
    )
    SELECT p.variant, p.n_users, p.n_converted,
           round(p.rate, 4) AS conversion_rate,
           round(w.rb - w.ra, 4) + 0.0 AS lift_b_minus_a,
           round((w.rb - w.ra) /
                 nullif(sqrt(((w.ca + w.cb) * 1.0 / (w.na + w.nb))
                        * (1 - (w.ca + w.cb) * 1.0 / (w.na + w.nb))
                        * (1.0 / w.na + 1.0 / w.nb)), 0), 4) + 0.0 AS z_score
    FROM per_variant p, wide w
    ORDER BY p.variant
    """,
    "A/B conversion lift with a two-proportion pooled z-statistic: "
    "variant assignment is the deterministic md5 hash-split (how real "
    "experiment frameworks bucket users — reproducible across engines "
    "and runs), conversion = any purchase, and the pooled z-score is "
    "computed from the 2-row per-variant rollup. The experimentation "
    "primitive on top of the engine: one distinct pass for exposure, "
    "one for conversion (both partial-aggregable, co-keyed on "
    "user_id), then pure scalar math on a broadcast 1-row stats "
    "frame. |z| > 1.96 reads as significant at 95%",
)
def ab_test_conversion_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    variant = F.when(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 2), 16, 10)
        .cast("bigint")
        % 2
        == 0,
        "A",
    ).otherwise("B")
    assigned = ev.select("user_id").distinct().withColumn("variant", variant)
    converted = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("is_conv", F.lit(1))
    )
    per_variant = (
        assigned.join(converted, "user_id", "left")
        .groupBy("variant")
        .agg(
            F.count("*").alias("n_users"),
            F.count("is_conv").alias("n_converted"),
            (F.count("is_conv") / F.count("*")).alias("rate"),
        )
    )
    wide = per_variant.agg(
        F.max(F.when(F.col("variant") == "A", F.col("n_users"))).alias("na"),
        F.max(F.when(F.col("variant") == "A", F.col("n_converted"))).alias("ca"),
        F.max(F.when(F.col("variant") == "A", F.col("rate"))).alias("ra"),
        F.max(F.when(F.col("variant") == "B", F.col("n_users"))).alias("nb"),
        F.max(F.when(F.col("variant") == "B", F.col("n_converted"))).alias("cb"),
        F.max(F.when(F.col("variant") == "B", F.col("rate"))).alias("rb"),
    )
    pooled = (F.col("ca") + F.col("cb")) / (F.col("na") + F.col("nb"))
    se = F.sqrt(pooled * (1 - pooled) * (1 / F.col("na") + 1 / F.col("nb")))
    return (
        per_variant.crossJoin(F.broadcast(wide))
        .select(
            "variant",
            "n_users",
            "n_converted",
            F.round("rate", 4).alias("conversion_rate"),
            (F.round(F.col("rb") - F.col("ra"), 4) + F.lit(0.0)).alias("lift_b_minus_a"),
            (
                F.round((F.col("rb") - F.col("ra")) / F.nullif(se, F.lit(0)), 4)
                + F.lit(0.0)
            ).alias("z_score"),
        )
        .orderBy("variant")
    )


@_register(
    "data_quality_report",
    """
    WITH base AS (
        SELECT count(*) AS n,
               sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS v_custkey,
               sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS v_date,
               sum(CASE WHEN o_orderstatus IS NOT NULL
                         AND o_orderstatus NOT IN ('O', 'F', 'P')
                        THEN 1 ELSE 0 END) AS v_status,
               sum(CASE WHEN o_totalprice IS NOT NULL
                         AND (o_totalprice < 0 OR o_totalprice > 1000000)
                        THEN 1 ELSE 0 END) AS v_price,
               count(o_orderkey) - count(DISTINCT o_orderkey) AS v_unique
        FROM orders
    )
    SELECT t.expectation, base.n AS n_rows,
           CAST(t.v AS BIGINT) AS n_violations,
           t.v = 0 AS passed
    FROM base, LATERAL (VALUES
        ('o_custkey_not_null', v_custkey),
        ('o_orderdate_not_null', v_date),
        ('o_orderstatus_in_list', v_status),
        ('o_totalprice_between_0_1000000', v_price),
        ('o_orderkey_unique', v_unique)
    ) AS t(expectation, v)
    ORDER BY expectation
    """,
    "declarative data-quality gate over the orders ingest via the "
    "quality.check_expectations engine: five rules (not-null x2, "
    "domain list, range, key uniqueness) evaluated in ONE aggregate "
    "pass — the reference's re-read-and-scan-per-column validators "
    "(S3/debugdb) collapsed into a single job whose cost is "
    "independent of rule count. The report is rule-count-sized; the "
    "same Expectation list drives quarantine() for the dead-letter "
    "split (tested in tests/test_quality.py)",
)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from covid19_etl_pipeline_spark.quality import (
        Expectation,
        check_expectations,
        expect_between,
        expect_in,
        expect_not_null,
        expect_unique,
    )

    o = load_table(spark, sf_dir, "orders")
    rules = [
        expect_not_null("o_custkey"),
        expect_not_null("o_orderdate"),
        Expectation(
            "o_orderstatus_in_list",
            F.col("o_orderstatus").isNull()
            | F.col("o_orderstatus").isin("O", "F", "P"),
        ),
        Expectation(
            "o_totalprice_between_0_1000000",
            F.col("o_totalprice").isNull()
            | ((F.col("o_totalprice") >= 0) & (F.col("o_totalprice") <= 1000000)),
        ),
        expect_unique("o_orderkey"),
    ]
    return check_expectations(o, rules).orderBy("expectation")


@_register(
    "bfs_shortest_hops",
    """
    WITH RECURSIVE
    edges_raw AS (
        SELECT cn.n_name AS src, sn.n_name AS dst, count(*) AS cnt
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey  = c.c_custkey
        JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
        JOIN supplier s ON l.l_suppkey  = s.s_suppkey
        JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
        WHERE cn.n_name <> sn.n_name
        GROUP BY cn.n_name, sn.n_name
    ),
    ranked AS (
        SELECT src, dst,
               row_number() OVER (PARTITION BY src
                                  ORDER BY cnt DESC, dst) AS rk
        FROM edges_raw
    ),
    edges AS (SELECT src, dst FROM ranked WHERE rk <= 2),
    s0 AS (SELECT min(src) AS node FROM edges),
    walk(node, hops) AS (
        SELECT node, 0 FROM s0
        UNION
        SELECT e.dst, w.hops + 1
        FROM walk w JOIN edges e ON w.node = e.src
        WHERE w.hops < 25
    )
    SELECT node, CAST(min(hops) AS INT) AS hops
    FROM walk GROUP BY node
    ORDER BY hops, node
    """,
    "single-source shortest hop counts by distributed BFS (frontier "
    "relaxation — graph.bfs_hops): the trade graph sparsified to each "
    "nation's top-2 partner lanes (row_number over the edge rollup, "
    "deterministic tie-break), then iterative relax rounds dist(v) = "
    "min(dist(v), min over in-edges dist(u)+1) from the lexicographic-"
    "min source nation. Each round is ONE join + ONE min-agg on the "
    "aggregated edge list (never the fact), converging in "
    "O(eccentricity) rounds with a scalar monotone convergence check — "
    "the same driver-controls-iteration-only pattern as connected "
    "components and pagerank. The oracle is a recursive CTE of the "
    "same relaxation, so the hash-match proves the iterative plan "
    "reaches the true fixed point. At 100 TB the edge rollup is the "
    "only fact-sized shuffle; rounds shuffle O(|V|) label rows",
)
def bfs_shortest_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = n.select(
        F.col("n_nationkey").alias("ck"), F.col("n_name").alias("src")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sk"), F.col("n_name").alias("dst")
    )
    edges_raw = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(cn), c["c_nationkey"] == cn["ck"])
        .join(F.broadcast(sn), s["s_nationkey"] == sn["sk"])
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("cnt"))
    )
    rk = F.row_number().over(
        Window.partitionBy("src").orderBy(F.col("cnt").desc(), "dst")
    )
    edges = (
        edges_raw.withColumn("rk", rk).filter(F.col("rk") <= 2).select("src", "dst")
    )
    sources = edges.agg(F.min("src").alias("node"))
    return (
        graph.bfs_hops(edges, sources)
        .select("node", F.col("hops").cast("int").alias("hops"))
        .orderBy("hops", "node")
    )


@_register(
    "bigram_lm_perplexity",
    f"""
    WITH toks AS (
        SELECT doc_id, {_D_TOKS} AS tk FROM documents
    ),
    big AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(tk)),
                                     i -> {{'p': tk[i], 'w': tk[i+1]}})) AS bg
        FROM toks WHERE len(tk) >= 2
    ),
    bg2 AS (SELECT doc_id, bg.p AS prev, bg.w AS w FROM big),
    c2 AS (SELECT prev, w, count(*) AS n2 FROM bg2 GROUP BY prev, w),
    c1 AS (SELECT prev, sum(n2) AS n1 FROM c2 GROUP BY prev),
    v AS (
        SELECT count(*) AS nv
        FROM (SELECT prev AS t FROM c2 UNION SELECT w FROM c2)
    ),
    scored AS (
        SELECT b.doc_id,
               -ln((c2.n2 + 0.5) / (c1.n1 + 0.5 * v.nv)) AS nll
        FROM bg2 b
        JOIN c2 ON b.prev = c2.prev AND b.w = c2.w
        JOIN c1 ON b.prev = c1.prev, v
    )
    SELECT doc_id, CAST(count(*) AS INT) AS n_bigrams,
           round(avg(nll), 4) AS avg_nll
    FROM scored GROUP BY doc_id
    ORDER BY doc_id
    """,
    "statistical-LM quality scoring — per-document mean negative "
    "log-likelihood under a corpus-level bigram model with Laplace "
    "smoothing (P(w|prev) = (C(prev,w)+0.5)/(C(prev)+0.5V)): the "
    "perplexity-proxy filter every pretraining pipeline runs (high "
    "avg_nll = disfluent/anomalous text, low = repetitive boilerplate). "
    "Two corpus passes: a stats pass builds the bigram count table "
    "(VOCABULARY-sized, checkpointed once; the context counts and "
    "vocab size DERIVE from it with no further corpus scans), then a "
    "scoring pass joins each document's bigram stream against the "
    "BROADCAST stats — map-side, no shuffle of the corpus. At 100 TB "
    "the stats table is a reusable persisted artifact keyed on corpus "
    "snapshot; scoring stays embarrassingly parallel",
)
def bigram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tk = text.tokens("text")
    big = (
        docs.filter(F.size(tk) >= 2)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice(tk, 1, F.size(tk) - 1).alias("prev"),
                    F.slice(tk, 2, F.size(tk) - 1).alias("w"),
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.prev").alias("prev"), F.col("bg.w").alias("w"))
    )
    # vocabulary-sized stats artifact — one corpus pass, materialized
    # once; c1 and V derive from it without touching the corpus again
    c2 = big.groupBy("prev", "w").agg(F.count("*").alias("n2")).localCheckpoint(eager=False)
    c1 = c2.groupBy("prev").agg(F.sum("n2").alias("n1"))
    v = (
        c2.select(F.col("prev").alias("t"))
        .union(c2.select(F.col("w").alias("t")))
        .distinct()
        .agg(F.count("*").alias("nv"))
    )
    nll = -F.log((F.col("n2") + 0.5) / (F.col("n1") + 0.5 * F.col("nv")))
    return (
        big.join(F.broadcast(c2), ["prev", "w"])
        .join(F.broadcast(c1), "prev")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_bigrams"),
            F.round(F.avg(nll), 4).alias("avg_nll"),
        )
        .orderBy("doc_id")
    )


@_register(
    "measure_correlation_matrix",
    """
    WITH c AS (
        SELECT corr(l_quantity, l_extendedprice) AS c_qp,
               corr(l_quantity, l_discount)      AS c_qd,
               corr(l_quantity, l_tax)           AS c_qt,
               corr(l_extendedprice, l_discount) AS c_pd,
               corr(l_extendedprice, l_tax)      AS c_pt,
               corr(l_discount, l_tax)           AS c_dt
        FROM lineitem
    )
    SELECT t.var_a, t.var_b, round(t.v, 6) + 0.0 AS corr_r
    FROM c, LATERAL (VALUES
        ('l_discount', 'l_tax', c_dt),
        ('l_extendedprice', 'l_discount', c_pd),
        ('l_extendedprice', 'l_tax', c_pt),
        ('l_quantity', 'l_discount', c_qd),
        ('l_quantity', 'l_extendedprice', c_qp),
        ('l_quantity', 'l_tax', c_qt)
    ) AS t(var_a, var_b, v)
    ORDER BY var_a, var_b
    """,
    "pairwise Pearson correlation matrix over the lineitem measures in "
    "ONE aggregate pass (all six co-moments accumulate map-side and "
    "merge tree-wise — no per-pair scans, no shuffle beyond the final "
    "6-value reduce), unpivoted to tidy (var_a, var_b, corr) rows via "
    "stack. The feature-redundancy screen run before any model "
    "training; at 100 TB still exactly one scan regardless of how "
    "many pairs are requested",
)
def measure_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pairs = [
        ("l_quantity", "l_extendedprice"),
        ("l_quantity", "l_discount"),
        ("l_quantity", "l_tax"),
        ("l_extendedprice", "l_discount"),
        ("l_extendedprice", "l_tax"),
        ("l_discount", "l_tax"),
    ]
    agg = li.agg(
        *[F.corr(a, b).alias(f"c_{i}") for i, (a, b) in enumerate(pairs)]
    )
    stack_args = ", ".join(
        f"'{a}', '{b}', c_{i}" for i, (a, b) in enumerate(pairs)
    )
    return (
        agg.select(
            F.expr(f"stack({len(pairs)}, {stack_args}) AS (var_a, var_b, v)")
        )
        .select(
            "var_a", "var_b", (F.round("v", 6) + F.lit(0.0)).alias("corr_r")
        )
        .orderBy("var_a", "var_b")
    )


@_register(
    "multimodal_frame_sample",
    """
    WITH assets AS (
        SELECT doc_id AS asset_id, 'video/mp4' AS mime_type,
               n_chars * 100 AS duration_ms
        FROM documents
        WHERE CAST(substr(source, 4, 10) AS INT) % 3 = 2
    )
    SELECT asset_id, mime_type,
           CAST(unnest(generate_series(0, duration_ms, 5000)) AS BIGINT)
               AS frame_ts_ms
    FROM assets
    ORDER BY asset_id, frame_ts_ms
    """,
    "video frame-sampling plumbing (multimodal.frame_sample_plan): "
    "documents ingested as video assets (duration metadata derived "
    "from size), then the explode-by-schedule pattern emits one row "
    "per planned frame timestamp at a 5s cadence — the row set a "
    "(stubbed) frame decoder would map over. Oracle-checked end of "
    "the multimodal stack: the schedule math (inclusive sequence, "
    "metadata-only predicate that prunes before any payload read) is "
    "exactly what runs ahead of the Arrow decode at 100 TB; sampling "
    "density is a plan-time knob, not a data rewrite",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from covid19_etl_pipeline_spark.operators.multimodal import frame_sample_plan

    docs = load_table(spark, sf_dir, "documents")
    src_num = F.substring("source", 4, 10).cast("int") % 3
    assets = docs.filter(src_num == 2).select(
        F.col("doc_id").alias("asset_id"),
        F.lit("video/mp4").alias("mime_type"),
        (F.col("n_chars") * 100).alias("duration_ms"),
    )
    return frame_sample_plan(assets, every_ms=5000).orderBy(
        "asset_id", "frame_ts_ms"
    )


@_register(
    "pq_adc_topk",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    subs AS (
        SELECT vec_id, s, v[s*16+1 : s*16+16] AS sub
        FROM e, (VALUES (0), (1), (2), (3)) AS t(s)
    ),
    cb AS (SELECT s, vec_id AS j, sub AS cent FROM subs WHERE vec_id < 16),
    enc0 AS (
        SELECT d.vec_id, d.s, cb.j,
               list_dot_product(d.sub, d.sub)
                 - 2 * list_dot_product(d.sub, cb.cent)
                 + list_dot_product(cb.cent, cb.cent) AS d2
        FROM subs d JOIN cb ON d.s = cb.s
    ),
    enc1 AS (
        SELECT vec_id, s, j,
               row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, j) AS rk
        FROM enc0
    ),
    codes AS (SELECT vec_id, s, j FROM enc1 WHERE rk = 1),
    lt AS (
        SELECT q.vec_id AS query_id, q.s, cb.j,
               list_dot_product(q.sub, q.sub)
                 - 2 * list_dot_product(q.sub, cb.cent)
                 + list_dot_product(cb.cent, cb.cent) AS d2q
        FROM subs q JOIN cb ON q.s = cb.s
        WHERE q.vec_id < 5
    ),
    adc AS (
        SELECT lt.query_id, c.vec_id, sum(lt.d2q) AS adc_d2
        FROM codes c JOIN lt ON c.s = lt.s AND c.j = lt.j
        WHERE c.vec_id <> lt.query_id
        GROUP BY lt.query_id, c.vec_id
    ),
    r AS (
        SELECT query_id, vec_id, adc_d2,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY adc_d2, vec_id) AS INT) AS rank
        FROM adc
    )
    SELECT query_id, vec_id, round(adc_d2, 6) + 0.0 AS adc_dist2, rank
    FROM r WHERE rank <= 10
    ORDER BY query_id, rank
    """,
    "product-quantization ANN with asymmetric-distance scoring (the "
    "third index family after LSH and IVF — the memory-bound regime's "
    "answer): 64-dim vectors split into 4 x 16-dim subspaces, each "
    "quantized against a 16-entry codebook (deterministic seed "
    "vectors; kmeans_refined_centroids is the refinement step a "
    "production build would run per subspace), so every database "
    "vector compresses to a 4-byte code. Queries never touch raw "
    "database vectors: each query precomputes a 4x16 distance lookup "
    "table against the codebook (tiny, BROADCAST), and candidate "
    "distance is a 4-term table-lookup sum over the CODES table — at "
    "100 TB the scan is over 4-byte codes instead of 256-byte floats "
    "(64x less IO), shuffling only (query, candidate, partial) rows. "
    "Encode-side argmin is a (vec,subspace)-keyed window; distances "
    "use the dot-decomposition d2 = <a,a> - 2<a,b> + <b,b> in fixed "
    "element order so both engines fold identically",
)
def pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    m, subd, n_queries = 4, 16, 5
    v = F.transform("embedding", lambda x: x.cast("double"))
    slices = F.array(*[F.slice(v, s * subd + 1, subd) for s in range(m)])
    subs = emb.select(
        "vec_id", F.posexplode(slices).alias("s", "sub")
    )
    cb = subs.filter(F.col("vec_id") < 16).select(
        F.col("s").alias("cb_s"), F.col("vec_id").alias("j"), F.col("sub").alias("cent")
    )
    d2 = (
        similarity.dot(F.col("sub"), F.col("sub"))
        - 2 * similarity.dot(F.col("sub"), F.col("cent"))
        + similarity.dot(F.col("cent"), F.col("cent"))
    )
    enc0 = subs.join(F.broadcast(cb), subs["s"] == cb["cb_s"]).select(
        "vec_id", "s", "j", d2.alias("d2")
    )
    rk_enc = F.row_number().over(
        Window.partitionBy("vec_id", "s").orderBy("d2", "j")
    )
    codes = (
        enc0.withColumn("rk", rk_enc).filter(F.col("rk") == 1).select("vec_id", "s", "j")
    )
    lt = (
        subs.filter(F.col("vec_id") < n_queries)
        .join(F.broadcast(cb), subs["s"] == cb["cb_s"])
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("s").alias("lt_s"),
            F.col("j").alias("lt_j"),
            d2.alias("d2q"),
        )
    )
    adc = (
        codes.join(
            F.broadcast(lt),
            (codes["s"] == lt["lt_s"]) & (codes["j"] == lt["lt_j"]),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2q").alias("adc_d2"))
    )
    rk_q = F.row_number().over(
        Window.partitionBy("query_id").orderBy("adc_d2", "vec_id")
    )
    return (
        adc.withColumn("rank", rk_q.cast("int"))
        .filter(F.col("rank") <= 10)
        .select(
            "query_id",
            "vec_id",
            (F.round("adc_d2", 6) + F.lit(0.0)).alias("adc_dist2"),
            "rank",
        )
        .orderBy("query_id", "rank")
    )


@_register(
    "throttled_events",
    """
    WITH g AS (
        SELECT event_id, user_id, event_type,
               epoch_us(ts) - epoch_us(lag(ts) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id)) AS gap_us
        FROM events
    )
    SELECT event_id, user_id, event_type, gap_us
    FROM g
    WHERE gap_us IS NULL OR gap_us >= 300000000
    ORDER BY event_id
    """,
    "event debouncing / throttling: within each (user, event_type) "
    "stream ordered by time, drop events arriving under 300s after "
    "their predecessor (keep the first of every burst) — the "
    "double-fire/retry-storm filter applied before events feed "
    "sessionization or billing. One partitioned lag window keyed on "
    "the entity (no SinglePartition at raw grain), gap arithmetic on "
    "epoch seconds; the simple-lag form is deliberate — the "
    "kept-anchor recursive form is the streaming_dedup watermark "
    "variant's job",
)
def throttled_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    return (
        ev.select("event_id", "user_id", "event_type", gap.alias("gap_us"))
        .filter(F.col("gap_us").isNull() | (F.col("gap_us") >= 300_000_000))
        .orderBy("event_id")
    )


@_register(
    "twap_user_value",
    """
    WITH seg AS (
        SELECT user_id, value,
               epoch_us(lead(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id)) - epoch_us(ts)
                   AS dur_us
        FROM events
    )
    SELECT user_id,
           CAST(count(dur_us) AS INT) AS n_intervals,
           round(sum(value * dur_us) / sum(dur_us), 4) AS twap
    FROM seg
    WHERE dur_us IS NOT NULL AND dur_us > 0
    GROUP BY user_id
    ORDER BY user_id
    """,
    "time-weighted average value per user (TWAP): each observation is "
    "weighted by how long it remained current (lead(ts) - ts), so "
    "irregular sampling cannot bias the mean toward burst periods — "
    "the standard metric form for prices/gauges sampled on change. "
    "One partitioned lead window + one aggregation, both keyed on the "
    "entity; zero-duration segments (same-timestamp retries) are "
    "excluded on BOTH sides so the weight sum is strictly positive",
)
def twap_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dur = F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")
    return (
        ev.select("user_id", "value", dur.alias("dur_us"))
        .filter(F.col("dur_us").isNotNull() & (F.col("dur_us") > 0))
        .groupBy("user_id")
        .agg(
            F.count("dur_us").cast("int").alias("n_intervals"),
            F.round(
                F.sum(F.col("value") * F.col("dur_us")) / F.sum("dur_us"), 4
            ).alias("twap"),
        )
        .orderBy("user_id")
    )


@_register(
    "orders_month_digests",
    """
    WITH h AS (
        SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
               CAST(('0x' || substr(md5(concat(
                   CAST(o_orderkey AS VARCHAR), '|',
                   CAST(o_custkey AS VARCHAR), '|',
                   CAST(CAST(o_orderdate AS DATE) AS VARCHAR))), 1, 15))
                   AS BIGINT) AS rh
        FROM orders
    )
    SELECT CAST(month AS DATE) AS month,
           count(*) AS n_orders,
           bit_xor(rh) AS digest
    FROM h
    GROUP BY month
    ORDER BY month
    """,
    "anti-entropy content digests: per month, an ORDER-INDEPENDENT "
    "xor-of-row-hashes fingerprint plus a row count — the replication/"
    "backfill drift detector (compare digests of two copies, re-sync "
    "only months that differ, never the whole table). xor partials "
    "merge associatively and commutatively, so the digest is "
    "partitioning-proof and incrementally maintainable (xor the delta "
    "rows in or out); hashes cover only canonically-rendered key "
    "columns so both engines fold the identical bytes. THE cheap "
    "primitive for verifying a 100 TB table copy without shipping it",
)
def orders_month_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("date")
    rh = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("o_orderkey").cast("string"),
                    F.col("o_custkey").cast("string"),
                    od.cast("string"),
                ).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return (
        o.select(F.date_trunc("month", od).cast("date").alias("month"), rh.alias("rh"))
        .groupBy("month")
        .agg(
            F.count("*").alias("n_orders"),
            F.expr("bit_xor(rh)").alias("digest"),
        )
        .orderBy("month")
    )


@_register(
    "streaming_dedup_live",
    None,  # genuinely streaming — driver records the rows-only check;
    # the deduped row count equals the exact batch-distinct count
    "LIVE streaming deduplication (streaming.stateful.streaming_dedup): "
    "the staged events stream unioned with itself (an at-least-once "
    "source that redelivers every row) -> dropDuplicates on event_id "
    "-> memory sink, then a batch rollup of the sink proves the 2x "
    "input collapsed back to exactly one row per event. State is "
    "per-key and watermark-evictable (dropDuplicatesWithinWatermark) "
    "in the bounded-state production form; the exact no-watermark form "
    "runs here so the result is deterministic for the rows-only "
    "check. Not SQL-expressible (incremental stateful execution); "
    "batch twin = exact_dedup, stream==batch equality in "
    "tests/test_streaming_stateful.py",
)
def streaming_dedup_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    from covid19_etl_pipeline_spark.streaming.daily_rollup import (
        read_events_stream,
        run_to_memory_sink,
    )
    from covid19_etl_pipeline_spark.streaming.stateful import streaming_dedup

    staging = _staged_events_dir(spark, sf_dir)
    stream = read_events_stream(spark, staging, 8)
    doubled = stream.union(read_events_stream(spark, staging, 8))
    deduped = streaming_dedup(doubled, keys=("event_id",), watermark=None)
    run_to_memory_sink(deduped, "streaming_dedup_live", output_mode="append")
    return (
        spark.table("streaming_dedup_live")
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
        .orderBy("event_type")
    )


@_register(
    "streaming_join_live",
    None,  # genuinely streaming — driver records the rows-only check
    "LIVE watermarked stream-stream join (streaming.joins."
    "purchase_context_join): purchases stream inner-joined to the same "
    "user's events in the preceding 60 minutes, equi key + time-range "
    "predicate over two watermarked file streams -> memory sink -> "
    "batch per-user rollup of joined pairs. Both sides buffer only "
    "within the watermark horizon, so state is O(window), not "
    "O(stream) — the streaming twin of the batch events_before_"
    "purchase range join, which carries the hash check for these "
    "semantics",
)
def streaming_join_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    from covid19_etl_pipeline_spark.streaming.daily_rollup import (
        read_events_stream,
        run_to_memory_sink,
    )
    from covid19_etl_pipeline_spark.streaming.joins import purchase_context_join

    staging = _staged_events_dir(spark, sf_dir)
    purchases = read_events_stream(spark, staging, 8).filter(
        F.col("event_type") == "purchase"
    )
    events = read_events_stream(spark, staging, 8)
    joined = purchase_context_join(purchases, events, window_minutes=60)
    run_to_memory_sink(joined, "streaming_join_live", output_mode="append")
    return (
        spark.table("streaming_join_live")
        .groupBy(F.col("p_user").alias("user_id"))
        .agg(
            F.count("*").alias("n_context_rows"),
            F.countDistinct("purchase_id").alias("n_purchases"),
        )
        .orderBy("user_id")
    )


@_register(
    "incremental_corpus_dedup",
    f"""
    WITH newdocs AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
    oldfp AS (
        SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 5 <> 0
    ),
    newfp AS (SELECT doc_id, md5(text) AS fp FROM newdocs),
    exdup AS (
        SELECT n.doc_id FROM newfp n JOIN oldfp o ON n.fp = o.fp
        UNION
        SELECT n.doc_id FROM newfp n
        JOIN newfp m ON n.fp = m.fp AND m.doc_id < n.doc_id
    ),
    exsurv AS (
        SELECT doc_id FROM newdocs
        WHERE doc_id NOT IN (SELECT doc_id FROM exdup)
    ),
    sigs AS (
        SELECT doc_id,
               {_d_minhash(0)} AS mh0, {_d_minhash(1)} AS mh1,
               {_d_minhash(2)} AS mh2, {_d_minhash(3)} AS mh3,
               {_d_minhash(4)} AS mh4, {_d_minhash(5)} AS mh5,
               {_d_minhash(6)} AS mh6, {_d_minhash(7)} AS mh7
        FROM (SELECT doc_id, {_D_SHINGLES} AS sh FROM documents)
    ),
    bands AS (
        SELECT doc_id, 0 AS band, concat_ws('|', mh0, mh1) AS sig FROM sigs
        UNION ALL SELECT doc_id, 1, concat_ws('|', mh2, mh3) FROM sigs
        UNION ALL SELECT doc_id, 2, concat_ws('|', mh4, mh5) FROM sigs
        UNION ALL SELECT doc_id, 3, concat_ws('|', mh6, mh7) FROM sigs
    ),
    filt AS (SELECT * FROM bands WHERE sig IS NOT NULL AND sig <> ''),
    near AS (
        SELECT DISTINCT a.doc_id
        FROM filt a
        JOIN exsurv s ON a.doc_id = s.doc_id
        JOIN filt b ON a.band = b.band AND a.sig = b.sig
                   AND a.doc_id <> b.doc_id
        WHERE b.doc_id % 5 <> 0
           OR (b.doc_id < a.doc_id
               AND b.doc_id IN (SELECT doc_id FROM exsurv))
    )
    SELECT n.doc_id,
           CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
                WHEN nr.doc_id IS NOT NULL THEN 'near_dup'
                ELSE 'kept' END AS status
    FROM newdocs n
    LEFT JOIN (SELECT doc_id FROM exdup) e ON n.doc_id = e.doc_id
    LEFT JOIN near nr ON n.doc_id = nr.doc_id
    ORDER BY n.doc_id
    """,
    "INCREMENTAL ingestion dedup — the shape that matters at 100 TB: a "
    "new batch (doc_id %% 5 = 0 here) is deduped against the EXISTING "
    "corpus without ever re-comparing the corpus to itself. Exact "
    "stage: batch fingerprints probe the persisted old-fingerprint set "
    "(semi join) + a batch-internal min-id window. Near stage: the "
    "batch's LSH band signatures probe the persisted band INDEX "
    "(dedup.lsh_band_table) — candidates are (new x old) and (new x "
    "smaller-id new survivor) only, never (old x old). Per-batch cost "
    "is O(batch + index probe); the corpus contributes only its "
    "fingerprint and band artifacts, exactly how a daily crawl lands "
    "against a petabyte corpus. Verdict per new doc: exact_dup / "
    "near_dup / kept",
)
def incremental_corpus_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    is_new = F.col("doc_id") % 5 == 0
    new = docs.filter(is_new)
    old = docs.filter(~is_new)
    # --- exact stage: probe the persisted old-fingerprint set
    oldfp = old.select(F.md5("text").alias("fp")).distinct()
    newfp = new.select("doc_id", F.md5("text").alias("fp"))
    w = Window.partitionBy("fp").orderBy("doc_id")
    internal_dup = (
        newfp.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .select("doc_id")
    )
    vs_old_dup = newfp.join(oldfp, "fp", "left_semi").select("doc_id")
    exdup = vs_old_dup.union(internal_dup).distinct().localCheckpoint(eager=False)
    exsurv = new.select("doc_id").join(exdup, "doc_id", "left_anti")
    # --- near stage: batch band signatures probe the band index.
    # The index covers old docs + batch exact-survivors; at scale the
    # old half is a PERSISTED table, not recomputed per batch.
    bands_all = dedup.lsh_band_table(docs, "doc_id", "text")
    surv_flag = exsurv.withColumn("is_surv", F.lit(1))
    bands_f = bands_all.join(surv_flag, "doc_id", "left")
    a = bands_f.filter(F.col("is_surv") == 1).alias("a")
    b = bands_f.filter(
        (F.col("doc_id") % 5 != 0) | (F.col("is_surv") == 1)
    ).alias("b")
    near = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") != F.col("b.doc_id"))
            & (
                (F.col("b.doc_id") % 5 != 0)
                | (F.col("b.doc_id") < F.col("a.doc_id"))
            ),
        )
        .select(F.col("a.doc_id").alias("doc_id"))
        .distinct()
    )
    status = (
        F.when(F.col("is_ex") == 1, "exact_dup")
        .when(F.col("is_near") == 1, "near_dup")
        .otherwise("kept")
    )
    return (
        new.select("doc_id")
        .join(exdup.withColumn("is_ex", F.lit(1)), "doc_id", "left")
        .join(near.withColumn("is_near", F.lit(1)), "doc_id", "left")
        .select("doc_id", status.alias("status"))
        .orderBy("doc_id")
    )


@_register(
    "cheapest_trade_route",
    """
    WITH RECURSIVE
    edges_raw AS (
        SELECT cn.n_name AS src, sn.n_name AS dst, count(*) AS cnt
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey  = c.c_custkey
        JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
        JOIN supplier s ON l.l_suppkey  = s.s_suppkey
        JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
        WHERE cn.n_name <> sn.n_name
        GROUP BY cn.n_name, sn.n_name
    ),
    ranked AS (
        SELECT src, dst, round(1000.0 / cnt, 4) AS w,
               row_number() OVER (PARTITION BY src
                                  ORDER BY cnt DESC, dst) AS rk
        FROM edges_raw
    ),
    edges AS (SELECT src, dst, w FROM ranked WHERE rk <= 2),
    s0 AS (SELECT min(src) AS node FROM edges),
    walk(node, cost, hops) AS (
        SELECT node, CAST(0.0 AS DOUBLE), 0 FROM s0
        UNION
        SELECT e.dst, round(w.cost + e.w, 4), w.hops + 1
        FROM walk w JOIN edges e ON w.node = e.src
        WHERE w.hops < 4
    )
    SELECT node, round(min(cost), 4) AS cost
    FROM walk GROUP BY node
    ORDER BY cost, node
    """,
    "cheapest-route cost within 4 hops — bounded min-plus relaxation "
    "(graph.relax_rounds, the weighted Bellman-Ford generalization of "
    "bfs_shortest_hops): edge cost is inverse lane volume (thin lanes "
    "are expensive), each round relaxes every edge once with per-round "
    "rounding so float summation order cannot drift the min across "
    "engines. The FIXED round count makes the semantics exact "
    "('cheapest over paths of <= 4 edges') rather than dependent on "
    "convergence timing — and bounded-hop costs are what routing/"
    "attribution actually wants. One join + one min-agg per round on "
    "the aggregated edge list; oracle = hop-bounded recursive CTE",
)
def cheapest_trade_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("src"))
    sn = n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("dst"))
    edges_raw = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(cn), c["c_nationkey"] == cn["ck"])
        .join(F.broadcast(sn), s["s_nationkey"] == sn["sk"])
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("cnt"))
    )
    rk = F.row_number().over(
        Window.partitionBy("src").orderBy(F.col("cnt").desc(), "dst")
    )
    edges = (
        edges_raw.withColumn("rk", rk)
        .filter(F.col("rk") <= 2)
        .select("src", "dst", F.round(1000.0 / F.col("cnt"), 4).alias("w"))
    )
    sources = edges.agg(F.min("src").alias("node"))
    return (
        graph.relax_rounds(edges, sources, rounds=4)
        .select("node", F.round("cost", 4).alias("cost"))
        .orderBy("cost", "node")
    )


@_register(
    "multi_regression_price",
    """
    WITH m AS (
        SELECT count(*) AS n,
               avg(l_quantity)              AS mx1,
               avg(l_discount)              AS mx2,
               avg(l_extendedprice)         AS my,
               avg(l_quantity * l_quantity) AS mx1x1,
               avg(l_discount * l_discount) AS mx2x2,
               avg(l_quantity * l_discount) AS mx1x2,
               avg(l_quantity * l_extendedprice) AS mx1y,
               avg(l_discount * l_extendedprice) AS mx2y
        FROM lineitem
    ),
    c AS (
        SELECT n,
               mx1x1 - mx1 * mx1 AS s11,
               mx2x2 - mx2 * mx2 AS s22,
               mx1x2 - mx1 * mx2 AS s12,
               mx1y  - mx1 * my  AS s1y,
               mx2y  - mx2 * my  AS s2y,
               mx1, mx2, my
        FROM m
    )
    SELECT CAST(n AS BIGINT) AS n,
           round((s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12), 6)
               AS beta_quantity,
           round((s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12), 6)
               AS beta_discount,
           round(my - (s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12) * mx1
                    - (s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12) * mx2,
                 4) AS intercept
    FROM c
    """,
    "two-regressor OLS by normal equations — extendedprice ~ quantity "
    "+ discount: every co-moment accumulates in ONE aggregate pass "
    "(map-side partials, tree merge) and the 2x2 system solves in "
    "closed form on the 1-row result; scan count is independent of "
    "regressor count until the moment matrix itself is the bottleneck "
    "(hundreds of features — then you shard the Gram matrix, the same "
    "k×dim-cell update shape as the k-means rollup). The multi-feature "
    "step past price_quantity_regression's single-var regr_* form",
)
def multi_regression_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x1, x2, y = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")
    m = li.agg(
        F.count("*").alias("n"),
        F.avg(x1).alias("mx1"),
        F.avg(x2).alias("mx2"),
        F.avg(y).alias("my"),
        F.avg(x1 * x1).alias("mx1x1"),
        F.avg(x2 * x2).alias("mx2x2"),
        F.avg(x1 * x2).alias("mx1x2"),
        F.avg(x1 * y).alias("mx1y"),
        F.avg(x2 * y).alias("mx2y"),
    )
    s11 = F.col("mx1x1") - F.col("mx1") * F.col("mx1")
    s22 = F.col("mx2x2") - F.col("mx2") * F.col("mx2")
    s12 = F.col("mx1x2") - F.col("mx1") * F.col("mx2")
    s1y = F.col("mx1y") - F.col("mx1") * F.col("my")
    s2y = F.col("mx2y") - F.col("mx2") * F.col("my")
    det = s11 * s22 - s12 * s12
    b1 = (s22 * s1y - s12 * s2y) / det
    b2 = (s11 * s2y - s12 * s1y) / det
    return m.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(b1, 6).alias("beta_quantity"),
        F.round(b2, 6).alias("beta_discount"),
        F.round(
            F.col("my") - b1 * F.col("mx1") - b2 * F.col("mx2"), 4
        ).alias("intercept"),
    )


@_register(
    "feature_hashing_vectors",
    f"""
    WITH tok AS (
        SELECT doc_id, unnest({_D_TOKS}) AS t FROM documents
        WHERE len(trim(text)) > 0
    ),
    b AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(t), 1, 8))::UBIGINT % 8 AS INT)
                   AS bucket
        FROM tok
    ),
    v AS (
        SELECT doc_id,
               count(*) AS n_tokens,
               sum(CASE WHEN bucket = 0 THEN 1 ELSE 0 END) AS h0,
               sum(CASE WHEN bucket = 1 THEN 1 ELSE 0 END) AS h1,
               sum(CASE WHEN bucket = 2 THEN 1 ELSE 0 END) AS h2,
               sum(CASE WHEN bucket = 3 THEN 1 ELSE 0 END) AS h3,
               sum(CASE WHEN bucket = 4 THEN 1 ELSE 0 END) AS h4,
               sum(CASE WHEN bucket = 5 THEN 1 ELSE 0 END) AS h5,
               sum(CASE WHEN bucket = 6 THEN 1 ELSE 0 END) AS h6,
               sum(CASE WHEN bucket = 7 THEN 1 ELSE 0 END) AS h7
        FROM b GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, h0, h1, h2, h3, h4, h5, h6, h7,
           round(sqrt(h0*h0 + h1*h1 + h2*h2 + h3*h3
                    + h4*h4 + h5*h5 + h6*h6 + h7*h7), 4) AS l2_norm
    FROM v ORDER BY doc_id
    """,
    "the hashing trick: tokens map to a FIXED 8-dim count vector via "
    "md5-bucket assignment — vocabulary-free featurization (no fitted "
    "dictionary to broadcast or version, collisions absorbed by the "
    "model), the standard first featurizer for streaming/huge-vocab "
    "text. One conditional-sum pass per doc builds all dims (sum-of-"
    "CASE, no pivot shuffle); md5-derived buckets make the vector "
    "engine- and partitioning-portable. At 100 TB: map-only until the "
    "per-doc agg, dim count is a constant in the plan, not a join",
)
def feature_hashing_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    tok = docs.filter(F.length(F.trim("text")) > 0).select(
        "doc_id", F.explode(text.tokens("text")).alias("t")
    )
    bucket = (
        F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("bigint") % 8
    ).cast("int")
    b = tok.select("doc_id", bucket.alias("bucket"))
    hs = [
        F.sum(F.when(F.col("bucket") == i, 1).otherwise(0)).alias(f"h{i}")
        for i in range(8)
    ]
    v = b.groupBy("doc_id").agg(F.count("*").alias("n_tokens"), *hs)
    l2 = F.round(
        F.sqrt(
            sum((F.col(f"h{i}") * F.col(f"h{i}")) for i in range(8))
        ),
        4,
    )
    return v.select(
        "doc_id", "n_tokens", *[f"h{i}" for i in range(8)], l2.alias("l2_norm")
    ).orderBy("doc_id")


@_register(
    "loo_target_encoding",
    """
    WITH seg AS (
        SELECT c_mktsegment,
               count(*) AS n_seg,
               sum(c_acctbal) AS sum_bal
        FROM customer GROUP BY c_mktsegment
    )
    SELECT c.c_custkey, c.c_mktsegment,
           round(c.c_acctbal, 4) AS c_acctbal,
           round((s.sum_bal - c.c_acctbal) / (s.n_seg - 1), 4) AS segment_loo_mean
    FROM customer c JOIN seg s ON c.c_mktsegment = s.c_mktsegment
    ORDER BY c.c_custkey
    """,
    "leave-one-out target encoding — the leakage-safe categorical "
    "feature: each row's segment mean EXCLUDES its own target value "
    "((sum - y) / (n - 1)), so the encoding never memorizes the row it "
    "describes. One per-category rollup (category-cardinality-sized, "
    "BROADCAST back onto the fact) + map-side arithmetic — no window, "
    "no per-row re-aggregation; the 100 TB cost is one scan + one "
    "tiny-table join regardless of category count",
)
def loo_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    seg = c.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_seg"), F.sum("c_acctbal").alias("sum_bal")
    )
    loo = (F.col("sum_bal") - F.col("c_acctbal")) / (F.col("n_seg") - 1)
    return (
        c.join(F.broadcast(seg), "c_mktsegment")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.round("c_acctbal", 4).alias("c_acctbal"),
            F.round(loo, 4).alias("segment_loo_mean"),
        )
        .orderBy("c_custkey")
    )


@_register(
    "frequent_part_pairs",
    """
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    freq AS (
        SELECT l_partkey FROM items
        GROUP BY l_partkey HAVING count(*) >= 3
    ),
    fitems AS (
        SELECT i.l_orderkey, i.l_partkey FROM items i
        JOIN freq f ON i.l_partkey = f.l_partkey
    ),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS support
        FROM fitems a JOIN fitems b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING count(*) >= 2
    )
    SELECT part_a, part_b, support
    FROM pairs
    ORDER BY support DESC, part_a, part_b
    """,
    "market-basket pair mining with A-PRIORI pruning: items below "
    "min-support can never appear in a frequent pair, so the per-order "
    "self-join runs AFTER the frequent-item filter — the downward-"
    "closure trick that keeps the pair space tractable (the naive "
    "order self-join is quadratic in basket size over the FULL "
    "catalog; pruning first cuts both the join input and the pair "
    "fan-out). Shuffles: one distinct, one item-support rollup (tiny, "
    "the filter side of a semi-ish join), one order-keyed pair join + "
    "pair rollup. At 100 TB add a second prune round (pair-support on "
    "hashed buckets) before materializing pairs — PCY's bitmap trick",
)
def frequent_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    freq = (
        items.groupBy("l_partkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 3)
        .select("l_partkey")
    )
    fitems = items.join(freq, "l_partkey").localCheckpoint(eager=False)
    a = fitems.alias("a")
    b = fitems.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= 2)
        .orderBy(F.col("support").desc(), "part_a", "part_b")
    )


@_register(
    "trending_event_types",
    """
    WITH mx AS (SELECT max(CAST(ts AS DATE)) AS max_d FROM events),
    sc AS (
        SELECT e.event_type,
               count(*) AS n_events,
               sum(power(0.5, datediff('day', CAST(e.ts AS DATE), mx.max_d)))
                   AS decayed
        FROM events e, mx
        GROUP BY e.event_type
    )
    SELECT CAST(row_number() OVER (ORDER BY decayed DESC, event_type) AS INT)
               AS rk,
           event_type, n_events,
           round(decayed, 4) AS decayed_score
    FROM sc
    ORDER BY rk
    """,
    "exponentially-decayed trending counts: each event contributes "
    "0.5^age_days, so yesterday outweighs last month without any "
    "window cutoff — the trending-dashboard scorer. Decay base 0.5 is "
    "deliberate: 0.5^k is an exact power of two in binary floating "
    "point, so both engines produce identical per-event terms and the "
    "sum is portable after rounding. One scan + a 1-row max-date "
    "broadcast + a partial-aggregable sum; at 100 TB the decayed "
    "partial per (type, day) is a maintainable artifact — multiply "
    "yesterday's total by the decay and add today's count",
)
def trending_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max(F.to_date("ts")).alias("max_d"))
    age = F.datediff(F.col("max_d"), F.to_date("ts"))
    sc = (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.pow(F.lit(0.5), age)).alias("decayed"),
        )
    )
    rk = F.row_number().over(Window.orderBy(F.col("decayed").desc(), "event_type"))
    return (
        sc.select(
            rk.cast("int").alias("rk"),
            "event_type",
            "n_events",
            F.round("decayed", 4).alias("decayed_score"),
        )
        .orderBy("rk")
    )


@_register(
    "acf_multi_lag",
    """
    WITH dd AS (
        SELECT CAST(ts AS DATE) AS d, sum(value) AS v
        FROM events GROUP BY CAST(ts AS DATE)
    ),
    lg AS (
        SELECT v,
               lag(v, 1) OVER (ORDER BY d) AS l1,
               lag(v, 2) OVER (ORDER BY d) AS l2,
               lag(v, 3) OVER (ORDER BY d) AS l3,
               lag(v, 4) OVER (ORDER BY d) AS l4,
               lag(v, 5) OVER (ORDER BY d) AS l5,
               lag(v, 6) OVER (ORDER BY d) AS l6,
               lag(v, 7) OVER (ORDER BY d) AS l7
        FROM dd
    ),
    c AS (
        SELECT corr(v, l1) AS c1, corr(v, l2) AS c2, corr(v, l3) AS c3,
               corr(v, l4) AS c4, corr(v, l5) AS c5, corr(v, l6) AS c6,
               corr(v, l7) AS c7
        FROM lg
    )
    SELECT t.lag, round(t.acf, 4) + 0.0 AS acf
    FROM c, LATERAL (VALUES
        (1, c1), (2, c2), (3, c3), (4, c4), (5, c5), (6, c6), (7, c7)
    ) AS t(lag, acf)
    ORDER BY t.lag
    """,
    "multi-lag autocorrelation function (lags 1-7) of the global daily "
    "value series — the weekly-seasonality fingerprint (a lag-7 spike "
    "= day-of-week cycle) read before choosing window sizes or "
    "forecast features. The fact collapses to a days-sized series "
    "FIRST (partial-aggregable), then all seven lag columns share ONE "
    "ordered window pass and all seven corrs accumulate in ONE "
    "aggregate — the documented post-agg global-window pattern: the "
    "single-partition sort touches ~365 rows/year, never the fact",
)
def acf_multi_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dd = ev.groupBy(F.to_date("ts").alias("d")).agg(F.sum("value").alias("v"))
    w = Window.orderBy("d")
    lg = dd.select(
        "v", *[F.lag("v", i).over(w).alias(f"l{i}") for i in range(1, 8)]
    )
    c = lg.agg(*[F.corr("v", f"l{i}").alias(f"c{i}") for i in range(1, 8)])
    stack_args = ", ".join(f"{i}, c{i}" for i in range(1, 8))
    return (
        c.select(F.expr(f"stack(7, {stack_args}) AS (lag, acf0)"))
        .select("lag", (F.round("acf0", 4) + F.lit(0.0)).alias("acf"))
        .orderBy("lag")
    )


@_register(
    "embedding_cluster_separation",
    """
    WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    dims AS (
        SELECT label, i, avg(v[i]) AS c
        FROM e, (SELECT unnest(range(1, 65)) AS i)
        GROUP BY label, i
    ),
    cent AS (
        SELECT label, list(c ORDER BY i) AS cv FROM dims GROUP BY label
    ),
    disp AS (
        SELECT e.label,
               count(*) AS n_vecs,
               avg(sqrt(list_dot_product(e.v, e.v)
                        - 2 * list_dot_product(e.v, cent.cv)
                        + list_dot_product(cent.cv, cent.cv))) AS mean_dist
        FROM e JOIN cent ON e.label = cent.label
        GROUP BY e.label
    ),
    inter AS (
        SELECT a.label AS label, min(sqrt(
                   list_dot_product(a.cv, a.cv)
                   - 2 * list_dot_product(a.cv, b.cv)
                   + list_dot_product(b.cv, b.cv))) AS nearest_centroid_dist
        FROM cent a JOIN cent b ON a.label <> b.label
        GROUP BY a.label
    )
    SELECT d.label, CAST(d.n_vecs AS BIGINT) AS n_vecs,
           round(d.mean_dist, 4) AS intra_dispersion,
           round(i.nearest_centroid_dist, 4) AS nearest_centroid_dist,
           round(d.mean_dist / i.nearest_centroid_dist, 4) AS overlap_ratio
    FROM disp d JOIN inter i ON d.label = i.label
    ORDER BY d.label
    """,
    "embedding cluster-separation audit (Davies-Bouldin-style): per "
    "label, the centroid (per-dimension mean via posexplode — a "
    "labels x dims cell rollup, never a vector shuffle), the mean "
    "member-to-centroid distance (intra dispersion), and the distance "
    "to the nearest OTHER centroid — overlap_ratio near or above 1 "
    "means the classes bleed together and a classifier/ANN index "
    "built on these embeddings will too. Centroids are a tiny "
    "broadcast; distances use the fixed-order dot decomposition. The "
    "embedding-quality gate run before committing to an index build",
)
def embedding_cluster_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    e = emb.select("vec_id", "label", v.alias("v"))
    dims = (
        e.select("label", F.posexplode("v").alias("i", "x"))
        .groupBy("label", "i")
        .agg(F.avg("x").alias("c"))
    )
    cent = (
        dims.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "c"))).alias("ic"))
        .select("label", F.col("ic.c").alias("cv"))
        .localCheckpoint(eager=False)
    )
    d2 = (
        similarity.dot(F.col("v"), F.col("v"))
        - 2 * similarity.dot(F.col("v"), F.col("cv"))
        + similarity.dot(F.col("cv"), F.col("cv"))
    )
    disp = (
        e.join(F.broadcast(cent), "label")
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.avg(F.sqrt(d2)).alias("mean_dist"),
        )
    )
    a = cent.select(F.col("label"), F.col("cv"))
    b = cent.select(F.col("label").alias("label_b"), F.col("cv").alias("cv_b"))
    cd2 = (
        similarity.dot(F.col("cv"), F.col("cv"))
        - 2 * similarity.dot(F.col("cv"), F.col("cv_b"))
        + similarity.dot(F.col("cv_b"), F.col("cv_b"))
    )
    inter = (
        a.join(F.broadcast(b), F.col("label") != F.col("label_b"))
        .groupBy("label")
        .agg(F.min(F.sqrt(cd2)).alias("nearest_centroid_dist"))
    )
    return (
        disp.join(inter, "label")
        .select(
            "label",
            F.col("n_vecs").cast("bigint").alias("n_vecs"),
            F.round("mean_dist", 4).alias("intra_dispersion"),
            F.round("nearest_centroid_dist", 4).alias("nearest_centroid_dist"),
            F.round(
                F.col("mean_dist") / F.col("nearest_centroid_dist"), 4
            ).alias("overlap_ratio"),
        )
        .orderBy("label")
    )


def _staged_docs_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage a stream-readable copy of ``documents`` under a
    deterministic path keyed on sf_dir (same policy as
    ``_staged_events_dir`` — written once, reused across runs)."""
    import hashlib
    import os
    import tempfile

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    staging = os.path.join(tempfile.gettempdir(), f"spark_graft_stage_docs_{key}")
    if not os.path.exists(os.path.join(staging, "_SUCCESS")):
        tmp = staging + f".tmp{os.getpid()}"
        load_table(spark, sf_dir, "documents").write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, staging)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return staging


@_register(
    "streaming_corpus_gate_live",
    None,  # genuinely streaming — rows-only check; the batch twins
    # (text_quality gate + exact_dedup) carry the hash checks
    "LIVE streaming corpus intake — the ingestion half of the training "
    "pipeline run as a stream: documents file-stream -> quality gate "
    "(>= 5 tokens, the training_corpus precondition) -> streaming "
    "exact dedup on the content fingerprint -> append sink -> per-lang "
    "admitted counts. Composes the same operators the batch capstone "
    "verifies, incrementally: a crawl batch landing every few minutes "
    "is gated and deduped as it arrives instead of re-scanning the "
    "corpus nightly; fingerprint state is per-key (watermark-evictable "
    "at scale against a persisted index — the incremental_corpus_dedup "
    "batch twin is the replay/backfill path)",
)
def streaming_corpus_gate_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    from covid19_etl_pipeline_spark.streaming.daily_rollup import run_to_memory_sink

    staging = _staged_docs_dir(spark, sf_dir)
    schema = load_table(spark, sf_dir, "documents").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(staging)
    )
    gated = (
        stream.filter(F.size(text.tokens("text")) >= 5)
        .withColumn("__fp", F.md5(F.col("text").cast("binary")))
        .dropDuplicates(["__fp"])
    )
    run_to_memory_sink(gated, "streaming_corpus_gate_live", output_mode="append")
    return (
        spark.table("streaming_corpus_gate_live")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_admitted"),
            F.sum(F.col("n_chars")).alias("total_chars"),
        )
        .orderBy("lang")
    )


@_register(
    "paged_orders",
    """
    SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
           round(o_totalprice, 4) AS o_totalprice
    FROM orders
    WHERE (CAST(o_orderdate AS DATE), o_orderkey) > (DATE '1996-06-01', 2500)
    ORDER BY o_orderdate, o_orderkey
    LIMIT 25
    """,
    "KEYSET pagination — the serving-layer pattern OFFSET cannot "
    "survive: the next page is WHERE (sort_key, unique_key) > "
    "(cursor) ORDER BY ... LIMIT n, so every page costs one pruned "
    "scan + TakeOrdered(n) regardless of page depth, where OFFSET "
    "100000 re-sorts and discards 100k rows per request. The row "
    "comparison compiles to a pushable range predicate on the leading "
    "key; the unique tie-break key makes pages gap- and overlap-free "
    "under concurrent inserts",
)
def paged_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("date")
    cursor_date, cursor_key = "1996-06-01", 2500
    after = (od > F.lit(cursor_date).cast("date")) | (
        (od == F.lit(cursor_date).cast("date")) & (F.col("o_orderkey") > cursor_key)
    )
    return (
        o.filter(after)
        .select(
            "o_orderkey",
            od.alias("o_orderdate"),
            F.round("o_totalprice", 4).alias("o_totalprice"),
        )
        .orderBy("o_orderdate", "o_orderkey")
        .limit(25)
    )


@_register(
    "multimodal_resize_dims",
    """
    WITH assets AS (
        SELECT doc_id AS asset_id,
               CAST(1 + (doc_id % 1600) AS INT) AS width,
               CAST(1 + ((doc_id * 7) % 1200) AS INT) AS height
        FROM documents
        WHERE CAST(substr(source, 4, 10) AS INT) % 3 = 0
    )
    SELECT asset_id, width, height,
           CAST(greatest(1, floor(width  * 224 / greatest(width, height)))
                AS INT) AS out_width,
           CAST(greatest(1, floor(height * 224 / greatest(width, height)))
                AS INT) AS out_height
    FROM assets
    ORDER BY asset_id
    """,
    "image-resize DIMENSION planning (multimodal.fit_box_dims): per "
    "asset, the aspect-preserving fit-into-224-box target size — the "
    "metadata half of a resize, computed JVM-side so the plan (and "
    "this oracle) never needs a codec, and metadata-only consumers "
    "never enter the Python stage. The Arrow mapInPandas byte path "
    "around the (stubbed) decode is exercised by the resize_images "
    "operator test; synthetic per-asset dimensions derive "
    "deterministically from ids so both engines compute identical "
    "plans",
)
def multimodal_resize_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    from covid19_etl_pipeline_spark.operators.multimodal import fit_box_dims

    docs = load_table(spark, sf_dir, "documents")
    src_num = F.substring("source", 4, 10).cast("int") % 3
    assets = docs.filter(src_num == 0).select(
        F.col("doc_id").alias("asset_id"),
        (1 + F.col("doc_id") % 1600).cast("int").alias("width"),
        (1 + (F.col("doc_id") * 7) % 1200).cast("int").alias("height"),
    )
    ow, oh = fit_box_dims("width", "height", 224)
    return assets.select(
        "asset_id", "width", "height", ow.alias("out_width"), oh.alias("out_height")
    ).orderBy("asset_id")


@_register(
    "kmv_distinct_users",
    """
    WITH h AS (
        SELECT DISTINCT event_type,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::UBIGINT
                   AS hv
        FROM events
    ),
    rk AS (
        SELECT event_type, hv,
               row_number() OVER (PARTITION BY event_type ORDER BY hv) AS r
        FROM h
    ),
    sk AS (SELECT event_type, hv, r FROM rk WHERE r <= 64),
    per AS (
        SELECT event_type,
               max(CASE WHEN r = 64 THEN hv END) AS kth,
               count(*) AS n_in_sketch
        FROM sk GROUP BY event_type
    ),
    ex AS (
        SELECT event_type, count(DISTINCT user_id) AS n_exact
        FROM events GROUP BY event_type
    ),
    merged AS (
        SELECT hv, row_number() OVER (ORDER BY hv) AS r
        FROM (SELECT DISTINCT hv FROM sk)
    ),
    g AS (
        SELECT max(CASE WHEN r = 64 THEN hv END) AS kth,
               count(*) AS n_in_sketch
        FROM merged WHERE r <= 64
    ),
    gex AS (SELECT count(DISTINCT user_id) AS n_exact FROM events),
    scored AS (
        SELECT p.event_type, e.n_exact,
               CASE WHEN p.kth IS NULL THEN CAST(p.n_in_sketch AS DOUBLE)
                    ELSE 63.0 * power(16.0, 15.0) / p.kth END AS est
        FROM per p JOIN ex e ON p.event_type = e.event_type
        UNION ALL
        SELECT '__all__', gex.n_exact,
               CASE WHEN g.kth IS NULL THEN CAST(g.n_in_sketch AS DOUBLE)
                    ELSE 63.0 * power(16.0, 15.0) / g.kth END
        FROM g, gex
    )
    SELECT event_type, CAST(n_exact AS BIGINT) AS n_exact,
           round(est, 4) AS kmv_estimate,
           abs(est - n_exact) <= 0.5 * n_exact AS kmv_ok
    FROM scored
    ORDER BY event_type
    """,
    "KMV (k-minimum-values) distinct sketch built from RELATIONAL "
    "PRIMITIVES — unlike HLL (engine-specific registers, only the "
    "error contract is checkable), a KMV sketch IS data: the k=64 "
    "smallest md5 fractions of the key per group, so both engines "
    "compute bit-identical sketches AND estimates ((k-1)/kth-min "
    "fraction), making the estimator itself hash-comparable. "
    "Mergeability is demonstrated structurally: the '__all__' row is "
    "estimated from the UNION of the per-type sketches (min-wise "
    "merge, k smallest of the pooled mins) — never re-touching the "
    "fact, exactly how persisted per-segment sketches answer global "
    "questions at 100 TB. Sub-k groups fall back to exact (sketch is "
    "the full hash set). Error bound ~1/sqrt(k-1): a 50% gate at "
    "k=64 (the tight contract is audited by approx_distinct_users)",
)
def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    k = 64
    space = 16.0 ** 15
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    h = ev.select("event_type", hv.alias("hv")).distinct()
    w = Window.partitionBy("event_type").orderBy("hv")
    sk = (
        h.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= k)
    ).localCheckpoint(eager=False)  # the persisted per-segment sketch artifact
    per = sk.groupBy("event_type").agg(
        F.max(F.when(F.col("r") == k, F.col("hv"))).alias("kth"),
        F.count("*").alias("n_in_sketch"),
    )
    ex = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    est = F.when(
        F.col("kth").isNull(), F.col("n_in_sketch").cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(space) / F.col("kth"))
    scored = per.join(ex, "event_type").select(
        "event_type", "n_exact", est.alias("est")
    )
    merged = (
        sk.select("hv")
        .distinct()
        .withColumn("r", F.row_number().over(Window.orderBy("hv")))
        .filter(F.col("r") <= k)
    )
    g = merged.agg(
        F.max(F.when(F.col("r") == k, F.col("hv"))).alias("kth"),
        F.count("*").alias("n_in_sketch"),
    )
    gex = ev.select("user_id").agg(F.countDistinct("user_id").alias("n_exact"))
    g_row = g.crossJoin(F.broadcast(gex)).select(
        F.lit("__all__").alias("event_type"), "n_exact", est.alias("est")
    )
    return (
        scored.unionByName(g_row)
        .select(
            "event_type",
            F.col("n_exact").cast("bigint").alias("n_exact"),
            F.round("est", 4).alias("kmv_estimate"),
            (F.abs(F.col("est") - F.col("n_exact")) <= 0.5 * F.col("n_exact")).alias(
                "kmv_ok"
            ),
        )
        .orderBy("event_type")
    )


@_register(
    "semdedup_survivors",
    """
    WITH pts AS (
        SELECT vec_id AS pid, label, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ),
    c0 AS (
        SELECT pid AS cid, list_transform(v, x -> round(x, 6)) AS cv
        FROM pts WHERE pid < 8
    ),
    s AS (
        SELECT p.pid, p.label, c.cid, p.v,
               list_dot_product(p.v, p.v) - 2 * list_dot_product(p.v, c.cv)
                 + list_dot_product(c.cv, c.cv) AS d2
        FROM pts p, c0 c
    ),
    a AS (
        SELECT pid, label, cid, v FROM (
            SELECT pid, label, cid, v,
                   row_number() OVER (PARTITION BY pid ORDER BY d2, cid) AS rn
            FROM s) WHERE rn = 1
    ),
    u AS (
        SELECT pid, cid,
               list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS uv
        FROM a WHERE list_dot_product(v, v) > 0
    ),
    dropped AS (
        SELECT DISTINCT y.pid
        FROM u x JOIN u y ON x.cid = y.cid AND x.pid < y.pid
        WHERE list_dot_product(x.uv, y.uv) >= 0.35
    )
    SELECT a.pid AS vec_id, a.label, a.cid
    FROM a LEFT JOIN dropped d ON a.pid = d.pid
    WHERE d.pid IS NULL
    ORDER BY vec_id
    """,
    "SemDeDup-style SEMANTIC deduplication (Abbas et al., "
    "arXiv:2303.09540 — public method): coarse-quantize the embedding "
    "corpus (deterministic first-k centroids, the IVF cell assignment "
    "sim_ivf_topk also uses), then cosine near-dup pairs WITHIN each "
    "cell only, dropping every vector with a lower-id near-duplicate "
    "in its cell. The cluster-scoped pair join is keyed on the cell "
    "id — candidate volume is sum(|cell|^2), never |corpus|^2, and "
    "each cell's pairs compute shuffle-local; at 100 TB k grows to "
    "keep cells bounded (same envelope as the IVF probe stage). "
    "Catches the paraphrase near-dups shingle-based MinHash cannot. "
    "Complements embedding_neardup_pairs (which audits the pair "
    "metric brute-force) with the production survivor-selection path",
)
def semdedup_survivors_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        similarity.semdedup_survivors(
            emb, k=8, threshold=0.35, extra_cols=("label",)
        )
        .select("vec_id", "label", "cid")
        .orderBy("vec_id")
    )


@_register(
    "length_bucketed_batches",
    f"""
    WITH t AS (
        SELECT doc_id, len({_D_TOKS}) AS n_tokens FROM documents
    ),
    b AS (
        SELECT CAST(floor(n_tokens / 64) AS INT) AS bucket, n_tokens FROM t
    )
    SELECT bucket,
           CAST(bucket * 64 AS INT) AS len_lo,
           CAST(bucket * 64 + 63 AS INT) AS len_hi,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(max(n_tokens) AS INT) AS max_tokens,
           round(1.0 - sum(n_tokens) * 1.0 / (count(*) * max(n_tokens)), 4)
               AS pad_waste_frac
    FROM b GROUP BY bucket ORDER BY bucket
    """,
    "length-bucketed batching audit — the padding-waste number that "
    "drives sequence-bucketing decisions in training dataloaders: "
    "docs are binned into width-64 token-length buckets and each "
    "bucket reports how much compute pad-to-max batching would waste "
    "(1 - sum/(n*max)). Map-only projection + one agg keyed on the "
    "bucket id; at 100 TB this is a single pass over token counts "
    "(already materialized by the quality gate), shuffle is "
    "O(n_buckets) cells. The decision query BEFORE "
    "pack_training_sequences (which implements the packing itself)",
)
def length_bucketed_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    b = docs.select(
        F.floor(text.token_count("text") / 64).cast("int").alias("bucket"),
        text.token_count("text").alias("n_tokens"),
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
            F.max("n_tokens").cast("int").alias("max_tokens"),
        )
        .select(
            "bucket",
            (F.col("bucket") * 64).cast("int").alias("len_lo"),
            (F.col("bucket") * 64 + 63).cast("int").alias("len_hi"),
            "n_docs",
            "sum_tokens",
            "max_tokens",
            F.round(
                1.0 - F.col("sum_tokens") / (F.col("n_docs") * F.col("max_tokens")), 4
            ).alias("pad_waste_frac"),
        )
        .select("bucket", "len_lo", "len_hi", "n_docs", "sum_tokens", "max_tokens", "pad_waste_frac")
        .orderBy("bucket")
    )


@_register(
    "curriculum_order_documents",
    f"""
    WITH s AS (
        SELECT doc_id, len({_D_TOKS}) AS n_tokens FROM documents
    ),
    q AS (
        SELECT round(quantile_cont(n_tokens, 0.75), 6) AS q75,
               round(quantile_cont(n_tokens, 0.50), 6) AS q50,
               round(quantile_cont(n_tokens, 0.25), 6) AS q25
        FROM s
    ),
    tiers AS (
        SELECT s.doc_id,
               CASE WHEN s.n_tokens >= q.q75 THEN 1
                    WHEN s.n_tokens >= q.q50 THEN 2
                    WHEN s.n_tokens >= q.q25 THEN 3
                    ELSE 4 END AS tier
        FROM s, q
    )
    SELECT doc_id, CAST(tier AS INT) AS tier,
           CAST(row_number() OVER (
                    ORDER BY tier,
                             md5(CAST(doc_id AS VARCHAR)),
                             doc_id) AS BIGINT) AS curriculum_rank
    FROM tiers ORDER BY curriculum_rank
    """,
    "curriculum ordering for staged training: docs fall into 4 "
    "difficulty tiers by QUARTILE CUTOFFS (token count as the "
    "difficulty proxy; any quality/perplexity score drops in), then "
    "are DETERMINISTICALLY shuffled within tier via md5(doc_id) so "
    "each epoch's order is reproducible. No global window anywhere: "
    "cutoffs are one scalar percentile row broadcast to a map-side "
    "CASE (at 100 TB: percentile_approx on the stats pass), the rank "
    "is a per-tier row_number (window keyed on tier) plus each "
    "tier's cumulative-count offset from a tiny self-joined count "
    "table — the distributed total-order idiom. Oracle states the "
    "same rank as one global window; thresholds rounded to 6dp on "
    "both sides so interpolation ulps cannot flip a boundary doc",
)
def curriculum_order_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", text.token_count("text").alias("n_tokens")
    )
    cuts = docs.agg(
        F.round(F.percentile("n_tokens", F.lit(0.75)), 6).alias("q75"),
        F.round(F.percentile("n_tokens", F.lit(0.50)), 6).alias("q50"),
        F.round(F.percentile("n_tokens", F.lit(0.25)), 6).alias("q25"),
    )
    tier = (
        F.when(F.col("n_tokens") >= F.col("q75"), 1)
        .when(F.col("n_tokens") >= F.col("q50"), 2)
        .when(F.col("n_tokens") >= F.col("q25"), 3)
        .otherwise(4)
        .cast("int")
    )
    tiers = docs.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        tier.alias("tier"),
        F.md5(F.col("doc_id").cast("string").cast("binary")).alias("__shuf"),
    )
    per_tier = tiers.withColumn(
        "__rk",
        F.row_number().over(
            Window.partitionBy("tier").orderBy("__shuf", "doc_id")
        ),
    )
    counts = tiers.groupBy("tier").agg(F.count("*").alias("__n"))
    c2 = counts.select(F.col("tier").alias("__t2"), F.col("__n").alias("__n2"))
    offsets = (
        counts.join(F.broadcast(c2), F.col("__t2") < F.col("tier"), "left")
        .groupBy("tier")
        .agg(F.coalesce(F.sum("__n2"), F.lit(0)).alias("__off"))
    )
    return (
        per_tier.join(F.broadcast(offsets), "tier")
        .select(
            "doc_id",
            "tier",
            (F.col("__rk") + F.col("__off")).cast("bigint").alias("curriculum_rank"),
        )
        .orderBy("curriculum_rank")
    )


@_register(
    "corpus_datacard",
    f"""
    WITH t AS (
        SELECT source, lang,
               len({_D_TOKS}) AS n_tokens,
               md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
                   AS fp
        FROM documents
    )
    SELECT coalesce(source, '__all__') AS source,
           count(*) AS n_docs,
           CAST(count(DISTINCT lang) AS INT) AS n_langs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(avg(n_tokens), 4) AS avg_tokens,
           round(quantile_cont(n_tokens, 0.5), 4) AS p50_tokens,
           round(quantile_cont(n_tokens, 0.9), 4) AS p90_tokens,
           round(1.0 - count(DISTINCT fp) * 1.0 / count(*), 4)
               AS exact_dup_frac
    FROM t
    GROUP BY GROUPING SETS ((source), ())
    ORDER BY source
    """,
    "corpus datacard — the per-source summary block a dataset "
    "datasheet publishes: doc/lang counts, token totals, exact "
    "interpolated token-length quantiles, and the exact-dup fraction "
    "from normalized-text fingerprints. One scan, GROUPING SETS "
    "(per-source + grand total in a single Expand pass, no UNION "
    "re-scan); count(DISTINCT fp) and count(DISTINCT lang) expand to "
    "the standard two-phase distinct-agg. At 100 TB the quantiles "
    "swap to percentile_approx (KLL sketch, mergeable) — the "
    "approx_percentile_check query audits exactly that substitution",
)
def corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "source",
        "lang",
        text.token_count("text").alias("n_tokens"),
        F.md5(text.normalized_text("text").cast("binary")).alias("fp"),
    )
    g = t.groupingSets([["source"], []], "source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").cast("int").alias("n_langs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        F.round(F.percentile("n_tokens", F.lit(0.5)), 4).alias("p50_tokens"),
        F.round(F.percentile("n_tokens", F.lit(0.9)), 4).alias("p90_tokens"),
        F.round(1.0 - F.countDistinct("fp") / F.count("*"), 4).alias(
            "exact_dup_frac"
        ),
    )
    return g.select(
        F.coalesce("source", F.lit("__all__")).alias("source"),
        "n_docs",
        "n_langs",
        "total_tokens",
        "avg_tokens",
        "p50_tokens",
        "p90_tokens",
        "exact_dup_frac",
    ).orderBy("source")


@_register(
    "multimodal_audio_segments",
    """
    WITH a AS (
        SELECT doc_id, text AS payload, octet_length(encode(text)) AS n_bytes
        FROM documents
        WHERE CAST(substr(source, 4, 10) AS INT) % 3 = 1
    ),
    d AS (
        SELECT doc_id, payload,
               CAST(ceil(n_bytes / 4.0) AS BIGINT) AS duration_ms
        FROM a
    ),
    seg AS (
        SELECT doc_id, duration_ms, seg_start,
               (('0x' || substr(md5(substring(payload,
                                              CAST(seg_start * 4 + 1 AS INT),
                                              400)), 1, 8))::UBIGINT % 1000)
                   / 1000.0 AS energy
        FROM (SELECT doc_id, duration_ms, payload,
                     unnest(range(0, duration_ms, 50)) AS seg_start
              FROM d)
    )
    SELECT doc_id,
           duration_ms,
           count(*) AS n_segments,
           round(avg(energy), 4) AS mean_energy,
           CAST(sum(CASE WHEN energy < 0.2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_silent,
           min(CASE WHEN energy >= 0.2 THEN seg_start END) AS first_active_ms
    FROM seg
    GROUP BY doc_id, duration_ms
    ORDER BY doc_id
    """,
    "audio-segmentation plumbing — the third modality beside "
    "multimodal_feature_extract (image) and multimodal_frame_sample "
    "(video): audio/wav assets (synthesized from documents like the "
    "other multimodal queries; payload = the BINARY column, 4 "
    "bytes/ms PCM stand-in) are cut into OVERLAPPING 100ms windows at "
    "a 50ms hop via sequence+explode, each window's bytes sliced with "
    "substring-on-binary and featurized (md5-derived energy proxy — "
    "the librosa/FFT slot), then rolled up into the "
    "voice-activity-style per-asset profile (silence count, first "
    "active window). Fully UDF-free: the whole segment-featurize-gate "
    "chain is JVM expressions, which is the point — at 100 TB only "
    "the codec call itself needs mapInPandas, every surrounding "
    "window/slice/gate stays in whole-stage codegen, and rows fan out "
    "duration/hop-fold via one explode, not a driver loop. Oracle "
    "slices the varchar twin (ASCII corpus: byte==char)",
)
def multimodal_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    a = docs.filter(
        F.substring("source", 4, 10).cast("int") % 3 == 1
    ).select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.length(F.col("text").cast("binary")).alias("n_bytes"),
    )
    d = a.select(
        "doc_id",
        "payload",
        F.ceil(F.col("n_bytes") / 4.0).cast("bigint").alias("duration_ms"),
    )
    seg = d.select(
        "doc_id",
        "duration_ms",
        "payload",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.col("duration_ms") - 1, F.lit(50).cast("bigint"))
        ).alias("seg_start"),
    ).select(
        "doc_id",
        "duration_ms",
        "seg_start",
        (
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.substring(
                                F.col("payload"),
                                (F.col("seg_start") * 4 + 1).cast("int"),
                                400,
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 1000
            )
            / 1000.0
        ).alias("energy"),
    )
    return (
        seg.groupBy("doc_id", "duration_ms")
        .agg(
            F.count("*").alias("n_segments"),
            F.round(F.avg("energy"), 4).alias("mean_energy"),
            F.sum((F.col("energy") < 0.2).cast("bigint")).alias("n_silent"),
            F.min(F.when(F.col("energy") >= 0.2, F.col("seg_start"))).alias(
                "first_active_ms"
            ),
        )
        .select(
            "doc_id",
            "duration_ms",
            "n_segments",
            "mean_energy",
            "n_silent",
            "first_active_ms",
        )
        .orderBy("doc_id")
    )


@_register(
    "source_overlap_matrix",
    f"""
    WITH sh AS (
        SELECT DISTINCT source, unnest(list_distinct({_D_SHINGLES})) AS g
        FROM documents
    ),
    sizes AS (SELECT source, count(*) AS n FROM sh GROUP BY source)
    SELECT a.source AS source_a, b.source AS source_b,
           count(*) AS n_shared,
           round(count(*) * 1.0 / least(sa.n, sb.n), 4) AS containment
    FROM sh a
    JOIN sh b ON a.g = b.g AND a.source < b.source
    JOIN sizes sa ON sa.source = a.source
    JOIN sizes sb ON sb.source = b.source
    GROUP BY a.source, b.source, sa.n, sb.n
    ORDER BY source_a, source_b
    """,
    "inter-source boilerplate matrix — which sources share content: "
    "per (source_a, source_b) pair, the count of distinct trigram "
    "shingles present in BOTH, plus containment (shared / smaller "
    "side's shingle vocabulary) — the number that decides whether a "
    "new crawl source adds anything or re-scrapes existing ones. The "
    "pair join is keyed on the SHINGLE (uniform md5-free text key; "
    "the per-shingle fan-out is bounded by sources-per-shingle, "
    "never source x source over the corpus), and per-source "
    "vocabulary sizes broadcast back onto the pair rollup. At 100 TB "
    "cap per-shingle source spread (or drop df-saturated shingles, "
    "rare-first style) to bound the quadratic-in-spread explode — "
    "saturated shingles carry no discrimination anyway",
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = (
        spread(docs, "doc_id")
        .select(
            "source",
            F.explode(
                F.array_distinct(text.shingles(text.tokens("text"), k=3))
            ).alias("g"),
        )
        .distinct()
    )
    sizes = sh.groupBy("source").agg(F.count("*").alias("n"))
    a = sh.select(F.col("source").alias("source_a"), "g")
    b = sh.select(F.col("source").alias("source_b"), "g")
    pairs = (
        a.join(b, "g")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))
    return (
        pairs.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            F.round(F.col("n_shared") / F.least("na", "nb"), 4).alias(
                "containment"
            ),
        )
        .orderBy("source_a", "source_b")
    )


@_register(
    "embedding_outlier_docs",
    """
    WITH pts AS (
        SELECT vec_id AS pid, label, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ),
    c0 AS (
        SELECT pid AS cid, list_transform(v, x -> round(x, 6)) AS cv
        FROM pts WHERE pid < 8
    ),
    s AS (
        SELECT p.pid, p.label, c.cid,
               list_dot_product(p.v, p.v) - 2 * list_dot_product(p.v, c.cv)
                 + list_dot_product(c.cv, c.cv) AS d2
        FROM pts p, c0 c
    ),
    a AS (
        SELECT pid, label, cid, d2 FROM (
            SELECT pid, label, cid, d2,
                   row_number() OVER (PARTITION BY pid ORDER BY d2, cid) AS rn
            FROM s) WHERE rn = 1
    ),
    cut AS (SELECT round(quantile_cont(d2, 0.95), 6) AS p95 FROM a)
    SELECT a.pid AS vec_id, a.label, a.cid,
           round(a.d2, 4) AS d2,
           round(cut.p95, 4) AS p95_d2
    FROM a, cut
    WHERE a.d2 > cut.p95
    ORDER BY vec_id
    """,
    "embedding-space outlier gate — the corpus-filtering complement "
    "of semdedup_survivors: assign every vector to its coarse-"
    "quantizer cell (broadcast nested loop, no shuffle), then flag "
    "vectors whose squared distance to their OWN centroid exceeds "
    "the corpus p95 — mislabeled/garbled/off-distribution documents "
    "that quality classifiers built on text features miss. The "
    "threshold is one scalar percentile row broadcast back (at "
    "100 TB: percentile_approx on the assignment stats pass); the "
    "gate itself is a map-side predicate. Same quantizer, rounding "
    "and tie-break conventions as the kmeans/semdedup family, so "
    "the whole embedding-curation stack shares one cell assignment "
    "artifact",
)
def embedding_outlier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    pts = emb.select(
        F.col("vec_id").alias("pid"),
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    cent = pts.select("pid", "v").filter(F.col("pid") < 8).select(
        F.col("pid").alias("cid"),
        F.transform("v", lambda x: F.round(x, 6)).alias("cv"),
    )
    assigned = similarity._nearest_centroid(pts, cent, keep_dist=True).localCheckpoint(eager=False)
    cut = assigned.agg(F.round(F.percentile("d2", F.lit(0.95)), 6).alias("p95"))
    return (
        assigned.crossJoin(F.broadcast(cut))
        .filter(F.col("d2") > F.col("p95"))
        .select(
            F.col("pid").alias("vec_id"),
            "label",
            "cid",
            F.round("d2", 4).alias("d2"),
            F.round("p95", 4).alias("p95_d2"),
        )
        .orderBy("vec_id")
    )


@_register(
    "embedding_curation_pipeline",
    """
    WITH pts AS (
        SELECT vec_id AS pid, label, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ),
    c0 AS (
        SELECT pid AS cid, list_transform(v, x -> round(x, 6)) AS cv
        FROM pts WHERE pid < 8
    ),
    s AS (
        SELECT p.pid, p.label, c.cid, p.v,
               list_dot_product(p.v, p.v) - 2 * list_dot_product(p.v, c.cv)
                 + list_dot_product(c.cv, c.cv) AS d2
        FROM pts p, c0 c
    ),
    a AS (
        SELECT pid, label, cid, v, d2 FROM (
            SELECT pid, label, cid, v, d2,
                   row_number() OVER (PARTITION BY pid ORDER BY d2, cid) AS rn
            FROM s) WHERE rn = 1
    ),
    cut AS (SELECT round(quantile_cont(d2, 0.95), 6) AS p95 FROM a),
    inl AS (SELECT a.* FROM a, cut WHERE a.d2 <= cut.p95),
    u AS (
        SELECT pid, cid,
               list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS uv
        FROM inl WHERE list_dot_product(v, v) > 0
    ),
    dropped AS (
        SELECT DISTINCT y.pid
        FROM u x JOIN u y ON x.cid = y.cid AND x.pid < y.pid
        WHERE list_dot_product(x.uv, y.uv) >= 0.35
    ),
    surv AS (
        SELECT i.pid, i.label, i.cid
        FROM inl i LEFT JOIN dropped d ON i.pid = d.pid
        WHERE d.pid IS NULL
    )
    SELECT pid AS vec_id, label, cid FROM (
        SELECT pid, label, cid,
               row_number() OVER (
                   PARTITION BY cid
                   ORDER BY md5(CAST(pid AS VARCHAR)), pid) AS rk
        FROM surv) WHERE rk <= 16
    ORDER BY vec_id
    """,
    "CAPSTONE for the embedding-curation stack — the vector-side twin "
    "of training_corpus's composition proof: outlier gate (drop "
    "vectors beyond the corpus p95 distance to their own centroid) -> "
    "SemDeDup within-cell near-dup drop -> deterministic md5-ranked "
    "per-cell sample of 16 (cluster-balanced subset for probe/eval "
    "sets). Every stage is an operator verified standalone "
    "(embedding_outlier_docs, semdedup_survivors, "
    "cluster_balanced_sample); this proves they COMPOSE against one "
    "unrolled oracle. One cell-assignment artifact feeds gate, dedup "
    "pair join and sampling window — at 100 TB it is the persisted "
    "IVF assignment table, computed once per corpus snapshot",
)
def embedding_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    pts = emb.select(
        F.col("vec_id").alias("pid"),
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    cent = pts.select("pid", "v").filter(F.col("pid") < 8).select(
        F.col("pid").alias("cid"),
        F.transform("v", lambda x: F.round(x, 6)).alias("cv"),
    )
    # ONE assignment artifact feeds the gate, the pair join (both
    # sides) and the sampling window — materialize it once.
    assigned = similarity._nearest_centroid(pts, cent, keep_dist=True).localCheckpoint(eager=False)
    cut = assigned.agg(F.round(F.percentile("d2", F.lit(0.95)), 6).alias("p95"))
    inl = (
        assigned.crossJoin(F.broadcast(cut))
        .filter(F.col("d2") <= F.col("p95"))
        .select("pid", "label", "cid", "v")
        .localCheckpoint(eager=False)
    )
    unit = inl.filter(similarity.dot(F.col("v"), F.col("v")) > 0).select(
        "pid",
        "cid",
        F.transform(
            "v", lambda x: x / F.sqrt(similarity.dot(F.col("v"), F.col("v")))
        ).alias("uv"),
    )
    a = unit.select(F.col("pid").alias("pa"), "cid", F.col("uv").alias("ua"))
    b = unit.select(F.col("pid").alias("pb"), "cid", F.col("uv").alias("ub"))
    dropped = (
        a.join(b, "cid")
        .filter(F.col("pa") < F.col("pb"))
        .filter(similarity.dot(F.col("ua"), F.col("ub")) >= 0.35)
        .select(F.col("pb").alias("pid"))
        .distinct()
    )
    surv = inl.join(dropped, "pid", "left_anti")
    rk = F.row_number().over(
        Window.partitionBy("cid").orderBy(
            F.md5(F.col("pid").cast("string").cast("binary")), "pid"
        )
    )
    return (
        surv.withColumn("rk", rk)
        .filter(F.col("rk") <= 16)
        .select(F.col("pid").alias("vec_id"), "label", "cid")
        .orderBy("vec_id")
    )


@_register(
    "incremental_embedding_dedup",
    """
    WITH pts AS (
        SELECT vec_id AS pid, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ),
    c0 AS (
        SELECT pid AS cid, list_transform(v, x -> round(x, 6)) AS cv
        FROM pts WHERE pid < 10 AND pid % 5 <> 0
    ),
    s AS (
        SELECT p.pid, c.cid, p.v,
               list_dot_product(p.v, p.v) - 2 * list_dot_product(p.v, c.cv)
                 + list_dot_product(c.cv, c.cv) AS d2
        FROM pts p, c0 c
    ),
    a AS (
        SELECT pid, cid, v FROM (
            SELECT pid, cid, v,
                   row_number() OVER (PARTITION BY pid ORDER BY d2, cid) AS rn
            FROM s) WHERE rn = 1
    ),
    u AS (
        SELECT pid, cid,
               list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS uv
        FROM a WHERE list_dot_product(v, v) > 0
    ),
    newu AS (SELECT * FROM u WHERE pid % 5 = 0),
    oldu AS (SELECT * FROM u WHERE pid % 5 <> 0),
    dropped AS (
        SELECT DISTINCT n.pid
        FROM newu n JOIN oldu o ON n.cid = o.cid
        WHERE list_dot_product(n.uv, o.uv) >= 0.35
        UNION
        SELECT DISTINCT n.pid
        FROM newu n JOIN newu m ON n.cid = m.cid AND m.pid < n.pid
        WHERE list_dot_product(n.uv, m.uv) >= 0.35
    )
    SELECT a.pid AS vec_id, a.cid,
           CASE WHEN d.pid IS NOT NULL THEN 'near_dup' ELSE 'kept' END
               AS status
    FROM a LEFT JOIN dropped d ON a.pid = d.pid
    WHERE a.pid % 5 = 0
    ORDER BY vec_id
    """,
    "INCREMENTAL semantic dedup — the embedding twin of "
    "incremental_corpus_dedup: a new vector batch (vec_id %% 5 = 0) "
    "is deduped against the EXISTING corpus without ever re-comparing "
    "the corpus to itself. The persisted state is the cell-assignment "
    "artifact (quantizer = first 8 OLD vectors — the trained coarse "
    "index a production system loads, not retrains): new vectors "
    "assign map-side, then cosine pairs run (new x old) and (new x "
    "smaller-id new) WITHIN cells only — never (old x old). Per-batch "
    "cost is O(batch x cell-occupancy); a daily embedding drop lands "
    "against yesterday's index at probe cost. Verdicts: near_dup "
    "(old or smaller-id batch neighbor >= 0.35) / kept",
)
def incremental_embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    pts = emb.select(
        F.col("vec_id").alias("pid"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    cent = (
        pts.filter((F.col("pid") < 10) & (F.col("pid") % 5 != 0))
        .select(
            F.col("pid").alias("cid"),
            F.transform("v", lambda x: F.round(x, 6)).alias("cv"),
        )
    )
    # the persisted assignment artifact: old rows come from state, new
    # rows assign map-side against the broadcast quantizer — one
    # materialization feeds the probe joins and the verdict join.
    assigned = similarity._nearest_centroid(pts, cent).localCheckpoint(eager=False)
    unit = assigned.filter(similarity.dot(F.col("v"), F.col("v")) > 0).select(
        "pid",
        "cid",
        F.transform(
            "v", lambda x: x / F.sqrt(similarity.dot(F.col("v"), F.col("v")))
        ).alias("uv"),
    )
    new_u = unit.filter(F.col("pid") % 5 == 0)
    old_u = unit.filter(F.col("pid") % 5 != 0)
    vs_old = (
        new_u.select(F.col("pid").alias("np"), "cid", F.col("uv").alias("nu"))
        .join(old_u.select("cid", F.col("uv").alias("ou")), "cid")
        .filter(similarity.dot(F.col("nu"), F.col("ou")) >= 0.35)
        .select(F.col("np").alias("pid"))
    )
    n_a = new_u.select(F.col("pid").alias("np"), "cid", F.col("uv").alias("nu"))
    n_b = new_u.select(F.col("pid").alias("mp"), "cid", F.col("uv").alias("mu"))
    vs_new = (
        n_a.join(n_b, "cid")
        .filter(F.col("mp") < F.col("np"))
        .filter(similarity.dot(F.col("nu"), F.col("mu")) >= 0.35)
        .select(F.col("np").alias("pid"))
    )
    dropped = vs_old.union(vs_new).distinct()
    return (
        assigned.filter(F.col("pid") % 5 == 0)
        .join(dropped.withColumn("__d", F.lit(1)), "pid", "left")
        .select(
            F.col("pid").alias("vec_id"),
            "cid",
            F.when(F.col("__d").isNotNull(), "near_dup")
            .otherwise("kept")
            .alias("status"),
        )
        .orderBy("vec_id")
    )


@_register(
    "hybrid_retrieval_rrf",
    r"""
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id < 3
    ),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
    dsc AS (
        SELECT query_id, vec_id AS doc_id,
               CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY list_dot_product(qv, cv)
                            / (sqrt(list_dot_product(qv, qv))
                               * sqrt(list_dot_product(cv, cv))) DESC,
                            vec_id) AS INT) AS rank_dense
        FROM q JOIN c ON vec_id <> query_id
    ),
    dense AS (SELECT * FROM dsc WHERE rank_dense <= 20),
    qt AS (
        SELECT doc_id AS query_id,
               unnest(list_distinct(list_transform(
                   regexp_split_to_array(trim(text), '\s+'),
                   t -> lower(t)))) AS term
        FROM documents WHERE doc_id < 3
    ),
    ct AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   regexp_split_to_array(trim(text), '\s+'),
                   t -> lower(t)))) AS term
        FROM documents
    ),
    lexs AS (
        SELECT qt.query_id, ct.doc_id, count(*) AS shared_terms
        FROM qt JOIN ct USING (term)
        WHERE ct.doc_id <> qt.query_id
        GROUP BY qt.query_id, ct.doc_id
    ),
    lexr AS (
        SELECT query_id, doc_id,
               CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY shared_terms DESC, doc_id) AS INT) AS rank_lex
        FROM lexs
    ),
    lex AS (SELECT * FROM lexr WHERE rank_lex <= 20),
    fused AS (
        SELECT coalesce(d.query_id, l.query_id) AS query_id,
               coalesce(d.doc_id, l.doc_id) AS doc_id,
               round(coalesce(1.0 / (60 + d.rank_dense), 0)
                     + coalesce(1.0 / (60 + l.rank_lex), 0), 6) AS rrf_score,
               d.rank_dense, l.rank_lex
        FROM dense d FULL JOIN lex l
          ON d.query_id = l.query_id AND d.doc_id = l.doc_id
    ),
    ranked AS (
        SELECT query_id,
               CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY rrf_score DESC, doc_id) AS INT) AS rank,
               doc_id, rrf_score, rank_dense, rank_lex
        FROM fused
    )
    SELECT * FROM ranked WHERE rank <= 10
    ORDER BY query_id, rank
    """,
    "hybrid retrieval with reciprocal-rank fusion (RRF, k=60): the "
    "dense cosine top-20 (`semantic_doc_retrieval`'s side) and a "
    "lexical distinct-shared-term top-20 (`bm25_doc_retrieval`'s "
    "side) fused as sum(1/(60+rank)) — rank-only fusion needs no "
    "score calibration between the two retrievers, which is why RRF "
    "is the default hybrid in production search. Scale shape: each "
    "retriever's candidate list is |Q| x 20 rows, so the full-outer "
    "fusion join and the final re-rank window cost nothing; the "
    "dense side swaps to the IVF/LSH ANN variants and the lexical "
    "side to BM25 without touching the fusion stage. Query terms "
    "broadcast onto the candidate term stream (no corpus shuffle on "
    "the lexical side); rank integers fuse to exact doubles, so the "
    "fused order is engine-deterministic with the doc_id tie-break",
)
def hybrid_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    dense = similarity.brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 3), k=20
    ).select(
        "query_id",
        F.col("vec_id").alias("doc_id"),
        F.col("rank").cast("int").alias("rank_dense"),
    )
    toks = F.array_distinct(F.transform(text.tokens("text"), F.lower))
    qt = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), F.explode(toks).alias("term")
    )
    ct = spread(docs, "doc_id").select("doc_id", F.explode(toks).alias("term"))
    lexs = (
        ct.join(F.broadcast(qt), "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").alias("shared_terms"))
    )
    wl = Window.partitionBy("query_id").orderBy(
        F.col("shared_terms").desc(), "doc_id"
    )
    lex = (
        lexs.withColumn("rank_lex", F.row_number().over(wl).cast("int"))
        .filter(F.col("rank_lex") <= 20)
        .drop("shared_terms")
    )
    fused = dense.join(lex, ["query_id", "doc_id"], "full").select(
        "query_id",
        "doc_id",
        F.round(
            F.coalesce(1.0 / (60 + F.col("rank_dense")), F.lit(0.0))
            + F.coalesce(1.0 / (60 + F.col("rank_lex")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
        "rank_dense",
        "rank_lex",
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), "doc_id"
    )
    return (
        fused.withColumn("rank", F.row_number().over(wq).cast("int"))
        .filter(F.col("rank") <= 10)
        .select("query_id", "rank", "doc_id", "rrf_score", "rank_dense", "rank_lex")
        .orderBy("query_id", "rank")
    )


@_register(
    "ks_price_drift",
    """
    WITH binned AS (
        SELECT least(CAST(floor(o_totalprice / 1000) AS INT), 999) AS bucket,
               CASE WHEN year(CAST(o_orderdate AS DATE)) <= 1997
                    THEN 1 ELSE 0 END AS is_base
        FROM orders
    ),
    counts AS (
        SELECT bucket,
               sum(is_base)     AS n_base,
               sum(1 - is_base) AS n_curr
        FROM binned GROUP BY bucket
    ),
    tot AS (
        SELECT sum(n_base) AS tot_base, sum(n_curr) AS tot_curr FROM counts
    ),
    cum AS (
        SELECT sum(c.n_base) OVER (ORDER BY c.bucket) * 1.0 / t.tot_base
                   AS f_base,
               sum(c.n_curr) OVER (ORDER BY c.bucket) * 1.0 / t.tot_curr
                   AS f_curr,
               t.tot_base, t.tot_curr
        FROM counts c, tot t
    )
    SELECT CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(max(tot_base) AS BIGINT) AS n_base,
           CAST(max(tot_curr) AS BIGINT) AS n_curr,
           round(max(abs(f_base - f_curr)), 6) AS ks_d,
           round(1.358 * sqrt((max(tot_base) + max(tot_curr)) * 1.0
                              / (max(tot_base) * max(tot_curr))), 6) AS ks_crit,
           max(abs(f_base - f_curr))
               > 1.358 * sqrt((max(tot_base) + max(tot_curr)) * 1.0
                              / (max(tot_base) * max(tot_curr))) AS drifted
    FROM cum
    """,
    "two-sample Kolmogorov-Smirnov drift test between the baseline "
    "(<=1997) and current order-price distributions: D = max ECDF gap "
    "over 1000-unit price buckets, compared against the alpha=0.05 "
    "critical value 1.358*sqrt((n+m)/nm) — the distribution-free "
    "companion to `price_distribution_psi` (PSI scores magnitude, KS "
    "gives a significance threshold). Scale shape: the fact collapses "
    "to bucket-sized counts BEFORE the only ordered window (same "
    "post-agg-window rule as `cusum_changepoint_days` / "
    "`seasonal_decomposition_daily`), totals ride in as one broadcast "
    "row; ECDF fractions are exact integer ratios, so D is "
    "engine-deterministic",
)
def ks_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    is_base = (
        F.when(F.year(F.col("o_orderdate").cast("date")) <= 1997, 1)
        .otherwise(0)
    )
    counts = (
        o.select(
            F.least(
                F.floor(F.col("o_totalprice") / 1000).cast("int"), F.lit(999)
            ).alias("bucket"),
            is_base.alias("is_base"),
        )
        .groupBy("bucket")
        .agg(
            F.sum("is_base").alias("n_base"),
            F.sum(1 - F.col("is_base")).alias("n_curr"),
        )
    )
    tot = counts.agg(
        F.sum("n_base").alias("tot_base"), F.sum("n_curr").alias("tot_curr")
    )
    # the ordered window runs on bucket-sized post-agg data (<=1000
    # rows), never the fact — the single partition is intentional
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.crossJoin(F.broadcast(tot)).select(
        (F.sum("n_base").over(w) * 1.0 / F.col("tot_base")).alias("f_base"),
        (F.sum("n_curr").over(w) * 1.0 / F.col("tot_curr")).alias("f_curr"),
        "tot_base",
        "tot_curr",
    )
    crit = 1.358 * F.sqrt(
        (F.max("tot_base") + F.max("tot_curr"))
        * 1.0
        / (F.max("tot_base") * F.max("tot_curr"))
    )
    return cum.agg(
        F.count("*").alias("n_buckets"),
        F.max("tot_base").cast("bigint").alias("n_base"),
        F.max("tot_curr").cast("bigint").alias("n_curr"),
        F.round(F.max(F.abs(F.col("f_base") - F.col("f_curr"))), 6).alias("ks_d"),
        F.round(crit, 6).alias("ks_crit"),
        (F.max(F.abs(F.col("f_base") - F.col("f_curr"))) > crit).alias("drifted"),
    )


@_register(
    "benford_first_digit",
    """
    WITH d AS (
        SELECT CAST(floor(o_totalprice
                          / power(10, floor(log10(o_totalprice)))) AS INT)
                   AS digit
        FROM orders WHERE o_totalprice > 0
    ),
    c AS (
        SELECT digit, count(*) AS n FROM d GROUP BY digit
    ),
    t AS (SELECT sum(n) AS tot FROM c)
    SELECT c.digit,
           CAST(c.n AS BIGINT) AS n,
           round(c.n * 1.0 / t.tot, 6) AS observed_frac,
           round(log10(1.0 + 1.0 / c.digit), 6) AS benford_frac,
           round(abs(c.n * 1.0 / t.tot - log10(1.0 + 1.0 / c.digit)), 6)
               AS abs_dev
    FROM c, t
    ORDER BY c.digit
    """,
    "Benford's-law first-significant-digit audit on order totals: "
    "observed digit fractions vs the log10(1+1/d) expectation — the "
    "classic anomaly/fabrication screen for financial measures (a "
    "synthetic uniform price generator fails it loudly, which is "
    "itself a data-provenance signal). Map-only digit extraction + a "
    "9-group aggregate with the total broadcast back; exact integer "
    "ratios keep both engines bit-identical",
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    c = (
        o.select(
            F.floor(
                F.col("o_totalprice")
                / F.pow(10.0, F.floor(F.log10("o_totalprice")))
            )
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    t = c.agg(F.sum("n").alias("tot"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("n") * 1.0 / F.col("tot"), 6).alias("observed_frac"),
            F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6).alias("benford_frac"),
            F.round(
                F.abs(
                    F.col("n") * 1.0 / F.col("tot")
                    - F.log10(1.0 + 1.0 / F.col("digit"))
                ),
                6,
            ).alias("abs_dev"),
        )
        .orderBy("digit")
    )


@_register(
    "chi2_event_type_weekday",
    """
    WITH cells AS (
        SELECT event_type, isodow(ts) - 1 AS dow, count(*) AS n
        FROM events GROUP BY event_type, isodow(ts) - 1
    ),
    rt AS (SELECT event_type, sum(n) AS row_tot FROM cells GROUP BY event_type),
    ct AS (SELECT dow, sum(n) AS col_tot FROM cells GROUP BY dow),
    g  AS (SELECT sum(n) AS grand,
                  count(DISTINCT event_type) AS n_types,
                  count(DISTINCT dow) AS n_dows
           FROM cells),
    x AS (
        SELECT sum(power(c.n - rt.row_tot * ct.col_tot * 1.0 / g.grand, 2)
                   / (rt.row_tot * ct.col_tot * 1.0 / g.grand)) AS chi2,
               max(g.grand) AS grand,
               max((g.n_types - 1) * (g.n_dows - 1)) AS dof,
               max(CASE WHEN g.n_types < g.n_dows
                        THEN g.n_types ELSE g.n_dows END) - 1 AS mindim
        FROM cells c
        JOIN rt USING (event_type) JOIN ct USING (dow), g
    )
    SELECT round(chi2, 4) AS chi2,
           CAST(dof AS INT) AS dof,
           CAST(grand AS BIGINT) AS n,
           round(sqrt(chi2 / (grand * mindim)), 6) AS cramers_v
    FROM x
    """,
    "chi-square independence test (event_type x weekday contingency) "
    "with Cramer's V effect size — the categorical drift/association "
    "screen next to KS (continuous) and PSI (binned). The fact "
    "collapses to a types-x-7 cell table first; margins and the grand "
    "total are cell-table rollups joined back onto cells (all "
    "broadcast-sized), so the test costs one shuffle on the cell key. "
    "Margins are exact integer sums; the chi2 sum over ~35 cells is "
    "rounded to 4dp, far above double summation-order noise",
)
def chi2_event_type_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.select("event_type", F.weekday("ts").alias("dow"))
        .groupBy("event_type", "dow")
        .agg(F.count("*").alias("n"))
    )
    rt = cells.groupBy("event_type").agg(F.sum("n").alias("row_tot"))
    ct = cells.groupBy("dow").agg(F.sum("n").alias("col_tot"))
    g = cells.agg(
        F.sum("n").alias("grand"),
        F.countDistinct("event_type").alias("n_types"),
        F.countDistinct("dow").alias("n_dows"),
    )
    expected = F.col("row_tot") * F.col("col_tot") * 1.0 / F.col("grand")
    x = (
        cells.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(g))
        .agg(
            F.sum(F.pow(F.col("n") - expected, 2) / expected).alias("chi2"),
            F.max("grand").alias("grand"),
            F.max((F.col("n_types") - 1) * (F.col("n_dows") - 1)).alias("dof"),
            (F.max(F.least("n_types", "n_dows")) - 1).alias("mindim"),
        )
    )
    return x.select(
        F.round("chi2", 4).alias("chi2"),
        F.col("dof").cast("int").alias("dof"),
        F.col("grand").cast("bigint").alias("n"),
        F.round(F.sqrt(F.col("chi2") / (F.col("grand") * F.col("mindim"))), 6)
            .alias("cramers_v"),
    )


@_register(
    "nation_trade_communities",
    """
    WITH raw AS (
        SELECT cn.n_name AS a, sn.n_name AS b, count(*) AS w
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
        JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
        GROUP BY cn.n_name, sn.n_name
    ),
    sym AS (
        SELECT a, b, CAST(sum(w) AS DOUBLE) AS w
        FROM (
            SELECT a, b, w FROM raw
            UNION ALL
            SELECT b AS a, a AS b, w FROM raw
        )
        WHERE a <> b
        GROUP BY a, b
    ),
    nodes AS (SELECT DISTINCT a AS node FROM sym),
    l0 AS (SELECT node, node AS lbl FROM nodes),
    s1 AS (SELECT e.a, p.lbl, sum(e.w) AS s
           FROM sym e JOIN l0 p ON e.b = p.node GROUP BY e.a, p.lbl),
    b1 AS (SELECT a, lbl FROM (
               SELECT a, lbl, row_number() OVER (
                   PARTITION BY a ORDER BY s DESC, lbl) AS rn FROM s1)
           WHERE rn = 1),
    l1 AS (SELECT p.node, coalesce(b.lbl, p.lbl) AS lbl
           FROM l0 p LEFT JOIN b1 b ON p.node = b.a),
    s2 AS (SELECT e.a, p.lbl, sum(e.w) AS s
           FROM sym e JOIN l1 p ON e.b = p.node GROUP BY e.a, p.lbl),
    b2 AS (SELECT a, lbl FROM (
               SELECT a, lbl, row_number() OVER (
                   PARTITION BY a ORDER BY s DESC, lbl) AS rn FROM s2)
           WHERE rn = 1),
    l2 AS (SELECT p.node, coalesce(b.lbl, p.lbl) AS lbl
           FROM l1 p LEFT JOIN b2 b ON p.node = b.a),
    s3 AS (SELECT e.a, p.lbl, sum(e.w) AS s
           FROM sym e JOIN l2 p ON e.b = p.node GROUP BY e.a, p.lbl),
    b3 AS (SELECT a, lbl FROM (
               SELECT a, lbl, row_number() OVER (
                   PARTITION BY a ORDER BY s DESC, lbl) AS rn FROM s3)
           WHERE rn = 1),
    l3 AS (SELECT p.node, coalesce(b.lbl, p.lbl) AS lbl
           FROM l2 p LEFT JOIN b3 b ON p.node = b.a)
    SELECT node AS nation, lbl AS community,
           CAST(count(*) OVER (PARTITION BY lbl) AS BIGINT)
               AS community_size
    FROM l3
    ORDER BY community, nation
    """,
    "community detection by deterministic weighted label propagation "
    "over the customer-nation -> supplier-nation trade graph (3 "
    "synchronous rounds, argmax neighbor-label weight with min-label "
    "tie-break — classic LPA's randomized update order removed so the "
    "partition is reproducible across engines/partitionings; the "
    "community side of the graph family next to `nation_trade_pagerank` "
    "(influence), `dup_clusters` (connectivity), and "
    "`nation_trade_triangles` (cohesion)). Scale shape: the fact "
    "collapses to the aggregated edge list once (one keyed shuffle + "
    "broadcast dims); every round then joins/aggregates on the node "
    "key only — integer-valued weight sums keep the argmax exact. "
    "graph.label_propagation checkpoints labels per round because the "
    "keep-semantics left join consumes the label table twice",
)
def nation_trade_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), F.col("o_custkey") == c["c_custkey"])
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .join(
            F.broadcast(
                n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("src"))
            ),
            F.col("c_nationkey") == F.col("cn_key"),
        )
        .join(
            F.broadcast(
                n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("dst"))
            ),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )
    labels = graph.label_propagation(edges, "src", "dst", weight="w", iterations=3)
    wc = Window.partitionBy("lbl")
    return labels.select(
        F.col("node").alias("nation"),
        F.col("lbl").alias("community"),
        F.count("*").over(wc).alias("community_size"),
    ).orderBy("community", "nation")


@_register(
    "kaplan_meier_retention",
    """
    WITH obs AS (
        SELECT max(CAST(o_orderdate AS DATE)) AS obs_end FROM orders
    ),
    cust AS (
        SELECT o_custkey,
               min(CAST(o_orderdate AS DATE)) AS first_d,
               max(CAST(o_orderdate AS DATE)) AS last_d
        FROM orders GROUP BY o_custkey
    ),
    subj AS (
        SELECT CAST(floor((last_d - first_d) / 30) AS INT) AS duration_p,
               CASE WHEN last_d < obs_end - INTERVAL 90 DAY
                    THEN 1 ELSE 0 END AS churned
        FROM cust, obs
    ),
    per AS (
        SELECT duration_p,
               sum(churned)     AS n_churned,
               sum(1 - churned) AS n_censored
        FROM subj GROUP BY duration_p
    ),
    risk AS (
        SELECT duration_p, n_churned, n_censored,
               sum(n_churned + n_censored) OVER (
                   ORDER BY duration_p DESC) AS n_at_risk
        FROM per
    )
    SELECT duration_p,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           CAST(n_churned AS BIGINT) AS n_churned,
           CAST(n_censored AS BIGINT) AS n_censored,
           round(exp(sum(ln(greatest(1.0 - n_churned * 1.0 / n_at_risk,
                                     1e-12))) OVER (
               ORDER BY duration_p)), 6) + 0.0 AS survival
    FROM risk
    ORDER BY duration_p
    """,
    "Kaplan-Meier survival estimator for customer retention: subjects "
    "are customers, lifetime = 30-day periods between first and last "
    "order, churn event = went quiet >90 days before the observation "
    "end (otherwise right-censored) — the survival curve S(t) = "
    "prod(1 - d_t/r_t) that a naive churn-rate average gets wrong "
    "because censored customers leave the risk set without counting "
    "as events. Scale shape: one per-customer rollup shuffle, then "
    "the life table collapses to duration-period grain before the "
    "ordered windows (the post-agg-window rule); at-risk counts come "
    "from a reverse-cumulative sum, the product via exp-sum-ln "
    "(integer-ratio hazards, rounded at output only)",
)
def kaplan_meier_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    obs = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("obs_end"))
    cust = o.groupBy("o_custkey").agg(
        F.min(F.col("o_orderdate").cast("date")).alias("first_d"),
        F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
    )
    subj = cust.crossJoin(F.broadcast(obs)).select(
        F.floor(F.datediff("last_d", "first_d") / 30)
        .cast("int")
        .alias("duration_p"),
        F.when(F.col("last_d") < F.date_sub(F.col("obs_end"), 90), 1)
        .otherwise(0)
        .alias("churned"),
    )
    per = subj.groupBy("duration_p").agg(
        F.sum("churned").alias("n_churned"),
        F.sum(1 - F.col("churned")).alias("n_censored"),
    )
    # both windows run on the duration-period life table (a handful of
    # rows after the rollup), never the customer set — the documented
    # post-aggregate single-partition pattern
    w_risk = Window.orderBy(F.col("duration_p").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_surv = Window.orderBy("duration_p").rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = per.withColumn(
        "n_at_risk", F.sum(F.col("n_churned") + F.col("n_censored")).over(w_risk)
    )
    return risk.select(
        "duration_p",
        F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
        F.col("n_churned").cast("bigint").alias("n_churned"),
        F.col("n_censored").cast("bigint").alias("n_censored"),
        (
            F.round(
                F.exp(
                    F.sum(
                        # hazard=1 (fully-churned deepest bucket) would be
                        # ln(0): clamp so S(t) collapses to ~0 identically
                        # in Spark and the DuckDB oracle instead of NULL/-inf
                        F.log(
                            F.greatest(
                                1.0
                                - F.col("n_churned") * 1.0 / F.col("n_at_risk"),
                                F.lit(1e-12),
                            )
                        )
                    ).over(w_surv)
                ),
                6,
            )
            + 0.0
        ).alias("survival"),
    ).orderBy("duration_p")


@_register(
    "mann_whitney_price_drift",
    """
    WITH binned AS (
        SELECT least(CAST(floor(o_totalprice / 1000) AS INT), 999) AS bucket,
               CASE WHEN year(CAST(o_orderdate AS DATE)) <= 1997
                    THEN 1 ELSE 0 END AS is_base
        FROM orders
    ),
    counts AS (
        SELECT bucket,
               sum(is_base)            AS n_base,
               sum(1 - is_base)        AS n_curr,
               count(*)                AS n_all
        FROM binned GROUP BY bucket
    ),
    ranked AS (
        SELECT bucket, n_base, n_curr, n_all,
               coalesce(sum(n_all) OVER (
                   ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   + (n_all + 1) / 2.0 AS midrank
        FROM counts
    ),
    agg AS (
        SELECT sum(n_base)                    AS n1,
               sum(n_curr)                    AS n2,
               sum(n_base + n_curr)           AS n,
               sum(n_base * midrank)          AS r1,
               sum(n_all * n_all * n_all - n_all) AS tie_term
        FROM ranked
    )
    SELECT CAST(n1 AS BIGINT) AS n_base,
           CAST(n2 AS BIGINT) AS n_curr,
           round(r1 - n1 * (n1 + 1) / 2.0, 1) AS u_stat,
           round((r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
                 / sqrt(n1 * n2 / 12.0
                        * ((n + 1) - tie_term * 1.0 / (n * (n - 1)))), 4)
               + 0.0 AS z_score,
           abs((r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
               / sqrt(n1 * n2 / 12.0
                      * ((n + 1) - tie_term * 1.0 / (n * (n - 1))))) > 1.96
               AS shifted
    FROM agg
    """,
    "Mann-Whitney U rank-sum test between baseline (<=1997) and "
    "current order prices — the nonparametric LOCATION-shift "
    "companion to `ks_price_drift` (shape) and "
    "`price_distribution_psi` (magnitude): tie-corrected normal "
    "approximation, |z| > 1.96 flags a median shift no mean-based "
    "t-test assumption is needed for. Distributed trick: exact "
    "per-observation ranks are never materialized — observations "
    "collapse to price buckets and each bucket contributes its "
    "MIDRANK (cum-before + (n+1)/2) times its group count, which is "
    "algebraically the exact tied-rank sum. One fact pass to bucket "
    "counts, one ordered window over <=1000 bucket rows, one scalar "
    "row out; all sums are integer/half-integer-valued doubles, so "
    "both engines agree bit-for-bit before the final rounded division",
)
def mann_whitney_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    is_base = (
        F.when(F.year(F.col("o_orderdate").cast("date")) <= 1997, 1)
        .otherwise(0)
    )
    counts = (
        o.select(
            F.least(
                F.floor(F.col("o_totalprice") / 1000).cast("int"), F.lit(999)
            ).alias("bucket"),
            is_base.alias("is_base"),
        )
        .groupBy("bucket")
        .agg(
            F.sum("is_base").alias("n_base"),
            F.sum(1 - F.col("is_base")).alias("n_curr"),
            F.count("*").alias("n_all"),
        )
    )
    # midranks over the bucket-sized rollup (documented post-agg window)
    w_prev = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = counts.withColumn(
        "midrank",
        F.coalesce(F.sum("n_all").over(w_prev), F.lit(0))
        + (F.col("n_all") + 1) / 2.0,
    )
    agg = ranked.agg(
        F.sum("n_base").alias("n1"),
        F.sum("n_curr").alias("n2"),
        F.sum(F.col("n_base") + F.col("n_curr")).alias("n"),
        F.sum(F.col("n_base") * F.col("midrank")).alias("r1"),
        F.sum(
            F.col("n_all") * F.col("n_all") * F.col("n_all") - F.col("n_all")
        ).alias("tie_term"),
    )
    u = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2.0
    sigma = F.sqrt(
        F.col("n1")
        * F.col("n2")
        / 12.0
        * (
            (F.col("n") + 1)
            - F.col("tie_term") * 1.0 / (F.col("n") * (F.col("n") - 1))
        )
    )
    z = (u - F.col("n1") * F.col("n2") / 2.0) / sigma
    return agg.select(
        F.col("n1").cast("bigint").alias("n_base"),
        F.col("n2").cast("bigint").alias("n_curr"),
        F.round(u, 1).alias("u_stat"),
        (F.round(z, 4) + 0.0).alias("z_score"),
        (F.abs(z) > 1.96).alias("shifted"),
    )


@_register(
    "source_unigram_jsd",
    r"""
    WITH toks AS (
        SELECT source,
               unnest(list_transform(regexp_split_to_array(trim(text), '\s+'),
                                     t -> lower(t))) AS term
        FROM documents
    ),
    st AS (
        SELECT source, term, count(*) AS n FROM toks GROUP BY source, term
    ),
    j AS (
        SELECT st.source, st.term,
               st.n * 1.0 / sum(st.n) OVER (PARTITION BY st.source) AS p,
               sum(st.n) OVER (PARTITION BY st.term) * 1.0
                   / sum(st.n) OVER () AS q,
               sum(st.n) OVER (PARTITION BY st.source) AS tot
        FROM st
    )
    SELECT source,
           CAST(max(tot) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS vocab_terms,
           round(sum(q), 6) + 0.0 AS corpus_coverage,
           round(0.5 * sum(p * ln(2 * p / (p + q))
                           + q * ln(2 * q / (p + q)))
                 + 0.5 * (1 - sum(q)) * ln(2), 6) + 0.0 AS jsd_vs_corpus
    FROM j GROUP BY source ORDER BY source
    """,
    "per-source Jensen-Shannon divergence from the corpus unigram "
    "distribution — the mixture-health metric that tells you which "
    "crawl source's token distribution has drifted from the blend "
    "(`source_mixture_weights` reweights by SIZE; this flags "
    "reweighting by CONTENT). Algebraic trick for scale: the "
    "absent-term half of the JSD sum collapses to "
    "0.5*(1 - coverage)*ln2, so only source-PRESENT (source, term) "
    "rows are ever joined — no |sources| x |vocab| expansion; one "
    "(source, term) rollup, corpus/term/source masses via windows on "
    "that rollup, one per-source aggregate out. Rounded at output: "
    "the term-sum order differs across engines, 6dp sits far above "
    "double accumulation noise",
)
def source_unigram_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    st = (
        docs.select(
            "source",
            F.explode(F.transform(text.tokens("text"), F.lower)).alias("term"),
        )
        .groupBy("source", "term")
        .agg(F.count("*").alias("n"))
    )
    w_src = Window.partitionBy("source")
    w_term = Window.partitionBy("term")
    # corpus total as a 1-row broadcast scalar, NOT an unpartitioned
    # window — a global window would single-partition the vocab-sized
    # rollup at scale
    ctot = st.agg(F.sum("n").alias("ctot"))
    j = st.crossJoin(F.broadcast(ctot)).select(
        "source",
        "term",
        (F.col("n") * 1.0 / F.sum("n").over(w_src)).alias("p"),
        (F.sum("n").over(w_term) * 1.0 / F.col("ctot")).alias("q"),
        F.sum("n").over(w_src).alias("tot"),
    )
    return (
        j.groupBy("source")
        .agg(
            F.max("tot").cast("bigint").alias("n_tokens"),
            F.count("*").cast("bigint").alias("vocab_terms"),
            (F.round(F.sum("q"), 6) + 0.0).alias("corpus_coverage"),
            (
                F.round(
                    0.5
                    * F.sum(
                        F.col("p") * F.log(2 * F.col("p") / (F.col("p") + F.col("q")))
                        + F.col("q") * F.log(2 * F.col("q") / (F.col("p") + F.col("q")))
                    )
                    + 0.5 * (1 - F.sum("q")) * float(__import__("math").log(2.0)),
                    6,
                )
                + 0.0
            ).alias("jsd_vs_corpus"),
        )
        .orderBy("source")
    )


@_register(
    "readability_scores",
    r"""
    WITH m AS (
        SELECT doc_id, lang,
               len(regexp_split_to_array(trim(text), '\s+')) AS words,
               greatest(len(regexp_split_to_array(text, '[.!?]+')) - 1, 1)
                   AS sentences,
               greatest(len(regexp_split_to_array(lower(text), '[aeiouy]+')) - 1,
                        1) AS syllables
        FROM documents
    )
    SELECT doc_id, lang,
           CAST(words AS BIGINT) AS n_words,
           CAST(sentences AS BIGINT) AS n_sentences,
           CAST(syllables AS BIGINT) AS n_syllables,
           round(206.835 - 1.015 * (words * 1.0 / sentences)
                 - 84.6 * (syllables * 1.0 / words), 4) + 0.0
               AS flesch_score
    FROM m
    WHERE words > 0
    ORDER BY doc_id
    """,
    "Flesch reading-ease scoring per document — the readability gate "
    "a children's-content / plain-language corpus filter runs "
    "(Flesch 1948: 206.835 - 1.015*(words/sentence) - "
    "84.6*(syllables/word)); syllables approximated as vowel-group "
    "runs, the standard codepoint-only heuristic when no dictionary "
    "is shippable. Map-only (three regexp splits per row, all "
    "RE2-safe), no shuffle at any scale; integer counts make the "
    "formula engine-exact before the output rounding",
)
def readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    sentences = F.greatest(
        F.size(F.split(F.col("text"), r"[.!?]+")) - 1, F.lit(1)
    )
    syllables = F.greatest(
        F.size(F.split(F.lower(F.col("text")), r"[aeiouy]+")) - 1, F.lit(1)
    )
    m = docs.select(
        "doc_id",
        "lang",
        words.alias("words"),
        sentences.alias("sentences"),
        syllables.alias("syllables"),
    ).filter(F.col("words") > 0)
    return m.select(
        "doc_id",
        "lang",
        F.col("words").cast("bigint").alias("n_words"),
        F.col("sentences").cast("bigint").alias("n_sentences"),
        F.col("syllables").cast("bigint").alias("n_syllables"),
        (
            F.round(
                206.835
                - 1.015 * (F.col("words") * 1.0 / F.col("sentences"))
                - 84.6 * (F.col("syllables") * 1.0 / F.col("words")),
                4,
            )
            + 0.0
        ).alias("flesch_score"),
    ).orderBy("doc_id")


@_register(
    "nation_trade_assortativity",
    """
    WITH raw AS (
        SELECT cn.n_name AS a, sn.n_name AS b, count(*) AS w
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
        JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
        GROUP BY cn.n_name, sn.n_name
    ),
    symw AS (
        SELECT a, b, sum(w) AS w FROM (
            SELECT a, b, w FROM raw UNION ALL SELECT b AS a, a AS b, w FROM raw
        ) WHERE a <> b GROUP BY a, b
    ),
    mw AS (SELECT avg(w) AS mean_w FROM symw),
    sym AS (SELECT a, b FROM symw, mw WHERE symw.w > mw.mean_w),
    deg AS (SELECT a AS node, count(*) AS d FROM sym GROUP BY a),
    ed AS (
        SELECT da.d * 1.0 AS x, db.d * 1.0 AS y
        FROM sym e JOIN deg da ON e.a = da.node JOIN deg db ON e.b = db.node
    ),
    mo AS (
        SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
        FROM ed
    )
    SELECT CAST(n AS BIGINT) AS n_edges,
           round(CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                      THEN (n * sxy - sx * sy)
                           / (sqrt(n * sxx - sx * sx)
                              * sqrt(n * syy - sy * sy)) END, 4)
               + 0.0 AS assortativity
    FROM mo
    """,
    "degree assortativity of the trade-graph BACKBONE (Newman 2002): "
    "edges are first thresholded to above-mean weight (the disparity-"
    "filter-lite backbone — a raw TPC-H-ish trade graph is complete, "
    "where every degree ties and assortativity is undefined), then "
    "Pearson correlation of endpoint degrees over the surviving "
    "symmetrized edges — positive means hubs trade with hubs "
    "(resilient core), negative a hub-and-spoke topology (skew "
    "warning for graph-partitioned workloads). Computed from ONE "
    "moment-aggregate pass over edges joined to the broadcast-sized "
    "degree table (the `multi_regression_price` closed-form trick — "
    "no second scan, no built-in corr() whose accumulation internals "
    "differ per engine); zero-variance degenerate graphs return NULL "
    "instead of dividing by zero; integer degree products sum "
    "exactly, rounded at output",
)
def nation_trade_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    raw = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), F.col("o_custkey") == c["c_custkey"])
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("a"))),
            F.col("c_nationkey") == F.col("ck"),
        )
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("b"))),
            F.col("s_nationkey") == F.col("sk"),
        )
        .groupBy("a", "b")
        .agg(F.count("*").alias("w"))
    )
    symw = (
        raw.unionByName(
            raw.select(F.col("b").alias("a"), F.col("a").alias("b"), "w")
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
    )
    # backbone threshold: above-mean edge weight (1-row scalar broadcast)
    mw = symw.agg(F.avg("w").alias("mean_w"))
    sym = (
        symw.crossJoin(F.broadcast(mw))
        .filter(F.col("w") > F.col("mean_w"))
        .select("a", "b")
    )
    deg = sym.groupBy(F.col("a").alias("node")).agg(F.count("*").alias("d"))
    ed = (
        sym.join(F.broadcast(deg.select(F.col("node").alias("na"), F.col("d").alias("da"))), F.col("a") == F.col("na"))
        .join(F.broadcast(deg.select(F.col("node").alias("nb"), F.col("d").alias("db"))), F.col("b") == F.col("nb"))
        .select((F.col("da") * 1.0).alias("x"), (F.col("db") * 1.0).alias("y"))
    )
    mo = ed.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    r = F.when(
        (varx > 0) & (vary > 0),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (F.sqrt(varx) * F.sqrt(vary)),
    )
    return mo.select(
        F.col("n").cast("bigint").alias("n_edges"),
        (F.round(r, 4) + 0.0).alias("assortativity"),
    )


@_register(
    "event_transition_entropy",
    """
    WITH seq AS (
        SELECT event_type AS cur,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    tc AS (
        SELECT cur, nxt, count(*) AS n
        FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ),
    rt AS (SELECT cur, sum(n) AS tot FROM tc GROUP BY cur)
    SELECT tc.cur AS event_type,
           CAST(rt.tot AS BIGINT) AS n_transitions,
           CAST(count(*) AS INT) AS n_next_states,
           round(-sum((tc.n * 1.0 / rt.tot) * ln(tc.n * 1.0 / rt.tot)), 6)
               + 0.0 AS transition_entropy
    FROM tc JOIN rt ON tc.cur = rt.cur
    GROUP BY tc.cur, rt.tot
    ORDER BY event_type
    """,
    "per-state entropy of the event-type transition distribution "
    "H(next | cur) — the sequence-predictability metric over the "
    "Markov chain `next_event_training_pairs` builds: near-zero means "
    "scripted/bot-like sessions, near-ln(k) uniform wandering. One "
    "(user, time)-keyed lag window on the fact, then all aggregation "
    "happens on the types^2-sized transition table with its row "
    "totals joined back broadcast-sized; exact integer ratios feed "
    "ln, rounded at output. The deterministic (ts, event_id) sort key "
    "pins tie order across engines",
)
def event_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    tc = seq.groupBy("cur", "nxt").agg(F.count("*").alias("n"))
    rt = tc.groupBy("cur").agg(F.sum("n").alias("tot"))
    p = F.col("n") * 1.0 / F.col("tot")
    return (
        tc.join(F.broadcast(rt), "cur")
        .groupBy(F.col("cur").alias("event_type"), F.col("tot"))
        .agg(
            F.count("*").cast("int").alias("n_next_states"),
            (F.round(-F.sum(p * F.log(p)), 6) + 0.0).alias("transition_entropy"),
        )
        .select(
            "event_type",
            F.col("tot").cast("bigint").alias("n_transitions"),
            "n_next_states",
            "transition_entropy",
        )
        .orderBy("event_type")
    )


@_register(
    "user_event_burstiness",
    """
    WITH gaps AS (
        SELECT user_id,
               epoch(ts) - epoch(lag(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)) AS gap_s
        FROM events
    ),
    mo AS (
        SELECT user_id, count(*) AS n,
               sum(gap_s) AS s1, sum(gap_s * gap_s) AS s2
        FROM gaps WHERE gap_s IS NOT NULL
        GROUP BY user_id HAVING count(*) >= 10
    ),
    st AS (
        SELECT user_id, n,
               s1 / n AS mu,
               sqrt((s2 - s1 * s1 / n) / (n - 1)) AS sigma
        FROM mo
    )
    SELECT user_id,
           CAST(n AS BIGINT) AS n_gaps,
           round(mu, 4) AS mean_gap_s,
           round(sigma / mu, 4) + 0.0 AS gap_cv,
           round((sigma - mu) / (sigma + mu), 4) + 0.0 AS burstiness
    FROM st
    WHERE mu > 0
    ORDER BY user_id
    """,
    "per-user burstiness of event inter-arrival times (Goh & Barabasi "
    "B = (sigma-mu)/(sigma+mu) in [-1,1]: -1 periodic/bot-like metronome, "
    "0 Poisson, ->1 extreme bursts) plus the coefficient of variation — "
    "the temporal-signature screen that separates organic users from "
    "schedulers. One (user, time) lag window co-keyed with the "
    "per-user moment aggregate (same exchange), variance from explicit "
    "moment sums so both engines share the formula rather than a "
    "stddev() implementation; integer epoch-second gaps sum exactly",
)
def user_event_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (
            F.col("ts").cast("double")
            - F.lag(F.col("ts").cast("double")).over(w)
        ).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    mo = (
        gaps.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("gap_s").alias("s1"),
            F.sum(F.col("gap_s") * F.col("gap_s")).alias("s2"),
        )
        .filter(F.col("n") >= 10)
    )
    mu = F.col("s1") / F.col("n")
    sigma = F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    )
    return (
        mo.select(
            "user_id",
            F.col("n").cast("bigint").alias("n_gaps"),
            F.round(mu, 4).alias("mean_gap_s"),
            (F.round(sigma / mu, 4) + 0.0).alias("gap_cv"),
            (F.round((sigma - mu) / (sigma + mu), 4) + 0.0).alias("burstiness"),
            mu.alias("__mu"),
        )
        .filter(F.col("__mu") > 0)
        .drop("__mu")
        .orderBy("user_id")
    )


def _cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared CDC chunk table: (doc_id, chunk_id, n_tokens, chunk_hash)
    for docs < 100 — consumed by `cdc_chunk_documents` (the chunk
    listing) and `chunk_dedup_ratio` (the cross-doc dedup rollup)."""
    docs = (
        spread(load_table(spark, sf_dir, "documents"), "doc_id")
        .filter(F.col("doc_id") < 100)
    )
    toks = docs.select(
        "doc_id", F.posexplode(text.tokens("text")).alias("pos0", "term")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
    boundary = (
        F.when(
            (F.col("pos") > 1)
            & (
                F.conv(F.substring(F.md5(F.lower("term")), 1, 6), 16, 10)
                .cast("bigint")
                % 16
                == 0
            ),
            1,
        )
        .otherwise(0)
    )
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    chunked = toks.withColumn("boundary", boundary).withColumn(
        "chunk_id", F.sum("boundary").over(w)
    )
    return chunked.groupBy(
        "doc_id", F.col("chunk_id").cast("int").alias("chunk_id")
    ).agg(
        F.count("*").alias("n_tokens"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", F.lower("term").alias("t")))
                    ),
                    lambda s: s["t"],
                ),
                " ",
            ).cast("binary")
        ).alias("chunk_hash"),
    )



@_register(
    "cdc_chunk_documents",
    r"""
    WITH arrs AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
        FROM documents WHERE doc_id < 100
    ),
    idx AS (
        SELECT doc_id, arr,
               unnest(generate_series(1, len(arr))) AS pos
        FROM arrs
    ),
    toks AS (
        SELECT doc_id, CAST(pos AS BIGINT) AS pos, arr[pos] AS term FROM idx
    ),
    marked AS (
        SELECT doc_id, term, pos,
               CASE WHEN pos > 1 AND
                    CAST(('0x' || substr(md5(lower(term)), 1, 6)) AS BIGINT)
                        % 16 = 0
                    THEN 1 ELSE 0 END AS boundary
        FROM toks
    ),
    chunked AS (
        SELECT doc_id, term, pos,
               sum(boundary) OVER (
                   PARTITION BY doc_id ORDER BY pos) AS chunk_id
        FROM marked
    )
    SELECT doc_id,
           CAST(chunk_id AS INT) AS chunk_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           md5(string_agg(lower(term), ' ' ORDER BY pos)) AS chunk_hash
    FROM chunked
    GROUP BY doc_id, chunk_id
    ORDER BY doc_id, chunk_id
    """,
    "content-defined chunking (FastCDC/rsync family): chunk "
    "boundaries fall where md5(token) lands in 1/16 of hash space, so "
    "an insertion near the head re-chunks only its neighborhood — "
    "fixed-window `chunk_documents` re-shifts EVERY downstream chunk, "
    "which is why storage dedup uses CDC. Emits (doc, chunk, hash) "
    "rows ready for the cross-doc chunk-level dedup join. One "
    "doc-keyed window over the exploded token stream (posexplode "
    "keeps order without a global sort); the chunk hash aggregates "
    "position-ordered tokens so it is engine-deterministic",
)
def cdc_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cdc_chunks(spark, sf_dir).orderBy("doc_id", "chunk_id")


@_register(
    "chunk_dedup_ratio",
    r"""
    WITH arrs AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
        FROM documents WHERE doc_id < 100
    ),
    idx AS (
        SELECT doc_id, arr,
               unnest(generate_series(1, len(arr))) AS pos
        FROM arrs
    ),
    toks AS (
        SELECT doc_id, CAST(pos AS BIGINT) AS pos, arr[pos] AS term FROM idx
    ),
    marked AS (
        SELECT doc_id, term, pos,
               CASE WHEN pos > 1 AND
                    CAST(('0x' || substr(md5(lower(term)), 1, 6)) AS BIGINT)
                        % 16 = 0
                    THEN 1 ELSE 0 END AS boundary
        FROM toks
    ),
    chunked AS (
        SELECT doc_id, term, pos,
               sum(boundary) OVER (
                   PARTITION BY doc_id ORDER BY pos) AS chunk_id
        FROM marked
    ),
    chunks AS (
        SELECT doc_id, chunk_id, count(*) AS n_tokens,
               md5(string_agg(lower(term), ' ' ORDER BY pos)) AS chunk_hash
        FROM chunked GROUP BY doc_id, chunk_id
    ),
    firsts AS (
        SELECT chunk_hash, min(doc_id) AS first_doc FROM chunks
        GROUP BY chunk_hash
    )
    SELECT c.doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN f.first_doc < c.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_chunks,
           round(sum(CASE WHEN f.first_doc < c.doc_id
                          THEN c.n_tokens ELSE 0 END) * 1.0
                 / sum(c.n_tokens), 6) + 0.0 AS dup_token_fraction
    FROM chunks c JOIN firsts f ON c.chunk_hash = f.chunk_hash
    GROUP BY c.doc_id
    ORDER BY c.doc_id
    """,
    "chunk-level storage-dedup ratio over the CDC chunk table "
    "(`cdc_chunk_documents`): a chunk is a duplicate when its hash was "
    "first emitted by an EARLIER doc (min-doc-id first-writer rule, "
    "the same convention as `doc_novelty_fraction` at shingle grain) — "
    "per doc, the duplicate-chunk count and the token mass a "
    "dedup-store would not re-write. One chunk-hash rollup + join-back "
    "keyed on the hash; content-defined boundaries are what make the "
    "ratio robust to insert/delete edits (fixed windows would shift "
    "every downstream chunk and report near-zero reuse)",
)
def chunk_dedup_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = _cdc_chunks(spark, sf_dir)
    firsts = chunks.groupBy("chunk_hash").agg(F.min("doc_id").alias("first_doc"))
    is_dup = (F.col("first_doc") < F.col("doc_id")).cast("int")
    return (
        chunks.join(firsts, "chunk_hash")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(is_dup).cast("bigint").alias("n_dup_chunks"),
            (
                F.round(
                    F.sum(is_dup * F.col("n_tokens")) * 1.0 / F.sum("n_tokens"),
                    6,
                )
                + 0.0
            ).alias("dup_token_fraction"),
        )
        .orderBy("doc_id")
    )


@_register(
    "rolling_7day_distinct_users",
    """
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ),
    days AS (
        SELECT d, CAST(d - DATE '1970-01-01' AS BIGINT) AS r
        FROM (SELECT DISTINCT d FROM du)
    ),
    expl AS (
        SELECT du.user_id, unnest(generate_series(days.r, days.r + 6)) AS ri
        FROM du JOIN days USING (d)
    ),
    exact AS (
        SELECT d2.d, count(DISTINCT e.user_id) AS n_users_exact
        FROM expl e JOIN days d2 ON e.ri = d2.r
        GROUP BY d2.d
    )
    SELECT d, n_users_exact, TRUE AS hll_7day_ok
    FROM exact ORDER BY d
    """,
    "rolling 7-day distinct users via MERGEABLE HLL sketches "
    "(Spark-4 datasketches: one hll_sketch_agg per day, then "
    "hll_union_agg over the 7-row window — the sketch union is the "
    "whole point: day sketches are built ONCE and re-unioned per "
    "window position, where exact distinct would rescan every "
    "7-day span of the fact). Sketch estimates are engine-specific, "
    "so the hash-checked contract is the <=5% error bound against the "
    "exact count (the `approx_distinct_users` convention); windows are "
    "7 CALENDAR days (rangeBetween over the days-since-epoch ordinal), "
    "so a zero-event day still advances the window instead of silently "
    "stretching it; the exact twin avoids a non-equi range join by "
    "exploding each (day, user) into its <=7 covered day ordinals — "
    "bounded fan-out + hash agg, no BNLJ. The day-grain windows run on "
    "the days-sized rollup. At 100 TB the sketch path ships kilobyte "
    "day-sketches; the exact side is the audit you sample, not the "
    "production plan",
)
def rolling_7day_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    # calendar-day ordinal (days since epoch): a day with zero events still
    # advances the window, so the '7-day' span is 7 CALENDAR days even
    # across gaps — rangeBetween over the ordinal, not rowsBetween over
    # observed rows
    days = du.select("d").distinct().withColumn(
        "r", F.unix_date("d").cast("bigint")
    )
    expl = du.join(F.broadcast(days), "d").select(
        "user_id", F.explode(F.sequence(F.col("r"), F.col("r") + 6)).alias("ri")
    )
    exact = (
        expl.join(
            F.broadcast(days.select(F.col("d").alias("d_i"), F.col("r").alias("ri"))),
            "ri",
        )
        .groupBy("d_i")
        .agg(F.countDistinct("user_id").alias("n_users_exact"))
    )
    daily_sk = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id", 14).alias("sk")
    )
    w7 = Window.orderBy(F.unix_date("d").cast("bigint")).rangeBetween(-6, 0)
    est = daily_sk.select(
        "d", F.hll_sketch_estimate(F.hll_union_agg("sk").over(w7)).alias("est")
    )
    return (
        est.join(exact, est["d"] == exact["d_i"])
        .select(
            "d",
            "n_users_exact",
            (
                F.abs(F.col("est") - F.col("n_users_exact"))
                <= 0.05 * F.col("n_users_exact")
            ).alias("hll_7day_ok"),
        )
        .orderBy("d")
    )


@_register(
    "star_schema_fk_audit",
    """
    SELECT 'lineitem_orphans' AS check_name,
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) AS n_bad
    UNION ALL
    SELECT 'orders_without_lines',
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                              WHERE l.l_orderkey = o.o_orderkey))
    UNION ALL
    SELECT 'orders_orphan_customer',
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'suppliers_unreferenced',
           (SELECT count(*) FROM supplier s
            WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                              WHERE l.l_suppkey = s.s_suppkey))
    ORDER BY check_name
    """,
    "referential-integrity audit across the star schema: orphan "
    "lineitems (fact rows whose order vanished — the partial-load "
    "smoking gun), childless orders, orders pointing at missing "
    "customers, and unreferenced suppliers — the FK checks a "
    "warehouse load gate runs because parquet enforces none of them. "
    "Each check is one LEFT ANTI join (dimension sides broadcast, "
    "the fact-fact pair shuffles on the join key once); the four "
    "1-row counts union into a fixed 4-row report, so driver state "
    "is constant regardless of table size",
)
def star_schema_fk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey")

    def count_row(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").alias("n_bad")).select(
            F.lit(name).alias("check_name"), "n_bad"
        )

    checks = [
        count_row(
            "lineitem_orphans",
            li.join(o, li["l_orderkey"] == o["o_orderkey"], "left_anti"),
        ),
        count_row(
            "orders_without_lines",
            o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_anti"),
        ),
        count_row(
            "orders_orphan_customer",
            o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"], "left_anti"),
        ),
        count_row(
            "suppliers_unreferenced",
            s.join(li, s["s_suppkey"] == li["l_suppkey"], "left_anti"),
        ),
    ]
    return reduce(lambda a, b: a.unionByName(b), checks).orderBy("check_name")


_BOOT_B = 20  # bootstrap replicates (one-pass Poisson bootstrap)


def _boot_u_sql(b: int) -> str:
    """Deterministic uniform in [0,1) for (order, replicate): md5-derived,
    bit-identical in Spark and DuckDB (the minhash hash convention).
    Each digest yields FOUR independent 32-bit uniforms (8-hex slices),
    so 20 replicates cost 5 md5s per row instead of 20 — the hashing is
    the whole scan cost of the one-pass bootstrap."""
    off = 1 + 8 * (b % 4)
    return (
        f"CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '|{b // 4}'), "
        f"{off}, 8)) AS BIGINT) / 4294967296.0"
    )


def _boot_w_sql(b: int) -> str:
    """Poisson(1)-approximating weight from the uniform draw (pmf
    cumulative cuts .3679/.7358/.9197/.9810, tail mass on 4)."""
    u = _boot_u_sql(b)
    return (
        f"CASE WHEN {u} < 0.3679 THEN 0 WHEN {u} < 0.7358 THEN 1 "
        f"WHEN {u} < 0.9197 THEN 2 WHEN {u} < 0.9810 THEN 3 ELSE 4 END"
    )


@_register(
    "bootstrap_mean_ci",
    f"""
    WITH a AS (
        SELECT count(*) AS n, avg(o_totalprice) AS grand_mean,
           {", ".join(f"sum(({_boot_w_sql(b)}) * o_totalprice) AS wx{b}, sum({_boot_w_sql(b)}) AS w{b}" for b in range(_BOOT_B))}
        FROM orders
    ),
    m AS (
        SELECT n, grand_mean,
               list_sort([{", ".join(f"round(wx{b} / w{b}, 4)" for b in range(_BOOT_B))}]) AS means
        FROM a
    )
    SELECT CAST(n AS BIGINT) AS n_orders,
           round(grand_mean, 4) AS grand_mean,
           means[2] + 0.0 AS boot_ci_lo,
           means[{_BOOT_B - 1}] + 0.0 AS boot_ci_hi
    FROM m
    """,
    "one-pass Poisson bootstrap 90% CI for the mean order price: each "
    "of 20 replicates weights every row by a deterministic "
    "md5-derived Poisson(1)-approximating count, so ALL replicate "
    "sums accumulate in a SINGLE scan/aggregate (the resample-free "
    "bootstrap used on datasets too large to resample; Chamandy et "
    "al., 'Estimating Uncertainty for Massive Data Streams') — no "
    "per-replicate pass, no data copy, and the percentile CI falls "
    "out of sorting the 20-element replicate-mean array driver-side-"
    "free. Deterministic hash weights make the CI itself "
    "hash-comparable across engines; replicate means round to 4dp "
    "before the sort so summation order cannot reorder ties",
)
def bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")

    def u(b: int):
        # four 32-bit uniforms per digest (8-hex slices): 20 replicates
        # cost 5 md5s/row, not 20 — in lockstep with _boot_u_sql
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("o_orderkey").cast("string"), F.lit(f"|{b // 4}")
                        )
                    ),
                    1 + 8 * (b % 4),
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            / F.lit(4294967296.0)
        )

    def w(b: int):
        ub = u(b)
        return (
            F.when(ub < 0.3679, 0)
            .when(ub < 0.7358, 1)
            .when(ub < 0.9197, 2)
            .when(ub < 0.9810, 3)
            .otherwise(4)
        )

    # weights project BEFORE the aggregate: inside agg expressions the
    # hash subtree is re-evaluated once per aggregate function (no CSE
    # across the 40 sums — measured), while a Project computes each
    # replicate weight once per row
    proj = o.select(
        "o_totalprice", *[w(b).alias(f"__w{b}") for b in range(_BOOT_B)]
    )
    aggs = [F.count("*").alias("n"), F.avg("o_totalprice").alias("grand_mean")]
    for b in range(_BOOT_B):
        aggs.append(
            F.sum(F.col(f"__w{b}") * F.col("o_totalprice")).alias(f"wx{b}")
        )
        aggs.append(F.sum(f"__w{b}").alias(f"w{b}"))
    a = proj.agg(*aggs)
    means = F.array_sort(
        F.array(
            *[
                F.round(F.col(f"wx{b}") / F.col(f"w{b}"), 4)
                for b in range(_BOOT_B)
            ]
        )
    )
    return a.select(
        F.col("n").cast("bigint").alias("n_orders"),
        F.round("grand_mean", 4).alias("grand_mean"),
        (F.element_at(means, 2) + 0.0).alias("boot_ci_lo"),
        (F.element_at(means, _BOOT_B - 1) + 0.0).alias("boot_ci_hi"),
    )


@_register(
    "trade_community_modularity",
    """
    WITH raw AS (
        SELECT cn.n_name AS a, sn.n_name AS b, count(*) AS w
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
        JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
        GROUP BY cn.n_name, sn.n_name
    ),
    sym AS (
        SELECT a, b, CAST(sum(w) AS DOUBLE) AS w
        FROM (
            SELECT a, b, w FROM raw
            UNION ALL
            SELECT b AS a, a AS b, w FROM raw
        )
        WHERE a <> b
        GROUP BY a, b
    ),
    nodes AS (SELECT DISTINCT a AS node FROM sym),
    l0 AS (SELECT node, node AS lbl FROM nodes),
    s1 AS (SELECT e.a, p.lbl, sum(e.w) AS s
           FROM sym e JOIN l0 p ON e.b = p.node GROUP BY e.a, p.lbl),
    b1 AS (SELECT a, lbl FROM (
               SELECT a, lbl, row_number() OVER (
                   PARTITION BY a ORDER BY s DESC, lbl) AS rn FROM s1)
           WHERE rn = 1),
    l1 AS (SELECT p.node, coalesce(b.lbl, p.lbl) AS lbl
           FROM l0 p LEFT JOIN b1 b ON p.node = b.a),
    s2 AS (SELECT e.a, p.lbl, sum(e.w) AS s
           FROM sym e JOIN l1 p ON e.b = p.node GROUP BY e.a, p.lbl),
    b2 AS (SELECT a, lbl FROM (
               SELECT a, lbl, row_number() OVER (
                   PARTITION BY a ORDER BY s DESC, lbl) AS rn FROM s2)
           WHERE rn = 1),
    l2 AS (SELECT p.node, coalesce(b.lbl, p.lbl) AS lbl
           FROM l1 p LEFT JOIN b2 b ON p.node = b.a),
    s3 AS (SELECT e.a, p.lbl, sum(e.w) AS s
           FROM sym e JOIN l2 p ON e.b = p.node GROUP BY e.a, p.lbl),
    b3 AS (SELECT a, lbl FROM (
               SELECT a, lbl, row_number() OVER (
                   PARTITION BY a ORDER BY s DESC, lbl) AS rn FROM s3)
           WHERE rn = 1),
    lab AS (SELECT p.node, coalesce(b.lbl, p.lbl) AS lbl
            FROM l2 p LEFT JOIN b3 b ON p.node = b.a),
    mm AS (SELECT sum(w) AS m2 FROM sym),
    deg AS (SELECT a AS node, sum(w) AS dw FROM sym GROUP BY a),
    dc AS (SELECT l.lbl, sum(d.dw) AS d_c, count(*) AS n_members
           FROM deg d JOIN lab l ON d.node = l.node GROUP BY l.lbl),
    ec AS (SELECT la.lbl, sum(e.w) AS e_c
           FROM sym e
           JOIN lab la ON e.a = la.node
           JOIN lab lb ON e.b = lb.node
           WHERE la.lbl = lb.lbl
           GROUP BY la.lbl)
    SELECT dc.lbl AS community,
           CAST(dc.n_members AS BIGINT) AS n_members,
           round(coalesce(ec.e_c, 0) / mm.m2, 6) + 0.0 AS internal_frac,
           round(dc.d_c / mm.m2, 6) + 0.0 AS degree_frac,
           round(coalesce(ec.e_c, 0) / mm.m2
                 - (dc.d_c / mm.m2) * (dc.d_c / mm.m2), 6) + 0.0
               AS modularity_contrib
    FROM dc LEFT JOIN ec ON dc.lbl = ec.lbl, mm
    ORDER BY community
    """,
    "Newman modularity decomposition of the label-propagation "
    "partition (`nation_trade_communities`): per community, the "
    "within-community edge fraction e_c/2m against the null "
    "expectation (d_c/2m)^2 — the audit that tells you whether LPA "
    "found structure or noise (sum of contributions ~0 means the "
    "partition is no better than random wiring). Runs the SAME "
    "deterministic 3-round LPA, then two rollups over the aggregated "
    "edge list with the 25-node label table broadcast everywhere and "
    "the total edge mass as a 1-row scalar; integer-valued weight "
    "sums keep both engines exact before the rounded divisions",
)
def trade_community_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), F.col("o_custkey") == c["c_custkey"])
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("src"))),
            F.col("c_nationkey") == F.col("ck"),
        )
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("dst"))),
            F.col("s_nationkey") == F.col("sk"),
        )
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )
    labels = graph.label_propagation(edges, "src", "dst", weight="w", iterations=3)
    e0 = edges.select(
        F.col("src").alias("a"), F.col("dst").alias("b"), F.col("w").cast("double").alias("w")
    )
    sym = (
        e0.unionByName(e0.select(F.col("b").alias("a"), F.col("a").alias("b"), "w"))
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=False)
    )
    mm = sym.agg(F.sum("w").alias("m2"))
    deg = sym.groupBy(F.col("a").alias("node")).agg(F.sum("w").alias("dw"))
    lab = labels.select("node", "lbl").localCheckpoint(eager=False)
    dc = (
        deg.join(F.broadcast(lab), "node")
        .groupBy("lbl")
        .agg(F.sum("dw").alias("d_c"), F.count("*").alias("n_members"))
    )
    ec = (
        sym.join(
            F.broadcast(lab.select(F.col("node").alias("a"), F.col("lbl").alias("la"))), "a"
        )
        .join(
            F.broadcast(lab.select(F.col("node").alias("b"), F.col("lbl").alias("lb"))), "b"
        )
        .filter(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("lbl"))
        .agg(F.sum("w").alias("e_c"))
    )
    return (
        dc.join(ec, "lbl", "left")
        .crossJoin(F.broadcast(mm))
        .select(
            F.col("lbl").alias("community"),
            F.col("n_members").cast("bigint").alias("n_members"),
            (F.round(F.coalesce("e_c", F.lit(0.0)) / F.col("m2"), 6) + 0.0).alias(
                "internal_frac"
            ),
            (F.round(F.col("d_c") / F.col("m2"), 6) + 0.0).alias("degree_frac"),
            (
                F.round(
                    F.coalesce("e_c", F.lit(0.0)) / F.col("m2")
                    - (F.col("d_c") / F.col("m2")) * (F.col("d_c") / F.col("m2")),
                    6,
                )
                + 0.0
            ).alias("modularity_contrib"),
        )
        .orderBy("community")
    )


@_register(
    "revenue_theil_decomposition",
    """
    WITH cr AS (
        SELECT o.o_custkey, c.c_nationkey, sum(o.o_totalprice) AS x
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY o.o_custkey, c.c_nationkey
    ),
    g AS (
        SELECT n.n_name AS nation,
               count(*) AS n_g,
               sum(cr.x) AS x_g,
               sum(cr.x * ln(cr.x)) AS xlx_g
        FROM cr JOIN nation n ON cr.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    ),
    tot AS (SELECT sum(n_g) AS n, sum(x_g) AS x FROM g)
    SELECT nation,
           CAST(n_g AS BIGINT) AS n_customers,
           round(x_g / tot.x, 6) + 0.0 AS revenue_share,
           round((x_g / tot.x) * (xlx_g / x_g - ln(x_g / n_g)), 6) + 0.0
               AS theil_within,
           round((x_g / tot.x) * ln((x_g / n_g) / (tot.x / tot.n)), 6) + 0.0
               AS theil_between
    FROM g, tot
    ORDER BY nation
    """,
    "Theil-T inequality decomposition of customer revenue by nation — "
    "the grouped analysis Gini cannot do: total inequality splits "
    "EXACTLY into within-nation spread (share-weighted per-nation "
    "Theil) plus between-nation mean gaps, so you can tell whether "
    "revenue concentration lives inside markets or across them. "
    "Computed entirely from per-nation moment sums (n, sum x, "
    "sum x*ln x): T_g = (sum x ln x)/X_g - ln(mu_g) needs NO second "
    "pass over customers — one custkey rollup, one broadcast-dim "
    "nation rollup, grand totals as a 1-row scalar; rounded at "
    "output, far above the summation-order noise floor",
)
def revenue_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cr = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("o_custkey", "c_nationkey")
        .agg(F.sum("o_totalprice").alias("x"))
    )
    g = (
        cr.join(F.broadcast(n), cr["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_g"),
            F.sum("x").alias("x_g"),
            F.sum(F.col("x") * F.log("x")).alias("xlx_g"),
        )
    )
    tot = g.agg(F.sum("n_g").alias("n"), F.sum("x_g").alias("x"))
    share = F.col("x_g") / F.col("x")
    mu_g = F.col("x_g") / F.col("n_g")
    mu = F.col("x") / F.col("n")
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "nation",
            F.col("n_g").cast("bigint").alias("n_customers"),
            (F.round(share, 6) + 0.0).alias("revenue_share"),
            (
                F.round(share * (F.col("xlx_g") / F.col("x_g") - F.log(mu_g)), 6)
                + 0.0
            ).alias("theil_within"),
            (F.round(share * F.log(mu_g / mu), 6) + 0.0).alias("theil_between"),
        )
        .orderBy("nation")
    )


@_register(
    "lang_id_agreement_kappa",
    f"""
    WITH scored AS (
        SELECT doc_id, lang,
               {_d_lang_score('de')} AS s_de,
               {_d_lang_score('en')} AS s_en,
               {_d_lang_score('es')} AS s_es,
               {_d_lang_score('fr')} AS s_fr
        FROM documents
    ),
    pred AS (
        SELECT lang,
               CASE WHEN greatest(s_de, s_en, s_es, s_fr) <= 0 THEN 'und'
                    WHEN s_fr = greatest(s_de, s_en, s_es, s_fr) THEN 'fr'
                    WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                    WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                    ELSE 'de' END AS lang_pred
        FROM scored
    ),
    cm AS (
        SELECT lang, lang_pred, count(*) AS n FROM pred GROUP BY lang, lang_pred
    ),
    tot AS (SELECT sum(n) AS n FROM cm),
    po AS (SELECT coalesce(sum(n), 0) AS agree FROM cm WHERE lang = lang_pred),
    rt AS (SELECT lang AS lbl, sum(n) AS r FROM cm GROUP BY lang),
    ct AS (SELECT lang_pred AS lbl, sum(n) AS c FROM cm GROUP BY lang_pred),
    pe AS (
        SELECT sum(coalesce(rt.r, 0) * coalesce(ct.c, 0)) AS rc
        FROM rt FULL JOIN ct ON rt.lbl = ct.lbl
    )
    SELECT CAST(tot.n AS BIGINT) AS n_docs,
           round(po.agree * 1.0 / tot.n, 6) AS observed_agreement,
           round(pe.rc * 1.0 / (tot.n * tot.n), 6) AS expected_agreement,
           round((po.agree * 1.0 / tot.n - pe.rc * 1.0 / (tot.n * tot.n))
                 / (1 - pe.rc * 1.0 / (tot.n * tot.n)), 6) + 0.0
               AS cohens_kappa
    FROM tot, po, pe
    """,
    "Cohen's kappa between the stopword-coverage lang-id heuristic "
    "(`lang_id`) and the labeled language — chance-corrected "
    "agreement, the honest version of raw accuracy when the label "
    "distribution is skewed (a majority-class guesser scores high "
    "accuracy but kappa ~0). The classifier-vs-reference audit shape "
    "that also serves annotator-agreement QA on labeling pipelines. "
    "Everything reduces to the labels^2-sized confusion matrix: "
    "marginals re-aggregate it, the three scalars cross in as 1-row "
    "broadcasts; exact integer ratios make kappa engine-deterministic",
)
def lang_id_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    pred = text.language_id(docs.select("doc_id", "lang", "text"), "text").select(
        "lang", "lang_pred"
    )
    cm = pred.groupBy("lang", "lang_pred").agg(F.count("*").alias("n"))
    tot = cm.agg(F.sum("n").alias("n"))
    po = cm.filter(F.col("lang") == F.col("lang_pred")).agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("agree")
    )
    rt = cm.groupBy(F.col("lang").alias("lbl")).agg(F.sum("n").alias("r"))
    ct = cm.groupBy(F.col("lang_pred").alias("lbl")).agg(F.sum("n").alias("c"))
    pe = (
        rt.join(ct, "lbl", "full")
        .agg(
            F.sum(
                F.coalesce("r", F.lit(0)) * F.coalesce("c", F.lit(0))
            ).alias("rc")
        )
    )
    po_f = F.col("agree") * 1.0 / F.col("n")
    pe_f = F.col("rc") * 1.0 / (F.col("n") * F.col("n"))
    return (
        tot.crossJoin(F.broadcast(po))
        .crossJoin(F.broadcast(pe))
        .select(
            F.col("n").cast("bigint").alias("n_docs"),
            F.round(po_f, 6).alias("observed_agreement"),
            F.round(pe_f, 6).alias("expected_agreement"),
            (F.round((po_f - pe_f) / (1 - pe_f), 6) + 0.0).alias("cohens_kappa"),
        )
    )


@_register(
    "lang_id_class_prf",
    f"""
    WITH scored AS (
        SELECT doc_id, lang,
               {_d_lang_score('de')} AS s_de,
               {_d_lang_score('en')} AS s_en,
               {_d_lang_score('es')} AS s_es,
               {_d_lang_score('fr')} AS s_fr
        FROM documents
    ),
    pred AS (
        SELECT lang,
               CASE WHEN greatest(s_de, s_en, s_es, s_fr) <= 0 THEN 'und'
                    WHEN s_fr = greatest(s_de, s_en, s_es, s_fr) THEN 'fr'
                    WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                    WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                    ELSE 'de' END AS lang_pred
        FROM scored
    ),
    cm AS (
        SELECT lang, lang_pred, count(*) AS n FROM pred GROUP BY lang, lang_pred
    ),
    rt AS (SELECT lang AS lbl, sum(n) AS n_true FROM cm GROUP BY lang),
    ct AS (SELECT lang_pred AS lbl, sum(n) AS n_pred FROM cm GROUP BY lang_pred),
    tp AS (SELECT lang AS lbl, sum(n) AS n_correct FROM cm
           WHERE lang = lang_pred GROUP BY lang),
    j AS (
        SELECT coalesce(rt.lbl, ct.lbl) AS label,
               coalesce(rt.n_true, 0) AS n_true,
               coalesce(ct.n_pred, 0) AS n_pred,
               coalesce(tp.n_correct, 0) AS n_correct
        FROM rt
        FULL JOIN ct ON rt.lbl = ct.lbl
        LEFT JOIN tp ON coalesce(rt.lbl, ct.lbl) = tp.lbl
    )
    SELECT label,
           CAST(n_true AS BIGINT) AS n_true,
           CAST(n_pred AS BIGINT) AS n_pred,
           CAST(n_correct AS BIGINT) AS n_correct,
           round(CASE WHEN n_pred > 0
                      THEN n_correct * 1.0 / n_pred END, 6) + 0.0 AS precision,
           round(CASE WHEN n_true > 0
                      THEN n_correct * 1.0 / n_true END, 6) + 0.0 AS recall,
           round(CASE WHEN n_correct > 0
                      THEN 2.0 * n_correct / (n_pred + n_true)
                      ELSE 0.0 END, 6) + 0.0 AS f1
    FROM j
    ORDER BY label
    """,
    "per-class precision / recall / F1 for the lang-id heuristic "
    "against labels — the confusion-matrix decomposition kappa "
    "summarizes (`lang_id_agreement_kappa`): which languages the "
    "classifier over-claims (low precision) vs misses (low recall), "
    "including labels it never predicts (zh -> recall 0, NULL "
    "precision) and predictions with no true class (und). One "
    "labels^2 confusion rollup re-aggregated three ways, "
    "full-outer-joined on the label union — output is labels-sized; "
    "exact integer ratios, F1 = 2TP/(pred+true) avoids the P+R "
    "division chain (exact in both engines)",
)
def lang_id_class_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    pred = text.language_id(docs.select("doc_id", "lang", "text"), "text").select(
        "lang", "lang_pred"
    )
    cm = pred.groupBy("lang", "lang_pred").agg(F.count("*").alias("n"))
    rt = cm.groupBy(F.col("lang").alias("lbl")).agg(F.sum("n").alias("n_true"))
    ct = cm.groupBy(F.col("lang_pred").alias("lbl")).agg(
        F.sum("n").alias("n_pred")
    )
    tp = (
        cm.filter(F.col("lang") == F.col("lang_pred"))
        .groupBy(F.col("lang").alias("lbl"))
        .agg(F.sum("n").alias("n_correct"))
    )
    j = (
        rt.join(ct, "lbl", "full")
        .join(tp, "lbl", "left")
        .select(
            F.col("lbl").alias("label"),
            F.coalesce("n_true", F.lit(0)).alias("n_true"),
            F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
            F.coalesce("n_correct", F.lit(0)).alias("n_correct"),
        )
    )
    return j.select(
        "label",
        F.col("n_true").cast("bigint").alias("n_true"),
        F.col("n_pred").cast("bigint").alias("n_pred"),
        F.col("n_correct").cast("bigint").alias("n_correct"),
        (
            F.round(
                F.when(F.col("n_pred") > 0, F.col("n_correct") * 1.0 / F.col("n_pred")),
                6,
            )
            + 0.0
        ).alias("precision"),
        (
            F.round(
                F.when(F.col("n_true") > 0, F.col("n_correct") * 1.0 / F.col("n_true")),
                6,
            )
            + 0.0
        ).alias("recall"),
        (
            F.round(
                F.when(
                    F.col("n_correct") > 0,
                    2.0 * F.col("n_correct") / (F.col("n_pred") + F.col("n_true")),
                ).otherwise(0.0),
                6,
            )
            + 0.0
        ).alias("f1"),
    ).orderBy("label")


@_register(
    "source_diversity_by_lang",
    """
    WITH c AS (
        SELECT lang, source, count(*) AS n
        FROM documents GROUP BY lang, source
    ),
    t AS (SELECT lang, sum(n) AS tot FROM c GROUP BY lang)
    SELECT c.lang,
           CAST(max(t.tot) AS BIGINT) AS n_docs,
           CAST(count(*) AS INT) AS n_sources,
           round(sum(power(c.n * 1.0 / t.tot, 2)), 6) AS simpson_index,
           round(1.0 / sum(power(c.n * 1.0 / t.tot, 2)), 4)
               AS effective_sources,
           round(-sum((c.n * 1.0 / t.tot) * ln(c.n * 1.0 / t.tot)), 6)
               + 0.0 AS shannon_entropy
    FROM c JOIN t ON c.lang = t.lang
    GROUP BY c.lang
    ORDER BY c.lang
    """,
    "source-diversity audit per language: Simpson concentration "
    "sum(p^2), its inverse (the EFFECTIVE number of sources — 20 "
    "sources contributing like 3 means the language rides on 3 "
    "crawls), and Shannon entropy — the mixture-robustness check "
    "before trusting a language's volume number, and the ecological "
    "twin of `source_mixture_weights` (size) and `source_unigram_jsd` "
    "(content). Everything reduces to the langs x sources cell "
    "rollup with per-language totals joined back broadcast-sized; "
    "exact integer ratios under the rounding",
)
def source_diversity_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("lang", "source").agg(F.count("*").alias("n"))
    t = c.groupBy("lang").agg(F.sum("n").alias("tot"))
    p = F.col("n") * 1.0 / F.col("tot")
    return (
        c.join(F.broadcast(t), "lang")
        .groupBy("lang")
        .agg(
            F.max("tot").cast("bigint").alias("n_docs"),
            F.count("*").cast("int").alias("n_sources"),
            F.round(F.sum(F.pow(p, 2)), 6).alias("simpson_index"),
            F.round(1.0 / F.sum(F.pow(p, 2)), 4).alias("effective_sources"),
            (F.round(-F.sum(p * F.log(p)), 6) + 0.0).alias("shannon_entropy"),
        )
        .orderBy("lang")
    )


@_register(
    "redact_pii_documents",
    r"""
    WITH seeded AS (
        SELECT doc_id,
               text || CASE CAST(doc_id % 4 AS INT)
                   WHEN 0 THEN ' contact user' || doc_id
                            || '@mail.example.com or (555) 123-4567'
                   WHEN 1 THEN ' ssn 123-45-6789 from 192.168.1.'
                            || CAST(doc_id % 250 AS VARCHAR)
                   ELSE '' END AS text
        FROM documents
    ),
    red AS (
        SELECT doc_id,
               regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                   text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
                   '(\+?\d{1,2}[ -])?(\(\d{3}\) ?|\b\d{3}[ -])\d{3}[ -]\d{4}\b',
                   '<PHONE>', 'g'),
                   '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS rtext
        FROM seeded
    )
    SELECT doc_id,
           CAST((len(rtext) - len(replace(rtext, '<EMAIL>', ''))) / 7 AS INT)
               AS n_emails,
           CAST((len(rtext) - len(replace(rtext, '<PHONE>', ''))) / 7 AS INT)
               AS n_phones,
           CAST((len(rtext) - len(replace(rtext, '<SSN>', ''))) / 5 AS INT)
               AS n_ssns,
           CAST((len(rtext) - len(replace(rtext, '<IP>', ''))) / 4 AS INT)
               AS n_ips,
           md5(rtext) AS redacted_fp
    FROM red
    ORDER BY doc_id
    """,
    "PII scrub before tokenization (text.redact_pii): chained "
    "regexp_replace for emails, SSNs, phones, IPv4 — RE2-safe rule "
    "strings shared verbatim between the Spark plan and the oracle, "
    "applied email-first so digit runs never half-match later rules. "
    "Deterministic PII is seeded into the fixture text per doc (the "
    "corpus itself is synthetic words), then the md5 of the redacted "
    "text plus per-type redaction counts are hash-matched — proving "
    "replace-ALL semantics and pattern parity across regex engines. "
    "Pure narrow compute: scan-speed at 100 TB, zero shuffle "
    "(ORDER BY is presentation)",
)
def redact_pii_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    seeded = F.concat(
        F.col("text"),
        F.when(
            (did % 4) == 0,
            F.concat(
                F.lit(" contact user"),
                did.cast("string"),
                F.lit("@mail.example.com or (555) 123-4567"),
            ),
        )
        .when(
            (did % 4) == 1,
            F.concat(
                F.lit(" ssn 123-45-6789 from 192.168.1."),
                (did % 250).cast("string"),
            ),
        )
        .otherwise(F.lit("")),
    )
    red = text.redact_pii(seeded)

    def n_of(token: str) -> F.Column:
        return (
            (F.length(red) - F.length(F.replace(red, F.lit(token), F.lit(""))))
            / len(token)
        ).cast("int")

    return docs.select(
        "doc_id",
        n_of("<EMAIL>").alias("n_emails"),
        n_of("<PHONE>").alias("n_phones"),
        n_of("<SSN>").alias("n_ssns"),
        n_of("<IP>").alias("n_ips"),
        F.md5(red.cast("binary")).alias("redacted_fp"),
    ).orderBy("doc_id")


@_register(
    "temperature_mix_sources",
    """
    WITH counts AS (
        SELECT source, count(*) AS n_s FROM documents GROUP BY source
    ),
    quotas AS (
        SELECT source, n_s,
               CAST(floor(0.5 * sum(n_s) OVER ()
                          * sqrt(n_s) / sum(sqrt(n_s)) OVER ()) AS BIGINT)
                   AS quota
        FROM counts
    ),
    ranked AS (
        SELECT d.doc_id, d.source,
               row_number() OVER (PARTITION BY d.source
                                  ORDER BY md5(CAST(d.doc_id AS VARCHAR)),
                                           d.doc_id) AS rn
        FROM documents d
    )
    SELECT r.doc_id, r.source
    FROM ranked r JOIN quotas q ON r.source = q.source
    WHERE r.rn <= q.quota
    ORDER BY r.doc_id
    """,
    "temperature-based source mixing (T=2, target fraction 0.5): the "
    "LLM-corpus rebalancer — per-source sampling quotas proportional "
    "to n^(1/T), flattening the source distribution so a dominant "
    "crawl stops drowning small high-quality sources. Selection is a "
    "content-hash rank within source (deterministic, reproducible "
    "under repartitioning) cut at the quota; quotas derive from one "
    "tiny per-source rollup with window totals (the fact is scanned "
    "once for counts, once for ranking). At 100 TB both passes are "
    "one shuffle each and the quota table broadcasts",
)
def temperature_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n_s"))
    w = Window.partitionBy()
    quota = F.floor(
        0.5 * F.sum("n_s").over(w) * F.sqrt("n_s") / F.sum(F.sqrt("n_s")).over(w)
    ).cast("bigint")
    quotas = counts.select("source", quota.alias("quota"))
    rw = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id"
    )
    ranked = docs.select(
        "doc_id", "source", F.row_number().over(rw).alias("rn")
    )
    return (
        ranked.join(F.broadcast(quotas), "source")
        .filter(F.col("rn") <= F.col("quota"))
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


@_register(
    "holt_forecast_users",
    """
    WITH RECURSIVE
    daily AS (
        SELECT user_id, CAST(ts AS DATE) AS d, count(*) AS y
        FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    srs AS (
        SELECT user_id,
               CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                    AS INT) AS idx,
               CAST(y AS DOUBLE) AS y
        FROM daily
    ),
    lens AS (SELECT user_id, max(idx) AS n FROM srs GROUP BY user_id),
    rec AS (
        SELECT s1.user_id, 1 AS t, s1.y AS l, s2.y - s1.y AS b
        FROM srs s1 JOIN srs s2
          ON s1.user_id = s2.user_id AND s1.idx = 1 AND s2.idx = 2
        UNION ALL
        SELECT r.user_id, r.t + 1,
               0.5 * s.y + 0.5 * (r.l + r.b),
               0.3 * ((0.5 * s.y + 0.5 * (r.l + r.b)) - r.l) + 0.7 * r.b
        FROM rec r JOIN srs s ON s.user_id = r.user_id AND s.idx = r.t + 1
    )
    SELECT r.user_id,
           CAST(lens.n AS INT) AS n_days,
           round(r.l, 4) + 0.0 AS level,
           round(r.b, 4) + 0.0 AS trend,
           round(r.l + 3 * r.b, 4) + 0.0 AS forecast_3day
    FROM rec r JOIN lens ON r.user_id = lens.user_id AND r.t = lens.n
    ORDER BY r.user_id
    """,
    "grouped Holt linear-trend forecasting (double exponential "
    "smoothing, alpha=0.5 gamma=0.3): per user, the daily activity "
    "series folds through the level/trend recursion l_t = a*y + "
    "(1-a)(l+b), b_t = g*(l_t - l_prev) + (1-g)*b, initialized l_1 = "
    "y_1, b_1 = y_2 - y_1; forecast = level + 3*trend. The fold is ONE "
    "JVM-side F.aggregate over each user's date-sorted series (per-key "
    "state bounded by the forecast window — 30 days here, never "
    "corpus-sized), so the whole operator is one shuffle on user_id "
    "and scales horizontally; the oracle replays the identical "
    "IEEE-double recursion as a recursive CTE, so the hash match pins "
    "every intermediate to the bit. The sequential-state operator "
    "family (EWMA rides pandas; Holt shows the built-in-fold path)",
)
def holt_forecast_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # one user_id exchange up front: subset partitioning satisfies BOTH
    # the (user, day) rollup and the per-user series collect (the
    # autocorr_lag1_users pattern) — without it the daily rollup
    # shuffles the corpus on (user, day) and then re-shuffles on user
    daily = (
        spread(ev, "user_id")
        .groupBy("user_id", F.col("ts").cast("date").alias("d"))
        .agg(F.count("*").alias("y"))
    )
    srs = (
        daily.groupBy("user_id")
        .agg(F.array_sort(F.collect_list(F.struct("d", "y"))).alias("a"))
        .filter(F.size("a") >= 2)
    )
    vals = F.transform("a", lambda s: s["y"].cast("double"))
    y1 = F.element_at(vals, 1)
    y2 = F.element_at(vals, 2)
    init = F.struct(y1.alias("l"), (y2 - y1).alias("b"))
    rest = F.slice(vals, 2, F.size(vals) - 1)

    def step(acc, x):
        l_new = F.lit(0.5) * x + F.lit(0.5) * (acc["l"] + acc["b"])
        b_new = F.lit(0.3) * (l_new - acc["l"]) + F.lit(0.7) * acc["b"]
        return F.struct(l_new.alias("l"), b_new.alias("b"))

    acc = F.aggregate(rest, init, step)
    return srs.select(
        "user_id",
        F.size("a").alias("n_days"),
        (F.round(acc["l"], 4) + F.lit(0.0)).alias("level"),
        (F.round(acc["b"], 4) + F.lit(0.0)).alias("trend"),
        (F.round(acc["l"] + F.lit(3) * acc["b"], 4) + F.lit(0.0)).alias(
            "forecast_3day"
        ),
    ).orderBy("user_id")


@_register(
    "linear_quality_classifier",
    r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents
    ),
    f AS (
        SELECT doc_id,
               sum(((CAST(('0x' || substr(md5(tok), 1, 8))::UBIGINT % 64
                          AS BIGINT) * 37) % 21 - 10) / 16.0) AS s,
               count(*) AS n
        FROM toks GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(n AS INT) AS n_tokens,
           round(-0.25 + s / n, 6) + 0.0 AS logit,
           round(1.0 / (1.0 + exp(-(-0.25 + s / n))), 4) + 0.0 AS score,
           (1.0 / (1.0 + exp(-(-0.25 + s / n))) >= 0.5) AS keep
    FROM f
    ORDER BY doc_id
    """,
    "fasttext-style linear quality classifier INFERENCE at corpus "
    "scale: every token hashes into one of 64 feature buckets "
    "(md5-derived, engine-portable), the bucket's weight comes from a "
    "broadcast-sized weight table (synthetic deterministic weights "
    "w[j] = ((j*37)%21-10)/16 — SIXTEENTHS, so every per-doc "
    "weight-sum is an exact dyadic rational and order-independent "
    "across engines), mean-pooled into a logit and squashed through a "
    "sigmoid. The Spark side is a per-row JVM fold over the token "
    "array (F.aggregate + element_at into a 64-literal weight array): "
    "ZERO shuffles except the presentation sort — the entire "
    "classifier runs at scan speed, exactly how production quality "
    "filters (fastText/DCLM-style) deploy over 100 TB. Swap the "
    "synthetic weights for trained ones and nothing else changes",
)
def linear_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    weights = F.array(*[F.lit(((j * 37) % 21 - 10) / 16.0) for j in range(64)])
    toks = text.tokens("text")

    def w_of(tok):
        bucket = (
            F.conv(F.substring(F.md5(tok.cast("binary")), 1, 8), 16, 10).cast("long")
            % 64
        )
        return F.element_at(weights, (bucket + 1).cast("int"))

    n = F.size(toks)
    s = F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + w_of(t))
    logit = F.lit(-0.25) + s / n
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    return docs.select(
        "doc_id",
        n.cast("int").alias("n_tokens"),
        (F.round(logit, 6) + F.lit(0.0)).alias("logit"),
        (F.round(score, 4) + F.lit(0.0)).alias("score"),
        (score >= 0.5).alias("keep"),
    ).orderBy("doc_id")


@_register(
    "source_shingle_overlap",
    f"""
    WITH ss AS (
        SELECT DISTINCT source, unnest({_D_SHINGLES}) AS sh
        FROM documents
    ),
    counts AS (SELECT source, count(*) AS n FROM ss GROUP BY source),
    inter AS (
        SELECT a.source AS source_a, b.source AS source_b,
               count(*) AS n_common
        FROM ss a JOIN ss b ON a.sh = b.sh AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT i.source_a, i.source_b,
           CAST(ca.n AS BIGINT) AS n_a,
           CAST(cb.n AS BIGINT) AS n_b,
           CAST(i.n_common AS BIGINT) AS n_common,
           round(i.n_common * 1.0 / (ca.n + cb.n - i.n_common), 6) + 0.0
               AS jaccard
    FROM inter i
    JOIN counts ca ON i.source_a = ca.source
    JOIN counts cb ON i.source_b = cb.source
    ORDER BY source_a, source_b
    """,
    "cross-source contamination matrix: EXACT pairwise shingle-set "
    "Jaccard between every source pair — the audit that tells you two "
    "crawls are the same corpus in different wrappers before you "
    "weight them as independent. One distinct (source, shingle) "
    "vocabulary pass (shingle-keyed, vocabulary-sized — never the "
    "corpus), a shingle-keyed self-join for intersections (sources "
    "sharing a shingle meet in its bucket, the LSH-bucket idea with "
    "source as the id), tiny per-source totals joined back broadcast. "
    "At 100 TB the vocabulary pass swaps for per-source MinHash "
    "sketches (minhash_signatures) with this exact form as its "
    "correctness oracle",
)
def source_shingle_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = text.shingles(text.tokens("text"), k=3)
    # ONE corpus-wide shuffle: per-shingle source sets (collect_set
    # dedups, so no separate distinct pass); everything downstream —
    # per-source totals AND pairwise intersections — derives from this
    # vocabulary-sized frame. The pair expansion is the in-bucket trick
    # from lsh_candidate_pairs with source as the id (bucket size is
    # bounded by #sources). Lazy barrier: both consumers reuse the
    # blocks, first job materializes them.
    per_sh = (
        spread(docs, "doc_id")
        .select("source", F.explode(sh).alias("sh"))
        .groupBy("sh")
        .agg(F.sort_array(F.collect_set("source")).alias("srcs"))
        .localCheckpoint(eager=False)
    )
    counts = (
        per_sh.select(F.explode("srcs").alias("source"))
        .groupBy("source")
        .agg(F.count("*").alias("n"))
    )
    n = F.size("srcs")
    pair_structs = F.flatten(
        F.transform(
            "srcs",
            lambda x, i: F.transform(
                F.slice("srcs", i + F.lit(2), n - i - 1),
                lambda y: F.struct(x.alias("source_a"), y.alias("source_b")),
            ),
        )
    )
    inter = (
        per_sh.filter(n >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.source_a").alias("source_a"), F.col("p.source_b").alias("source_b"))
        .agg(F.count("*").alias("n_common"))
    )
    ca = counts.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    cb = counts.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(ca), "source_a")
        .join(F.broadcast(cb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.col("n_common").cast("bigint").alias("n_common"),
            (
                F.round(
                    F.col("n_common") * 1.0
                    / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                    6,
                )
                + F.lit(0.0)
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


@_register(
    "fuzzy_part_duplicates",
    """
    WITH p AS (
        SELECT p_partkey, p_name, p_brand,
               split_part(p_name, ' ', 2) AS noun
        FROM part
    )
    SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
    FROM p a JOIN p b
      ON a.noun = b.noun AND a.p_brand = b.p_brand
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    ORDER BY part_a, part_b
    """,
    "entity resolution over a dimension: candidate duplicate catalog "
    "entries found by BLOCKING on (noun token, brand) and verifying "
    "with Levenshtein edit distance <= 3 — the classic record-linkage "
    "two-phase shape (cheap equi-joinable blocking key prunes the "
    "O(n^2) comparison space; the expensive string metric runs only "
    "inside blocks). The verify runs at VOCABULARY grain: rows first "
    "collapse to distinct (name, ids[]) groups per block, Levenshtein "
    "compares name PAIRS (vocabulary², ~10³ comparisons), and only "
    "matched name pairs expand to id pairs — so the string metric "
    "never sees row counts, and the id expansion is output-sized "
    "(the fuzzy_name_matches design, extended to emit the id pairs). "
    "One shuffle (the block rollup), no self-join. At 100 TB add "
    "multi-pass blocking (a second key on the other token) to catch "
    "pairs the first key splits; edit distance is JVM-side "
    "F.levenshtein, semantics identical in DuckDB",
)
def fuzzy_part_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    grp = (
        part.select(
            "p_partkey",
            "p_name",
            "p_brand",
            F.element_at(F.split("p_name", " "), 2).alias("noun"),
        )
        .groupBy("noun", "p_brand", "p_name")
        .agg(F.sort_array(F.collect_list("p_partkey")).alias("ids"))
    )
    blocks = grp.groupBy("noun", "p_brand").agg(
        F.sort_array(F.collect_list(F.struct("p_name", "ids"))).alias("ms")
    )
    n = F.size("ms")
    # name-pair expansion INCLUDING the self pair (slice from position
    # i+1 keeps element i): same-name id groups produce the exact-dup
    # id pairs, distinct names the fuzzy ones
    name_pairs = F.flatten(
        F.transform(
            "ms",
            lambda x, i: F.transform(
                F.slice("ms", i + F.lit(1), n - i),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    np = (
        blocks.select(F.explode(name_pairs).alias("p"))
        .withColumn(
            "edit_dist",
            F.levenshtein(F.col("p.a.p_name"), F.col("p.b.p_name")).cast("int"),
        )
        .filter(F.col("edit_dist") <= 3)
    )
    ids_a, ids_b = F.col("p.a.ids"), F.col("p.b.ids")
    na, nb = F.col("p.a.p_name"), F.col("p.b.p_name")
    sz = F.size(ids_a)
    # self pair: id pairs within one name group (x < y by sort order)
    self_pairs = F.flatten(
        F.transform(
            ids_a,
            lambda x, i: F.transform(
                F.slice(ids_a, i + F.lit(2), sz - i - 1),
                lambda y: F.struct(
                    x.alias("part_a"),
                    y.alias("part_b"),
                    na.alias("name_a"),
                    nb.alias("name_b"),
                ),
            ),
        )
    )
    # cross pair: full ids_a × ids_b, oriented so part_a is the lesser
    # id and name_a is ITS name (ids are globally unique per part)
    cross_pairs = F.flatten(
        F.transform(
            ids_a,
            lambda x: F.transform(
                ids_b,
                lambda y: F.struct(
                    F.least(x, y).alias("part_a"),
                    F.greatest(x, y).alias("part_b"),
                    F.when(x < y, na).otherwise(nb).alias("name_a"),
                    F.when(x < y, nb).otherwise(na).alias("name_b"),
                ),
            ),
        )
    )
    rows = F.explode(F.when(na == nb, self_pairs).otherwise(cross_pairs))
    return (
        np.select("edit_dist", rows.alias("r"))
        .select(
            "r.part_a", "r.part_b", "r.name_a", "r.name_b", "edit_dist"
        )
        .orderBy("part_a", "part_b")
    )


@_register(
    "frequent_part_pairs_pcy",
    """
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    freq AS (
        SELECT l_partkey FROM items
        GROUP BY l_partkey HAVING count(*) >= 3
    ),
    fitems AS (
        SELECT i.l_orderkey, i.l_partkey FROM items i
        JOIN freq f ON i.l_partkey = f.l_partkey
    ),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS support
        FROM fitems a JOIN fitems b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING count(*) >= 2
    )
    SELECT part_a, part_b, support
    FROM pairs
    ORDER BY support DESC, part_a, part_b
    """,
    "PCY (Park-Chen-Yu) market-basket pair mining — the hashed-bucket "
    "prune SCALE.md prescribes for frequent_part_pairs at 100 TB, "
    "hash-matched against the same a-priori oracle to prove the prune "
    "LOSSLESS (bucket count >= true pair support, so no qualifying "
    "pair can land in a pruned bucket). Pass 1 generates candidate "
    "pairs in-basket (array expansion, map-side) but shuffles only "
    "65536 bucket counters (xxhash64(pair) mod B with map-side "
    "combine), never the pairs; frequent buckets broadcast back as a "
    "LEFT SEMI filter, so pass 2's pair rollup shuffles only pairs "
    "whose bucket could reach min-support — at 100 TB the shuffle "
    "volume drops by the infrequent-pair fraction, the PCY win. "
    "Baskets are lazily checkpointed so both passes share one "
    "distinct+filter computation; the bucket hash is a physical "
    "detail (never in the output), so it needs no oracle portability",
)
def frequent_part_pairs_pcy(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_buckets = 1 << 16
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    freq = (
        items.groupBy("l_partkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 3)
        .select("l_partkey")
    )
    baskets = (
        items.join(freq, "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("arr"))
        .filter(F.size("arr") >= 2)
        .localCheckpoint(eager=False)  # both passes read the baskets
    )
    n = F.size("arr")
    pair_structs = F.flatten(
        F.transform(
            "arr",
            lambda x, i: F.transform(
                F.slice("arr", i + F.lit(2), n - i - 1),
                lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
            ),
        )
    )
    pairs = baskets.select(F.explode(pair_structs).alias("p")).select(
        "p.part_a", "p.part_b"
    )
    bkt = F.pmod(F.xxhash64("part_a", "part_b"), F.lit(n_buckets))
    freq_buckets = (
        pairs.groupBy(bkt.alias("bkt"))
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .select("bkt")
    )
    return (
        pairs.withColumn("bkt", bkt)
        .join(F.broadcast(freq_buckets), "bkt", "left_semi")
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= 2)
        .orderBy(F.col("support").desc(), "part_a", "part_b")
    )


@_register(
    "dsir_importance_weights",
    r"""
    WITH toks AS (
        SELECT doc_id, lang,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents
    ),
    tb AS (
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5(tok), 1, 8))::UBIGINT % 64
                    AS BIGINT) AS b
        FROM toks
    ),
    bc AS (
        SELECT b,
               count(*) FILTER (lang = 'en') AS n_t,
               count(*) AS n_r
        FROM tb GROUP BY b
    ),
    tot AS (SELECT sum(n_t) AS tt, sum(n_r) AS tr FROM bc),
    lr AS (
        SELECT b,
               round(ln(((n_t + 1.0) / (tt + 64.0))
                        / ((n_r + 1.0) / (tr + 64.0))), 6) AS w
        FROM bc, tot
    ),
    per_doc AS (
        SELECT tb.doc_id,
               min(tb.lang) AS lang,
               count(*) AS n_tokens,
               round(sum(lr.w), 6) AS li
        FROM tb JOIN lr USING (b)
        GROUP BY tb.doc_id
    ),
    thr AS (SELECT quantile_cont(li, 0.8) AS q FROM per_doc)
    SELECT doc_id, lang,
           CAST(n_tokens AS INT) AS n_tokens,
           li + 0.0 AS log_importance,
           round(round(li * 1000000) / n_tokens) / 1000000.0 + 0.0
               AS li_per_token,
           round(li - q, 6) >= 0 AS selected
    FROM per_doc, thr
    ORDER BY doc_id
    """,
    "DSIR-style importance weighting for data selection (Xie et al., "
    "'Data Selection for Language Models via Importance Resampling', "
    "arXiv:2302.03169 — public method): features are tokens hashed "
    "into 64 buckets (md5-derived, engine-portable — the "
    "linear_quality_classifier convention); the target distribution "
    "is learned from the in-domain slice (lang='en' here, any "
    "high-quality reference corpus in production) and each document's "
    "log importance weight is sum over its tokens of "
    "ln(p_target(bucket)/p_raw(bucket)) with add-one smoothing — the "
    "likelihood-ratio score that upweights target-like documents for "
    "resampling. Two corpus passes over ONE lazily-barriered "
    "(doc_id, lang, bucket) token stream: pass 1 collapses to 64 "
    "bucket cells map-side (the learned 'model' is a 64-row broadcast "
    "— scan-speed inference, same as production DSIR's hashed n-gram "
    "tables); pass 2 folds the broadcast log-ratios per doc in one "
    "doc-keyed aggregation. Selection threshold = exact p80 of the "
    "per-doc weights, a 1-row scalar broadcast; the boundary "
    "comparison is rounded so interpolation float noise cannot flip "
    "membership across engines. At 100 TB drop the token-stream "
    "barrier and re-tokenize pass 2 (recompute beats caching a "
    "token-grade intermediate), and raise buckets 64 -> 2^20 hashed "
    "bigrams — the plan shape is unchanged",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = F.explode(text.tokens("text")).alias("tok")
    tb = (
        spread(docs, "doc_id")
        .select("doc_id", "lang", tok)
        .select(
            "doc_id",
            "lang",
            (
                F.conv(F.substring(F.md5(F.col("tok").cast("binary")), 1, 8), 16, 10)
                .cast("long")
                % 64
            ).alias("b"),
        )
        .localCheckpoint(eager=False)  # both passes read the bucket stream
    )
    bc = tb.groupBy("b").agg(
        F.count(F.when(F.col("lang") == "en", 1)).alias("n_t"),
        F.count("*").alias("n_r"),
    )
    tot = bc.agg(F.sum("n_t").alias("tt"), F.sum("n_r").alias("tr"))
    lr = bc.crossJoin(F.broadcast(tot)).select(
        "b",
        F.round(
            F.log(
                ((F.col("n_t") + 1.0) / (F.col("tt") + 64.0))
                / ((F.col("n_r") + 1.0) / (F.col("tr") + 64.0))
            ),
            6,
        ).alias("w"),
    )
    per_doc = (
        tb.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.min("lang").alias("lang"),
            F.count("*").alias("n_tokens"),
            F.round(F.sum("w"), 6).alias("li"),
        )
    )
    thr = per_doc.agg(F.percentile(F.col("li"), 0.8).alias("q"))
    return (
        per_doc.crossJoin(F.broadcast(thr))
        .select(
            "doc_id",
            "lang",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            (F.col("li") + F.lit(0.0)).alias("log_importance"),
            # per-token mean in integer MICRO units: li is 6dp-rounded, so
            # li*1e6 is integral; the only tie-prone rounding then happens
            # on an exactly-representable x.5 double, which both engines
            # resolve identically (away from zero) — round(li/n, 6) instead
            # hits shortest-decimal-repr half boundaries where Spark's
            # BigDecimal HALF_UP and DuckDB's double rounding disagree
            # (found by the sf0.1 sweep: -0.051883/26)
            (
                F.round(F.round(F.col("li") * 1000000) / F.col("n_tokens"))
                / 1000000.0
                + F.lit(0.0)
            ).alias("li_per_token"),
            (F.round(F.col("li") - F.col("q"), 6) >= 0).alias("selected"),
        )
        .orderBy("doc_id")
    )


@_register(
    "streaming_enrich_join_live",
    """
    WITH firsts AS (
        SELECT user_id, event_type AS channel,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    dim AS (SELECT user_id, channel FROM firsts WHERE rn = 1)
    SELECT d.channel, e.event_type,
           count(*) AS n_events,
           round(sum(e.value), 4) AS sum_value
    FROM events e JOIN dim d USING (user_id)
    GROUP BY d.channel, e.event_type
    ORDER BY channel, event_type
    """,
    "LIVE stream-static broadcast enrichment (streaming.joins."
    "static_enrich_join): the events stream joins a static per-user "
    "dimension (acquisition channel = event type of the user's first "
    "event, min_by (ts, event_id) — deterministic tie-break) map-side "
    "via broadcast, appends to a memory sink, and the fully-consumed "
    "sink rolls up per (channel, event_type). Because the enrichment "
    "is STATELESS — no buffering, no watermark, nothing dropped — the "
    "drained stream equals the batch join exactly, so unlike the "
    "other five live streaming entries this one carries a full DuckDB "
    "oracle: the hash check proves stream==batch end-to-end, not just "
    "row counts. The canonical dimension-lookup shape on a stream; "
    "state is ZERO (vs the watermark-bounded stream-stream join), the "
    "dimension ships once per micro-batch plan",
)
def streaming_enrich_join_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    from covid19_etl_pipeline_spark.streaming.daily_rollup import (
        read_events_stream,
        run_to_memory_sink,
    )
    from covid19_etl_pipeline_spark.streaming.joins import static_enrich_join

    staging = _staged_events_dir(spark, sf_dir)
    dim = (
        spark.read.parquet(staging)
        .groupBy("user_id")
        .agg(
            F.min_by("event_type", F.struct("ts", "event_id")).alias("channel")
        )
    )
    stream = read_events_stream(spark, staging, 8)
    enriched = static_enrich_join(stream, dim).select(
        "channel", "event_type", "value"
    )
    run_to_memory_sink(
        enriched, "streaming_enrich_join_live", output_mode="append"
    )
    return (
        spark.table("streaming_enrich_join_live")
        .groupBy("channel", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("channel", "event_type")
    )


@_register(
    "nation_trade_kcore",
    """
    WITH raw AS (
        SELECT cn.n_name AS a, sn.n_name AS b, count(*) AS w
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
        JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
        GROUP BY cn.n_name, sn.n_name
    ),
    symw AS (
        SELECT a, b, sum(w) AS w FROM (
            SELECT a, b, w FROM raw UNION ALL SELECT b AS a, a AS b, w FROM raw
        ) WHERE a <> b GROUP BY a, b
    ),
    mw AS (SELECT avg(w) AS mean_w FROM symw),
    e0 AS (SELECT a, b FROM symw, mw WHERE symw.w > mw.mean_w),
    d0 AS (SELECT a AS n, count(*) AS d FROM e0 GROUP BY a),
    k0 AS (SELECT n FROM d0 WHERE d >= 10),
    e1 AS (SELECT e0.a, e0.b FROM e0
           JOIN k0 x ON e0.a = x.n JOIN k0 y ON e0.b = y.n),
    d1 AS (SELECT a AS n, count(*) AS d FROM e1 GROUP BY a),
    k1 AS (SELECT n FROM d1 WHERE d >= 10),
    e2 AS (SELECT e1.a, e1.b FROM e1
           JOIN k1 x ON e1.a = x.n JOIN k1 y ON e1.b = y.n),
    d2 AS (SELECT a AS n, count(*) AS d FROM e2 GROUP BY a),
    k2 AS (SELECT n FROM d2 WHERE d >= 10),
    e3 AS (SELECT e2.a, e2.b FROM e2
           JOIN k2 x ON e2.a = x.n JOIN k2 y ON e2.b = y.n)
    SELECT a AS nation, CAST(count(*) AS BIGINT) AS core_degree
    FROM e3 GROUP BY a
    ORDER BY nation
    """,
    "k-core decomposition (k=10, FIXED 3 peel rounds) of the trade-"
    "graph backbone: iteratively remove nodes with degree < k, then "
    "report the surviving nodes' within-core degrees — the dense-"
    "subgraph extraction used to find tightly-coupled trading blocs "
    "(and, on web/citation graphs, the spam/core filter). Rounds are "
    "FIXED rather than converged so the oracle is an unrolled CTE "
    "chain and semantics are engine-portable ('3-round peel'; the "
    "backbone converges in fewer). Scale shape: the fact-scale edge "
    "aggregation happens ONCE behind an eager barrier; each peel "
    "round is one node-sized degree rollup + two broadcast semi-joins "
    "against the keep set, with lazy per-round barriers so the whole "
    "peel materializes in the caller's single action. Same backbone "
    "construction as nation_trade_assortativity (above-mean-weight "
    "edges — the raw graph is complete)",
)
def nation_trade_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from covid19_etl_pipeline_spark.operators.partitioning import iteration_barrier

    k = 10
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    raw = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), F.col("o_custkey") == c["c_custkey"])
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("cn"), F.col("n_name").alias("a"))),
            F.col("c_nationkey") == F.col("cn"),
        )
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("sn"), F.col("n_name").alias("b"))),
            F.col("s_nationkey") == F.col("sn"),
        )
        .groupBy("a", "b")
        .agg(F.count("*").alias("w"))
    )
    symw = (
        raw.unionByName(
            raw.select(F.col("b").alias("a"), F.col("a").alias("b"), "w")
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
    )
    mw = symw.agg(F.avg("w").alias("mean_w"))
    # the fact-scale aggregation materializes ONCE; every peel round
    # reads graph-sized blocks
    e = iteration_barrier(
        symw.crossJoin(F.broadcast(mw))
        .filter(F.col("w") > F.col("mean_w"))
        .select("a", "b")
    )
    for _ in range(3):
        keep = (
            e.groupBy("a")
            .agg(F.count("*").alias("d"))
            .filter(F.col("d") >= k)
            .select(F.col("a").alias("n"))
        )
        ka = keep.select(F.col("n").alias("a"))
        kb = keep.select(F.col("n").alias("b"))
        # lazy: fixed rounds, no probe — the caller's action
        # materializes the unrolled peel chain
        e = iteration_barrier(
            e.join(F.broadcast(ka), "a", "left_semi").join(
                F.broadcast(kb), "b", "left_semi"
            ),
            eager=False,
        )
    return (
        e.groupBy(F.col("a").alias("nation"))
        .agg(F.count("*").alias("core_degree"))
        .orderBy("nation")
    )


@_register(
    "bpe_fertility_by_lang",
    r"""
    WITH words AS (
        SELECT w, count(*) AS freq FROM (
            SELECT lower(unnest(regexp_split_to_array(trim(text), '\s+'))) AS w
            FROM documents
        ) WHERE regexp_matches(w, '^[a-z]+$') AND len(w) >= 2
        GROUP BY w
    ),
    sym0 AS (
        SELECT array_to_string(regexp_split_to_array(w, ''), ' ') AS sym, freq
        FROM words
    ),
    p1 AS (
        SELECT pair, sum(freq) AS cnt FROM (
            SELECT unnest(list_transform(range(1, len(a)),
                                         i -> a[i] || ' ' || a[i+1])) AS pair,
                   freq
            FROM (SELECT regexp_split_to_array(sym, ' ') AS a, freq FROM sym0)
        ) GROUP BY pair
    ),
    t1 AS (
        SELECT pair, replace(pair, ' ', '') AS new_symbol, cnt
        FROM p1 ORDER BY cnt DESC, pair LIMIT 1
    ),
    sym1 AS (
        SELECT trim(replace(' ' || s.sym || ' ',
                            ' ' || t1.pair || ' ',
                            ' ' || t1.new_symbol || ' ')) AS sym, s.freq
        FROM sym0 s, t1
    ),
    p2 AS (
        SELECT pair, sum(freq) AS cnt FROM (
            SELECT unnest(list_transform(range(1, len(a)),
                                         i -> a[i] || ' ' || a[i+1])) AS pair,
                   freq
            FROM (SELECT regexp_split_to_array(sym, ' ') AS a, freq FROM sym1)
        ) GROUP BY pair
    ),
    t2 AS (
        SELECT pair, replace(pair, ' ', '') AS new_symbol, cnt
        FROM p2 ORDER BY cnt DESC, pair LIMIT 1
    ),
    dw AS (
        SELECT lang, w FROM (
            SELECT lang,
                   lower(unnest(regexp_split_to_array(trim(text), '\s+'))) AS w
            FROM documents
        ) WHERE regexp_matches(w, '^[a-z]+$') AND len(w) >= 2
    ),
    sp AS (
        SELECT lang,
               array_to_string(regexp_split_to_array(w, ''), ' ') AS sym
        FROM dw
    ),
    ap1 AS (
        SELECT lang, sym,
               trim(replace(' ' || sym || ' ',
                            ' ' || t1.pair || ' ',
                            ' ' || t1.new_symbol || ' ')) AS sym1
        FROM sp, t1
    ),
    ap2 AS (
        SELECT lang, sym,
               trim(replace(' ' || sym1 || ' ',
                            ' ' || t2.pair || ' ',
                            ' ' || t2.new_symbol || ' ')) AS sym2
        FROM ap1, t2
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(len(regexp_split_to_array(sym, ' '))) AS BIGINT)
               AS n_chars,
           CAST(sum(len(regexp_split_to_array(sym2, ' '))) AS BIGINT)
               AS n_subwords,
           round(sum(len(regexp_split_to_array(sym2, ' '))) * 1.0
                 / count(*), 4) + 0.0 AS fertility,
           round(sum(len(regexp_split_to_array(sym2, ' '))) * 1.0
                 / sum(len(regexp_split_to_array(sym, ' '))), 4) + 0.0
               AS compression_ratio
    FROM ap2
    GROUP BY lang
    ORDER BY lang
    """,
    "tokenizer FERTILITY audit per language: merges are learned on the "
    "WHOLE corpus (the same 2-round vocabulary-statistics BPE as "
    "bpe_merge_induction/bpe_apply_merges), then each language's words "
    "are segmented and fertility = subword tokens per word is rolled "
    "up per lang, with the char->subword compression ratio — the "
    "multilingual token-budget audit that shows which languages pay "
    "more tokens per word under a shared vocabulary (the famous "
    "English-centric-tokenizer tax). Scale shape identical to "
    "bpe_apply_merges: pair statistics and merge rules live at "
    "VOCABULARY grain (broadcast), the corpus makes one spell-and-"
    "replace pass, and the fertility rollup is languages-sized",
)
def bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    dw = (
        docs.select("lang", F.explode(text.tokens("text")).alias("t0"))
        .select("lang", F.lower("t0").alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$") & (F.length("w") >= 2))
    )
    words = dw.groupBy("w").agg(F.count("*").alias("freq"))
    sym0v = words.select(
        F.array_join(F.split("w", ""), " ").alias("sym"), "freq"
    ).localCheckpoint(eager=False)
    top = F.row_number().over(Window.orderBy(F.col("cnt").desc(), "pair"))
    t1 = (
        _bpe_pair_counts(sym0v)
        .withColumn("rn", top)
        .filter(F.col("rn") == 1)
        .select("pair", F.expr("replace(pair, ' ', '')").alias("new_symbol"))
        .localCheckpoint(eager=False)
    )
    sym1v = _bpe_apply_merge(sym0v, t1)
    t2 = (
        _bpe_pair_counts(sym1v)
        .withColumn("rn", top)
        .filter(F.col("rn") == 1)
        .select("pair", F.expr("replace(pair, ' ', '')").alias("new_symbol"))
        .localCheckpoint(eager=False)
    )
    spelled = dw.select("lang", F.array_join(F.split("w", ""), " ").alias("sym"))
    ap1 = spelled.crossJoin(
        F.broadcast(t1.select(F.col("pair").alias("t1_pair"), F.col("new_symbol").alias("t1_sym")))
    ).withColumn(
        "sym1",
        F.trim(
            F.expr(
                "replace(concat(' ', sym, ' '), concat(' ', t1_pair, ' '), "
                "concat(' ', t1_sym, ' '))"
            )
        ),
    )
    ap2 = ap1.crossJoin(
        F.broadcast(t2.select(F.col("pair").alias("t2_pair"), F.col("new_symbol").alias("t2_sym")))
    ).withColumn(
        "sym2",
        F.trim(
            F.expr(
                "replace(concat(' ', sym1, ' '), concat(' ', t2_pair, ' '), "
                "concat(' ', t2_sym, ' '))"
            )
        ),
    )
    n_chars = F.sum(F.size(F.split("sym", " ")))
    n_sub = F.sum(F.size(F.split("sym2", " ")))
    return (
        ap2.groupBy("lang")
        .agg(
            F.count("*").alias("n_words"),
            n_chars.alias("n_chars"),
            n_sub.alias("n_subwords"),
            (F.round(n_sub * 1.0 / F.count("*"), 4) + F.lit(0.0)).alias("fertility"),
            (F.round(n_sub * 1.0 / n_chars, 4) + F.lit(0.0)).alias(
                "compression_ratio"
            ),
        )
        .orderBy("lang")
    )


@_register(
    "skyline_parts",
    """
    WITH pg AS (
        SELECT p_retailprice AS pr, max(p_size) AS gmax
        FROM part GROUP BY p_retailprice
    ),
    pg2 AS (
        SELECT pr, gmax,
               max(gmax) OVER (ORDER BY pr
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS prevmax
        FROM pg
    )
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p JOIN pg2 ON p.p_retailprice = pg2.pr
    WHERE NOT (coalesce(prevmax, -1) >= p_size OR gmax > p_size)
    ORDER BY p.p_retailprice, p.p_partkey
    """,
    "SKYLINE (Pareto frontier) operator: parts not dominated on "
    "(minimize p_retailprice, maximize p_size) — the classic "
    "preference-query operator (Borzsony/Kossmann/Stocker, ICDE'01) the "
    "reference's SQL surface cannot express without a quadratic "
    "NOT EXISTS self-join. 2-D skyline decomposes into a sort-free "
    "scalable form: group to PRICE grain (bounded by the price domain, "
    "not the fact), one ordered running-max pass over that rollup, then "
    "a broadcast join back — dominance is 'a strictly cheaper price "
    "group reached >= my size, or my own price group has strictly "
    "bigger size'. The O(n^2) pairwise test never materializes",
)
def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = load_table(spark, sf_dir, "part")
    pg = parts.groupBy("p_retailprice").agg(F.max("p_size").alias("gmax"))
    w = Window.orderBy("p_retailprice").rowsBetween(Window.unboundedPreceding, -1)
    pg2 = pg.withColumn("prevmax", F.max("gmax").over(w))
    joined = parts.join(F.broadcast(pg2), "p_retailprice")
    dominated = (
        F.coalesce(F.col("prevmax"), F.lit(-1)) >= F.col("p_size")
    ) | (F.col("gmax") > F.col("p_size"))
    return (
        joined.filter(~dominated)
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_partkey")
    )


def _zorder_bits_sql(x: str, y: str, shift_fn) -> str:
    """12-bit Morton interleave of two 6-bit dims, as an arithmetic
    expression string; ``shift_fn(expr, i)`` renders a right-shift in
    the target dialect (Spark ``shiftright``, DuckDB ``>>``)."""
    terms = []
    for i in range(6):
        terms.append(f"(({shift_fn(x, i)}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({shift_fn(y, i)}) & 1) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


_Z_SPARK = _zorder_bits_sql("zx", "zy", lambda e, i: f"shiftright({e}, {i})")
_Z_DUCK = _zorder_bits_sql("zx", "zy", lambda e, i: f"({e} >> {i})")


@_register(
    "zorder_layout_parts",
    f"""
    WITH dims AS (
        SELECT p_partkey, p_size, p_retailprice,
               p_size - 1 AS zx,
               least(63, greatest(0, CAST(floor((p_retailprice - 900.0)
                                                / 1.5625) AS INT))) AS zy
        FROM part
    ),
    z AS (SELECT *, {_Z_DUCK} AS zval FROM dims),
    assigned AS (
        SELECT 'zorder' AS layout, CAST(zval >> 8 AS INT) AS bucket,
               p_size, p_retailprice FROM z
        UNION ALL
        SELECT 'unclustered' AS layout, CAST(p_partkey % 16 AS INT) AS bucket,
               p_size, p_retailprice FROM z
    )
    SELECT layout, bucket, count(*) AS cnt,
           min(p_size) AS min_size, max(p_size) AS max_size,
           min(p_retailprice) AS min_price, max(p_retailprice) AS max_price,
           round(((max(p_size) - min(p_size) + 1) / 50.0)
                 * ((max(p_retailprice) - min(p_retailprice)) / 100.0), 4)
               + 0.0 AS zone_volume_frac
    FROM assigned
    GROUP BY layout, bucket
    ORDER BY layout, bucket
    """,
    "Z-ORDER data layout + zone-map audit (the Delta/Iceberg OPTIMIZE "
    "ZORDER pattern): Morton-interleave two query dimensions "
    "(p_size, an equi-width price bin) into a 12-bit z-value, split the "
    "table into 16 files by z-prefix range (zval >> 8 — prefix ranges "
    "ARE the z-order range partitioner, no global sort window needed), "
    "and emit each file's zone map (min/max per dim) plus its fractional "
    "zone volume. The same table hashed by key ('unclustered') is the "
    "baseline: its zone maps span the whole domain (volume ~1.0) so a "
    "2-D predicate prunes nothing, while z-order files cover ~1/16 of "
    "the space — the min/max file-skipping win that makes multi-"
    "dimensional scans cheap at 100 TB. Map-side only: one scan, no "
    "join, no window; the per-file rollup is 32 rows",
)
def zorder_layout_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = load_table(spark, sf_dir, "part")
    dims = parts.select(
        "p_partkey",
        "p_size",
        "p_retailprice",
        (F.col("p_size") - 1).alias("zx"),
        F.least(
            F.lit(63),
            F.greatest(
                F.lit(0),
                F.floor((F.col("p_retailprice") - 900.0) / 1.5625).cast("int"),
            ),
        ).alias("zy"),
    )
    z = dims.withColumn("zval", F.expr(_Z_SPARK))
    assigned = z.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.shiftright("zval", 8).cast("int").alias("bucket"),
                ),
                F.struct(
                    F.lit("unclustered").alias("layout"),
                    F.pmod("p_partkey", F.lit(16)).cast("int").alias("bucket"),
                ),
            )
        ).alias("a"),
        F.col("p_size"),
        F.col("p_retailprice"),
    ).select("a.layout", "a.bucket", "p_size", "p_retailprice")
    return (
        assigned.groupBy("layout", "bucket")
        .agg(
            F.count("*").alias("cnt"),
            F.min("p_size").alias("min_size"),
            F.max("p_size").alias("max_size"),
            F.min("p_retailprice").alias("min_price"),
            F.max("p_retailprice").alias("max_price"),
            (
                F.round(
                    ((F.max("p_size") - F.min("p_size") + 1) / 50.0)
                    * ((F.max("p_retailprice") - F.min("p_retailprice")) / 100.0),
                    4,
                )
                + F.lit(0.0)
            ).alias("zone_volume_frac"),
        )
        .orderBy("layout", "bucket")
    )


@_register(
    "incremental_rollup_maintenance",
    """
    SELECT o_orderpriority,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           count(*) AS order_cnt,
           round(sum(o_totalprice), 4) AS total_revenue,
           round(sum(o_totalprice) / count(*), 4) + 0.0 AS avg_price,
           max(o_totalprice) AS max_price
    FROM orders
    GROUP BY o_orderpriority, month
    ORDER BY o_orderpriority, month
    """,
    "INCREMENTAL MATERIALIZED-VIEW MAINTENANCE: the rollup is kept as "
    "mergeable PARTIAL aggregates (count, sum, max per group) — the "
    "stored base partials (orders before 2000-01-01) and the new "
    "delta partition's partials are combined group-wise (sum of "
    "counts, sum of sums, max of maxes) and the final measures "
    "(avg = merged sum / merged count) are derived only at merge "
    "time. The oracle is the FULL recompute over all of orders, so "
    "the hash-match proves the algebraic merge is lossless — the "
    "property that lets a 100 TB nightly rollup touch only the new "
    "partition's partials instead of rescanning history (same "
    "incremental stance as incremental_upsert / cdc_latest_user_state; "
    "avg/count(*) decompose because they are algebraic aggregates, "
    "Gray et al., Data Cube, ICDE'96). Base and delta scans both "
    "partition-prune on the split date",
)
def incremental_rollup_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    split = "2000-01-01"

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "o_orderpriority",
            F.to_date(F.date_trunc("month", "o_orderdate")).alias("month"),
        ).agg(
            F.count("*").alias("p_cnt"),
            F.sum("o_totalprice").alias("p_sum"),
            F.max("o_totalprice").alias("p_max"),
        )

    base = partials(orders.filter(F.col("o_orderdate") < split))
    delta = partials(orders.filter(F.col("o_orderdate") >= split))
    merged = base.unionByName(delta)
    return (
        merged.groupBy("o_orderpriority", "month")
        .agg(
            F.sum("p_cnt").alias("order_cnt"),
            F.round(F.sum("p_sum"), 4).alias("total_revenue"),
            (F.round(F.sum("p_sum") / F.sum("p_cnt"), 4) + F.lit(0.0)).alias(
                "avg_price"
            ),
            F.max("p_max").alias("max_price"),
        )
        .orderBy("o_orderpriority", "month")
    )


@_register(
    "fellegi_sunter_part_linkage",
    """
    WITH u AS (
        SELECT
            (SELECT sum(n * (n - 1)) * 1.0 FROM
                (SELECT count(*) AS n FROM part GROUP BY p_type))
            / ((SELECT count(*) FROM part) * 1.0
               * ((SELECT count(*) FROM part) - 1)) AS u_type,
            (SELECT sum(n * (n - 1)) * 1.0 FROM
                (SELECT count(*) AS n FROM part
                 GROUP BY split_part(p_name, ' ', 2)))
            / ((SELECT count(*) FROM part) * 1.0
               * ((SELECT count(*) FROM part) - 1)) AS u_name
    ),
    pairs AS (
        SELECT a.p_partkey AS a_partkey, b.p_partkey AS b_partkey,
               CAST(a.p_type = b.p_type AS INT) AS agree_type,
               CAST(abs(a.p_retailprice - b.p_retailprice) <= 1.0 AS INT)
                   AS agree_price,
               CAST(split_part(a.p_name, ' ', 2)
                    = split_part(b.p_name, ' ', 2) AS INT) AS agree_name
        FROM part a JOIN part b
          ON a.p_brand = b.p_brand AND a.p_size = b.p_size
         AND a.p_partkey < b.p_partkey
    )
    SELECT a_partkey, b_partkey, agree_type, agree_price, agree_name,
           round((CASE WHEN agree_type = 1 THEN 0.95 / u_type
                       ELSE 0.05 / (1 - u_type) END)
                 * (CASE WHEN agree_price = 1 THEN 0.9 / 0.02
                         ELSE 0.1 / 0.98 END)
                 * (CASE WHEN agree_name = 1 THEN 0.85 / u_name
                         ELSE 0.15 / (1 - u_name) END), 4) + 0.0
               AS match_odds
    FROM pairs, u
    ORDER BY match_odds DESC, a_partkey, b_partkey
    LIMIT 200
    """,
    "FELLEGI-SUNTER probabilistic record linkage (JASA'69, the model "
    "under Splink/dedupe.io): candidate pairs are BLOCKED on "
    "(p_brand, p_size) so the quadratic comparison space never "
    "materializes, each pair gets an agreement vector over three "
    "fields (type exact, price within 1.0, name-noun exact), and the "
    "match odds multiply per-field likelihood ratios m/u (agree) or "
    "(1-m)/(1-u) (disagree). u-probabilities (chance agreement among "
    "non-matches) are estimated closed-form from field value "
    "frequencies: sum n(n-1) / N(N-1) — integer sums and ONE division, "
    "so both engines compute bit-identical doubles; m-probabilities "
    "are fixed priors (0.95/0.9/0.85). Scale: frequency tables are "
    "field-cardinality-grain (broadcast 1-row scalars), the pair join "
    "is a co-partitioned equi-join on the block key, top-200 is "
    "TakeOrderedAndProject — no global sort",
)
def fellegi_sunter_part_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = load_table(spark, sf_dir, "part")
    noun = F.element_at(F.split("p_name", " "), 2)

    def u_of(keycol) -> DataFrame:
        freq = parts.groupBy(keycol.alias("v")).agg(F.count("*").alias("n"))
        return freq.agg(
            (
                (F.sum(F.col("n") * (F.col("n") - 1)) * 1.0)
                / (F.sum("n") * 1.0 * (F.sum("n") - 1))
            ).alias("u")
        )

    u = (
        u_of(F.col("p_type"))
        .select(F.col("u").alias("u_type"))
        .crossJoin(F.broadcast(u_of(noun).select(F.col("u").alias("u_name"))))
    )
    a = parts.select(
        F.col("p_partkey").alias("a_partkey"),
        F.col("p_brand").alias("a_brand"),
        F.col("p_size").alias("a_size"),
        F.col("p_type").alias("a_type"),
        F.col("p_retailprice").alias("a_price"),
        noun.alias("a_noun"),
    )
    b = parts.select(
        F.col("p_partkey").alias("b_partkey"),
        F.col("p_brand").alias("b_brand"),
        F.col("p_size").alias("b_size"),
        F.col("p_type").alias("b_type"),
        F.col("p_retailprice").alias("b_price"),
        noun.alias("b_noun"),
    )
    pairs = a.join(
        b,
        (F.col("a_brand") == F.col("b_brand"))
        & (F.col("a_size") == F.col("b_size"))
        & (F.col("a_partkey") < F.col("b_partkey")),
    ).select(
        "a_partkey",
        "b_partkey",
        (F.col("a_type") == F.col("b_type")).cast("int").alias("agree_type"),
        (F.abs(F.col("a_price") - F.col("b_price")) <= 1.0)
        .cast("int")
        .alias("agree_price"),
        (F.col("a_noun") == F.col("b_noun")).cast("int").alias("agree_name"),
    )
    t_term = F.when(F.col("agree_type") == 1, 0.95 / F.col("u_type")).otherwise(
        0.05 / (1 - F.col("u_type"))
    )
    p_term = F.when(F.col("agree_price") == 1, F.lit(0.9 / 0.02)).otherwise(
        F.lit(0.1 / 0.98)
    )
    n_term = F.when(F.col("agree_name") == 1, 0.85 / F.col("u_name")).otherwise(
        0.15 / (1 - F.col("u_name"))
    )
    return (
        pairs.crossJoin(F.broadcast(u))
        .select(
            "a_partkey",
            "b_partkey",
            "agree_type",
            "agree_price",
            "agree_name",
            (F.round(t_term * p_term * n_term, 4) + F.lit(0.0)).alias("match_odds"),
        )
        .orderBy(F.col("match_odds").desc(), "a_partkey", "b_partkey")
        .limit(200)
    )


@_register(
    "maximal_repeated_substrings",
    r"""
    WITH d AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents
    ),
    g0 AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(1, len(toks) - 6),
                   i -> struct_pack(pos := i,
                                    g := array_to_string(toks[i:i+7], ' '))))
                   AS u
        FROM d WHERE len(toks) >= 8
    ),
    g AS (SELECT doc_id, u.pos AS pos, u.g AS g FROM g0),
    dup AS (SELECT g FROM g GROUP BY g HAVING count(*) > 1),
    p AS (SELECT doc_id, pos FROM g WHERE g IN (SELECT g FROM dup)),
    r AS (
        SELECT doc_id, pos,
               CASE WHEN pos <= coalesce(
                        max(pos + 7) OVER (PARTITION BY doc_id ORDER BY pos
                                           ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING), -1) + 1
                    THEN 0 ELSE 1 END AS brk
        FROM p
    ),
    isl AS (
        SELECT doc_id, pos,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM r
    )
    SELECT doc_id, CAST(min(pos) AS INT) AS start_pos,
           CAST(max(pos) + 7 - min(pos) + 1 AS INT) AS run_token_len
    FROM isl
    GROUP BY doc_id, island
    HAVING max(pos) + 7 - min(pos) + 1 >= 12
    ORDER BY doc_id, start_pos
    """,
    "MAXIMAL REPEATED SUBSTRINGS — exact substring-level duplication "
    "(the suffix-array dedup of Lee et al., 'Deduplicating Training "
    "Data Makes Language Models Better', ACL'22, re-expressed for "
    "shuffle-based execution): every token 8-gram is hashed, 8-grams "
    "occurring more than once ANYWHERE in the corpus mark their "
    "positions, and per document the overlapping/adjacent marked "
    "intervals [pos, pos+7] are merged into maximal runs (interval "
    "merge via running-max-end window), keeping runs >= 12 tokens — "
    "each output row is a maximal duplicated region a substring-dedup "
    "pass would cut. Scale: the corpus shuffles xxhash64(8-gram) "
    "int64s, never gram strings (collision odds ~ n^2/2^65 — at 1e12 "
    "grams one expected false mark, bounded and documented; the "
    "DuckDB oracle groups the literal strings so the hash-match also "
    "certifies the hashed plan); the duplicated-gram table is "
    "dup-grain, the semi-join is co-partitioned on the hash, and the "
    "interval merge windows are keyed per doc_id",
)
def maximal_repeated_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = docs.select("doc_id", text.tokens("text").alias("toks")).filter(
        F.size("toks") >= 8
    )
    g = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 7), "
                "i -> struct(i AS pos, "
                "xxhash64(concat_ws(' ', slice(toks, i, 8))) AS gh))"
            )
        ).alias("u"),
    ).select("doc_id", F.col("u.pos").alias("pos"), F.col("u.gh").alias("gh"))
    # consumed twice (dup-gram table + position probe): lazy barrier so
    # the tokenize+explode runs once per action, not per consumer
    g = g.localCheckpoint(eager=False)
    dup = (
        g.groupBy("gh").agg(F.count("*").alias("cnt")).filter(F.col("cnt") > 1)
    ).select("gh")
    p = g.join(dup, "gh", "left_semi").select("doc_id", "pos")
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = p.withColumn(
        "brk",
        F.when(
            F.col("pos")
            <= F.coalesce(F.max(F.col("pos") + 7).over(w_prev), F.lit(-1)) + 1,
            0,
        ).otherwise(1),
    )
    isl = r.withColumn(
        "island",
        F.sum("brk").over(Window.partitionBy("doc_id").orderBy("pos")),
    )
    return (
        isl.groupBy("doc_id", "island")
        .agg(
            F.min("pos").cast("int").alias("start_pos"),
            (F.max("pos") + 7 - F.min("pos") + 1).cast("int").alias("run_token_len"),
        )
        .filter(F.col("run_token_len") >= 12)
        .select("doc_id", "start_pos", "run_token_len")
        .orderBy("doc_id", "start_pos")
    )


@_register(
    "frequent_event_sequences",
    """
    WITH seq AS (
        SELECT user_id, event_type AS e1,
               lead(event_type, 1) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS e2,
               lead(event_type, 2) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS e3
        FROM events
    )
    SELECT e1, e2, e3,
           count(DISTINCT user_id) AS support_users,
           count(*) AS occurrences
    FROM seq
    WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY e1, e2, e3
    HAVING count(DISTINCT user_id) >= 10
    ORDER BY support_users DESC, occurrences DESC, e1, e2, e3
    LIMIT 25
    """,
    "SEQUENTIAL PATTERN MINING (PrefixSpan/SPAM family, contiguous "
    "form): frequent length-3 event-type sequences over per-user "
    "event streams, with support counted in USERS (the sequence-mining "
    "convention — a user looping one funnel ten times is one "
    "supporter) beside raw occurrence counts. Two lead() windows share "
    "ONE (user_id, ts) sort, the rollup is |types|^3-bounded, and "
    "min-support pruning (HAVING) keeps only patterns a recommender / "
    "funnel-design pass would act on. Scale: the only corpus shuffle "
    "is the keyed window sort; no per-user arrays, no self-joins",
)
def frequent_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    return (
        seq.groupBy("e1", "e2", "e3")
        .agg(
            F.countDistinct("user_id").alias("support_users"),
            F.count("*").alias("occurrences"),
        )
        .filter(F.col("support_users") >= 10)
        .orderBy(
            F.col("support_users").desc(),
            F.col("occurrences").desc(),
            "e1",
            "e2",
            "e3",
        )
        .limit(25)
    )


@_register(
    "quality_classifier_calibration",
    r"""
    WITH toks AS (
        SELECT doc_id, n_chars,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents
    ),
    f AS (
        SELECT doc_id, any_value(n_chars) AS n_chars,
               sum(((CAST(('0x' || substr(md5(tok), 1, 8))::UBIGINT % 64
                          AS BIGINT) * 37) % 21 - 10) / 16.0) AS s,
               count(*) AS n
        FROM toks GROUP BY doc_id
    ),
    scored AS (
        SELECT doc_id,
               round(1.0 / (1.0 + exp(-(-0.25 + s / n))), 4) + 0.0 AS score,
               CAST(n_chars >= 300 AS INT) AS label
        FROM f
    ),
    binned AS (
        SELECT least(9, CAST(floor(score * 10) AS INT)) AS bin, score, label
        FROM scored
    ),
    per_bin AS (
        SELECT bin, count(*) AS n,
               round(avg(score), 4) + 0.0 AS mean_confidence,
               round(avg(label), 4) + 0.0 AS positive_rate
        FROM binned GROUP BY bin
    )
    SELECT bin, n, mean_confidence, positive_rate,
           round(abs(positive_rate - mean_confidence), 4) + 0.0 AS calib_gap,
           round(abs(positive_rate - mean_confidence) * n
                 / (sum(n) OVER ()), 6) + 0.0 AS ece_contrib
    FROM per_bin
    ORDER BY bin
    """,
    "CLASSIFIER CALIBRATION AUDIT — reliability diagram + Expected "
    "Calibration Error (Guo et al., ICML'17) for the deployed quality "
    "classifier: each document's sigmoid score (the exact "
    "linear_quality_classifier inference expression) lands in one of "
    "10 confidence bins; per bin, mean confidence vs empirical "
    "positive rate (label: the independent n_chars >= 300 length "
    "gate) gives the calibration gap, and n/N-weighted gaps are the "
    "per-bin ECE contributions (their sum IS the ECE). The audit that "
    "decides whether a quality filter's scores can be THRESHOLDED "
    "meaningfully before it curates 100 TB. Scale: scoring is the "
    "same zero-shuffle scan-speed fold as the classifier; the only "
    "post-agg window is a sum over the 10-row bin rollup",
)
def quality_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    weights = F.array(*[F.lit(((j * 37) % 21 - 10) / 16.0) for j in range(64)])
    toks = text.tokens("text")

    def w_of(tok):
        bucket = (
            F.conv(F.substring(F.md5(tok.cast("binary")), 1, 8), 16, 10).cast("long")
            % 64
        )
        return F.element_at(weights, (bucket + 1).cast("int"))

    n = F.size(toks)
    s = F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + w_of(t))
    logit = F.lit(-0.25) + s / n
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 4) + F.lit(0.0)
    scored = docs.select(
        score.alias("score"),
        (F.col("n_chars") >= 300).cast("int").alias("label"),
    )
    binned = scored.withColumn(
        "bin", F.least(F.lit(9), F.floor(F.col("score") * 10).cast("int"))
    )
    per_bin = binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        (F.round(F.avg("score"), 4) + F.lit(0.0)).alias("mean_confidence"),
        (F.round(F.avg("label"), 4) + F.lit(0.0)).alias("positive_rate"),
    )
    gap = F.abs(F.col("positive_rate") - F.col("mean_confidence"))
    return (
        per_bin.withColumn("n_total", F.sum("n").over(Window.partitionBy()))
        .select(
            "bin",
            "n",
            "mean_confidence",
            "positive_rate",
            (F.round(gap, 4) + F.lit(0.0)).alias("calib_gap"),
            (F.round(gap * F.col("n") / F.col("n_total"), 6) + F.lit(0.0)).alias(
                "ece_contrib"
            ),
        )
        .orderBy("bin")
    )


@_register(
    "golden_record_parts",
    """
    WITH fam AS (
        SELECT p_brand, split_part(p_name, ' ', 2) AS noun,
               p_partkey, p_type, p_size, p_retailprice,
               count(*) OVER (PARTITION BY p_brand,
                              split_part(p_name, ' ', 2)) AS n_members,
               min(p_partkey) OVER (PARTITION BY p_brand,
                                    split_part(p_name, ' ', 2))
                   AS golden_partkey,
               row_number() OVER (PARTITION BY p_brand,
                                  split_part(p_name, ' ', 2)
                                  ORDER BY p_retailprice DESC,
                                           p_partkey DESC) AS rn
        FROM part
    )
    SELECT p_brand, noun, CAST(n_members AS BIGINT) AS n_members,
           golden_partkey,
           p_type AS rep_type, p_size AS rep_size,
           p_retailprice AS rep_price
    FROM fam
    WHERE rn = 1 AND n_members >= 2
    ORDER BY p_brand, noun
    """,
    "GOLDEN-RECORD SURVIVORSHIP (MDM / entity-consolidation): duplicate "
    "part families (blocked on brand + name noun, the "
    "fuzzy_part_duplicates blocking key) collapse to ONE mastered "
    "record via explicit survivorship rules — stable id = min key in "
    "family, representative attributes taken from the highest-priced "
    "member (the 'most complete/most recent wins' rule made "
    "deterministic with a full tie-break), family size kept as audit. "
    "All three windows share one partition key so the family never "
    "leaves its shuffle bucket; no self-join, no collect. The "
    "consolidation step that turns record-linkage PAIRS "
    "(fuzzy_part_duplicates / fellegi_sunter_part_linkage) into a "
    "deduplicated dimension",
)
def golden_record_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = load_table(spark, sf_dir, "part")
    noun = F.element_at(F.split("p_name", " "), 2)
    fam_w = Window.partitionBy("p_brand", "noun")
    rank_w = fam_w.orderBy(F.col("p_retailprice").desc(), F.col("p_partkey").desc())
    fam = parts.withColumn("noun", noun).select(
        "p_brand",
        "noun",
        "p_partkey",
        "p_type",
        "p_size",
        "p_retailprice",
        F.count("*").over(fam_w).alias("n_members"),
        F.min("p_partkey").over(fam_w).alias("golden_partkey"),
        F.row_number().over(rank_w).alias("rn"),
    )
    return (
        fam.filter((F.col("rn") == 1) & (F.col("n_members") >= 2))
        .select(
            "p_brand",
            "noun",
            "n_members",
            "golden_partkey",
            F.col("p_type").alias("rep_type"),
            F.col("p_size").alias("rep_size"),
            F.col("p_retailprice").alias("rep_price"),
        )
        .orderBy("p_brand", "noun")
    )


@_register(
    "doremi_domain_weights",
    r"""
    WITH tok AS (
        SELECT source, lower(unnest(regexp_split_to_array(trim(text), '\s+'))) AS t
        FROM documents
    ),
    vocab AS (SELECT t, count(*) AS cnt FROM tok GROUP BY t),
    total AS (SELECT sum(cnt) AS n FROM vocab),
    scored AS (
        SELECT tok.source, ln(vocab.cnt * 1.0 / total.n) AS logp
        FROM tok JOIN vocab USING (t) CROSS JOIN total
    ),
    per_src AS (
        SELECT source, count(*) AS n_tokens,
               round(-avg(logp), 4) AS mean_nll
        FROM scored GROUP BY source
    ),
    ext AS (
        SELECT *, min(mean_nll) OVER () AS min_nll,
               count(*) OVER () AS n_sources
        FROM per_src
    ),
    term AS (
        SELECT *, round(exp(0.1 * (mean_nll - min_nll)), 6) AS t
        FROM ext
    )
    SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens, mean_nll,
           round(1.0 / n_sources, 6) + 0.0 AS base_weight,
           round(t / sum(t) OVER (), 4) + 0.0 AS updated_weight
    FROM term
    ORDER BY source
    """,
    "DOMAIN REWEIGHTING, DoReMi-style one-step (Xie et al., "
    "arXiv:2305.10429): each source's proxy loss is its mean token "
    "negative-log-likelihood under the corpus unigram LM (the "
    "unigram_logprob_quality model, grouped by source instead of "
    "doc), and mixture weights update multiplicatively — "
    "w_s ∝ w_base * exp(eta * excess_loss_s) with eta=0.1, excess "
    "over the best source, renormalized — upweighting the domains "
    "the reference model finds hardest. This is the exponentiated-"
    "gradient step the DoReMi proxy loop applies per round, computed "
    "exactly from one corpus pass. Scale: vocabulary + corpus total "
    "broadcast (the trained artifact), ONE source-grain rollup; the "
    "min/sum windows run over the #sources-row result. Per-source "
    "NLL is rounded before exp so the update is engine-portable",
)
def doremi_domain_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    tok = docs.select("source", F.explode(text.tokens("text")).alias("t0")).select(
        "source", F.lower("t0").alias("t")
    )
    vocab = tok.groupBy("t").agg(F.count("*").alias("cnt")).localCheckpoint(eager=False)
    total = vocab.agg(F.sum("cnt").alias("n"))
    scored = (
        tok.join(F.broadcast(vocab), "t")
        .join(F.broadcast(total))
        .withColumn("logp", F.log(F.col("cnt") * 1.0 / F.col("n")))
    )
    per_src = scored.groupBy("source").agg(
        F.count("*").alias("n_tokens"),
        F.round(-F.avg("logp"), 4).alias("mean_nll"),
    )
    w_all = Window.partitionBy()
    ext = per_src.withColumn("min_nll", F.min("mean_nll").over(w_all)).withColumn(
        "n_sources", F.count("*").over(w_all)
    )
    term = ext.withColumn(
        "t", F.round(F.exp(0.1 * (F.col("mean_nll") - F.col("min_nll"))), 6)
    )
    return (
        term.select(
            "source",
            "n_tokens",
            "mean_nll",
            (F.round(F.lit(1.0) / F.col("n_sources"), 6) + F.lit(0.0)).alias(
                "base_weight"
            ),
            (
                F.round(F.col("t") / F.sum("t").over(w_all), 4) + F.lit(0.0)
            ).alias("updated_weight"),
        )
        .orderBy("source")
    )


@_register(
    "quantile_normalize_scores",
    """
    WITH pr AS (
        SELECT doc_id, source, n_chars,
               percent_rank() OVER (PARTITION BY source
                                    ORDER BY n_chars, doc_id) AS src_pct
        FROM documents
    ),
    ecdf AS (
        SELECT n_chars AS v,
               (sum(count(*)) OVER (ORDER BY n_chars
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW)) * 1.0
                   / (SELECT count(*) FROM documents) AS cum_frac
        FROM documents GROUP BY n_chars
    )
    SELECT pr.doc_id, pr.source, pr.n_chars AS raw_score,
           round(pr.src_pct, 6) + 0.0 AS source_pct,
           min(ecdf.v) AS normalized_score
    FROM pr JOIN ecdf ON ecdf.cum_frac >= pr.src_pct
    GROUP BY pr.doc_id, pr.source, pr.n_chars, pr.src_pct
    ORDER BY pr.doc_id
    """,
    "QUANTILE NORMALIZATION across sources (the microarray/"
    "score-harmonization transform): each document's score (n_chars "
    "as the stand-in) maps to its WITHIN-SOURCE percent rank, then "
    "onto the pooled corpus distribution's value at that rank — after "
    "which every source's score distribution is the same pooled one, "
    "so cross-source thresholds mean the same thing everywhere (the "
    "fix when one crawl's 'quality 0.8' is another's 0.5). Scale: "
    "per-source ranks are keyed windows; the pooled quantile function "
    "is an ECDF over the VALUE-grain rollup (bounded by the score "
    "domain, not the corpus) whose one ordered window runs on that "
    "rollup; the rank->value lookup broadcasts the ECDF table and "
    "min-aggregates the first value at-or-above each rank — the "
    "inequality join fans out only to the bounded value domain",
)
def quantile_normalize_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w_src = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    pr = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.percent_rank().over(w_src).alias("src_pct"),
    )
    w_v = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    total = docs.agg(F.count("*").alias("n_total"))
    ecdf = (
        docs.groupBy(F.col("n_chars").alias("v"))
        .agg(F.count("*").alias("c"))
        .withColumn("cum", F.sum("c").over(w_v))
        .crossJoin(F.broadcast(total))
        .select("v", (F.col("cum") * 1.0 / F.col("n_total")).alias("cum_frac"))
    )
    joined = pr.join(F.broadcast(ecdf), F.col("cum_frac") >= F.col("src_pct"))
    return (
        joined.groupBy("doc_id", "source", "n_chars", "src_pct")
        .agg(F.min("v").alias("normalized_score"))
        .select(
            "doc_id",
            "source",
            F.col("n_chars").alias("raw_score"),
            (F.round("src_pct", 6) + F.lit(0.0)).alias("source_pct"),
            "normalized_score",
        )
        .orderBy("doc_id")
    )


@_register(
    "eval_embedding_leakage",
    """
    WITH q AS (
        SELECT vec_id AS eval_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id % 50 = 0
    ),
    c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings WHERE vec_id % 50 <> 0
    ),
    s AS (
        SELECT eval_id, vec_id,
               list_dot_product(qv, cv)
                 / (sqrt(list_dot_product(qv, qv))
                    * sqrt(list_dot_product(cv, cv))) AS sim
        FROM q JOIN c ON vec_id <> eval_id
    ),
    r AS (
        SELECT eval_id, vec_id, sim,
               row_number() OVER (PARTITION BY eval_id
                                  ORDER BY sim DESC, vec_id) AS rn
        FROM s
    )
    SELECT eval_id, vec_id AS nearest_corpus_id,
           round(sim, 6) AS cosine_sim,
           sim >= 0.9 AS is_leak
    FROM r WHERE rn = 1
    ORDER BY eval_id
    """,
    "EMBEDDING-SPACE eval decontamination: for every held-out eval "
    "vector (deterministic vec_id%50 sample), the nearest corpus "
    "vector by cosine and a leak verdict at 0.9 — the SEMANTIC twin "
    "of decontaminate_eval_overlap's n-gram check, catching "
    "paraphrased/reformatted eval contamination that exact shingles "
    "miss (the Phi/GPT-4 decontamination protocol). Scale: the eval "
    "side is tiny and BROADCAST (brute_force_topk's dense side); at "
    "corpus scale swap the corpus-side scan for the IVF/LSH-bucketed "
    "probe (sim_ivf_topk / sim_lsh_ann_topk) — same output contract, "
    "which is why the exact form here is the auditable baseline",
)
def eval_embedding_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    corpus = emb.filter(F.col("vec_id") % 50 != 0)
    nearest = similarity.brute_force_topk(corpus, queries, k=1)
    return (
        nearest.filter(F.col("rank") == 1)
        .select(
            F.col("query_id").alias("eval_id"),
            F.col("vec_id").alias("nearest_corpus_id"),
            F.round("cosine_sim", 6).alias("cosine_sim"),
            (F.col("cosine_sim") >= 0.9).alias("is_leak"),
        )
        .orderBy("eval_id")
    )


@_register(
    "association_rules_parts",
    """
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items),
    isup AS (
        SELECT l_partkey, count(*) AS s FROM items GROUP BY l_partkey
    ),
    freq AS (SELECT l_partkey FROM isup WHERE s >= 3),
    fitems AS (
        SELECT i.l_orderkey, i.l_partkey FROM items i
        JOIN freq f ON i.l_partkey = f.l_partkey
    ),
    pairs AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS ps
        FROM fitems a JOIN fitems b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING count(*) >= 2
    ),
    rules AS (
        SELECT pa AS antecedent, pb AS consequent, ps FROM pairs
        UNION ALL
        SELECT pb AS antecedent, pa AS consequent, ps FROM pairs
    )
    SELECT r.antecedent, r.consequent,
           CAST(r.ps AS BIGINT) AS pair_support,
           CAST(ia.s AS BIGINT) AS ante_support,
           CAST(ic.s AS BIGINT) AS cons_support,
           round(r.ps * 1.0 / ia.s, 4) AS confidence,
           round(r.ps * 1.0 * n.n_orders / (ia.s * 1.0 * ic.s), 4) AS lift
    FROM rules r
    JOIN isup ia ON r.antecedent = ia.l_partkey
    JOIN isup ic ON r.consequent = ic.l_partkey
    CROSS JOIN n
    ORDER BY lift DESC, confidence DESC, antecedent, consequent
    LIMIT 25
    """,
    "ASSOCIATION RULES over the market baskets: the frequent pairs "
    "(same a-priori prune as frequent_part_pairs) become directed "
    "rules A=>B scored with CONFIDENCE supp(AB)/supp(A) and LIFT "
    "conf/P(B) — the co-purchase signal ranked by how far it beats "
    "the independence baseline, which raw pair support can't tell "
    "(Agrawal/Srikant, VLDB'94). All ratios divide exact integer "
    "supports, so both engines compute identical doubles. Scale: the "
    "pair rollup is the only order-keyed shuffle; item supports are "
    "catalog-grain and broadcast onto the rules; the basket count is "
    "a 1-row scalar broadcast; top-25 is TakeOrderedAndProject",
)
def association_rules_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct().localCheckpoint(eager=False)
    n = items.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    isup = (
        items.groupBy("l_partkey").agg(F.count("*").alias("s")).localCheckpoint(eager=False)
    )
    freq = isup.filter(F.col("s") >= 3).select("l_partkey")
    fitems = items.join(F.broadcast(freq), "l_partkey").localCheckpoint(eager=False)
    a, b = fitems.alias("a"), fitems.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count("*").alias("ps"))
        .filter(F.col("ps") >= 2)
    )
    rules = pairs.select(
        F.col("pa").alias("antecedent"), F.col("pb").alias("consequent"), "ps"
    ).unionByName(
        pairs.select(
            F.col("pb").alias("antecedent"), F.col("pa").alias("consequent"), "ps"
        )
    )
    ia = isup.select(F.col("l_partkey").alias("antecedent"), F.col("s").alias("sa"))
    ic = isup.select(F.col("l_partkey").alias("consequent"), F.col("s").alias("sc"))
    return (
        rules.join(F.broadcast(ia), "antecedent")
        .join(F.broadcast(ic), "consequent")
        .crossJoin(F.broadcast(n))
        .select(
            "antecedent",
            "consequent",
            F.col("ps").alias("pair_support"),
            F.col("sa").alias("ante_support"),
            F.col("sc").alias("cons_support"),
            F.round(F.col("ps") * 1.0 / F.col("sa"), 4).alias("confidence"),
            F.round(
                F.col("ps") * 1.0 * F.col("n_orders")
                / (F.col("sa") * 1.0 * F.col("sc")),
                4,
            ).alias("lift"),
        )
        .orderBy(
            F.col("lift").desc(),
            F.col("confidence").desc(),
            "antecedent",
            "consequent",
        )
        .limit(25)
    )


@_register(
    "nation_link_prediction",
    """
    WITH weighted AS (
        SELECT least(cn.n_name, sn.n_name)    AS a,
               greatest(cn.n_name, sn.n_name) AS b,
               count(*) AS w
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey  = c.c_custkey
        JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
        JOIN supplier s ON l.l_suppkey  = s.s_suppkey
        JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
        WHERE cn.n_name <> sn.n_name
        GROUP BY a, b
    ),
    mw AS (SELECT avg(w) AS m FROM weighted),
    raw_edges AS (SELECT a, b FROM weighted, mw WHERE w > m),
    sym AS (
        SELECT a AS x, b AS z FROM raw_edges
        UNION ALL
        SELECT b AS x, a AS z FROM raw_edges
    ),
    deg AS (SELECT x AS node, count(*) AS d FROM sym GROUP BY x),
    wedges AS (
        SELECT s1.x AS u, s2.x AS v, s1.z AS z
        FROM sym s1 JOIN sym s2
          ON s1.z = s2.z AND s1.x < s2.x
    ),
    scored AS (
        SELECT w.u, w.v,
               count(*) AS common_neighbors,
               round(sum(1.0 / ln(deg.d)), 6) AS adamic_adar
        FROM wedges w JOIN deg ON w.z = deg.node
        GROUP BY w.u, w.v
    )
    SELECT s.u AS nation_a, s.v AS nation_b,
           CAST(s.common_neighbors AS BIGINT) AS common_neighbors,
           s.adamic_adar
    FROM scored s
    LEFT JOIN raw_edges e ON e.a = s.u AND e.b = s.v
    WHERE e.a IS NULL
    ORDER BY s.adamic_adar DESC, nation_a, nation_b
    LIMIT 20
    """,
    "LINK PREDICTION on the above-mean-weight trade BACKBONE — Adamic-Adar scores "
    "(sum of 1/ln(deg) over common neighbors) for node pairs NOT yet "
    "connected: the 'who will trade next' / recommendation primitive "
    "(Liben-Nowell & Kleinberg, CIKM'03). Wedge enumeration is an "
    "equi-join keyed on the shared neighbor — pairs meet in their "
    "common neighbor's bucket (the same bucketing idea as LSH bands), "
    "never all-pairs; degrees join at node grain; existing edges drop "
    "via an anti join. Common neighbors of a pair always have degree "
    ">= 2, so ln(deg) is never zero. The corpus-scale cost is the ONE "
    "edge-aggregation pass (shared with the whole nation_trade_* "
    "family); wedges/degrees live on the aggregated graph. At 100 TB "
    "hub neighbors dominate wedge fan-out — cap or sample "
    "above-arboricity hubs (documented skew valve), scores unchanged "
    "for non-hub pairs",
)
def nation_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            F.least("cust_nation", "supp_nation").alias("a"),
            F.greatest("cust_nation", "supp_nation").alias("b"),
        )
        .agg(F.count("*").alias("w"))
        # the aggregated weighted edge list feeds the mean threshold
        # and the backbone — barrier so the fact-scale aggregation
        # runs once (the nation_trade_kcore backbone recipe: the FULL
        # graph is complete at scale, so prediction only makes sense
        # on the above-mean-weight backbone)
        .localCheckpoint(eager=False)
    )
    mean_w = edges.agg(F.avg("w").alias("m"))
    edges = (
        edges.crossJoin(F.broadcast(mean_w))
        .filter(F.col("w") > F.col("m"))
        .select("a", "b")
        .localCheckpoint(eager=False)
    )
    sym = edges.select(F.col("a").alias("x"), F.col("b").alias("z")).unionByName(
        edges.select(F.col("b").alias("x"), F.col("a").alias("z"))
    )
    deg = sym.groupBy(F.col("x").alias("node")).agg(F.count("*").alias("d"))
    s1, s2 = sym.alias("s1"), sym.alias("s2")
    wedges = s1.join(
        s2, (F.col("s1.z") == F.col("s2.z")) & (F.col("s1.x") < F.col("s2.x"))
    ).select(F.col("s1.x").alias("u"), F.col("s2.x").alias("v"), F.col("s1.z").alias("z"))
    scored = (
        wedges.join(F.broadcast(deg), wedges.z == deg.node)
        .groupBy("u", "v")
        .agg(
            F.count("*").alias("common_neighbors"),
            F.round(F.sum(1.0 / F.log(F.col("d"))), 6).alias("adamic_adar"),
        )
    )
    return (
        scored.join(
            F.broadcast(edges),
            (scored.u == edges.a) & (scored.v == edges.b),
            "left_anti",
        )
        .select(
            F.col("u").alias("nation_a"),
            F.col("v").alias("nation_b"),
            "common_neighbors",
            "adamic_adar",
        )
        .orderBy(F.col("adamic_adar").desc(), "nation_a", "nation_b")
        .limit(20)
    )


@_register(
    "user_activity_trend",
    """
    WITH daily AS (
        SELECT user_id,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
               count(*) AS y
        FROM events
        GROUP BY user_id, x
    ),
    m AS (
        SELECT user_id, count(*) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx
        FROM daily GROUP BY user_id
    )
    SELECT user_id, CAST(n AS INT) AS n_days,
           CAST(sy AS BIGINT) AS total_events,
           round((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx), 6) + 0.0
               AS events_per_day_slope
    FROM m
    WHERE n >= 5
    ORDER BY user_id
    """,
    "GROUPED TREND REGRESSION: per-user OLS slope of daily event "
    "count over calendar time (x = epoch-day ordinal), from one "
    "moment aggregate per user — the engagement-trajectory feature "
    "(growing/flat/churning) behind retention models. Every moment "
    "(n, sum x, sum y, sum xy, sum x^2) is EXACT integer arithmetic; "
    "the single closed-form division is the only float op, so both "
    "engines agree to the bit before rounding. Scale: the daily "
    "rollup and the per-user moments share one user_id exchange "
    "(subset partitioning); no window, no series materialization — "
    "the same normal-equations pattern as multi_regression_price, "
    "partitioned by group",
)
def user_activity_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spread(load_table(spark, sf_dir, "events"), "user_id")
    daily = ev.groupBy(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).alias(
            "x"
        ),
    ).agg(F.count("*").alias("y"))
    m = daily.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        * 1.0
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    )
    return (
        m.filter(F.col("n") >= 5)
        .select(
            "user_id",
            F.col("n").cast("int").alias("n_days"),
            F.col("sy").alias("total_events"),
            (F.round(slope, 6) + F.lit(0.0)).alias("events_per_day_slope"),
        )
        .orderBy("user_id")
    )


@_register(
    "cross_source_dup_flow",
    f"""
    WITH sets AS (
        SELECT doc_id, source, n_chars, list_distinct({_D_SHINGLES}) AS sh
        FROM documents
    ),
    ne AS (SELECT * FROM sets WHERE len(sh) > 0),
    p AS (
        SELECT a.doc_id AS da, b.doc_id AS db,
               a.source AS source_kept, b.source AS source_dropped,
               b.n_chars AS dropped_chars,
               len(list_intersect(a.sh, b.sh)) AS i,
               len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS u
        FROM ne a JOIN ne b ON a.doc_id < b.doc_id
    )
    SELECT source_kept, source_dropped,
           count(*) AS n_pairs,
           CAST(sum(dropped_chars) AS BIGINT) AS dropped_chars
    FROM p WHERE i * 1.0 / u >= 0.5
    GROUP BY source_kept, source_dropped
    ORDER BY n_pairs DESC, source_kept, source_dropped
    """,
    "CROSS-SOURCE DUPLICATION FLOW — dedup ATTRIBUTION: every "
    "near-dup pair (exact prefix-filtered Jaccard >= 0.5, the "
    "prefix_jaccard_pairs production path) charges the dropped "
    "document's source against the keeper's (first-writer, min "
    "doc_id), rolled up into a source x source flow matrix with the "
    "char mass dedup removes — the audit that shows WHICH crawls are "
    "republishing which (mirror detection) before mixture weights "
    "treat them as independent volume. The complement of "
    "source_shingle_overlap: that measures vocabulary overlap, this "
    "counts actual near-duplicate documents. Scale: identical plan to "
    "prefix_jaccard_pairs (its three keyed shuffles) plus a "
    "sources^2-bounded rollup; the oracle is the brute-force "
    "cross-join of the same semantics, so the hash-match proves the "
    "prefix pruning lossless through the attribution too",
)
def cross_source_dup_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    pairs = dedup.prefix_filter_jaccard_pairs(
        docs, "doc_id", text_col="text", threshold=0.5
    )
    meta = docs.select("doc_id", "source", "n_chars")
    a = meta.select(
        F.col("doc_id").alias("doc_id_a"), F.col("source").alias("source_kept")
    )
    b = meta.select(
        F.col("doc_id").alias("doc_id_b"),
        F.col("source").alias("source_dropped"),
        F.col("n_chars").alias("dc"),
    )
    return (
        pairs.join(a, "doc_id_a")
        .join(b, "doc_id_b")
        .groupBy("source_kept", "source_dropped")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum("dc").alias("dropped_chars"),
        )
        .orderBy(F.col("n_pairs").desc(), "source_kept", "source_dropped")
    )


@_register(
    "compaction_plan",
    """
    WITH day_files AS (
        SELECT CAST(ts AS DATE) AS d,
               count(*) AS n_rows,
               sum(coalesce(strlen(props), 0) + 64) AS bytes
        FROM events GROUP BY d
    ),
    placed AS (
        SELECT d, n_rows, bytes,
               coalesce(sum(bytes) OVER (ORDER BY d
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), 0) AS cum_before
        FROM day_files
    )
    SELECT CAST(floor(cum_before / 50000) AS INT) AS file_id,
           CAST(count(*) AS INT) AS n_source_files,
           min(d) AS day_min, max(d) AS day_max,
           CAST(sum(bytes) AS BIGINT) AS total_bytes,
           CAST(sum(n_rows) AS BIGINT) AS total_rows
    FROM placed
    GROUP BY file_id
    ORDER BY file_id
    """,
    "COMPACTION PLANNING (the lakehouse small-file problem — Delta "
    "OPTIMIZE / Iceberg rewrite_data_files): per-day ingest 'files' "
    "(row count + byte mass from the payload column) are packed "
    "in day order into ~50 KB compacted files via cumulative-offset "
    "bin assignment — the same parallel first-fit-in-order rule as "
    "pack_training_sequences, so the plan is deterministic and "
    "reproducible under repartitioning (no sequential greedy state). "
    "Each output row is one compacted file: which day range it "
    "merges, how many small files it retires, and its final size — "
    "the maintenance plan that keeps scan task counts sane at 100 TB. "
    "Scale: one fact pass to day-grain stats; the ordered window runs "
    "over the days-sized rollup",
)
def compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day_files = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").alias("n_rows"),
        F.sum(F.coalesce(F.octet_length("props"), F.lit(0)) + 64).alias("bytes"),
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    placed = day_files.withColumn(
        "cum_before", F.coalesce(F.sum("bytes").over(w), F.lit(0))
    )
    return (
        placed.groupBy(
            F.floor(F.col("cum_before") / 50000).cast("int").alias("file_id")
        )
        .agg(
            F.count("*").cast("int").alias("n_source_files"),
            F.min("d").alias("day_min"),
            F.max("d").alias("day_max"),
            F.sum("bytes").alias("total_bytes"),
            F.sum("n_rows").alias("total_rows"),
        )
        .orderBy("file_id")
    )


@_register(
    "mutual_nearest_embeddings",
    """
    WITH v AS (
        SELECT vec_id,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> x / sqrt(list_dot_product(
                                        CAST(embedding AS DOUBLE[]),
                                        CAST(embedding AS DOUBLE[])))) AS nv
        FROM embeddings
    ),
    half AS (
        SELECT a.vec_id AS qa, b.vec_id AS qb,
               list_dot_product(a.nv, b.nv) AS sim
        FROM v a JOIN v b ON a.vec_id < b.vec_id
    ),
    s AS (
        SELECT qa, qb, sim FROM half
        UNION ALL
        SELECT qb AS qa, qa AS qb, sim FROM half
    ),
    nn AS (
        SELECT qa, qb, sim,
               row_number() OVER (PARTITION BY qa
                                  ORDER BY sim DESC, qb) AS rn
        FROM s
    ),
    best AS (SELECT qa, qb, sim FROM nn WHERE rn = 1)
    SELECT x.qa AS vec_a, x.qb AS vec_b, round(x.sim, 6) AS cosine_sim
    FROM best x JOIN best y
      ON x.qb = y.qa AND y.qb = x.qa AND x.qa < x.qb
    ORDER BY vec_a
    """,
    "MUTUAL NEAREST NEIGHBORS over the embedding space: pairs where "
    "each vector is the other's single nearest neighbor — the "
    "high-precision alignment primitive (bitext mining / dataset "
    "pairing a la CCMatrix, and the pair pool contrastive training "
    "mines first): a one-sided NN can be a hub artifact, a MUTUAL one "
    "rarely is. Composed as brute_force_topk at k=1 over the corpus "
    "(queries broadcast) + a self-join of the NN table on the "
    "reciprocity condition — the NN table is corpus-grain (one row "
    "per vector), so the reciprocity join is cheap; the exact NN scan "
    "is the auditable baseline whose production swap is the "
    "IVF/LSH-bucketed probe (same output contract, documented in the "
    "similarity family)",
)
def mutual_nearest_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # pre-normalize ONCE per vector (map-side), then each unordered
    # pair costs one dot product computed ONCE and mirrored into both
    # directions for the per-query rank — 4x less arithmetic than the
    # naive directed cosine join (norms recomputed per pair)
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(
            F.zip_with(e, e, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
    )
    v = emb.select(
        "vec_id", F.transform(e, lambda x: x / norm).alias("nv")
    ).localCheckpoint(eager=False)
    # the probe side inherits the (few-file) scan partitioning — spread
    # it so the O(n^2/2) pair arithmetic uses every core
    a = spread(v, "vec_id").select(
        F.col("vec_id").alias("qa"), F.col("nv").alias("na")
    )
    b = v.select(F.col("vec_id").alias("qb"), F.col("nv").alias("nb"))
    half = (
        a.join(F.broadcast(b), F.col("qa") < F.col("qb"))
        .select(
            "qa",
            "qb",
            F.aggregate(
                F.zip_with("na", "nb", lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("sim"),
        )
        .localCheckpoint(eager=False)
    )
    directed = half.unionByName(
        half.select(
            F.col("qb").alias("qa"), F.col("qa").alias("qb"), F.col("sim")
        )
    )
    w = Window.partitionBy("qa").orderBy(F.col("sim").desc(), "qb")
    best = (
        directed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("qa").alias("query_id"),
            F.col("qb").alias("vec_id"),
            F.col("sim").alias("cosine_sim"),
        )
        .localCheckpoint(eager=False)
    )
    x, y = best.alias("x"), best.alias("y")
    return (
        x.join(
            y,
            (F.col("x.vec_id") == F.col("y.query_id"))
            & (F.col("y.vec_id") == F.col("x.query_id"))
            & (F.col("x.query_id") < F.col("x.vec_id")),
        )
        .select(
            F.col("x.query_id").alias("vec_a"),
            F.col("x.vec_id").alias("vec_b"),
            F.round(F.col("x.cosine_sim"), 6).alias("cosine_sim"),
        )
        .orderBy("vec_a")
    )


@_register(
    "nation_trade_anf",
    """
    WITH weighted AS (
        SELECT least(cn.n_name, sn.n_name)    AS a,
               greatest(cn.n_name, sn.n_name) AS b,
               count(*) AS w
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey  = c.c_custkey
        JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
        JOIN supplier s ON l.l_suppkey  = s.s_suppkey
        JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
        WHERE cn.n_name <> sn.n_name
        GROUP BY a, b
    ),
    mw AS (SELECT avg(w) AS m FROM weighted),
    bb AS (SELECT a, b FROM weighted, mw WHERE w > m),
    d1 AS (
        SELECT a AS x, b AS z FROM bb
        UNION
        SELECT b AS x, a AS z FROM bb
    ),
    d2 AS (
        SELECT x, z FROM d1
        UNION
        SELECT e1.x, e2.z FROM d1 e1 JOIN d1 e2 ON e1.z = e2.x
        WHERE e1.x <> e2.z
    ),
    d3 AS (
        SELECT x, z FROM d2
        UNION
        SELECT d2.x, d1.z FROM d2 JOIN d1 ON d2.z = d1.x
        WHERE d2.x <> d1.z
    ),
    n AS (SELECT count(DISTINCT x) AS nn FROM d1)
    SELECT r.radius,
           CAST(r.n_pairs AS BIGINT) AS n_pairs,
           round(r.n_pairs * 1.0 / (n.nn * 1.0 * (n.nn - 1)), 4)
               AS reach_frac
    FROM (
        SELECT 1 AS radius, (SELECT count(*) FROM d1) AS n_pairs
        UNION ALL
        SELECT 2, (SELECT count(*) FROM d2)
        UNION ALL
        SELECT 3, (SELECT count(*) FROM d3)
    ) r CROSS JOIN n
    ORDER BY r.radius
    """,
    "APPROXIMATE NEIGHBOURHOOD FUNCTION shape (ANF/HyperANF, Palmer "
    "et al. KDD'02 / Boldi-Vigna WWW'11): for radius r = 1..3, how "
    "many ordered node pairs of the above-mean trade backbone are "
    "within r hops, and what fraction of all pairs — the "
    "connectivity/effective-diameter audit (effective diameter = "
    "first r reaching 90%). Each expansion round is one equi-join on "
    "the frontier key + a distinct, on the AGGREGATED graph; the "
    "corpus-scale cost is the single edge-aggregation pass shared by "
    "the nation_trade_* family. Here reachable SETS are exact "
    "(node-grain graph); at 100 TB node scale each set becomes an "
    "HLL sketch unioned per round — HyperANF's exact trick, same "
    "join shape, error-bounded counts (the hll_union_event_types "
    "mergeable-sketch pattern)",
)
def nation_trade_anf(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    weighted = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            F.least("cust_nation", "supp_nation").alias("a"),
            F.greatest("cust_nation", "supp_nation").alias("b"),
        )
        .agg(F.count("*").alias("w"))
        .localCheckpoint(eager=False)
    )
    mean_w = weighted.agg(F.avg("w").alias("m"))
    bb = (
        weighted.crossJoin(F.broadcast(mean_w))
        .filter(F.col("w") > F.col("m"))
        .select("a", "b")
    )
    d1 = (
        bb.select(F.col("a").alias("x"), F.col("b").alias("z"))
        .unionByName(bb.select(F.col("b").alias("x"), F.col("a").alias("z")))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def expand(reach: DataFrame) -> DataFrame:
        e1, e2 = reach.alias("e1"), d1.alias("e2")
        step = (
            e1.join(e2, F.col("e1.z") == F.col("e2.x"))
            .select(F.col("e1.x").alias("x"), F.col("e2.z").alias("z"))
            .filter(F.col("x") != F.col("z"))
        )
        return reach.unionByName(step).distinct().localCheckpoint(eager=False)

    d2 = expand(d1)
    d3 = expand(d2)
    nn = d1.agg(F.countDistinct("x").alias("nn"))
    counts = (
        d1.agg(F.count("*").alias("n_pairs")).select(F.lit(1).alias("radius"), "n_pairs")
        .unionByName(
            d2.agg(F.count("*").alias("n_pairs")).select(
                F.lit(2).alias("radius"), "n_pairs"
            )
        )
        .unionByName(
            d3.agg(F.count("*").alias("n_pairs")).select(
                F.lit(3).alias("radius"), "n_pairs"
            )
        )
    )
    return (
        counts.crossJoin(F.broadcast(nn))
        .select(
            "radius",
            "n_pairs",
            F.round(
                F.col("n_pairs") * 1.0 / (F.col("nn") * 1.0 * (F.col("nn") - 1)), 4
            ).alias("reach_frac"),
        )
        .orderBy("radius")
    )


@_register(
    "embedding_pca_top_component",
    """
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    expl AS (
        SELECT vec_id, u.i AS i, u.x AS x
        FROM (SELECT vec_id,
                     unnest(list_transform(range(1, len(e) + 1),
                            i -> struct_pack(i := i, x := e[i]))) AS u
              FROM v)
    ),
    n AS (SELECT count(*) AS n FROM v),
    mu AS (SELECT i, sum(x) / (SELECT n FROM n) AS m FROM expl GROUP BY i),
    gram AS (
        SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS s
        FROM expl a JOIN expl b ON a.vec_id = b.vec_id
        GROUP BY a.i, b.i
    ),
    cov AS (
        SELECT g.i, g.j,
               round(g.s / n.n - ma.m * mb.m, 6) AS c
        FROM gram g
        JOIN mu ma ON g.i = ma.i
        JOIN mu mb ON g.j = mb.i
        CROSS JOIN n
    ),
    v0 AS (SELECT i, 1.0 AS val FROM mu),
    r1 AS (SELECT c.i, sum(c.c * v0.val) AS val
           FROM cov c JOIN v0 ON c.j = v0.i GROUP BY c.i),
    p1 AS (SELECT val AS pv FROM r1 ORDER BY abs(val) DESC, i LIMIT 1),
    n1 AS (SELECT i, round(val / (SELECT pv FROM p1), 8) AS val FROM r1),
    r2 AS (SELECT c.i, sum(c.c * n1.val) AS val
           FROM cov c JOIN n1 ON c.j = n1.i GROUP BY c.i),
    p2 AS (SELECT val AS pv FROM r2 ORDER BY abs(val) DESC, i LIMIT 1),
    n2 AS (SELECT i, round(val / (SELECT pv FROM p2), 8) AS val FROM r2),
    r3 AS (SELECT c.i, sum(c.c * n2.val) AS val
           FROM cov c JOIN n2 ON c.j = n2.i GROUP BY c.i),
    p3 AS (SELECT val AS pv FROM r3 ORDER BY abs(val) DESC, i LIMIT 1),
    n3 AS (SELECT i, round(val / (SELECT pv FROM p3), 8) AS val FROM r3)
    SELECT CAST(i AS INT) AS dim, val + 0.0 AS loading
    FROM n3 ORDER BY dim
    """,
    "PCA TOP COMPONENT at corpus scale — covariance from ONE pass "
    "(per-row outer products partial-aggregate map-side into dim^2 = "
    "4096 cells, the RowMatrix Gram trick), then THREE unrolled power-"
    "iteration matvecs on the dims-grain covariance table (each a "
    "broadcast join on the dim key + a 64-row rollup). Per-round "
    "pivot normalization (divide by the signed largest-|.| element, "
    "ties to lowest dim) canonicalizes scale AND sign, and per-round "
    "8dp rounding keeps the iteration engine-portable — the same "
    "determinism recipe as nation_trade_pagerank. The principal "
    "direction feeds whitening/compression/drift monitoring "
    "(embedding_dimension_whitening's big sibling); the corpus-scale "
    "cost is ONE scan — everything after the 4096-cell covariance is "
    "dimension-grain, executor-count independent",
)
def embedding_pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    expl = emb.select(
        "vec_id",
        F.posexplode(e).alias("i0", "x"),
    ).select("vec_id", (F.col("i0") + 1).alias("i"), "x")
    # per-row outer products, partial-aggregated map-side into 4096
    # cells; consumed with the means and the count below
    pairs = emb.select(
        F.explode(
            F.expr(
                "flatten(transform(transform(embedding, c -> CAST(c AS DOUBLE)), "
                "(xi, i) -> transform(transform(embedding, c -> CAST(c AS DOUBLE)), "
                "(xj, j) -> struct(i + 1 AS i, j + 1 AS j, xi * xj AS p))))"
            )
        ).alias("u")
    ).select("u.i", "u.j", "u.p")
    gram = pairs.groupBy("i", "j").agg(F.sum("p").alias("s"))
    n = emb.agg(F.count("*").alias("n"))
    mu = (
        expl.groupBy("i")
        .agg(F.sum("x").alias("sx"))
        .crossJoin(F.broadcast(n))
        .select("i", (F.col("sx") / F.col("n")).alias("m"))
        .localCheckpoint(eager=False)
    )
    ma = mu.select(F.col("i").alias("mi"), F.col("m").alias("m_i"))
    mb = mu.select(F.col("i").alias("mj"), F.col("m").alias("m_j"))
    cov = (
        gram.join(F.broadcast(ma), gram.i == ma.mi)
        .join(F.broadcast(mb), gram.j == mb.mj)
        .crossJoin(F.broadcast(n))
        .select(
            "i",
            "j",
            F.round(
                F.col("s") / F.col("n") - F.col("m_i") * F.col("m_j"), 6
            ).alias("c"),
        )
        .localCheckpoint(eager=False)
    )
    vec = mu.select("i", F.lit(1.0).alias("val"))

    def matvec_normalize(v: DataFrame) -> DataFrame:
        vv = v.select(F.col("i").alias("j"), F.col("val").alias("vj"))
        r = (
            cov.join(F.broadcast(vv), "j")
            .groupBy("i")
            .agg(F.sum(F.col("c") * F.col("vj")).alias("val"))
        )
        pivot = r.orderBy(F.abs(F.col("val")).desc(), "i").limit(1).select(
            F.col("val").alias("pivot")
        )
        return (
            r.crossJoin(F.broadcast(pivot))
            .select("i", F.round(F.col("val") / F.col("pivot"), 8).alias("val"))
            .localCheckpoint(eager=False)
        )

    for _ in range(3):
        vec = matvec_normalize(vec)
    return vec.select(
        F.col("i").cast("int").alias("dim"),
        (F.col("val") + F.lit(0.0)).alias("loading"),
    ).orderBy("dim")


@_register(
    "bag_setops_orders",
    """
    WITH y99 AS (
        SELECT o_custkey, o_orderpriority FROM orders
        WHERE o_orderdate >= TIMESTAMP '1999-01-01'
          AND o_orderdate <  TIMESTAMP '2000-01-01'
    ),
    y00 AS (
        SELECT o_custkey, o_orderpriority FROM orders
        WHERE o_orderdate >= TIMESTAMP '2000-01-01'
          AND o_orderdate <  TIMESTAMP '2001-01-01'
    )
    SELECT 'except_all' AS op, o_custkey, o_orderpriority
    FROM (SELECT * FROM y99 EXCEPT ALL SELECT * FROM y00)
    UNION ALL
    SELECT 'intersect_all' AS op, o_custkey, o_orderpriority
    FROM (SELECT * FROM y99 INTERSECT ALL SELECT * FROM y00)
    ORDER BY op, o_custkey, o_orderpriority
    """,
    "BAG-SEMANTICS SET OPERATIONS (EXCEPT ALL / INTERSECT ALL): the "
    "multiset counterparts of the distinct set ops in operators/"
    "setops.py — two order-year workload slices at (customer, "
    "priority) grain, where EXCEPT ALL keeps the SURPLUS occurrences "
    "(a customer with three urgent orders in 1999 and one in 2000 "
    "contributes two rows — lost order VOLUME, which distinct EXCEPT "
    "silently collapses) and INTERSECT ALL the matched ones. Spark "
    "plans both as hash aggregates computing per-row multiplicity "
    "deltas (count_l - count_r) then a generate replay — one shuffle "
    "per side on the full row key, the same partial+final shape as "
    "any distinct, no join. Completes the §2.7 set-op family at bag "
    "semantics",
)
def bag_setops_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def year_slice(lo: str, hi: str) -> DataFrame:
        return orders.filter(
            (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
        ).select("o_custkey", "o_orderpriority")

    y99 = year_slice("1999-01-01", "2000-01-01")
    y00 = year_slice("2000-01-01", "2001-01-01")
    tagged = y99.exceptAll(y00).select(
        F.lit("except_all").alias("op"), "o_custkey", "o_orderpriority"
    ).unionByName(
        y99.intersectAll(y00).select(
            F.lit("intersect_all").alias("op"), "o_custkey", "o_orderpriority"
        )
    )
    return tagged.orderBy("op", "o_custkey", "o_orderpriority")


@_register(
    "quality_gate_threshold_sweep",
    r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents
    ),
    f AS (
        SELECT doc_id,
               sum(((CAST(('0x' || substr(md5(tok), 1, 8))::UBIGINT % 64
                          AS BIGINT) * 37) % 21 - 10) / 16.0) AS s,
               count(*) AS n
        FROM toks GROUP BY doc_id
    ),
    scored AS (
        SELECT doc_id, n,
               round(1.0 / (1.0 + exp(-(-0.25 + s / n))), 4) + 0.0 AS score
        FROM f
    ),
    n_total AS (SELECT count(*) AS nt, sum(n) AS tok_total FROM scored),
    sweep AS (
        SELECT s.doc_id, s.n, s.score, t.thr
        FROM scored s,
             (SELECT CAST(unnest([0.30, 0.35, 0.40, 0.45, 0.50,
                                  0.55, 0.60, 0.65, 0.70]) AS DOUBLE)
                     AS thr) t
        WHERE s.score >= t.thr
    )
    SELECT sweep.thr AS threshold,
           count(*) AS docs_kept,
           round(count(*) * 1.0 / n_total.nt, 4) AS kept_frac,
           round(sum(sweep.n) * 1.0 / n_total.tok_total, 4)
               AS token_mass_kept_frac
    FROM sweep CROSS JOIN n_total
    GROUP BY sweep.thr, n_total.nt, n_total.tok_total
    ORDER BY threshold
    """,
    "QUALITY-GATE OPERATING CURVE: the threshold sweep a data team "
    "runs BEFORE committing a 100 TB filter pass — for nine candidate "
    "score cutoffs, how many documents and what fraction of the "
    "TOKEN mass survive the linear quality classifier at that "
    "threshold (token mass is what the training budget actually "
    "buys). Scoring is the classifier's zero-shuffle scan-speed fold "
    "done ONCE; the sweep is a 9-way map-side explode of threshold "
    "literals (no joins, no re-scoring per cutoff) into a 9-row "
    "rollup; corpus totals are a 1-row broadcast. Answers 'where do "
    "we set the knife' with one corpus pass",
)
def quality_gate_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    weights = F.array(*[F.lit(((j * 37) % 21 - 10) / 16.0) for j in range(64)])
    toks = text.tokens("text")

    def w_of(tok):
        bucket = (
            F.conv(F.substring(F.md5(tok.cast("binary")), 1, 8), 16, 10).cast("long")
            % 64
        )
        return F.element_at(weights, (bucket + 1).cast("int"))

    n = F.size(toks)
    s = F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + w_of(t))
    score = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.lit(-0.25) + s / n))), 4
    ) + F.lit(0.0)
    scored = docs.select(
        n.alias("n"), score.alias("score")
    ).localCheckpoint(eager=False)
    totals = scored.agg(
        F.count("*").alias("nt"), F.sum("n").alias("tok_total")
    )
    thrs = [0.30, 0.35, 0.40, 0.45, 0.50, 0.55, 0.60, 0.65, 0.70]
    sweep = scored.select(
        "n",
        "score",
        F.explode(F.array(*[F.lit(t) for t in thrs])).alias("thr"),
    ).filter(F.col("score") >= F.col("thr"))
    return (
        sweep.groupBy(F.col("thr").alias("threshold"))
        .agg(F.count("*").alias("docs_kept"), F.sum("n").alias("kept_toks"))
        .crossJoin(F.broadcast(totals))
        .select(
            "threshold",
            "docs_kept",
            F.round(F.col("docs_kept") * 1.0 / F.col("nt"), 4).alias("kept_frac"),
            F.round(F.col("kept_toks") * 1.0 / F.col("tok_total"), 4).alias(
                "token_mass_kept_frac"
            ),
        )
        .orderBy("threshold")
    )


@_register(
    "neardup_threshold_sweep",
    f"""
    WITH sets AS (
        SELECT doc_id, list_distinct({_D_SHINGLES}) AS sh FROM documents
    ),
    ne AS (SELECT * FROM sets WHERE len(sh) > 0),
    p AS (
        SELECT a.doc_id AS da, b.doc_id AS db,
               len(list_intersect(a.sh, b.sh)) * 1.0
                 / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
                 AS j
        FROM ne a JOIN ne b ON a.doc_id < b.doc_id
    ),
    sweep AS (
        SELECT p.da, p.db, t.thr
        FROM p, (SELECT CAST(unnest([0.3, 0.4, 0.5, 0.6, 0.7, 0.8]) AS DOUBLE) AS thr) t
        WHERE p.j >= t.thr
    )
    SELECT thr AS threshold,
           count(*) AS n_pairs,
           CAST(count(DISTINCT db) AS BIGINT) AS removable_docs_upper
    FROM sweep
    GROUP BY thr
    ORDER BY threshold
    """,
    "NEAR-DUP OPERATING CURVE: pair counts and an upper bound on "
    "removable documents (distinct higher-id pair members) at six "
    "candidate Jaccard thresholds — the sweep that sizes a dedup "
    "pass's aggressiveness BEFORE the 100 TB rewrite (too low deletes "
    "paraphrases, too high keeps mirrors). The pair stream is "
    "computed ONCE by the lossless prefix-filtered join at the most "
    "permissive threshold (0.3) — every stricter cutoff is a FILTER "
    "over those pairs, not a re-join (prefix filtering is monotone: "
    "candidates at t are a superset of candidates at t' > t); the "
    "sweep explodes six literals map-side into a 6-row rollup. The "
    "oracle re-states it as the brute-force cross join, so the "
    "hash-match proves the prefix pruning lossless at EVERY "
    "threshold simultaneously",
)
def neardup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    pairs = dedup.prefix_filter_jaccard_pairs(
        docs, "doc_id", text_col="text", threshold=0.3
    )
    thrs = [0.3, 0.4, 0.5, 0.6, 0.7, 0.8]
    sweep = pairs.select(
        "doc_id_b",
        "jaccard",
        F.explode(F.array(*[F.lit(t) for t in thrs])).alias("thr"),
    ).filter(F.col("jaccard") >= F.col("thr"))
    return (
        sweep.groupBy(F.col("thr").alias("threshold"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("doc_id_b").alias("removable_docs_upper"),
        )
        .orderBy("threshold")
    )


@_register(
    "join_size_estimate",
    """
    WITH ca AS (SELECT o_custkey AS k, count(*) AS na FROM orders GROUP BY k),
    cb AS (SELECT user_id % 1500 AS k, count(*) AS nb FROM events GROUP BY k),
    exact AS (
        SELECT CAST(sum(na * nb) AS BIGINT) AS exact_rows
        FROM ca JOIN cb USING (k)
    ),
    sa AS (
        SELECT o_custkey AS k, count(*) AS na FROM orders
        WHERE ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 4))::UBIGINT
              % 10 = 0
        GROUP BY k
    ),
    sb AS (
        SELECT user_id % 1500 AS k, count(*) AS nb FROM events
        WHERE ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::UBIGINT
              % 10 = 0
        GROUP BY k
    ),
    sampled AS (
        SELECT CAST(sum(na * nb) * 100 AS BIGINT) AS sampled_est
        FROM sa JOIN sb USING (k)
    )
    SELECT exact.exact_rows, sampled.sampled_est,
           round(abs(sampled.sampled_est - exact.exact_rows) * 1.0
                 / exact.exact_rows, 4) AS rel_error
    FROM exact CROSS JOIN sampled
    """,
    "JOIN-CARDINALITY ESTIMATION — the optimizer-statistics number "
    "that decides broadcast vs shuffle vs skew handling BEFORE a "
    "100 TB join runs: |A join B| = sum over keys of cntA(k)*cntB(k), "
    "computed exactly from two key-grain rollups (never the join "
    "itself), beside the estimator a planner would actually use — "
    "the same formula over deterministic 10%% row samples scaled by "
    "1/p^2 — with its relative error. The key-count rollup is the "
    "reusable statistics artifact (ANALYZE TABLE's histogram "
    "sibling); both sides collapse to key grain before any join, so "
    "the audit costs two scans regardless of the true join size. "
    "Samples are md5-hash-deterministic, reproducible across engines "
    "and partitioning",
)
def join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    ekey = (F.col("user_id") % 1500).alias("k")

    def keyed_counts(df, key, alias):
        return df.groupBy(key).agg(F.count("*").alias(alias))

    def hsample(df, idcol):
        return df.filter(
            F.conv(F.substring(F.md5(F.col(idcol).cast("string").cast("binary")), 1, 4), 16, 10)
            .cast("long")
            % 10
            == 0
        )

    ca = keyed_counts(orders, F.col("o_custkey").alias("k"), "na")
    cb = keyed_counts(events, ekey, "nb")
    exact = (
        ca.join(cb, "k")
        .agg(F.sum(F.col("na") * F.col("nb")).alias("exact_rows"))
    )
    sa = keyed_counts(hsample(orders, "o_orderkey"), F.col("o_custkey").alias("k"), "na")
    sb = keyed_counts(hsample(events, "event_id"), ekey, "nb")
    sampled = (
        sa.join(sb, "k")
        .agg((F.sum(F.col("na") * F.col("nb")) * 100).alias("sampled_est"))
    )
    return exact.crossJoin(F.broadcast(sampled)).select(
        "exact_rows",
        "sampled_est",
        F.round(
            F.abs(F.col("sampled_est") - F.col("exact_rows"))
            * 1.0
            / F.col("exact_rows"),
            4,
        ).alias("rel_error"),
    )


@_register(
    "selectivity_estimate_audit",
    """
    WITH stats AS (
        SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi,
               count(*) AS n
        FROM orders
    ),
    binned AS (
        SELECT least(19, greatest(0, CAST(floor((o_totalprice - stats.lo)
                      / ((stats.hi - stats.lo) / 20.0)) AS INT))) AS b,
               count(*) AS cnt
        FROM orders CROSS JOIN stats
        GROUP BY b
    ),
    preds AS (
        SELECT CAST(unnest([1000, 5000, 20000, 50000, 100000]) AS DOUBLE)
            AS cutoff
    ),
    est AS (
        SELECT p.cutoff,
               round(sum(CAST(binned.cnt AS DOUBLE) * least(1.0, greatest(0.0,
                    (p.cutoff - (stats.lo + binned.b
                                 * ((stats.hi - stats.lo) / 20.0)))
                    / ((stats.hi - stats.lo) / 20.0)))), 2) + 0.0
                   AS est_rows
        FROM binned CROSS JOIN stats CROSS JOIN preds p
        GROUP BY p.cutoff
    ),
    act AS (
        SELECT p.cutoff, count(*) FILTER (o.o_totalprice < p.cutoff)
            AS actual_rows
        FROM orders o CROSS JOIN preds p
        GROUP BY p.cutoff
    )
    SELECT est.cutoff, act.actual_rows,
           est.est_rows,
           round(abs(est.est_rows - act.actual_rows) * 1.0
                 / greatest(act.actual_rows, 1), 4) AS rel_error
    FROM est JOIN act USING (cutoff)
    ORDER BY cutoff
    """,
    "SELECTIVITY-ESTIMATION AUDIT — how good are the table's "
    "histogram statistics at predicting predicate selectivity (the "
    "number every cost-based plan choice hangs on): build a 20-bucket "
    "equi-width histogram of o_totalprice (the ANALYZE TABLE "
    "artifact), estimate rows under five range predicates with "
    "uniform-within-bucket interpolation, and report estimate vs "
    "actual with relative error. Large errors on real predicates are "
    "the signal to move to equi-DEPTH histograms "
    "(equidepth_deciles) or sketches. One scan builds the histogram, "
    "one scan measures truth; the estimation itself runs on 20 "
    "bucket rows x 5 predicate literals",
)
def selectivity_estimate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    stats = orders.agg(
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        F.count("*").alias("n"),
    )
    width = (F.col("hi") - F.col("lo")) / 20.0
    binned = (
        orders.crossJoin(F.broadcast(stats))
        .groupBy(
            F.least(
                F.lit(19),
                F.greatest(
                    F.lit(0),
                    F.floor((F.col("o_totalprice") - F.col("lo")) / width).cast(
                        "int"
                    ),
                ),
            ).alias("b")
        )
        .agg(F.count("*").alias("cnt"))
    )
    cutoffs = [1000.0, 5000.0, 20000.0, 50000.0, 100000.0]
    preds = F.explode(F.array(*[F.lit(c) for c in cutoffs])).alias("cutoff")
    est = (
        binned.crossJoin(F.broadcast(stats))
        .select("b", "cnt", "lo", "hi", preds)
        .groupBy("cutoff")
        .agg(
            (
                F.round(
                    F.sum(
                        F.col("cnt").cast("double")
                        * F.least(
                            F.lit(1.0),
                            F.greatest(
                                F.lit(0.0),
                                (
                                    F.col("cutoff")
                                    - (
                                        F.col("lo")
                                        + F.col("b")
                                        * ((F.col("hi") - F.col("lo")) / 20.0)
                                    )
                                )
                                / ((F.col("hi") - F.col("lo")) / 20.0),
                            ),
                        )
                    ),
                    2,
                )
                + F.lit(0.0)
            ).alias("est_rows")
        )
    )
    act = (
        orders.select("o_totalprice", preds)
        .groupBy("cutoff")
        .agg(
            F.count(F.when(F.col("o_totalprice") < F.col("cutoff"), 1)).alias(
                "actual_rows"
            )
        )
    )
    return (
        est.join(act, "cutoff")
        .select(
            "cutoff",
            "actual_rows",
            "est_rows",
            F.round(
                F.abs(F.col("est_rows") - F.col("actual_rows"))
                * 1.0
                / F.greatest(F.col("actual_rows"), F.lit(1)),
                4,
            ).alias("rel_error"),
        )
        .orderBy("cutoff")
    )


@_register(
    "runs_test_randomness",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS v
        FROM orders GROUP BY d
    ),
    med AS (SELECT median(v) AS m FROM daily),
    signed AS (
        SELECT d, CAST(v > med.m AS INT) AS s
        FROM daily CROSS JOIN med
    ),
    runs AS (
        SELECT s,
               CASE WHEN s = lag(s) OVER (ORDER BY d) THEN 0 ELSE 1 END
                   AS brk
        FROM signed
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(s) AS BIGINT) AS n_above,
               CAST(count(*) - sum(s) AS BIGINT) AS n_below,
               CAST(sum(brk) AS BIGINT) AS n_runs
        FROM runs
    )
    SELECT n_days, n_above, n_below, n_runs,
           round(2.0 * n_above * n_below / (n_above + n_below) + 1, 4)
               AS expected_runs,
           round((n_runs - (2.0 * n_above * n_below / (n_above + n_below)
                            + 1))
                 / sqrt((2.0 * n_above * n_below
                         * (2.0 * n_above * n_below - n_above - n_below))
                        / ((n_above + n_below) * (n_above + n_below)
                           * (n_above + n_below - 1.0))), 4) + 0.0
               AS z_score
    FROM agg
    """,
    "WALD-WOLFOWITZ RUNS TEST on the daily-revenue series: is the "
    "above/below-median sign sequence consistent with independence, "
    "or does it carry trend/cycle structure (too few runs) or "
    "oscillation (too many)? The distribution-free independence "
    "check that belongs beside the KS/Mann-Whitney/chi-square drift "
    "family — run counts via one lag window, then the closed-form "
    "normal approximation z = (R - mu)/sigma from EXACT integer "
    "counts (every term is a ratio of integers, so both engines "
    "compute bit-identical doubles before the final rounding). "
    "Scale: the fact collapses to the days-sized rollup before the "
    "only ordered window; the median is a 1-row scalar broadcast",
)
def runs_test_randomness(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum("o_totalprice").alias("v")
    )
    med = daily.agg(F.median("v").alias("m"))
    signed = daily.crossJoin(F.broadcast(med)).select(
        "d", (F.col("v") > F.col("m")).cast("int").alias("s")
    )
    w = Window.orderBy("d")
    runs = signed.select(
        "s",
        F.when(F.col("s") == F.lag("s").over(w), 0).otherwise(1).alias("brk"),
    )
    agg = runs.agg(
        F.count("*").alias("n_days"),
        F.sum("s").alias("n_above"),
        (F.count("*") - F.sum("s")).alias("n_below"),
        F.sum("brk").alias("n_runs"),
    )
    na, nb, r = F.col("n_above"), F.col("n_below"), F.col("n_runs")
    mu = 2.0 * na * nb / (na + nb) + 1
    var = (2.0 * na * nb * (2.0 * na * nb - na - nb)) / (
        (na + nb) * (na + nb) * (na + nb - 1.0)
    )
    return agg.select(
        "n_days",
        "n_above",
        "n_below",
        "n_runs",
        F.round(mu, 4).alias("expected_runs"),
        (F.round((r - mu) / F.sqrt(var), 4) + F.lit(0.0)).alias("z_score"),
    )


@_register(
    "capture_recapture_estimate",
    """
    WITH s1 AS (
        SELECT l_partkey FROM lineitem
        WHERE ('0x' || substr(md5(l_orderkey::VARCHAR), 1, 4))::UBIGINT
              % 5 = 0
        GROUP BY l_partkey
    ),
    s2 AS (
        SELECT l_partkey FROM lineitem
        WHERE ('0x' || substr(md5(l_orderkey::VARCHAR), 1, 4))::UBIGINT
              % 5 = 1
        GROUP BY l_partkey
    ),
    m AS (
        SELECT (SELECT count(*) FROM s1) AS n1,
               (SELECT count(*) FROM s2) AS n2,
               (SELECT count(*) FROM s1 JOIN s2 USING (l_partkey)) AS overlap
    ),
    truth AS (SELECT count(DISTINCT l_partkey) AS true_distinct FROM lineitem)
    SELECT m.n1 AS sample1_distinct, m.n2 AS sample2_distinct,
           m.overlap,
           CAST(round(((m.n1 + 1.0) * (m.n2 + 1.0) / (m.overlap + 1.0)) - 1)
                AS BIGINT) AS chapman_estimate,
           truth.true_distinct,
           round(abs(((m.n1 + 1.0) * (m.n2 + 1.0) / (m.overlap + 1.0)) - 1
                     - truth.true_distinct) * 1.0 / truth.true_distinct, 4)
               AS rel_error
    FROM m CROSS JOIN truth
    """,
    "CAPTURE-RECAPTURE population estimation (Chapman's "
    "bias-corrected Lincoln-Petersen): two independent deterministic "
    "20%%-of-orders samples each 'capture' a set of part keys; the "
    "overlap rate estimates the TOTAL distinct population — "
    "N ~ (n1+1)(n2+1)/(m+1) - 1 — the ecology estimator data teams "
    "reuse to ask 'how many distinct entities exist that we have NOT "
    "yet crawled/joined' from cheap samples, audited here against "
    "the exact distinct count. All inputs are exact integers (two "
    "sampled key rollups + one key-grain overlap join), so the "
    "estimate is bit-identical across engines; samples are md5-hash "
    "deterministic. Scale: the samples prune at the scan, the "
    "overlap join runs at key grain — the audit never needs the "
    "full-corpus distinct except as the truth column (which a real "
    "deployment drops)",
)
def capture_recapture_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("l_orderkey").cast("string").cast("binary")), 1, 4),
            16,
            10,
        ).cast("long")
        % 5
    )
    s1 = li.filter(bucket == 0).select("l_partkey").distinct()
    s2 = li.filter(bucket == 1).select("l_partkey").distinct()
    n1 = s1.agg(F.count("*").alias("n1"))
    n2 = s2.agg(F.count("*").alias("n2"))
    overlap = s1.join(s2, "l_partkey").agg(F.count("*").alias("overlap"))
    truth = li.agg(F.countDistinct("l_partkey").alias("true_distinct"))
    est = (F.col("n1") + 1.0) * (F.col("n2") + 1.0) / (F.col("overlap") + 1.0) - 1
    return (
        n1.crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(overlap))
        .crossJoin(F.broadcast(truth))
        .select(
            F.col("n1").alias("sample1_distinct"),
            F.col("n2").alias("sample2_distinct"),
            "overlap",
            F.round(est).cast("long").alias("chapman_estimate"),
            "true_distinct",
            F.round(
                F.abs(est - F.col("true_distinct")) * 1.0 / F.col("true_distinct"),
                4,
            ).alias("rel_error"),
        )
    )


@_register(
    "event_count_overdispersion",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS c
        FROM events GROUP BY event_type, d
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           round(avg(c), 4) AS mean_daily,
           round(var_samp(c), 4) AS var_daily,
           round(var_samp(c) / avg(c), 4) + 0.0 AS dispersion_index,
           var_samp(c) / avg(c) > 1.5 AS overdispersed
    FROM daily
    GROUP BY event_type
    ORDER BY event_type
    """,
    "OVERDISPERSION DIAGNOSTIC per event type: the variance-to-mean "
    "ratio of daily counts (dispersion index; 1 under Poisson) — the "
    "check that decides whether count models/alerting thresholds can "
    "assume Poisson noise or need negative-binomial headroom (bursty "
    "types false-alarm constantly under Poisson limits). Two "
    "partial-aggregable rollups: fact to (type, day), then a "
    "types-sized moment aggregate; var_samp is computed from "
    "streaming central moments in both engines and rounded. "
    "Complements user_event_burstiness (per-user gap CV) at the "
    "SERIES level",
)
def event_count_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.col("ts").cast("date").alias("d")).agg(
        F.count("*").alias("c")
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.count("*").alias("n_days"),
            F.round(F.avg("c"), 4).alias("mean_daily"),
            F.round(F.var_samp("c"), 4).alias("var_daily"),
            (F.round(F.var_samp("c") / F.avg("c"), 4) + F.lit(0.0)).alias(
                "dispersion_index"
            ),
            (F.var_samp("c") / F.avg("c") > 1.5).alias("overdispersed"),
        )
        .orderBy("event_type")
    )


@_register(
    "lorenz_curve_deciles",
    """
    WITH per_cust AS (
        SELECT o_custkey, sum(o_totalprice) AS rev
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT rev,
               ntile(10) OVER (ORDER BY rev, o_custkey) AS decile
        FROM per_cust
    ),
    tot AS (SELECT sum(rev) AS t, count(*) AS n FROM per_cust),
    per_decile AS (
        SELECT decile, count(*) AS n_customers, sum(rev) AS decile_rev
        FROM ranked GROUP BY decile
    )
    SELECT CAST(p.decile AS INT) AS decile,
           CAST(p.n_customers AS BIGINT) AS n_customers,
           round(p.decile_rev, 4) AS decile_revenue,
           round(p.decile_rev / tot.t, 4) AS revenue_share,
           round(sum(p.decile_rev) OVER (ORDER BY p.decile
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) / tot.t, 4)
               AS cum_revenue_share
    FROM per_decile p CROSS JOIN tot
    ORDER BY decile
    """,
    "LORENZ CURVE by customer decile — the distribution curve BEHIND "
    "customer_revenue_gini's single coefficient: customers ranked "
    "into revenue deciles (deterministic ntile with key tie-break), "
    "each decile's revenue share and the cumulative share (the "
    "Lorenz ordinates; the diagonal gap IS the Gini). The "
    "whale-analysis view every revenue-concentration or data-source-"
    "concentration review draws. Scale: the fact collapses to the "
    "customer rollup first; the ntile and cumulative windows run "
    "over entity-rollup and 10-row inputs respectively (the "
    "documented post-aggregate global-series shape)",
)
def lorenz_curve_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("rev"))
    ranked = per_cust.select(
        "rev", F.ntile(10).over(Window.orderBy("rev", "o_custkey")).alias("decile")
    )
    tot = per_cust.agg(F.sum("rev").alias("t"), F.count("*").alias("n"))
    per_decile = ranked.groupBy("decile").agg(
        F.count("*").alias("n_customers"), F.sum("rev").alias("decile_rev")
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_decile.crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_customers",
            F.round("decile_rev", 4).alias("decile_revenue"),
            F.round(F.col("decile_rev") / F.col("t"), 4).alias("revenue_share"),
            F.round(
                F.sum("decile_rev").over(w_cum) / F.col("t"), 4
            ).alias("cum_revenue_share"),
        )
        .orderBy("decile")
    )


@_register(
    "linear_attribution_revenue",
    """
    WITH purchases AS (
        SELECT event_id AS pid, user_id, ts AS pts, value AS rev
        FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    touches AS (
        SELECT p.pid, p.rev, e.event_type AS channel
        FROM purchases p JOIN events e
          ON e.user_id = p.user_id
         AND e.ts < p.pts
         AND e.ts >= p.pts - INTERVAL 7 DAY
         AND e.event_type <> 'purchase'
    ),
    credited AS (
        SELECT pid, channel,
               rev * 1.0 / (count(*) OVER (PARTITION BY pid)) AS credit
        FROM touches
    )
    SELECT channel,
           CAST(count(DISTINCT pid) AS BIGINT) AS purchases_touched,
           round(sum(credit), 4) AS attributed_revenue
    FROM credited
    GROUP BY channel
    ORDER BY channel
    """,
    "LINEAR MULTI-TOUCH ATTRIBUTION: every purchase's revenue splits "
    "EQUALLY across the channels the user touched in the preceding "
    "7 days — the each-touch-matters model beside "
    "first_touch_attribution's winner-takes-all (the two bounds a "
    "marketing-mix review compares). The touch join is the "
    "close_order_pairs range-join shape: co-partitioned on user_id "
    "with the time predicate evaluated in-bucket; per-purchase touch "
    "counts ride a pid-keyed window; the channel rollup is "
    "types-sized. Credit division is exact integers into one "
    "division, so shares are engine-identical before rounding",
)
def linear_attribution_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("pts"),
        F.col("value").alias("rev"),
    )
    touches = purchases.join(
        ev,
        (ev.user_id == F.col("p_user"))
        & (ev.ts < F.col("pts"))
        & (ev.ts >= F.col("pts") - F.expr("INTERVAL 7 DAY"))
        & (ev.event_type != "purchase"),
    ).select("pid", "rev", F.col("event_type").alias("channel"))
    w = Window.partitionBy("pid")
    credited = touches.withColumn(
        "credit", F.col("rev") * 1.0 / F.count("*").over(w)
    )
    return (
        credited.groupBy("channel")
        .agg(
            F.countDistinct("pid").alias("purchases_touched"),
            F.round(F.sum("credit"), 4).alias("attributed_revenue"),
        )
        .orderBy("channel")
    )


@_register(
    "time_decay_attribution",
    """
    WITH purchases AS (
        SELECT event_id AS pid, user_id, ts AS pts, value AS rev
        FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    touches AS (
        SELECT p.pid, p.rev, e.event_type AS channel,
               power(0.5, date_diff('second', e.ts, p.pts)
                          / (3.5 * 86400.0)) AS w
        FROM purchases p JOIN events e
          ON e.user_id = p.user_id
         AND e.ts < p.pts
         AND e.ts >= p.pts - INTERVAL 7 DAY
         AND e.event_type <> 'purchase'
    ),
    credited AS (
        SELECT pid, channel,
               rev * w / (sum(w) OVER (PARTITION BY pid)) AS credit
        FROM touches
    )
    SELECT channel,
           CAST(count(DISTINCT pid) AS BIGINT) AS purchases_touched,
           round(sum(credit), 4) AS attributed_revenue
    FROM credited
    GROUP BY channel
    ORDER BY channel
    """,
    "TIME-DECAY ATTRIBUTION — the third model of the attribution "
    "trilogy (first_touch_attribution winner-takes-all, "
    "linear_attribution_revenue equal-credit, this one recency-"
    "weighted): each 7-day-window touch carries weight "
    "0.5^(age / 3.5 days) — a 3.5-day half-life — normalized per "
    "purchase, so recent touches earn more credit. Same plan as the "
    "linear model: co-partitioned user range join, pid-keyed "
    "normalization window, types-sized rollup; the decay weight is "
    "pure per-row arithmetic on exact second differences, identical "
    "across engines before the final rounded sum",
)
def time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("pts"),
        F.col("value").alias("rev"),
    )
    t = ev.select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("channel"),
    ).filter(F.col("channel") != "purchase")
    age_sec = F.col("pts").cast("long") - F.col("t_ts").cast("long")
    touches = purchases.join(
        t,
        (F.col("t_user") == F.col("p_user"))
        & (F.col("t_ts") < F.col("pts"))
        & (F.col("t_ts") >= F.col("pts") - F.expr("INTERVAL 7 DAY")),
    ).select(
        "pid",
        "rev",
        "channel",
        F.pow(F.lit(0.5), age_sec / (3.5 * 86400.0)).alias("w"),
    )
    win = Window.partitionBy("pid")
    credited = touches.withColumn(
        "credit", F.col("rev") * F.col("w") / F.sum("w").over(win)
    )
    return (
        credited.groupBy("channel")
        .agg(
            F.countDistinct("pid").alias("purchases_touched"),
            F.round(F.sum("credit"), 4).alias("attributed_revenue"),
        )
        .orderBy("channel")
    )


@_register(
    "trade_edge_truss_support",
    """
    WITH raw_edges AS (
        SELECT DISTINCT
               least(cn.n_name, sn.n_name)    AS a,
               greatest(cn.n_name, sn.n_name) AS b
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey  = c.c_custkey
        JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
        JOIN supplier s ON l.l_suppkey  = s.s_suppkey
        JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
        WHERE cn.n_name <> sn.n_name
    ),
    tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM raw_edges e1
        JOIN raw_edges e2 ON e2.a = e1.b
        JOIN raw_edges e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    edge_support AS (
        SELECT a, b, count(*) AS support FROM (
            SELECT x AS a, y AS b FROM tri
            UNION ALL SELECT y AS a, z AS b FROM tri
            UNION ALL SELECT x AS a, z AS b FROM tri
        ) GROUP BY a, b
    )
    SELECT e.a AS nation_a, e.b AS nation_b,
           CAST(coalesce(s.support, 0) AS BIGINT) AS triangle_support,
           coalesce(s.support, 0) >= 2 AS in_4_truss
    FROM raw_edges e LEFT JOIN edge_support s
      ON e.a = s.a AND e.b = s.b
    ORDER BY triangle_support, nation_a, nation_b
    LIMIT 30
    """,
    "K-TRUSS EDGE SUPPORT on the trade graph: per edge, how many "
    "triangles contain it (its 'support') — the edge-grain dense-"
    "subgraph primitive beside node-grain k-core "
    "(nation_trade_kcore): an edge with support >= k-2 survives the "
    "k-truss, and support-0 edges are triangle-free ties (bridge "
    "candidates between communities). Reuses "
    "nation_trade_triangles' oriented enumeration — each triangle "
    "produced once via two equi-joins on degree-ordered edges, then "
    "unpivoted to its three edges for the support rollup; the 30 "
    "weakest edges surface first (the ones a backbone/community "
    "analysis examines). One fact-scale edge aggregation, "
    "everything after is graph-grain",
)
def trade_edge_truss_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .select(
            F.least("cust_nation", "supp_nation").alias("a"),
            F.greatest("cust_nation", "supp_nation").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # feeds triangle joins + the base list
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z")
        )
    )
    tri_edges = (
        tri.select(F.col("x").alias("a"), F.col("y").alias("b"))
        .unionByName(tri.select(F.col("y").alias("a"), F.col("z").alias("b")))
        .unionByName(tri.select(F.col("x").alias("a"), F.col("z").alias("b")))
    )
    support = tri_edges.groupBy("a", "b").agg(F.count("*").alias("support"))
    return (
        edges.join(support, ["a", "b"], "left")
        .select(
            F.col("a").alias("nation_a"),
            F.col("b").alias("nation_b"),
            F.coalesce(F.col("support"), F.lit(0)).alias("triangle_support"),
            (F.coalesce(F.col("support"), F.lit(0)) >= 2).alias("in_4_truss"),
        )
        .orderBy("triangle_support", "nation_a", "nation_b")
        .limit(30)
    )


@_register(
    "ann_label_mrr",
    """
    WITH v AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
        FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, label AS qlabel, e AS qv FROM v
          WHERE vec_id < 20),
    s AS (
        SELECT q.qid, q.qlabel, v.vec_id, v.label,
               list_dot_product(q.qv, v.e)
                 / (sqrt(list_dot_product(q.qv, q.qv))
                    * sqrt(list_dot_product(v.e, v.e))) AS sim
        FROM q JOIN v ON v.vec_id <> q.qid
    ),
    ranked AS (
        SELECT qid, qlabel, label, sim,
               CAST(row_number() OVER (PARTITION BY qid
                                       ORDER BY sim DESC, vec_id) AS INT)
                   AS rnk
        FROM s
    ),
    top10 AS (SELECT * FROM ranked WHERE rnk <= 10),
    per_query AS (
        SELECT qid,
               min(CASE WHEN label = qlabel THEN rnk END) AS first_rel,
               sum(CAST(label = qlabel AS INT)) AS rel_in_10
        FROM top10 GROUP BY qid
    )
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           round(avg(CASE WHEN first_rel IS NULL THEN 0.0
                          ELSE 1.0 / first_rel END), 4) AS mrr_at_10,
           round(avg(rel_in_10 / 10.0), 4) AS precision_at_10,
           CAST(sum(CAST(first_rel IS NOT NULL AS INT)) AS BIGINT)
               AS queries_with_hit
    FROM per_query
    """,
    "RETRIEVAL QUALITY EVALUATION — MRR@10 and Precision@10 of the "
    "exact cosine retriever with LABEL MATCH as relevance (the "
    "standard ANN-benchmark protocol: a neighbor is relevant iff it "
    "shares the query's class): the IR-metric layer that turns the "
    "similarity family's recall audits (ivf_multiprobe_recall / "
    "lsh_banding_recall measure index faithfulness) into an "
    "END-TO-END usefulness number — an index can be 100%% faithful "
    "to embeddings that rank the wrong things. 20 deterministic "
    "query vectors broadcast; per-query metrics fold over the rank-"
    "<=10 rows; the corpus scans once. Swap the exact scan for any "
    "ANN variant and re-run to get ITS MRR — the same contract",
)
def ann_label_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    top = similarity.brute_force_topk(emb, queries, k=10).filter(F.col("rank") <= 10)
    qlabels = emb.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel")
    )
    clabels = emb.select(F.col("vec_id"), F.col("label"))
    labeled = top.join(F.broadcast(qlabels), "query_id").join(
        F.broadcast(clabels), "vec_id"
    )
    per_query = labeled.groupBy("query_id").agg(
        F.min(
            F.when(F.col("label") == F.col("qlabel"), F.col("rank"))
        ).alias("first_rel"),
        F.sum((F.col("label") == F.col("qlabel")).cast("int")).alias("rel_in_10"),
    )
    return per_query.agg(
        F.count("*").alias("n_queries"),
        F.round(
            F.avg(
                F.when(F.col("first_rel").isNull(), 0.0).otherwise(
                    1.0 / F.col("first_rel")
                )
            ),
            4,
        ).alias("mrr_at_10"),
        F.round(F.avg(F.col("rel_in_10") / 10.0), 4).alias("precision_at_10"),
        F.sum(F.col("first_rel").isNotNull().cast("int")).alias("queries_with_hit"),
    )


@_register(
    "modal_priority_by_nation",
    """
    WITH joined AS (
        SELECT n.n_name AS nation, o.o_orderpriority AS priority
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
    ),
    counts AS (
        SELECT nation, priority, count(*) AS cnt
        FROM joined GROUP BY nation, priority
    ),
    ranked AS (
        SELECT nation, priority, cnt,
               row_number() OVER (PARTITION BY nation
                                  ORDER BY cnt DESC, priority) AS rn,
               CAST(sum(cnt) OVER (PARTITION BY nation) AS BIGINT)
                   AS nation_orders
        FROM counts
    )
    SELECT nation, priority AS modal_priority,
           CAST(cnt AS BIGINT) AS modal_count, nation_orders,
           round(cnt * 1.0 / nation_orders, 4) AS modal_share
    FROM ranked WHERE rn = 1
    ORDER BY nation
    """,
    "MODE AGGREGATE per group — the one classic summary statistic "
    "the aggregate family lacked (min/max/avg/median/percentiles all "
    "exist): most frequent order priority per customer nation with "
    "its share, via the scalable two-step (value-count rollup, then "
    "a rank window over the GROUP x VALUE grain — never a "
    "per-group collect). Deterministic tie-break on the value. The "
    "same shape computes any categorical mode at 100 TB: the window "
    "input is |groups| x |distinct values|, not the fact",
)
def modal_priority_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    counts = joined.groupBy(
        F.col("n_name").alias("nation"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count("*").alias("cnt"))
    w_rank = Window.partitionBy("nation").orderBy(F.col("cnt").desc(), "priority")
    w_tot = Window.partitionBy("nation")
    ranked = counts.select(
        "nation",
        "priority",
        "cnt",
        F.row_number().over(w_rank).alias("rn"),
        F.sum("cnt").over(w_tot).alias("nation_orders"),
    )
    return (
        ranked.filter(F.col("rn") == 1)
        .select(
            "nation",
            F.col("priority").alias("modal_priority"),
            F.col("cnt").alias("modal_count"),
            "nation_orders",
            F.round(F.col("cnt") * 1.0 / F.col("nation_orders"), 4).alias(
                "modal_share"
            ),
        )
        .orderBy("nation")
    )


@_register(
    "selectivity_equidepth_compare",
    """
    WITH stats AS (
        SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi,
               count(*) AS n
        FROM orders
    ),
    widths AS (
        SELECT least(19, greatest(0, CAST(floor((o_totalprice - stats.lo)
                      / ((stats.hi - stats.lo) / 20.0)) AS INT))) AS b,
               count(*) AS cnt
        FROM orders CROSS JOIN stats
        GROUP BY b
    ),
    depth_bounds AS (
        SELECT quantile_cont(o_totalprice,
                             [0.05, 0.10, 0.15, 0.20, 0.25, 0.30, 0.35,
                              0.40, 0.45, 0.50, 0.55, 0.60, 0.65, 0.70,
                              0.75, 0.80, 0.85, 0.90, 0.95]) AS qs
        FROM orders
    ),
    preds AS (
        SELECT CAST(unnest([1000, 5000, 20000, 50000, 100000]) AS DOUBLE)
            AS cutoff
    ),
    ew AS (
        SELECT p.cutoff,
               round(sum(CAST(widths.cnt AS DOUBLE) * least(1.0, greatest(0.0,
                    (p.cutoff - (stats.lo + widths.b
                                 * ((stats.hi - stats.lo) / 20.0)))
                    / ((stats.hi - stats.lo) / 20.0)))), 2) + 0.0
                   AS est_width
        FROM widths CROSS JOIN stats CROSS JOIN preds p
        GROUP BY p.cutoff
    ),
    ed AS (
        SELECT p.cutoff,
               round((len(list_filter(db.qs, q -> q < p.cutoff)) + 0.5)
                     * stats.n / 20.0, 2) + 0.0 AS est_depth
        FROM depth_bounds db CROSS JOIN stats CROSS JOIN preds p
    ),
    act AS (
        SELECT p.cutoff, count(*) FILTER (o.o_totalprice < p.cutoff)
            AS actual_rows
        FROM orders o CROSS JOIN preds p
        GROUP BY p.cutoff
    )
    SELECT act.cutoff, act.actual_rows,
           ew.est_width, ed.est_depth,
           round(abs(ew.est_width - act.actual_rows) * 1.0
                 / greatest(act.actual_rows, 1), 4) AS err_width,
           round(abs(ed.est_depth - act.actual_rows) * 1.0
                 / greatest(act.actual_rows, 1), 4) AS err_depth
    FROM act JOIN ew USING (cutoff) JOIN ed USING (cutoff)
    ORDER BY cutoff
    """,
    "EQUI-WIDTH vs EQUI-DEPTH selectivity estimation, head to head — "
    "the upgrade decision selectivity_estimate_audit points at, as a "
    "measured number: the same five range predicates estimated from "
    "a 20-bucket equi-width histogram (uniform interpolation) AND "
    "from 19 exact vigintile boundaries (each bucket holds n/20 rows "
    "by construction, so the estimate is buckets-below-cutoff + half "
    "the straddling bucket), with per-predicate relative errors side "
    "by side. Equi-depth wins wherever the value distribution is "
    "skewed — which is why ANALYZE computes quantile sketches, not "
    "value ranges, at 100 TB. Boundary list is a 1-row broadcast; "
    "estimation runs on bucket/boundary grain",
)
def selectivity_equidepth_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    stats = orders.agg(
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        F.count("*").alias("n"),
    )
    fracs = [round(0.05 * i, 2) for i in range(1, 20)]
    depth_bounds = orders.agg(
        F.percentile("o_totalprice", F.array(*[F.lit(f) for f in fracs])).alias("qs")
    )
    width = (F.col("hi") - F.col("lo")) / 20.0
    widths = (
        orders.crossJoin(F.broadcast(stats))
        .groupBy(
            F.least(
                F.lit(19),
                F.greatest(
                    F.lit(0),
                    F.floor((F.col("o_totalprice") - F.col("lo")) / width).cast(
                        "int"
                    ),
                ),
            ).alias("b")
        )
        .agg(F.count("*").alias("cnt"))
    )
    cutoffs = [1000.0, 5000.0, 20000.0, 50000.0, 100000.0]
    preds = F.explode(F.array(*[F.lit(cv) for cv in cutoffs])).alias("cutoff")
    ew = (
        widths.crossJoin(F.broadcast(stats))
        .select("b", "cnt", "lo", "hi", preds)
        .groupBy("cutoff")
        .agg(
            (
                F.round(
                    F.sum(
                        F.col("cnt").cast("double")
                        * F.least(
                            F.lit(1.0),
                            F.greatest(
                                F.lit(0.0),
                                (
                                    F.col("cutoff")
                                    - (
                                        F.col("lo")
                                        + F.col("b")
                                        * ((F.col("hi") - F.col("lo")) / 20.0)
                                    )
                                )
                                / ((F.col("hi") - F.col("lo")) / 20.0),
                            ),
                        )
                    ),
                    2,
                )
                + F.lit(0.0)
            ).alias("est_width")
        )
    )
    ed = (
        depth_bounds.crossJoin(F.broadcast(stats))
        .select("qs", "n", preds)
        .select(
            "cutoff",
            (
                F.round(
                    (
                        F.size(
                            F.filter("qs", lambda q: q < F.col("cutoff"))
                        )
                        + 0.5
                    )
                    * F.col("n")
                    / 20.0,
                    2,
                )
                + F.lit(0.0)
            ).alias("est_depth"),
        )
    )
    act = (
        orders.select("o_totalprice", preds)
        .groupBy("cutoff")
        .agg(
            F.count(F.when(F.col("o_totalprice") < F.col("cutoff"), 1)).alias(
                "actual_rows"
            )
        )
    )
    return (
        act.join(ew, "cutoff")
        .join(F.broadcast(ed), "cutoff")
        .select(
            "cutoff",
            "actual_rows",
            "est_width",
            "est_depth",
            F.round(
                F.abs(F.col("est_width") - F.col("actual_rows"))
                * 1.0
                / F.greatest(F.col("actual_rows"), F.lit(1)),
                4,
            ).alias("err_width"),
            F.round(
                F.abs(F.col("est_depth") - F.col("actual_rows"))
                * 1.0
                / F.greatest(F.col("actual_rows"), F.lit(1)),
                4,
            ).alias("err_depth"),
        )
        .orderBy("cutoff")
    )
