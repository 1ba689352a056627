"""Streamed order-insensitive aggregate hash (tools/agghash.py).

The cross-engine contract is load-bearing for the ×10/×100 scale
sweeps: two scalars computed INSIDE Spark and DuckDB must agree iff
the result multisets agree. These tests pin (a) the md5-low64
extraction, (b) the tie-free numeric canonicalization on the exact
values where naive %f formatting diverges between the JVM and fmt,
(c) verdict agreement with the driver's collect-based compare at
sf0.001, and (d) sensitivity: one changed value, one dropped row, or
one duplicated row flips the verdict, while row order never does.
"""

from __future__ import annotations

import duckdb
import pytest

from tools.agghash import (
    _NUM_CANON,
    UnsupportedType,
    duck_agg_hash,
    duck_cols,
    spark_agg_hash,
)

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def test_md5_low64_extraction_matches(spark):
    """Spark's conv-over-reversed-hex == DuckDB md5_number_lower for a
    spread of inputs (empty, unicode, long, separator chars)."""
    from tools.agghash import _SPARK_H64

    vals = ["", "abc", "a\x1fb", "\x01N", "x" * 10_000, "naïve-ütf8", "0"]
    con = duckdb.connect()
    for s in vals:
        esc = s.replace("'", "''")
        d = con.execute(f"SELECT md5_number_lower('{esc}')").fetchone()[0]
        got = spark.createDataFrame([(s,)], "s string").selectExpr(
            "md5(s) AS __h"
        ).selectExpr(f"CAST({_SPARK_H64} AS STRING) AS v").collect()[0]["v"]
        assert int(got) == int(d), s


#: values where naive printf('%.9f') DIVERGES between engines (shortest
#: -repr+HALF_UP on the JVM vs exact-expansion+half-even in fmt): the
#: dyadic tie 1/1024, huge magnitudes, -0.0 — plus NaN/inf/NULL and
#: each tier boundary.
TRICKY_DOUBLES = [
    None,
    float("nan"),
    float("inf"),
    float("-inf"),
    0.0,
    -0.0,
    1.0 / 1024,  # exact .5 tie at the 9th decimal
    -1.0 / 1024,
    0.1,
    -2.5e-9,
    123456.789123456,
    8.9e6,
    9.1e6,  # tier 1 -> 2
    9.1e12,  # tier 2 -> 3
    4.6e15,  # tier 3 -> 4
    2.0**60,
    1e300,  # %.9f differs in ~280 digits between engines
    -1e300,
    1e25,  # sign-only tier
    5.0e-10,  # rounds to 1 at 9dp in both engines (floor(0.5+0.5))
]


def test_numeric_canon_matches_both_engines(spark):
    canon = _NUM_CANON.format(v="CAST(v AS DOUBLE)")
    con = duckdb.connect()
    sdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(TRICKY_DOUBLES)], "i int, v double"
    )
    got = {
        r["i"]: r["c"]
        for r in sdf.selectExpr("i", f"{canon} AS c").collect()
    }
    con.execute("CREATE TABLE t (i INT, v DOUBLE)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [(i, v) for i, v in enumerate(TRICKY_DOUBLES)],
    )
    want = dict(con.execute(f"SELECT i, {canon} FROM t").fetchall())
    assert got == want
    # and the tie case really renders via the arithmetic path, not %f
    assert want[6] == "976563"  # floor(0.0009765625*1e9 + 0.5)


def test_verdict_agrees_with_collect_compare(spark, duck, sf_dir):
    """For a schema-diverse sample of registry queries, the two-scalar
    verdict equals the driver's collect-based verdict (all green at
    sf0.001, where every oracle runs)."""
    from covid19_etl_pipeline_spark.plans.queries import REGISTRY

    names = [
        "rollup_entity",  # strings + doubles + date + bigint
        "date_parts",  # date parts ints
        "minhash_signatures",  # array<bigint>
        "sim_bruteforce_topk",  # doubles
        "exact_dedup",
        "histogram_totalprice",
    ]
    for n in names:
        spec = REGISTRY[n]
        sdf = spec.fn(spark, sf_dir)
        sh = spark_agg_hash(sdf)
        oh = duck_agg_hash(duck, spec.oracle)
        assert sh == oh, n
        assert sorted(sdf.columns) == sorted(duck_cols(duck, spec.oracle)), n


def test_hash_is_order_insensitive_and_value_sensitive(spark):
    base = [(1, "a", 1.5), (2, "b", None), (3, None, 0.25)]
    schema = "id int, s string, v double"
    h0 = spark_agg_hash(spark.createDataFrame(base, schema))
    # permuted rows: identical
    assert spark_agg_hash(spark.createDataFrame(base[::-1], schema)) == h0
    # one value changed by 1e-9: different sum, same count
    pert = [(1, "a", 1.5 + 1e-8), (2, "b", None), (3, None, 0.25)]
    h1 = spark_agg_hash(spark.createDataFrame(pert, schema))
    assert h1[0] == h0[0] and h1[1] != h0[1]
    # NULL vs the string 'N': different
    pert2 = [(1, "a", 1.5), (2, "b", None), (3, "N", 0.25)]
    assert spark_agg_hash(spark.createDataFrame(pert2, schema))[1] != h0[1]
    # dropped row: different count AND sum
    h2 = spark_agg_hash(spark.createDataFrame(base[:2], schema))
    assert h2[0] == 2 and h2[1] != h0[1]
    # duplicated row: sum captures multiplicity (xor would not)
    h3 = spark_agg_hash(spark.createDataFrame(base + base[:1], schema))
    assert h3[0] == 4 and h3[1] != h0[1]


def test_cross_engine_nulls_arrays_dates(spark):
    """NULLs in every position, empty vs NULL arrays, date + timestamp
    (midnight and not), booleans, binary — built literally in both
    engines, hashes equal."""
    sdf = spark.sql(
        """
        SELECT * FROM VALUES
          (1, CAST(NULL AS STRING), array(1.5D, CAST('nan' AS DOUBLE)),
           DATE'2020-02-29', TIMESTAMP'2021-06-01 12:00:00.5', true,
           CAST('ab' AS BINARY)),
          (2, 'x', array(CAST(NULL AS DOUBLE)), CAST(NULL AS DATE),
           TIMESTAMP'2021-06-01 00:00:00', false, CAST(NULL AS BINARY)),
          (3, 'y', array(), DATE'1970-01-01', CAST(NULL AS TIMESTAMP),
           CAST(NULL AS BOOLEAN), CAST('' AS BINARY))
        AS t(id, s, arr, d, ts, b, bin)
        """
    )
    con = duckdb.connect()
    sql = """
        SELECT * FROM (VALUES
          (1, NULL::VARCHAR, [1.5, 'nan'::DOUBLE], DATE '2020-02-29',
           TIMESTAMP '2021-06-01 12:00:00.5', TRUE, 'ab'::BLOB),
          (2, 'x', [NULL::DOUBLE], NULL::DATE,
           TIMESTAMP '2021-06-01 00:00:00', FALSE, NULL::BLOB),
          (3, 'y', []::DOUBLE[], DATE '1970-01-01', NULL::TIMESTAMP,
           NULL::BOOLEAN, ''::BLOB)
        ) t(id, s, arr, d, ts, b, bin)
    """
    assert spark_agg_hash(sdf) == duck_agg_hash(con, sql)


def test_unsupported_types_raise(spark):
    sdf = spark.sql("SELECT named_struct('a', 1) AS st")
    with pytest.raises(UnsupportedType):
        spark_agg_hash(sdf)
    nested = spark.sql("SELECT array(array(1)) AS aa")
    with pytest.raises(UnsupportedType):
        spark_agg_hash(nested)
