"""Local replica of the driver's correctness gate: run every registry
query on Spark AND its DuckDB oracle on the same parquet, compare
row-count, column names, and order-insensitive values.

This is the engine's primary end-to-end correctness layer (SURVEY §5:
the oracle-check layer the reference lacks).
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from covid19_etl_pipeline_spark.catalog import TABLES, table_path
from covid19_etl_pipeline_spark.plans.queries import REGISTRY

#: Default sf0.001 keeps the full sweep fast; set PARITY_SF_DIR to run
#: the identical gate at the driver's sf0.01 (or any other scale) —
#: catches scale-dependent divergence (AQE re-plans, broadcast flips).
SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


def _shard(names: list[str]) -> list[str]:
    """Optional process-level sharding for the full-registry sweep:
    ``PARITY_SHARD=i/n`` selects every n-th query (round-robin by
    sorted index, deterministic). ``tools/partest.py`` launches one
    pytest process per shard so the ~4-minute serial sweep runs in
    parallel on the 32-core box without pytest-xdist (not shipped in
    this environment). Unset → full sweep (the CI gate)."""
    spec = os.environ.get("PARITY_SHARD", "")
    if not spec:
        return names
    i, n = (int(p) for p in spec.split("/"))
    return [q for idx, q in enumerate(names) if idx % n == i]


ORACLE_QUERIES = _shard(sorted(n for n, s in REGISTRY.items() if s.oracle is not None))
ROWS_ONLY_QUERIES = _shard(sorted(n for n, s in REGISTRY.items() if s.oracle is None))


def _duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    return con


def _normalize(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        # collapse float noise below the rounding applied in-query
        return round(value, 9)
    return value


def _row_set(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(
        tuple(str(_normalize(row[i])) for i in order) for row in rows
    )


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    con = _duck_connection(SF_DIR)
    rel = con.execute(spec.oracle)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    # degenerate-parity guard: an empty result trivially "matches" an
    # empty oracle while exercising nothing (caught twice: a k-core
    # threshold above the backbone's degree range, an anti join whose
    # membership side covered every row). Every query is required to
    # produce rows at every test SF — make the predicate selective at
    # the smallest scale, not vacuous.
    assert spark_rows, f"{name}: both engines returned 0 rows — vacuous parity"
    s_set, d_set = _row_set(spark_rows, spark_cols), _row_set(duck_rows, duck_cols)
    mismatches = [
        (a, b) for a, b in zip(s_set, d_set) if a != b
    ]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:5]}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_DIR)
    assert sdf.count() >= 0
    assert sdf.columns
