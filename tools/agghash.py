"""Streamed order-insensitive value verification (VERDICT r08 #1).

Computes ONE (row_count, hash_sum) pair per engine — the hash of every
canonicalized row, SUMMED as an exact wide integer INSIDE the engine —
and compares two scalars instead of collecting result sets to the
driver. Summation is commutative, so row order never matters, and the
driver memory cost is O(1) at any result size: the bound that forced
`embedding_neardup_pairs` / `fuzzy_part_duplicates` (45M rows) /
`recsys_negative_samples` into rows-only compares at the ×10 fixtures
is gone.

Cross-engine contract (every piece verified empirically, see
tests/test_agghash.py):

- Canonical row string: each column rendered to a canonical string
  (rules below), columns SORTED BY NAME, joined with chr(31). The
  rendering expression is ONE shared SQL text evaluated by both Spark
  and DuckDB — only timestamps, arrays, and identifier quoting need
  per-engine variants.
- Numerics (int / float / decimal / boolean, all CAST to DOUBLE): Java's
  `%f` formats from the double's SHORTEST decimal repr with HALF_UP
  ties while DuckDB's fmt formats the EXACT binary expansion with
  half-even ties — e.g. `printf('%.9f', 1.0/1024)` renders
  '...976563' on the JVM and '...976562' in DuckDB, and `%.9f` of
  1e300 disagrees in 280 digits. So no float is ever formatted
  directly: the value is mapped through tie-free IEEE arithmetic
  (`floor(v * 1e9 + 0.5)` — multiply, add, floor are bit-identical
  IEEE ops in both engines) onto an integer-valued double below 2^53,
  cast to BIGINT, and printed as an integer, which both engines render
  identically. Tiers keep the intermediate below 2^53: 9 decimals up
  to |v|<9e6, 3 decimals to 9e12, integer to 4.5e15, 1e-9 scale to
  9e24, sign-only beyond (no registry query emits such magnitudes;
  the sf0.01 collect-compare gate covers exact values there).
- Timestamps: midnight collapses to the DATE string (mirrors the
  collect-path `_canon`, where DuckDB renders DATE-valued expressions
  as midnight timestamps), else 'yyyy-MM-dd HH:mm:ss' + 6-digit
  micros via date_format / strftime.
- NULL sentinel chr(1)||'N' (cannot collide with data in canonical
  numeric/date output; strings containing chr(1) are out of scope).
- Row hash: low 64 bits of md5 — DuckDB `md5_number_lower(s)`
  (digest bytes [8:16] little-endian), Spark `conv()` over the
  byte-reversed hex chars 17..32 of `md5(s)`, verified equal.
- Aggregate: COUNT(*) plus SUM of the 64-bit hash as an exact wide
  integer (Spark DECIMAL(20,0)->DECIMAL(30,0) sum, good to ~5e10
  rows; DuckDB HUGEINT, good to ~9e18 rows). Two equal sums + equal
  counts == the same multiset of canonical rows (modulo md5-sum
  collisions, which require an engineered collision to hit).

Types with no canonical form here (struct, map, nested arrays) raise
UnsupportedType — the sweep falls back to the rows-only compare and
records why.
"""

from __future__ import annotations

NULL_S = "concat(chr(1), 'N')"
SEP = "chr(31)"

#: shared-text numeric canonicalization — see module docstring.
#: {v} must already be a DOUBLE-typed SQL expression.
_NUM_CANON = """CASE
 WHEN {v} IS NULL THEN 'N'
 WHEN isnan({v}) THEN 'nan'
 WHEN {v} = CAST('Infinity' AS DOUBLE) THEN 'inf'
 WHEN {v} = CAST('-Infinity' AS DOUBLE) THEN '-inf'
 WHEN abs({v}) < 9.0e6
   THEN CAST(CAST(floor({v} * 1.0e9 + 0.5) AS BIGINT) AS STRING)
 WHEN abs({v}) < 9.0e12
   THEN concat('k', CAST(CAST(floor({v} * 1.0e3 + 0.5) AS BIGINT) AS STRING))
 WHEN abs({v}) < 4.5e15
   THEN concat('m', CAST(CAST(floor({v} + 0.5) AS BIGINT) AS STRING))
 WHEN abs({v}) < 9.0e24
   THEN concat('g', CAST(CAST(floor({v} / 1.0e9 + 0.5) AS BIGINT) AS STRING))
 ELSE concat('huge', CASE WHEN {v} < 0 THEN '-' ELSE '+' END)
END""".replace("\n", " ")


class UnsupportedType(Exception):
    """Column type with no cross-engine canonical form."""


def _canon_expr(col_sql: str, kind: str, engine: str) -> str:
    """Canonical-string SQL for one column reference.

    ``kind`` is one of num / str / date / ts / bin, or arr:<kind>;
    ``engine`` is 'spark' or 'duckdb' (timestamp formatting and array
    lambdas are the only divergent pieces).
    """
    if kind == "num":
        return _NUM_CANON.format(v=f"CAST({col_sql} AS DOUBLE)")
    if kind == "str":
        return f"coalesce({col_sql}, {NULL_S})"
    if kind == "date":
        return f"coalesce(CAST({col_sql} AS STRING), {NULL_S})"
    if kind == "ts":
        fmt = (
            f"date_format({col_sql}, 'yyyy-MM-dd HH:mm:ss.SSSSSS')"
            if engine == "spark"
            else f"strftime({col_sql}, '%Y-%m-%d %H:%M:%S.%f')"
        )
        return (
            f"CASE WHEN {col_sql} IS NULL THEN {NULL_S} "
            f"WHEN {col_sql} = date_trunc('day', {col_sql}) "
            f"THEN CAST(CAST({col_sql} AS DATE) AS STRING) "
            f"ELSE {fmt} END"
        )
    if kind == "bin":
        return f"coalesce(lower(hex({col_sql})), {NULL_S})"
    if kind.startswith("arr:"):
        elem = _canon_expr("x", kind[4:], engine)
        if engine == "spark":
            joined = f"array_join(transform({col_sql}, x -> {elem}), ',')"
        else:
            joined = (
                f"array_to_string(list_transform({col_sql}, x -> {elem}), ',')"
            )
        return f"coalesce(concat('[', {joined}, ']'), {NULL_S})"
    raise UnsupportedType(kind)


def _spark_kind(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(
        dt,
        (
            T.ByteType,
            T.ShortType,
            T.IntegerType,
            T.LongType,
            T.FloatType,
            T.DoubleType,
            T.DecimalType,
            T.BooleanType,
        ),
    ):
        return "num"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "ts"
    if isinstance(dt, T.BinaryType):
        return "bin"
    if isinstance(dt, T.ArrayType):
        inner = _spark_kind(dt.elementType)
        if inner.startswith("arr:"):
            raise UnsupportedType(f"nested array: {dt.simpleString()}")
        return f"arr:{inner}"
    raise UnsupportedType(dt.simpleString())


_DUCK_NUM = {
    "TINYINT",
    "SMALLINT",
    "INTEGER",
    "BIGINT",
    "HUGEINT",
    "UTINYINT",
    "USMALLINT",
    "UINTEGER",
    "UBIGINT",
    "UHUGEINT",
    "FLOAT",
    "DOUBLE",
    "BOOLEAN",
}


def _duck_kind(type_str: str) -> str:
    t = type_str.strip().upper()
    if t.endswith("[]"):
        inner = _duck_kind(t[:-2])
        if inner.startswith("arr:"):
            raise UnsupportedType(f"nested array: {type_str}")
        return f"arr:{inner}"
    if t in _DUCK_NUM or t.startswith("DECIMAL"):
        return "num"
    if t in ("VARCHAR", "STRING", "TEXT"):
        return "str"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "ts"
    if t == "BLOB":
        return "bin"
    raise UnsupportedType(type_str)


def _row_expr(cols_kinds: list[tuple[str, str]], engine: str) -> str:
    """concat_ws over name-sorted canonical columns. ``cols_kinds`` is
    [(name, kind)]; identifiers are quoted per engine."""
    q = "`" if engine == "spark" else '"'
    parts = [
        _canon_expr(f"{q}{name}{q}", kind, engine)
        for name, kind in sorted(cols_kinds)
    ]
    return f"concat_ws({SEP}, {', '.join(parts)})"


#: Spark: low 64 bits of md5 as unsigned — digest bytes [8:16]
#: little-endian == hex chars (31,32),(29,30)..(17,18); conv(.,16,10)
#: renders the unsigned value, good past 2^63.
_SPARK_H64 = (
    "CAST(conv(concat(substr(__h,31,2),substr(__h,29,2),substr(__h,27,2),"
    "substr(__h,25,2),substr(__h,23,2),substr(__h,21,2),substr(__h,19,2),"
    "substr(__h,17,2)),16,10) AS DECIMAL(20,0))"
)


def spark_agg_hash(sdf) -> tuple[int, int]:
    """(row_count, hash_sum) of a Spark DataFrame — one aggregate job,
    nothing collected but two scalars."""
    kinds = [(f.name, _spark_kind(f.dataType)) for f in sdf.schema.fields]
    row = _row_expr(kinds, "spark")
    out = (
        sdf.selectExpr(f"md5({row}) AS __h")
        .selectExpr(
            "count(*) AS n",
            f"coalesce(sum({_SPARK_H64}), CAST(0 AS DECIMAL(20,0))) AS h",
        )
        .collect()[0]
    )
    return int(out["n"]), int(out["h"])


def duck_agg_hash(cur, sql: str) -> tuple[int, int]:
    """(row_count, hash_sum) of a DuckDB query — schema via DESCRIBE,
    then one aggregate over the canonical row hash."""
    desc = cur.execute(f"DESCRIBE {sql}").fetchall()
    kinds = [(name, _duck_kind(t)) for name, t, *_ in desc]
    row = _row_expr(kinds, "duckdb")
    n, h = cur.execute(
        f"SELECT count(*) AS n, "
        f"coalesce(sum(CAST(md5_number_lower({row}) AS HUGEINT)), 0) AS h "
        f"FROM ({sql}) __aggq"
    ).fetchone()
    return int(n), int(h)


def duck_cols(cur, sql: str) -> list[str]:
    """Column names of a DuckDB query (for the schema_match leg)."""
    return [name for name, *_ in cur.execute(f"DESCRIBE {sql}").fetchall()]
