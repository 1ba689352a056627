"""Named query registry — every implemented operator as a (Spark
query, ANSI-SQL oracle) pair over the synthetic catalog
(TESTDATA.md).

The registry is populated by the family modules (imported below for
their @_register side effects) and re-sorted into the pinned
canonical order; determinism conventions are documented in
plans/_registry.py. Families: relational, tpch, dedup, text, embedding, corpus, timeseries, stats, mining, graph, multimodal, streaming, lakehouse.
"""

from __future__ import annotations

from covid19_etl_pipeline_spark.plans import (  # noqa: F401 — imported for @_register side effects
    relational,
    tpch,
    dedup,
    text,
    embedding,
    corpus,
    timeseries,
    stats,
    mining,
    graph,
    multimodal,
    streaming,
    lakehouse,
)
from covid19_etl_pipeline_spark.plans._order import CANONICAL_ORDER
from covid19_etl_pipeline_spark.plans._registry import REGISTRY, QuerySpec

__all__ = ["REGISTRY", "QuerySpec"]

_missing = [n for n in CANONICAL_ORDER if n not in REGISTRY]
assert not _missing, f"canonical order names missing: {_missing}"
_ordered = {n: REGISTRY[n] for n in CANONICAL_ORDER}
# any query registered but not yet pinned appends in import order
_ordered.update({n: s for n, s in REGISTRY.items() if n not in _ordered})
REGISTRY.clear()
REGISTRY.update(_ordered)
