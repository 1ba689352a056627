"""Property-based invariants (hypothesis) — the test layer the
reference lacks entirely (SURVEY §5): semantics that must hold for ANY
input, not just the curated fixtures.

Settings are deliberately small (Spark round-trips per example are
expensive); deadline disabled for JVM warmup jitter.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from covid19_etl_pipeline_spark.operators.dedup import exact_dup_groups
from covid19_etl_pipeline_spark.operators.setops import upsert_on_key
from covid19_etl_pipeline_spark.operators.windows import moving_average

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

kv_rows = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 100)), min_size=1, max_size=20
)


@_slow
@given(current=kv_rows, updates=kv_rows)
def test_upsert_keys_unique_and_updates_win(spark, current, updates):
    cur = spark.createDataFrame([(k, v, "old") for k, v in current], ["k", "v", "src"])
    upd = spark.createDataFrame([(k, v, "new") for k, v in updates], ["k", "v", "src"])
    out = upsert_on_key(cur, upd, ["k"]).collect()
    keys = [r["k"] for r in out]
    assert len(keys) == len(set(keys))                      # one row per key
    assert set(keys) == {k for k, _ in current} | {k for k, _ in updates}
    update_keys = {k for k, _ in updates}
    for r in out:
        assert r["src"] == ("new" if r["k"] in update_keys else "old")


@_slow
@given(
    values=st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=15,
    ),
    periods=st.integers(1, 5),
)
def test_moving_average_bounded_by_extremes(spark, values, periods):
    df = spark.createDataFrame(list(enumerate(values)), ["t", "v"])
    out = moving_average(df, ["v"], "t", partition_cols=(), periods=periods).collect()
    lo, hi = min(values), max(values)
    for r in out:
        assert lo - 1e-6 <= r[f"v_{periods}day_avg"] <= hi + 1e-6


@_slow
@given(texts=st.lists(st.text(alphabet="ab ", min_size=0, max_size=12), min_size=1, max_size=12))
def test_exact_dedup_partitions_rows(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    groups = exact_dup_groups(df, "doc_id").collect()
    # group sizes partition the corpus; one group per distinct text
    assert sum(r["n_copies"] for r in groups) == len(texts)
    assert len(groups) == len(set(texts))
    # keeper is the minimum id of its group
    by_text = {}
    for i, t in enumerate(texts):
        by_text.setdefault(t, []).append(i)
    keepers = {r["keeper_doc_id"] for r in groups}
    assert keepers == {min(ids) for ids in by_text.values()}


@_slow
@given(
    offsets=st.lists(st.integers(0, 7200), min_size=1, max_size=15),
    n_users=st.integers(1, 3),
)
def test_session_rollup_partitions_events(spark, offsets, n_users):
    """Sessions must PARTITION each user's events: counts sum to the
    event count, bounds are consistent, and consecutive sessions of one
    user are separated by at least the gap."""
    import datetime as dt

    from covid19_etl_pipeline_spark.streaming.stateful import session_rollup

    base = dt.datetime(2024, 1, 1)
    rows = [
        (uid, base + dt.timedelta(seconds=s), 1.0)
        for uid in range(n_users)
        for s in offsets
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    sessions = session_rollup(ev, gap="30 minutes").collect()
    # counts: every event lands in exactly one session
    total = sum(r["n_events"] for r in sessions)
    assert total == len(rows)
    by_user = {}
    for r in sessions:
        assert r["session_start"] < r["session_end"]
        by_user.setdefault(r["user_id"], []).append(r)
    for uid, ss in by_user.items():
        ss.sort(key=lambda r: r["session_start"])
        for a, b in zip(ss, ss[1:]):
            # session_window end = last event + gap; a following session
            # must start at or after that point
            assert b["session_start"] >= a["session_end"]


@_slow
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 9)),
            st.one_of(st.none(), st.just(float("nan")), st.floats(-10, 10)),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_null_profile_matches_python_count(spark, rows):
    import math

    from covid19_etl_pipeline_spark.operators.aggregates import null_profile

    df = spark.createDataFrame(rows, "k long, x double")
    r = null_profile(df).first()
    assert r["n_rows"] == len(rows)
    assert r["k_nulls"] == sum(1 for k, _ in rows if k is None)
    assert r["x_nulls"] == sum(
        1 for _, x in rows if x is None or (isinstance(x, float) and math.isnan(x))
    )


@_slow
@given(
    big=st.lists(st.tuples(st.integers(0, 4), st.integers(0, 100)), min_size=1, max_size=30),
    small=st.lists(st.integers(0, 4), min_size=1, max_size=5, unique=True),
    salt=st.integers(2, 6),
)
def test_salted_join_equals_plain_join(spark, big, small, salt):
    """Salting is physical-only: for ANY input and salt width the
    salted join returns exactly the plain join's multiset of rows."""
    from covid19_etl_pipeline_spark.operators.partitioning import salted_equi_join

    b = spark.createDataFrame(big, ["k", "v"])
    s = spark.createDataFrame([(k, f"d{k}") for k in small], ["k", "name"])
    salted = sorted(
        (r["k"], r["v"], r["name"])
        for r in salted_equi_join(b, s, "k", salt=salt).collect()
    )
    plain = sorted(
        (r["k"], r["v"], r["name"]) for r in b.join(s, "k").collect()
    )
    assert salted == plain


@_slow
@given(
    vecs=st.lists(
        st.lists(
            st.floats(-10, 10, allow_nan=False, allow_infinity=False, width=32),
            min_size=4, max_size=4,
        ),
        min_size=3, max_size=12,
    ),
    k=st.integers(2, 3),
)
def test_lloyd_assignment_invariants(spark, vecs, k):
    """Every point lands on exactly one live centroid, d2 is
    non-negative, and no more than k clusters exist — for ANY input."""
    from covid19_etl_pipeline_spark.operators.similarity import lloyd_iterations

    emb = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id long, embedding array<float>"
    )
    assigned, cent = lloyd_iterations(emb, k=k, iters=1)
    rows = assigned.collect()
    cids = {r["cid"] for r in cent.collect()}
    assert len(rows) == len(vecs)                       # total assignment
    assert len({r["pid"] for r in rows}) == len(vecs)   # exactly once
    assert {r["cid"] for r in rows} <= cids             # onto live centroids
    assert len(cids) <= k
    assert all(r["d2"] >= -1e-9 for r in rows)


_word = st.sampled_from("alpha beta gamma delta x y z".split())
_doc = st.lists(_word, min_size=0, max_size=8).map(" ".join)


@_slow
@given(
    docs=st.lists(_doc, min_size=2, max_size=10),
    threshold=st.sampled_from([0.3, 0.5, 0.8]),
)
def test_prefix_filter_lossless_for_any_corpus(spark, docs, threshold):
    """Prefix filtering must equal brute-force all-pairs Jaccard for
    ANY corpus and threshold — the zero-false-negative guarantee is a
    theorem about the prefix length, so hypothesis hunts for corpora
    (dup-heavy, shingle-less, tiny-vocabulary) that would break it."""
    from covid19_etl_pipeline_spark.operators.dedup import (
        jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = {
        (r["doc_id_a"], r["doc_id_b"]): round(r["jaccard"], 6)
        for r in prefix_filter_jaccard_pairs(
            df, "doc_id", threshold=threshold, shingle_k=2
        ).collect()
    }
    ids = (
        df.select("doc_id")
        .crossJoin(df.select(F.col("doc_id").alias("doc_id_b")))
        .filter(F.col("doc_id") < F.col("doc_id_b"))
        .select(F.col("doc_id").alias("doc_id_a"), "doc_id_b")
    )
    brute = {
        (r["doc_id_a"], r["doc_id_b"]): round(r["jaccard"], 6)
        for r in jaccard_pairs(df, "doc_id", shingle_k=2, candidates=ids).collect()
        if r["jaccard"] is not None and r["jaccard"] >= threshold
    }
    assert got == brute


@_slow
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)),
        min_size=1,
        max_size=15,
    ),
)
def test_bfs_hops_triangle_inequality(spark, edges):
    """For ANY digraph: dist(source)=0; every edge (u,v) with u reached
    satisfies dist(v) <= dist(u) + 1 (relaxed fixed point); every
    reached non-source node has an in-edge from a node one hop closer
    (witness property)."""
    from covid19_etl_pipeline_spark.operators.graph import bfs_hops

    e = spark.createDataFrame(
        [(str(a), str(b)) for a, b in edges], "src string, dst string"
    )
    src0 = str(min(a for a, _ in edges))
    sources = spark.createDataFrame([(src0,)], "node string")
    dist = {
        r["node"]: r["hops"] for r in bfs_hops(e, sources).collect()
    }
    assert dist[src0] == 0
    for a, b in edges:
        ka, kb = str(a), str(b)
        if ka in dist:
            assert kb in dist and dist[kb] <= dist[ka] + 1
    for node, h in dist.items():
        if h > 0:
            assert any(
                str(b) == node and str(a) in dist and dist[str(a)] == h - 1
                for a, b in edges
            )


@_slow
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5), st.floats(0.1, 9.9)),
        min_size=1,
        max_size=12,
    ),
    rounds=st.integers(1, 4),
)
def test_relax_rounds_monotone_in_rounds(spark, edges, rounds):
    """More rounds never increase any cost (min-plus relaxation is
    monotone), and every cost is a sum of <= rounds edge weights."""
    from covid19_etl_pipeline_spark.operators.graph import relax_rounds

    e = spark.createDataFrame(
        [(str(a), str(b), round(w, 1)) for a, b, w in edges],
        "src string, dst string, w double",
    )
    sources = spark.createDataFrame(
        [(str(min(a for a, _, _ in edges)),)], "node string"
    )
    d1 = {r["node"]: r["cost"] for r in relax_rounds(e, sources, rounds=rounds).collect()}
    d2 = {
        r["node"]: r["cost"]
        for r in relax_rounds(e, sources, rounds=rounds + 1).collect()
    }
    for n, c in d1.items():
        assert n in d2 and d2[n] <= c + 1e-9
    max_w = max(round(w, 1) for _, _, w in edges)
    for n, c in d1.items():
        assert 0 <= c <= rounds * max_w + 1e-9


@_slow
@given(
    vals=st.lists(
        st.floats(0.1, 100.0, allow_nan=False), min_size=2, max_size=12
    ),
)
def test_twap_bounded_by_extremes(spark, vals):
    """A duration-weighted mean lies within [min, max] of the values
    that carry positive duration (the last value carries none)."""
    import datetime

    rows = [
        (1, i, datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=10 * i),
         round(v, 2))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, ts timestamp, value double"
    )
    w_vals = [round(v, 2) for v in vals[:-1]]  # last sample has no duration
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dur = F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")
    seg = df.select("user_id", "value", dur.alias("dur_us")).filter(
        F.col("dur_us").isNotNull() & (F.col("dur_us") > 0)
    )
    out = (
        seg.groupBy("user_id")
        .agg((F.sum(F.col("value") * F.col("dur_us")) / F.sum("dur_us")).alias("twap"))
        .collect()
    )
    assert len(out) == 1
    assert min(w_vals) - 1e-6 <= out[0]["twap"] <= max(w_vals) + 1e-6


@_slow
@given(
    vecs=st.lists(
        st.lists(
            st.floats(-1.0, 1.0, allow_nan=False, allow_infinity=False),
            min_size=3,
            max_size=3,
        ),
        min_size=2,
        max_size=12,
    ),
    k=st.integers(1, 4),
)
def test_semdedup_survivor_rule_invariants(spark, vecs, k):
    """For ANY corpus: (a) no two same-cell survivors are >= t similar,
    and (b) every dropped vector has a lower-id same-cell neighbor at
    >= t (the survivor rule, verified brute-force)."""
    import math

    from covid19_etl_pipeline_spark.operators.similarity import (
        semdedup_survivors,
    )

    t = 0.95
    emb = spark.createDataFrame(
        list(enumerate(vecs)), ["vec_id", "embedding"]
    ).select("vec_id", F.col("embedding").cast("array<float>").alias("embedding"))
    out = {r["vec_id"]: r["cid"] for r in semdedup_survivors(emb, k=k, threshold=t).collect()}

    # brute-force reference: same assignment (nearest first-k centroid,
    # squared euclidean, tie on centroid id) on float32-rounded inputs
    import struct as _struct

    def f32r(x):
        return _struct.unpack("f", _struct.pack("f", x))[0]

    pts = {i: [f32r(x) for x in v] for i, v in enumerate(vecs)}
    cents = {i: [round(x, 6) for x in pts[i]] for i in pts if i < k}

    def d2(a, b):
        return (
            sum(x * x for x in a) - 2 * sum(x * y for x, y in zip(a, b))
            + sum(y * y for y in b)
        )

    cell = {i: min(cents, key=lambda c: (d2(v, cents[c]), c)) for i, v in pts.items()}

    def cos(a, b):
        na, nb = math.sqrt(sum(x * x for x in a)), math.sqrt(sum(y * y for y in b))
        if na == 0 or nb == 0:
            return None
        return sum(x * y for x, y in zip(a, b)) / (na * nb)

    survivors = set(out)
    for i in pts:
        if i in survivors:
            assert out[i] == cell[i]
        else:
            assert any(
                j < i and cell[j] == cell[i] and (cos(pts[j], pts[i]) or -2) >= t - 1e-9
                for j in pts
            )
    for a in survivors:
        for b in survivors:
            if a < b and cell[a] == cell[b]:
                c = cos(pts[a], pts[b])
                assert c is None or c < t + 1e-9


@given(
    w=st.integers(min_value=1, max_value=23),
    h=st.integers(min_value=1, max_value=17),
    ch=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_png_codec_roundtrip_property(w, h, ch, seed):
    """Property: encode→decode is the identity for every 8-bit
    shape/channel-count/content combination (encoder cycles all five
    scanline filters, so h≥5 cases prove every unfilter path on
    arbitrary content, not just fixtures)."""
    import numpy as np

    from covid19_etl_pipeline_spark.operators.multimodal import decode_png, encode_png

    px = np.random.default_rng(seed).integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    ww, hh, back = decode_png(encode_png(px))
    assert (ww, hh) == (w, h)
    assert np.array_equal(back, px)


@given(
    w=st.integers(min_value=1, max_value=23),
    h=st.integers(min_value=1, max_value=17),
    ch=st.sampled_from([1, 3]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_ppm_codec_roundtrip_property(w, h, ch, seed):
    """Property: binary-netpbm encode→decode is the identity for every
    8-bit shape and both channel counts (P5 grayscale / P6 RGB),
    including raster content that happens to contain header-looking
    bytes ('#', whitespace, digits) — the raster is length-delimited,
    never scanned."""
    import numpy as np

    from covid19_etl_pipeline_spark.operators.multimodal import decode_ppm, encode_ppm

    px = np.random.default_rng(seed).integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    ww, hh, back = decode_ppm(encode_ppm(px))
    assert (ww, hh) == (w, h)
    assert np.array_equal(back, px)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)).filter(lambda e: e[0] != e[1]),
        min_size=0,
        max_size=40,
    ),
)
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_connected_components_matches_union_find(spark, edges):
    """Property: the distributed min-label/path-halving components
    equal a reference union-find on arbitrary random graphs — chains,
    cliques, self-converging stars, disconnected singletons alike.
    Labels must be the component's MIN node id."""
    from covid19_etl_pipeline_spark.operators.dedup import connected_components

    norm = sorted({(min(a, b), max(a, b)) for a, b in edges})
    if not norm:
        return
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in norm:
        parent[find(a)] = find(b)
    groups: dict[int, list[int]] = {}
    for n in parent:
        groups.setdefault(find(n), []).append(n)
    expected = {n: min(g) for g in groups.values() for n in g}

    df = spark.createDataFrame(norm, "a long, b long")
    got = {
        r["node"]: r["label"]
        for r in connected_components(df, "a", "b").collect()
    }
    assert got == expected


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _fuzzy_reference(rows):
    """Brute-force record-linkage reference: all id pairs (a < b) in the
    same (noun, brand) block with name edit distance <= 3; name_a is
    the name of part_a."""
    out = set()
    for i1, n1, b1 in rows:
        for i2, n2, b2 in rows:
            if i1 >= i2 or b1 != b2:
                continue
            if n1.split(" ")[1] != n2.split(" ")[1]:
                continue
            d = _lev(n1, n2)
            if d <= 3:
                out.add((i1, i2, n1, n2, d))
    return out


def _run_fuzzy(spark, rows, tmpdir):
    from covid19_etl_pipeline_spark.plans.queries import REGISTRY

    df = spark.createDataFrame(
        [(i, n, b) for i, n, b in rows],
        "p_partkey long, p_name string, p_brand string",
    )
    df.write.mode("overwrite").parquet(f"{tmpdir}/part.parquet")
    got = REGISTRY["fuzzy_part_duplicates"].fn(spark, str(tmpdir)).collect()
    return {tuple(r) for r in got}


def test_fuzzy_part_duplicates_crafted_fixture(spark, tmp_path):
    """Deterministic adversarial cases for the vocabulary-grain pair
    expansion: same-name groups (exact-dup id pairs), cross-name
    matches where the LOWER id lives in the lexicographically LARGER
    name (orientation trap), singleton blocks, and non-matching names
    sharing a block."""
    rows = [
        (10, "red bolt", "B1"),
        (11, "red bolt", "B1"),   # same-name pair (10,11) dist 0
        (5, "rod bolt", "B1"),    # lower id, lexicographically larger name
        (20, "blue bolt", "B1"),  # dist(red,blue)=4 > 3 vs red; vs rod 4
        (30, "red bolt", "B2"),   # other brand: no cross-brand pairs
        (40, "red ring", "B1"),   # other noun: different block
        (50, "hot gear", "B1"),   # singleton block
    ]
    assert _run_fuzzy(spark, rows, tmp_path) == _fuzzy_reference(rows)


_name = st.tuples(
    st.sampled_from(["red", "rod", "hot", "blue", "re"]),
    st.sampled_from(["bolt", "ring"]),
).map(lambda t: f"{t[0]} {t[1]}")


@_slow
@given(
    names=st.lists(_name, min_size=1, max_size=12),
    brands=st.lists(st.sampled_from(["B1", "B2"]), min_size=12, max_size=12),
)
def test_fuzzy_part_duplicates_matches_bruteforce(spark, tmp_path, names, brands):
    rows = [(i, n, b) for i, (n, b) in enumerate(zip(names, brands))]
    assert _run_fuzzy(spark, rows, tmp_path) == _fuzzy_reference(rows)


def test_pcy_equals_apriori():
    """The PCY hashed-bucket prune must be LOSSLESS: identical
    (part_a, part_b, support) rows as the plain a-priori form on real
    data (bucket count >= true pair support, so no qualifying pair can
    be pruned)."""
    from covid19_etl_pipeline_spark.plans.queries import REGISTRY
    from covid19_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="test")
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        plain = {tuple(r) for r in REGISTRY["frequent_part_pairs"].fn(spark, sf_dir).collect()}
        pcy = {tuple(r) for r in REGISTRY["frequent_part_pairs_pcy"].fn(spark, sf_dir).collect()}
        assert pcy == plain, sf_dir


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vecs=st.lists(
        st.lists(
            st.floats(min_value=-1.0, max_value=1.0, allow_nan=False,
                      width=32),
            min_size=4, max_size=4,
        ),
        min_size=2, max_size=14,
    ),
    threshold=st.sampled_from([-0.5, 0.0, 0.35, 0.9]),
)
def test_gemm_kernels_match_naive_forms(spark, vecs, threshold):
    """PROPERTY: on arbitrary float vectors the broadcast-GEMM kernels
    agree with the naive join forms at the round-6 oracle contract —
    pair survival (>= threshold after unit-normalizing, zero-norm rows
    dropped) and exact-NN choice incl. the (sim DESC, id) tie-break."""
    import math

    unit = []
    for i, v in enumerate(vecs):
        n = math.sqrt(sum(x * x for x in v))
        if n > 0:
            unit.append((i, [x / n for x in v]))
    df = spark.createDataFrame(
        unit or [(0, [1.0, 0.0, 0.0, 0.0])], "vec_id long, uv array<double>"
    )
    from covid19_etl_pipeline_spark.operators import similarity

    got_pairs = {
        (r["vec_id_a"], r["vec_id_b"]): r["cosine_sim"]
        for r in similarity.gemm_threshold_pairs(
            df, threshold=threshold, vec_col="uv"
        ).collect()
    }
    rows = {r["vec_id"]: r["uv"] for r in df.collect()}
    ids = sorted(rows)
    eps = 1e-9  # float-summation-order noise band (true error ~1e-15)
    for i in ids:
        for j in ids:
            if i >= j:
                continue
            s = sum(a * b for a, b in zip(rows[i], rows[j]))
            if s >= threshold + eps:
                assert (i, j) in got_pairs
                assert abs(got_pairs[(i, j)] - s) < eps
            elif s < threshold - eps:
                assert (i, j) not in got_pairs
            # |s - threshold| <= eps: knife-edge, either verdict is fine

    got_nn = {
        r["query_id"]: (r["vec_id"], r["cosine_sim"])
        for r in similarity.gemm_nearest_neighbor(df, vec_col="uv").collect()
    }
    if len(ids) < 2:
        assert got_nn == {}
        return
    for i in ids:
        sims = sorted(
            ((sum(a * b for a, b in zip(rows[i], rows[j])), j)
             for j in ids if j != i),
            key=lambda t: (-t[0], t[1]),
        )
        best_s, best_j = sims[0]
        got_j, got_s = got_nn[i]
        assert abs(got_s - best_s) < eps  # NN sim always the max sim
        if len(sims) == 1 or best_s - sims[1][0] > eps:
            assert got_j == best_j  # unambiguous winner must match
        # near-tie within eps: either candidate is a valid NN
