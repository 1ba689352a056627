"""Invariant tests for the round-3 layout / linkage / substring-dedup
operator batch — each checked against an independent brute-force or
closed-form recomputation (the oracle parity sweep covers value
equality; these pin the SEMANTICS the SQL twin shares, so a bug
mirrored into both engines still fails).
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import duckdb

from covid19_etl_pipeline_spark.catalog import table_path
from covid19_etl_pipeline_spark.plans.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def _parts():
    return duckdb.sql(
        f"SELECT p_partkey, p_brand, p_name, p_type, p_size, p_retailprice "
        f"FROM '{table_path(SF_DIR, 'part')}'"
    ).fetchall()


def test_skyline_matches_bruteforce_dominance(spark):
    rows = _parts()
    pts = [(r[0], r[5], r[4]) for r in rows]  # (key, price, size)
    expect = set()
    for k, price, size in pts:
        dominated = any(
            (p2 <= price and s2 >= size and (p2 < price or s2 > size))
            for _, p2, s2 in pts
        )
        if not dominated:
            expect.add((k, price, size))
    got = {
        (r["p_partkey"], r["p_retailprice"], r["p_size"])
        for r in REGISTRY["skyline_parts"].fn(spark, SF_DIR).collect()
    }
    assert got == expect


def test_maximal_repeated_substrings_matches_bruteforce(spark):
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{table_path(SF_DIR, 'documents')}'"
    ).fetchall()
    k = 8
    grams = Counter()
    positions = {}
    for doc_id, text in docs:
        toks = re.split(r"\s+", text.strip())
        pos = [
            (i + 1, " ".join(toks[i : i + k]))
            for i in range(len(toks) - k + 1)
        ]
        positions[doc_id] = pos
        grams.update(g for _, g in pos)
    expect = set()
    for doc_id, pos in positions.items():
        marked = [p for p, g in pos if grams[g] > 1]
        runs = []
        for p in sorted(marked):
            # merge when intervals [p, p+7] overlap or touch the
            # current run's end (same rule as the query)
            if runs and p <= runs[-1][1] + 1:
                runs[-1][1] = max(runs[-1][1], p + k - 1)
            else:
                runs.append([p, p + k - 1])
        for start, end in runs:
            if end - start + 1 >= 12:
                expect.add((doc_id, start, end - start + 1))
    got = {
        (r["doc_id"], r["start_pos"], r["run_token_len"])
        for r in REGISTRY["maximal_repeated_substrings"].fn(spark, SF_DIR).collect()
    }
    assert got == expect


def test_fellegi_sunter_odds_monotone_per_field(spark):
    rows = REGISTRY["fellegi_sunter_part_linkage"].fn(spark, SF_DIR).collect()
    assert rows, "linkage output empty"
    by_pattern = {}
    for r in rows:
        pat = (r["agree_type"], r["agree_price"], r["agree_name"])
        odds = by_pattern.setdefault(pat, r["match_odds"])
        # same agreement vector => same odds (odds depend only on it)
        assert odds == r["match_odds"]
    # flipping any field from disagree to agree must raise the odds
    # (every m > u here), for patterns observed in both states
    for pat, odds in by_pattern.items():
        for i in range(3):
            if pat[i] == 0:
                up = tuple(1 if j == i else pat[j] for j in range(3))
                if up in by_pattern:
                    assert by_pattern[up] > odds


def test_golden_record_survivorship_rules(spark):
    fams = defaultdict(list)
    for r in _parts():
        noun = r[2].split(" ")[1]
        fams[(r[1], noun)].append(r)
    got = {
        (r["p_brand"], r["noun"]): r
        for r in REGISTRY["golden_record_parts"].fn(spark, SF_DIR).collect()
    }
    expect_keys = {k for k, members in fams.items() if len(members) >= 2}
    assert set(got) == expect_keys
    for key, r in got.items():
        members = fams[key]
        assert r["n_members"] == len(members)
        assert r["golden_partkey"] == min(m[0] for m in members)
        # representative = highest price, ties to highest partkey
        rep = max(members, key=lambda m: (m[5], m[0]))
        assert (r["rep_type"], r["rep_size"], r["rep_price"]) == (
            rep[3],
            rep[4],
            rep[5],
        )


def test_zorder_zone_maps_tighter_than_unclustered(spark):
    rows = REGISTRY["zorder_layout_parts"].fn(spark, SF_DIR).collect()
    vols = defaultdict(list)
    for r in rows:
        vols[r["layout"]].append(r["zone_volume_frac"])
    z = sum(vols["zorder"]) / len(vols["zorder"])
    u = sum(vols["unclustered"]) / len(vols["unclustered"])
    # the whole point of the layout: z-ordered files cover a much
    # smaller fraction of the 2-D domain than key-hashed files (the
    # absolute hashed volume is data-dependent: at sf0.001 price
    # correlates with partkey, so only the RELATIVE claim is stable)
    assert z < 0.5 * u


def test_calibration_bins_partition_corpus(spark):
    rows = REGISTRY["quality_classifier_calibration"].fn(spark, SF_DIR).collect()
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{table_path(SF_DIR, 'documents')}'"
    ).fetchone()[0]
    assert sum(r["n"] for r in rows) == n_docs
    ece = sum(r["ece_contrib"] for r in rows)
    assert 0.0 <= ece <= 1.0
    for r in rows:
        assert 0.0 <= r["mean_confidence"] <= 1.0
        assert 0.0 <= r["positive_rate"] <= 1.0
        assert abs(
            r["calib_gap"] - round(abs(r["positive_rate"] - r["mean_confidence"]), 4)
        ) < 1e-9
