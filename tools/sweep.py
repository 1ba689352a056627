"""Full-registry oracle sweep — the driver's CORRECTNESS check, locally.

Runs every registry query with a DuckDB-oracle twin side-by-side at a
given scale factor and compares row count, schema (column names), and
values (columns sorted by name, rows sorted canonically — the driver's
hash-compare convention). Queries without an oracle get a rows-only
smoke run.

Usage:
    python tools/sweep.py [--sf /root/testdata/sf0.01] [--only q1,q2] [-v]
    python tools/sweep.py --shards 6 --round 4   # the repeatable gate
    # 10x scale fixtures: bound each query's wall and the driver-side
    # collect (oversize results compare rows-only; super-linear oracle
    # SQL trips the budget and is recorded as over_budget, distinct
    # from a failure — the Spark scale path is measured in SCALE.md)
    SPARK_GRAFT_DRIVER_MEM=8g python tools/sweep.py \
        --sf /tmp/spark_graft_sfx10 --shards 6 \
        --budget 300 --max-hash-rows 300000 --only <family-names>

Exit code 0 iff every query matches. Single-process runs write a JSON
log to /tmp/sweep_<sfname>.json (or --out). ``--shards N`` runs the
registry as N parallel subprocesses (each its own local[cpus/N] Spark +
DuckDB — the sweep is embarrassingly parallel per query) and merges
their logs into ONE recorded artifact; with ``--round R`` that artifact
is ``SWEEP_r{R}.json`` at the repo root, committed so the next round
diffs per-query pass/fail and timing instead of re-discovering them.
Shard children inherit SPARK_GRAFT_CPUS = cpu_count // shards (unless
the caller pinned it) so N shards share the machine instead of running
N full-width local[cpu_count] sessions.
"""

from __future__ import annotations

import argparse
import gc
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon(v):
    """Canonicalize one cell for comparison (numpy scalars -> python,
    NaN -> sentinel, floats rounded to kill 1-ulp engine noise the
    registry's own rounding conventions already guard against)."""
    import datetime

    import numpy as np

    import pandas as pd

    if v is None:
        return None
    if isinstance(v, (np.generic,)):
        v = v.item()
    # pandas NaT (null date/timestamp) — both engines surface SQL NULL
    # dates this way through the pandas bridge
    if v is pd.NaT:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "__nan__"
        # registry convention rounds visible floats to >= 4 decimals;
        # 9 decimals of slack detects real bugs, not summation jitter
        return round(v, 9) + 0.0
    if isinstance(v, datetime.datetime):
        # DuckDB renders a DATE-valued expression as midnight TIMESTAMP
        # where Spark keeps DateType — same value, compare as date
        if v.time() == datetime.time(0, 0) and v.tzinfo is None:
            return str(v.date())
        return str(v)
    if isinstance(v, datetime.date):
        return str(v)
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def _frame_key(pdf):
    cols = sorted(pdf.columns)
    rows = [tuple(_canon(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    rows.sort(key=repr)
    return cols, rows


def _sharded(args) -> int:
    """Spawn --shards sweep subprocesses over a round-robin split of the
    registry and merge their logs into one artifact (SWEEP_r{N}.json at
    the repo root when --round is given)."""
    import subprocess
    import tempfile

    from covid19_etl_pipeline_spark.plans.queries import REGISTRY

    names = args.only.split(",") if args.only else list(REGISTRY)
    # fail fast on typos: an unknown name round-robined into a shard
    # would raise an uncaught KeyError in the child, killing the whole
    # shard and mis-reporting its siblings as 'missing' (ADVICE r06)
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"sweep: unknown query names: {', '.join(unknown)}", file=sys.stderr)
        return 2
    shards = [names[i :: args.shards] for i in range(args.shards)]
    shards = [s for s in shards if s]
    # Split the machine's cores across shards: a child's get_spark()
    # defaults to local[os.cpu_count()], so N shards silently ran N
    # full-width sessions (4 shards x local[32] = 128 task slots on 32
    # CPUs — observed load avg 85, and the likely mechanism behind the
    # r07 OOM-killed shard and the x10 run's /tmp spill exhaustion:
    # every shard's shuffle+GEMM memory peaked 8x wider than intended).
    # Respect an explicit SPARK_GRAFT_CPUS if the caller set one.
    child_env = dict(os.environ)
    if "SPARK_GRAFT_CPUS" not in child_env:
        child_env["SPARK_GRAFT_CPUS"] = str(
            max(2, (os.cpu_count() or 8) // max(1, len(shards)))
        )
    t0 = time.time()
    procs, outs = [], []
    for i, shard in enumerate(shards):
        fd, out = tempfile.mkstemp(prefix=f"sweep_shard{i}_", suffix=".json")
        os.close(fd)
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--sf",
                    args.sf,
                    "--only",
                    ",".join(shard),
                    "--out",
                    out,
                    "--budget",
                    str(args.budget),
                    "--max-hash-rows",
                    str(args.max_hash_rows),
                    "--restart-every",
                    str(args.restart_every),
                ]
                + (["--spark-only"] if args.spark_only else [])
                + (["--tiered"] if args.tiered else []),
                env=child_env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    for i, pr in enumerate(procs):
        log, _ = pr.communicate()
        tail = log.strip().splitlines()[-1] if log.strip() else ""
        print(f"[shard-{i + 1}of{args.shards}] rc={pr.returncode}: {tail}")

    results: dict[str, dict] = {}
    for out in outs:
        try:
            with open(out) as fh:
                results.update(json.load(fh))
        except (FileNotFoundError, json.JSONDecodeError):
            # mkstemp pre-creates the file, so a shard that died before
            # writing leaves it empty rather than absent
            pass
        finally:
            try:
                os.unlink(out)
            except OSError:
                pass
    # registry order, not shard order, so artifact diffs are stable
    results = {n: results[n] for n in names if n in results}

    # Contention retry (VERDICT r09 #3): a budget trip under N-shard
    # contention measures the SHARD's 1/N CPU share, not the query —
    # r08/r09 recorded those as over_budget and needed a companion
    # "solo" artifact to read as green. Fold the retry in: re-run the
    # tripped queries sequentially in ONE full-width child (the
    # original environment, no SPARK_GRAFT_CPUS split) under the same
    # budget, and record both attempts — the artifact is then
    # self-contained: over_budget means over budget WITH the whole
    # machine, not under a 4-way split.
    if args.retry_solo:
        # three retryable classes: budget/harness/oracle trips (the
        # check did not complete), HARD errors (a shard-local OOM or
        # broadcast build failure may be heap debris, not the query —
        # a solo run disambiguates; if it fails alone it stays a
        # failure), and MISSING entries (a dead shard JVM takes its
        # remaining queries' records with it — r10 shard-4of4
        # ConnectionRefused lost 39 entries)
        tripped = [
            n for n, r in results.items() if r.get("err")
        ] + [n for n in names if n not in results]
        if tripped:
            print(
                f"\nretrying {len(tripped)} budget/harness casualties "
                f"solo (full CPU width): {', '.join(tripped)}",
                flush=True,
            )
            fd, solo_out = tempfile.mkstemp(
                prefix="sweep_solo_", suffix=".json"
            )
            os.close(fd)
            solo = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--sf",
                    args.sf,
                    "--only",
                    ",".join(tripped),
                    "--out",
                    solo_out,
                    "--budget",
                    str(args.budget),
                    "--max-hash-rows",
                    str(args.max_hash_rows),
                    "--restart-every",
                    str(args.restart_every),
                ]
                + (["--spark-only"] if args.spark_only else [])
                + (["--tiered"] if args.tiered else []),
                env=dict(os.environ),  # full width: no shard CPU split
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
            tail = (
                solo.stdout.strip().splitlines()[-1]
                if solo.stdout.strip()
                else ""
            )
            print(f"[solo-retry] rc={solo.returncode}: {tail}")
            try:
                with open(solo_out) as fh:
                    solo_results = json.load(fh)
            except (FileNotFoundError, json.JSONDecodeError):
                solo_results = {}
            finally:
                try:
                    os.unlink(solo_out)
                except OSError:
                    pass
            for n, rec in solo_results.items():
                rec["contention_retry"] = True
                prev = results.get(n)
                rec["sharded_attempt"] = (
                    {"err": prev.get("err"), "sec": prev.get("sec")}
                    if prev
                    else {"err": "missing (shard died)", "sec": None}
                )
                results[n] = rec
            # recovered-missing entries appended out of order
            results = {n: results[n] for n in names if n in results}
    over_budget = [
        n
        for n, r in results.items()
        if (r.get("err") or "").startswith("budget_exceeded")
    ]
    # a stale-watchdog interrupt means the check DID NOT RUN — the
    # query is unverified (re-run it), but it is not a wrong answer
    harness = [
        n
        for n, r in results.items()
        if (r.get("err") or "").startswith("harness_interrupt")
    ]
    # DuckDB resource exhaustion running the oracle twin — same
    # category as an oracle-side budget trip: the check did not run
    oracle_oom = [
        n
        for n, r in results.items()
        if (r.get("err") or "").startswith("oracle_oom")
    ]
    failures = [
        n
        for n, r in results.items()
        if n not in over_budget
        and n not in harness
        and n not in oracle_oom
        and (
            r.get("err") or r.get("hash_match") is False
            or r.get("rows_match") is False or r.get("schema_match") is False
        )
    ]
    missing = [n for n in names if n not in results]
    doc = {
        "sf": args.sf,
        # spark-only mode: "pass" means the Spark plan EXECUTED to
        # completion (rows counted, wall recorded) — no oracle value
        # comparison happened; the correctness gates are the sf0.01
        # hash sweep and the ×10 artifact
        "mode": "spark_only" if args.spark_only else "oracle_compare",
        # value_hash convention (spark-only entries): xxhash64 over
        # every output column with float columns rounded to 9dp first
        # — stable across partition-order summation jitter; r11+ hashes
        # are the cross-round diff baseline (r10 hashed raw doubles)
        "value_hash_convention": "xxhash64, floats rounded 9dp (r11+)",
        "shards": args.shards,
        "wall_sec": round(time.time() - t0, 1),
        "n_queries": len(names),
        "n_pass": len(results) - len(failures) - len(over_budget)
        - len(harness) - len(oracle_oom),
        "failures": failures,
        # scale-mode bookkeeping: a tripped budget is "this check did
        # not run here", distinct from a correctness failure — the
        # Spark scale path for these is measured by scale_spotcheck /
        # SCALE.md instead
        "over_budget": over_budget,
        "oracle_oom": oracle_oom,
        "harness_interrupts": harness,
        "rows_only": [
            n for n, r in results.items() if r.get("rows_only")
        ],
        "tiered": [n for n, r in results.items() if r.get("tiered")],
        "contention_retry": [
            n for n, r in results.items() if r.get("contention_retry")
        ],
        "missing": missing,
        "results": results,
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = (
        os.path.join(repo, f"SWEEP_r{args.round:02d}.json")
        if args.round
        else args.out or f"/tmp/sweep_{os.path.basename(args.sf.rstrip('/'))}.json"
    )
    with open(out_path, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(
        f"\n{doc['n_pass']}/{len(names)} pass in {doc['wall_sec']}s -> {out_path}"
    )
    if failures or missing or harness:
        print(
            "FAILURES:",
            ", ".join(
                failures
                + [f"{m} (missing)" for m in missing]
                + [f"{h} (harness_interrupt — unverified, re-run)" for h in harness]
            ),
        )
    return 1 if failures or missing or harness else 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf", default="/root/testdata/sf0.01")
    p.add_argument("--only", default=None, help="comma-separated query names")
    p.add_argument("--out", default=None, help="JSON log path")
    p.add_argument("--shards", type=int, default=0, help="parallel subprocesses")
    p.add_argument(
        "--budget",
        type=float,
        default=0.0,
        help="per-query wall budget in seconds (0 = unlimited); an "
        "over-budget query is interrupted, records err=budget_exceeded, "
        "and the sweep continues — for the 10x scale-fixture runs",
    )
    p.add_argument(
        "--max-hash-rows",
        type=int,
        default=0,
        help="results larger than this are compared rows-only (count "
        "parity, no driver-side collect) — bounds driver memory on the "
        "scale fixtures; 0 = always hash-compare",
    )
    p.add_argument("--round", type=int, default=0, help="write SWEEP_r{N}.json")
    p.add_argument(
        "--restart-every",
        type=int,
        default=0,
        help="restart the Spark session every K queries (0 = never) — "
        "bounds cross-query JVM heap debris on the scale fixtures, "
        "where one shard runs ~20 heavy queries in one local-mode JVM",
    )
    p.add_argument(
        "--tiered",
        action="store_true",
        help="scale-fixture mode: queries with a registered tiered "
        "check (tools/scale_checks.py) get linear/sampled property "
        "verification over the Spark output instead of the monolithic "
        "super-linear oracle twin — any failed sub-check is a failure",
    )
    p.add_argument(
        "--spark-only",
        action="store_true",
        help="execute only the Spark side (count(), no DuckDB oracle) — "
        "for fixtures past what the oracle twins can run at ALL (the "
        "×100 corpus: quadratic SQL forms that exist for small-sf "
        "correctness). Records spark_rows + wall per query; the "
        "artifact says explicitly that no value comparison happened.",
    )
    p.add_argument(
        "--retry-solo",
        action="store_true",
        help="sharded runs only: re-run budget-tripped queries "
        "sequentially at full CPU width and fold both attempts into "
        "the ONE artifact (contention_retry per entry) — over_budget "
        "then means over budget with the whole machine, and the "
        "artifact reads green standalone",
    )
    p.add_argument("-v", "--verbose", action="store_true")
    args = p.parse_args(argv)

    if args.shards:
        return _sharded(args)

    import duckdb

    from covid19_etl_pipeline_spark.plans.queries import REGISTRY
    from covid19_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="sweep")
    con = duckdb.connect()
    # Pin DuckDB to this shard's CPU share: it defaults to every core,
    # so N shards ran N all-core DuckDBs on top of N Spark sessions
    # during oracle phases — the same oversubscription the Spark side
    # fixed via the inherited SPARK_GRAFT_CPUS split.
    duck_cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if duck_cpus:
        con.execute(f"SET threads={max(1, int(duck_cpus))}")
    duck_mem = os.environ.get("SWEEP_DUCK_MEM")
    if duck_mem:
        # scale-fixture mode: the quadratic oracle twins allocate fast
        # enough at 10x to draw the kernel OOM killer onto the whole
        # shard (r07: one shard SIGKILLed, its sibling's JVM torn down
        # with it, 40 queries lost). A memory cap makes DuckDB spill to
        # disk instead — slower, but every query records SOMETHING.
        # An IN-MEMORY DuckDB has no temp_directory by default, so the
        # cap alone would turn the overflow into an OutOfMemory ERROR
        # (better than SIGKILL, still not a verdict) — point it at a
        # real spill dir so the query completes.
        import tempfile

        con.execute(f"SET memory_limit='{duck_mem}'")
        spill = tempfile.mkdtemp(prefix="sweep_duck_spill_")
        con.execute(f"SET temp_directory='{spill}'")
    for t in TABLES:
        path = os.path.join(args.sf, f"{t}.parquet")
        if os.path.isdir(path):
            # Spark-written table: a DIRECTORY of part files (the §12
            # scale fixtures); DuckDB needs the glob form
            path = os.path.join(path, "*.parquet")
        elif not os.path.exists(path):
            continue
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )

    names = args.only.split(",") if args.only else list(REGISTRY)
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"sweep: unknown query names: {', '.join(unknown)}", file=sys.stderr)
        return 2
    results, failures = {}, []
    t_start = time.time()
    for i, name in enumerate(names):
        if (
            args.restart_every
            and i
            and i % args.restart_every == 0
        ):
            # Scale-fixture hygiene: ~20 heavy ×100 queries in ONE
            # local-mode JVM accumulate broadcast/localCheckpoint
            # debris until an unrelated query's task OOMs the heap and
            # takes the whole shard's remaining queries with it
            # (r08 shard-1of4; recurred r09 even with per-query gc —
            # java.lang.OutOfMemoryError mid-stage). A fresh session
            # every K queries caps the debris window at K.
            spark.stop()
            spark = get_spark(app_name="sweep")
        spec = REGISTRY[name]
        t0 = time.time()
        rec = {"err": None}
        # Per-query cursor: the budget watchdog interrupts THIS
        # cursor, never the shared connection. r07 observed a tripped
        # budget's interrupt latching on the shared `con` and killing
        # the NEXT query's first statement (corpus_duplicate_ngrams,
        # InterruptException at 52.5s under a 450s budget, right after
        # dup_clusters' genuine oracle-side trip). A cursor is its own
        # DuckDB connection to the same in-memory catalog, so the
        # views stay visible and a stale interrupt dies with it.
        cur = con.cursor()
        # Per-query wall budget (scale-fixture mode): at 10x data some
        # oracle SQL forms are legitimately super-linear (they exist
        # for CORRECTNESS at small sf, the Spark path is the scale
        # path) and some result sets grow past what the driver should
        # collect. A tripped budget interrupts DuckDB, cancels the
        # Spark jobs, records err="budget_exceeded", and moves on —
        # the artifact stays honest about WHICH checks ran instead of
        # hanging the whole sweep (r06: one 10x shard sat >1h and
        # recorded nothing).
        guard = fired = done = None
        if args.budget:
            import threading

            fired = threading.Event()
            done = threading.Event()
            group = f"sweep-budget-{name}"
            # interruptOnCancel so long-running tasks die, not linger
            spark.sparkContext.setJobGroup(
                group, f"sweep per-query budget {args.budget}s", True
            )

            def _trip(group=group, cur=cur, fired=fired, done=done):
                # a query is many Spark jobs; cancelling once only
                # kills the job running at fire time, so keep
                # cancelling THIS query's job group (scoped — a cancel
                # landing after the query ends cannot hit the next
                # one) until the main loop signals completion.
                # EVERY per-query object is bound as a DEFAULT ARG:
                # the first r08 scale run captured cur/done by NAME,
                # so a stale trip thread late-bound to the NEXT
                # query's cursor and — because the next `done` starts
                # unset — kept interrupting it for that query's whole
                # life (18 harness_interrupts in one sweep). Early
                # binding pins the thread to its own query's state.
                fired.set()
                while not done.is_set():
                    try:
                        cur.interrupt()
                    except Exception:
                        pass
                    try:
                        spark.sparkContext.cancelJobGroup(group)
                    except Exception:
                        pass
                    done.wait(1.0)

            guard = threading.Timer(args.budget, _trip)
            guard.daemon = True
            guard.start()
        phase = "spark"  # which side a tripped budget interrupted
        sdf = None
        try:
            sdf = spec.fn(spark, args.sf)
            if args.tiered and not args.spark_only:
                from tools.scale_checks import CHECKS as SCALE_CHECKS

                if name in SCALE_CHECKS:
                    # tiered scale oracle (VERDICT r08 #2): linear /
                    # sampled property checks over the Spark output in
                    # place of the monolithic super-linear SQL twin
                    from tools.scale_checks import CheckCtx

                    rec["spark_rows"] = sdf.count()
                    cctx = CheckCtx(spark, cur, args.sf, sdf)
                    try:
                        phase = "oracle"
                        res = SCALE_CHECKS[name](cctx)
                    finally:
                        cctx.cleanup()
                    rec["tiered"] = res["checks"]
                    rec["tiered_notes"] = res.get("notes", {})
                    rec["rows_match"] = rec["schema_match"] = None
                    rec["hash_match"] = None
                    ok = all(res["checks"].values())
                    if not ok:
                        failures.append(name)
                    rec["sec"] = round(time.time() - t0, 3)
                    results[name] = rec
                    bad = [k for k, v in res["checks"].items() if not v]
                    print(
                        f"[{i + 1}/{len(names)}] {name}: "
                        f"{'ok' if ok else 'FAIL ' + ','.join(bad)} "
                        f"(tiered {len(res['checks'])} checks, "
                        f"{rec['sec']}s)",
                        flush=True,
                    )
                    continue  # finally releases the budget guard
            if args.spark_only:
                # value invariants folded into the counting pass
                # (VERDICT r08 #3) — "pass" now means "executed AND
                # self-consistent", not just "executed in budget"
                from tools.scale_checks import (
                    SPARK_ONLY_EXTRA,
                    spark_only_invariants,
                )

                n, inv, inv_notes = spark_only_invariants(sdf, name=name)
                if name in SPARK_ONLY_EXTRA:
                    inv.update(SPARK_ONLY_EXTRA[name](spark, args.sf, sdf))
                rec["spark_rows"] = n
                rec["spark_only"] = True
                rec["invariants"] = inv
                if inv_notes:
                    # the full-width canonical hash (forces every
                    # column to materialize — no count-pruned plans)
                    rec.update(inv_notes)
                rec["rows_match"] = rec["schema_match"] = rec["hash_match"] = None
                ok = all(inv.values())
                if not ok:
                    failures.append(name)
                rec["sec"] = round(time.time() - t0, 3)
                results[name] = rec
                bad = [k for k, v in inv.items() if not v]
                print(
                    f"[{i + 1}/{len(names)}] {name}: "
                    f"{'ok' if ok else 'FAIL ' + ','.join(bad)} "
                    f"(spark-only, {rec['spark_rows']} rows, "
                    f"{len(inv)} invariants, {rec['sec']}s)",
                    flush=True,
                )
                continue  # finally releases the budget guard
            if args.max_hash_rows:
                # scale mode: bound driver memory — count first; results
                # too large to collect get the STREAMED agg-hash compare
                # (two scalars computed inside each engine, O(1) driver
                # memory — VERDICT r08 #1); rows-only remains only as
                # the fallback for types with no canonical form
                n = sdf.count()
                rec["spark_rows"] = n
                if n > args.max_hash_rows:
                    from tools.agghash import (
                        UnsupportedType,
                        duck_agg_hash,
                        duck_cols,
                        spark_agg_hash,
                    )

                    if spec.oracle is not None:
                        try:
                            _, s_hash = spark_agg_hash(sdf)
                            phase = "oracle"
                            o_n, o_hash = duck_agg_hash(cur, spec.oracle)
                            rec["agg_hash"] = True
                            rec["oracle_rows"] = o_n
                            rec["rows_match"] = n == o_n
                            rec["schema_match"] = sorted(
                                sdf.columns
                            ) == sorted(duck_cols(cur, spec.oracle))
                            rec["hash_match"] = s_hash == o_hash
                            ok = (
                                rec["rows_match"]
                                and rec["schema_match"]
                                and rec["hash_match"]
                            )
                            if not ok:
                                failures.append(name)
                        except UnsupportedType as ut:
                            phase = "oracle"
                            rec["rows_only"] = True
                            rec["rows_only_reason"] = f"agg_hash: {ut}"
                            rec["oracle_rows"] = cur.execute(
                                f"SELECT count(*) FROM ({spec.oracle})"
                            ).fetchone()[0]
                            rec["rows_match"] = n == rec["oracle_rows"]
                            rec["schema_match"] = rec["hash_match"] = None
                            ok = bool(rec["rows_match"])
                            if not ok:
                                failures.append(name)
                    else:
                        rec["rows_only"] = True
                        rec["rows_match"] = rec["schema_match"] = None
                        rec["hash_match"] = None
                        ok = True
                    rec["sec"] = round(time.time() - t0, 3)
                    results[name] = rec
                    mode = "agg-hash" if rec.get("agg_hash") else "rows-only"
                    print(
                        f"[{i + 1}/{len(names)}] {name}: "
                        f"{'ok' if ok else 'FAIL'} ({mode}, {rec['sec']}s)",
                        flush=True,
                    )
                    continue  # finally releases the budget guard
            spdf = sdf.toPandas()
            rec["spark_rows"] = len(spdf)
            if spec.oracle is not None:
                phase = "oracle"
                odf = cur.execute(spec.oracle).fetchdf()
                rec["oracle_rows"] = len(odf)
                scols, srows = _frame_key(spdf)
                ocols, orows = _frame_key(odf)
                rec["rows_match"] = len(spdf) == len(odf)
                rec["schema_match"] = scols == ocols
                rec["hash_match"] = srows == orows
                ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
                if not ok:
                    failures.append(name)
                    if args.verbose:
                        print(f"--- {name} MISMATCH")
                        print("  spark cols:", scols)
                        print("  oracle cols:", ocols)
                        for j, (a, b) in enumerate(zip(srows, orows)):
                            if a != b:
                                print(f"  first diff row {j}:")
                                print("    spark :", a)
                                print("    oracle:", b)
                                break
            else:
                rec["rows_match"] = rec["schema_match"] = rec["hash_match"] = None
                ok = True
        except Exception as e:  # noqa: BLE001 — sweep must survive one bad query
            if fired is not None and fired.is_set():
                # which engine the budget interrupted matters: a
                # Spark-side trip under a sharded (CPU-starved) run is
                # contention, an oracle-side trip is the expected
                # super-linear small-sf SQL twin
                rec["err"] = f"budget_exceeded({args.budget}s, during={phase})"
                failures.append(name)
            elif type(e).__name__ == "InterruptException":
                # an interrupt with the budget timer UNFIRED is the
                # harness (a stale watchdog signal), not the query —
                # per-query cursors should make this unreachable, but
                # if it ever recurs, record it as what it is instead
                # of a correctness failure (r07 verdict)
                rec["err"] = f"harness_interrupt: {e}"[:500]
                failures.append(name)
            elif (
                phase == "oracle"
                and type(e).__name__ == "OutOfMemoryException"
            ):
                # DuckDB ran out of memory running the oracle twin
                # (recursive-CTE materialization is not spillable, so
                # the SWEEP_DUCK_MEM cap can't save a CC oracle at 10x)
                # — same category as an oracle-side budget trip: the
                # CHECK did not run at this scale; the Spark result is
                # recorded and the small-sf hash gate stands
                rec["err"] = f"oracle_oom: {e}"[:200]
                failures.append(name)
            else:
                rec["err"] = f"{type(e).__name__}: {e}"[:500]
                failures.append(name)
            ok = False
        finally:
            if guard:
                done.set()
                guard.cancel()
                if fired.is_set():
                    # the timer thread IS the trip loop once fired —
                    # wait it out (exits <=1s after done.set()) so no
                    # stale thread is alive when the next query starts
                    guard.join(timeout=5.0)
            # close AFTER done.set() so the trip loop stops aiming at
            # it first; a latched interrupt dies with the cursor
            try:
                cur.close()
            except Exception:
                pass
            # pyspark has no clearJobGroup; clearing the local
            # property detaches subsequent queries from this group
            # (was mis-indented under `except: pass` and never ran)
            spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)
            # Drop the python-side DataFrame ref and force a GC so
            # ContextCleaner releases this query's localCheckpoint
            # blocks (same lesson as bench.py's per-query gc): in
            # local mode those blocks live in THIS JVM's heap, and on
            # the x100 fixture ~20 heavy queries' worth accumulated
            # until a tiny broadcast build OOMed (dup_clusters) or the
            # JVM died outright (the shard-1of4 ConnectionRefused).
            sdf = None
            gc.collect()
        rec["sec"] = round(time.time() - t0, 3)
        results[name] = rec
        status = "ok" if ok else "FAIL"
        print(f"[{i + 1}/{len(names)}] {name}: {status} ({rec['sec']}s)", flush=True)

    out = args.out or f"/tmp/sweep_{os.path.basename(args.sf.rstrip('/'))}.json"
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    total = round(time.time() - t_start, 1)
    # exit-code classification mirrors _sharded (ADVICE r08: the same
    # oracle_oom event passed under --shards and failed single-process):
    # budget_exceeded / oracle_oom mean the CHECK did not run — reported,
    # not a wrong answer; harness_interrupt means re-run (exit 1)
    skipped = [
        n
        for n in failures
        if (results.get(n, {}).get("err") or "").startswith(
            ("budget_exceeded", "oracle_oom")
        )
    ]
    hard = [n for n in failures if n not in skipped]
    print(f"\n{len(names) - len(failures)}/{len(names)} pass in {total}s -> {out}")
    if skipped:
        print("CHECK-DID-NOT-RUN (budget/oracle_oom):", ", ".join(skipped))
    if hard:
        print("FAILURES:", ", ".join(hard))
    spark.stop()
    return 1 if hard else 0


if __name__ == "__main__":
    raise SystemExit(main())
