"""Diff two sweep artifacts' per-query walls (VERDICT r10 #6).

The sf0.1 bench sees 50 queries; the ×10/×100 sweeps time all 79 scale
queries, but until now no round-over-round comparison existed — a ×10
regression invisible at sf0.1 (e.g. a join strategy that only tips
over past the broadcast threshold) went unnoticed unless it tripped a
budget. This prints a per-query old→new table, flags ratios past
--flag (default 1.5×) in either direction, and exits 1 on any flagged
regression so it can gate a round close.

Only queries with a recorded wall in BOTH artifacts are ratio'd;
entries that are new, missing, or errored on either side are listed
separately (an err→ok transition is an improvement, ok→err is already
covered by the sweep's own failure accounting).

Usage:
    python tools/sweep_compare.py SWEEP_r09_scale.json SWEEP_r10_scale.json
    python tools/sweep_compare.py old.json new.json --flag 1.5 --top 20
"""

from __future__ import annotations

import argparse
import json
import sys


def load_results(path: str) -> dict[str, dict]:
    with open(path) as fh:
        doc = json.load(fh)
    return doc.get("results", doc)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("old")
    p.add_argument("new")
    p.add_argument(
        "--flag",
        type=float,
        default=1.5,
        help="flag queries whose new/old wall ratio exceeds this",
    )
    p.add_argument(
        "--top",
        type=int,
        default=15,
        help="also print the N slowest queries in the new artifact",
    )
    args = p.parse_args(argv)

    old, new = load_results(args.old), load_results(args.new)

    def wall(rec):
        return rec.get("sec") if rec.get("err") is None else None

    both, transitions = [], []
    for name in sorted(set(old) | set(new)):
        ow = wall(old[name]) if name in old else None
        nw = wall(new[name]) if name in new else None
        if ow is not None and nw is not None:
            both.append((name, ow, nw, nw / ow if ow else float("inf")))
        else:
            o_state = (
                "absent" if name not in old else (old[name].get("err") or "ok")
            )
            n_state = (
                "absent" if name not in new else (new[name].get("err") or "ok")
            )
            transitions.append((name, o_state, n_state))

    regressions = [r for r in both if r[3] > args.flag]
    improvements = [r for r in both if r[3] < 1.0 / args.flag]

    tot_old = sum(r[1] for r in both)
    tot_new = sum(r[2] for r in both)
    print(
        f"{len(both)} queries timed in both artifacts: "
        f"Σ {tot_old:.1f}s -> {tot_new:.1f}s "
        f"({tot_new / tot_old:.2f}x)" if both else "no common timed queries"
    )

    def table(rows, title):
        if not rows:
            return
        print(f"\n{title}:")
        print(f"  {'query':<36} {'old s':>9} {'new s':>9} {'ratio':>7}")
        for name, ow, nw, ratio in sorted(rows, key=lambda r: -r[3]):
            print(f"  {name:<36} {ow:>9.1f} {nw:>9.1f} {ratio:>6.2f}x")

    table(regressions, f">{args.flag}x REGRESSIONS")
    table(
        sorted(improvements, key=lambda r: r[3])[: args.top],
        f">{args.flag}x improvements",
    )

    if args.top:
        slowest = sorted(both, key=lambda r: -r[2])[: args.top]
        print(f"\nslowest {len(slowest)} in {args.new}:")
        for name, ow, nw, ratio in slowest:
            print(f"  {name:<36} {nw:>9.1f}s  (was {ow:.1f}s, {ratio:.2f}x)")

    if transitions:
        print("\nstate transitions (not ratio'd):")
        for name, o_state, n_state in transitions:
            print(f"  {name:<36} {o_state} -> {n_state}")

    if regressions:
        print(
            f"\n{len(regressions)} regression(s) past {args.flag}x",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
