"""Annotate a ×100 spark-only sweep artifact with row-count context
from the ×10 oracle-compare artifact (VERDICT r08 #3, the "monotone
counts vs ×10" invariant): each query entry gains ``rows_x10`` and
``rows_ratio``, and the artifact gains a ``rows_vs_x10`` summary
classifying queries as grown / fixed-size / SHRUNK (a shrink from 10×
the data is not automatically wrong — top-k and single-row audits are
fixed by construction — but an unexplained shrink is the highest-value
thing for a reviewer to eyeball, so they are listed by name).

Usage:
  python tools/scale_rows_note.py SWEEP_r09_scale_x100.json \
      SWEEP_r09_scale.json
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    x100_path, x10_path = sys.argv[1], sys.argv[2]
    with open(x100_path) as fh:
        x100 = json.load(fh)
    with open(x10_path) as fh:
        x10 = json.load(fh)
    ref = x10.get("results", x10)
    grew, fixed, shrank = [], [], []
    for name, rec in x100.get("results", {}).items():
        r10 = ref.get(name, {}).get("spark_rows")
        r100 = rec.get("spark_rows")
        if r10 is None or r100 is None:
            continue
        rec["rows_x10"] = r10
        rec["rows_ratio"] = round(r100 / r10, 3) if r10 else None
        if r100 > r10:
            grew.append(name)
        elif r100 == r10:
            fixed.append(name)
        else:
            shrank.append(name)
    x100["rows_vs_x10"] = {
        "ref_artifact": x10_path,
        "n_grew": len(grew),
        "n_fixed_size": len(fixed),
        "shrank": sorted(shrank),
    }
    with open(x100_path, "w") as fh:
        json.dump(x100, fh, indent=1)
    print(
        f"{x100_path}: {len(grew)} grew, {len(fixed)} fixed-size, "
        f"shrank={sorted(shrank)}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
