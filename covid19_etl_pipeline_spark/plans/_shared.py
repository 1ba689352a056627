"""Oracle-SQL fragments and helpers shared by multiple query-family
modules (kept in exact lockstep with the operator-package
expressions they mirror — see each helper's comment).
"""

from __future__ import annotations



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
