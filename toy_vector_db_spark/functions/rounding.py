"""Cross-engine-stable rounding.

Spark's ``round()`` renders the double as a decimal string and applies
HALF_UP; DuckDB rounds the binary double. For values whose decimal
rendering terminates exactly on a half at the rounding digit (money sums,
integer-over-integer ratios with 2/5-smooth denominators, microsecond
divisions) the two produce different results and break the oracle value
hash — observed in practice on an events gap of 399807.10295 s.

Fix: round with ``floor(x·10ⁿ + 0.5)/10ⁿ`` evaluated as plain IEEE double
arithmetic in BOTH engines — bit-identical inputs give bit-identical
outputs, no decimal rendering involved. (Half-values round toward +∞;
consistency across engines is what matters, not the tie direction.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rnd(c: Column | str, n: int) -> Column:
    if isinstance(c, str):
        c = F.col(c)
    s = 10**n
    return F.floor(c * s + F.lit(0.5)) / s


def sql_rnd(expr: str, n: int) -> str:
    s = 10**n
    return f"(floor(({expr}) * {s} + 0.5) / {s})"


def stabilize_sql_rounding(sql: str) -> str:
    """Rewrite every ``round(expr, n)`` call in an oracle SQL string into
    the floor form above. Single rewrite point so every registered oracle
    gets the stable rounding regardless of how its SQL was authored."""
    out = sql
    search_from = 0
    while True:
        pos = _find_round(out, search_from)
        if pos is None:
            return out
        start, open_paren = pos
        depth = 0
        i = open_paren
        last_comma = -1
        while i < len(out):
            ch = out[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            elif ch == "," and depth == 1:
                last_comma = i
            i += 1
        if depth != 0:
            raise ValueError(
                f"unbalanced round() in oracle SQL near: {out[start:start+80]!r}"
            )
        if last_comma < 0:
            # single-argument round(x) = round-to-integer (the prefix-split
            # cut); halves agree across engines for positives — leave as-is
            search_from = open_paren
            continue
        expr = out[open_paren + 1:last_comma]
        n = int(out[last_comma + 1:i].strip())
        out = out[:start] + sql_rnd(expr, n) + out[i + 1:]
        search_from = 0


def _find_round(s: str, idx: int = 0) -> tuple[int, int] | None:
    """Locate the next bare ``round(`` token (not part of a longer
    identifier) at or after idx; returns (token_start, open_paren_index)."""
    while True:
        j = s.find("round(", idx)
        if j < 0:
            return None
        prev = s[j - 1] if j > 0 else " "
        if not (prev.isalnum() or prev == "_"):
            return j, j + len("round(") - 1
        idx = j + 1


def PY_ROUND(x: float, n: int) -> float:
    """Kernel/driver-side twin of ``rnd()``: floor(x·10ⁿ + 0.5)/10ⁿ in
    plain IEEE double arithmetic. math.floor of a double and Spark's
    FLOOR produce the same integral value, and the final divide is the
    same double op on the same operands — bit-identical for the
    magnitudes this engine rounds (|x·10ⁿ| ≪ 2⁵³)."""
    import math

    s = 10 ** n
    return math.floor(x * s + 0.5) / s
