"""Mechanical lint for the exact-rational rounding invariant.

CLAUDE.md forbids bare ``F.round`` over an aggregate whose value can be
an exact rational (count ratios, means of fixed-decimal inputs): such
values land EXACTLY on 7th-decimal midpoints where Spark's
shortest-string round and DuckDB's multiply-round split (the class that
flipped chao1_richness in r6 and threatened bootstrap_ci_mean /
ts_series_transforms_hour in r7/r8). Ratios must go through the
``_round6_ratio*`` family, fixed points through ``_round6_bridge``.

This lint flags every ``F.round(F.avg(...)`` / ``F.round(F.sum(...)``
site in the operator library and query layer. A site passes if:

- the round SCALE is < 6 (the monetary round-2/round-4 class: inputs
  are >= 2dp-fixed, so the rounded digit position has no midpoint), or
- the rounded expression is already DECIMAL-quantized on the same line
  (``decimal(`` in the match — exact HALF_UP on identical decimals), or
- a comment within the 6 preceding lines contains the word ``exempt``
  (the annotation convention: state WHY — full-precision doubles,
  6dp-exact identity, etc. — so the next sweep stays mechanical).

Everything else is a finding and the exit code is 1. Run it whenever a
new query or operator lands; the oracle twin follows the Spark side by
the mirror invariant, so linting the Spark side suffices.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent / "kairos_spark"

# F.round(F.avg(...) or F.round(F.sum(...) — matched against the WHOLE
# file text so the call style where the aggregate sits on the line after
# F.round( (exactly the multi-line shape the old post_stratified_mean
# bug had) is not silently skipped (ADVICE r8). \s spans newlines.
PATTERN = re.compile(r"F\.round\(\s*F\.(avg|sum)\(")
# ADVICE r9 closed a second hole: bare F.round over percentile() — the
# interpolated percentile of exact-rational inputs (integer-µs
# latencies/gaps, exact slope rationals) is itself an exact rational
# and lands on 7th-decimal midpoints exactly like a count ratio
# (conversion_latency's p50 carried this latently until r10). Every
# F.round whose balanced extent contains percentile( is now a finding
# under the same exemption rules.
PCT = re.compile(r"F\.round\(")
SCALE = re.compile(r",\s*([0-9]+)\s*\)\s*$")


def call_extent(text: str, start: int) -> str:
    """The full F.round(...) call from `start`: balance parens from the
    first '(' (string literals with parens don't occur at these sites;
    on imbalance, fall back to the rest of the file — conservative)."""
    i = text.index("(", start)
    depth = 0
    for j in range(i, len(text)):
        if text[j] == "(":
            depth += 1
        elif text[j] == ")":
            depth -= 1
            if depth == 0:
                return text[start : j + 1]
    return text[start:]


def call_scale(call: str) -> int | None:
    """Scale literal of the round call: the trailing ', N)' of the
    balanced extent (None when the scale is omitted or non-literal —
    treated as scale 6, the conservative default)."""
    hit = SCALE.search(call)
    return int(hit.group(1)) if hit else None


def main() -> int:
    findings = []
    for path in sorted(ROOT.rglob("*.py")):
        text = path.read_text()
        lines = text.splitlines()
        hits = {m.start(): m for m in PATTERN.finditer(text)}
        for m in PCT.finditer(text):
            if m.start() in hits:
                continue
            if "percentile" in call_extent(text, m.start()):
                hits[m.start()] = m
        for start in sorted(hits):
            m = hits[start]
            lineno = text.count("\n", 0, m.start()) + 1
            if lines[lineno - 1].lstrip().startswith("#"):
                continue
            call = call_extent(text, m.start())
            scale = call_scale(call)
            if scale is not None and scale < 6:
                continue
            # DECIMAL-routed is only safe when the ROUNDED expression is
            # still a decimal: round(sum(decimal), 6) is HALF_UP on
            # identical decimals in both engines. If the call also casts
            # to double (sum(decimal)->double / n — a derived MEAN), the
            # round is back on a double quotient, the exact midpoint
            # class impute_median/winsorize carried latently until r9.
            if "decimal(" in call.lower() and "double" not in call.lower():
                continue
            ctx = " ".join(lines[max(0, lineno - 7) : lineno - 1]).lower()
            if "exempt" in ctx:
                continue
            findings.append(
                f"{path.relative_to(ROOT.parent)}:{lineno}: "
                f"{lines[lineno - 1].strip()}"
            )
    if findings:
        print("round_lint: UNEXPLAINED F.round-over-aggregate sites "
              "(route exact rationals through _round6_ratio*, or add an "
              "'exempt' comment with the reason within 6 lines above):")
        for f in findings:
            print(" ", f)
        return 1
    print("round_lint: clean — every F.round(F.avg|F.sum) site is "
          "scale<6, DECIMAL-routed, or carries an exempt annotation")
    return 0


if __name__ == "__main__":
    sys.exit(main())
