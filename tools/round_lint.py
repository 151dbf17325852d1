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

# F.round(F.avg(...) or F.round(F.sum(...) — capture through the end of
# the line; the scale literal (if on this line) is the last ", N)"
PATTERN = re.compile(r"F\.round\(\s*F\.(avg|sum)\(")
SCALE = re.compile(r",\s*([0-9]+)\s*\)")


def line_scale(text: str) -> int | None:
    """Best-effort scale literal from the matched line (None if the
    call spans lines — treated as scale 6, the conservative default)."""
    hits = SCALE.findall(text)
    return int(hits[-1]) if hits else None


def main() -> int:
    findings = []
    for path in sorted(ROOT.rglob("*.py")):
        lines = path.read_text().splitlines()
        for i, line in enumerate(lines):
            if line.lstrip().startswith("#") or not PATTERN.search(line):
                continue
            scale = line_scale(line)
            if scale is not None and scale < 6:
                continue
            if "decimal(" in line.lower():
                continue
            ctx = " ".join(lines[max(0, i - 6) : i]).lower()
            if "exempt" in ctx:
                continue
            findings.append(f"{path.relative_to(ROOT.parent)}:{i + 1}: {line.strip()}")
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
