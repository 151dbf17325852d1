"""Engine-agreement probe for the \\x{...} codepoint-class regex
surface that script_mix depends on (r10).

Load-bearing facts pinned here (engine-probed before script_mix
landed):
- Java regex and DuckDB's RE2 both accept `\\x{HHHH}` codepoint
  escapes inside character classes and count range matches per
  CODEPOINT, astral plane included (an emoji is ONE match of a
  matching class and ONE unit of length()).
- Spark's length() and DuckDB's length() both count codepoints, so a
  class-count/length ratio is engine-identical.
- The explicit `[ \\t\\n\\r\\f]` whitespace class sidesteps the
  documented Java-vs-RE2 `\\s` divergence (Java \\s includes \\x0B,
  RE2's \\s does not in the same way) — VT must match NEITHER side of
  the explicit class.

If a container upgrade changes any of these, script_mix's oracle
splits — this suite fails loudly first (the test_agree_lower /
test_transcendental_probe tripwire pattern).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from kairos_spark.operators.text import SCRIPT_CLASSES

CASES = [
    "hello WORLD 123",
    "привет мир",
    "你好世界 カタカナ ひらがな 한국어",
    "مرحبا",
    "ελληνικά",
    "emoji 😀🚀 end",
    "tab\tnl\nvt\x0bff\x0ccr\r sp",
    "mixed Ж a 你 9 😀",
    "",
    "İstanbul ﬁ ß Σοφός",
    "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 astral letters",
]


@pytest.fixture(scope="module")
def counted(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], "id int, t string"
    )
    cols = [F.length("t").alias("len")] + [
        F.regexp_count("t", F.lit(p)).alias(name) for name, p in SCRIPT_CLASSES
    ]
    sp = {r["id"]: r.asDict() for r in df.select("id", *cols).collect()}
    con = duckdb.connect()
    duck = {}
    for i, t in enumerate(CASES):
        sel = "SELECT length($1) AS len, " + ", ".join(
            f"length(regexp_extract_all($1, '{p}')) AS {name}"
            for name, p in SCRIPT_CLASSES
        )
        duck[i] = dict(
            zip(["len"] + [n for n, _ in SCRIPT_CLASSES],
                con.execute(sel, [t]).fetchone())
        )
    return sp, duck


def test_script_classes_agree_per_codepoint(counted):
    sp, duck = counted
    for i in range(len(CASES)):
        got = {k: sp[i][k] for k in duck[i]}
        assert got == duck[i], (i, CASES[i])


def test_astral_chars_count_as_one(counted):
    sp, _ = counted
    # "emoji 😀🚀 end": 5 + 1 + 2 + 1 + 3 = 12 codepoints (each astral
    # emoji is ONE codepoint, not a surrogate pair)
    assert sp[5]["len"] == 12
    # mathematical fraktur letters are astral and NOT [A-Za-z]
    assert sp[10]["latin"] == len("astral letters") - 1  # minus the space...


def test_vt_outside_explicit_whitespace_class(counted):
    sp, duck = counted
    # "tab\tnl\nvt\x0bff\x0ccr\r sp": \t \n \f \r and one space match
    # the explicit class on BOTH engines; \x0B (VT) matches neither
    assert sp[6]["whitespace"] == duck[6]["whitespace"] == 5
