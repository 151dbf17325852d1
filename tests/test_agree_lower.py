"""Engine-agreement lock for text.agree_lower.

Java (what Spark's lower() executes) implements the full Unicode
SpecialCasing rules: U+0130 İ lowercases to "i" + combining dot
U+0307 (string GROWS), and Σ maps context-sensitively to final ς.
DuckDB's utf8proc applies the one-to-one simple mapping (İ→i, Σ→σ
always). agree_lower pre-translates the two hazard code points to
their simple-mapped forms so Spark's output is byte-identical to
DuckDB's plain lower(text) — these tests pin that agreement over a
hazard battery and assert plain F.lower actually diverges (so the
guard stays load-bearing: if a Spark upgrade changes lower()
semantics, the divergence assertion fails and the helper gets
re-audited).
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from kairos_spark.operators.text import agree_lower

HAZARDS = [
    "İ",                       # SpecialCasing expansion (i + U+0307)
    "İstanbul İZMİR İİİ",
    "ΟΔΥΣΣΕΥΣ",                # word-final Σ → ς (Java) vs σ (DuckDB)
    "ΑΣ ΣΑ Σ",                 # final and non-final sigma contexts
    "ΣΙΣΥΦΟΣ the stone",
    "weiß Straße ẞ ß",         # sharp s (lower is identity both ways)
    "oﬃce ﬁne ﬂow stuﬀ",       # ligatures (lower is identity)
    "i̇ pre-dotted",            # U+0307 already present in input
    "µ micro μ mu",            # micro sign / Greek mu
    "MIXED Ascii And Ünïcödé", # plain diacritics (agree already)
    "ÀÈÌÒÙ ÇĞŞÅÄÖ",
    "ЖЩФЫВ КИРИЛЛИЦА",         # Cyrillic
    "plain ascii stays put",
    "",
]


def test_agree_lower_matches_duckdb_lower(spark):
    sdf = spark.createDataFrame([(h,) for h in HAZARDS], "s string").select(
        "s", agree_lower(F.col("s")).alias("lo")
    )
    got = {r["s"]: r["lo"] for r in sdf.collect()}
    con = duckdb.connect()
    for h in HAZARDS:
        want = con.execute("SELECT lower(?)", [h]).fetchone()[0]
        assert got[h] == want, (h.encode("unicode_escape"), got[h], want)


def test_plain_lower_still_diverges(spark):
    """The guard is load-bearing: plain F.lower disagrees with DuckDB
    on the two hazard classes. If this ever starts passing with plain
    lower, Spark changed case semantics — re-audit agree_lower."""
    rows = (
        spark.createDataFrame([("İ",), ("ΑΣ",)], "s string")
        .select("s", F.lower("s").alias("lo"))
        .collect()
    )
    got = {r["s"]: r["lo"] for r in rows}
    con = duckdb.connect()
    assert got["İ"] != con.execute("SELECT lower('İ')").fetchone()[0]
    assert got["ΑΣ"] != con.execute("SELECT lower('ΑΣ')").fetchone()[0]


def test_ascii_translate_upper_matches(spark):
    """The recasing used by q_normalize_dedup: ASCII-only translate is
    codepoint-1:1 in both engines, immune to SpecialCasing expansions
    (ß→SS, ﬁ→FI) that full upper() applies only in Java."""
    lo = "abcdefghijklmnopqrstuvwxyz"
    up = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    texts = ["weiß ﬁne case", "İstanbul σς", "plain text 123"]
    sdf = spark.createDataFrame([(t,) for t in texts], "s string").select(
        "s", F.translate(F.col("s"), lo, up).alias("u")
    )
    got = {r["s"]: r["u"] for r in sdf.collect()}
    con = duckdb.connect()
    for t in texts:
        want = con.execute(f"SELECT translate(?, '{lo}', '{up}')", [t]).fetchone()[0]
        assert got[t] == want, (t, got[t], want)
