"""Engine probe: Spark's default string ordering (UTF8_BINARY) is
UTF-8 BYTE order — identical to DuckDB's binary collation — including
the case that would diverge under Java's UTF-16 code-unit order.

Why this matters: java.lang.String.compareTo orders by UTF-16 code
units, where a supplementary-plane char (surrogates 0xD800-0xDFFF)
sorts BETWEEN U+D7FF and U+E000 — i.e. BEFORE U+E000..U+FFFF chars —
while UTF-8 byte order puts it AFTER (4-byte 0xF0.. > 3-byte 0xE...).
Spark SQL does NOT use String.compareTo: the UTF8String binary
comparison is byte order, so ORDER BY / row_number tie-breaks on raw
data strings agree with DuckDB even for emoji-vs-U+FFFD ties
(probed r12). This suite is the upgrade tripwire: if a PySpark bump
ever changes the default collation (e.g. session-level UTF8_LCASE or
ICU), these pins fire before a driver hash does.

``oov_rate``'s vocab tie-break uses md5(token) anyway — belt and
braces, and md5 hex order is engine-identical unconditionally — but
the FACT pinned here is that raw-string order would also have agreed.
"""

from __future__ import annotations

import duckdb

from pyspark.sql import Row, functions as F

# the hazard set: supplementary plane vs U+E000..U+FFFF (the UTF-16
# divergence case), shared prefixes, case, accents, digits, empty
HAZARD = [
    "z", "", "\u00e9", "\u00c1", "\ue000", "\ufffd", "\U0001F600",
    "a", "ab", "a\uffff", "a\U0001F600",
    "A", "0",
]


def _duck_order(key_expr: str) -> list[str]:
    con = duckdb.connect()
    vals = ", ".join("(?)" for _ in HAZARD)
    return [
        r[0]
        for r in con.execute(
            f"SELECT t FROM (VALUES {vals}) v(t) ORDER BY {key_expr}, t",
            HAZARD,
        ).fetchall()
    ]


def test_raw_string_order_is_utf8_byte_order_on_both_engines(spark):
    sdf = spark.createDataFrame([Row(t=x) for x in HAZARD])
    s = [r.t for r in sdf.orderBy("t").collect()]
    d = _duck_order("t")
    assert s == d
    # the decisive UTF-16-vs-UTF-8 witness: with a shared prefix, the
    # supplementary-plane char sorts AFTER U+FFFF in byte order (it
    # would sort BEFORE under UTF-16 code-unit comparison)
    assert s.index("a\uffff") < s.index("a\U0001F600")
    # python's str comparison is codepoint order == UTF-8 byte order
    assert s == sorted(HAZARD)


def test_md5_order_agrees_on_both_engines(spark):
    sdf = spark.createDataFrame([Row(t=x) for x in HAZARD])
    s = [r.t for r in sdf.orderBy(F.md5(F.col("t")), F.col("t")).collect()]
    d = _duck_order("md5(t)")
    assert s == d


def test_md5_hex_values_identical(spark):
    # md5 of the UTF-8 bytes, rendered lowercase hex — the foundation
    # of every seed-free hash in the operator library
    sdf = spark.createDataFrame([Row(t=x) for x in HAZARD if x])
    s = {r.t: r.h for r in sdf.select("t", F.md5(F.col("t")).alias("h")).collect()}
    con = duckdb.connect()
    for t, h in s.items():
        (dh,) = con.execute("SELECT md5(?)", [t]).fetchone()
        assert dh == h, t
