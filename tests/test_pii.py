"""PII detect/redact operator tests (operators/pii.py)."""

import pytest
from pyspark.sql import functions as F

from kairos_spark.operators import pii


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "plain text with no identifiers at all", "a"),
        (1, "mail me at jo.user+tag@sub.example.org thanks", "a"),
        (2, "server at 192.168.001.1 and 10.0.0.255 responded", "b"),
        (3, "call 415-555-0123 or 415.555.0124 today", "b"),
        (4, "ssn on file: 078-05-1120", "b"),
        (5, "mixed jo@ex.io from 8.8.8.8 call 212-555-0199 ssn 078-05-1120", "c"),
        (6, "not-pii: 1.2 versions, 12-34, user@@double, 1234-555-0123x", "c"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def _stats(docs):
    out = pii.pii_stats(docs).orderBy("doc_id").collect()
    return {r["doc_id"]: r.asDict() for r in out}


def test_counts_per_family(docs):
    s = _stats(docs)
    assert s[0]["n_pii"] == 0
    assert s[1]["n_email"] == 1 and s[1]["n_pii"] == 1
    assert s[2]["n_ipv4"] == 2
    assert s[3]["n_phone"] == 2  # dash and dot separators
    assert s[4]["n_ssn"] == 1 and s[4]["n_phone"] == 0  # 3-2-4 is not phone-shaped
    assert s[5]["n_email"] == s[5]["n_ipv4"] == s[5]["n_phone"] == s[5]["n_ssn"] == 1
    assert s[5]["n_pii"] == 4


def test_near_misses_stay_clean(docs):
    s = _stats(docs)
    # version numbers, short digit groups, double-@, 4-digit prefix:
    # none of the families may fire
    assert s[6]["n_pii"] == 0
    assert s[6]["chars_removed"] == 0


def test_redact_replaces_with_tokens(docs):
    red = {
        r["doc_id"]: r["text"]
        for r in pii.pii_redact(docs).orderBy("doc_id").collect()
    }
    assert red[0] == "plain text with no identifiers at all"
    assert red[1] == "mail me at <EMAIL> thanks"
    assert red[2] == "server at <IP> and <IP> responded"
    assert red[3] == "call <PHONE> or <PHONE> today"
    assert red[4] == "ssn on file: <SSN>"
    assert red[5] == "mixed <EMAIL> from <IP> call <PHONE> ssn <SSN>"


def test_chars_removed_matches_length_delta(docs):
    s = _stats(docs)
    red = {
        r["doc_id"]: r["text"]
        for r in pii.pii_redact(docs).orderBy("doc_id").collect()
    }
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    for i in orig:
        assert s[i]["chars_removed"] == len(orig[i]) - len(red[i])


def test_keep_columns_pass_through(docs):
    out = pii.pii_stats(docs, keep=("source",))
    assert "source" in out.columns
    agg = out.groupBy("source").agg(F.sum("n_pii").alias("n")).collect()
    assert {r["source"]: r["n"] for r in agg} == {"a": 1, "b": 5, "c": 4}


def test_l_diversity_homogeneous_class_detected(spark):
    from pyspark.sql import Row

    from kairos_spark.operators.pii import l_diversity

    rows = (
        # class (A, 1): 3 records, all sensitive 's1' -> l = 1
        [Row(seg="A", nat=1, sens="s1")] * 3
        # class (B, 2): 4 records, two values -> l = 2
        + [Row(seg="B", nat=2, sens="s1")] * 2
        + [Row(seg="B", nat=2, sens="s2")] * 2
    )
    df = spark.createDataFrame(rows)
    out = {(r.seg, r.nat): r for r in
           l_diversity(df, ["seg", "nat"], "sens", [2, 3]).collect()}
    a = out[("A", 1)]
    assert a.l_distinct == 1 and a.class_size == 3 and a.min_l == 1
    # 3 of 7 records sit in classes with l < 2; all 7 have l < 3
    assert a.pct_lt_2 == round(3 / 7, 6) and a.pct_lt_3 == 1.0
    b = out[("B", 2)]
    assert b.l_distinct == 2 and b.min_l == 1


def test_l_diversity_fully_diverse(spark):
    from pyspark.sql import Row

    from kairos_spark.operators.pii import l_diversity

    rows = [Row(seg="A", nat=1, sens=f"v{i}") for i in range(4)]
    (r,) = l_diversity(
        spark.createDataFrame(rows), ["seg", "nat"], "sens", [2]
    ).collect()
    assert r.l_distinct == 4 and r.min_l == 4 and r.pct_lt_2 == 0.0
