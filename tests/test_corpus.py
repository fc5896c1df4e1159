"""Corpus-management operators: semantics checks on handmade documents."""

import pyspark.sql.functions as F

from ltss_spark.operators.corpus import (
    contamination,
    hash_split,
    repetition_stats,
    stratified_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_contamination_bounds(spark):
    train = _docs(spark, [(1, "alpha beta gamma delta epsilon zeta", "en")])
    ev = _docs(
        spark,
        [
            (100, "alpha beta gamma delta epsilon zeta", "en"),  # fully contained
            (101, "one two three four five six seven", "en"),  # disjoint
        ],
    )
    got = {r["doc_id"]: r for r in contamination(train, ev, k=5).collect()}
    assert got[100]["containment"] == 1.0
    assert got[101]["containment"] == 0.0
    assert got[101]["n_contaminated"] == 0


def test_hash_split_deterministic_and_partitioned(spark):
    docs = spark.range(2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: (r["bucket"], r["split"]) for r in hash_split(docs).collect()}
    b = {r["doc_id"]: (r["bucket"], r["split"]) for r in hash_split(docs).collect()}
    assert a == b  # stable across runs
    from collections import Counter

    frac = Counter(s for _, s in a.values())
    assert 0.85 < frac["train"] / 2000 < 0.95
    assert all(0 <= bk < 100 for bk, _ in a.values())
    # split is a pure function of the id: a subset keeps its assignments
    sub = {r["doc_id"]: (r["bucket"], r["split"])
           for r in hash_split(docs.filter(F.col("doc_id") < 500)).collect()}
    assert all(a[k] == v for k, v in sub.items())


def test_stratified_sample_quota(spark):
    rows = [(i, f"text {i}", "en" if i < 30 else "fr") for i in range(40)]
    got = stratified_sample(_docs(spark, rows), fraction=0.2).collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r["lang"], []).append(r["sample_rank"])
    assert len(by_lang["en"]) == 6  # ceil(30 * .2)
    assert len(by_lang["fr"]) == 2  # ceil(10 * .2)
    assert sorted(by_lang["en"]) == list(range(1, 7))


def test_repetition_exact(spark):
    d = _docs(
        spark,
        [
            (1, "a b c a b c a b c", "en"),  # 7 grams, 3 distinct
            (2, "w x y z", "en"),  # 2 grams, 2 distinct
            (3, "one two", "en"),  # too short: dropped
        ],
    )
    got = {r["doc_id"]: r for r in repetition_stats(d, k=3).collect()}
    assert got[1]["n_grams"] == 7 and got[1]["n_distinct"] == 3
    assert got[1]["rep_ratio"] == round(1 - 3 / 7, 6)
    assert got[2]["rep_ratio"] == 0.0
    assert 3 not in got


def test_pii_redact_and_counts(spark):
    from ltss_spark.operators.text import pii_counts, pii_redact

    d = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "dial +1 555-123-4567 or 44 123-456-7890 x"),
            (3, "host 10.0.255.3 and 192.168.1.1"),
            (4, "nothing here"),
        ],
        "doc_id long, text string",
    )
    counts = pii_counts(F.col("text"))
    got = {
        r["doc_id"]: r
        for r in d.select(
            "doc_id",
            pii_redact(F.col("text")).alias("red"),
            *[c.alias(n) for n, c in counts.items()],
        ).collect()
    }
    assert got[1]["red"] == "mail [EMAIL] now" and got[1]["n_email"] == 1
    assert got[2]["red"] == "dial [PHONE] or [PHONE] x" and got[2]["n_phone"] == 2
    assert got[3]["red"] == "host [IP] and [IP]" and got[3]["n_ip"] == 2
    assert got[4]["red"] == "nothing here"
    assert all(got[4][k] == 0 for k in ("n_email", "n_phone", "n_ip"))
