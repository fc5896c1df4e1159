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


def test_incremental_dedup_semantics(spark):
    from ltss_spark.operators.corpus import incremental_dedup

    batch = _docs(
        spark,
        [
            (10, "brand new document text", "en"),
            (11, "brand new document text", "en"),  # intra-batch dup of 10
            (12, "already in the corpus", "en"),  # cross-corpus dup
            (13, "another fresh one", "en"),
        ],
    )
    seen = _docs(spark, [(1, "already in the corpus", "en")]).select(
        F.md5(
            F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
        ).alias("fp")
    )
    got = sorted(r["doc_id"] for r in incremental_dedup(batch, seen).collect())
    assert got == [10, 13]


def test_quality_filter_reasons(spark):
    from ltss_spark.operators.corpus import quality_filter

    long_good = " ".join(
        f"the word{i} and item{i} of thing{i}" for i in range(12)
    )  # >50 tokens, stopwords present, low repetition
    repetitive = " ".join(["the same thing again"] * 20)  # 80 tokens, 3-gram dups
    no_stop = " ".join(f"w{i}" for i in range(60))
    d = _docs(
        spark,
        [
            (1, long_good, "en"),
            (2, "tiny doc", "en"),
            (3, repetitive, "en"),
            (4, no_stop, "en"),
        ],
    )
    got = {r["doc_id"]: r for r in quality_filter(d).collect()}
    assert got[1]["reason"] == "kept" and got[1]["keep"]
    assert got[2]["reason"] == "too_short" and not got[2]["keep"]
    assert got[3]["reason"] == "repetitive"
    assert got[4]["reason"] == "no_stopwords"


def test_pack_sequences_invariants(spark):
    from ltss_spark.operators.corpus import pack_sequences

    rows = [(i, " ".join(f"t{i}_{j}" for j in range(40)), "en") for i in range(30)]
    got = pack_sequences(_docs(spark, rows), context_tokens=100).collect()
    assert len(got) == 30
    for r in got:
        assert 0 <= r["bin_offset"] < 100
        assert not r["oversize"]
    # bins fill in order: every bin id in [0, max] is used
    bins = sorted({r["bin_id"] for r in got})
    assert bins == list(range(bins[-1] + 1))
    # conservation: total tokens == 30 * 40, last bin partial
    assert sum(r["n_tokens"] for r in got) == 1200


def test_mixture_sample_quotas_and_stability(spark):
    """Quotas honored exactly when available, shortfall NOT redistributed,
    unlisted strata excluded, and growing one stratum never changes
    another stratum's selection."""
    from ltss_spark.operators.corpus import mixture_sample

    rows = [(i, "en" if i < 40 else ("de" if i < 46 else "xx")) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = mixture_sample(docs, {"en": 0.5, "de": 0.5}, total=20).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    assert len(by_lang["en"]) == 10          # full quota
    assert len(by_lang["de"]) == 6           # capped by availability
    assert "xx" not in by_lang               # unlisted stratum excluded
    # stability: add more 'de' docs; the 'en' selection must not move
    more = docs.union(
        spark.createDataFrame([(100 + i, "de") for i in range(20)], "doc_id long, lang string")
    )
    out2 = mixture_sample(more, {"en": 0.5, "de": 0.5}, total=20).collect()
    en2 = {r["doc_id"] for r in out2 if r["lang"] == "en"}
    assert en2 == by_lang["en"]
    assert len([r for r in out2 if r["lang"] == "de"]) == 10  # now fillable


def test_shuffle_shard_properties(spark):
    """The training-order assignment: (a) every doc appears exactly once,
    (b) positions within a shard are 1..|shard| dense, (c) the assignment
    is deterministic across invocations, (d) a different seed produces a
    genuinely different permutation (epoch reshuffle), and (e) the order
    is decorrelated from doc_id order (the whole point)."""
    from ltss_spark.operators.corpus import shuffle_shard
    from ltss_spark.sources.batch import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    n = docs.count()
    out = shuffle_shard(docs, n_shards=4).collect()
    assert len(out) == n and len({r["id"] for r in out}) == n

    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos_in_shard"])
    assert set(by_shard) == {0, 1, 2, 3}
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # binomial balance: no shard wildly off n/4
    sizes = [len(v) for v in by_shard.values()]
    assert max(sizes) < 2 * n / 4 and min(sizes) > n / 8

    again = shuffle_shard(docs, n_shards=4).collect()
    assert {(r["id"], r["shard"], r["pos_in_shard"]) for r in again} == {
        (r["id"], r["shard"], r["pos_in_shard"]) for r in out
    }

    epoch2 = shuffle_shard(docs, n_shards=4, seed="epoch2").collect()
    same = sum(
        1
        for a, b in zip(
            sorted(out, key=lambda r: r["id"]),
            sorted(epoch2, key=lambda r: r["id"]),
        )
        if (a["shard"], a["pos_in_shard"]) == (b["shard"], b["pos_in_shard"])
    )
    assert same < n * 0.05, "epoch reseed must give an independent permutation"

    # decorrelation: within shard 0, consecutive positions should not be
    # consecutive doc_ids (source order broken)
    s0 = sorted(
        (r for r in out if r["shard"] == 0), key=lambda r: r["pos_in_shard"]
    )
    adjacent = sum(
        1 for a, b in zip(s0, s0[1:]) if abs(a["id"] - b["id"]) == 1
    )
    assert adjacent < len(s0) * 0.05
