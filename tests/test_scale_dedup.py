"""Planted-pair recall at amplified scale: generate a synthetic corpus 10x
the sf0.001 documents table with KNOWN near-duplicates planted (small token
mutations) and verify the banded dedup operators find them — measured
recall against ground truth, not just oracle parity on whatever pairs the
fixtures happen to contain."""

import random

import pyspark.sql.functions as F


def _corpus(spark, n_base=400, n_dups=80, seed=17):
    """n_base independent docs + n_dups mutated copies (1-2 token edits on
    ~60-token docs => Jaccard ~0.9, SimHash hamming small). Returns (df,
    ground-truth near-dup pairs {(orig_id, dup_id)})."""
    rng = random.Random(seed)
    vocab = [f"tok{i}" for i in range(5000)]
    rows, truth = [], set()
    for i in range(n_base):
        rows.append((i, " ".join(rng.choices(vocab, k=60))))
    for j in range(n_dups):
        orig = rng.randrange(n_base)
        toks = rows[orig][1].split()
        for _ in range(rng.randrange(1, 3)):
            toks[rng.randrange(len(toks))] = rng.choice(vocab)
        dup_id = n_base + j
        rows.append((dup_id, " ".join(toks)))
        truth.add((orig, dup_id))
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    return df, truth


def test_minhash_recall_on_planted_dups(spark):
    from ltss_spark.operators.dedup import minhash_lsh_pairs

    docs, truth = _corpus(spark)
    found = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(docs).collect()}
    hits = sum(1 for p in truth if p in found)
    recall = hits / len(truth)
    # 12 hashes/4 bands, j~0.85-0.95: P(candidate) = 1-(1-j^3)^4 >= 0.95
    assert recall >= 0.85, f"minhash recall {recall:.2f} on planted near-dups"
    # precision guard: bogus pairs (neither endpoint planted) must be rare —
    # random 60-token docs over a 5000-token vocab share almost no shingles
    planted_ids = {b for _, b in truth}
    bogus = [p for p in found if p not in truth and p[1] not in planted_ids and p[0] not in planted_ids]
    assert len(bogus) <= len(found) * 0.1, f"{len(bogus)} bogus pairs of {len(found)}"


def test_simhash_recall_on_planted_dups(spark):
    from ltss_spark.operators.dedup import simhash_pairs

    docs, truth = _corpus(spark)
    # 1-2 token flips over ~60 distinct tokens flip few fingerprint bits;
    # hamming budget 6 with 48 bits / 7 bands keeps the pigeonhole guarantee
    found = {
        (r.doc_a, r.doc_b)
        for r in simhash_pairs(docs, bits=48, max_hamming=6).collect()
    }
    hits = sum(1 for p in truth if p in found)
    recall = hits / len(truth)
    assert recall >= 0.8, f"simhash recall {recall:.2f} on planted near-dups"


def test_exact_dedup_finds_planted_exact_copies(spark):
    from ltss_spark.operators.dedup import exact_dedup_groups

    docs, _ = _corpus(spark, n_dups=0)
    clones = docs.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text"
    )
    all_docs = docs.unionByName(clones)
    groups = exact_dedup_groups(all_docs).filter(F.col("n_dups") > 1)
    assert groups.count() == 50
    # canonical id is always the original (min doc_id)
    assert groups.filter(F.col("canonical_id") >= 10_000).count() == 0
