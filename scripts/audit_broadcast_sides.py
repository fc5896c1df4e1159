"""Audit every registered batch plan for broadcast BUILD sides fed by a
raw checkpoint scan — the planner hazard the 16x NB probe caught
(docs/PLANS.md "guard strategy pinning"): a localCheckpoint is a
LogicalRDD whose statistics descend from width-ratio projections of the
original plan, and a tokenize-explode pipeline's estimate can sit ~100x
under its true size. A STATIC BroadcastHashJoin build decision made on
such an estimate executes the broadcast directly (no map stage for AQE
to re-measure), so a corpus-sized build side becomes a driver-built
hash relation — slow at probe scale, a driver OOM at cluster scale.

For each BroadcastHashJoin / BroadcastNestedLoopJoin in each entry's
pre-AQE physical plan, this walks the BUILD side's subtree: a
`Scan ExistingRDD` with no bounding operator (aggregate / limit) in
between means raw checkpointed rows are being built. Hits are printed
with the entry name for manual triage — a hit is not automatically a
bug (the nb model and the guard's measured-small vocab frames are
bounded by construction and INTENTIONALLY broadcast), but every hit
should be explainable by a bound the code enforces.

Usage: python scripts/audit_broadcast_sides.py [sf_dir]

Baseline triage (r10, 14 hits, all explained — a NEW name appearing
here needs the same treatment). Re-run r11 after the Generate/Expand
bounded-state fix (ADVICE r10): identical 14 hits — no registry plan
has an exploded-aggregate build side, so the fix strengthened the
guarantee without changing the triage list:
- a checkpoint HIDES the aggregate inside it, so a checkpointed
  aggregate flags as raw rows: ts_gapfill / ts_interpolate build the
  checkpointed (key, bucket) AGGREGATE (LeftOuter right side — the only
  legal build side, flips to SMJ as estimates grow); ext_dedup_minhash
  / _verified / _ngram — and, from r11, _containment (same checkpointed
  shingle frame and unhinted sizes joins as _ngram; 15 hits total now) —
  build the checkpointed signature/shingle-derived
  frames (bands x |docs| rows by design, probed linear to 32x);
- measured-small pins (the guard / pmi's driver-fetched vocab size):
  ext_tfidf, ext_unigram_lm, ext_bigram_lm, ext_pmi (x2) — these pins
  flip to explicit sort-merge above the measured cut;
- bounded-by-construction intentional broadcasts: ext_nb_score /
  ext_nb_confusion (O(V x C) model; broadcast_model=False is the
  guarded escape), ext_bpe_encode (one-row-per-word dictionary,
  LeftOuter so the corpus side can never be built).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: streaming/side-effecting entries (same skip set as the plan audit)
SKIP = {
    "stream_ingest", "scan_stream", "stream_window_tumbling",
    "stream_window_sliding", "stream_window_session", "stream_dedup",
    "stream_stateful", "stream_late_drop", "sink_partitioned",
    "sink_append", "ddl_migrate",
}

#: operators bounding a subtree's cardinality — a build side behind one
#: of these is aggregate-or-limit sized, not corpus-sized
BOUNDING = (
    "HashAggregate", "SortAggregate", "ObjectHashAggregate",
    "TakeOrdered", "CollectLimit", "GlobalLimit",
)


def _children(node):
    seq = node.children()
    return [seq.apply(i) for i in range(seq.size())]


def _has_raw_rdd_scan(node, expanded: bool = False) -> bool:
    """``expanded`` flips when a Generate/Expand sits between the build
    root and a bounding operator: an explode above an aggregate
    re-expands cardinality, so that aggregate no longer bounds the build
    side's OUTPUT and must not stop the walk (ADVICE r10 — the previous
    version reported an exploded-aggregate build side as safe). An
    aggregate ABOVE the Generate still bounds and still stops."""
    name = node.nodeName()
    if not expanded and any(k in name for k in BOUNDING):
        return False
    if "ExistingRDD" in name:
        return True
    if "Generate" in name or "Expand" in name:
        expanded = True
    return any(_has_raw_rdd_scan(c, expanded) for c in _children(node))


def _visit(node, qname: str, hits: list) -> None:
    name = node.nodeName()
    if "BroadcastHashJoin" in name or "BroadcastNestedLoopJoin" in name:
        build = node.buildSide().toString()
        ch = _children(node)
        built = ch[0] if build == "BuildLeft" else ch[1]
        if _has_raw_rdd_scan(built):
            hits.append((qname, name, build))
    for c in _children(node):
        _visit(c, qname, hits)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import ltss_spark.plans as plans
    from ltss_spark.session import get_spark

    spark = get_spark("bcast-audit", shuffle_partitions=8)
    hits: list = []
    for q in plans.REGISTRY:
        if q.name in SKIP:
            continue
        try:
            _visit(
                q.build(spark, sf_dir)._jdf.queryExecution().sparkPlan(),
                q.name,
                hits,
            )
        except Exception as e:  # noqa: BLE001
            hits.append((q.name, f"ERR {type(e).__name__}", str(e)[:60]))
    for h in hits:
        print(h)
    print(f"{len(hits)} broadcast-of-checkpointed-rows sites (triage list)")


if __name__ == "__main__":
    main()
