"""Plan-shape audit over EVERY registry entry (r12): build each query and
count the physical-plan features that matter at 100 TB — exchanges, scans,
join strategies, Python-boundary nodes, cartesian products, sort
aggregates. Flags anything with a CartesianProduct / BatchEvalPython /
row-UDF node. Usage: python scripts/audit_plans.py [sf_dir] [out_tsv]
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FEATURES = [
    # formatted-mode trees name the node bare ("+- Exchange (4)") and put
    # the partitioning in the details section, so match the node name,
    # excluding BroadcastExchange/ReusedExchange via the preceding space
    ("exchange", r"[-: ] Exchange \(\d"),
    ("bcast_exch", r"\bBroadcastExchange\b"),
    ("scan", r"\bScan parquet\b"),
    ("scan_rdd", r"\bScan ExistingRDD\b"),
    ("smj", r"\bSortMergeJoin\b"),
    ("shj", r"\bShuffledHashJoin\b"),
    ("bhj", r"\bBroadcastHashJoin\b"),
    ("bnlj", r"\bBroadcastNestedLoopJoin\b"),
    ("cartesian", r"\bCartesianProduct\b"),
    ("sort_agg", r"\bSortAggregate\b"),
    ("obj_agg", r"\bObjectHashAggregate\b"),
    ("window", r"\bWindow\b"),
    ("win_limit", r"\bWindowGroupLimit\b"),
    ("py_batch", r"\bBatchEvalPython\b"),
    ("py_arrow", r"\bArrowEvalPython\b"),
    ("py_map", r"\b(MapInArrow|MapInPandas|FlatMapGroupsInPandas)\b"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/plan_audit.tsv"
    import ltss_spark.plans as plans
    from ltss_spark.session import get_spark

    spark = get_spark("plan-audit")
    rows = []
    for q in plans.REGISTRY:
        try:
            df = q.build(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            tree = plan.split("\n\n", 1)[0]  # operator tree only, not details
            counts = {k: len(re.findall(rx, tree)) for k, rx in FEATURES}
            rows.append((q.name, counts, None))
        except Exception as e:  # noqa: BLE001
            rows.append((q.name, {}, f"{type(e).__name__}: {e}"))
    with open(out_path, "w") as f:
        f.write("name\t" + "\t".join(k for k, _ in FEATURES) + "\terr\n")
        for name, counts, err in rows:
            f.write(
                name + "\t"
                + "\t".join(str(counts.get(k, "")) for k, _ in FEATURES)
                + "\t" + (err or "") + "\n"
            )
    print(f"wrote {out_path} ({len(rows)} entries)")
    for name, counts, err in rows:
        if err:
            print(f"BUILD-ERR {name}: {err}")
        elif counts.get("cartesian") or counts.get("py_batch"):
            print(f"FLAG {name}: cartesian={counts.get('cartesian')} py_batch={counts.get('py_batch')}")


if __name__ == "__main__":
    main()
