"""Fail if any SURVEY.md §2.C op-id lacks coverage in the registry —
either as a queries() key or cited in an entry's survey tag. Run:
python scripts/check_survey_coverage.py"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: the complete §2.C build-contract inventory (SURVEY.md)
SURVEY_2C = """
scan_parquet scan_stream sink_append sink_partitioned
project filter_basic filter_entity filter_null filter_in filter_like
join_inner join_left join_right join_full join_semi join_anti
join_broadcast join_theta join_range join_asof
agg_basic agg_distinct agg_groupsets agg_minmax_by agg_first_last
win_rank win_lag_lead win_frame win_cumulative
sort limit topk_group
set_union set_intersect set_except
fn_string fn_date fn_math fn_array fn_map fn_json
stream_ingest stream_watermark stream_window_tumbling
stream_window_sliding stream_window_session stream_dedup
stream_stateful stream_late_drop
udf_scalar udaf udtf
ext_dedup_exact ext_dedup_near ext_sim_search ext_text_stats
ext_multimodal geo_distance ts_gapfill
""".split()


def missing_op_ids() -> list[str]:
    import ltss_spark.plans as plans

    keys = {q.name for q in plans.REGISTRY}
    tags = " ".join(q.survey for q in plans.REGISTRY) + " " + " ".join(keys)
    return [i for i in SURVEY_2C if i not in keys and i not in tags]


def main() -> None:
    import ltss_spark.plans as plans

    miss = missing_op_ids()
    if miss:
        print(f"MISSING §2.C coverage: {miss}")
        raise SystemExit(1)
    n = len(plans.REGISTRY)
    s = sum(1 for q in plans.REGISTRY if q.oracle)
    print(
        f"all {len(SURVEY_2C)} SURVEY §2.C op-ids covered by "
        f"{n} registry entries ({s} oracle-checked)"
    )


if __name__ == "__main__":
    main()
