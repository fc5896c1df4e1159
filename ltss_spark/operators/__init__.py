from ltss_spark.operators.asof import asof_join, asof_join_forward  # noqa: F401
from ltss_spark.operators.dedup import (  # noqa: F401
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from ltss_spark.operators.gapfill import (  # noqa: F401
    time_bucket_gapfill,
    time_bucket_interpolate,
)
from ltss_spark.operators.geo import haversine_km, in_bbox  # noqa: F401
from ltss_spark.operators.similarity import (  # noqa: F401
    cosine_topk,
    cosine_topk_ivf,
    cosine_topk_lsh,
    embedding_dup_pairs,
    kmeans_refine_codebook,
    knn_join,
    stride_codebook,
)
from ltss_spark.operators.skew import (  # noqa: F401
    salted_two_phase_agg,
    skew_safe_distinct_count,
)
from ltss_spark.operators.timeseries import (  # noqa: F401
    entity_range_scan,
    latest_state,
    time_bucket_agg,
    time_in_state,
)
from ltss_spark.operators.corpus import (  # noqa: F401
    contamination,
    hash_split,
    incremental_dedup,
    pack_sequences,
    quality_filter,
    repetition_stats,
    stratified_sample,
)
from ltss_spark.operators.graph import (  # noqa: F401
    connected_components,
    dedup_clusters,
)
from ltss_spark.operators.rank import distributed_row_number  # noqa: F401
from ltss_spark.operators.text import pii_counts, pii_redact  # noqa: F401
from ltss_spark.operators.timeseries import ohlc  # noqa: F401
from ltss_spark.operators.compress import (  # noqa: F401
    compress_states,
    decompress_states,
)
from ltss_spark.operators.corpus import mixture_sample  # noqa: F401
from ltss_spark.operators.similarity import cosine_topk_ivfpq, cosine_topk_pq  # noqa: F401
from ltss_spark.operators.cagg import read_rollup, refresh_rollup  # noqa: F401
from ltss_spark.operators.dedup import duplicate_span_stats  # noqa: F401
from ltss_spark.operators.geo import bbox_spatial_join  # noqa: F401
from ltss_spark.operators.skew import salted_join  # noqa: F401
from ltss_spark.operators.text import tfidf_topk, unigram_logprob  # noqa: F401
from ltss_spark.operators.timeseries import sessionize  # noqa: F401
from ltss_spark.operators.cdc import cdc_apply, cdc_compact, cdc_read  # noqa: F401
from ltss_spark.operators.corpus import importance_resample, vocab_encode  # noqa: F401
from ltss_spark.operators.runtime_filter import with_runtime_bloom  # noqa: F401
from ltss_spark.operators.skew import key_skew_profile  # noqa: F401
from ltss_spark.operators.snapshot import (  # noqa: F401
    commit as snapshot_commit,
    expire as snapshot_expire,
    make_snapshot_sink,
    read_changes,
    read_version,
    rollback as snapshot_rollback,
)
