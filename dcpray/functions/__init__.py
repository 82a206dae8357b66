"""Training-data operator library.

Each module documents its 100-TB scale shape (what shuffles, what
broadcasts, where the partitioning assumption lives). Everything here
is a composition of ``map_batches`` / coarse-partition ``groupby`` over
Arrow batches — no driver-side loops, no per-row Python in hot paths.
"""

from dcpray.functions.agg import (
    approx_distinct_count,
    approx_topk,
    add_coarse_pk,
    coarse_groupby,
    corr_per_group,
    describe,
    cube,
    distinct_count,
    exact_quantiles,
    explode,
    grouping_sets,
    histogram,
    melt,
    pivot,
    quantiles_per_group,
    rollup,
    topk_global,
    topk_per_group,
)
from dcpray.functions.setops import (
    except_distinct,
    intersect_distinct,
    union_distinct,
)
from dcpray.functions.boilerplate import remove_repeated_paragraphs
from dcpray.functions.ann import (
    build_ivf_index,
    ivf_query,
    ivf_topk,
    knn_self_join,
    knn_self_join_ivf,
    topk_cosine,
)
from dcpray.functions.decontam import (
    exact_contamination,
    ngram_contamination,
)
from dcpray.functions.history import (
    lake_diff,
    read_changefeed,
    table_diff,
    version_history,
    wal_version_history,
    write_changefeed,
)
from dcpray.functions.dedup import (
    cluster_pairs,
    cluster_pairs_distributed,
    embedding_dup_pairs,
    embedding_exact_pairs,
    exact_dedup,
    minhash_dedup,
    minhash_dup_pairs,
    ngram_jaccard_exact_pairs,
    simhash_dup_pairs,
)
from dcpray.functions.join import (
    asof_join,
    asof_join_broadcast,
    broadcast_join,
    hash_join,
    hash_join_skew,
    range_join,
    range_join_broadcast,
)
from dcpray.functions.kmeans import kmeans_assign, kmeans_fit
from dcpray.functions.sample import (
    bernoulli_sample,
    hash_sample,
    hash_split,
    stratified_sample,
)
from dcpray.functions.textprep import (
    assemble_groups,
    pack_sequences,
    chunk_text,
    extract_json_field,
    doc_term_counts,
    encode_tokens,
    normalize_text,
    scrub_pii,
    tfidf_top_terms,
    top_terms,
)
from dcpray.functions.textstats import (
    LangId,
    QualityScorer,
    fingerprint,
    fingerprint_md5,
    lang_id_batch,
    quality_score_batch,
    ngram_repetition_stats,
    repetition_stats,
    text_stats,
    token_count,
    token_count_bpe,
)
from dcpray.functions.window import (
    forward_fill,
    percent_rank_global,
    hopping_window,
    lag_lead,
    ntile_in_group,
    rank_in_group,
    rolling_agg,
    rolling_agg_range,
    session_stats,
    sessionize,
)

__all__ = [
    "add_coarse_pk", "approx_distinct_count", "approx_topk", "coarse_groupby",
    "distinct_count",
    "exact_quantiles", "histogram", "melt", "pivot", "quantiles_per_group", "rollup", "topk_global", "topk_per_group",
    "build_ivf_index", "ivf_query", "ivf_topk", "knn_self_join", "knn_self_join_ivf", "topk_cosine",
    "cluster_pairs", "cluster_pairs_distributed", "embedding_dup_pairs",
    "embedding_exact_pairs", "exact_dedup", "minhash_dedup",
    "minhash_dup_pairs", "ngram_jaccard_exact_pairs", "simhash_dup_pairs",
    "exact_contamination", "ngram_contamination",
    "lake_diff", "table_diff", "version_history", "wal_version_history",
    "read_changefeed", "write_changefeed",
    "cube", "grouping_sets", "corr_per_group", "describe", "explode",
    "intersect_distinct", "except_distinct", "union_distinct",
    "asof_join", "asof_join_broadcast", "broadcast_join", "hash_join",
    "hash_join_skew", "range_join", "range_join_broadcast",
    "bernoulli_sample", "hash_sample", "hash_split", "stratified_sample",
    "chunk_text", "doc_term_counts", "encode_tokens", "extract_json_field", "normalize_text", "scrub_pii",
    "tfidf_top_terms", "top_terms", "assemble_groups", "pack_sequences",
    "kmeans_assign", "kmeans_fit",
    "LangId", "QualityScorer", "fingerprint", "fingerprint_md5",
    "lang_id_batch", "ngram_repetition_stats", "quality_score_batch", "repetition_stats", "text_stats",
    "token_count", "token_count_bpe",
    "forward_fill", "hopping_window", "percent_rank_global", "lag_lead", "ntile_in_group", "rank_in_group", "rolling_agg", "rolling_agg_range", "session_stats", "sessionize",
    "remove_repeated_paragraphs",
]
