"""Engine operators: traversal (BFS/DFS, single- and multi-source),
catalog mutation (add/modify graph), request dispatch, graph
statistics, relational analytics, and the training-data extension
suite (dedup, similarity, text, multimodal)."""

from .traverse import (
    bfs_levels,
    bfs_levels_multi,
    bfs_level_order,
    connected_count,
    dfs_leaves,
    dfs_leaves_multi,
)
from .catalog import GraphCatalog, add_graph, modify_graph
from .dispatch import format_reply, route_requests, schedule_requests, run_requests
from .stats import graph_stats
from .dedup import (
    exact_dedup,
    fingerprint_dedup,
    minhash_candidates,
    minhash_dedup,
    decontaminate,
    ngram_jaccard_pairs,
    token_ngrams,
    simhash_dedup,
)
from .graphalgs import (
    common_neighbors,
    degree_histogram,
    kcore,
    pagerank_fixed,
    sssp,
    triangle_counts,
)
from .pipeline import corpus_prep, corpus_prep_stats
from .similarity import cosine_topk, embedding_near_dup, ivf_topk, lsh_topk
from .textops import chunk_documents, corpus_stats, doc_features, repetition_features
from .sampling import stratified_sample, train_split
from .temporal import asof_join, time_rollup
from .sketches import (
    bloom_bits,
    bloom_probe,
    cms_estimate,
    cms_table,
    hll_distinct,
    hll_estimate,
    hll_registers,
)
from .multimodal import attach_media, extract_media_meta, frame_sample
from .relational import (
    brand_revenue,
    event_props_filter,
    event_windows,
    pricing_summary,
    top_events_per_type,
)

__all__ = [
    "bfs_levels",
    "bfs_levels_multi",
    "bfs_level_order",
    "dfs_leaves",
    "dfs_leaves_multi",
    "connected_count",
    "GraphCatalog",
    "add_graph",
    "modify_graph",
    "route_requests",
    "schedule_requests",
    "run_requests",
    "format_reply",
    "graph_stats",
    "exact_dedup",
    "fingerprint_dedup",
    "minhash_candidates",
    "minhash_dedup",
    "ngram_jaccard_pairs",
    "token_ngrams",
    "decontaminate",
    "chunk_documents",
    "bloom_bits",
    "bloom_probe",
    "simhash_dedup",
    "cosine_topk",
    "lsh_topk",
    "ivf_topk",
    "embedding_near_dup",
    "corpus_stats",
    "doc_features",
    "repetition_features",
    "stratified_sample",
    "train_split",
    "asof_join",
    "time_rollup",
    "hll_distinct",
    "hll_estimate",
    "hll_registers",
    "cms_table",
    "cms_estimate",
    "attach_media",
    "extract_media_meta",
    "frame_sample",
    "brand_revenue",
    "event_props_filter",
    "event_windows",
    "pricing_summary",
    "top_events_per_type",
    "pagerank_fixed",
    "triangle_counts",
    "degree_histogram",
    "common_neighbors",
    "kcore",
    "sssp",
    "corpus_prep",
    "corpus_prep_stats",
]
