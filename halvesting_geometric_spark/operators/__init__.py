"""Operator surface (SURVEY.md §2 inventory → Spark-first implementations)."""

from halvesting_geometric_spark.operators.anomaly import (
    acf_counts,
    cusum_changepoints,
    robust_anomalies,
)
from halvesting_geometric_spark.operators.evalmetrics import (
    calibration_error,
    classification_report,
    ranking_metrics,
    spearman_correlation,
)
from halvesting_geometric_spark.operators.betweenness import (
    betweenness_sampled,
    edge_betweenness_sampled,
)
from halvesting_geometric_spark.operators.components import connected_components
from halvesting_geometric_spark.operators.extract import (
    extract_conv_edges,
    ordered_turns,
)
from halvesting_geometric_spark.operators.graph import (
    PropertyGraph,
    build_graph,
    canonical_edges,
    in_degrees,
    out_degrees,
    undirected,
)
from halvesting_geometric_spark.operators.ids import (
    build_vertices,
    dense_ids_scalable,
    dense_ids_window,
    edges_to_ids,
)
from halvesting_geometric_spark.operators.bipartite import bipartite_project
from halvesting_geometric_spark.operators.cooccur import (
    cooccurrence_counts,
    cooccurrence_pmi,
)
from halvesting_geometric_spark.operators.dialogue import (
    context_windows,
    conversation_stats,
    role_transitions,
    tool_runs,
    tool_sequences,
    topic_boundaries,
    turn_gaps,
)
from halvesting_geometric_spark.operators.dag import (
    dag_longest_paths,
    kahn_levels,
)
from halvesting_geometric_spark.operators.curvature import (
    forman_curvature,
    forman_vertex_curvature,
)
from halvesting_geometric_spark.operators.densest import densest_subgraph
from halvesting_geometric_spark.operators.ktruss import ktruss
from halvesting_geometric_spark.operators.nullmodel import configuration_model
from halvesting_geometric_spark.operators.partition import balanced_partition
from halvesting_geometric_spark.operators.robustness import (
    bond_percolation,
    degree_attack_robustness,
)
from halvesting_geometric_spark.operators.scan import (
    scan_clusters,
    structural_similarity,
)
from halvesting_geometric_spark.operators.sparsify import local_jaccard_sparsify
from halvesting_geometric_spark.operators.ivf import (
    ivf_assign,
    ivf_topk,
    kmeans_fit,
    seed_centroids,
    semdedup,
)
from halvesting_geometric_spark.operators.layout import (
    cluster_by_zorder,
    zorder_sql,
    zorder_value,
)
from halvesting_geometric_spark.operators.labelprop import (
    label_propagation,
    seeded_label_propagation,
)
from halvesting_geometric_spark.operators.preference import (
    bradley_terry,
    dpo_pairs,
    rank_centrality,
    tournament_cycles,
    win_rate_matrix,
)
from halvesting_geometric_spark.operators.pq import (
    pq_adc_rerank_topk,
    pq_adc_topk,
    pq_encode,
    pq_fit,
    pq_seed_codebooks,
)
from halvesting_geometric_spark.operators.louvain import (
    contract_graph,
    louvain,
    louvain_round,
)
from halvesting_geometric_spark.operators.ngram_lm import (
    bigram_logprob,
    ngram_counts,
)
from halvesting_geometric_spark.operators.bm25 import (
    bm25_scores,
    hashing_tf,
    tfidf_top_terms,
)
from halvesting_geometric_spark.operators.bpe import (
    bpe_segment,
    bpe_train,
    word_counts,
)
from halvesting_geometric_spark.operators.sketch import (
    cms_estimate,
    cms_merge,
    approx_distinct,
    bloom_merge,
    bloom_probe,
    bloom_sketch,
    count_min_sketch,
    heavy_hitters,
    hll_estimate,
    hll_merge,
    hll_sketch,
    hll_sliding_merge,
)
from halvesting_geometric_spark.operators.scc import (
    condensation,
    strongly_connected_components,
    topological_levels,
)
from halvesting_geometric_spark.operators.linkpred import (
    clustering_coefficients,
    degree_assortativity,
    four_cycles,
    graph_stats,
    modularity,
    neighborhood_scores,
)
from halvesting_geometric_spark.operators.clustering import (
    dbscan_embeddings,
    knn_label_agreement,
)
from halvesting_geometric_spark.operators.coloring import greedy_coloring
from halvesting_geometric_spark.operators.embeddings import (
    covariance_matrix,
    embedding_moments,
    pca,
    pca_project,
)
from halvesting_geometric_spark.operators.kcore import coreness, kcore_members
from halvesting_geometric_spark.operators.media_analysis import (
    audio_autocorr,
    frame_diff_stats,
    patchify,
    pitch_estimate,
)
from halvesting_geometric_spark.operators.mis import maximal_independent_set
from halvesting_geometric_spark.operators.multimodal import (
    audio_stats,
    avi_mjpeg_bytes,
    box_resize,
    decode_avi,
    decode_gif,
    decode_image,
    encode_png,
    decode_jpeg,
    decode_png,
    decode_wav,
    encode_jpeg,
    extract_features,
    gif_pixel_stats,
    jpeg_pixel_stats,
    parse_media_meta,
    pixel_stats,
    resize_images,
    sample_frames,
    video_frame_stats,
)
from halvesting_geometric_spark.operators.neighborhood import (
    effective_diameter,
    harmonic_centrality_exact,
    harmonic_centrality_hll,
    neighborhood_function_exact,
    neighborhood_function_hll,
    reach_sketch,
)
from halvesting_geometric_spark.operators.neighbors import (
    aggregate_neighbors,
    aggregate_neighbors_positional,
)
from halvesting_geometric_spark.operators.pagerank import pagerank
from halvesting_geometric_spark.operators.sampling import (
    negative_edges,
    pps_sample,
    sample_neighbors,
    sample_neighbors_layered,
    split_edges,
    stratified_sample,
    weighted_sample,
)
from halvesting_geometric_spark.operators.quantiles import (
    group_quantiles,
    weighted_quantiles,
)
from halvesting_geometric_spark.operators.diversity import (
    compression_ratio,
    distinct_ngrams,
    heaps_checkpoints,
    js_divergence,
    unigram_cross_entropy,
    unigram_entropy,
    zipf_slope,
)
from halvesting_geometric_spark.operators.stats import (
    bootstrap_mean_ci,
    chi2_independence,
    mann_whitney_u,
    two_sample_ks,
    welch_ttest,
)
from halvesting_geometric_spark.operators.events import (
    burst_windows,
    burstiness,
    decayed_counts,
    gap_memory,
)
from halvesting_geometric_spark.operators.relational import (
    grouped_linregress,
    rank_normalize,
)
from halvesting_geometric_spark.operators.temporal import (
    snapshot_diff,
    temporal_reachability,
    temporal_triangles,
)
from halvesting_geometric_spark.operators.behavior import (
    association_rules,
    cohort_retention,
    engagement_gini,
    frequent_sequences,
    funnel_steps,
    session_paths,
)
from halvesting_geometric_spark.operators.structural import structural_holes
from halvesting_geometric_spark.operators.bowtie import bowtie_decomposition
from halvesting_geometric_spark.operators.fuzzy import fuzzy_pairs
from halvesting_geometric_spark.operators.centrality import (
    eigenvector_centrality,
    hits,
    personalized_pagerank,
    salsa,
)
from halvesting_geometric_spark.operators.influence import linear_threshold
from halvesting_geometric_spark.operators.metrics import (
    degree_mixing_matrix,
    herfindahl_index,
    gini_coefficient,
    powerlaw_alpha,
    reciprocity,
    rich_club,
    triangle_significance,
)
from halvesting_geometric_spark.operators.mixing import (
    budget_mix,
    chunk_tokens,
    classifier_scores,
    dsir_scores,
    hashed_ngram_features,
    pack_sequences,
)
from halvesting_geometric_spark.operators.neighbors import (
    attention_aggregate,
    gated_aggregate,
)
from halvesting_geometric_spark.operators.graphlets import graphlet_census
from halvesting_geometric_spark.operators.similarity import kcenter_select
from halvesting_geometric_spark.operators.simrank import simrank
from halvesting_geometric_spark.operators.setjoin import (
    prefix_filter_pairs,
    similarity_join,
)
from halvesting_geometric_spark.operators.fastrp import (
    fastrp_embeddings,
    fastrp_projection,
)
from halvesting_geometric_spark.operators.matching import (
    coarsen_graph,
    maximal_matching,
)
from halvesting_geometric_spark.operators.msf import minimum_spanning_forest
from halvesting_geometric_spark.operators.triads import triad_census
from halvesting_geometric_spark.operators.traversal import (
    bfs_levels,
    double_sweep_diameter,
    ego_subgraph,
    hitting_probability,
    landmark_bfs,
    landmark_distance_estimates,
    landmark_sssp,
    sssp,
)
from halvesting_geometric_spark.operators.triangles import (
    four_clique_total,
    triangle_count,
)
from halvesting_geometric_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_pairs,
)
from halvesting_geometric_spark.operators.wl import wl_histogram, wl_refinement
from halvesting_geometric_spark.operators.walks import (
    metapath_walks,
    node2vec_walks,
    random_walks,
)

__all__ = [
    "PropertyGraph",
    "aggregate_neighbors",
    "aggregate_neighbors_positional",
    "betweenness_sampled",
    "edge_betweenness_sampled",
    "association_rules",
    "frequent_sequences",
    "structural_holes",
    "temporal_reachability",
    "pack_sequences",
    "hashing_tf",
    "bowtie_decomposition",
    "calibration_error",
    "classification_report",
    "context_windows",
    "conversation_stats",
    "cusum_changepoints",
    "grouped_linregress",
    "kcenter_select",
    "landmark_bfs",
    "landmark_distance_estimates",
    "landmark_sssp",
    "rank_normalize",
    "ranking_metrics",
    "robust_anomalies",
    "bfs_levels",
    "bipartite_project",
    "burst_windows",
    "burstiness",
    "decayed_counts",
    "gap_memory",
    "cohort_retention",
    "engagement_gini",
    "ego_subgraph",
    "four_clique_total",
    "graphlet_census",
    "funnel_steps",
    "fuzzy_pairs",
    "group_quantiles",
    "weighted_quantiles",
    "two_sample_ks",
    "mann_whitney_u",
    "chi2_independence",
    "welch_ttest",
    "bootstrap_mean_ci",
    "dbscan_embeddings",
    "knn_label_agreement",
    "degree_mixing_matrix",
    "herfindahl_index",
    "distinct_ngrams",
    "zipf_slope",
    "unigram_entropy",
    "heaps_checkpoints",
    "compression_ratio",
    "js_divergence",
    "unigram_cross_entropy",
    "hitting_probability",
    "session_paths",
    "snapshot_diff",
    "temporal_triangles",
    "topic_boundaries",
    "triangle_significance",
    "stratified_sample",
    "build_graph",
    "build_vertices",
    "canonical_edges",
    "clustering_coefficients",
    "connected_components",
    "cooccurrence_counts",
    "cooccurrence_pmi",
    "coreness",
    "covariance_matrix",
    "dag_longest_paths",
    "kahn_levels",
    "degree_assortativity",
    "densest_subgraph",
    "dense_ids_scalable",
    "dense_ids_window",
    "edges_to_ids",
    "effective_diameter",
    "eigenvector_centrality",
    "embedding_moments",
    "fastrp_embeddings",
    "fastrp_projection",
    "hits",
    "minimum_spanning_forest",
    "personalized_pagerank",
    "pps_sample",
    "extract_conv_edges",
    "extract_features",
    "forman_curvature",
    "forman_vertex_curvature",
    "four_cycles",
    "local_jaccard_sparsify",
    "balanced_partition",
    "bond_percolation",
    "configuration_model",
    "degree_attack_robustness",
    "scan_clusters",
    "structural_similarity",
    "graph_stats",
    "greedy_coloring",
    "harmonic_centrality_exact",
    "harmonic_centrality_hll",
    "in_degrees",
    "kcore_members",
    "ktruss",
    "label_propagation",
    "seeded_label_propagation",
    "maximal_independent_set",
    "maximal_matching",
    "coarsen_graph",
    "semdedup",
    "dsir_scores",
    "classifier_scores",
    "hashed_ngram_features",
    "audio_stats",
    "decode_wav",
    "decode_png",
    "decode_gif",
    "decode_jpeg",
    "encode_jpeg",
    "decode_avi",
    "avi_mjpeg_bytes",
    "decode_image",
    "encode_png",
    "box_resize",
    "resize_images",
    "gif_pixel_stats",
    "jpeg_pixel_stats",
    "video_frame_stats",
    "patchify",
    "frame_diff_stats",
    "audio_autocorr",
    "pitch_estimate",
    "pixel_stats",
    "metapath_walks",
    "node2vec_walks",
    "modularity",
    "neighborhood_function_exact",
    "neighborhood_function_hll",
    "reach_sketch",
    "negative_edges",
    "neighborhood_scores",
    "ordered_turns",
    "out_degrees",
    "pagerank",
    "parse_media_meta",
    "pca",
    "pca_project",
    "random_walks",
    "cluster_by_zorder",
    "zorder_sql",
    "zorder_value",
    "role_transitions",
    "tool_runs",
    "tool_sequences",
    "turn_gaps",
    "sample_frames",
    "sample_neighbors",
    "sample_neighbors_layered",
    "split_edges",
    "weighted_sample",
    "sssp",
    "triad_census",
    "triangle_count",
    "undirected",
    "winnow_fingerprints",
    "winnow_pairs",
    "wl_histogram",
    "wl_refinement",
    "ivf_assign",
    "ivf_topk",
    "pq_adc_rerank_topk",
    "pq_adc_topk",
    "pq_encode",
    "pq_fit",
    "pq_seed_codebooks",
    "kmeans_fit",
    "seed_centroids",
    "contract_graph",
    "louvain",
    "louvain_round",
    "bigram_logprob",
    "ngram_counts",
    "bm25_scores",
    "strongly_connected_components",
    "bpe_train",
    "bpe_segment",
    "word_counts",
    "tfidf_top_terms",
    "condensation",
    "topological_levels",
    "cms_estimate",
    "cms_merge",
    "approx_distinct",
    "bloom_merge",
    "bloom_probe",
    "bloom_sketch",
    "count_min_sketch",
    "heavy_hitters",
    "hll_estimate",
    "hll_merge",
    "hll_sketch",
    "hll_sliding_merge",
    "salsa",
    "reciprocity",
    "rich_club",
    "powerlaw_alpha",
    "gini_coefficient",
    "acf_counts",
    "double_sweep_diameter",
    "linear_threshold",
    "prefix_filter_pairs",
    "similarity_join",
    "simrank",
    "budget_mix",
    "chunk_tokens",
    "attention_aggregate",
    "gated_aggregate",
]
