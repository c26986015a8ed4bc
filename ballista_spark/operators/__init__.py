"""Large-scale training-data-pipeline operators (beyond reference parity).

These are first-class engine components (BASELINE.json north star, SURVEY.md
§7.3 step 7): deduplication, similarity search, text analysis, and multimodal
column plumbing — each designed for a 1000-executor / 100 TB deployment:
declarative DataFrame plans, one shuffle where one is needed, broadcast for
small sides, no driver-side collection anywhere.
"""

from ballista_spark.operators.bpe import (
    BPEModel,
    bpe_decode,
    bpe_encode,
    bpe_encode_ids,
    bpe_fit,
)
from ballista_spark.operators.unigram import (
    UnigramModel,
    unigram_encode,
    unigram_encode_ids,
    unigram_fit,
)
from ballista_spark.operators.dedup import (
    connected_components,
    dedup_against,
    exact_dedup,
    exact_dedup_weighted,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    resolve_duplicates,
    shingle_sets,
    simhash_pairs,
    simhash_signatures,
)
from ballista_spark.operators.similarity import (
    cosine_topk,
    embedding_neardup_pairs,
    ivf_ann_topk,
    lsh_ann_topk,
    lsh_neardup_pairs,
    ivfpq_ann_topk,
    ivfpq_encode,
    ivfpq_residuals,
    pq_adc_topk,
    pq_encode,
    pq_fit,
    semdedup_pairs,
)
from ballista_spark.operators.quality import (
    char_entropy,
    compression_ratio,
    hashed_ngram_features,
    logreg_fit,
    quality_classifier_score,
)
from ballista_spark.operators.dsir import (
    dsir_fit,
    dsir_log_weights,
    dsir_resample,
)
from ballista_spark.operators.pca import (
    PCAModel,
    pca_fit,
    pca_project,
)
from ballista_spark.operators.lm import (
    ngram_lm_fit,
    ngram_lm_score,
    perplexity_buckets,
    perplexity_filter,
)
from ballista_spark.operators.curate import CurationReport, curate_corpus
from ballista_spark.operators.retrieval import (
    BM25Index,
    bm25_index,
    bm25_topk,
    rrf_fuse,
)
from ballista_spark.operators.asof import asof_join
from ballista_spark.operators.dataset import (
    hash_split,
    merge_upsert,
    pack_contiguous,
    semantic_pack,
    pack_greedy,
    packed_sequences,
    write_packed_shards,
)
from ballista_spark.operators.decontam import contamination_stats, decontaminate
from ballista_spark.operators.sampling import (
    group_cap,
    hash_sample,
    stratified_sample,
    temperature_sample,
    weighted_sample_k,
)
from ballista_spark.operators.partitioning import (
    salted_agg,
    salted_join,
    write_bucketed,
)
from ballista_spark.operators.rangejoin import range_join
from ballista_spark.operators.text import (
    chunk_documents,
    dedup_lines_within,
    dedup_spans_corpus,
    fingerprint,
    normalize_for_dedup,
    lang_id,
    quality_score,
    redact_pii,
    filter_keyword_clean,
    keyword_hits,
    remove_boilerplate,
    token_count,
)
from ballista_spark.operators.dedup import neardup_against, screen_against
from ballista_spark.operators.decontam import (
    contamination_matrix,
    decontaminate_fuzzy,
    fuzzy_contaminated_keys,
)
from ballista_spark.operators.substr import (
    duplicated_window_spans,
    strip_duplicated_spans,
    window_occurrences,
)
from ballista_spark.operators.multimodal import (
    audio_dhash,
    dhash_audio,
    dhash_images,
    image_dhash,
    hamming_neardup_pairs,
    image_neardup_pairs,
    scene_cut_scores,
    video_dhash,
    video_scene_cuts,
)
from ballista_spark.operators.audiofp import (
    audio_fingerprints,
    audio_match_pairs,
    landmark_fingerprints,
)
from ballista_spark.operators.jpeg import decode_jpeg, encode_jpeg
from ballista_spark.operators.pdf import pdf_extract_text, pdf_page_count, pdf_to_text
from ballista_spark.operators.robots import (
    filter_robots_allowed,
    parse_robots,
    parse_robots_text,
    parse_sitemap_text,
    parse_sitemaps,
)
from ballista_spark.operators.report import corpus_report, tokenizer_report
from ballista_spark.operators.dataset import corpus_diff, shuffle_deterministic
from ballista_spark.operators.dataset import curriculum_order, fim_split, group_split
from ballista_spark.operators.dataset import span_corrupt
from ballista_spark.operators.similarity import (
    cluster_assign,
    cluster_balanced_sample,
    cluster_sizes,
)
from ballista_spark.operators.mixture import (
    budget_sample,
    mixture_epochs,
    mixture_rates,
    mixture_sample,
)
from ballista_spark.operators.winnow import (
    fingerprint_overlap_pairs,
    winnow_fingerprints,
)
from ballista_spark.operators.sketch import heavy_hitters
from ballista_spark.operators.html import html_title, html_to_text
from ballista_spark.operators.cdc import cdc_chunks, cdc_dedup_stats
from ballista_spark.operators.url import (
    blocked_domain_hits,
    filter_blocked_domains,
    filter_blocked_domains_stream,
    host_suffixes,
    url_host,
)
from ballista_spark.operators.model_io import load_model, save_model
from ballista_spark.operators.similarity import (
    ivf_store_append,
    ivf_store_topk,
    kmeans_fit,
    write_ivf_store,
)

from ballista_spark.operators.chat import (
    assistant_spans,
    redact_chat_pii,
    chat_stats,
    filter_valid_chats,
    first_user_prompt,
    is_valid_chat,
    render_chat,
)
from ballista_spark.operators.classify import (
    SoftmaxModel,
    char_ngram_features,
    langid_fit,
    langid_predict,
    softmax_fit,
    softmax_predict,
    softmax_predict_local,
    softmax_probs,
)
from ballista_spark.operators.graph import out_degrees, pagerank
from ballista_spark.operators.preference import (
    bt_strengths,
    judgment_consistency,
    win_rate_table,
)
from ballista_spark.operators.html import extract_links, host_link_edges
from ballista_spark.operators.retrieval import mine_hard_negatives
from ballista_spark.operators.unicodeops import (
    nfkc_normalize,
    strip_accents,
    unicode_normalize,
)
from ballista_spark.operators.url import canonicalize_url
from ballista_spark.operators.wordpiece import (
    WordPieceModel,
    wordpiece_encode,
    wordpiece_fit,
)

__all__ = [
    "exact_dedup",
    "shingle_sets",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_signatures",
    "simhash_pairs",
    "cosine_topk",
    "lsh_ann_topk",
    "embedding_neardup_pairs",
    "lsh_neardup_pairs",
    "token_count",
    "keyword_hits",
    "filter_keyword_clean",
    "quality_score",
    "lang_id",
    "fingerprint",
    "asof_join",
    "range_join",
    "hash_split",
    "merge_upsert",
    "write_bucketed",
    "salted_agg",
    "salted_join",
    "ivf_ann_topk",
    "hash_sample",
    "stratified_sample",
    "temperature_sample",
    "group_cap",
    "contamination_stats",
    "decontaminate",
    "dedup_against",
    "connected_components",
    "resolve_duplicates",
    "pack_contiguous",
    "semantic_pack",
    "pack_greedy",
    "packed_sequences",
    "write_packed_shards",
    "pq_fit",
    "pq_encode",
    "pq_adc_topk",
    "ivfpq_encode",
    "ivfpq_residuals",
    "ivfpq_ann_topk",
    "semdedup_pairs",
    "hashed_ngram_features",
    "logreg_fit",
    "quality_classifier_score",
    "ngram_lm_fit",
    "ngram_lm_score",
    "perplexity_buckets",
    "perplexity_filter",
    "CurationReport",
    "curate_corpus",
    "BM25Index",
    "bm25_index",
    "bm25_topk",
    "rrf_fuse",
    "dsir_fit",
    "dsir_log_weights",
    "dsir_resample",
    "UnigramModel",
    "unigram_encode",
    "unigram_encode_ids",
    "unigram_fit",
    "BPEModel",
    "bpe_decode",
    "bpe_encode",
    "bpe_encode_ids",
    "bpe_fit",
    "PCAModel",
    "pca_fit",
    "pca_project",
    "neardup_against",
    "screen_against",
    "decontaminate_fuzzy",
    "fuzzy_contaminated_keys",
    "window_occurrences",
    "duplicated_window_spans",
    "strip_duplicated_spans",
    "corpus_report",
    "audio_dhash",
    "dhash_audio",
    "dhash_images",
    "image_dhash",
    "hamming_neardup_pairs",
    "image_neardup_pairs",
    "video_dhash",
    "scene_cut_scores",
    "video_scene_cuts",
    "audio_fingerprints",
    "audio_match_pairs",
    "landmark_fingerprints",
    "decode_jpeg",
    "encode_jpeg",
    "pdf_extract_text",
    "pdf_page_count",
    "pdf_to_text",
    "filter_robots_allowed",
    "parse_robots",
    "parse_robots_text",
    "parse_sitemap_text",
    "parse_sitemaps",
    "tokenizer_report",
    "shuffle_deterministic",
    "save_model",
    "load_model",
    "chunk_documents",
    "dedup_lines_within",
    "redact_pii",
    "remove_boilerplate",
    "kmeans_fit",
    "write_ivf_store",
    "ivf_store_append",
    "ivf_store_topk",
    "normalize_for_dedup",
    "contamination_matrix",
    "corpus_diff",
    "mixture_rates",
    "mixture_sample",
    "mixture_epochs",
    "budget_sample",
    "winnow_fingerprints",
    "fingerprint_overlap_pairs",
    "dedup_spans_corpus",
    "heavy_hitters",
    "cdc_chunks",
    "cdc_dedup_stats",
    "url_host",
    "host_suffixes",
    "blocked_domain_hits",
    "filter_blocked_domains",
    "compression_ratio",
    "char_entropy",
    "filter_blocked_domains_stream",
    "html_to_text",
    "html_title",
    "assistant_spans",
    "chat_stats",
    "filter_valid_chats",
    "first_user_prompt",
    "is_valid_chat",
    "render_chat",
    "redact_chat_pii",
    "SoftmaxModel",
    "char_ngram_features",
    "langid_fit",
    "langid_predict",
    "softmax_fit",
    "softmax_predict",
    "softmax_predict_local",
    "softmax_probs",
    "out_degrees",
    "pagerank",
    "bt_strengths",
    "win_rate_table",
    "judgment_consistency",
    "extract_links",
    "host_link_edges",
    "mine_hard_negatives",
    "nfkc_normalize",
    "strip_accents",
    "unicode_normalize",
    "canonicalize_url",
    "WordPieceModel",
    "wordpiece_encode",
    "wordpiece_fit",
    "cluster_assign",
    "cluster_sizes",
    "cluster_balanced_sample",
    "group_split",
    "curriculum_order",
    "fim_split",
    "span_corrupt",
    "exact_dedup_weighted",
    "weighted_sample_k",
    "detect_code_language",
    "code_quality_stats",
    "filter_code_quality",
    "license_screen",
    "comment_line_fraction",
]

from ballista_spark.operators.validate import (  # noqa: E402
    Check,
    ContractViolation,
    enforce,
    validate,
)

__all__ += ["Check", "ContractViolation", "enforce", "validate"]

from ballista_spark.operators.code import (  # noqa: E402
    code_quality_stats,
    comment_line_fraction,
    detect_code_language,
    filter_code_quality,
    license_screen,
)
