from wprdc_etl_spark.functions.text import (
    bpe_ish_token_count,
    build_vocab,
    chunk_documents,
    dup_line_char_frac,
    dup_line_frac,
    lang_id,
    quality_score,
    redact_pii,
    remove_boilerplate_lines,
    rolling_fingerprint,
    strip_markup,
    token_count,
    top_bigram_char_frac,
    top_terms_per_doc,
)
from wprdc_etl_spark.functions.sampling import (
    hash_sample,
    mix_corpus,
    stratified_sample,
    weighted_sample,
    with_split,
)
from wprdc_etl_spark.functions.dedup import (
    contamination_flags,
    exact_dedup,
    minhash_signatures,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from wprdc_etl_spark.functions.packing import (
    pack_shards,
    shard_stats,
)
from wprdc_etl_spark.functions.graph import (
    connected_components,
    dedup_clusters,
)
from wprdc_etl_spark.functions.neardup_index import NearDupIndex
from wprdc_etl_spark.functions.similarity import (
    cosine_similarity_col,
    cosine_topk,
    rp_lsh_bucket,
    ann_topk_lsh,
)

__all__ = [
    "token_count",
    "bpe_ish_token_count",
    "quality_score",
    "lang_id",
    "rolling_fingerprint",
    "exact_dedup",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "cosine_similarity_col",
    "cosine_topk",
    "rp_lsh_bucket",
    "ann_topk_lsh",
    "pack_shards",
    "shard_stats",
    "connected_components",
    "dedup_clusters",
    "NearDupIndex",
    "contamination_flags",
    "chunk_documents",
    "dup_line_frac",
    "dup_line_char_frac",
    "top_bigram_char_frac",
    "remove_boilerplate_lines",
    "strip_markup",
    "top_terms_per_doc",
    "build_vocab",
    "redact_pii",
    "hash_sample",
    "mix_corpus",
    "stratified_sample",
    "weighted_sample",
    "with_split",
]
