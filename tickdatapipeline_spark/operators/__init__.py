from tickdatapipeline_spark.operators.asof import asof_join
from tickdatapipeline_spark.operators.bars import (
    BarSeed,
    bar_aggregate,
    enrich_ticks_with_bars,
)
from tickdatapipeline_spark.operators.dedup import (
    DEFAULT_MAX_BAND_BUCKET,
    connected_components,
    contamination_against_index,
    cross_corpus_contamination,
    deduplicated_corpus,
    duplicate_clusters,
    exact_duplicates,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_overlap_contamination,
    shingles,
    simhash_near_dup_pairs,
    write_corpus_index,
)
from tickdatapipeline_spark.operators.expansion import expand_volume, packed_timestamp
from tickdatapipeline_spark.operators.hotloop import HotLoopSeed, hot_loop
from tickdatapipeline_spark.operators.multimodal import (
    extract_features,
    sample_frames,
    synth_media_from_documents,
)
from tickdatapipeline_spark.operators.rangejoin import binned_range_join
from tickdatapipeline_spark.operators.similarity import (
    DEFAULT_MAX_BUCKET_SIZE,
    ann_bucket_histogram,
    ann_recall,
    ann_topk_ivf,
    ann_topk_ivf_kmeans,
    ann_topk_lsh,
    ann_topk_sq8,
    cosine_topk,
    embedding_near_duplicates,
    embedding_outliers,
    kmeans_train,
    sq8_dequantized,
)
from tickdatapipeline_spark.operators.stateful import ema_columns
from tickdatapipeline_spark.operators.text import (
    bpe_token_stats,
    fingerprint,
    lang_id,
    pack_sequences,
    quality_score,
    redact_pii,
    repetition_score,
    shard_assignments,
    simhash,
    source_quality_report,
    stratified_sample,
    tfidf_topk,
    token_budget_sample,
    token_stats,
    train_val_test_split,
    vocab_topk,
    write_training_shards,
)

__all__ = [
    "DEFAULT_MAX_BAND_BUCKET", "DEFAULT_MAX_BUCKET_SIZE",
    "asof_join",
    "BarSeed", "bar_aggregate", "enrich_ticks_with_bars",
    "connected_components", "contamination_against_index",
    "cross_corpus_contamination",
    "deduplicated_corpus", "duplicate_clusters",
    "exact_duplicates", "jaccard_pairs", "lsh_candidate_pairs",
    "minhash_signatures", "ngram_overlap_contamination", "shingles",
    "simhash_near_dup_pairs",
    "write_corpus_index",
    "binned_range_join",
    "expand_volume", "packed_timestamp",
    "HotLoopSeed", "hot_loop",
    "extract_features", "sample_frames", "synth_media_from_documents",
    "ann_bucket_histogram", "ann_recall", "ann_topk_ivf",
    "ann_topk_ivf_kmeans", "ann_topk_lsh", "ann_topk_sq8", "cosine_topk",
    "embedding_near_duplicates", "embedding_outliers", "kmeans_train",
    "sq8_dequantized",
    "ema_columns",
    "bpe_token_stats",
    "fingerprint", "lang_id", "pack_sequences", "quality_score",
    "redact_pii", "repetition_score",
    "shard_assignments", "simhash", "source_quality_report",
    "stratified_sample",
    "tfidf_topk", "token_budget_sample", "token_stats",
    "train_val_test_split", "vocab_topk",
    "write_training_shards",
]
