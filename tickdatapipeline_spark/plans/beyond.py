"""Beyond-reference query surface: dedup, similarity search, text
analysis, as-of join, multimodal plumbing — the training-data-pipeline
operators (north star in BASELINE.json, absent from the reference per
SURVEY.md §2.9).

Each entry is a (spark_fn, duckdb_sql) pair like plans/analytics.py.
The SQL twins reproduce every intermediate exactly: shared h60 hashing
(lower 60 bits of md5), identical tokenization regex, left-fold float
accumulation order, and the floor-based rnd policy for floats that
cross the oracle boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tickdatapipeline_spark.functions.rounding import rnd, sql_rnd
from tickdatapipeline_spark.sources.io import read_events, read_parquet
from tickdatapipeline_spark.operators.asof import asof_join
from tickdatapipeline_spark.operators.dedup import (
    BAND_SIZE,
    DEFAULT_MAX_BAND_BUCKET,
    MERSENNE_P,
    NUM_PERM,
    connected_components,
    containment_pairs,
    cross_corpus_contamination_split,
    cross_source_dup_matrix,
    deduplicated_corpus,
    duplicate_clusters,
    exact_duplicates,
    jaccard_pairs,
    lsh_candidate_pairs,
    cluster_aware_split,
    minhash_jaccard_calibration,
    minhash_signatures,
    ngram_novelty,
    simhash_near_dup_pairs,
    substring_dup_pairs,
    weighted_jaccard_pairs,
)
from tickdatapipeline_spark.operators.multimodal import (
    extract_features,
    media_exact_duplicates,
    media_near_duplicates,
    perceptual_fingerprints,
    phash_near_duplicates,
    sample_frames,
    synth_media_from_documents,
)
from tickdatapipeline_spark.operators.similarity import (
    DIM,
    _cos_sim,
    LSH_PLANES,
    _plane_weight,
    ann_bucket_histogram,
    ann_recall,
    ann_rerank,
    ann_topk_ivf,
    ann_topk_ivfpq,
    ann_topk_pq,
    ann_topk_pq_adc,
    ann_topk_sq8,
    ann_topk_ivf_kmeans,
    ann_topk_lsh,
    cosine_topk,
    embedding_near_duplicates,
    embedding_outliers,
    label_centroid_cosine,
    power_iteration_top_component,
    semantic_dedup,
    DIVERSITY_M,
    cosine_topk_truncated,
    diversity_sample,
)
from tickdatapipeline_spark.operators.stateful import ema_columns
from tickdatapipeline_spark.operators.text import (
    LANG_MARKERS,
    h60,
    importance_weights,
    STOPWORDS_EN,
    TOKEN_RE,
    boilerplate_ngrams,
    bpe_compression_report,
    bpe_learn_merges,
    bpe_token_stats,
    char_bigram_likelihood,
    chunk_windows,
    collocations,
    COLLOC_MIN_COUNT,
    COLLOC_TOP_K,
    fingerprint,
    lang_id,
    langid_confusion,
    mixture_sample,
    oov_rate,
    pack_sequences,
    quality_score,
    source_cap,
    source_quality_report,
    source_top_tokens,
    simhash,
    repetition_score,
    shard_assignments,
    stratified_sample,
    tfidf_topk,
    token_budget_sample,
    token_commonness,
    token_stats,
    tokens,
    train_val_test_split,
    vocab_drift,
    vocab_topk,
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_parquet(spark, f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_parquet(spark, f"{sf_dir}/embeddings.parquet")


# ---- shared SQL fragments (DuckDB dialect) ----

SQL_TOKENS = f"regexp_extract_all(lower(text), '{TOKEN_RE}')"


def sql_h60(expr: str) -> str:
    return f"CAST('0x' || substring(md5({expr}), 18, 15) AS BIGINT)"


SQL_NORM_TEXT = r"regexp_replace(trim(lower(text)), '\s+', ' ', 'g')"

# ================= text analysis =================

TOKEN_STATS_SQL = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(t)) AS BIGINT) AS n_unique_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       {sql_rnd("CASE WHEN len(t) > 0 THEN CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / CAST(len(t) AS DOUBLE) ELSE 0.0 END")} AS avg_token_len
FROM (SELECT doc_id, text, {SQL_TOKENS} AS t FROM documents)
"""

QUALITY_SQL = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(t) AS BIGINT) AS n_tokens,
       {sql_rnd("CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE) / nullif(CAST(length(text) AS DOUBLE), 0)")} AS punct_ratio,
       {sql_rnd("CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / nullif(CAST(length(text) AS DOUBLE), 0)")} AS digit_ratio,
       {sql_rnd("CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE) / nullif(CAST(length(text) AS DOUBLE), 0)")} AS upper_ratio,
       {sql_rnd(f"CASE WHEN len(t) > 0 THEN CAST(len(list_filter(t, x -> x IN {STOPWORDS_EN!r})) AS DOUBLE) / CAST(len(t) AS DOUBLE) ELSE 0.0 END")} AS stopword_ratio
FROM (SELECT doc_id, text, {SQL_TOKENS} AS t FROM documents)
"""

_langs = sorted(LANG_MARKERS)
_score_cols = ", ".join(
    f"CAST(len(list_filter(t, x -> x IN {LANG_MARKERS[lang]!r})) AS BIGINT) AS score_{lang}"
    for lang in _langs
)
_best = "greatest(" + ", ".join(f"score_{lang}" for lang in _langs) + ")"
_pred = (
    "CASE "
    + " ".join(f"WHEN score_{lang} = best AND best > 0 THEN '{lang}'" for lang in _langs)
    + " ELSE 'und' END"
)

LANG_ID_SQL = f"""
SELECT doc_id, lang_true, {_pred} AS pred_lang, best AS best_score
FROM (
    SELECT doc_id, lang_true, {_best} AS best, {", ".join(f"score_{lang}" for lang in _langs)}
    FROM (
        SELECT CAST(doc_id AS BIGINT) AS doc_id, lang AS lang_true, {_score_cols}
        FROM (SELECT doc_id, lang, {SQL_TOKENS} AS t FROM documents)
    )
)
"""

SOURCE_TOP_TOKENS_K = 5

SOURCE_TOP_TOKENS_SQL = f"""
WITH counts AS (
    SELECT source, tok AS token, count(*) AS n_occurrences
    FROM (SELECT source, unnest({SQL_TOKENS}) AS tok FROM documents)
    GROUP BY 1, 2
)
SELECT source, token, n_occurrences, CAST(rank AS BIGINT) AS rank
FROM (
    SELECT *, row_number() OVER (PARTITION BY source
                                 ORDER BY n_occurrences DESC, token) AS rank
    FROM counts
)
WHERE rank <= {SOURCE_TOP_TOKENS_K}
"""

TOKEN_COMMONNESS_SQL = f"""
WITH occ AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id, tok AS token
    FROM (SELECT doc_id, unnest({SQL_TOKENS}) AS tok FROM documents)
),
freq AS (SELECT token, count(*) AS freq FROM occ GROUP BY token)
SELECT doc_id,
       count(*) AS n_tokens,
       CAST(sum(freq) AS BIGINT) AS sum_freq,
       {sql_rnd("CAST(sum(freq) AS DOUBLE) / count(*)")} AS mean_token_freq
FROM occ JOIN freq USING (token)
GROUP BY doc_id
"""

LANGID_CONFUSION_SQL = f"""
WITH pred AS ({LANG_ID_SQL}),
m AS (
    SELECT lang_true, pred_lang, count(*) AS n_docs
    FROM pred GROUP BY 1, 2
),
totals AS (
    SELECT lang_true, CAST(sum(n_docs) AS BIGINT) AS n_true
    FROM m GROUP BY 1
)
SELECT lang_true, pred_lang, n_docs,
       {sql_rnd("CAST(n_docs AS DOUBLE) / n_true")} AS frac_of_true
FROM m JOIN totals USING (lang_true)
"""

FINGERPRINT_SQL = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, {sql_h60(SQL_NORM_TEXT)} AS fingerprint
FROM documents
"""

SIMHASH_BITS = 32
SIMHASH_SQL = f"""
WITH tok AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id, unnest({SQL_TOKENS}) AS tok
    FROM documents
),
bits AS (
    SELECT doc_id, {sql_h60('tok')} AS h, unnest(range(0, {SIMHASH_BITS})) AS bit
    FROM tok
),
votes AS (
    SELECT doc_id, bit, sum(((h // (1::BIGINT << CAST(bit AS INTEGER))) % 2) * 2 - 1) AS v
    FROM bits GROUP BY doc_id, bit
)
SELECT doc_id,
       CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << CAST(bit AS INTEGER)) ELSE 0 END) AS BIGINT) AS simhash
FROM votes GROUP BY doc_id
"""

# ================= dedup =================

# distinct word-3-gram shingles (mirrors operators.dedup.shingles)
SHINGLES_CTE = f"""
shingles AS (
    SELECT DISTINCT doc_id, shingle FROM (
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               unnest(CASE WHEN len(t) >= 3
                      THEN list_transform(range(1, len(t) - 1),
                                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                      ELSE [] END) AS shingle
        FROM (SELECT doc_id, {SQL_TOKENS} AS t FROM documents)
    )
)
"""

# hashed join-side shingles (mirrors operators.dedup.hashed_shingles):
# every shingle-equality join below compares 60-bit hashes, exactly as
# the Spark side shuffles 8-byte keys instead of gram strings
_HSH_CTE = f"hsh AS (SELECT doc_id, {sql_h60('shingle')} AS g FROM shingles)"

EXACT_DUP_SQL = f"""
SELECT content_hash, count(*) AS dup_count, min(doc_id) AS keeper_doc_id
FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id, {sql_h60(SQL_NORM_TEXT)} AS content_hash FROM documents)
GROUP BY content_hash HAVING count(*) > 1
"""

MINHASH_CTE = f"""
{SHINGLES_CTE},
sh AS (SELECT doc_id, {sql_h60('shingle')} % {MERSENNE_P} AS h FROM shingles),
lanes AS (SELECT doc_id, h, unnest(range(0, {NUM_PERM})) AS j FROM sh),
sig AS (
    SELECT doc_id, j,
           min(((1 + 37 * j) * h + ((911 * j) % {MERSENNE_P})) % {MERSENNE_P}) AS sig
    FROM lanes GROUP BY doc_id, j
)
"""

MINHASH_SQL = f"WITH {MINHASH_CTE} SELECT doc_id, CAST(j AS BIGINT) AS j, CAST(sig AS BIGINT) AS sig FROM sig"

# bands + candidate pairs, shared by the LSH query and Jaccard verification
_BANDS_CTE = f"""
bands AS (
    SELECT doc_id, j // {BAND_SIZE} AS band,
           string_agg(CAST(sig AS VARCHAR), ',' ORDER BY j) AS band_key
    FROM sig GROUP BY doc_id, j // {BAND_SIZE}
)
"""

_LSH_CAND_CTE = f"""
{_BANDS_CTE.strip()},
cand AS (
    SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
    FROM bands l JOIN bands r
      ON l.band = r.band AND l.band_key = r.band_key AND l.doc_id < r.doc_id
)
"""

LSH_PAIRS_SQL = f"""
WITH {MINHASH_CTE},
{_LSH_CAND_CTE}
SELECT doc_a, doc_b FROM cand
"""

JACCARD_THRESHOLD = 0.5
# mirrors operators.dedup.jaccard_pairs: verification runs ONLY on LSH
# candidates (never an unrestricted shingle self-join)
JACCARD_SQL = f"""
WITH {MINHASH_CTE},
{_LSH_CAND_CTE},
{_HSH_CTE},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS inter_count
    FROM cand c
    JOIN hsh a ON a.doc_id = c.doc_a
    JOIN hsh b ON b.doc_id = c.doc_b AND b.g = a.g
    GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b, inter_count,
       sa.n_sh + sb.n_sh - inter_count AS union_count,
       {sql_rnd('CAST(inter_count AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter_count AS DOUBLE)')} AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE {sql_rnd('CAST(inter_count AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter_count AS DOUBLE)')} >= {JACCARD_THRESHOLD}
"""

CONTAINMENT_THRESHOLD = 0.8

CONTAINMENT_SQL = f"""
WITH {MINHASH_CTE},
{_LSH_CAND_CTE},
{_HSH_CTE},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS inter_count
    FROM cand c
    JOIN hsh a ON a.doc_id = c.doc_a
    JOIN hsh b ON b.doc_id = c.doc_b AND b.g = a.g
    GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b, inter_count,
       least(sa.n_sh, sb.n_sh) AS min_count,
       {sql_rnd('CAST(inter_count AS DOUBLE) / CAST(least(sa.n_sh, sb.n_sh) AS DOUBLE)')} AS containment
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE {sql_rnd('CAST(inter_count AS DOUBLE) / CAST(least(sa.n_sh, sb.n_sh) AS DOUBLE)')} >= {CONTAINMENT_THRESHOLD}
"""

# benchmark decontamination: the same LSH+Jaccard machinery joined
# BETWEEN the train and eval sides of the corpus (deterministic split
# by doc_id mod). MinHash signatures are per-document, so computing
# them over the whole table then splitting equals per-side computation.
DECON_EVAL_MOD = 5

DECONTAMINATE_SQL = f"""
WITH {MINHASH_CTE},
{_BANDS_CTE.strip()},
cand AS (
    SELECT DISTINCT t.doc_id AS train_doc_id, e.doc_id AS eval_doc_id
    FROM bands t JOIN bands e
      ON t.band = e.band AND t.band_key = e.band_key
    WHERE t.doc_id % {DECON_EVAL_MOD} <> 0 AND e.doc_id % {DECON_EVAL_MOD} = 0
),
{_HSH_CTE},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
    SELECT c.train_doc_id, c.eval_doc_id, count(*) AS inter_count
    FROM cand c
    JOIN hsh a ON a.doc_id = c.train_doc_id
    JOIN hsh b ON b.doc_id = c.eval_doc_id AND b.g = a.g
    GROUP BY c.train_doc_id, c.eval_doc_id
)
SELECT train_doc_id, eval_doc_id, inter_count,
       sa.n_sh + sb.n_sh - inter_count AS union_count,
       {sql_rnd('CAST(inter_count AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter_count AS DOUBLE)')} AS jaccard
FROM inter
JOIN sizes sa ON train_doc_id = sa.doc_id
JOIN sizes sb ON eval_doc_id = sb.doc_id
WHERE {sql_rnd('CAST(inter_count AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter_count AS DOUBLE)')} >= {JACCARD_THRESHOLD}
"""

# connected components over the verified near-dup graph: DuckDB's
# recursive CTE computes min-reachable-id per node — exactly what the
# Spark side's iterative min-label propagation converges to.
CLUSTERS_SQL = f"""
WITH RECURSIVE {MINHASH_CTE},
{_LSH_CAND_CTE},
{_HSH_CTE},
shsizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS inter_count
    FROM cand c
    JOIN hsh a ON a.doc_id = c.doc_a
    JOIN hsh b ON b.doc_id = c.doc_b AND b.g = a.g
    GROUP BY c.doc_a, c.doc_b
),
pairs AS MATERIALIZED (
    SELECT doc_a, doc_b
    FROM inter
    JOIN shsizes sa ON doc_a = sa.doc_id
    JOIN shsizes sb ON doc_b = sb.doc_id
    WHERE {sql_rnd('CAST(inter_count AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter_count AS DOUBLE)')} >= {JACCARD_THRESHOLD}
),
edges AS MATERIALIZED (
    SELECT doc_a AS node, doc_b AS nbr FROM pairs
    UNION ALL
    SELECT doc_b AS node, doc_a AS nbr FROM pairs
),
reach(node, label) AS (
    SELECT DISTINCT node, node FROM edges
    UNION
    SELECT e.node, r.label FROM edges e JOIN reach r ON r.node = e.nbr
),
comp AS (SELECT node, min(label) AS cluster_id FROM reach GROUP BY node),
csizes AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id)
SELECT c.node AS doc_id, c.cluster_id,
       CAST(s.cluster_size AS BIGINT) AS cluster_size,
       CAST(CASE WHEN c.node = c.cluster_id THEN 1 ELSE 0 END AS BIGINT) AS is_representative
FROM comp c JOIN csizes s USING (cluster_id)
"""

# the APPLY step: corpus minus non-representative cluster members
DEDUP_CORPUS_SQL = CLUSTERS_SQL.replace(
    """SELECT c.node AS doc_id, c.cluster_id,
       CAST(s.cluster_size AS BIGINT) AS cluster_size,
       CAST(CASE WHEN c.node = c.cluster_id THEN 1 ELSE 0 END AS BIGINT) AS is_representative
FROM comp c JOIN csizes s USING (cluster_id)""",
    """SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(length(d.text) AS BIGINT) AS n_chars
FROM documents d
ANTI JOIN (SELECT node FROM comp WHERE node <> cluster_id) dr
  ON CAST(d.doc_id AS BIGINT) = dr.node""",
)

# ================= corpus curation (end-to-end composition) =============

# curation thresholds — tuned against the synthetic corpus so every
# predicate actually discriminates (sf0.01: 500 docs -> 305 kept)
CURATE_MIN_TOKENS, CURATE_MAX_TOKENS = 20, 90
CURATE_MIN_STOPWORD = 0.02
CURATE_MIN_UNIQ = 0.35


def curate_corpus(docs: DataFrame,
                  max_band_bucket: int | None = DEFAULT_MAX_BAND_BUCKET) -> DataFrame:
    """The end-to-end training-data curation pipeline as ONE query:
    near-dup removal (LSH -> Jaccard -> connected components, keep the
    cluster representative) ∘ language filter (lang_id != 'und') ∘
    quality filter (token count band, stopword ratio floor, unique-token
    ratio floor). This is the composition a real corpus build runs — each
    stage is individually gated elsewhere; this entry gates that the
    stages compose without re-reading the corpus per stage.

    Scale: one pass computes all per-doc stats (token stats, quality,
    lang scores are column expressions over the same projection — no
    self-joins); the only heavy lifting is the dedup sub-DAG, whose
    bucket-restricted shape is documented at operators/dedup.py. The
    final filters are pushed into the post-anti-join projection.
    """
    t = tokens(F.col("text"))
    ntok = F.size(t)
    stats = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.length("text").cast("long").alias("n_chars"),
        ntok.cast("long").alias("n_tokens"),
        rnd(
            F.when(
                ntok > 0,
                F.size(F.filter(t, lambda x: x.isin(*STOPWORDS_EN))).cast("double")
                / ntok.cast("double"),
            ).otherwise(F.lit(0.0))
        ).alias("stopword_ratio"),
        rnd(
            F.when(
                ntok > 0,
                F.size(F.array_distinct(t)).cast("double") / ntok.cast("double"),
            ).otherwise(F.lit(0.0))
        ).alias("uniq_ratio"),
    )
    langs = lang_id(docs).select("doc_id", "pred_lang")
    kept = deduplicated_corpus(
        docs, JACCARD_THRESHOLD, max_band_bucket=max_band_bucket
    ).select("doc_id")
    return (
        stats.join(kept, "doc_id")
        .join(langs, "doc_id")
        .where(
            F.col("n_tokens").between(CURATE_MIN_TOKENS, CURATE_MAX_TOKENS)
            & (F.col("stopword_ratio") >= CURATE_MIN_STOPWORD)
            & (F.col("uniq_ratio") >= CURATE_MIN_UNIQ)
            & (F.col("pred_lang") != "und")
        )
        .select("doc_id", "pred_lang", "n_tokens", "n_chars",
                "stopword_ratio", "uniq_ratio")
    )


def curated_corpus_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    # oracle-compared: exhaustive dedup, no skew cap
    return curate_corpus(_docs(spark, sf_dir), max_band_bucket=None)


CURATION_STAGES = ["ingested", "lang_ok", "length_ok", "quality_ok", "dedup_kept"]


def curation_funnel_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation observability: how many documents (and tokens) survive
    each successive gate of the corpus build — ingest -> language ->
    length band -> quality ratios -> near-dup removal. The report every
    pipeline owner reads before trusting a corpus delta ("why did this
    crawl lose 40% at the quality gate?"); the per-doc verdicts are
    exactly ``curate_corpus``'s predicates, so stage 4's totals equal
    the curated corpus by construction.

    Scale: one projection computes all flags (the dedup drop list joins
    as a nullable marker); the funnel itself is ONE conditional
    aggregate over the flagged corpus — 5 output rows, unpivoted
    map-side from a single aggregate row, no per-stage re-scan.
    """
    from tickdatapipeline_spark.operators.dedup import duplicate_clusters

    docs = _docs(spark, sf_dir)
    t = tokens(F.col("text"))
    ntok = F.size(t)
    stats = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        ntok.cast("long").alias("n_tokens"),
        rnd(
            F.when(
                ntok > 0,
                F.size(F.filter(t, lambda x: x.isin(*STOPWORDS_EN))).cast("double")
                / ntok.cast("double"),
            ).otherwise(F.lit(0.0))
        ).alias("stopword_ratio"),
        rnd(
            F.when(
                ntok > 0,
                F.size(F.array_distinct(t)).cast("double") / ntok.cast("double"),
            ).otherwise(F.lit(0.0))
        ).alias("uniq_ratio"),
    )
    langs = lang_id(docs).select("doc_id", "pred_lang")
    dropped = (
        duplicate_clusters(docs, JACCARD_THRESHOLD, max_band_bucket=None)
        .where(F.col("is_representative") == 0)
        .select("doc_id", F.lit(True).alias("_dup"))
    )
    fl = (
        stats.join(langs, "doc_id")
        .join(dropped, "doc_id", "left")
        .select(
            "n_tokens",
            (F.col("pred_lang") != "und").alias("s1"),
            (
                (F.col("pred_lang") != "und")
                & F.col("n_tokens").between(CURATE_MIN_TOKENS, CURATE_MAX_TOKENS)
            ).alias("s2"),
            (
                (F.col("pred_lang") != "und")
                & F.col("n_tokens").between(CURATE_MIN_TOKENS, CURATE_MAX_TOKENS)
                & (F.col("stopword_ratio") >= CURATE_MIN_STOPWORD)
                & (F.col("uniq_ratio") >= CURATE_MIN_UNIQ)
            ).alias("s3"),
            F.col("_dup").isNull().alias("not_dup"),
        )
        .withColumn("s4", F.col("s3") & F.col("not_dup"))
    )
    zero = F.lit(0).cast("long")
    agg = fl.agg(
        F.count(F.lit(1)).alias("d0"),
        F.coalesce(F.sum("n_tokens"), zero).alias("t0"),
        *[
            c
            for i in (1, 2, 3, 4)
            for c in (
                F.coalesce(F.sum(F.when(F.col(f"s{i}"), 1).otherwise(0)), zero)
                .cast("long").alias(f"d{i}"),
                F.coalesce(F.sum(F.when(F.col(f"s{i}"), F.col("n_tokens"))), zero)
                .alias(f"t{i}"),
            )
        ],
    )
    rows = F.array(*[
        F.struct(
            F.lit(i).cast("long").alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.col(f"d{i}").alias("n_docs"),
            F.col(f"t{i}").alias("n_tokens"),
        )
        for i, name in enumerate(CURATION_STAGES)
    ])
    return agg.select(F.explode(rows).alias("r")).select(
        "r.stage_idx", "r.stage", "r.n_docs", "r.n_tokens"
    )


_CURATE_STATS_SUB = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(t) AS BIGINT) AS n_tokens,
       {sql_rnd(f"CASE WHEN len(t) > 0 THEN CAST(len(list_filter(t, x -> x IN {STOPWORDS_EN!r})) AS DOUBLE) / CAST(len(t) AS DOUBLE) ELSE 0.0 END")} AS stopword_ratio,
       {sql_rnd("CASE WHEN len(t) > 0 THEN CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE) ELSE 0.0 END")} AS uniq_ratio
FROM (SELECT doc_id, text, {SQL_TOKENS} AS t FROM documents)
"""

# reuse the full dedup-cluster CTE chain; swap only the final projection
CURATED_CORPUS_SQL = CLUSTERS_SQL.replace(
    """SELECT c.node AS doc_id, c.cluster_id,
       CAST(s.cluster_size AS BIGINT) AS cluster_size,
       CAST(CASE WHEN c.node = c.cluster_id THEN 1 ELSE 0 END AS BIGINT) AS is_representative
FROM comp c JOIN csizes s USING (cluster_id)""",
    f"""SELECT s.doc_id, l.pred_lang, s.n_tokens, s.n_chars,
       s.stopword_ratio, s.uniq_ratio
FROM ({_CURATE_STATS_SUB}) s
JOIN ({LANG_ID_SQL}) l USING (doc_id)
ANTI JOIN (SELECT node FROM comp WHERE node <> cluster_id) dr
  ON s.doc_id = dr.node
WHERE s.n_tokens BETWEEN {CURATE_MIN_TOKENS} AND {CURATE_MAX_TOKENS}
  AND s.stopword_ratio >= {CURATE_MIN_STOPWORD}
  AND s.uniq_ratio >= {CURATE_MIN_UNIQ}
  AND l.pred_lang <> 'und'""",
)

_FUNNEL_GATES = {
    "s1": "l.pred_lang <> 'und'",
    "s2": (
        f"l.pred_lang <> 'und' AND s.n_tokens BETWEEN {CURATE_MIN_TOKENS} "
        f"AND {CURATE_MAX_TOKENS}"
    ),
    "s3": (
        f"l.pred_lang <> 'und' AND s.n_tokens BETWEEN {CURATE_MIN_TOKENS} "
        f"AND {CURATE_MAX_TOKENS} AND s.stopword_ratio >= {CURATE_MIN_STOPWORD} "
        f"AND s.uniq_ratio >= {CURATE_MIN_UNIQ}"
    ),
}

# reuse the dedup-cluster CTE chain (comp = drop verdicts); the funnel
# itself nests its flag projection + conditional aggregates as the
# final query (DuckDB scopes outer CTEs into the subquery's WITH)
CURATION_FUNNEL_SQL = CLUSTERS_SQL.replace(
    """SELECT c.node AS doc_id, c.cluster_id,
       CAST(s.cluster_size AS BIGINT) AS cluster_size,
       CAST(CASE WHEN c.node = c.cluster_id THEN 1 ELSE 0 END AS BIGINT) AS is_representative
FROM comp c JOIN csizes s USING (cluster_id)""",
    f"""SELECT stage_idx, stage, n_docs, n_tokens FROM (
    WITH fl AS (
        SELECT s.n_tokens,
               ({_FUNNEL_GATES['s1']}) AS s1,
               ({_FUNNEL_GATES['s2']}) AS s2,
               ({_FUNNEL_GATES['s3']}) AS s3,
               ({_FUNNEL_GATES['s3']}) AND dr.node IS NULL AS s4
        FROM ({_CURATE_STATS_SUB}) s
        JOIN ({LANG_ID_SQL}) l USING (doc_id)
        LEFT JOIN (SELECT node FROM comp WHERE node <> cluster_id) dr
          ON s.doc_id = dr.node
    )
    SELECT CAST(0 AS BIGINT) AS stage_idx, 'ingested' AS stage,
           count(*) AS n_docs, CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS n_tokens FROM fl
    UNION ALL SELECT 1, 'lang_ok', count(*) FILTER (WHERE s1),
           CAST(coalesce(sum(n_tokens) FILTER (WHERE s1), 0) AS BIGINT) FROM fl
    UNION ALL SELECT 2, 'length_ok', count(*) FILTER (WHERE s2),
           CAST(coalesce(sum(n_tokens) FILTER (WHERE s2), 0) AS BIGINT) FROM fl
    UNION ALL SELECT 3, 'quality_ok', count(*) FILTER (WHERE s3),
           CAST(coalesce(sum(n_tokens) FILTER (WHERE s3), 0) AS BIGINT) FROM fl
    UNION ALL SELECT 4, 'dedup_kept', count(*) FILTER (WHERE s4),
           CAST(coalesce(sum(n_tokens) FILTER (WHERE s4), 0) AS BIGINT) FROM fl
)""",
)

# ================= similarity search =================

SQL_VEC = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
# left-fold accumulation == Spark F.aggregate(zip_with(...), 0.0, +)
SQL_DOT = "list_reduce(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
SQL_NORM = "sqrt(list_reduce(list_transform({a}, x -> x * x), (x, y) -> x + y))"

TOPK_K, QUERY_MOD = 5, 50


def sql_cos_raw(a: str, b: str) -> str:
    """Unrounded SQL cosine with the zero-norm guard — the DuckDB twin
    of operators.similarity._cos_sim (nullif'd denominator -> NULL on a
    zero vector). Every oracle cosine goes through this so degenerate
    behavior is identical cross-engine, not fixture-dependent: a zero
    embedding yields NULL in BOTH engines (and NULLS LAST in every DESC
    rank window), never an engine-specific division result."""
    return (SQL_DOT.format(a=a, b=b) + " / nullif("
            + SQL_NORM.format(a=a) + " * " + SQL_NORM.format(a=b) + ", 0)")


def sql_cos(a: str, b: str, digits: int | None = None) -> str:
    """Rounded (sql_rnd) guarded SQL cosine — see sql_cos_raw."""
    return sql_rnd(sql_cos_raw(a, b)) if digits is None else sql_rnd(
        sql_cos_raw(a, b), digits)


_cos = sql_cos("q.v", "b.v")

def _brute_topk_sql(prelude_ctes: str, k: int | None = None) -> str:
    """q/scored/rank algebra shared by the brute-force and SQ8 oracles
    — the SQL twin of operators.similarity._brute_topk. ``prelude_ctes``
    must define a CTE ``base`` with (vec_id, v). ``k`` defaults to
    TOPK_K; the rerank oracle passes RERANK_R for its candidate
    stage."""
    k = TOPK_K if k is None else k
    return f"""
WITH {prelude_ctes},
q AS (SELECT vec_id AS query_id, v FROM base WHERE vec_id % {QUERY_MOD} = 0),
scored AS (
    SELECT q.query_id, b.vec_id AS neighbor_id, {_cos} AS cosine
    FROM base b JOIN q ON b.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, rank, cosine FROM (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
    FROM scored
) WHERE rank <= {k}
"""


COSINE_TOPK_SQL = _brute_topk_sql(
    f"base AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, {SQL_VEC} AS v FROM embeddings)"
)


def _sql_plane_list(p: int) -> str:
    return "[" + ", ".join(f"{float(_plane_weight(p, d))!r}" for d in range(DIM)) + "]"


def _sql_bucket(vcol: str) -> str:
    terms = []
    for p in range(LSH_PLANES):
        dp = SQL_DOT.format(a=_sql_plane_list(p), b=vcol)
        terms.append(f"CASE WHEN ({dp}) > 0.0 THEN {1 << p} ELSE 0 END")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


ANN_HIST_SQL = f"""
SELECT bucket, count(*) AS n_vectors, min(vec_id) AS min_vec_id
FROM (SELECT CAST(vec_id AS BIGINT) AS vec_id, {_sql_bucket(SQL_VEC)} AS bucket FROM embeddings)
GROUP BY bucket
"""

IVF_SQL = f"""
WITH base AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, {SQL_VEC} AS v FROM embeddings),
cents AS (SELECT vec_id AS cell, v AS c FROM base WHERE vec_id < 8),
cscored AS (
    SELECT b.vec_id, b.v, cell,
           {sql_cos("b.v", "c")} AS sim
    FROM base b CROSS JOIN cents
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS crank
    FROM cscored
),
assigned AS (SELECT vec_id, cell FROM ranked WHERE crank = 1),
probes AS (SELECT vec_id, cell AS probe_cell FROM ranked WHERE crank <= 2),
q AS (
    SELECT p.vec_id AS query_id, b.v AS q, p.probe_cell
    FROM probes p JOIN base b ON p.vec_id = b.vec_id
    WHERE p.vec_id % {{query_mod}} = 0
),
cand AS (SELECT a.vec_id, b.v, a.cell FROM assigned a JOIN base b ON a.vec_id = b.vec_id),
scored AS (
    SELECT q.query_id, cand.vec_id AS neighbor_id,
           {sql_cos("q.q", "cand.v")} AS cosine
    FROM cand JOIN q ON cand.cell = q.probe_cell AND cand.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, rank, cosine FROM (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
    FROM scored
) WHERE rank <= {{k}}
"""

def _sq8_topk_sql(levels: float = 255.0) -> str:
    """DuckDB twin of sq8_dequantized + brute top-k: per-dimension
    min/max bounds (one aggregate row), fixed-order quantize/dequantize
    arithmetic (dlit literals — bare decimals parse as DECIMAL and can
    lose a ulp), then the shared cosine top-k algebra."""
    from tickdatapipeline_spark.oracle import dlit

    lv, half = dlit(levels), dlit(0.5)
    mn_list = "[" + ", ".join(f"min(v[{d + 1}])" for d in range(DIM)) + "]"
    mx_list = "[" + ", ".join(f"max(v[{d + 1}])" for d in range(DIM)) + "]"
    deq = (
        f"list_transform(range(1, {DIM + 1}), i -> "
        f"CASE WHEN mx[i] > mn[i] THEN mn[i] + "
        f"least(greatest(floor((v[i] - mn[i]) * {lv} / (mx[i] - mn[i]) + {half}), 0), {int(levels)})"
        f" * (mx[i] - mn[i]) / {lv} ELSE mn[i] END)"
    )
    return _brute_topk_sql(
        f"raw AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, {SQL_VEC} AS v FROM embeddings),\n"
        f"bounds AS (SELECT {mn_list} AS mn, {mx_list} AS mx FROM raw),\n"
        f"base AS (SELECT vec_id, {deq} AS v FROM raw CROSS JOIN bounds)"
    )


def _pq_d2_sql(sub_dim: int) -> str:
    """The shared rounded fixed-order subvector L2^2 (aliases t/cb) —
    one distance for training assignment AND encoding argmin, matching
    operators.similarity._pq_d2 bit-for-bit."""
    return sql_rnd(
        f"list_reduce(list_transform(range(1, {sub_dim + 1}), "
        f"i -> (t.s[i] - cb.c[i]) * (t.s[i] - cb.c[i])), (x, y) -> x + y)",
        6,
    )


def _pq_train_ctes(sub_cte: str, n_sub: int, k_codes: int, sub_dim: int,
                   iters: int, prefix: str = "") -> "tuple[list, str]":
    """Unrolled per-subspace Lloyd's training as chained CTEs — the
    DuckDB twin of operators.similarity.pq_train (rounded assignment
    d2, ties to lowest code, Q30 fixed-point integer means, empty codes
    carry forward), same pattern as ivf_kmeans_sql's coarse unroll.
    ``sub_cte`` is the TRAINING subvector CTE — callers pass the
    deterministically sampled twin of Spark's vec_id % sample_mod
    predicate (the encoding argmin downstream still scores the full
    corpus). Seeding is rank-based (r14): codes are numbered by
    row_number over the distinct training vec_ids, matching pq_train's
    shifted-id-safe init. Returns (cte_list,
    final_codebook_cte_name); the final codebook has columns
    (code, m, c)."""
    from tickdatapipeline_spark.operators.similarity import KMEANS_Q

    d2 = _pq_d2_sql(sub_dim)
    ctes = [
        f"{prefix}seed AS (SELECT vec_id, "
        f"CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) - 1 AS code "
        f"FROM (SELECT DISTINCT vec_id FROM {sub_cte}) dvi)",
        f"{prefix}cb0 AS (SELECT s.code, t.m, t.s AS c "
        f"FROM {sub_cte} t JOIN {prefix}seed s USING (vec_id) "
        f"WHERE s.code < {k_codes})",
    ]
    for i in range(1, iters + 1):
        p = f"{prefix}cb{i - 1}"
        ctes.append(
            f"{prefix}ps{i} AS (SELECT t.vec_id, t.m, t.s, cb.code, {d2} AS d2 "
            f"FROM {sub_cte} t JOIN {p} cb ON t.m = cb.m)"
        )
        ctes.append(
            f"{prefix}pa{i} AS (SELECT m, code, s FROM ("
            f"SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, code) AS rn "
            f"FROM {prefix}ps{i}) WHERE rn = 1)"
        )
        ctes.append(
            f"{prefix}pm{i} AS (SELECT m, code, pos, "
            f"CAST(sum(CAST(floor(x * {KMEANS_Q} + 0.5) AS BIGINT)) AS DOUBLE) / count(*) / {KMEANS_Q} AS mu "
            f"FROM (SELECT m, code, j AS pos, s[j] AS x FROM {prefix}pa{i} "
            f"CROSS JOIN (SELECT unnest(range(1, {sub_dim + 1})) AS j)) "
            f"GROUP BY m, code, pos)"
        )
        ctes.append(
            f"{prefix}cb{i} AS (SELECT p.code, p.m, "
            f"CASE WHEN n.c IS NULL THEN p.c ELSE n.c END AS c "
            f"FROM {p} p LEFT JOIN "
            f"(SELECT m, code, list(mu ORDER BY pos) AS c FROM {prefix}pm{i} GROUP BY m, code) n "
            f"USING (m, code))"
        )
    return ctes, f"{prefix}cb{iters}"


def _pq_prelude_ctes(n_sub: "int | None" = None,
                     k_codes: "int | None" = None) -> str:
    """The shared PQ oracle prelude: raw vectors -> subvector
    explosion -> unrolled per-subspace Lloyd training (_pq_train_ctes)
    -> encoding argmin -> CTE ``base`` = (vec_id, v-reconstructed).
    ``raw`` (the unquantized vectors) stays in scope for the ADC
    variant's query side. Codebook shape defaults to the Spark side's
    PQ_M/PQ_K so the two engines can never drift apart."""
    from tickdatapipeline_spark.operators.similarity import (
        PQ_ITERS, PQ_K, PQ_M)

    from tickdatapipeline_spark.operators.similarity import (
        TRAIN_SAMPLE_TARGET)

    n_sub = PQ_M if n_sub is None else n_sub
    k_codes = PQ_K if k_codes is None else k_codes
    sub = DIM // n_sub
    d2 = _pq_d2_sql(sub)
    target = max(100 * k_codes, TRAIN_SAMPLE_TARGET)
    train_ctes, cb_final = _pq_train_ctes("subt", n_sub, k_codes, sub,
                                          PQ_ITERS)
    train_block = ",\n".join(train_ctes)
    return f"""raw AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, {SQL_VEC} AS v FROM embeddings),
sub AS (
    SELECT vec_id, m, list_transform(range(1, {sub + 1}), i -> v[m * {sub} + i]) AS s
    FROM raw, (SELECT unnest(range(0, {n_sub})) AS m) ms
),
smod AS (SELECT greatest(1, count(*) // {target}) AS sm FROM raw),
subt AS (SELECT sub.* FROM sub WHERE vec_id % (SELECT sm FROM smod) = 0),
{train_block},
pqscored AS (
    SELECT t.vec_id, t.m, cb.code, cb.c, {d2} AS d2
    FROM sub t JOIN {cb_final} cb ON t.m = cb.m
),
win AS (
    SELECT vec_id, m, c FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, code) AS rn
        FROM pqscored
    ) WHERE rn = 1
),
base AS (SELECT vec_id, flatten(list(c ORDER BY m)) AS v FROM win GROUP BY vec_id)"""


def _pq_topk_sql(n_sub: "int | None" = None, k_codes: "int | None" = None,
                 k: "int | None" = None) -> str:
    """DuckDB twin of pq_dequantized + brute top-k: codebooks k-means-
    TRAINED per subspace (unrolled Lloyd CTEs, _pq_train_ctes) seeded
    from the k_codes lowest vec_ids' subvectors, fixed-order L2^2 folds
    rounded before the argmin, reconstruction re-concatenated in
    subspace order (list(c ORDER BY m) -> flatten), then the shared
    cosine top-k algebra."""
    return _brute_topk_sql(_pq_prelude_ctes(n_sub, k_codes), k=k)


def _pq_adc_topk_sql(n_sub: "int | None" = None,
                     k_codes: "int | None" = None,
                     k: "int | None" = None) -> str:
    """DuckDB twin of ann_topk_pq_adc: the same trained-PQ prelude,
    but the query side comes from ``raw`` (unquantized vectors) while
    neighbors score through their reconstruction — asymmetric
    distance."""
    k = TOPK_K if k is None else k
    return f"""
WITH {_pq_prelude_ctes(n_sub, k_codes)},
q AS (SELECT vec_id AS query_id, v FROM raw WHERE vec_id % {QUERY_MOD} = 0),
scored AS (
    SELECT q.query_id, b.vec_id AS neighbor_id, {_cos} AS cosine
    FROM base b JOIN q ON b.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, rank, cosine FROM (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
    FROM scored
) WHERE rank <= {k}
"""


def _ann_recall_ivf_sql() -> str:
    """Recall@k of the IVF ANN path vs brute force: both existing
    oracle plans composed as subqueries (DuckDB allows WITH inside a
    parenthesized subquery), then the same count/join/round algebra as
    operators.similarity.ann_recall."""
    return _ann_recall_sql(IVF_SQL.format(query_mod=QUERY_MOD, k=TOPK_K))


def _ann_recall_sql(approx: str) -> str:
    """Shared recall@k composition: any approximate plan's SQL against
    the brute-force ground truth."""
    exact = COSINE_TOPK_SQL
    return f"""
WITH exact AS (SELECT * FROM ({exact})),
approx AS (SELECT * FROM ({approx})),
tot AS (SELECT query_id, count(*) AS n_exact FROM exact GROUP BY query_id),
hit AS (
    SELECT e.query_id, count(*) AS n_hit
    FROM exact e JOIN approx a
      ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
    GROUP BY e.query_id
)
SELECT tot.query_id, n_exact, CAST(COALESCE(n_hit, 0) AS BIGINT) AS n_hit,
       {sql_rnd("CAST(COALESCE(n_hit, 0) AS DOUBLE) / CAST(n_exact AS DOUBLE)")} AS recall
FROM tot LEFT JOIN hit ON tot.query_id = hit.query_id
"""


def ivf_kmeans_sql(query_mod: int, k: int, n_cells: int = 8, nprobe: int = 2,
                   iters: int = 4) -> str:
    """DuckDB twin of kmeans_train + ann_topk_ivf: Lloyd's iterations
    unrolled as chained CTEs. Reproducible because the Spark trainer
    (operators/similarity.py::kmeans_train) uses rounded assignment sims
    (deterministic argmax) and Q30 fixed-point integer centroid sums
    (order-independent), so every iteration matches bit-for-bit."""
    from tickdatapipeline_spark.operators.similarity import (
        KMEANS_Q, TRAIN_SAMPLE_TARGET)

    target = max(100 * n_cells, TRAIN_SAMPLE_TARGET)
    sim = sql_cos("b.v", "c.c")
    ctes = [
        f"base AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, {SQL_VEC} AS v FROM embeddings)",
        # deterministic training sample + rank-based seeding — the
        # twins of kmeans_train's sample_mod predicate and its
        # shifted-id-safe init (r14)
        f"smod AS (SELECT greatest(1, count(*) // {target}) AS sm FROM base)",
        "traink AS (SELECT base.* FROM base WHERE vec_id % (SELECT sm FROM smod) = 0)",
        f"cents0 AS (SELECT cell, c FROM ("
        f"SELECT CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) - 1 AS cell, v AS c "
        f"FROM traink) WHERE cell < {n_cells})",
    ]
    for i in range(1, iters + 1):
        p = f"cents{i - 1}"
        ctes.append(
            f"s{i} AS (SELECT b.vec_id, b.v, c.cell, {sim} AS sim "
            f"FROM traink b CROSS JOIN {p} c)"
        )
        ctes.append(
            f"a{i} AS (SELECT vec_id, v, cell FROM ("
            f"SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS r "
            f"FROM s{i}) WHERE r = 1)"
        )
        ctes.append(
            f"m{i} AS (SELECT cell, pos, "
            f"CAST(sum(CAST(floor(x * {KMEANS_Q} + 0.5) AS BIGINT)) AS DOUBLE) / count(*) / {KMEANS_Q} AS m "
            f"FROM (SELECT cell, i AS pos, v[i] AS x FROM a{i} "
            f"CROSS JOIN (SELECT unnest(range(1, len((SELECT v FROM base LIMIT 1)) + 1)) AS i)) "
            f"GROUP BY cell, pos)"
        )
        ctes.append(
            f"cents{i} AS (SELECT p.cell, CASE WHEN n.c IS NULL THEN p.c ELSE n.c END AS c "
            f"FROM {p} p LEFT JOIN "
            f"(SELECT cell, list(m ORDER BY pos) AS c FROM m{i} GROUP BY cell) n USING (cell))"
        )
    search_sim = sim  # same expression, now against the trained centroids
    qcos = sql_cos("q.q", "cand.v")
    ctes += [
        f"cscored AS (SELECT b.vec_id, b.v, c.cell, {search_sim} AS sim "
        f"FROM base b CROSS JOIN cents{iters} c)",
        "ranked AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS crank FROM cscored)",
        "assigned AS (SELECT vec_id, cell FROM ranked WHERE crank = 1)",
        f"probes AS (SELECT vec_id, cell AS probe_cell FROM ranked WHERE crank <= {nprobe})",
        f"q AS (SELECT p.vec_id AS query_id, b.v AS q, p.probe_cell "
        f"FROM probes p JOIN base b ON p.vec_id = b.vec_id WHERE p.vec_id % {query_mod} = 0)",
        "cand AS (SELECT a.vec_id, b.v, a.cell FROM assigned a JOIN base b ON a.vec_id = b.vec_id)",
        f"scored AS (SELECT q.query_id, cand.vec_id AS neighbor_id, {qcos} AS cosine "
        f"FROM cand JOIN q ON cand.cell = q.probe_cell AND cand.vec_id <> q.query_id)",
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT query_id, neighbor_id, rank, cosine FROM ("
        "SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank "
        f"FROM scored) WHERE rank <= {k}"
    )


EMBED_NEAR_DUP_THRESHOLD = 0.25
_pair_cos = sql_cos("a.v", "b.v")

EMBED_NEAR_DUP_SQL = f"""
WITH base AS (
    SELECT CAST(vec_id AS BIGINT) AS vec_id, {SQL_VEC} AS v, {_sql_bucket(SQL_VEC)} AS bucket
    FROM embeddings
)
SELECT vec_a, vec_b, cosine FROM (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {_pair_cos} AS cosine
    FROM base a JOIN base b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
) WHERE cosine >= {EMBED_NEAR_DUP_THRESHOLD}
"""

# components over the embedding near-dup graph (same recursive-CTE
# equivalence as CLUSTERS_SQL)
EMBED_CLUSTERS_SQL = f"""
WITH RECURSIVE base AS MATERIALIZED (
    SELECT CAST(vec_id AS BIGINT) AS vec_id, {SQL_VEC} AS v, {_sql_bucket(SQL_VEC)} AS bucket
    FROM embeddings
),
pairs AS MATERIALIZED (
    SELECT vec_a, vec_b FROM (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {_pair_cos} AS cosine
        FROM base a JOIN base b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    ) WHERE cosine >= {EMBED_NEAR_DUP_THRESHOLD}
),
edges AS MATERIALIZED (
    SELECT vec_a AS node, vec_b AS nbr FROM pairs
    UNION ALL
    SELECT vec_b AS node, vec_a AS nbr FROM pairs
),
reach(node, label) AS (
    SELECT DISTINCT node, node FROM edges
    UNION
    SELECT e.node, r.label FROM edges e JOIN reach r ON r.node = e.nbr
),
comp AS (SELECT node, min(label) AS cluster_id FROM reach GROUP BY node),
csizes AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id)
SELECT c.node AS vec_id, c.cluster_id,
       CAST(s.cluster_size AS BIGINT) AS cluster_size,
       CAST(CASE WHEN c.node = c.cluster_id THEN 1 ELSE 0 END AS BIGINT) AS is_representative
FROM comp c JOIN csizes s USING (cluster_id)
"""

ANN_TOPK_LSH_SQL = f"""
WITH base AS (
    SELECT CAST(vec_id AS BIGINT) AS vec_id, {SQL_VEC} AS v, {_sql_bucket(SQL_VEC)} AS bucket
    FROM embeddings
),
q AS (SELECT vec_id AS query_id, v, bucket AS qb FROM base WHERE vec_id % {QUERY_MOD} = 0),
scored AS (
    SELECT q.query_id, b.vec_id AS neighbor_id, {_cos} AS cosine
    FROM base b JOIN q ON b.bucket = q.qb AND b.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, rank, cosine FROM (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
    FROM scored
) WHERE rank <= {TOPK_K}
"""

# ================= as-of join =================


def asof_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach each click event's most recent prior purchase (per user).

    Right side pre-aggregated to one row per (user_id, ts) so tie-breaks
    are deterministic in both engines.
    """
    ev = read_events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"), F.max("event_id").alias("purchase_event_id"))
    )
    out = asof_join(clicks, purchases, on="user_id", left_time="ts", right_time="ts",
                    value_cols=["purchase_value", "purchase_event_id"])
    return out.select("event_id", "user_id", "asof_purchase_value", "asof_purchase_event_id")


ASOF_SQL = """
WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
purchases AS (
    SELECT user_id, ts, max(value) AS purchase_value, max(event_id) AS purchase_event_id
    FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT c.event_id, c.user_id,
       p.purchase_value AS asof_purchase_value,
       p.purchase_event_id AS asof_purchase_event_id
FROM clicks c ASOF LEFT JOIN purchases p ON c.user_id = p.user_id AND c.ts >= p.ts
"""

# ================= event-time windows (absent in the reference) ==========


def windowed_events_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows — the batch twin of the
    Structured Streaming windowed aggregation (F.window on the decoded
    timestamp works identically under readStream with a watermark).

    This session reads ns-timestamp parquet as epoch-nanos longs
    (nanosAsLong), so the bucket is integer epoch math — which also
    keeps the oracle comparison free of timestamp-dtype skew.
    """
    ev = read_events(spark, sf_dir)
    bucket = F.expr("(ts DIV 1000000000 DIV 3600) * 3600")
    vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")  # exact cents
    return (
        ev.groupBy(bucket.alias("window_start_s"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), (F.sum(vc) / 100.0).alias("sum_value"))
    )


WINDOWED_EVENTS_SQL = """
SELECT (epoch_us(ts) // 1000000 // 3600) * 3600 AS window_start_s, event_type,
       count(*) AS n_events,
       sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_value
FROM events
GROUP BY 1, 2
"""

def hourly_gapfill(ev: DataFrame, max_span_hours: int = 24 * 366 * 20) -> DataFrame:
    """Resample events onto a dense hourly grid per event type —
    hours with no events appear with zero counts, and the last observed
    hourly average value carries forward (the time-series gap-fill /
    regularization step dashboards and feature pipelines need before
    treating event data as an evenly spaced series). Input: an
    events-shaped frame with ts (epoch nanos), event_type, value.

    Cross-engine exactness: the grid is integer epoch-hour math; counts
    and value sums are exact BIGINT cents; the forward-filled average is
    derived from identical integers (one division) and rounded with the
    shared rnd policy. Hours before a type's first observation stay
    NULL (nothing to carry).

    Scale: the hourly aggregate reduces the raw stream map-side first;
    the grid frame is hours x types built from a 1-row bounds aggregate
    (sequence + explode — never a driver loop) cross-joined with the
    tiny distinct-types frame, so grid size is O(hours * |types|)
    regardless of event volume. The forward-fill window partitions by
    event_type over grid rows only (~10^4-10^5 rows/type even at
    decade spans) — never over raw events.

    Dirty-timestamp guard: the grid spans min..max observed hour, so at
    corpus scale ONE corrupt row (epoch-0, or a far-future garbage
    nanosecond value) silently inflates the grid ~100x or aborts at
    sequence()'s array-length ceiling. If the observed span exceeds
    ``max_span_hours`` (default 20 years) the query raises in-plan with
    both bounds in the message — the check is folded into the grid's
    upper bound itself, so the optimizer cannot prune it. Raising (vs
    clamping) is deliberate: which end of the span is garbage is a data
    call the pipeline owner must make; filter the input and rerun.
    """
    from pyspark.sql import Window
    hour = F.expr("(ts DIV 1000000000 DIV 3600) * 3600")
    vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    with_h = ev.select(hour.alias("hour_s"), "event_type", vc.alias("vc"))
    hourly = with_h.groupBy("hour_s", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("vc").alias("sum_vc")
    )
    bounds = with_h.agg(F.min("hour_s").alias("lo"), F.max("hour_s").alias("hi"))
    # NULL-safe (empty input keeps hi NULL -> sequence NULL -> explode
    # emits nothing, as before the guard)
    span_ok = F.col("hi").isNull() | (
        F.col("hi") - F.col("lo") <= F.lit(3600 * max_span_hours).cast("long")
    )
    hi_checked = F.when(span_ok, F.col("hi")).otherwise(
        F.raise_error(
            F.format_string(
                "hourly_gapfill: observed hour span [%s, %s] exceeds "
                f"max_span_hours={max_span_hours} — corrupt timestamps in the "
                "input? Filter them (or raise max_span_hours) and rerun.",
                F.col("lo"), F.col("hi"),
            )
        )
    )
    hours = bounds.select(
        F.explode(F.sequence(F.col("lo"), hi_checked, F.lit(3600).cast("long"))).alias("hour_s")
    )
    types = ev.select("event_type").distinct()
    grid = hours.crossJoin(types)
    w = Window.partitionBy("event_type").orderBy("hour_s")
    avg_obs = F.col("sum_vc").cast("double") / F.col("n_events")
    return (
        grid.join(hourly, ["hour_s", "event_type"], "left")
        .select(
            "hour_s",
            "event_type",
            F.coalesce("n_events", F.lit(0).cast("long")).alias("n_events"),
            (F.coalesce("sum_vc", F.lit(0).cast("long")) / 100.0).alias("sum_value"),
            rnd(F.last(avg_obs, ignorenulls=True).over(w) / 100.0).alias("ffill_avg_value"),
        )
    )


def hourly_gapfill_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hourly_gapfill(read_events(spark, sf_dir))


HOURLY_GAPFILL_SQL = f"""
WITH e AS (
    SELECT (epoch_us(ts) // 1000000 // 3600) * 3600 AS hour_s, event_type,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
    FROM events
),
hourly AS (
    SELECT hour_s, event_type, count(*) AS n_events,
           CAST(sum(vc) AS BIGINT) AS sum_vc
    FROM e GROUP BY 1, 2
),
bounds AS (SELECT min(hour_s) AS lo, max(hour_s) AS hi FROM e),
hours AS (SELECT unnest(range(lo, hi + 3600, 3600)) AS hour_s FROM bounds),
grid AS (SELECT hour_s, event_type
         FROM hours CROSS JOIN (SELECT DISTINCT event_type FROM events))
SELECT g.hour_s, g.event_type,
       coalesce(n_events, 0) AS n_events,
       coalesce(sum_vc, 0) / 100.0 AS sum_value,
       {sql_rnd("last_value(CAST(sum_vc AS DOUBLE) / n_events IGNORE NULLS) OVER (PARTITION BY g.event_type ORDER BY g.hour_s ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0")} AS ffill_avg_value
FROM grid g
LEFT JOIN hourly h ON g.hour_s = h.hour_s AND g.event_type = h.event_type
"""


def interarrival_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival statistics — min/mean/max gap between a
    user's consecutive events (users with >= 2 events): the 'how bursty
    is this actor' profile behind rate-limit tuning, bot detection and
    session-gap calibration.

    Cross-engine exactness: gaps are exact integer microseconds from a
    per-user lag; min/max stay integral, and the mean divides two exact
    integers (sum of gaps telescopes, but is computed as an explicit
    SUM so duplicate timestamps need no special-casing), rounded with
    the shared policy.

    Scale: ONE hash exchange on user_id serves both the lag window and
    the aggregate (same key, Catalyst reuses the partitioning); output
    is one row per multi-event user.
    """
    from pyspark.sql import Window

    ev = read_events(spark, sf_dir).select(
        "user_id", "event_id", F.expr("ts DIV 1000").alias("tus")
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    gap = (F.col("tus") - F.lag("tus").over(w)).alias("gap_us")
    return (
        ev.select("user_id", gap)
        .where(F.col("gap_us").isNotNull())
        .groupBy("user_id")
        .agg(
            (F.count(F.lit(1)) + 1).alias("n_events"),
            F.min("gap_us").alias("min_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
            rnd(F.sum("gap_us").cast("double") / F.count(F.lit(1))).alias("mean_gap_us"),
        )
    )


INTERARRIVAL_SQL = """
WITH g AS (
    SELECT user_id,
           epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
    FROM events
)
SELECT user_id,
       count(*) + 1 AS n_events,
       min(gap_us) AS min_gap_us,
       max(gap_us) AS max_gap_us,
       (floor((CAST(sum(gap_us) AS DOUBLE) / count(*)) * 1000000.0 + 0.5) / 1000000.0) AS mean_gap_us
FROM g
WHERE gap_us IS NOT NULL
GROUP BY user_id
"""


HIST_BIN_CENTS = 2_000  # $20-wide equal bins over the value range


def value_histogram_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram of event values per event type — the
    distribution sketch behind dashboards and drift monitors. Bins are
    fixed-width in exact cents (bin_id = vc DIV width), so bucketing is
    pure integer map-side math: one map-side-combinable groupBy on
    (event_type, bin_id), output O(|types| * |bins|) rows regardless of
    event volume. Empty bins are absent by construction (the gap-fill
    twin is events_hourly_gapfill's job on the time axis).
    """
    ev = read_events(spark, sf_dir)
    vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    # FLOOR division whatever the sign (refund-shaped negative values):
    # Spark DIV truncates toward zero while the oracle's // floors, so
    # the negative branch is spelled out (same hazard as the power-
    # iteration rescale).
    w = HIST_BIN_CENTS
    floor_div = (
        f"CASE WHEN vc < 0 THEN -((-vc + {w - 1}) DIV {w}) ELSE vc DIV {w} END"
    )
    return (
        ev.select("event_type", vc.alias("vc"))
        .withColumn("bin_id", F.expr(floor_div))
        .groupBy("event_type", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum("vc") / 100.0).alias("sum_value"),
        )
        .select(
            "event_type", "bin_id", "n_events",
            (F.lit(HIST_BIN_CENTS) * F.col("bin_id") / 100.0).alias("bin_lo"),
            "sum_value",
        )
    )


VALUE_HISTOGRAM_SQL = f"""
SELECT event_type, vc // {HIST_BIN_CENTS} AS bin_id,
       count(*) AS n_events,
       {HIST_BIN_CENTS} * (vc // {HIST_BIN_CENTS}) / 100.0 AS bin_lo,
       CAST(sum(vc) AS BIGINT) / 100.0 AS sum_value
FROM (SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc FROM events)
GROUP BY 1, 2
"""


CORR_X_TYPE = "view"
CORR_Y_TYPE = "click"
CORR_WINDOW_H = 24


def rolling_corr(ev: DataFrame, window_h: int = CORR_WINDOW_H) -> DataFrame:
    """Trailing 24-hour Pearson correlation between the hourly counts
    of two event types (view vs click) — the 'do these two activity
    series move together' monitoring query over event streams.

    Cross-engine exactness: hourly counts are exact integers on a dense
    zero-filled grid; the correlation is derived from the five windowed
    INTEGER sums (n, Sx, Sy, Sxy, Sxx, Syy) via the textbook closed
    form, so the only float ops are one subtraction-product chain, two
    sqrts and a division on identical integers — then the shared rnd
    policy. Zero-variance windows yield NULL.

    Scale: the raw stream reduces to one map-side-combinable hourly
    aggregate first; every windowed quantity runs over GRID rows only
    (O(hours) — ~9 K/year, bounded regardless of event volume), so the
    global-order window is a post-aggregate micro-frame, not a stream
    sort. Counts here bound the int64 cross-moments to ~10^9
    events/hour; past that, pre-scale the counts.
    """
    from pyspark.sql import Window

    hour = F.expr("(ts DIV 1000000000 DIV 3600) * 3600")
    hourly = ev.groupBy(hour.alias("hour_s")).agg(
        F.sum(F.when(F.col("event_type") == CORR_X_TYPE, 1).otherwise(0))
        .cast("long").alias("x"),
        F.sum(F.when(F.col("event_type") == CORR_Y_TYPE, 1).otherwise(0))
        .cast("long").alias("y"),
    )
    bounds = ev.select(hour.alias("h")).agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    hours = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"), F.lit(3600).cast("long"))).alias("hour_s")
    )
    g = hours.join(hourly, on="hour_s", how="left").select(
        "hour_s",
        F.coalesce("x", F.lit(0).cast("long")).alias("x"),
        F.coalesce("y", F.lit(0).cast("long")).alias("y"),
    )
    w = Window.orderBy("hour_s").rowsBetween(-(window_h - 1), 0)
    n = F.count(F.lit(1)).over(w)
    sx = F.sum("x").over(w)
    sy = F.sum("y").over(w)
    sxy = F.sum(F.col("x") * F.col("y")).over(w)
    sxx = F.sum(F.col("x") * F.col("x")).over(w)
    syy = F.sum(F.col("y") * F.col("y")).over(w)
    num = (n * sxy - sx * sy).cast("double")
    dx = (n * sxx - sx * sx).cast("double")
    dy = (n * syy - sy * sy).cast("double")
    corr = F.when((dx > 0) & (dy > 0), rnd(num / (F.sqrt(dx) * F.sqrt(dy))))
    return g.select(
        "hour_s",
        n.alias("n_hours"),
        sx.alias("sum_x"),
        sy.alias("sum_y"),
        corr.alias(f"corr_{window_h}h"),  # named for the actual window
    )


def rolling_corr_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rolling_corr(read_events(spark, sf_dir))


ROLLING_CORR_SQL = f"""
WITH e AS (
    SELECT (epoch_us(ts) // 1000000 // 3600) * 3600 AS hour_s, event_type
    FROM events
),
hourly AS (
    SELECT hour_s,
           CAST(sum(CASE WHEN event_type = '{CORR_X_TYPE}' THEN 1 ELSE 0 END) AS BIGINT) AS x,
           CAST(sum(CASE WHEN event_type = '{CORR_Y_TYPE}' THEN 1 ELSE 0 END) AS BIGINT) AS y
    FROM e GROUP BY 1
),
bounds AS (SELECT min(hour_s) AS lo, max(hour_s) AS hi FROM e),
g AS (
    SELECT h.hour_s, coalesce(x, 0) AS x, coalesce(y, 0) AS y
    FROM (SELECT unnest(range(lo, hi + 3600, 3600)) AS hour_s FROM bounds) h
    LEFT JOIN hourly USING (hour_s)
),
m AS (
    SELECT hour_s,
           count(*) OVER w AS n,
           CAST(sum(x) OVER w AS BIGINT) AS sx,
           CAST(sum(y) OVER w AS BIGINT) AS sy,
           CAST(sum(x * y) OVER w AS BIGINT) AS sxy,
           CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
           CAST(sum(y * y) OVER w AS BIGINT) AS syy
    FROM g
    WINDOW w AS (ORDER BY hour_s
                 ROWS BETWEEN {CORR_WINDOW_H - 1} PRECEDING AND CURRENT ROW)
)
SELECT hour_s, n AS n_hours, sx AS sum_x, sy AS sum_y,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN {sql_rnd("CAST(n * sxy - sx * sy AS DOUBLE) / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))")}
       END AS corr_24h
FROM m
"""


def distinct_users_daily_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact daily active users — count(DISTINCT user_id) per epoch day.

    Scale: Catalyst expands the distinct count into a two-phase plan
    (partial distinct on (day, user) map-side, then a count per day),
    so the shuffle carries deduplicated pairs — the formulation that
    survives billions of events/day. The HLL sketch swap for
    cardinalities where even the pair shuffle is too wide is the
    `events_distinct_users_daily_approx` registry twin (rows-only, like
    the q2 percentile twins: sketches aren't cross-engine
    reproducible).
    """
    ev = read_events(spark, sf_dir)
    day = F.expr("(ts DIV 1000000000 DIV 86400) * 86400")
    return (
        ev.groupBy(day.alias("day_s"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def distinct_users_daily_approx_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ twin of distinct_users_daily: mergeable sketch, map-side
    combinable, no pair shuffle — the at-scale swap (rows-only check:
    sketch estimates aren't reproducible across engines)."""
    ev = read_events(spark, sf_dir)
    day = F.expr("(ts DIV 1000000000 DIV 86400) * 86400")
    return (
        ev.groupBy(day.alias("day_s"))
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("n_users_approx"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


DISTINCT_USERS_SQL = """
SELECT (epoch_us(ts) // 1000000 // 86400) * 86400 AS day_s,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events
FROM events
GROUP BY 1
"""


SESSION_GAP_MIN = 30


def sessionize_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: per user, a new session starts after a >30 min gap
    (gaps-and-islands via lag + cumulative sum — identical semantics to
    F.session_window, but exactly reproducible in the oracle)."""
    from pyspark.sql import Window

    # exact microseconds on both engines (ts is an epoch-nanos long in
    # Spark under nanosAsLong; DuckDB uses epoch_us — both integer-exact)
    ev = read_events(spark, sf_dir).select(
        "user_id", "event_id", F.expr("ts DIV 1000").alias("tus")
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    gap = F.col("tus") - F.lag("tus").over(w)
    new_sess = F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60 * 1_000_000), 1).otherwise(0)
    df = ev.withColumn(
        "session_id",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return (
        df.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr("(max(tus) - min(tus)) DIV 1000000").alias("duration_s"),
        )
    )


SESSIONIZE_SQL = f"""
WITH g AS (
    SELECT user_id, event_id, epoch_us(ts) AS tus,
           epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
    FROM events
),
s AS (
    SELECT user_id, event_id, tus,
           CAST(sum(CASE WHEN gap IS NULL OR gap > {SESSION_GAP_MIN * 60 * 1_000_000} THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY tus, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
    FROM g
)
SELECT user_id, session_id, count(*) AS n_events,
       (max(tus) - min(tus)) // 1000000 AS duration_s
FROM s GROUP BY user_id, session_id
"""


# ================= reserved EMA/AGC state (A1/A2) =================


def ema_state_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's reserved integer EMA recurrences surfaced as an
    analytics query (rows-only check: a true recurrence has no tractable
    SQL twin; correctness is pinned by golden tests against a Python
    reference implementation in tests/test_stateful.py)."""
    from tickdatapipeline_spark.plans.common import SP_DERIV, processed_ticks

    internals = processed_ticks(spark, sf_dir, SP_DERIV, keep_internals=True)
    return ema_columns(internals, SP_DERIV).select(
        "tick_idx", "ema_delta", "ema_delta_dev", "ema_abs_delta"
    )


# ================= multimodal (rows-only check: mapInPandas, no SQL twin) ====


def media_features_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synth_media_from_documents(_docs(spark, sf_dir))
    return extract_features(media).drop("features")  # array col dropped for stable hashing


def media_frames_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synth_media_from_documents(_docs(spark, sf_dir))
    return sample_frames(media).select(
        "media_id", "frame_idx", F.length("frame_bytes").cast("long").alias("frame_len")
    )


# the feature kernel is a deterministic byte-histogram (see operators/
# multimodal.py) so n_bytes/byte_mean ARE SQL-expressible — exploit that
# for a real oracle on the plumbing:
MEDIA_FEATURES_SQL = """
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       CASE WHEN strlen(text) = 0 THEN 0.0 ELSE
       CAST(list_sum(list_transform(range(1, length(text) + 1), i ->
            CASE WHEN ord(text[i]) < 128 THEN ord(text[i])
                 WHEN ord(text[i]) < 2048
                     THEN 320 + ord(text[i]) // 64 + ord(text[i]) % 64
                 WHEN ord(text[i]) < 65536
                     THEN 480 + ord(text[i]) // 4096
                          + (ord(text[i]) // 64) % 64 + ord(text[i]) % 64
                 ELSE 624 + ord(text[i]) // 262144 + (ord(text[i]) // 4096) % 64
                          + (ord(text[i]) // 64) % 64 + ord(text[i]) % 64
            END)) AS DOUBLE)
            / CAST(strlen(text) AS DOUBLE) END AS byte_mean
FROM documents
-- byte_mean sums the UTF-8 encoding of each codepoint in closed form
-- (1/2/3/4-byte arithmetic: lead-byte constant 0/320/480/624 plus the
-- 6-bit continuation digits), matching the Spark side's sum over
-- encode(text,'utf-8') bytes exactly for ANY corpus — no ASCII
-- assumption. strlen() is already utf-8 bytes in DuckDB.
"""

# the frame split is a STUB demuxer, but a deterministic one (fixed-size
# byte slices of the payload, every 4th frame) — so the (media_id,
# frame_idx, frame_len) contract is exactly reproducible in SQL. A real
# demuxer would return this oracle to rows-only.
MEDIA_FRAMES_SQL = """
WITH v AS (
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST(strlen(text) AS BIGINT) AS L,
           CAST(n_chars % 16 + 1 AS BIGINT) AS n
    FROM documents WHERE doc_id % 3 = 2
),
f AS (
    SELECT media_id, L, greatest(L // n, 1) AS fsize,
           unnest(range(0, n, 4)) AS frame_idx
    FROM v
)
SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(greatest(least((frame_idx + 1) * fsize, L) - least(frame_idx * fsize, L), 0) AS BIGINT) AS frame_len
FROM f
"""


def media_dedup_exact_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-exact media dedup manifest: sha2-256 of each payload, group
    count and canonical keep_id — `dup_cnt >= 2` rows are the duplicate
    groups a prune pass drops (operators/multimodal.py:
    media_exact_duplicates; the digest is computed map-side so the blob
    itself never shuffles)."""
    return media_exact_duplicates(synth_media_from_documents(_docs(spark, sf_dir)))


# the synth payload is encode(text,'utf-8'), so DuckDB's sha256(text)
# (VARCHAR hashes its UTF-8 bytes) is the exact same digest:
MEDIA_DEDUP_EXACT_SQL = """
SELECT sha256(text) AS content_sha,
       CAST(count(*) AS BIGINT) AS dup_cnt,
       CAST(min(doc_id) AS BIGINT) AS keep_id
FROM documents
WHERE text IS NOT NULL
GROUP BY sha256(text)
"""


MEDIA_DEDUP_DIM = 8
MEDIA_DEDUP_PLANES = 8
MEDIA_DEDUP_THRESHOLD = 0.999


def media_dedup_features_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-space (perceptual-shaped) media near-dup pairs: stub
    byte-histogram features -> mean-center -> SRP-LSH bucket -> exact
    cosine within buckets (operators/multimodal.py:
    media_near_duplicates). max_bucket_size=None: oracle-compared
    exhaustive output; deployments arm the skew cap."""
    return media_near_duplicates(
        synth_media_from_documents(_docs(spark, sf_dir)),
        threshold=MEDIA_DEDUP_THRESHOLD,
        planes=MEDIA_DEDUP_PLANES,
        dim=MEDIA_DEDUP_DIM,
        max_bucket_size=None,
    )


def _media_dedup_features_sql(
    dim: int = MEDIA_DEDUP_DIM,
    planes: int = MEDIA_DEDUP_PLANES,
    threshold: float = MEDIA_DEDUP_THRESHOLD,
) -> str:
    """DuckDB twin of media_dedup_features_fn, generated so the plane
    weights and fold order stay pinned to similarity._plane_weight and
    the left-assoc aggregate fold the Spark side uses.

    The stub codec's features are per-(byte_offset % dim) sums over the
    UTF-8 encoding of the text payload; the `bytes` CTE reproduces that
    encoding in closed form per codepoint (1/2/4-byte lead constants
    192/224/240 plus 6-bit continuation digits — same arithmetic as
    MEDIA_FEATURES_SQL, per-byte instead of summed) with a running-sum
    window giving each char its byte offset. Every feature is an exact
    integer < 2^53, so centering, dot products and norms are
    bit-identical cross-engine (sqrt and single divides are correctly
    rounded IEEE); the cosine crosses the oracle through sql_rnd."""
    from tickdatapipeline_spark.oracle import dlit

    byte_val = """CASE
             WHEN clen = 1 THEN cp
             WHEN j = 0 AND clen = 2 THEN 192 + cp // 64
             WHEN j = 0 AND clen = 3 THEN 224 + cp // 4096
             WHEN j = 0 AND clen = 4 THEN 240 + cp // 262144
             WHEN j = 1 AND clen = 2 THEN 128 + cp % 64
             WHEN j = 1 AND clen = 3 THEN 128 + (cp // 64) % 64
             WHEN j = 1 AND clen = 4 THEN 128 + (cp // 4096) % 64
             WHEN j = 2 AND clen = 3 THEN 128 + cp % 64
             WHEN j = 2 AND clen = 4 THEN 128 + (cp // 64) % 64
             ELSE 128 + cp % 64 END"""
    f_cols = ",\n           ".join(
        f"CAST(sum(CASE WHEN bin = {d} THEN bval ELSE 0 END) AS DOUBLE) AS f{d}"
        for d in range(dim)
    )
    m_cols = ", ".join(f"avg(f{d}) AS m{d}" for d in range(dim))
    c_cols = ", ".join(f"f{d} - m{d} AS c{d}" for d in range(dim))
    bucket = "\n             + ".join(
        "CASE WHEN "
        + " + ".join(f"{float(_plane_weight(p, d))!r} * c{d}" for d in range(dim))
        + f" > 0.0 THEN {1 << p} ELSE 0 END"
        for p in range(planes)
    )
    nsq = " + ".join(f"c{d} * c{d}" for d in range(dim))
    dot = " + ".join(f"a.c{d} * b.c{d}" for d in range(dim))
    return f"""
WITH media AS (
    SELECT CAST(doc_id AS BIGINT) AS media_id, text
    FROM documents WHERE strlen(text) > 0
),
chars AS (
    SELECT media_id, i, ord(text[i]) AS cp,
           CASE WHEN ord(text[i]) < 128 THEN 1 WHEN ord(text[i]) < 2048 THEN 2
                WHEN ord(text[i]) < 65536 THEN 3 ELSE 4 END AS clen
    FROM media, unnest(range(1, length(text) + 1)) AS u(i)
),
offs AS (
    SELECT media_id, cp, clen,
           sum(clen) OVER (PARTITION BY media_id ORDER BY i
                           ROWS UNBOUNDED PRECEDING) - clen AS char_off
    FROM chars
),
bytes AS (
    SELECT media_id, (char_off + j) % {dim} AS bin,
           {byte_val} AS bval
    FROM offs, unnest(range(0, clen)) AS v(j)
),
feats AS (
    SELECT media_id, {f_cols}
    FROM bytes GROUP BY media_id
),
means AS (SELECT {m_cols} FROM feats),
cent AS (SELECT media_id, {c_cols} FROM feats, means),
bkt AS (
    SELECT media_id, {", ".join(f"c{d}" for d in range(dim))},
           {bucket} AS bucket,
           sqrt({nsq}) AS nrm
    FROM cent
)
SELECT media_a, media_b, cosine FROM (
    SELECT a.media_id AS media_a, b.media_id AS media_b,
           {sql_rnd(f"({dot}) / (a.nrm * b.nrm)")} AS cosine
    FROM bkt a JOIN bkt b
      ON a.bucket = b.bucket AND a.media_id < b.media_id
    WHERE a.nrm > 0.0 AND b.nrm > 0.0
)
WHERE cosine >= {dlit(threshold)}
"""


MEDIA_DEDUP_FEATURES_SQL = _media_dedup_features_sql()


PHASH_MAX_HAMMING = 8


def media_phash_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual media fingerprint (multimodal.perceptual_fingerprints):
    stub-decode to an 8x8 byte matrix, exact integer Walsh-Hadamard
    transform, sign-vs-median of the 63 non-DC coefficients packed into
    one BIGINT — the rotation/re-encode-tolerant near-dup key the raw
    byte-histogram features can't provide. Swapping a real grayscale
    decoder into the kernel changes nothing Spark-side."""
    return perceptual_fingerprints(synth_media_from_documents(_docs(spark, sf_dir)))


def media_dedup_phash_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup pairs: phash Hamming distance <= 8 via the
    9-band pigeonhole equi-join (multimodal.phash_near_duplicates — no
    recall loss at this threshold, same argument as simhash banding)."""
    return phash_near_duplicates(
        perceptual_fingerprints(synth_media_from_documents(_docs(spark, sf_dir))),
        max_hamming=PHASH_MAX_HAMMING,
    )


def _phash_sql_core(side: int = 8) -> str:
    """Shared CTE chain reproducing perceptual_fingerprints in DuckDB:
    the per-byte UTF-8 reconstruction (same closed form as
    _media_dedup_features_sql, dim = side²) -> integer Walsh-Hadamard
    coefficients (sign constants baked at SQL-generation time) -> exact
    63-value median (list_sort order statistic) -> bit-packed BIGINT."""
    dim = side * side

    def sgn(k: int, d: int) -> int:
        u, v = divmod(k, side)
        r, c = divmod(d, side)
        return 1 if (bin(u & r).count("1") + bin(v & c).count("1")) % 2 == 0 else -1

    byte_val = """CASE
             WHEN clen = 1 THEN cp
             WHEN j = 0 AND clen = 2 THEN 192 + cp // 64
             WHEN j = 0 AND clen = 3 THEN 224 + cp // 4096
             WHEN j = 0 AND clen = 4 THEN 240 + cp // 262144
             WHEN j = 1 AND clen = 2 THEN 128 + cp % 64
             WHEN j = 1 AND clen = 3 THEN 128 + (cp // 64) % 64
             WHEN j = 1 AND clen = 4 THEN 128 + (cp // 4096) % 64
             WHEN j = 2 AND clen = 3 THEN 128 + cp % 64
             WHEN j = 2 AND clen = 4 THEN 128 + (cp // 64) % 64
             ELSE 128 + cp % 64 END"""
    f_cols = ",\n           ".join(
        f"CAST(sum(CASE WHEN bin = {d} THEN bval ELSE 0 END) AS BIGINT) AS f{d}"
        for d in range(dim)
    )
    y_cols = ",\n           ".join(
        "(0 " + " ".join(
            f"{'+' if sgn(k, d) > 0 else '-'} f{d}" for d in range(dim)
        ) + f") AS y{k}"
        for k in range(1, dim)
    )
    med = "list_sort([" + ", ".join(f"y{k}" for k in range(1, dim)) + f"])[{dim // 2}]"
    pack = "\n             + ".join(
        f"(CASE WHEN y{k} > med THEN {1 << (k - 1)} ELSE 0 END)"
        for k in range(1, dim)
    )
    return f"""
media AS (
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
           text
    FROM documents WHERE text IS NOT NULL AND strlen(text) > 0
),
chars AS (
    SELECT media_id, i, ord(text[i]) AS cp,
           CASE WHEN ord(text[i]) < 128 THEN 1 WHEN ord(text[i]) < 2048 THEN 2
                WHEN ord(text[i]) < 65536 THEN 3 ELSE 4 END AS clen
    FROM media, unnest(range(1, length(text) + 1)) AS u(i)
),
offs AS (
    SELECT media_id, cp, clen,
           sum(clen) OVER (PARTITION BY media_id ORDER BY i
                           ROWS UNBOUNDED PRECEDING) - clen AS char_off
    FROM chars
),
bytes AS (
    SELECT media_id, (char_off + j) % {dim} AS bin,
           {byte_val} AS bval
    FROM offs, unnest(range(0, clen)) AS v(j)
),
cells AS (
    SELECT media_id, {f_cols}
    FROM bytes GROUP BY media_id
),
wht AS (
    SELECT media_id, {y_cols}
    FROM cells
),
fp AS (
    SELECT media.media_id, media.kind,
           CAST({pack} AS BIGINT) AS phash
    FROM (SELECT *, {med} AS med FROM wht) w
    JOIN media ON media.media_id = w.media_id
)"""


MEDIA_PHASH_SQL = f"""
WITH {_phash_sql_core()}
SELECT media_id, kind, phash FROM fp
"""

MEDIA_DEDUP_PHASH_SQL = f"""
WITH {_phash_sql_core()},
bands AS (
    SELECT media_id, phash, CAST(b AS INT) AS band,
           (phash >> (7 * b)) & 127 AS band_key
    FROM fp, unnest(range(0, 9)) AS t(b)
)
SELECT DISTINCT l.media_id AS media_a, r.media_id AS media_b,
       CAST(bit_count(xor(l.phash, r.phash)) AS BIGINT) AS hamming
FROM bands l JOIN bands r
  ON l.band = r.band AND l.band_key = r.band_key AND l.media_id < r.media_id
WHERE bit_count(xor(l.phash, r.phash)) <= {PHASH_MAX_HAMMING}
"""


def time_rollup_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup: ONE pass over events
    producing hourly, daily and grand-total aggregates via GROUPING SETS
    (the continuous-aggregate hierarchy a time-series store maintains).
    grouping_id disambiguates the level; integer epoch buckets keep both
    engines exact."""
    ev = read_events(spark, sf_dir)
    hour = F.expr("(ts DIV 1000000000 DIV 3600) * 3600").alias("hour_s")
    day = F.expr("(ts DIV 1000000000 DIV 86400) * 86400").alias("day_s")
    vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return (
        ev.select(hour, day, vc.alias("vc"))
        .groupingSets([["hour_s", "day_s"], ["day_s"], []], "hour_s", "day_s")
        .agg(
            F.grouping_id().cast("long").alias("level"),
            F.count(F.lit(1)).alias("n_events"),
            (F.sum("vc") / 100.0).alias("sum_value"),
        )
    )


TIME_ROLLUP_SQL = """
SELECT hour_s, day_s, CAST(grouping(hour_s) * 2 + grouping(day_s) AS BIGINT) AS level,
       count(*) AS n_events,
       sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_value
FROM (
    SELECT (epoch_us(ts) // 1000000 // 3600) * 3600 AS hour_s,
           (epoch_us(ts) // 1000000 // 86400) * 86400 AS day_s,
           value
    FROM events
)
GROUP BY GROUPING SETS ((hour_s, day_s), (day_s), ())
"""


ATTRIB_LOOKBACK_US = 4 * 3600 * 1_000_000  # clicks within 4h before a purchase
ATTRIB_BIN_US = 3600 * 1_000_000


def attribution_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (binned): attribute each click to every purchase by the
    same user within the 4h lookback window — the point-in-interval join
    Spark would otherwise plan as a per-key nested loop
    (operators/rangejoin.py). Integer epoch-micros on both engines."""
    from tickdatapipeline_spark.operators.rangejoin import binned_range_join

    ev = read_events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_event_id"),
        F.expr("ts DIV 1000").alias("click_tus"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_event_id"),
        (F.expr("ts DIV 1000") - ATTRIB_LOOKBACK_US).alias("lo"),
        F.expr("ts DIV 1000").alias("hi"),
    )
    out = binned_range_join(
        clicks, purchases, on=["user_id"], point_col="click_tus",
        lo_col="lo", hi_col="hi", bin_size=ATTRIB_BIN_US,
    )
    return out.select(
        "user_id", "click_event_id", "purchase_event_id",
        F.expr("(hi - click_tus) DIV 1000000").alias("lag_s"),
    )


ATTRIBUTION_SQL = f"""
SELECT c.user_id, c.event_id AS click_event_id, p.event_id AS purchase_event_id,
       CAST((epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS BIGINT) AS lag_s
FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') c
JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND epoch_us(c.ts) BETWEEN epoch_us(p.ts) - {ATTRIB_LOOKBACK_US} AND epoch_us(p.ts)
"""


# ================= sequential funnel (absent in the reference) ==========

# conversion deadline per stage: the next stage must happen within 24h of
# entering the previous one (tuned so the synthetic corpus actually
# discriminates: sf0.01 converts 150 -> 60 -> 25 users)
FUNNEL_WINDOW_US = 24 * 3600 * 1_000_000
FUNNEL_STAGES = ("view", "click", "purchase")


def event_funnel(ev: DataFrame, window_us: int = FUNNEL_WINDOW_US) -> DataFrame:
    """Sequential conversion funnel view -> click -> purchase: a user
    enters stage k+1 at their FIRST stage-k+1 event strictly after
    entering stage k and within ``window_us`` of it. Input:
    (user_id, event_type, tus epoch-micros). Output: one row per stage
    with the user count and the mean seconds from first view to stage
    entry (exact integer-micros sum, divided once — no accumulation-order
    float skew).

    Scale: each stage is a map-side-combinable min-aggregate shuffled on
    user_id; the stage joins are user_id-equi-joins over per-user rows
    (co-partitioned under AQE, broadcast when a stage's survivors are
    small — typical for deep funnels). Nothing is ever globally sorted
    or collected.
    """
    win = F.lit(window_us)

    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("tus").alias("t1"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where((F.col("tus") > F.col("t1")) & (F.col("tus") <= F.col("t1") + win))
        .groupBy("user_id")
        .agg(F.min("tus").alias("t2"), F.min("t1").alias("t1"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where((F.col("tus") > F.col("t2")) & (F.col("tus") <= F.col("t2") + win))
        .groupBy("user_id")
        .agg(F.min("tus").alias("t3"), F.min("t1").alias("t1"))
    )

    def stage_row(df: DataFrame, name: str, entered) -> DataFrame:
        agg = df.agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(entered - F.col("t1")).alias("_sum_us"),
        )
        return agg.select(
            F.lit(name).alias("stage"),
            F.col("n_users"),
            F.when(
                F.col("n_users") > 0,
                rnd(F.col("_sum_us").cast("double") / F.col("n_users") / F.lit(1e6)),
            ).otherwise(F.lit(0.0)).alias("avg_secs_from_view"),
        )

    return (
        stage_row(v, "view_1", F.col("t1"))
        .unionAll(stage_row(c, "click_2", F.col("t2")))
        .unionAll(stage_row(p, "purchase_3", F.col("t3")))
    )


def user_journeys_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered action sequence — the 'extract user journeys as
    sequence data' step behind behavioral training sets and funnel
    mining: each user's event types concatenated in (time, event_id)
    order, with event count and first/last activity.

    Determinism: the sort key (tus, event_id) is unique per row
    (event_id is unique), so the journey string is reproducible on both
    engines; array_sort on the packed struct orders exactly like the
    oracle's string_agg ORDER BY.

    Scale: ONE map-side-combinable groupBy on user_id; the collected
    sequence is bounded by a user's own event count (the usual
    power-user caveat — cap upstream with a per-user limit if a single
    user can exceed executor row size).
    """
    ev = read_events(spark, sf_dir).select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
        F.expr("ts DIV 1000").alias("tus"),
    )
    seq = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("tus", "event_id", "event_type"))),
            lambda x: x["event_type"],
        ),
        ">",
    )
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("tus").alias("first_us"),
        F.max("tus").alias("last_us"),
        seq.alias("journey"),
    )


USER_JOURNEYS_SQL = """
SELECT CAST(user_id AS BIGINT) AS user_id,
       count(*) AS n_events,
       min(epoch_us(ts)) AS first_us,
       max(epoch_us(ts)) AS last_us,
       string_agg(event_type, '>' ORDER BY epoch_us(ts), CAST(event_id AS BIGINT)) AS journey
FROM events
GROUP BY CAST(user_id AS BIGINT)
"""


def funnel_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return event_funnel(
        read_events(spark, sf_dir).select(
            "user_id", "event_type", F.expr("ts DIV 1000").alias("tus")
        )
    )


FUNNEL_SQL = f"""
WITH v AS (
    SELECT user_id, min(epoch_us(ts)) AS t1
    FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
    SELECT e.user_id, min(epoch_us(e.ts)) AS t2, min(v.t1) AS t1
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click'
      AND epoch_us(e.ts) > v.t1 AND epoch_us(e.ts) <= v.t1 + {FUNNEL_WINDOW_US}
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, min(epoch_us(e.ts)) AS t3, min(c.t1) AS t1
    FROM events e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase'
      AND epoch_us(e.ts) > c.t2 AND epoch_us(e.ts) <= c.t2 + {FUNNEL_WINDOW_US}
    GROUP BY e.user_id
)
SELECT 'view_1' AS stage, count(*) AS n_users, 0.0 AS avg_secs_from_view FROM v
UNION ALL
SELECT 'click_2', count(*),
       CASE WHEN count(*) > 0
            THEN {sql_rnd('CAST(sum(t2 - t1) AS DOUBLE) / count(*) / 1000000.0')}
            ELSE 0.0 END
FROM c
UNION ALL
SELECT 'purchase_3', count(*),
       CASE WHEN count(*) > 0
            THEN {sql_rnd('CAST(sum(t3 - t1) AS DOUBLE) / count(*) / 1000000.0')}
            ELSE 0.0 END
FROM p
"""


# ================= retention cohorts (absent in the reference) ==========

RETENTION_DAY_US = 86400 * 1_000_000
RETENTION_MAX_OFFSET = 13  # track each cohort for two weeks


def retention_cohorts(ev: DataFrame) -> DataFrame:
    """Daily retention matrix: cohort = the day of a user's first
    'signup' event; a cohort member is active on day k if they have ANY
    event on cohort_day + k (0 <= k <= RETENTION_MAX_OFFSET). Input:
    (user_id, event_type, tus epoch-micros). Output one matrix cell per
    (cohort_day_s, day_offset) with the distinct-user count — the table
    every growth dashboard renders.

    Scale: first-signup is a map-side-combinable min per user; the
    activity join is a user_id equi-join (co-partitioned with the
    signup aggregate's shuffle); the per-cell count runs on
    (user, cohort, offset)-distinct rows whose cardinality is bounded by
    users x (RETENTION_MAX_OFFSET+1) — never events x offsets.
    """
    # integer DIV on both engines — exact at any epoch magnitude (the
    # double-division route can land a hair under an exact multiple)
    day_of = lambda c: F.expr(f"{c} DIV {RETENTION_DAY_US}")  # noqa: E731
    su = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(day_of("tus")).alias("cohort_day"))
    )
    act = (
        ev.select("user_id", day_of("tus").alias("ev_day"))
        .join(su, "user_id")
        .where(
            (F.col("ev_day") >= F.col("cohort_day"))
            & (F.col("ev_day") <= F.col("cohort_day") + RETENTION_MAX_OFFSET)
        )
        .select(
            "user_id", "cohort_day",
            (F.col("ev_day") - F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
    )
    return act.groupBy(
        (F.col("cohort_day") * 86400).alias("cohort_day_s"), "day_offset"
    ).agg(F.count(F.lit(1)).alias("n_active_users"))


def retention_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return retention_cohorts(
        read_events(spark, sf_dir).select(
            "user_id", "event_type", F.expr("ts DIV 1000").alias("tus")
        )
    )


RETENTION_SQL = f"""
WITH su AS (
    SELECT user_id, min(epoch_us(ts)) // {RETENTION_DAY_US} AS cohort_day
    FROM events WHERE event_type = 'signup' GROUP BY user_id
),
act AS (
    SELECT DISTINCT e.user_id, su.cohort_day,
           epoch_us(e.ts) // {RETENTION_DAY_US} - su.cohort_day AS day_offset
    FROM events e JOIN su ON e.user_id = su.user_id
    WHERE epoch_us(e.ts) // {RETENTION_DAY_US} >= su.cohort_day
      AND epoch_us(e.ts) // {RETENTION_DAY_US} <= su.cohort_day + {RETENTION_MAX_OFFSET}
)
SELECT cohort_day * 86400 AS cohort_day_s, day_offset,
       count(*) AS n_active_users
FROM act GROUP BY 1, 2
"""


TFIDF_K, TFIDF_SCALE = 3, 1_000_000

TFIDF_TOPK_SQL = f"""
WITH tok AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id, unnest({SQL_TOKENS}) AS token
    FROM documents
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
dfreq AS (
    SELECT token, count(*) AS doc_freq
    FROM (SELECT DISTINCT doc_id, token FROM tok) GROUP BY token
),
scored AS (
    SELECT tf.doc_id, tf.token, tf.tf, dfreq.doc_freq,
           CAST(tf.tf * {TFIDF_SCALE} // dfreq.doc_freq AS BIGINT) AS score_q
    FROM tf JOIN dfreq USING (token)
)
SELECT doc_id, token, tf, doc_freq, score_q, rank FROM (
    SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score_q DESC, token) AS BIGINT) AS rank
    FROM scored
) WHERE rank <= {TFIDF_K}
"""

VOCAB_TOPK_K = 100

VOCAB_TOPK_SQL = f"""
SELECT token, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
FROM (
    SELECT CAST(doc_id AS BIGINT) AS doc_id, unnest({SQL_TOKENS}) AS token
    FROM documents
)
GROUP BY token
ORDER BY n_occurrences DESC, token
LIMIT {VOCAB_TOPK_K}
"""

# per-language keep-permille for the deterministic stratified sampler;
# chosen to exercise every branch (downsample en hard, es mildly, de/fr
# fall through to the default)
SAMPLE_RATES = {"en": 350, "es": 800}
SAMPLE_DEFAULT_PM = 1000

_sample_pm = "CASE lang WHEN 'en' THEN 350 WHEN 'es' THEN 800 ELSE 1000 END"
STRATIFIED_SAMPLE_SQL = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
FROM documents
WHERE {sql_h60("'sample:' || CAST(CAST(doc_id AS BIGINT) AS VARCHAR)")} % 1000 < {_sample_pm}
"""

TOKEN_BUDGET = 1500
TOKEN_BUDGET_BUCKETS = 256

def _hash_prefix_ctes(salt: str, n_buckets: int, source: str = "documents") -> str:
    """base + exclusive-token-prefix CTEs shared by the token-budget,
    pack-sequences and training-examples oracles — the SQL twin of
    operators.text._hash_order_token_prefix (global-order equivalent
    of the two-level bucket-prefix + within-bucket-window plan).
    ``source`` must expose (doc_id, text)."""
    return f"""base AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(len({SQL_TOKENS}) AS BIGINT) AS n_tokens,
           {sql_h60(f"'{salt}' || CAST(CAST(doc_id AS BIGINT) AS VARCHAR)")} AS h
    FROM {source}
),
pre AS (
    SELECT doc_id, n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (
               ORDER BY h % {n_buckets}, h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS p
    FROM base
)"""


TOKEN_BUDGET_SQL = f"""
WITH {_hash_prefix_ctes("budget:", TOKEN_BUDGET_BUCKETS)}
SELECT doc_id, n_tokens FROM pre WHERE p < {TOKEN_BUDGET}
"""

def _bpe_stats_sql() -> str:
    from tickdatapipeline_spark.operators.text import (
        _BPE_NUM_RE,
        _BPE_WORD_RE,
        BPE_PRETOKEN_RE,
    )

    # the pre-tokenizer pattern contains apostrophes -> double them for
    # the SQL literal; the \p{L}/\p{N} classes are RE2 == Java regex,
    # and the classifier patterns are shared constants so the two
    # engines cannot drift apart
    bpe = BPE_PRETOKEN_RE.replace("'", "''")
    word, num = _BPE_WORD_RE, _BPE_NUM_RE
    return f"""
WITH t AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
           regexp_extract_all(text, '{bpe}') AS toks
    FROM documents
),
c AS (
    SELECT doc_id, text, toks,
           len(list_filter(toks, x -> regexp_matches(x, '{word}'))) AS n_word,
           len(list_filter(toks, x -> regexp_matches(x, '{num}'))) AS n_num
    FROM t
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_bpe_tokens,
       CAST(n_word AS BIGINT) AS n_word,
       CAST(n_num AS BIGINT) AS n_num,
       CAST(len(toks) - n_word - n_num AS BIGINT) AS n_other,
       {sql_rnd("CASE WHEN len(toks) > 0 THEN CAST(length(text) AS DOUBLE) / CAST(len(toks) AS DOUBLE) ELSE 0.0 END")} AS chars_per_token
FROM c
"""


OOV_VOCAB_K = 20  # small vs the word-soup vocabulary so OOV hits exist

OOV_RATE_SQL = f"""
WITH tok AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id, unnest({SQL_TOKENS}) AS token
    FROM documents
),
voc AS (
    SELECT token FROM (
        SELECT token, count(*) AS c FROM tok
        GROUP BY token ORDER BY c DESC, token LIMIT {OOV_VOCAB_K}
    )
),
scored AS (
    SELECT t.doc_id, v.token IS NOT NULL AS inv
    FROM tok t LEFT JOIN voc v ON t.token = v.token
)
SELECT doc_id,
       count(*) AS n_tokens,
       CAST(sum(CASE WHEN inv THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
       {sql_rnd("CAST(sum(CASE WHEN inv THEN 0 ELSE 1 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS oov_rate
FROM scored GROUP BY doc_id
"""

BOILERPLATE_K, BOILERPLATE_MIN_DOCS = 100, 2

VOCAB_DRIFT_K = 100

_sha = "CASE WHEN ta > 0 THEN CAST(cnt_a AS DOUBLE) / CAST(ta AS DOUBLE) ELSE 0.0 END"
_shb = "CASE WHEN tb > 0 THEN CAST(cnt_b AS DOUBLE) / CAST(tb AS DOUBLE) ELSE 0.0 END"

# sides: even doc_ids vs odd (stand-in for two crawl snapshots); the
# IN (0, 1) filter mirrors the Spark side-tagging exactly (NULL or
# negative doc_ids match neither side on either engine)
VOCAB_DRIFT_SQL = f"""
WITH tok AS (
    SELECT unnest({SQL_TOKENS}) AS token, CAST(doc_id AS BIGINT) % 2 AS side
    FROM documents
    WHERE CAST(doc_id AS BIGINT) % 2 IN (0, 1)
),
counts AS (
    SELECT token,
           CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
           CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
    FROM tok GROUP BY token
),
totals AS (SELECT CAST(sum(cnt_a) AS BIGINT) AS ta, CAST(sum(cnt_b) AS BIGINT) AS tb FROM counts)
SELECT token, cnt_a, cnt_b,
       {sql_rnd(_sha)} AS share_a,
       {sql_rnd(_shb)} AS share_b,
       {sql_rnd(f"abs(({_sha}) - ({_shb}))")} AS drift
FROM counts CROSS JOIN totals
ORDER BY cnt_a + cnt_b DESC, token
LIMIT {VOCAB_DRIFT_K}
"""


def vocab_drift_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickdatapipeline_spark.operators.text import vocab_drift_tagged

    # single-scan tagged path: one parquet read, side computed per row
    return vocab_drift_tagged(
        _docs(spark, sf_dir), F.col("doc_id").cast("long") % 2, VOCAB_DRIFT_K
    )


SOURCE_REPORT_SQL = f"""
SELECT source,
       count(*) AS n_docs,
       count(DISTINCT lang) AS n_langs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       {sql_rnd("CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS avg_chars,
       {sql_rnd("CAST(sum(n_tokens) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS avg_tokens
FROM (
    SELECT source, lang,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len({SQL_TOKENS}) AS BIGINT) AS n_tokens
    FROM documents
)
GROUP BY source
"""


SPLIT_VAL_PM, SPLIT_TEST_PM = 100, 50

SPLIT_SQL = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CASE WHEN draw < {SPLIT_TEST_PM} THEN 'test'
            WHEN draw < {SPLIT_TEST_PM + SPLIT_VAL_PM} THEN 'val'
            ELSE 'train' END AS split
FROM (
    SELECT doc_id,
           {sql_h60("'split:' || CAST(CAST(doc_id AS BIGINT) AS VARCHAR)")} % 1000 AS draw
    FROM documents
)
"""

PACK_SEQ_LEN = 64
PACK_BUCKETS = 256

TRAIN_MIN_TOKENS, TRAIN_MAX_TOKENS = 5, 500


def training_examples_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-example assembly — the composition a real
    data pipeline runs nightly: quality gate (token-count bounds) ∘
    train-split selection (train_val_test_split) ∘ concat-and-chunk
    packing (pack_sequences) as ONE declarative plan. Each stage is the
    already-gated operator; Catalyst fuses the gate and the split draw
    into the same scan, and the pack keeps its two-level zero-
    SinglePartition shape over the filtered corpus."""
    from tickdatapipeline_spark.operators.text import (
        pack_sequences,
        tokens,
        train_val_test_split,
    )

    docs = _docs(spark, sf_dir)
    eligible = docs.where(
        F.size(tokens(F.col("text"))).between(TRAIN_MIN_TOKENS, TRAIN_MAX_TOKENS)
    )
    split = train_val_test_split(eligible, SPLIT_VAL_PM, SPLIT_TEST_PM)
    train_ids = split.where(F.col("split") == "train").select(
        F.col("doc_id").alias("_train_id")
    )
    train = eligible.join(
        train_ids, eligible["doc_id"].cast("long") == F.col("_train_id")
    ).select(eligible["doc_id"], eligible["text"])
    return pack_sequences(train, PACK_SEQ_LEN, PACK_BUCKETS)


TRAINING_EXAMPLES_SQL = f"""
WITH eligible AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id, text
    FROM documents
    WHERE len({SQL_TOKENS}) BETWEEN {TRAIN_MIN_TOKENS} AND {TRAIN_MAX_TOKENS}
      AND {sql_h60("'split:' || CAST(CAST(doc_id AS BIGINT) AS VARCHAR)")} % 1000
          >= {SPLIT_TEST_PM + SPLIT_VAL_PM}
),
{_hash_prefix_ctes("pack:", PACK_BUCKETS, "eligible")}
SELECT doc_id, n_tokens,
       p // {PACK_SEQ_LEN} AS pack_id,
       p % {PACK_SEQ_LEN} AS pack_offset,
       (p + n_tokens - 1) // {PACK_SEQ_LEN} - p // {PACK_SEQ_LEN} + 1 AS n_packs
FROM pre
WHERE n_tokens > 0
"""


# integer pack arithmetic over the shared exclusive prefix
PACK_SEQUENCES_SQL = f"""
WITH {_hash_prefix_ctes("pack:", PACK_BUCKETS)}
SELECT doc_id, n_tokens,
       p // {PACK_SEQ_LEN} AS pack_id,
       p % {PACK_SEQ_LEN} AS pack_offset,
       (p + n_tokens - 1) // {PACK_SEQ_LEN} - p // {PACK_SEQ_LEN} + 1 AS n_packs
FROM pre
WHERE n_tokens > 0
"""

DIFF_MOVE_OFFSET = 10_000_000


def snapshot_diff_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """snapshot_diff over two engineered snapshots of the corpus so all
    four statuses are exercised: the 'new' snapshot drops doc_id % 7 ==
    0 (-> removed), rewrites text for doc_id % 5 == 0 (-> changed),
    keeps the rest (-> unchanged), and re-adds the dropped docs under
    shifted ids (-> added)."""
    from tickdatapipeline_spark.operators.text import snapshot_diff

    docs = _docs(spark, sf_dir).select(F.col("doc_id").cast("long").alias("doc_id"), "text")
    kept = docs.where(F.col("doc_id") % 7 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" refreshed")))
        .otherwise(F.col("text")).alias("text"),
    )
    moved = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + DIFF_MOVE_OFFSET).alias("doc_id"), "text"
    )
    return snapshot_diff(docs, kept.unionByName(moved))


SNAPSHOT_DIFF_SQL = f"""
WITH old AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id, {sql_h60(SQL_NORM_TEXT)} AS ofp
    FROM documents
),
new_docs AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CASE WHEN doc_id % 5 = 0 THEN text || ' refreshed' ELSE text END AS text
    FROM documents WHERE doc_id % 7 <> 0
    UNION ALL
    SELECT CAST(doc_id AS BIGINT) + {DIFF_MOVE_OFFSET}, text
    FROM documents WHERE doc_id % 7 = 0
),
new AS (SELECT doc_id, {sql_h60(SQL_NORM_TEXT)} AS nfp FROM new_docs)
SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN ofp IS DISTINCT FROM nfp THEN 'changed'
            ELSE 'unchanged' END AS status,
       ofp AS old_fingerprint, nfp AS new_fingerprint
FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
"""


MIX_TARGETS = {"src0": 250, "src1": 400, "src2": 250, "src3": 100}
MIX_BUDGET = 12_000  # tokens; > src1's availability at its share -> epochs > 1

_MIX_SHARE_CASE = "CASE source " + " ".join(
    f"WHEN '{s}' THEN {pm}" for s, pm in sorted(MIX_TARGETS.items())
) + " ELSE 0 END"

MIXTURE_SAMPLE_SQL = f"""
WITH base AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
           CAST(len({SQL_TOKENS}) AS BIGINT) AS n_tokens,
           {sql_h60("'mix:' || CAST(CAST(doc_id AS BIGINT) AS VARCHAR)")} % 1000 AS h_pm,
           {_MIX_SHARE_CASE} AS share_pm
    FROM documents
),
avail AS (
    SELECT source, CAST(sum(n_tokens) AS BIGINT) AS avail_tokens
    FROM base GROUP BY source
),
r AS (
    SELECT b.doc_id, b.source, b.n_tokens, b.h_pm,
           ({MIX_BUDGET} * b.share_pm) // a.avail_tokens AS rate_pm
    FROM base b JOIN avail a USING (source)
    WHERE b.share_pm > 0 AND a.avail_tokens > 0
)
SELECT doc_id, source, CAST(epoch AS BIGINT) AS epoch, n_tokens
FROM (SELECT doc_id, source, n_tokens,
             unnest(range(0, greatest(0, (rate_pm - h_pm + 999) // 1000))) AS epoch
      FROM r)
"""

CHUNK_WINDOW = 24
CHUNK_STRIDE = 16

CHUNK_WINDOWS_SQL = f"""
WITH b AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id, t, CAST(len(t) AS BIGINT) AS n
    FROM (SELECT doc_id, {SQL_TOKENS} AS t FROM documents)
    WHERE len(t) > 0
),
c AS (
    SELECT doc_id, t, n,
           unnest(range(0, 1 + (greatest(0, n - {CHUNK_WINDOW}) + {CHUNK_STRIDE - 1}) // {CHUNK_STRIDE})) AS chunk_idx
    FROM b
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(chunk_idx * {CHUNK_STRIDE} AS BIGINT) AS chunk_start,
       CAST(least({CHUNK_WINDOW}, n - chunk_idx * {CHUNK_STRIDE}) AS BIGINT) AS chunk_len,
       array_to_string(
           list_slice(t, CAST(chunk_idx * {CHUNK_STRIDE} + 1 AS INTEGER),
                      CAST(chunk_idx * {CHUNK_STRIDE} + {CHUNK_WINDOW} AS INTEGER)),
           ' ') AS chunk_text
FROM c
"""

NGRAM_N = 5

# word n-grams CTE shared by both sides of the exact-overlap check
# (mirrors operators.dedup.shingles at n = NGRAM_N)
_NGRAMS_CTE = f"""
grams AS (
    SELECT DISTINCT doc_id, g FROM (
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               unnest(CASE WHEN len(t) >= {NGRAM_N}
                      THEN list_transform(range(1, len(t) - {NGRAM_N - 2}),
                                          i -> array_to_string(t[i:i+{NGRAM_N - 1}], ' '))
                      ELSE [] END) AS g
        FROM (SELECT doc_id, {SQL_TOKENS} AS t FROM documents)
    )
)
"""

NGRAM_OVERLAP_SQL = f"""
WITH {_NGRAMS_CTE},
tg AS (SELECT doc_id, {sql_h60('g')} AS gh FROM grams WHERE doc_id % {DECON_EVAL_MOD} <> 0),
eg AS (SELECT DISTINCT {sql_h60('g')} AS gh FROM grams WHERE doc_id % {DECON_EVAL_MOD} = 0),
totals AS (SELECT doc_id, count(*) AS n_grams FROM tg GROUP BY doc_id),
hits AS (SELECT tg.doc_id, count(*) AS n_hit FROM tg JOIN eg USING (gh) GROUP BY tg.doc_id)
SELECT totals.doc_id AS train_doc_id, n_grams, n_hit,
       {sql_rnd("CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE)")} AS hit_frac
FROM totals JOIN hits ON totals.doc_id = hits.doc_id
"""


# reuses the 5-gram CTE of the exact-overlap check
BOILERPLATE_SQL = f"""
WITH {_NGRAMS_CTE}
SELECT g AS shingle, count(*) AS n_docs, min(doc_id) AS example_doc_id
FROM grams
GROUP BY g HAVING count(*) >= {BOILERPLATE_MIN_DOCS}
ORDER BY n_docs DESC, shingle
LIMIT {BOILERPLATE_K}
"""


def ngram_overlap_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickdatapipeline_spark.operators.dedup import ngram_overlap_contamination

    docs = _docs(spark, sf_dir)
    return ngram_overlap_contamination(
        docs.where(F.col("doc_id") % DECON_EVAL_MOD != 0),
        docs.where(F.col("doc_id") % DECON_EVAL_MOD == 0),
        NGRAM_N,
    )


# deterministic PII-bearing fixture: the synthetic documents hold no
# real PII, so the query plants one email/phone/IP derived from each
# row's own columns and the operator must scrub exactly those (plus
# anything in the text, of which the word-soup has none)
def pii_redaction_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tickdatapipeline_spark.operators.text import redact_pii

    synth = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat(
            F.lit("contact user"), F.col("doc_id").cast("long").cast("string"),
            F.lit("@"), F.col("source"), F.lit(".example.com or 555-867-"),
            F.lpad((F.col("doc_id").cast("long") % 10000).cast("string"), 4, "0"),
            F.lit(" from 10.0."), (F.col("doc_id").cast("long") % 256).cast("string"),
            F.lit(".1 "), F.col("text"),
        ).alias("text"),
    )
    return redact_pii(synth).select(
        "doc_id", "n_emails", "n_ips", "n_phones", "clean_text"
    )


def _pii_redaction_sql() -> str:
    from tickdatapipeline_spark.operators.text import PII_PATTERNS

    synth = (
        "'contact user' || CAST(CAST(doc_id AS BIGINT) AS VARCHAR) || '@' || source"
        " || '.example.com or 555-867-'"
        " || lpad(CAST(CAST(doc_id AS BIGINT) % 10000 AS VARCHAR), 4, '0')"
        " || ' from 10.0.' || CAST(CAST(doc_id AS BIGINT) % 256 AS VARCHAR)"
        " || '.1 ' || text"
    )
    counts = ", ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS {cc}"
        for cc, _ph, pat in PII_PATTERNS
    )
    clean = "text"
    for _cc, placeholder, pat in PII_PATTERNS:
        clean = f"regexp_replace({clean}, '{pat}', '{placeholder}', 'g')"
    return f"""
WITH synth AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, {synth} AS text FROM documents)
SELECT doc_id, {counts}, {clean} AS clean_text FROM synth
"""


LENGTH_FILTER_LO, LENGTH_FILTER_HI = 0.05, 0.95


def length_percentile_filter_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-based length filtering: keep documents whose token count
    lies within [p05, p95] of the corpus length distribution — the
    outlier trim of corpus curation (too-short fragments, too-long
    dumps). Uses the exact interpolated percentile (oracle-reproducible;
    at 100 TB swap in percentile_approx, same pattern as the q2 twins);
    the two bounds broadcast back over the corpus as a 1-row frame.
    Output: (doc_id, n_tokens) of the surviving documents."""
    from tickdatapipeline_spark.operators.text import tokens
    from tickdatapipeline_spark.plans.common import exact_percentiles

    stats = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    pcts = exact_percentiles(stats, "n_tokens", [LENGTH_FILTER_LO, LENGTH_FILTER_HI])
    bounds = pcts.agg(F.min("q").alias("_lo"), F.max("q").alias("_hi"))
    return (
        stats.crossJoin(F.broadcast(bounds))
        .where(F.col("n_tokens").between(F.col("_lo"), F.col("_hi")))
        .select("doc_id", "n_tokens")
    )


def length_percentile_filter_approx_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The at-scale twin of docs_length_filter: percentile_approx
    bounds (no full sort — one pass, mergeable sketches) with the same
    broadcast-bounds filter shape. Rows-only in the registry: sketch
    internals are not cross-engine reproducible (same contract as
    q2_percentiles_approx)."""
    from tickdatapipeline_spark.operators.text import tokens

    stats = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    bounds = stats.agg(
        F.percentile_approx("n_tokens", LENGTH_FILTER_LO, 10_000).alias("_lo"),
        F.percentile_approx("n_tokens", LENGTH_FILTER_HI, 10_000).alias("_hi"),
    )
    return (
        stats.crossJoin(F.broadcast(bounds))
        .where(F.col("n_tokens").between(F.col("_lo"), F.col("_hi")))
        .select("doc_id", "n_tokens")
    )


def _length_filter_sql() -> str:
    from tickdatapipeline_spark.plans.common import sql_exact_percentiles

    stats_sql = (
        f"SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        f"CAST(len({SQL_TOKENS}) AS BIGINT) AS n_tokens FROM documents"
    )
    pct_sql = sql_exact_percentiles(stats_sql, "n_tokens",
                                    [LENGTH_FILTER_LO, LENGTH_FILTER_HI])
    return f"""
WITH bounds AS (SELECT min(q) AS lo, max(q) AS hi FROM ({pct_sql}))
SELECT doc_id, n_tokens
FROM ({stats_sql}), bounds
WHERE n_tokens BETWEEN lo AND hi
"""


OUTLIER_TOP_N = 50

def _power_iteration_sql(iters: int = 3) -> str:
    """DuckDB twin of power_iteration_top_component: the fixed
    iterations unroll as CTE chains; every cross-row accumulation is a
    BIGINT sum and every float step is the same IEEE op sequence on
    identical integers, so the replay is bit-exact (same scheme as
    ivf_kmeans_sql)."""
    from tickdatapipeline_spark.operators.similarity import PCA_Q as q

    dims = "(SELECT unnest(range(1, len((SELECT vq FROM base LIMIT 1)) + 1)) AS i)"
    ctes = [
        f"base AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, "
        f"list_transform({SQL_VEC}, x -> CAST(floor(x * {q} + 0.5) AS BIGINT)) AS vq "
        f"FROM embeddings)",
        "v0 AS (SELECT vq AS v FROM base WHERE vec_id = 0)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"s{k} AS (SELECT b.vq, list_reduce(list_transform(range(1, len(b.vq) + 1), "
            f"i -> b.vq[i] * v.v[i]), (x, y) -> x + y) AS s FROM base b, v{k - 1} v)"
        )
        ctes.append(
            f"t{k} AS (SELECT vq, CASE WHEN s < 0 THEN -(abs(s) // {q}) "
            f"ELSE s // {q} END AS st FROM s{k})"
        )
        ctes.append(
            f"y{k} AS (SELECT i AS pos, CAST(sum(st * vq[i]) AS BIGINT) AS y "
            f"FROM t{k} CROSS JOIN {dims} GROUP BY i)"
        )
        ctes.append(
            f"n{k} AS (SELECT list(y ORDER BY pos) AS yl, "
            f"sqrt(list_reduce(list_transform(list(CAST(y AS DOUBLE) ORDER BY pos), "
            f"x -> x * x), (a, b) -> a + b)) AS nrm FROM y{k})"
        )
        ctes.append(
            f"v{k} AS (SELECT list_transform(yl, x -> "
            f"CAST(floor(CAST(x AS DOUBLE) / nrm * {q} + 0.5) AS BIGINT)) AS v FROM n{k})"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT i - 1 AS pos, v[i] AS component_q, CAST(v[i] AS DOUBLE) / {q} AS component
FROM v{iters} CROSS JOIN (SELECT unnest(range(1, len((SELECT v FROM v{iters})) + 1)) AS i)
"""
    )


def _label_centroid_cosine_sql() -> str:
    from tickdatapipeline_spark.operators.similarity import OUTLIER_Q

    dot = SQL_DOT.format(a="a.s", b="b.s")
    na = SQL_NORM.format(a="a.s")
    nb = SQL_NORM.format(a="b.s")
    return f"""
WITH base AS (
    SELECT CAST(label AS BIGINT) AS label,
           list_transform({SQL_VEC},
                          x -> CAST(floor(x * {OUTLIER_Q} + 0.5) AS BIGINT)) AS vq
    FROM embeddings
),
dims AS (
    SELECT label, i AS pos, CAST(sum(vq[i]) AS BIGINT) AS sx, count(*) AS n
    FROM base
    CROSS JOIN (SELECT unnest(range(1, len((SELECT vq FROM base LIMIT 1)) + 1)) AS i)
    GROUP BY label, i
),
sums AS (
    SELECT label, list(CAST(sx AS DOUBLE) ORDER BY pos) AS s, max(n) AS n
    FROM dims GROUP BY label
)
SELECT a.label AS label_a, b.label AS label_b,
       a.n AS n_a, b.n AS n_b,
       {sql_rnd(f"({dot}) / nullif({na} * {nb}, 0)")} AS cosine
FROM sums a JOIN sums b ON a.label < b.label
"""


def _embedding_outliers_sql() -> str:
    from tickdatapipeline_spark.operators.similarity import OUTLIER_Q

    return f"""
WITH base AS (
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           list_transform({SQL_VEC},
                          x -> CAST(floor(x * {OUTLIER_Q} + 0.5) AS BIGINT)) AS vq
    FROM embeddings
),
dims AS (
    SELECT i AS pos, sum(vq[i]) AS sx, count(*) AS n
    FROM base
    CROSS JOIN (SELECT unnest(range(1, len((SELECT vq FROM base LIMIT 1)) + 1)) AS i)
    GROUP BY i
),
cent AS (
    SELECT list(CASE WHEN sx < 0 THEN -(abs(sx) // n) ELSE sx // n END
                ORDER BY pos) AS c
    FROM dims
)
SELECT vec_id,
       CAST(list_reduce(list_transform(range(1, len(vq) + 1),
                                       i -> (vq[i] - c[i]) * (vq[i] - c[i])),
                        (x, y) -> x + y) AS BIGINT) AS dist_q
FROM base, cent
ORDER BY dist_q DESC, vec_id
LIMIT {OUTLIER_TOP_N}
"""


REPETITION_SQL = f"""
WITH base AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id, {SQL_TOKENS} AS t FROM documents
),
bg AS (
    SELECT doc_id,
           CASE WHEN len(t) >= 2
                THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
                ELSE [] END AS b
    FROM base
),
top AS (
    SELECT doc_id, max(c) AS top_cnt FROM (
        SELECT doc_id, tok, count(*) AS c
        FROM (SELECT doc_id, unnest(t) AS tok FROM base)
        GROUP BY doc_id, tok
    ) GROUP BY doc_id
)
SELECT base.doc_id,
       CAST(len(t) AS BIGINT) AS n_tokens,
       {sql_rnd("CASE WHEN len(t) > 0 THEN CAST(len(t) - len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE) ELSE 0.0 END")} AS dup_token_frac,
       {sql_rnd("CASE WHEN len(t) > 0 THEN CAST(COALESCE(top_cnt, 0) AS DOUBLE) / CAST(len(t) AS DOUBLE) ELSE 0.0 END")} AS top_token_frac,
       {sql_rnd("CASE WHEN len(b) > 0 THEN CAST(len(b) - len(list_distinct(b)) AS DOUBLE) / CAST(len(b) AS DOUBLE) ELSE 0.0 END")} AS dup_bigram_frac
FROM base
JOIN bg USING (doc_id)
LEFT JOIN top USING (doc_id)
"""

N_SHARDS = 16

SHARDS_SQL = f"""
SELECT doc_id, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
FROM (
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           {sql_h60("'shard:' || CAST(CAST(doc_id AS BIGINT) AS VARCHAR)")} AS h,
           {sql_h60("'shard:' || CAST(CAST(doc_id AS BIGINT) AS VARCHAR)")} % {N_SHARDS} AS shard
    FROM documents
)
"""

SIMHASH_PAIRS_SQL = f"""
WITH tok AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id, unnest({SQL_TOKENS}) AS tok
    FROM documents
),
bits AS (
    SELECT doc_id, {sql_h60('tok')} AS h, unnest(range(0, {SIMHASH_BITS})) AS bit
    FROM tok
),
votes AS (
    SELECT doc_id, bit, sum(((h // (1::BIGINT << CAST(bit AS INTEGER))) % 2) * 2 - 1) AS v
    FROM bits GROUP BY doc_id, bit
),
sig AS (
    SELECT doc_id,
           CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << CAST(bit AS INTEGER)) ELSE 0 END) AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
),
bands AS (
    SELECT doc_id, simhash, band, (simhash // (1::BIGINT << CAST(band * 8 AS INTEGER))) % 256 AS band_key
    FROM (SELECT doc_id, simhash, unnest(range(0, 4)) AS band FROM sig)
)
SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
       CAST(bit_count(xor(l.simhash, r.simhash)) AS BIGINT) AS hamming
FROM bands l JOIN bands r
  ON l.band = r.band AND l.band_key = r.band_key AND l.doc_id < r.doc_id
WHERE bit_count(xor(l.simhash, r.simhash)) <= 3
"""


# ================= registry =================


# ================= round-7 additions =================


_JACCARD_EXPR = sql_rnd(
    "CAST(inter_count AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter_count AS DOUBLE)"
)

SWEEP_FLOOR = 0.2  # sweep well below the production threshold


def dedup_sweep_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup threshold sweep: a 0.05-wide histogram of verified
    pair similarities down to a low floor — the calibration query you
    run BEFORE trusting a dedup threshold (a cliff in the histogram is
    where the corpus's natural duplication ends; the production
    JACCARD_THRESHOLD should sit in the valley). Mirrors the tick
    engine's q4_threshold_sweep posture on the corpus side.

    Exactness: bucket = floor(jaccard * 20) on the already-rounded
    jaccard values, so both engines bucket identical doubles; per-
    bucket MIN/MAX are order-independent.

    Scale: the full LSH+overlap sub-DAG at a lower verification floor
    (more verified pairs, same candidate set), then an O(buckets)
    aggregate.
    """
    pairs = jaccard_pairs(_docs(spark, sf_dir), SWEEP_FLOOR, max_band_bucket=None)
    b = F.floor(F.col("jaccard") * 20).cast("long")
    return (
        pairs.groupBy(b.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("jaccard").alias("min_jaccard"),
            F.max("jaccard").alias("max_jaccard"),
        )
        .select(
            "bucket", (F.col("bucket") / 20.0).alias("bucket_lo"),
            "n_pairs", "min_jaccard", "max_jaccard",
        )
    )


DEDUP_SWEEP_SQL = f"""
WITH {MINHASH_CTE},
{_LSH_CAND_CTE},
{_HSH_CTE},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS inter_count
    FROM cand c
    JOIN hsh a ON a.doc_id = c.doc_a
    JOIN hsh b ON b.doc_id = c.doc_b AND b.g = a.g
    GROUP BY c.doc_a, c.doc_b
),
jp AS (
    SELECT {_JACCARD_EXPR} AS jaccard
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE {_JACCARD_EXPR} >= {SWEEP_FLOOR}
)
SELECT CAST(floor(jaccard * 20) AS BIGINT) AS bucket,
       CAST(floor(jaccard * 20) AS BIGINT) / 20.0 AS bucket_lo,
       count(*) AS n_pairs,
       min(jaccard) AS min_jaccard,
       max(jaccard) AS max_jaccard
FROM jp GROUP BY 1
"""


def value_ks_drift_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the value
    distributions of two deterministic halves of the event stream
    (event_id parity stands in for 'reference window vs current
    window') — the exact drift statistic behind 'did this feed's value
    distribution move' monitors, complementing the binned histogram
    (events_value_histogram) with a bin-free supremum.

    Exactness: values are exact integer cents; both empirical CDFs are
    integer cumulative counts divided once per distinct value and
    rounded; the supremum and its argmin location are picked on those
    identical doubles (ties -> lowest value).

    Scale: everything reduces to ONE row per distinct cent value
    before any window — the cumulative windows run over a domain
    bounded by the VALUE RANGE (10^5-ish rows for dollar-scale
    values), not by event volume, the same bounded-grid posture as the
    histogram/gap-fill queries; the global window is a SinglePartition
    over that bounded domain by construction.

    Output: one row (n_a, n_b, ks_stat, ks_at_value).
    """
    from pyspark.sql import Window

    ev = read_events(spark, sf_dir)
    vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    per_v = (
        ev.select((F.col("event_id") % 2).alias("side"), vc.alias("vc"))
        .groupBy("vc")
        .agg(
            F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("cb"),
        )
    )
    w = Window.orderBy("vc").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot = per_v.agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    cdf = (
        per_v.withColumn("cum_a", F.sum("ca").over(w))
        .withColumn("cum_b", F.sum("cb").over(w))
        .crossJoin(F.broadcast(tot))
        .select(
            "vc", "n_a", "n_b",
            F.abs(
                rnd(F.col("cum_a").cast("double") / F.col("n_a").cast("double"))
                - rnd(F.col("cum_b").cast("double") / F.col("n_b").cast("double"))
            ).alias("diff"),
        )
    )
    # the supremum row: TakeOrdered-1 over the bounded value domain
    # (ties -> lowest value), carrying the totals along
    return (
        cdf.orderBy(F.col("diff").desc(), "vc")
        .limit(1)
        .select(
            "n_a", "n_b",
            rnd(F.col("diff")).alias("ks_stat"),
            (F.col("vc") / 100.0).alias("ks_at_value"),
        )
    )


VALUE_KS_SQL = f"""
WITH per_v AS (
    SELECT vc,
           CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
           CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
    FROM (SELECT event_id % 2 AS side,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
          FROM events)
    GROUP BY vc
),
tot AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b FROM per_v),
cdf AS (
    SELECT vc, n_a, n_b,
           abs({sql_rnd('CAST(sum(ca) OVER w AS DOUBLE) / CAST(n_a AS DOUBLE)')}
             - {sql_rnd('CAST(sum(cb) OVER w AS DOUBLE) / CAST(n_b AS DOUBLE)')}) AS diff
    FROM per_v CROSS JOIN tot
    WINDOW w AS (ORDER BY vc ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT n_a, n_b, {sql_rnd('diff')} AS ks_stat, vc / 100.0 AS ks_at_value
FROM cdf
ORDER BY diff DESC, vc
LIMIT 1
"""


def hourly_ohlc_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC candles of event values per event type — the bar
    engine's open/high/low/close semantics (operators/bars.py B1)
    re-applied to the generic event stream on TIME-based windows
    instead of count-based ones: the resampling step every metrics
    dashboard runs before charting a value series.

    Open/close are the values of the FIRST/LAST event in the hour with
    ties broken by event_id (min_by/max_by on the packed (tus,
    event_id) order key — deterministic, like the tick engine's
    first_tick bookkeeping). All four legs are exact integer cents; no
    float crosses rows.

    Scale: ONE map-side-combinable groupBy on (hour, type) — min_by/
    max_by carry one (key, value) pair per partial aggregate; output is
    O(hours x types) rows.
    """
    ev = read_events(spark, sf_dir)
    vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    # one BIGINT order key: micros WITHIN the hour (< 2^32) packed above
    # event_id (< 2^31 by the driver generator; in-plan guard keeps the
    # packing honest) — absolute micros would overflow the shift
    okey = F.expr(
        "((ts DIV 1000) % 3600000000) * 2147483648 + "
        "CASE WHEN event_id BETWEEN 0 AND 2147483647 THEN event_id "
        "ELSE raise_error(printf('hourly_ohlc: event_id %d outside packable range', event_id)) END"
    )
    return (
        ev.select(
            F.expr("(ts DIV 1000000000 DIV 3600) * 3600").alias("hour_s"),
            "event_type", vc.alias("vc"), okey.alias("ok"),
        )
        .groupBy("hour_s", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.min_by("vc", "ok") / 100.0).alias("open"),
            (F.max("vc") / 100.0).alias("high"),
            (F.min("vc") / 100.0).alias("low"),
            (F.max_by("vc", "ok") / 100.0).alias("close"),
        )
    )


HOURLY_OHLC_SQL = """
SELECT (epoch_us(ts) // 1000000 // 3600) * 3600 AS hour_s, event_type,
       count(*) AS n_events,
       arg_min(vc, ok) / 100.0 AS open,
       max(vc) / 100.0 AS high,
       min(vc) / 100.0 AS low,
       arg_max(vc, ok) / 100.0 AS close
FROM (
    SELECT ts, event_type,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc,
           (epoch_us(ts) % 3600000000) * 2147483648 + event_id AS ok
    FROM events
)
GROUP BY 1, 2
"""


def type_transitions_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition (Markov bigram) matrix: for every
    ordered (prev_type, next_type) pair, how many consecutive-event
    transitions occurred, across how many distinct users, and the share
    of all transitions leaving prev_type — the behavioral fingerprint
    behind journey mining and anomaly baselines ("view never goes
    straight to refund").

    Cross-engine exactness: transition counts are integers from a
    per-user lag; the share divides two exact integers (the denominator
    via a window over the |types|^2 aggregate rows) and rounds with the
    shared policy.

    Scale: ONE hash exchange on user_id serves the lag window; the
    distinct-user count is a second map-side-combinable aggregate level
    (groupBy (prev, next, user) then (prev, next)) — no expand-based
    countDistinct over the raw stream; the share window runs over
    |types|^2 rows only.
    """
    from pyspark.sql import Window

    ev = read_events(spark, sf_dir).select(
        "user_id", "event_id", "event_type", F.expr("ts DIV 1000").alias("tus")
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    seq = ev.withColumn("prev_type", F.lag("event_type").over(w)).where(
        F.col("prev_type").isNotNull()
    )
    per_user = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n"))
    t = per_user.groupBy("prev_type", "next_type").agg(
        F.sum("n").alias("n_transitions"), F.count(F.lit(1)).alias("n_users")
    )
    wt = Window.partitionBy("prev_type")
    return t.select(
        "prev_type", "next_type", "n_transitions", "n_users",
        rnd(
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(wt).cast("double")
        ).alias("share"),
    )


TYPE_TRANSITIONS_SQL = f"""
WITH seq AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS prev_type
    FROM events
),
per_user AS (
    SELECT prev_type, event_type AS next_type, user_id, count(*) AS n
    FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2, 3
),
t AS (
    SELECT prev_type, next_type, CAST(sum(n) AS BIGINT) AS n_transitions,
           count(*) AS n_users
    FROM per_user GROUP BY 1, 2
)
SELECT prev_type, next_type, n_transitions, n_users,
       {sql_rnd('CAST(n_transitions AS DOUBLE) / CAST(sum(n_transitions) OVER (PARTITION BY prev_type) AS DOUBLE)')} AS share
FROM t
"""


NGRAM_NOVELTY_SQL = f"""
WITH {SHINGLES_CTE},
grams AS (SELECT doc_id, {sql_h60('shingle')} AS g FROM shingles),
firsts AS (SELECT g, min(doc_id) AS first_doc FROM grams GROUP BY g)
SELECT s.doc_id, count(*) AS n_grams,
       CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       {sql_rnd('CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)')} AS novelty
FROM grams s JOIN firsts f ON s.g = f.g
GROUP BY s.doc_id
"""


CROSS_SOURCE_SQL = f"""
WITH {MINHASH_CTE},
{_LSH_CAND_CTE},
{_HSH_CTE},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS inter_count
    FROM cand c
    JOIN hsh a ON a.doc_id = c.doc_a
    JOIN hsh b ON b.doc_id = c.doc_b AND b.g = a.g
    GROUP BY c.doc_a, c.doc_b
),
jp AS (
    SELECT doc_a, doc_b, {_JACCARD_EXPR} AS jaccard
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE {_JACCARD_EXPR} >= {JACCARD_THRESHOLD}
),
lab AS (
    SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b, jaccard
    FROM jp
    JOIN (SELECT CAST(doc_id AS BIGINT) AS doc_id, source FROM documents) da
      ON jp.doc_a = da.doc_id
    JOIN (SELECT CAST(doc_id AS BIGINT) AS doc_id, source FROM documents) db
      ON jp.doc_b = db.doc_id
)
SELECT source_a, source_b, count(*) AS n_pairs,
       min(jaccard) AS min_jaccard, max(jaccard) AS max_jaccard
FROM lab GROUP BY 1, 2
"""


SOURCE_CAP_N = 10  # caps every ~25-doc sf0.01 source, exercising the band


def _source_cap_sql(cap: int, oversample: float = 2.0) -> str:
    from tickdatapipeline_spark.oracle import dlit

    band = (
        f"least({dlit(1.0)}, {dlit(float(oversample * cap))} / CAST(c.n_src AS DOUBLE))"
        f" * {dlit(float(1 << 60))}"
    )
    return f"""
WITH base AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
           {sql_h60("'cap:' || CAST(CAST(doc_id AS BIGINT) AS VARCHAR)")} AS h
    FROM documents
),
counts AS (SELECT source, count(*) AS n_src FROM base GROUP BY source),
pre AS (
    SELECT b.doc_id, b.source, b.h
    FROM base b JOIN counts c ON b.source = c.source
    WHERE CAST(b.h AS DOUBLE) < {band}
),
ranked AS (
    SELECT doc_id, source,
           CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS BIGINT)
               AS sample_rank
    FROM pre
)
SELECT doc_id, source, sample_rank FROM ranked WHERE sample_rank <= {cap}
"""




# ================= round-8 additions: CUSUM / DSIR / SemDeDup =================

def value_cusum_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM mean-shift changepoint per event type — for each type, the
    hour at which the cumulative deviation from the overall mean peaks
    (Page 1954's cumulative-sum statistic, the classic "when did this
    metric's level change" detector behind drift alarms).

    Statistic: over the per-hour value sums x_1..x_H (cents), the
    change point is argmax_k |H*S_k - k*T| with S_k the prefix sum and
    T the total — the integer-cleared form of |S_k - k*mean|*H, so the
    WHOLE detection path is BIGINT (no float crosses rows; the
    before/after hourly means are single divisions of identical
    integers, rounded for the oracle hash). Ties resolve to the
    earliest hour.

    Scale: the raw stream reduces map-side to O(hours x types) rows
    before any window; both windows partition by event_type over that
    aggregate (the repo's event-analytics posture — grid/window work
    never touches raw events). int64 bound: H * S_k caps hourly-sum
    volume at ~9e18/H cents; ANSI mode raises loudly on overflow
    rather than wrapping.
    """
    from pyspark.sql import Window

    ev = read_events(spark, sf_dir)
    vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    hourly = (
        ev.select(
            F.expr("(ts DIV 1000000000 DIV 3600) * 3600").alias("hour_s"),
            "event_type", vc.alias("vc"),
        )
        .groupBy("event_type", "hour_s")
        .agg(F.sum("vc").alias("h_sum"))
    )
    return cusum_over_hourly(hourly)


def cusum_over_hourly(hourly: DataFrame) -> DataFrame:
    """The CUSUM argmax algebra over a prepared (event_type, hour_s,
    h_sum) aggregate — shared by the batch query above and the
    streaming monitor (streaming.run_value_cusum_stream), which feeds
    it the store-accumulated hourly sums each micro-batch."""
    from pyspark.sql import Window

    wo = Window.partitionBy("event_type").orderBy("hour_s")
    wa = Window.partitionBy("event_type")
    cum = (
        hourly.select(
            "event_type", "hour_s",
            F.sum("h_sum").over(wo).alias("s_k"),
            F.row_number().over(wo).cast("long").alias("k"),
            F.sum("h_sum").over(wa).alias("total"),
            F.count(F.lit(1)).over(wa).alias("h"),
        )
        .where(F.col("k") < F.col("h"))  # D_H = 0 by construction
        .withColumn("stat", F.abs(F.col("h") * F.col("s_k") - F.col("k") * F.col("total")))
    )
    wr = Window.partitionBy("event_type").orderBy(F.desc("stat"), "k")
    return (
        cum.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select(
            "event_type", F.col("hour_s").alias("cp_hour_s"), "k",
            F.col("h").alias("n_hours"), "stat",
            rnd(F.col("s_k").cast("double") / F.col("k") / 100.0).alias("mean_before"),
            rnd((F.col("total") - F.col("s_k")).cast("double")
                / (F.col("h") - F.col("k")) / 100.0).alias("mean_after"),
        )
        .orderBy("event_type")
    )


VALUE_CUSUM_SQL = f"""
WITH hourly AS (
    SELECT event_type, (epoch_us(ts) // 1000000 // 3600) * 3600 AS hour_s,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS h_sum
    FROM events GROUP BY 1, 2
),
cum AS (
    SELECT event_type, hour_s,
           CAST(sum(h_sum) OVER (PARTITION BY event_type ORDER BY hour_s) AS BIGINT) AS s_k,
           CAST(row_number() OVER (PARTITION BY event_type ORDER BY hour_s) AS BIGINT) AS k,
           CAST(sum(h_sum) OVER (PARTITION BY event_type) AS BIGINT) AS total,
           count(*) OVER (PARTITION BY event_type) AS h
    FROM hourly
),
scored AS (
    SELECT *, abs(h * s_k - k * total) AS stat FROM cum WHERE k < h
)
SELECT event_type, hour_s AS cp_hour_s, k, CAST(h AS BIGINT) AS n_hours,
       CAST(stat AS BIGINT) AS stat,
       {sql_rnd("CAST(s_k AS DOUBLE) / k / 100.0")} AS mean_before,
       {sql_rnd("CAST(total - s_k AS DOUBLE) / (h - k) / 100.0")} AS mean_after
FROM (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY stat DESC, k) AS rn
      FROM scored)
WHERE rn = 1
ORDER BY event_type
"""


DSIR_TARGET_SOURCE = "src0"
DSIR_SCALE = 1_000_000


IMPORTANCE_SQL = f"""
WITH tok AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source, {SQL_TOKENS} AS t FROM documents
),
feats AS (
    SELECT doc_id, source,
           unnest(list_concat(
               list_transform(t, x -> 'u|' || x),
               CASE WHEN len(t) >= 2
                    THEN list_transform(range(1, len(t)), i -> 'b|' || t[i] || ' ' || t[i + 1])
                    ELSE []::VARCHAR[] END
           )) AS feat
    FROM tok
),
df AS (
    SELECT doc_id, source, {sql_h60('feat')} AS f, count(*) AS n
    FROM feats GROUP BY 1, 2, 3
),
fs AS (
    SELECT f, CAST(sum(n) AS BIGINT) AS cs,
           CAST(sum(CASE WHEN source = '{DSIR_TARGET_SOURCE}' THEN n ELSE 0 END) AS BIGINT) AS ct
    FROM df GROUP BY f
),
tot AS (
    SELECT CAST(sum(cs) AS BIGINT) AS ts, CAST(sum(ct) AS BIGINT) AS tt,
           count(*) AS v
    FROM fs
),
scored AS (
    SELECT doc_id, source,
           CAST(sum(n * ({DSIR_SCALE} * (ct + 1) // (cs + 1))) AS BIGINT) AS num,
           CAST(sum(n) AS BIGINT) AS den
    FROM df JOIN fs USING (f) GROUP BY 1, 2
)
SELECT doc_id, source, den AS n_feats,
       {sql_rnd(f"CAST(num AS DOUBLE) / ({float(DSIR_SCALE)!r} * den) * (CAST(ts + v AS DOUBLE) / (tt + v))")} AS score
FROM scored CROSS JOIN tot
"""


SEMDEDUP_THRESHOLD = 0.25


def _semdedup_sql(threshold: float, n_cells: int = 8) -> str:
    """DuckDB twin of similarity.semantic_dedup: the IVF assignment
    CTEs (identical to IVF_SQL's) keeping the crank-1 centroid sim,
    then the pair-local farther-from-centroid survival rule."""
    from tickdatapipeline_spark.oracle import dlit

    asim = sql_cos("b.v", "c")
    pcos = sql_cos("a.v", "b.v", 6)
    return f"""
WITH base AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, {SQL_VEC} AS v FROM embeddings),
cents AS (SELECT vec_id AS cell, v AS c FROM base WHERE vec_id < {n_cells}),
cscored AS (
    SELECT b.vec_id, b.v, cell, {asim} AS sim
    FROM base b CROSS JOIN cents
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS crank
    FROM cscored
),
assigned AS (SELECT vec_id, v, cell, sim AS centroid_sim FROM ranked WHERE crank = 1),
beaten AS (
    SELECT DISTINCT b.vec_id
    FROM assigned a JOIN assigned b
      ON a.cell = b.cell AND a.vec_id <> b.vec_id
    WHERE {pcos} >= {dlit(threshold)}
      AND (a.centroid_sim < b.centroid_sim
           OR (a.centroid_sim = b.centroid_sim AND a.vec_id < b.vec_id))
)
SELECT a.vec_id, a.cell, a.centroid_sim, (bt.vec_id IS NULL) AS kept
FROM assigned a LEFT JOIN beaten bt ON a.vec_id = bt.vec_id
"""



WINNOW_MIN_SHARED = 10


SUBSTRING_DUP_SQL = """
WITH norm AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS s
    FROM documents
),
grams AS (
    SELECT doc_id, unnest(range(1, greatest(length(s) - 11, 0) + 1)) AS p, s
    FROM norm
),
gh AS (SELECT doc_id, p, CAST('0x' || substring(md5(substring(s, CAST(p AS INT), 12)), 18, 15) AS BIGINT) AS gh FROM grams),
win AS (
    SELECT doc_id, p,
           min(gh) OVER (PARTITION BY doc_id ORDER BY p
                         ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING) AS fp,
           count(*) OVER (PARTITION BY doc_id) AS n_grams
    FROM gh
),
fps AS (SELECT DISTINCT doc_id, fp FROM win WHERE p <= n_grams - 5)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_fp
FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= 10
ORDER BY n_shared_fp DESC, doc_a, doc_b
"""




def user_rfm_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation of the event stream: per user, Recency (last
    activity), Frequency (event count) and Monetary (value sum) are
    quartiled WITHIN the user's first-seen-week cohort, and the
    output is the per-(cohort, R, F, M) segment summary — the
    classic marketing-analytics cut ("week-12 signups in segment
    1-1-1 are the whales").

    Quartiling within the signup cohort (standard practice — cross-
    cohort RFM mixes lifetimes) is also what keeps the plan scale-
    honest: every ntile window partitions by cohort_week, so no
    corpus-wide single-partition sort exists; ties order by user_id
    for cross-engine determinism (the r12 convention).

    Exactness: recency/frequency/monetary are BIGINT (micros, counts,
    cents); the only float is the final total_value division.

    Scale: one map-side-combinable per-user aggregate over raw events;
    three ntile windows over the |users| aggregate partitioned by
    cohort; the segment rollup is O(cohorts x 64) rows.
    """
    from pyspark.sql import Window

    ev = read_events(spark, sf_dir)
    vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    per_user = (
        ev.select(
            "user_id", F.expr("ts DIV 1000").alias("tus"), vc.alias("vc"),
        )
        .groupBy("user_id")
        .agg(
            F.max("tus").alias("last_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("vc").alias("value_c"),
            F.expr("(min(tus) DIV 1000000 DIV 604800) * 604800").alias("cohort_week"),
        )
    )
    def quart(order_cols):
        return F.ntile(4).over(
            Window.partitionBy("cohort_week").orderBy(*order_cols)
        ).cast("long")
    scored = per_user.select(
        "cohort_week", "value_c",
        quart([F.col("last_us").desc(), F.col("user_id")]).alias("r"),
        quart([F.col("n_events").desc(), F.col("user_id")]).alias("f"),
        quart([F.col("value_c").desc(), F.col("user_id")]).alias("m"),
    )
    return (
        scored.groupBy("cohort_week", "r", "f", "m")
        .agg(F.count(F.lit(1)).alias("n_users"),
             (F.sum("value_c") / 100.0).alias("total_value"))
        .orderBy("cohort_week", "r", "f", "m")
    )


USER_RFM_SQL = """
WITH per_user AS (
    SELECT user_id,
           max(epoch_us(ts)) AS last_us,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_c,
           (min(epoch_us(ts)) // 1000000 // 604800) * 604800 AS cohort_week
    FROM events GROUP BY user_id
),
scored AS (
    SELECT cohort_week, value_c,
           CAST(ntile(4) OVER (PARTITION BY cohort_week ORDER BY last_us DESC, user_id) AS BIGINT) AS r,
           CAST(ntile(4) OVER (PARTITION BY cohort_week ORDER BY n_events DESC, user_id) AS BIGINT) AS f,
           CAST(ntile(4) OVER (PARTITION BY cohort_week ORDER BY value_c DESC, user_id) AS BIGINT) AS m
    FROM per_user
)
SELECT cohort_week, r, f, m, count(*) AS n_users,
       sum(value_c) / 100.0 AS total_value
FROM scored GROUP BY 1, 2, 3, 4
ORDER BY cohort_week, r, f, m
"""


SEASONAL_TOP = 3


def seasonal_anomaly_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly hours: for each event type, the
    SEASONAL_TOP hours whose value sum deviates most from that type's
    hour-of-day baseline (the seasonal-naive residual every on-call
    dashboard draws — "3am traffic looked like 3pm").

    Exactness: the deviation test is integer-cleared — stat =
    |h_sum * n_hod - base_sum| with base_sum/n_hod the hour-of-day
    baseline over the whole span — so detection is BIGINT end to end;
    the reported baseline mean is one rounded division.

    Scale: raw events reduce map-side to O(hours x types); the
    baseline is a second tiny aggregate (24 x types) broadcast back;
    the top-k rank window partitions by type over the hourly frame
    and plans as WindowGroupLimit.
    """
    from pyspark.sql import Window

    ev = read_events(spark, sf_dir)
    vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    hourly = (
        ev.select(
            F.expr("(ts DIV 1000000000 DIV 3600) * 3600").alias("hour_s"),
            "event_type", vc.alias("vc"),
        )
        .groupBy("event_type", "hour_s")
        .agg(F.sum("vc").alias("h_sum"))
        .withColumn("hod", F.expr("(hour_s DIV 3600) % 24"))
    )
    base = hourly.groupBy("event_type", "hod").agg(
        F.sum("h_sum").alias("base_sum"), F.count(F.lit(1)).alias("n_hod")
    )
    joined = hourly.join(F.broadcast(base), ["event_type", "hod"])
    stat = F.abs(F.col("h_sum") * F.col("n_hod") - F.col("base_sum"))
    w = Window.partitionBy("event_type").orderBy(F.desc("stat"), "hour_s")
    return (
        joined.withColumn("stat", stat)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= SEASONAL_TOP)
        .select(
            "event_type", "hour_s", "hod", "rnk",
            (F.col("h_sum") / 100.0).alias("hour_value"),
            "stat", "n_hod",
            rnd(F.col("base_sum").cast("double") / F.col("n_hod") / 100.0).alias("baseline_mean"),
        )
        .orderBy("event_type", "rnk")
    )


SEASONAL_ANOMALY_SQL = f"""
WITH hourly AS (
    SELECT event_type, (epoch_us(ts) // 1000000 // 3600) * 3600 AS hour_s,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS h_sum
    FROM events GROUP BY 1, 2
),
hh AS (SELECT *, (hour_s // 3600) % 24 AS hod FROM hourly),
base AS (
    SELECT event_type, hod, CAST(sum(h_sum) AS BIGINT) AS base_sum,
           count(*) AS n_hod
    FROM hh GROUP BY 1, 2
),
scored AS (
    SELECT hh.event_type, hh.hour_s, hh.hod, hh.h_sum, base.base_sum, base.n_hod,
           abs(hh.h_sum * base.n_hod - base.base_sum) AS stat
    FROM hh JOIN base ON hh.event_type = base.event_type AND hh.hod = base.hod
)
SELECT event_type, hour_s, hod,
       CAST(rnk AS BIGINT) AS rnk,
       h_sum / 100.0 AS hour_value,
       CAST(stat AS BIGINT) AS stat,
       CAST(n_hod AS BIGINT) AS n_hod,
       (floor((CAST(base_sum AS DOUBLE) / n_hod / 100.0) * 1000000.0 + 0.5) / 1000000.0) AS baseline_mean
FROM (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY stat DESC, hour_s) AS rnk
      FROM scored)
WHERE rnk <= {SEASONAL_TOP}
ORDER BY event_type, rnk
"""


# ================= round 9: graph / skew / readability / pareto =================


FUNNEL_LAT_PCTS = [0.5, 0.9, 1.0]


def funnel_latency_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency percentiles per funnel transition: exact
    interpolated p50/p90/max of (view -> click) and (click -> purchase)
    times — `events_funnel` says HOW MANY convert, this says HOW FAST
    (the SLA/abandonment readout). Same stage gating as the funnel
    (first qualifying event strictly after the prior stage, within its
    24 h window); latencies are exact integer micros and the percentile
    is `plans.common.grouped_exact_percentiles`, whose ranking windows
    partition BY TRANSITION — never a global sort."""
    from tickdatapipeline_spark.plans.common import grouped_exact_percentiles

    ev = read_events(spark, sf_dir).select(
        "user_id", "event_type", F.expr("ts DIV 1000").alias("tus")
    )
    win = F.lit(FUNNEL_WINDOW_US)
    v = (ev.where(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("tus").alias("t1")))
    c = (ev.where(F.col("event_type") == "click")
         .join(v, "user_id")
         .where((F.col("tus") > F.col("t1")) & (F.col("tus") <= F.col("t1") + win))
         .groupBy("user_id")
         .agg(F.min("tus").alias("t2"), F.min("t1").alias("t1")))
    p = (ev.where(F.col("event_type") == "purchase")
         .join(c.select("user_id", "t2"), "user_id")
         .where((F.col("tus") > F.col("t2")) & (F.col("tus") <= F.col("t2") + win))
         .groupBy("user_id")
         .agg(F.min("tus").alias("t3"), F.min("t2").alias("t2")))
    lats = (
        c.select(F.lit("view_to_click").alias("transition"),
                 (F.col("t2") - F.col("t1")).alias("lat_us"))
        .unionByName(
            p.select(F.lit("click_to_purchase").alias("transition"),
                     (F.col("t3") - F.col("t2")).alias("lat_us")))
    )
    return grouped_exact_percentiles(
        lats, "transition", "lat_us", FUNNEL_LAT_PCTS, out_value="latency_us"
    ).orderBy("transition", "pct")


def _funnel_latency_sql() -> str:
    from tickdatapipeline_spark.plans.common import sql_grouped_exact_percentiles

    src = f"""
WITH v AS (
    SELECT user_id, min(epoch_us(ts)) AS t1
    FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
    SELECT e.user_id, min(epoch_us(e.ts)) AS t2, min(v.t1) AS t1
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click'
      AND epoch_us(e.ts) > v.t1 AND epoch_us(e.ts) <= v.t1 + {FUNNEL_WINDOW_US}
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, min(epoch_us(e.ts)) AS t3, min(c.t2) AS t2
    FROM events e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase'
      AND epoch_us(e.ts) > c.t2 AND epoch_us(e.ts) <= c.t2 + {FUNNEL_WINDOW_US}
    GROUP BY e.user_id
)
SELECT 'view_to_click' AS transition, t2 - t1 AS lat_us FROM c
UNION ALL
SELECT 'click_to_purchase', t3 - t2 FROM p
"""
    return (
        sql_grouped_exact_percentiles(
            src, "transition", "lat_us", FUNNEL_LAT_PCTS, out_value="latency_us"
        )
        + " ORDER BY transition, pct"
    )


FUNNEL_LATENCY_SQL = _funnel_latency_sql()


IVF_SWEEP_NPROBES = (1, 2, 4)


def ivf_recall_sweep_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall-vs-cost curve of the IVF path: POOLED recall@k (Σ hits /
    Σ truth across all queries — exact integer ratio, never an average
    of per-query floats) at nprobe 1, 2 and 4 — the one table a user
    needs to pick the IVF cost knob (each probed cell costs
    ~nprobe/n_cells of brute force). The exact ground-truth top-k is
    computed ONCE (pinned) and reused by every sweep point."""
    from tickdatapipeline_spark.operators.globalorder import pin

    emb = _emb(spark, sf_dir)
    exact = pin(cosine_topk(emb, TOPK_K, QUERY_MOD))
    parts = []
    for np_ in IVF_SWEEP_NPROBES:
        r = ann_recall(ann_topk_ivf(emb, TOPK_K, QUERY_MOD, nprobe=np_), exact)
        parts.append(r.agg(
            F.lit(np_).cast("long").alias("nprobe"),
            F.count(F.lit(1)).alias("n_queries"),
            F.sum("n_exact").alias("exact_total"),
            F.sum("n_hit").alias("hit_total"),
            rnd(F.sum("n_hit").cast("double")
                / F.sum("n_exact").cast("double"), 6).alias("pooled_recall"),
        ))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("nprobe")


def _ivf_recall_sweep_sql() -> str:
    """One UNION ALL branch per nprobe: the existing IVF plan with its
    probe width swapped (the single `crank <= 2` literal), wrapped in
    the shared recall algebra and pooled to one row."""
    assert IVF_SQL.count("crank <= 2") == 1, (
        "IVF_SQL's probe-width literal moved — fix the sweep's replace target"
    )
    branches = []
    for np_ in IVF_SWEEP_NPROBES:
        approx = IVF_SQL.replace("crank <= 2", f"crank <= {np_}").format(
            query_mod=QUERY_MOD, k=TOPK_K
        )
        core = _ann_recall_sql(approx)
        branches.append(f"""
SELECT CAST({np_} AS BIGINT) AS nprobe,
       CAST(count(*) AS BIGINT) AS n_queries,
       CAST(sum(n_exact) AS BIGINT) AS exact_total,
       CAST(sum(n_hit) AS BIGINT) AS hit_total,
       {sql_rnd('CAST(sum(n_hit) AS DOUBLE) / CAST(sum(n_exact) AS DOUBLE)')} AS pooled_recall
FROM ({core})""")
    return " UNION ALL ".join(branches) + " ORDER BY nprobe"


IVF_RECALL_SWEEP_SQL = _ivf_recall_sweep_sql()


def hourly_mix_hhi_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-mix concentration per hour: the Herfindahl–Hirschman
    index of the event-type shares (Σ share², 1/n_types = perfectly
    mixed, 1.0 = one type only) — the mix-drift readout that catches
    "the stream is suddenly all retries" before any per-type detector
    fires.

    Exactness: HHI = Σ cnt² / total² as a ratio of BIGINT sums with one
    double division (integer cross-multiply, never per-type float
    shares summed). Scale: one map-side (hour, type) reduce, then an
    O(hours x types) aggregate."""
    ev = read_events(spark, sf_dir).select(
        F.expr("(ts DIV 1000000000 DIV 3600) * 3600").alias("hour_s"),
        "event_type",
    )
    ht = ev.groupBy("hour_s", "event_type").agg(F.count(F.lit(1)).alias("c"))
    return (
        ht.groupBy("hour_s")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.sum("c").alias("n_events"),
            F.sum(F.col("c") * F.col("c")).alias("ss"),
        )
        .select(
            "hour_s", "n_types", "n_events",
            rnd(F.col("ss").cast("double")
                / (F.col("n_events").cast("double") * F.col("n_events").cast("double")),
                6).alias("hhi"),
        )
        .orderBy("hour_s")
    )


HOURLY_MIX_HHI_SQL = f"""
WITH ht AS (
    SELECT (epoch_us(ts) // 1000000 // 3600) * 3600 AS hour_s, event_type,
           CAST(count(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
)
SELECT hour_s, CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(c) AS BIGINT) AS n_events,
       {sql_rnd('CAST(sum(c * c) AS DOUBLE) / (CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE))')} AS hhi
FROM ht GROUP BY hour_s
ORDER BY hour_s
"""


def phash_hamming_histogram_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-distance histogram of the perceptual candidate pairs
    (any shared 7-bit band, distances 0..63 via one bit_count per
    candidate) — the calibration readout behind choosing
    media_dedup_phash's max_hamming: a bimodal histogram (a spike near
    0 + the random-pair bulk near 31) says the threshold sits in the
    valley; a flat one says the stub features need a real decoder.
    Same banded candidate generation as phash_near_duplicates, WITHOUT
    the threshold filter, aggregated to O(64) rows.

    Deployment contract: this is a CALIBRATION query — run it on a
    sample, not the full corpus. 7-bit band values saturate at 128
    distinct values, so the unfiltered candidate set itself grows
    ~n²/2^7 once buckets saturate (measured tier-2 factor 9.0 at 10x,
    PERF.md round 9 — output-bound, same class as the exhaustive media
    feature config); the histogram's answer (where the threshold
    valley sits) is sample-stable."""
    fps = perceptual_fingerprints(synth_media_from_documents(_docs(spark, sf_dir)))
    pairs = phash_near_duplicates(fps, max_hamming=63)
    return (
        pairs.groupBy("hamming")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("hamming")
    )


PHASH_HAMMING_HIST_SQL = f"""
WITH {_phash_sql_core()},
bands AS (
    SELECT media_id, phash, CAST(b AS INT) AS band,
           (phash >> (7 * b)) & 127 AS band_key
    FROM fp, unnest(range(0, 9)) AS t(b)
),
cand AS (
    SELECT DISTINCT l.media_id AS media_a, r.media_id AS media_b,
           CAST(bit_count(xor(l.phash, r.phash)) AS BIGINT) AS hamming
    FROM bands l JOIN bands r
      ON l.band = r.band AND l.band_key = r.band_key AND l.media_id < r.media_id
)
SELECT hamming, CAST(count(*) AS BIGINT) AS n_pairs
FROM cand GROUP BY hamming
ORDER BY hamming
"""


def dedup_savings_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dedup savings plan: if the corpus keeps one
    representative per verified near-dup cluster, how many documents
    and TOKENS does each source shed — the capacity/budget readout that
    turns a dedup manifest into a storage and training-token decision
    (sources with high savings are the mirror-heavy ones).

    Exact integers end to end (token counts summed as BIGINT, one
    division per share through rnd); rides the duplicate_clusters
    sub-DAG and a left join against per-doc token counts."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), "source",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tok"),
    )
    clusters = duplicate_clusters(docs, JACCARD_THRESHOLD, max_band_bucket=None)
    dropped = clusters.where(F.col("is_representative") == 0).select(
        "doc_id", F.lit(1).alias("_drop")
    )
    j = toks.join(dropped, "doc_id", "left")
    tokens_dropped = F.sum(F.when(F.col("_drop") == 1, F.col("n_tok")).otherwise(0))
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("_drop") == 1, 1).otherwise(0)).alias("docs_dropped"),
            F.sum("n_tok").alias("tokens_total"),
            tokens_dropped.alias("tokens_dropped"),
            rnd(tokens_dropped.cast("double")
                / F.nullif(F.sum("n_tok"), F.lit(0)).cast("double"),
                6).alias("token_savings"),
        )
        .orderBy("source")
    )


DEDUP_SAVINGS_SQL = f"""
WITH RECURSIVE {MINHASH_CTE},
{_LSH_CAND_CTE},
{_HSH_CTE},
shsizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS inter_count
    FROM cand c
    JOIN hsh a ON a.doc_id = c.doc_a
    JOIN hsh b ON b.doc_id = c.doc_b AND b.g = a.g
    GROUP BY c.doc_a, c.doc_b
),
vp AS MATERIALIZED (
    SELECT doc_a, doc_b
    FROM inter
    JOIN shsizes sa ON doc_a = sa.doc_id
    JOIN shsizes sb ON doc_b = sb.doc_id
    WHERE {sql_rnd('CAST(inter_count AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter_count AS DOUBLE)')} >= {JACCARD_THRESHOLD}
),
edges AS MATERIALIZED (
    SELECT doc_a AS node, doc_b AS nbr FROM vp
    UNION ALL
    SELECT doc_b AS node, doc_a AS nbr FROM vp
),
reach(node, label) AS (
    SELECT DISTINCT node, node FROM edges
    UNION
    SELECT e.node, r.label FROM edges e JOIN reach r ON r.node = e.nbr
),
comp AS (SELECT node, min(label) AS cluster_id FROM reach GROUP BY node),
drops AS (SELECT node AS doc_id FROM comp WHERE node <> cluster_id),
tok AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
           CAST(len({SQL_TOKENS}) AS BIGINT) AS n_tok
    FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS docs_dropped,
       CAST(sum(n_tok) AS BIGINT) AS tokens_total,
       CAST(sum(CASE WHEN d.doc_id IS NOT NULL THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_dropped,
       {sql_rnd('CAST(sum(CASE WHEN d.doc_id IS NOT NULL THEN n_tok ELSE 0 END) AS DOUBLE) / CAST(sum(n_tok) AS DOUBLE)')} AS token_savings
FROM tok LEFT JOIN drops d USING (doc_id)
GROUP BY source
ORDER BY source
"""


def cluster_cohesion_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster cohesion of the near-dup graph: POOLED Jaccard
    (Σ intersection / Σ union over the cluster's verified pairs) next
    to size and pair count — tight template-clique clusters score near
    1.0, chains of borderline matches score near the threshold; the
    quality readout for choosing the dedup keep-policy per cluster.

    Exactness: the pooled ratio is a ratio of two BIGINT sums with ONE
    final division — never an average of per-pair floats (a multi-row
    double sum is order-dependent, the one thing the oracle gate cannot
    absorb). Scale: the expensive verified-pairs chain runs ONCE
    (pinned) — the cluster labels come from connected_components over
    the SAME edge list, never a second jaccard_pairs pass."""
    from tickdatapipeline_spark.operators.globalorder import pin

    docs = _docs(spark, sf_dir)
    pairs = pin(jaccard_pairs(docs, JACCARD_THRESHOLD, max_band_bucket=None))
    clusters = connected_components(
        pairs.select("doc_a", "doc_b"), "doc_a", "doc_b", id_col="doc_id"
    )
    labeled = pairs.join(
        clusters.select(F.col("doc_id").alias("doc_a"), "cluster_id"), "doc_a"
    )
    sizes = clusters.select("cluster_id", "cluster_size").distinct()
    return (
        labeled.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("inter_count").alias("inter_total"),
            F.sum("union_count").alias("union_total"),
        )
        .join(sizes, "cluster_id")
        .select(
            F.col("cluster_id").cast("long").alias("cluster_id"),
            F.col("cluster_size").cast("long").alias("cluster_size"),
            "n_pairs", "inter_total", "union_total",
            rnd(F.col("inter_total").cast("double")
                / F.col("union_total").cast("double"), 6).alias("cohesion"),
        )
        .orderBy("cluster_id")
    )


CLUSTER_COHESION_SQL = f"""
WITH RECURSIVE {MINHASH_CTE},
{_LSH_CAND_CTE},
{_HSH_CTE},
shsizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS inter_count
    FROM cand c
    JOIN hsh a ON a.doc_id = c.doc_a
    JOIN hsh b ON b.doc_id = c.doc_b AND b.g = a.g
    GROUP BY c.doc_a, c.doc_b
),
vp AS MATERIALIZED (
    SELECT doc_a, doc_b, inter_count,
           sa.n_sh + sb.n_sh - inter_count AS union_count
    FROM inter
    JOIN shsizes sa ON doc_a = sa.doc_id
    JOIN shsizes sb ON doc_b = sb.doc_id
    WHERE {sql_rnd('CAST(inter_count AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter_count AS DOUBLE)')} >= {JACCARD_THRESHOLD}
),
edges AS MATERIALIZED (
    SELECT doc_a AS node, doc_b AS nbr FROM vp
    UNION ALL
    SELECT doc_b AS node, doc_a AS nbr FROM vp
),
reach(node, label) AS (
    SELECT DISTINCT node, node FROM edges
    UNION
    SELECT e.node, r.label FROM edges e JOIN reach r ON r.node = e.nbr
),
comp AS (SELECT node, min(label) AS cluster_id FROM reach GROUP BY node),
csizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
           FROM comp GROUP BY cluster_id)
SELECT CAST(comp.cluster_id AS BIGINT) AS cluster_id, csizes.cluster_size,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(inter_count) AS BIGINT) AS inter_total,
       CAST(sum(union_count) AS BIGINT) AS union_total,
       {sql_rnd('CAST(sum(inter_count) AS DOUBLE) / CAST(sum(union_count) AS DOUBLE)')} AS cohesion
FROM vp
JOIN comp ON vp.doc_a = comp.node
JOIN csizes ON comp.cluster_id = csizes.cluster_id
GROUP BY comp.cluster_id, csizes.cluster_size
ORDER BY cluster_id
"""


def dedup_graph_triangles_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the LSH candidate graph: per-doc count of
    closed triples among near-dup candidate edges — the graph-density
    readout that separates tight duplicate CLUSTERS (cliques: template
    spam, mirrored shards) from chain-like borderline matches before a
    connected-components pass lumps them together.

    The canonical distributed triangle count: edges are oriented
    doc_a < doc_b (so each triangle a<b<c is enumerated exactly once),
    one two-path equi-join (ab.b = bc.a) and one closure equi-join
    check — never an all-pairs step. The edge table is pinned once and
    reused by all three join roles; join fanout is bounded by the
    out-degree of the orientation (classic Schank-Wagner posture; at
    corpus scale the LSH band cap already bounds degenerate degrees
    upstream)."""
    from tickdatapipeline_spark.operators.globalorder import pin

    e = pin(lsh_candidate_pairs(_docs(spark, sf_dir), max_band_bucket=None))
    ab, bc, ac = e.alias("ab"), e.alias("bc"), e.alias("ac")
    tri = (
        ab.join(bc, F.col("ab.doc_b") == F.col("bc.doc_a"))
        .join(ac, (F.col("ac.doc_a") == F.col("ab.doc_a"))
              & (F.col("ac.doc_b") == F.col("bc.doc_b")))
        .select(F.col("ab.doc_a").alias("a"), F.col("ab.doc_b").alias("b"),
                F.col("bc.doc_b").alias("c"))
    )
    member = tri.select(F.explode(F.array("a", "b", "c")).alias("doc_id"))
    return (
        member.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy("doc_id")
    )


TRIANGLES_SQL = f"""
WITH {MINHASH_CTE},
{_LSH_CAND_CTE},
tri AS (
    SELECT ab.doc_a AS a, ab.doc_b AS b, bc.doc_b AS c
    FROM cand ab
    JOIN cand bc ON ab.doc_b = bc.doc_a
    JOIN cand ac ON ac.doc_a = ab.doc_a AND ac.doc_b = bc.doc_b
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_triangles
FROM (SELECT unnest([a, b, c]) AS doc_id FROM tri)
GROUP BY doc_id
ORDER BY doc_id
"""


def key_skew_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type key-skew profile over user_id — the query an operator
    runs BEFORE shipping a user-keyed join/agg at 100 TB: how many
    distinct keys, how heavy is the heaviest, and the exact Gini of the
    per-user count distribution (0 = uniform, ->1 = one user dominates;
    >~0.6 says salt the key or pre-aggregate).

    Exactness: Gini = (2*Σ(i·x_(i)) - (n+1)·Σx) / (n·Σx) over counts
    ranked ascending — computed WITHOUT ranking users: ties make the
    rank-sum value-irrelevant within a tied group, so the per-group
    contribution collapses to the closed form x·(a·m + m(m+1)/2) with
    a = users in strictly smaller groups, m = the group's multiplicity,
    and the whole Σ(i·x) comes off the per-type COUNT HISTOGRAM. All
    sums BIGINT with the family's division-form int64-budget
    raise_error folded into the consumed n_users (re-bin/re-scale
    above ~2^62 rank·count mass, never a silent wraparound); the one
    double division crosses the oracle through rnd.

    Scale: events reduce map-side to one row per (type, user), then to
    the (type, cnt) histogram; the only window runs over the histogram
    — O(distinct count values) rows per type, NEVER a rank over the
    user set (the same histogram trick as events_power_pareto) — and
    the final aggregate is O(types)."""
    return key_skew_profile(
        read_events(spark, sf_dir).select("event_type", "user_id"))


def key_skew_profile(ev: DataFrame) -> DataFrame:
    """The skew diagnostic on any (event_type, user_id) frame — split
    out of key_skew_fn so the DEPLOYMENT.md skew playbook's step 1
    (diagnose with this) and step 2 (remedy with
    functions/scale.salted_join) can be exercised end-to-end on the
    same deliberately skewed input
    (tests/test_scale_utils.py::test_skew_playbook_end_to_end)."""
    from pyspark.sql import Window

    per_user = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    hist = per_user.groupBy("event_type", "cnt").agg(
        F.count(F.lit(1)).alias("m")
    )
    w = Window.partitionBy("event_type").orderBy("cnt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    cum = hist.select(
        "event_type", "cnt", "m",
        (F.sum("m").over(w) - F.col("m")).alias("a"),  # users strictly below
    )
    # Σ over the tied group of i·x = x·(a·m + m(m+1)/2), ranks a+1..a+m
    grp_six = F.col("cnt") * (
        F.col("a") * F.col("m") + F.expr("m * (m + 1) DIV 2")
    )
    s = cum.groupBy("event_type").agg(
        F.sum("m").alias("n"),
        F.sum(F.col("m") * F.col("cnt")).alias("sx"),
        F.max("cnt").alias("mx"),
        F.sum(grp_six).alias("six"),
    )
    lim = 2 ** 62 - 1
    guarded_n = F.when(
        (F.col("six") <= F.lit(lim // 2))
        & (F.col("sx") <= F.expr(f"{lim} DIV (n + 1)")),
        F.col("n"),
    ).otherwise(F.raise_error(F.lit(
        "events_key_skew: Gini rank-sums exceed the int64 budget — re-bin the keys"
    )))
    gini = F.when(
        F.col("n") > 1,
        rnd((2 * F.col("six") - (F.col("n") + 1) * F.col("sx")).cast("double")
            / (F.col("n").cast("double") * F.col("sx").cast("double")), 6),
    ).otherwise(F.lit(0.0))
    return s.select(
        "event_type",
        guarded_n.alias("n_users"),
        F.col("sx").alias("n_events"),
        F.col("mx").alias("max_user_events"),
        rnd(F.col("mx").cast("double") / F.col("sx").cast("double"), 6
            ).alias("top_user_share"),
        gini.alias("gini"),
    ).orderBy("event_type")


KEY_SKEW_SQL = f"""
WITH per_user AS (
    SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS cnt
    FROM events GROUP BY 1, 2
),
hist AS (
    SELECT event_type, cnt, CAST(count(*) AS BIGINT) AS m
    FROM per_user GROUP BY 1, 2
),
cum AS (
    SELECT event_type, cnt, m,
           CAST(sum(m) OVER (PARTITION BY event_type ORDER BY cnt
                             ROWS UNBOUNDED PRECEDING) - m AS BIGINT) AS a
    FROM hist
),
s AS (
    SELECT event_type, CAST(sum(m) AS BIGINT) AS n,
           CAST(sum(m * cnt) AS BIGINT) AS sx,
           CAST(max(cnt) AS BIGINT) AS mx,
           CAST(sum(cnt * (a * m + (m * (m + 1)) // 2)) AS BIGINT) AS six
    FROM cum GROUP BY 1
)
SELECT event_type, n AS n_users, sx AS n_events, mx AS max_user_events,
       {sql_rnd('CAST(mx AS DOUBLE) / CAST(sx AS DOUBLE)')} AS top_user_share,
       CASE WHEN n > 1
            THEN {sql_rnd('CAST(2 * six - (n + 1) * sx AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))')}
            ELSE 0.0 END AS gini
FROM s
ORDER BY event_type
"""


LIX_LONG_WORD = 7


def readability_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document LIX readability (Björnsson's läsbarhetsindex):
    words/sentences + 100·longwords/words, long = >= 7 chars — the
    classic integer-only readability screen (no syllable model needed,
    so no transcendental and no lexicon), used as a C4-style quality
    gate: LIX < ~25 is fragmentary, > ~60 is bureaucratic sludge.

    Sentences count terminator RUNS ('[.!?]+' — '!!!' is one boundary);
    guards divide by max(·,1) so headline-only docs stay finite. Two
    IEEE divisions and one add, composed identically in both engines —
    bit-exact through rnd. Map-side only: no shuffle at all."""
    t = tokens(F.col("text"))
    n_words = F.size(t).cast("long")
    n_long = F.size(F.filter(t, lambda x: F.length(x) >= LIX_LONG_WORD)).cast("long")
    n_sent = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), F.lit(0))).cast("long")
    lix = rnd(
        n_words.cast("double") / F.greatest(n_sent, F.lit(1)).cast("double")
        + (F.lit(100) * n_long).cast("double")
        / F.greatest(n_words, F.lit(1)).cast("double"),
        6,
    )
    return _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_long.alias("n_long_words"),
        lix.alias("lix"),
    )


READABILITY_SQL = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(t) AS BIGINT) AS n_words,
       CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS n_sentences,
       CAST(len(list_filter(t, x -> length(x) >= {LIX_LONG_WORD})) AS BIGINT) AS n_long_words,
       {sql_rnd(
           "CAST(len(t) AS DOUBLE) / CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS DOUBLE)"
           f" + CAST(100 * len(list_filter(t, x -> length(x) >= {LIX_LONG_WORD})) AS DOUBLE)"
           " / CAST(greatest(len(t), 1) AS DOUBLE)"
       )} AS lix
FROM (SELECT doc_id, text, {SQL_TOKENS} AS t FROM documents)
"""


def power_users_pareto_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto coverage curve of user activity: for each decile d, how
    many events the top d% most-active users account for — the
    "does 10% of the corpus produce 80% of the traffic" readout behind
    sampling budgets, per-user rate limits, and salting decisions.

    Scale-safe construction (NO global rank over users): per-user
    counts collapse to a COUNT HISTOGRAM (cnt -> how many users, how
    many events), and the only unpartitioned window runs over the
    O(distinct count values) histogram — thousands of rows at any
    corpus size, never the user set. A decile cutoff k inside a tied
    group is exact and tie-invariant: covered = events of strictly
    heavier groups + (k - users_before) · cnt, since tied users are
    interchangeable. The 10-row decile grid joins the histogram on a
    broadcast range predicate."""
    from pyspark.sql import Window

    ev = read_events(spark, sf_dir).select("user_id")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    hist = per_user.groupBy("cnt").agg(F.count(F.lit(1)).alias("n_u"))
    w = Window.orderBy(F.col("cnt").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    cum = hist.select(
        "cnt", "n_u",
        F.sum("n_u").over(w).alias("cum_u"),
        F.sum(F.col("n_u") * F.col("cnt")).over(w).alias("cum_ev"),
    )
    totals = per_user.agg(
        F.count(F.lit(1)).alias("n_users"), F.sum("cnt").alias("total_events")
    )
    grid = totals.select(
        F.explode(F.sequence(F.lit(1), F.lit(10))).alias("decile"),
        "n_users", "total_events",
    ).withColumn("k", F.expr("(n_users * decile) DIV 10"))
    joined = cum.join(
        F.broadcast(grid),
        (F.col("cum_u") >= F.col("k")) & (F.col("cum_u") - F.col("n_u") < F.col("k")),
    )
    covered = (F.col("cum_ev") - (F.col("cum_u") - F.col("k")) * F.col("cnt"))
    return joined.select(
        F.col("decile").cast("long").alias("decile"),
        F.col("k").alias("n_top_users"),
        covered.alias("events_covered"),
        rnd(covered.cast("double") / F.col("total_events").cast("double"), 6
            ).alias("share"),
    ).where(F.col("k") >= 1).orderBy("decile")


POWER_PARETO_SQL = f"""
WITH per_user AS (
    SELECT user_id, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1
),
hist AS (SELECT cnt, CAST(count(*) AS BIGINT) AS n_u FROM per_user GROUP BY 1),
cum AS (
    SELECT cnt, n_u,
           CAST(sum(n_u) OVER (ORDER BY cnt DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_u,
           CAST(sum(n_u * cnt) OVER (ORDER BY cnt DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_ev
    FROM hist
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(cnt) AS BIGINT) AS total_events FROM per_user),
grid AS (
    SELECT CAST(d AS BIGINT) AS decile, n_users, total_events,
           (n_users * d) // 10 AS k
    FROM tot, unnest(range(1, 11)) AS t(d)
)
SELECT decile, k AS n_top_users,
       CAST(cum_ev - (cum_u - k) * cnt AS BIGINT) AS events_covered,
       {sql_rnd('CAST(cum_ev - (cum_u - k) * cnt AS DOUBLE) / CAST(total_events AS DOUBLE)')} AS share
FROM cum JOIN grid ON cum_u >= k AND cum_u - n_u < k
WHERE k >= 1
ORDER BY decile
"""


def queries() -> dict[str, tuple]:
    return {
        "text_token_stats": (lambda s, d: token_stats(_docs(s, d)), TOKEN_STATS_SQL),
        "text_quality_score": (lambda s, d: quality_score(_docs(s, d)), QUALITY_SQL),
        "text_lang_id": (lambda s, d: lang_id(_docs(s, d)), LANG_ID_SQL),
        "docs_source_top_tokens": (
            lambda s, d: source_top_tokens(_docs(s, d), SOURCE_TOP_TOKENS_K),
            SOURCE_TOP_TOKENS_SQL,
        ),
        "docs_token_commonness": (
            lambda s, d: token_commonness(_docs(s, d)),
            TOKEN_COMMONNESS_SQL,
        ),
        "docs_langid_confusion": (
            lambda s, d: langid_confusion(_docs(s, d)),
            LANGID_CONFUSION_SQL,
        ),
        "text_fingerprint": (lambda s, d: fingerprint(_docs(s, d)), FINGERPRINT_SQL),
        "text_simhash": (lambda s, d: simhash(_docs(s, d)), SIMHASH_SQL),
        "text_vocab_topk": (lambda s, d: vocab_topk(_docs(s, d), VOCAB_TOPK_K), VOCAB_TOPK_SQL),
        "docs_stratified_sample": (
            lambda s, d: stratified_sample(_docs(s, d), SAMPLE_RATES, SAMPLE_DEFAULT_PM),
            STRATIFIED_SAMPLE_SQL,
        ),
        "dedup_simhash_pairs": (
            lambda s, d: simhash_near_dup_pairs(_docs(s, d)),
            SIMHASH_PAIRS_SQL,
        ),
        "events_attribution_rangejoin": (attribution_fn, ATTRIBUTION_SQL),
        "events_time_rollup": (time_rollup_fn, TIME_ROLLUP_SQL),
        "text_tfidf_topk": (
            lambda s, d: tfidf_topk(_docs(s, d), TFIDF_K, TFIDF_SCALE),
            TFIDF_TOPK_SQL,
        ),
        "dedup_exact": (lambda s, d: exact_duplicates(_docs(s, d)), EXACT_DUP_SQL),
        "dedup_minhash_signatures": (
            lambda s, d: minhash_signatures(_docs(s, d)).select(
                "doc_id", F.col("j").cast("long").alias("j"), F.col("sig").cast("long").alias("sig")
            ),
            MINHASH_SQL,
        ),
        "dedup_lsh_candidates": (lambda s, d: lsh_candidate_pairs(_docs(s, d), max_band_bucket=None), LSH_PAIRS_SQL),
        "dedup_pair_measures": (
            dedup_pair_measures_fn, _dedup_pair_measures_sql()),
        "dedup_clusters": (lambda s, d: duplicate_clusters(_docs(s, d), JACCARD_THRESHOLD, max_band_bucket=None), CLUSTERS_SQL),
        "dedup_corpus_filtered": (
            lambda s, d: deduplicated_corpus(_docs(s, d), JACCARD_THRESHOLD, max_band_bucket=None),
            DEDUP_CORPUS_SQL,
        ),
        "docs_curated_corpus": (curated_corpus_fn, CURATED_CORPUS_SQL),
        "dedup_decontaminate": (
            # held-out split of ONE corpus: the _split variant computes
            # the wide MinHash pass once and splits the band table by
            # the mask — row-identical to two independent passes (the
            # doc_id filter commutes with the per-doc signature
            # aggregation), one corpus scan/shuffle instead of two
            lambda s, d: cross_corpus_contamination_split(
                _docs(s, d),
                F.col("doc_id") % DECON_EVAL_MOD == 0,
                JACCARD_THRESHOLD,
                max_band_bucket=None,
            ),
            DECONTAMINATE_SQL,
        ),
        "sim_top_component": (
            lambda s, d: power_iteration_top_component(_emb(s, d)),
            _power_iteration_sql(),
        ),
        "sim_label_centroid_cosine": (
            lambda s, d: label_centroid_cosine(_emb(s, d)),
            _label_centroid_cosine_sql(),
        ),
        "sim_embedding_outliers": (
            lambda s, d: embedding_outliers(_emb(s, d), OUTLIER_TOP_N),
            _embedding_outliers_sql(),
        ),
        "docs_length_filter": (length_percentile_filter_fn, _length_filter_sql()),
        "docs_length_filter_approx": (length_percentile_filter_approx_fn, None),
        "text_repetition_score": (
            lambda s, d: repetition_score(_docs(s, d)),
            REPETITION_SQL,
        ),
        "docs_shard_assignments": (
            lambda s, d: shard_assignments(_docs(s, d), N_SHARDS),
            SHARDS_SQL,
        ),
        "docs_token_budget_sample": (
            lambda s, d: token_budget_sample(_docs(s, d), TOKEN_BUDGET,
                                             TOKEN_BUDGET_BUCKETS),
            TOKEN_BUDGET_SQL,
        ),
        "text_bpe_token_stats": (
            lambda s, d: bpe_token_stats(_docs(s, d)),
            _bpe_stats_sql(),
        ),
        "docs_source_report": (
            lambda s, d: source_quality_report(_docs(s, d)),
            SOURCE_REPORT_SQL,
        ),
        "docs_vocab_drift": (vocab_drift_fn, VOCAB_DRIFT_SQL),
        "docs_oov_rate": (
            lambda s, d: oov_rate(_docs(s, d), OOV_VOCAB_K),
            OOV_RATE_SQL,
        ),
        "text_boilerplate_ngrams": (
            lambda s, d: boilerplate_ngrams(_docs(s, d), NGRAM_N,
                                            BOILERPLATE_K, BOILERPLATE_MIN_DOCS),
            BOILERPLATE_SQL,
        ),
        "docs_split_variants": (split_variants_fn, _split_variants_sql()),
        "docs_snapshot_diff": (snapshot_diff_fn, SNAPSHOT_DIFF_SQL),
        "events_type_transitions": (type_transitions_fn, TYPE_TRANSITIONS_SQL),
        "events_hourly_ohlc": (hourly_ohlc_fn, HOURLY_OHLC_SQL),
        "dedup_threshold_sweep": (dedup_sweep_fn, DEDUP_SWEEP_SQL),
        "events_value_ks_drift": (value_ks_drift_fn, VALUE_KS_SQL),
        "events_value_cusum": (value_cusum_fn, VALUE_CUSUM_SQL),
        "events_user_rfm": (user_rfm_fn, USER_RFM_SQL),
        "events_seasonal_anomaly_panel": (
            seasonal_anomaly_panel_fn, _seasonal_anomaly_panel_sql()),
        "docs_importance_weights": (
            lambda s, d: importance_weights(_docs(s, d), DSIR_TARGET_SOURCE, DSIR_SCALE),
            IMPORTANCE_SQL,
        ),
        "dedup_substring_pairs": (
            lambda s, d: substring_dup_pairs(_docs(s, d), max_fp_bucket=None),
            SUBSTRING_DUP_SQL,
        ),
        "sim_semantic_dedup": (
            lambda s, d: semantic_dedup(_emb(s, d), SEMDEDUP_THRESHOLD,
                                        max_cell_size=None),
            _semdedup_sql(SEMDEDUP_THRESHOLD),
        ),
        "docs_curation_funnel": (curation_funnel_fn, CURATION_FUNNEL_SQL),
        "docs_ngram_novelty": (
            lambda s, d: ngram_novelty(_docs(s, d)),
            NGRAM_NOVELTY_SQL,
        ),
        "dedup_cross_source_matrix": (
            lambda s, d: cross_source_dup_matrix(
                _docs(s, d), JACCARD_THRESHOLD, max_band_bucket=None
            ),
            CROSS_SOURCE_SQL,
        ),
        "docs_source_cap": (
            lambda s, d: source_cap(_docs(s, d), SOURCE_CAP_N),
            _source_cap_sql(SOURCE_CAP_N),
        ),
        "docs_mixture_sample": (
            # explicit generous cap: the guard stays exercised but can
            # never clamp this mix, so the SQL twin needs no epoch cap
            lambda s, d: mixture_sample(_docs(s, d), MIX_TARGETS, MIX_BUDGET,
                                        max_epochs=10_000),
            MIXTURE_SAMPLE_SQL,
        ),
        "docs_chunk_windows": (
            lambda s, d: chunk_windows(_docs(s, d), CHUNK_WINDOW, CHUNK_STRIDE),
            CHUNK_WINDOWS_SQL,
        ),
        "docs_pack_sequences": (
            lambda s, d: pack_sequences(_docs(s, d), PACK_SEQ_LEN, PACK_BUCKETS),
            PACK_SEQUENCES_SQL,
        ),
        "dedup_ngram_overlap": (ngram_overlap_fn, NGRAM_OVERLAP_SQL),
        "docs_training_examples": (training_examples_fn, TRAINING_EXAMPLES_SQL),
        "text_pii_redaction": (pii_redaction_fn, _pii_redaction_sql()),
        "events_funnel": (funnel_fn, FUNNEL_SQL),
        "events_user_journeys": (user_journeys_fn, USER_JOURNEYS_SQL),
        "events_retention_cohorts": (retention_fn, RETENTION_SQL),
        "events_value_anomaly_variants": (
            value_anomaly_variants_fn, _value_anomaly_variants_sql()),
        "events_value_percentiles_by_type": (
            events_value_percentiles_fn, _events_value_percentiles_sql()),
        "dedup_embedding_clusters": (
            lambda s, d: connected_components(
                embedding_near_duplicates(_emb(s, d), EMBED_NEAR_DUP_THRESHOLD, max_bucket_size=None),
                "vec_a", "vec_b", id_col="vec_id",
            ),
            EMBED_CLUSTERS_SQL,
        ),
        "sim_cosine_topk": (lambda s, d: cosine_topk(_emb(s, d), TOPK_K, QUERY_MOD), COSINE_TOPK_SQL),
        "sim_ann_bucket_histogram": (lambda s, d: ann_bucket_histogram(_emb(s, d)), ANN_HIST_SQL),
        # r10 consolidation (rotation-budget policy): the five
        # per-variant ANN top-k entries fold into ONE labeled union —
        # identical rows/values per variant, one registry slot
        "sim_ann_topk_variants": (ann_topk_variants_fn, _ann_topk_variants_sql()),
        # r11 consolidation: the three per-variant recall entries fold
        # into ONE labeled union (same algebra, one slot)
        "sim_ann_recall_variants": (
            ann_recall_variants_fn, _ann_recall_variants_sql()),
        "dedup_cluster_cohesion": (cluster_cohesion_fn, CLUSTER_COHESION_SQL),
        "events_funnel_latency": (funnel_latency_fn, FUNNEL_LATENCY_SQL),
        "docs_dedup_savings": (dedup_savings_fn, DEDUP_SAVINGS_SQL),
        "events_hourly_mix_hhi": (hourly_mix_hhi_fn, HOURLY_MIX_HHI_SQL),
        "sim_ivf_recall_sweep": (ivf_recall_sweep_fn, IVF_RECALL_SWEEP_SQL),
        "media_phash_hamming_hist": (phash_hamming_histogram_fn, PHASH_HAMMING_HIST_SQL),
        "dedup_embedding_cosine": (
            lambda s, d: embedding_near_duplicates(_emb(s, d), EMBED_NEAR_DUP_THRESHOLD, max_bucket_size=None),
            EMBED_NEAR_DUP_SQL,
        ),
        "ema_state": (ema_state_fn, None),  # rows-only: true recurrence
        "asof_join_events": (asof_fn, ASOF_SQL),
        "events_windowed_hourly": (windowed_events_fn, WINDOWED_EVENTS_SQL),
        "events_hourly_gapfill": (hourly_gapfill_fn, HOURLY_GAPFILL_SQL),
        "events_rolling_corr": (rolling_corr_fn, ROLLING_CORR_SQL),
        "events_value_histogram": (value_histogram_fn, VALUE_HISTOGRAM_SQL),
        "events_user_interarrival": (interarrival_fn, INTERARRIVAL_SQL),
        "events_distinct_users_daily": (distinct_users_daily_fn, DISTINCT_USERS_SQL),
        "events_distinct_users_daily_approx": (distinct_users_daily_approx_fn, None),
        "events_sessionization": (sessionize_fn, SESSIONIZE_SQL),
        "media_features": (media_features_fn, MEDIA_FEATURES_SQL),
        "media_frame_sample": (media_frames_fn, MEDIA_FRAMES_SQL),
        "media_dedup_exact": (media_dedup_exact_fn, MEDIA_DEDUP_EXACT_SQL),
        "media_dedup_pair_variants": (
            media_dedup_pair_variants_fn, _media_dedup_pair_variants_sql()),
        "media_phash": (media_phash_fn, MEDIA_PHASH_SQL),
        "dedup_graph_triangles": (dedup_graph_triangles_fn, TRIANGLES_SQL),
        "events_key_skew": (key_skew_fn, KEY_SKEW_SQL),
        "docs_readability_lix": (readability_fn, READABILITY_SQL),
        "events_power_pareto": (power_users_pareto_fn, POWER_PARETO_SQL),
        "docs_bm25_topk": (bm25_topk_fn, BM25_SQL),
        "events_distinct_kmv": (kmv_daily_fn, KMV_SQL),
        "events_hourly_acf": (hourly_acf_fn, ACF_SQL),
        "sim_hard_negatives": (hard_negatives_fn, HARD_NEGATIVES_SQL),
        "events_session_concurrency": (session_concurrency_fn, SESSION_CONCURRENCY_SQL),
        "docs_quality_vs_dup": (quality_vs_dup_fn, QUALITY_VS_DUP_SQL),
        "docs_length_ks": (length_ks_fn, LENGTH_KS_SQL),
        "events_value_resample": (value_resample_fn, VALUE_RESAMPLE_SQL),
        "events_hourly_ccf": (hourly_ccf_fn, HOURLY_CCF_SQL),
        "events_hourly_topk": (hourly_topk_fn, HOURLY_TOPK_SQL),
        "docs_zipf_profile": (zipf_profile_fn, ZIPF_PROFILE_SQL),
        "docs_bigram_likelihood": (
            lambda s, d: char_bigram_likelihood(_docs(s, d)),
            BIGRAM_LM_SQL,
        ),
        "sim_diversity_sample": (
            lambda s, d: diversity_sample(_emb(s, d), DIVERSITY_M),
            _diversity_sample_sql(DIVERSITY_M),
        ),
        "dedup_minhash_calibration": (
            lambda s, d: minhash_jaccard_calibration(_docs(s, d), max_band_bucket=None),
            DEDUP_CALIBRATION_SQL,
        ),
        "events_weekly_users_hll": (weekly_users_hll_fn, None),  # rows-only: sketch
        "sim_topk_prefix16": (
            lambda s, d: cosine_topk_truncated(_emb(s, d), MRL_DIM, TOPK_K, QUERY_MOD),
            MRL_TOPK_SQL,
        ),
        "text_collocations": (
            lambda s, d: collocations(_docs(s, d)),
            COLLOC_SQL,
        ),
        "events_attribution_linear": (attribution_linear_fn, ATTRIBUTION_LINEAR_SQL),
        "docs_split_leakage": (split_leakage_fn, SPLIT_LEAKAGE_SQL),
        # r10 consolidation: prefix16-recall + kNN-label + MRR +
        # cosine-histogram fold into one long-format eval panel (the
        # calibration family's 5 entries -> this + dedup_minhash_calibration)
        "sim_embedding_eval_panel": (
            embedding_eval_panel_fn, _embedding_eval_panel_sql()),
        "docs_bpe_merges": (
            lambda s, d: bpe_learn_merges(_docs(s, d)),
            _bpe_merges_sql(),
        ),
        "docs_bpe_compression": (
            lambda s, d: bpe_compression_report(_docs(s, d)),
            _bpe_compression_sql(),
        ),
        "docs_phrase_search": (phrase_search_fn, _phrase_search_sql(SEARCH_PHRASE)),
        "events_value_trend": (value_trend_fn, VALUE_TREND_SQL),
        "events_health_summary": (health_summary_fn, HEALTH_SUMMARY_SQL),
        "events_stickiness": (stickiness_fn, STICKINESS_SQL),
        "dedup_degree_histogram": (dup_degree_fn, DUP_DEGREE_SQL),
        "docs_fluency_filter": (fluency_filter_fn, _fluency_filter_sql()),
        # round-10 additions
        "docs_ngram_repetition": (ngram_repetition_fn, NGRAM_REPETITION_SQL),
        "docs_dup_span_coverage": (dup_span_coverage_fn, DUP_SPAN_COVERAGE_SQL),
        "events_seasonal_profile": (seasonal_profile_fn, SEASONAL_PROFILE_SQL),
        "events_type_affinity": (type_affinity_fn, TYPE_AFFINITY_SQL),
        "media_phash_clusters": (media_phash_clusters_fn, MEDIA_PHASH_CLUSTERS_SQL),
        "events_heavy_hitters": (heavy_hitters_fn, HEAVY_HITTERS_SQL),
        "events_type_hod_rollup": (type_hod_rollup_fn, TYPE_HOD_ROLLUP_SQL),
        "dedup_graph_pagerank": (pagerank_fn, _pagerank_sql()),
        "dedup_graph_communities": (lpa_fn, _lpa_sql()),
        "docs_lm_surprisal": (lm_surprisal_fn, LM_SURPRISAL_SQL),
        "events_count_min": (count_min_fn, _count_min_sql()),
        "text_zipf_doubling": (zipf_doubling_fn, ZIPF_DOUBLING_SQL),
    }


# ================= grouped exact percentiles (scale path) ================

EVT_PCTS = [0.25, 0.5, 0.9]


def events_value_percentiles_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-event-type value percentiles via group-partitioned
    ranking windows (plans/common.py::grouped_exact_percentiles) — the
    at-scale exact-quantile formulation: no global sort, groups
    distribute across the cluster."""
    from tickdatapipeline_spark.plans.common import grouped_exact_percentiles

    ev = read_events(spark, sf_dir).select("event_type", "value")
    return grouped_exact_percentiles(ev, "event_type", "value", EVT_PCTS)


ANOM_TOP_N = 100
ANOM_Q = 100  # Q2 (cents) quantization for the anomaly moments


def value_anomalies_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score anomaly sweep: the top-N events by |z| where
    z = (value - group mean) / group std — the 'flag metric outliers'
    monitoring query over event data.

    Cross-engine exactness: values quantize to Q2 integers
    (floor(v*100 + 0.5)); the group moments are EXACT integer sums
    (count, sum, sum of squares — order-independent), and the double
    mean/std/z derivation from those identical integers is IEEE
    arithmetic both engines round identically. int64 sum-of-squares
    bounds ~10^9 rows per group at this value range; beyond that lower
    the quantization or shard the group.

    Scale: one map-side-combinable groupBy (|event_type| rows)
    broadcast back over the stream; top-N plans TakeOrdered — never a
    global sort."""
    ev = read_events(spark, sf_dir).select("event_id", "event_type", "value")
    q = ev.select(
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
        F.floor(F.col("value") * ANOM_Q + F.lit(0.5)).cast("long").alias("vq"),
    )
    stats = q.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vq").alias("s"),
        F.sum(F.col("vq") * F.col("vq")).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    var = F.col("ss").cast("double") / F.col("n").cast("double") - mean * mean
    # nullif: a constant-valued type has sigma 0 and no defined z —
    # NULL (sorts last) instead of an ANSI crash on degenerate input
    z = (F.col("vq").cast("double") - mean) / F.nullif(F.sqrt(var), F.lit(0.0))
    return (
        q.join(F.broadcast(stats), on="event_type")
        .select("event_id", "event_type", rnd(z, 6).alias("z"))
        .orderBy(F.abs(F.col("z")).desc(), "event_id")
        .limit(ANOM_TOP_N)
    )


VALUE_ANOMALIES_SQL = f"""
WITH q AS (
    SELECT CAST(event_id AS BIGINT) AS event_id, event_type,
           CAST(floor(value * {ANOM_Q} + 0.5) AS BIGINT) AS vq
    FROM events
),
stats AS (
    SELECT event_type, count(*) AS n, sum(vq) AS s, sum(vq * vq) AS ss
    FROM q GROUP BY event_type
)
SELECT event_id, event_type, z FROM (
    SELECT event_id, q.event_type,
           (floor(((CAST(vq AS DOUBLE) - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) / nullif(sqrt((CAST(ss AS DOUBLE) / CAST(n AS DOUBLE) - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))), 0)) * 1000000.0 + 0.5) / 1000000.0) AS z
    FROM q JOIN stats ON q.event_type = stats.event_type
)
ORDER BY abs(z) DESC, event_id
LIMIT {ANOM_TOP_N}
"""


def _events_value_percentiles_sql() -> str:
    from tickdatapipeline_spark.plans.common import sql_grouped_exact_percentiles

    return sql_grouped_exact_percentiles(
        "SELECT event_type, value FROM events", "event_type", "value", EVT_PCTS
    )


# ================= hourly heavy hitters =================

TOPK_USERS_PER_HOUR = 3


def hourly_topk_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly heavy hitters: the TOPK_USERS_PER_HOUR users with the
    largest summed event value inside every hour window — the
    per-window top-k every ops dashboard draws, and the batch twin of
    ``streaming.run_hourly_topk_stream``.

    Exactness: value sums are BIGINT cents; rank ties break on
    user_id; the reported value is one division at the end.

    Scale: raw events reduce map-side to (hour, user) partial sums
    before anything else; the rank window partitions by hour and the
    rnk <= K filter plans as WindowGroupLimit (Partial before the
    exchange + Final after), so no hour's full user list is ever
    buffered or shuffled whole — the user dimension can be arbitrarily
    hot without a skewed window sort.
    """
    from pyspark.sql import Window

    ev = read_events(spark, sf_dir)
    vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    hu = (
        ev.select(
            F.expr("(ts DIV 1000000000 DIV 3600) * 3600").alias("hour_s"),
            "user_id", vc.alias("vc"),
        )
        .groupBy("hour_s", "user_id")
        .agg(F.sum("vc").alias("u_sum"), F.count(F.lit(1)).alias("n_events"))
    )
    w = Window.partitionBy("hour_s").orderBy(F.desc("u_sum"), "user_id")
    return (
        hu.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= TOPK_USERS_PER_HOUR)
        .select(
            "hour_s", "rnk", F.col("user_id").cast("long").alias("user_id"),
            (F.col("u_sum") / 100.0).alias("hour_value"), "n_events",
        )
        .orderBy("hour_s", "rnk")
    )


HOURLY_TOPK_SQL = f"""
WITH hu AS (
    SELECT (epoch_us(ts) // 1000000 // 3600) * 3600 AS hour_s,
           CAST(user_id AS BIGINT) AS user_id,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS u_sum,
           count(*) AS n_events
    FROM events GROUP BY 1, 2
)
SELECT hour_s, CAST(rnk AS BIGINT) AS rnk, user_id,
       u_sum / 100.0 AS hour_value, CAST(n_events AS BIGINT) AS n_events
FROM (SELECT *, row_number() OVER (PARTITION BY hour_s ORDER BY u_sum DESC, user_id) AS rnk
      FROM hu)
WHERE rnk <= {TOPK_USERS_PER_HOUR}
ORDER BY hour_s, rnk
"""


# ================= Zipf rank-frequency profile =================

ZIPF_MAX_RANK = 256  # report ranks 1,2,4,...,256; rank 512 feeds the last ratio


def zipf_profile_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-frequency (Zipf) decay profile per source: the token at
    each power-of-two rank with its count and the doubling ratio
    count(r) / count(2r).  A Zipf corpus with exponent s decays by
    ~2^s at every doubling, so the 9-point profile IS the power-law
    fit sampled on a geometric grid — without the log-log regression,
    whose ln() is not bit-reproducible across engines (Spark's JVM
    Math.log and DuckDB's libm disagree in the last ulp on ~1% of
    integer arguments; measured, which is why no gated query here
    uses transcendentals).

    Exactness: counts are BIGINT; each doubling ratio is ONE IEEE
    division of two exact integers (correctly rounded, hence
    bit-identical cross-engine) under the shared rnd policy; rank
    ties break on the token string (ASCII-only tokens, so byte order
    == collation order in both engines).

    Scale: one map-side-combinable (source, token) count; the rank
    window partitions by source and the rnk <= 512 filter plans as
    WindowGroupLimit (Partial+Final), so no source's full vocabulary
    crosses the shuffle; everything downstream runs on <= 10 rows per
    source.
    """
    from pyspark.sql import Window

    from tickdatapipeline_spark.operators.text import tokens

    docs = _docs(spark, sf_dir)
    counts = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("cnt"), "tok")
    pow2 = (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 2 * ZIPF_MAX_RANK)
        .where(F.expr("(rnk & (rnk - 1)) = 0"))
    )
    w2 = Window.partitionBy("source").orderBy("rnk")
    return (
        pow2.withColumn("next_cnt", F.lead("cnt").over(w2))
        .where((F.col("rnk") <= ZIPF_MAX_RANK) & F.col("next_cnt").isNotNull())
        .select(
            "source", "rnk", F.col("tok").alias("token"), "cnt",
            rnd(F.col("cnt").cast("double") / F.col("next_cnt").cast("double")
                ).alias("doubling_ratio"),
        )
        .orderBy("source", "rnk")
    )


ZIPF_PROFILE_SQL = f"""
WITH toks AS (
    SELECT source, unnest({SQL_TOKENS}) AS tok FROM documents
),
counts AS (SELECT source, tok, count(*) AS cnt FROM toks GROUP BY 1, 2),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY source ORDER BY cnt DESC, tok) AS rnk
    FROM counts
),
pow2 AS (SELECT * FROM ranked WHERE rnk <= {2 * ZIPF_MAX_RANK} AND (rnk & (rnk - 1)) = 0),
led AS (SELECT *, lead(cnt) OVER (PARTITION BY source ORDER BY rnk) AS next_cnt FROM pow2)
SELECT source, CAST(rnk AS BIGINT) AS rnk, tok AS token, CAST(cnt AS BIGINT) AS cnt,
       {sql_rnd("CAST(cnt AS DOUBLE) / CAST(next_cnt AS DOUBLE)")} AS doubling_ratio
FROM led
WHERE rnk <= {ZIPF_MAX_RANK} AND next_cnt IS NOT NULL
ORDER BY source, rnk
"""


# ================= char-bigram LM fluency =================

BIGRAM_LM_SQL = f"""
WITH norm AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id, {SQL_NORM_TEXT} AS s FROM documents
),
pos AS (
    SELECT doc_id, unnest(range(1, greatest(length(s) - 1, 0) + 1)) AS p, s
    FROM norm
),
docbg AS (
    SELECT doc_id, substring(s, CAST(p AS INT), 2) AS bg, count(*) AS occ
    FROM pos GROUP BY 1, 2
),
model AS (SELECT bg, CAST(sum(occ) AS BIGINT) AS cnt_bg FROM docbg GROUP BY 1),
pre AS (
    SELECT substring(bg, 1, 1) AS c1, CAST(sum(cnt_bg) AS BIGINT) AS cnt_pre
    FROM model GROUP BY 1
),
terms AS (
    SELECT d.doc_id, d.bg, d.occ,
           CAST(d.occ AS DOUBLE) * (CAST(m.cnt_bg AS DOUBLE) / CAST(p.cnt_pre AS DOUBLE)) AS term
    FROM docbg d
    JOIN model m ON d.bg = m.bg
    JOIN pre p ON substring(d.bg, 1, 1) = p.c1
)
SELECT doc_id, CAST(sum(occ) AS BIGINT) AS n_bigrams,
       {sql_rnd("list_reduce(list(term ORDER BY bg), (x, y) -> x + y) / CAST(sum(occ) AS DOUBLE)", 6)} AS avg_bigram_p
FROM terms GROUP BY doc_id ORDER BY doc_id
"""


# ================= diversity (coverage-first) sampling =================


def _diversity_sample_sql(m: int, n_cells: int = 8) -> str:
    """DuckDB twin of similarity.diversity_sample: the IVF assignment
    CTEs (identical to _semdedup_sql's), then the per-cell
    farthest-first rank."""
    asim = sql_cos("b.v", "c")
    return f"""
WITH base AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, {SQL_VEC} AS v FROM embeddings),
cents AS (SELECT vec_id AS cell, v AS c FROM base WHERE vec_id < {n_cells}),
cscored AS (SELECT b.vec_id, cell, {asim} AS sim FROM base b CROSS JOIN cents),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS crank
    FROM cscored
),
assigned AS (SELECT vec_id, cell, sim AS centroid_sim FROM ranked WHERE crank = 1)
SELECT cell, CAST(rnk AS BIGINT) AS sel_rank, vec_id, centroid_sim
FROM (SELECT *, row_number() OVER (PARTITION BY cell
                                   ORDER BY centroid_sim ASC, vec_id) AS rnk
      FROM assigned)
WHERE rnk <= {m}
ORDER BY cell, rnk
"""


# ================= minhash sketch calibration =================

DEDUP_CALIBRATION_SQL = f"""
WITH {MINHASH_CTE},
{_LSH_CAND_CTE},
{_HSH_CTE},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS inter_count
    FROM cand c
    JOIN hsh a ON a.doc_id = c.doc_a
    JOIN hsh b ON b.doc_id = c.doc_b AND b.g = a.g
    GROUP BY c.doc_a, c.doc_b
),
exact AS (
    SELECT i.doc_a, i.doc_b,
           {sql_rnd('CAST(inter_count AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter_count AS DOUBLE)', 6)} AS jaccard
    FROM inter i
    JOIN sizes sa ON i.doc_a = sa.doc_id
    JOIN sizes sb ON i.doc_b = sb.doc_id
),
matches AS (
    SELECT c.doc_a, c.doc_b,
           CAST(sum(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END) AS BIGINT) AS n_match
    FROM cand c
    JOIN sig sa ON sa.doc_id = c.doc_a
    JOIN sig sb ON sb.doc_id = c.doc_b AND sb.j = sa.j
    GROUP BY 1, 2
)
SELECT m.doc_a, m.doc_b, m.n_match,
       CAST(m.n_match AS DOUBLE) / CAST({NUM_PERM} AS DOUBLE) AS est_jaccard,
       e.jaccard,
       abs(CAST(m.n_match AS DOUBLE) / CAST({NUM_PERM} AS DOUBLE) - e.jaccard) AS abs_err
FROM matches m
JOIN exact e ON m.doc_a = e.doc_a AND m.doc_b = e.doc_b
ORDER BY m.doc_a, m.doc_b
"""


# ================= mergeable HLL sketch rollup =================


def weekly_users_hll_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly distinct users from MERGED per-day Datasketches HLL
    sketches — the at-scale distinct-count pattern the plain
    approx_count_distinct twin can't show: materialize one compact
    sketch per (partition, day) at ingest, answer any coarser rollup
    (week, month, ad-hoc day ranges) by UNIONING sketches, never
    re-scanning raw events. Unlike exact COUNT(DISTINCT), sketch
    union is associative and map-side combinable at every level.

    Rows-only check (sketch internals aren't reproducible in DuckDB);
    the invariant that matters — merging the daily sketches estimates
    the SAME value as sketching the week directly, within HLL error of
    the exact count — is pinned by
    tests/test_beyond.py::test_weekly_users_hll_merge_consistency.

    Scale: two map-side-combinable aggregations over sketch bytes
    (day -> week); shuffle volume is O(days x sketch_size), not
    O(users)."""
    ev = read_events(spark, sf_dir)
    day = F.expr("(ts DIV 1000000000 DIV 86400) * 86400")
    daily = (
        ev.groupBy(day.alias("day_s"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"),
             F.count(F.lit(1)).alias("n_events"))
    )
    week = (F.col("day_s") - ((F.col("day_s") / 86400).cast("long") + 3) % 7 * 86400)
    return (
        daily.groupBy(week.alias("week_start_s"))
        .agg(F.hll_union_agg("sk").alias("wsk"),
             F.sum("n_events").alias("n_events"),
             F.count(F.lit(1)).alias("n_days"))
        .select(
            "week_start_s",
            F.hll_sketch_estimate("wsk").alias("est_users"),
            "n_days", "n_events",
        )
        .orderBy("week_start_s")
    )


# ================= robust (median/MAD) anomalies =================

ROBUST_TOP_N = 20


def robust_anomalies_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outliers: |x - median| / MAD instead of the
    z-score of ``events_value_anomalies`` — the estimator that does
    not let the outliers it is hunting inflate its own scale (mean
    and stddev both break down under contamination; median and MAD
    have 50% breakdown points).

    Exactness: everything stays BIGINT until the final division —
    values quantize to cents, the exact interpolated median is carried
    DOUBLED (med2 = the sum of the two middle cents, an integer even
    when the median is x.5), deviations in half-cents, the MAD doubled
    again (mad4 in quarter-cents), and the score is ONE correctly-
    rounded division dev4/mad4. Types whose MAD is 0 (over half the
    values at the median — scale is undefined) are excluded, a
    documented contract both engines apply identically.

    Scale: two per-type ranking windows (the documented exact-median
    cost, group-partitioned so nothing sorts globally — swap in
    approx_percentile at 100 TB); the two middle rows per type reduce
    to O(types) aggregates broadcast back; the global top-N plans as
    TakeOrdered, never a full sort."""
    from pyspark.sql import Window

    ev = read_events(spark, sf_dir)
    vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    base = ev.select("event_id", "event_type", vc.alias("vc"))

    def doubled_median(df, col, out):
        w = Window.partitionBy("event_type").orderBy(col)
        wn = Window.partitionBy("event_type")
        r = (df.withColumn("_r", F.row_number().over(w) - 1)
               .withColumn("_n", F.count(F.lit(1)).over(wn)))
        lo = F.floor((F.col("_n") - 1) / 2).cast("long")
        hi = (F.col("_n") / 2).cast("long")
        return r.groupBy("event_type").agg(
            (F.sum(F.when(F.col("_r") == lo, F.col(col)))
             + F.sum(F.when(F.col("_r") == hi, F.col(col)))).alias(out)
        )

    med = doubled_median(base, "vc", "med2")
    dev = (base.join(F.broadcast(med), "event_type")
           .select("event_id", "event_type",
                   F.abs(2 * F.col("vc") - F.col("med2")).alias("dev2")))
    from tickdatapipeline_spark.operators.globalorder import pin

    dev = pin(dev)  # feeds the MAD aggregate AND the scoring pass
    mad = doubled_median(dev, "dev2", "mad4").where(F.col("mad4") > 0)
    return (
        dev.join(F.broadcast(mad), "event_type")
        .select(
            "event_id", "event_type",
            rnd((2 * F.col("dev2")).cast("double") / F.col("mad4").cast("double"),
                6).alias("robust_z"),
        )
        .orderBy(F.desc("robust_z"), "event_id")
        .limit(ROBUST_TOP_N)
    )


ROBUST_ANOM_SQL = f"""
WITH base AS (
    SELECT CAST(event_id AS BIGINT) AS event_id, event_type,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
    FROM events
),
r1 AS (
    SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY vc) - 1 AS _r,
           count(*) OVER (PARTITION BY event_type) AS _n
    FROM base
),
med AS (
    SELECT event_type,
           CAST(sum(CASE WHEN _r = CAST(floor((_n - 1) / 2) AS BIGINT) THEN vc END)
                + sum(CASE WHEN _r = CAST(_n // 2 AS BIGINT) THEN vc END) AS BIGINT) AS med2
    FROM r1 GROUP BY event_type
),
dev AS (
    SELECT b.event_id, b.event_type, abs(2 * b.vc - m.med2) AS dev2
    FROM base b JOIN med m ON b.event_type = m.event_type
),
r2 AS (
    SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY dev2) - 1 AS _r,
           count(*) OVER (PARTITION BY event_type) AS _n
    FROM dev
),
mad AS (
    SELECT event_type,
           CAST(sum(CASE WHEN _r = CAST(floor((_n - 1) / 2) AS BIGINT) THEN dev2 END)
                + sum(CASE WHEN _r = CAST(_n // 2 AS BIGINT) THEN dev2 END) AS BIGINT) AS mad4
    FROM r2 GROUP BY event_type
)
SELECT d.event_id, d.event_type,
       {sql_rnd('CAST(2 * d.dev2 AS DOUBLE) / CAST(m.mad4 AS DOUBLE)', 6)} AS robust_z
FROM dev d JOIN mad m ON d.event_type = m.event_type
WHERE m.mad4 > 0
ORDER BY robust_z DESC, d.event_id
LIMIT {ROBUST_TOP_N}
"""


# ================= Matryoshka prefix-dim ablation =================

MRL_DIM = 16

_MRL_BASE_CTE = (
    f"base AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, "
    f"list_transform(embedding[1:{MRL_DIM}], x -> CAST(x AS DOUBLE)) AS v "
    f"FROM embeddings)"
)

MRL_TOPK_SQL = _brute_topk_sql(_MRL_BASE_CTE)


# ================= collocation mining =================

COLLOC_SQL = f"""
WITH toks AS (SELECT doc_id, {SQL_TOKENS} AS t FROM documents),
pairs AS (
    SELECT t[i] AS token_a, t[i + 1] AS token_b, count(*) AS pair_count
    FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks)
    GROUP BY 1, 2
    HAVING count(*) >= {COLLOC_MIN_COUNT}
),
unic AS (SELECT tok, count(*) AS cnt
         FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY 1),
n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM unic)
SELECT p.token_a, p.token_b, CAST(p.pair_count AS BIGINT) AS pair_count,
       CAST(ua.cnt AS BIGINT) AS count_a, CAST(ub.cnt AS BIGINT) AS count_b,
       {sql_rnd('CAST(p.pair_count * n.n AS DOUBLE) / CAST(ua.cnt * ub.cnt AS DOUBLE)', 6)} AS lift
FROM pairs p
JOIN unic ua ON p.token_a = ua.tok
JOIN unic ub ON p.token_b = ub.tok
CROSS JOIN n
ORDER BY lift DESC, p.token_a, p.token_b
LIMIT {COLLOC_TOP_K}
"""


# ================= linear multi-touch attribution =================


def attribution_linear_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every click inside the purchase's
    lookback window shares the purchase value EQUALLY — the
    multi-touch complement of the plain range-join attribution (which
    lists touches without crediting them); sum(credit) over a
    purchase's rows reproduces its value to the cent by construction.

    Exactness: purchase values quantize to BIGINT cents; the credit is
    (cents / n_touches) / 100 — two correctly-rounded divisions in a
    pinned order, bit-identical cross-engine.

    Scale: rides the binned range join (equi-join on (user, bin) —
    never a nested loop); the per-purchase count window partitions by
    purchase_event_id whose group size the lookback bounds, so no
    skewed sort; nothing aggregates globally."""
    from pyspark.sql import Window

    from tickdatapipeline_spark.operators.rangejoin import binned_range_join

    ev = read_events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_event_id"),
        F.expr("ts DIV 1000").alias("click_tus"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_event_id"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("vc"),
        (F.expr("ts DIV 1000") - ATTRIB_LOOKBACK_US).alias("lo"),
        F.expr("ts DIV 1000").alias("hi"),
    )
    att = binned_range_join(
        clicks, purchases, on=["user_id"], point_col="click_tus",
        lo_col="lo", hi_col="hi", bin_size=ATTRIB_BIN_US,
    )
    w = Window.partitionBy("purchase_event_id")
    return (
        att.withColumn("n_touches", F.count(F.lit(1)).over(w).cast("long"))
        .select(
            "user_id", "click_event_id", "purchase_event_id", "n_touches",
            rnd(F.col("vc").cast("double") / F.col("n_touches") / F.lit(100.0),
                6).alias("credit"),
        )
    )


ATTRIBUTION_LINEAR_SQL = f"""
WITH att AS (
    SELECT c.user_id, c.event_id AS click_event_id,
           p.event_id AS purchase_event_id,
           CAST(floor(p.value * 100 + 0.5) AS BIGINT) AS vc
    FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') c
    JOIN (SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND epoch_us(c.ts) BETWEEN epoch_us(p.ts) - {ATTRIB_LOOKBACK_US} AND epoch_us(p.ts)
)
SELECT user_id, click_event_id, purchase_event_id,
       CAST(n_touches AS BIGINT) AS n_touches,
       {sql_rnd('CAST(vc AS DOUBLE) / n_touches / 100.0', 6)} AS credit
FROM (SELECT *, count(*) OVER (PARTITION BY purchase_event_id) AS n_touches FROM att)
"""


# ================= split-leakage audit =================


def split_leakage_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-leakage audit: verified near-duplicate pairs whose members
    landed in DIFFERENT splits of the corpus's own train/val/test
    assignment — the leak decontamination-vs-an-external-benchmark
    can't see: a random split scatters every near-dup cluster across
    splits with probability ~1, silently inflating eval scores. The
    fix this query gates is group-aware splitting (hash the CLUSTER
    id, not the doc id); its output is the evidence.

    Output: (doc_a, doc_b, jaccard, split_a, split_b) for near-dup
    pairs with split_a != split_b, plus deterministic ordering.

    Scale: rides the LSH + verification sub-DAG; the split is a pure
    map-side hash projection joined onto the (tiny) verified-pair
    table twice — no new corpus-sized shuffle."""
    docs = _docs(spark, sf_dir)
    pairs = jaccard_pairs(docs, JACCARD_THRESHOLD, max_band_bucket=None)
    split = train_val_test_split(docs, SPLIT_VAL_PM, SPLIT_TEST_PM)
    return (
        pairs.join(split.select(F.col("doc_id").alias("doc_a"),
                                F.col("split").alias("split_a")), "doc_a")
        .join(split.select(F.col("doc_id").alias("doc_b"),
                           F.col("split").alias("split_b")), "doc_b")
        .where(F.col("split_a") != F.col("split_b"))
        .select("doc_a", "doc_b", "jaccard", "split_a", "split_b")
        .orderBy("doc_a", "doc_b")
    )


SPLIT_LEAKAGE_SQL = f"""
WITH pairs AS ({JACCARD_SQL}),
split AS ({SPLIT_SQL})
SELECT p.doc_a, p.doc_b, p.jaccard, sa.split AS split_a, sb.split AS split_b
FROM pairs p
JOIN split sa ON p.doc_a = sa.doc_id
JOIN split sb ON p.doc_b = sb.doc_id
WHERE sa.split <> sb.split
ORDER BY p.doc_a, p.doc_b
"""


# ================= cosine-distribution health check =================

COS_HIST_MOD = 10  # sample: vec_id % mod == 0 both sides
COS_HIST_BIN = 0.05


def cosine_histogram_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space health check: the distribution of pairwise
    cosines over a deterministic sample — the anisotropy/collapse
    diagnostic (a healthy space spreads mass; a collapsed or
    un-centered one piles up near 1.0, and every downstream
    threshold — SemDeDup's, the near-dup gate's — silently shifts).

    Exactness: cosines use the shared rounded-dot convention; the bin
    is floor(cos / 0.05) on the ROUNDED value, so bin edges are
    decided on identical doubles in both engines.

    Scale: the sample (vec_id % mod == 0) bounds the quadratic pair
    count by construction — mod is the knob that keeps
    (N/mod)^2 executor-sized at any corpus size; one broadcast of the
    sample against itself, then a tiny groupBy."""
    emb = _emb(spark, sf_dir)
    base = emb.where(F.col("vec_id") % COS_HIST_MOD == 0).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    )
    from tickdatapipeline_spark.operators.globalorder import pin
    from tickdatapipeline_spark.operators.similarity import _dot, _norm

    base = pin(base)  # both sides of the pair join
    a, b = base.alias("a"), base.alias("b")
    cos = rnd(_cos_sim(F.col("a.v"), F.col("b.v")), 6)
    return (
        a.join(F.broadcast(b), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.floor(cos / F.lit(COS_HIST_BIN)).cast("long").alias("bin_id"))
        .groupBy("bin_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select("bin_id", (F.col("bin_id") * COS_HIST_BIN).alias("bin_lo"), "n_pairs")
        .orderBy("bin_id")
    )


from tickdatapipeline_spark.oracle import dlit as _dlit_mod  # noqa: E402

COS_HIST_SQL = f"""
WITH base AS (
    SELECT CAST(vec_id AS BIGINT) AS vec_id, {SQL_VEC} AS v
    FROM embeddings WHERE vec_id % {COS_HIST_MOD} = 0
),
pairs AS (
    SELECT CAST(floor({sql_cos("a.v", "b.v", 6)} / {_dlit_mod(COS_HIST_BIN)}) AS BIGINT) AS bin_id
    FROM base a JOIN base b ON a.vec_id < b.vec_id
)
SELECT bin_id, bin_id * {_dlit_mod(COS_HIST_BIN)} AS bin_lo, count(*) AS n_pairs
FROM pairs GROUP BY bin_id ORDER BY bin_id
"""


# ================= group-aware split =================

GROUP_SPLIT_SQL = CLUSTERS_SQL.replace(
    """SELECT c.node AS doc_id, c.cluster_id,
       CAST(s.cluster_size AS BIGINT) AS cluster_size,
       CAST(CASE WHEN c.node = c.cluster_id THEN 1 ELSE 0 END AS BIGINT) AS is_representative
FROM comp c JOIN csizes s USING (cluster_id)""",
    f"""SELECT doc_id, cluster_id,
       CASE WHEN draw < {SPLIT_TEST_PM} THEN 'test'
            WHEN draw < {SPLIT_TEST_PM + SPLIT_VAL_PM} THEN 'val'
            ELSE 'train' END AS split
FROM (
    SELECT doc_id, cluster_id,
           {sql_h60("'split:' || CAST(cluster_id AS VARCHAR)")} % 1000 AS draw
    FROM (
        SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
               COALESCE(c.cluster_id, CAST(d.doc_id AS BIGINT)) AS cluster_id
        FROM documents d LEFT JOIN comp c ON CAST(d.doc_id AS BIGINT) = c.node
    )
)""",
)


# ================= BPE merge learning =================


def _bpe_merges_sql(n_merges: int = 3) -> str:
    """DuckDB twin of text.bpe_learn_merges: the same iteration
    unrolled as chained CTEs — chars spelled with the double-space
    separator, per-round argmax (count DESC, pair ASC) cross-joined
    back, literal replace() with the boundary-safe pattern."""
    ctes = [f"""w0 AS (
    SELECT count(*) AS cnt,
           ' ' || array_to_string(list_transform(range(1, length(w) + 1),
                                                 i -> substring(w, CAST(i AS INT), 1)), '  ') || ' ' AS s
    FROM (SELECT unnest({SQL_TOKENS}) AS w FROM documents)
    GROUP BY w
)"""]
    for k in range(1, n_merges + 1):
        ctes.append(f"""p{k} AS (
    SELECT syms[i] AS sym_a, syms[i + 1] AS sym_b, CAST(sum(cnt) AS BIGINT) AS pair_count
    FROM (SELECT cnt, string_split(trim(s), '  ') AS syms,
                 unnest(range(1, len(string_split(trim(s), '  ')))) AS i
          FROM w{k - 1})
    GROUP BY 1, 2
)""")
        ctes.append(f"""b{k} AS (
    SELECT sym_a, sym_b, pair_count FROM p{k}
    ORDER BY pair_count DESC, sym_a, sym_b LIMIT 1
)""")
        ctes.append(f"""w{k} AS (
    SELECT cnt, replace(s, ' ' || sym_a || '  ' || sym_b || ' ',
                        ' ' || sym_a || sym_b || ' ') AS s
    FROM w{k - 1} CROSS JOIN b{k}
)""")
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS BIGINT) AS merge_idx, sym_a, sym_b, pair_count FROM b{k}"
        for k in range(1, n_merges + 1)
    )
    return "WITH " + ",\n".join(ctes) + f"\n{unions}\nORDER BY merge_idx"


def _bpe_compression_sql(n_merges: int = 3) -> str:
    """DuckDB twin of text.bpe_compression_report: the learn CTEs plus
    the before/after symbol-mass aggregate."""
    learn = _bpe_merges_sql(n_merges)
    # keep the learn SQL's CTE chain, swap its merges-union tail
    head, _tail = learn.split("\nSELECT CAST(1 AS BIGINT) AS merge_idx", 1)
    return f"""{head}
SELECT b.n_words, b.n_symbols_char, a.n_symbols_bpe,
       (floor((CAST(a.n_symbols_bpe AS DOUBLE) / CAST(b.n_symbols_char AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0) AS compression
FROM (SELECT CAST(sum(cnt) AS BIGINT) AS n_words,
             CAST(sum(cnt * len(string_split(trim(s), '  '))) AS BIGINT) AS n_symbols_char
      FROM w0) b
CROSS JOIN (SELECT CAST(sum(cnt * len(string_split(trim(s), '  '))) AS BIGINT) AS n_symbols_bpe
            FROM w{n_merges}) a
"""


# ================= kNN label probe =================


def knn_label_accuracy_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label-agreement probe: predict each sampled vector's label
    by majority vote of its top-k cosine neighbors and report per-label
    accuracy — the embedding-quality / label-noise eval (a healthy
    labeled embedding space predicts its own labels; a label whose
    accuracy craters is either noisy or not linearly clustered, and
    every label-conditioned op downstream inherits that).

    Exactness: votes are BIGINT counts; majority ties break to the
    lower label; accuracy is one division of two exact integers.

    Scale: rides cosine_topk's broadcast-probe contract (sampled query
    side); everything after runs on O(queries x k) rows."""
    emb = _emb(spark, sf_dir)
    from pyspark.sql import Window

    labels = emb.select(F.col("vec_id").cast("long").alias("vec_id"),
                        F.col("label").cast("long").alias("label"))
    from tickdatapipeline_spark.operators.globalorder import pin

    labels = pin(labels)  # query-side and neighbor-side lookups
    topk = cosine_topk(emb, TOPK_K, QUERY_MOD)
    votes = (
        topk.join(labels.select(F.col("vec_id").alias("neighbor_id"),
                                F.col("label").alias("n_label")), "neighbor_id")
        .groupBy("query_id", "n_label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("votes"), "n_label")
    pred = (votes.withColumn("r", F.row_number().over(w)).where(F.col("r") == 1)
            .select("query_id", F.col("n_label").alias("pred_label")))
    scored = pred.join(
        labels.select(F.col("vec_id").alias("query_id"),
                      F.col("label").alias("true_label")), "query_id")
    return (
        scored.groupBy("true_label")
        .agg(F.count(F.lit(1)).alias("n_queries"),
             F.sum((F.col("pred_label") == F.col("true_label")).cast("long")
                   ).alias("n_correct"))
        .select(
            "true_label", "n_queries", "n_correct",
            rnd(F.col("n_correct").cast("double") / F.col("n_queries").cast("double"),
                6).alias("accuracy"),
        )
        .orderBy("true_label")
    )


KNN_LABEL_SQL = f"""
WITH topk AS ({COSINE_TOPK_SQL}),
lab AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
votes AS (
    SELECT t.query_id, l.label AS n_label, count(*) AS votes
    FROM topk t JOIN lab l ON t.neighbor_id = l.vec_id
    GROUP BY 1, 2
),
pred AS (
    SELECT query_id, n_label AS pred_label
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY votes DESC, n_label) AS r
          FROM votes)
    WHERE r = 1
)
SELECT l.label AS true_label, count(*) AS n_queries,
       CAST(sum(CASE WHEN p.pred_label = l.label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       {sql_rnd('CAST(sum(CASE WHEN p.pred_label = l.label THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)', 6)} AS accuracy
FROM pred p JOIN lab l ON p.query_id = l.vec_id
GROUP BY 1 ORDER BY 1
"""


# ================= lexical phrase search =================

SEARCH_PHRASE = "part filter"


def phrase_search_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search, direct corpus-scan formulation: documents
    containing the token-adjacent phrase, with occurrence count and
    first position — the lexical complement of the ANN family, and the
    oracle-gated twin of operators/search.py::phrase_search_indexed
    (whose inverted index answers the same query from partition-pruned
    posting buckets at corpus scale; equality is pinned in
    tests/test_beyond.py::test_phrase_search_index_matches_direct).

    Exactness: token positions are integers; equality on ASCII tokens.

    Scale: one map-side pass (tokenize + position filter per row) —
    no shuffle at all until the final tiny result sort."""
    words = SEARCH_PHRASE.split()
    docs = _docs(spark, sf_dir)
    # element_at is 1-based like DuckDB's t[i] (bracket indexing in
    # Spark is 0-based); every probed position is in range by the
    # sequence bound, so ANSI-strict element_at never throws
    cond = " AND ".join(
        f"element_at(t, i + {j}) = '{w}'" for j, w in enumerate(words)
    )
    span = len(words) - 1
    hits = F.expr(
        f"filter(sequence(1, size(t) - {span}), i -> {cond})"
    )
    return (
        docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                    tokens(F.col("text")).alias("t"))
        .where(F.size("t") >= len(words))
        .select("doc_id", hits.alias("hits"))
        .where(F.size("hits") > 0)
        .select(
            "doc_id",
            F.size("hits").cast("long").alias("n_occurrences"),
            F.get("hits", 0).cast("long").alias("first_pos"),
        )
        .orderBy("doc_id")
    )


def _phrase_search_sql(phrase: str) -> str:
    words = phrase.split()
    cond = " AND ".join(f"t[i + {j}] = '{w}'" for j, w in enumerate(words))
    span = len(words) - 1
    return f"""
WITH toks AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id, {SQL_TOKENS} AS t FROM documents
),
hits AS (
    SELECT doc_id, list_filter(range(1, len(t) - {span} + 1), i -> {cond}) AS h
    FROM toks WHERE len(t) >= {len(words)}
)
SELECT doc_id, CAST(len(h) AS BIGINT) AS n_occurrences,
       CAST(h[1] AS BIGINT) AS first_pos
FROM hits WHERE len(h) > 0 ORDER BY doc_id
"""


# ================= ANN mean reciprocal rank =================


def ann_mrr_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean reciprocal rank of the IVF path against brute-force ground
    truth: at what position does the approximate list surface each
    query's TRUE nearest neighbor — the rank-position-sensitive
    complement of recall@k (recall can stay flat while the true top-1
    slides from rank 1 to rank k; MRR catches that before a
    production re-ranker would).

    Exactness: each reciprocal 1/rank is one correctly-rounded IEEE
    division; the mean folds reciprocals in query_id order (sorted
    fold, both engines) and divides once — bit-identical.

    Scale: both inputs follow their own contracts (broadcast-probe
    scorers); everything here runs on O(queries) rows, and the final
    fold is over a collected-per-group array of |queries| doubles — a
    scalar aggregate, not a corpus structure."""
    exact = cosine_topk(_emb(spark, sf_dir), TOPK_K, QUERY_MOD)
    approx = ann_topk_ivf(_emb(spark, sf_dir), TOPK_K, QUERY_MOD)
    true1 = exact.where(F.col("rank") == 1).select(
        "query_id", F.col("neighbor_id").alias("true_nn"))
    hit = approx.join(true1, "query_id").where(
        F.col("neighbor_id") == F.col("true_nn")
    ).select("query_id", F.col("rank").alias("hit_rank"))
    rr = true1.join(hit, "query_id", "left").select(
        "query_id",
        F.when(F.col("hit_rank").isNotNull(),
               F.lit(1.0) / F.col("hit_rank").cast("double"))
        .otherwise(F.lit(0.0)).alias("rr"),
    )
    folded = rr.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.aggregate(
            F.transform(F.sort_array(F.collect_list(F.struct("query_id", "rr"))),
                        lambda x: x["rr"]),
            F.lit(0.0), lambda a, x: a + x,
        ).alias("rr_sum"),
    )
    return folded.select(
        "n_queries",
        rnd(F.col("rr_sum")
            / F.nullif(F.col("n_queries"), F.lit(0)).cast("double"),
            6).alias("mrr"),
    )


ANN_MRR_SQL = f"""
WITH exact AS ({COSINE_TOPK_SQL}),
approx AS ({IVF_SQL.format(query_mod=QUERY_MOD, k=TOPK_K)}),
true1 AS (SELECT query_id, neighbor_id AS true_nn FROM exact WHERE rank = 1),
hit AS (
    SELECT a.query_id, a.rank AS hit_rank
    FROM approx a JOIN true1 t ON a.query_id = t.query_id AND a.neighbor_id = t.true_nn
),
rr AS (
    SELECT t.query_id,
           CASE WHEN h.hit_rank IS NOT NULL
                THEN 1.0e0 / CAST(h.hit_rank AS DOUBLE) ELSE 0.0e0 END AS rr
    FROM true1 t LEFT JOIN hit h ON t.query_id = h.query_id
)
SELECT CAST(count(*) AS BIGINT) AS n_queries,
       {sql_rnd("list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(rr ORDER BY query_id)), (x, y) -> x + y) / CAST(count(*) AS DOUBLE)", 6)} AS mrr
FROM rr
"""


# ================= per-type linear trend =================


def value_trend_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type linear trend of hourly value: exact OLS slope over
    (hour index, hourly cent sum) — the drift DIRECTION/RATE readout
    next to the detectors (CUSUM says WHEN the level changed, KS says
    the distribution moved, the slope says how fast it's moving and
    which way).

    Exactness: x is the hour index centered on the integer midpoint of
    the type's span (slope is shift-invariant; centering keeps every
    accumulated product inside int64 — bounds guarded IN-PLAN, see
    below), y is the BIGINT cent sum; all five OLS sums are BIGINT and
    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx*Sx) is computed from exact
    integers with ONE final division. An un-prunable raise_error folds
    into the guard: n*|Sxy| and n*Sxx must stay below 2^62, which at
    100 TB means "trend windows above ~100 K hours x 10^9-cent hours
    need re-binning", the documented contract — never a silent
    overflow.

    Scale: raw events reduce map-side to O(hours x types); the span
    midpoint is a tiny per-type aggregate broadcast back; the OLS
    sums are one more map-side-combinable aggregate over hourly rows."""
    ev = read_events(spark, sf_dir)
    vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    hourly = (
        ev.select(F.expr("(ts DIV 1000000000 DIV 3600)").alias("h"),
                  "event_type", vc.alias("vc"))
        .groupBy("event_type", "h")
        .agg(F.sum("vc").alias("y"))
    )
    return trend_over_hourly(hourly)


def trend_over_hourly(hourly: DataFrame) -> DataFrame:
    """The OLS algebra of value_trend_fn over a prepared
    (event_type, h, y) hourly frame — shared with
    streaming.run_value_trend_stream exactly like cusum_over_hourly."""
    # integer DIV: DuckDB CAST(double AS BIGINT) ROUNDS while Spark's
    # cast truncates — an odd min+max would silently diverge
    span = hourly.groupBy("event_type").agg(
        F.expr("(min(h) + max(h)) DIV 2").alias("mid"))
    c = (
        hourly.join(F.broadcast(span), "event_type")
        .select("event_type", (F.col("h") - F.col("mid")).alias("x"), "y")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"), F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    lim = F.lit(2 ** 62)
    guard = F.when(
        (F.col("n") * F.abs(F.col("sxy")) < lim) & (F.col("n") * F.col("sxx") < lim),
        F.col("n"),
    ).otherwise(F.raise_error(F.lit(
        "value_trend: OLS sums exceed the int64 budget — re-bin the trend window"
    )))
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return (
        c.where(F.col("sxx") > 0)  # a single-hour type has no trend
        .select(
            "event_type", guard.alias("n_hours"),
            rnd(F.col("sy").cast("double") / F.col("n") / F.lit(100.0), 6
                ).alias("mean_hourly_value"),
            rnd(num / den / F.lit(100.0), 6).alias("slope_per_hour"),
        )
        .orderBy("event_type")
    )


VALUE_TREND_SQL = f"""
WITH hourly AS (
    SELECT event_type, (epoch_us(ts) // 1000000 // 3600) AS h,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
span AS (
    SELECT event_type, (min(h) + max(h)) // 2 AS mid
    FROM hourly GROUP BY 1
),
sums AS (
    SELECT hourly.event_type,
           count(*) AS n,
           CAST(sum(h - mid) AS BIGINT) AS sx,
           CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum((h - mid) * y) AS BIGINT) AS sxy,
           CAST(sum((h - mid) * (h - mid)) AS BIGINT) AS sxx
    FROM hourly JOIN span ON hourly.event_type = span.event_type
    GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_hours,
       {sql_rnd('CAST(sy AS DOUBLE) / n / 100.0', 6)} AS mean_hourly_value,
       {sql_rnd('CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0', 6)} AS slope_per_hour
FROM sums WHERE sxx > 0
ORDER BY event_type
"""


# ================= per-type health summary =================


def health_summary_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type monitor dashboard: one row per event type joining the
    detector family — the CUSUM changepoint (WHEN the level shifted,
    by how much before/after) and the exact OLS trend (how fast it is
    drifting now) over the same hourly series — the single query an
    on-call pins next to the alarms, and the batch twin of pointing
    run_value_cusum_stream and run_value_trend_stream at one store.

    Exactness: a pure column-subset join of two already-exact plans
    on event_type; nothing new crosses the oracle.

    Scale: the hourly reduction is shared lineage; both detector
    aggregates run on O(hours x types) rows and join on O(types)."""
    cu = value_cusum_fn(spark, sf_dir).select(
        "event_type", F.col("n_hours").alias("n_hours"),
        F.col("stat").alias("cusum_stat"), "cp_hour_s",
        "mean_before", "mean_after",
    )
    tr = value_trend_fn(spark, sf_dir).select(
        "event_type", "mean_hourly_value", "slope_per_hour")
    return cu.join(tr, "event_type").orderBy("event_type")


HEALTH_SUMMARY_SQL = f"""
WITH cu AS ({VALUE_CUSUM_SQL}),
tr AS ({VALUE_TREND_SQL})
SELECT cu.event_type, cu.n_hours, cu.stat AS cusum_stat, cu.cp_hour_s,
       cu.mean_before, cu.mean_after,
       tr.mean_hourly_value, tr.slope_per_hour
FROM cu JOIN tr ON cu.event_type = tr.event_type
ORDER BY cu.event_type
"""


# ================= DAU/WAU stickiness =================

STICKY_WINDOW_D = 7


def stickiness_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement stickiness: per day, DAU / WAU — distinct users that
    day over distinct users in the trailing 7 days (the standard
    how-often-do-actives-return ratio).

    Scale trick: trailing-window DISTINCT doesn't slide — instead of 7
    scans or a windowed countDistinct (which Spark would expand
    row-per-user-per-day anyway), the (user, day) DISTINCT table
    explodes each row to the <=7 future days it can serve (bounded
    fan-out), and ONE groupBy counts distinct users per target day.
    Everything is map-side-combinable before the one exchange on
    target_day; the ratio is a single division of two exact counts.

    Day domain note: only target days that actually have activity are
    reported (inner join DAU), and the trailing window may span days
    with no events (they simply contribute nothing)."""
    ev = read_events(spark, sf_dir)
    ud = (
        ev.select(F.expr("(ts DIV 1000000000 DIV 86400)").alias("day"), "user_id")
        .distinct()
    )
    from tickdatapipeline_spark.operators.globalorder import pin

    ud = pin(ud)  # DAU side + the exploded WAU side
    dau = ud.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    wau = (
        ud.select(
            "user_id",
            F.explode(F.sequence(F.col("day"),
                                 F.col("day") + (STICKY_WINDOW_D - 1))).alias("t_day"),
        )
        .groupBy("t_day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, dau.day == wau.t_day)
        .select(
            (F.col("day") * 86400).alias("day_s"), "dau", "wau",
            rnd(F.col("dau").cast("double") / F.col("wau").cast("double"), 6
                ).alias("stickiness"),
        )
        .orderBy("day_s")
    )


STICKINESS_SQL = f"""
WITH ud AS (
    SELECT DISTINCT (epoch_us(ts) // 1000000 // 86400) AS day, user_id FROM events
),
dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM ud GROUP BY 1),
wau AS (
    SELECT t_day, count(DISTINCT user_id) AS wau
    FROM (SELECT user_id, unnest(range(day, day + {STICKY_WINDOW_D})) AS t_day FROM ud)
    GROUP BY 1
)
SELECT CAST(dau.day * 86400 AS BIGINT) AS day_s,
       CAST(dau.dau AS BIGINT) AS dau, CAST(wau.wau AS BIGINT) AS wau,
       {sql_rnd('CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE)', 6)} AS stickiness
FROM dau JOIN wau ON dau.day = wau.t_day
ORDER BY day_s
"""


# ================= dup-graph degree distribution =================


def dup_degree_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the verified near-dup graph: how many
    documents have exactly d near-duplicates — the corpus-health
    readout behind dedup strategy (a long-tailed distribution says
    "pairwise keep-one suffices"; mass at high degree says "template
    farms — cluster first, or the pair table is quadratic in the
    farm"). The same distribution bounds duplicate_clusters' join
    fan-out per round.

    Scale: rides the LSH+verification sub-DAG; the degree aggregate is
    two map-side-combinable groupBys over the (tiny) pair table."""
    docs = _docs(spark, sf_dir)
    pairs = jaccard_pairs(docs, JACCARD_THRESHOLD, max_band_bucket=None)
    deg = (
        pairs.select(F.col("doc_a").alias("doc"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc")))
        .groupBy("doc").agg(F.count(F.lit(1)).alias("degree"))
    )
    return (
        deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("degree")
    )


DUP_DEGREE_SQL = f"""
WITH pairs AS ({JACCARD_SQL}),
deg AS (
    SELECT doc, count(*) AS degree
    FROM (SELECT doc_a AS doc FROM pairs UNION ALL SELECT doc_b FROM pairs)
    GROUP BY doc
)
SELECT CAST(degree AS BIGINT) AS degree, count(*) AS n_docs
FROM deg GROUP BY degree ORDER BY degree
"""


# ================= idf-weighted jaccard =================

WEIGHTED_JACCARD_SQL = f"""
WITH {MINHASH_CTE},
{_LSH_CAND_CTE},
{_HSH_CTE},
nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
dfreq AS (SELECT g, count(DISTINCT doc_id) AS df FROM hsh GROUP BY g),
wg AS (SELECT g, CAST(n // df AS BIGINT) AS w FROM dfreq CROSS JOIN nd),
hw AS (SELECT h.doc_id, h.g, wg.w FROM hsh h JOIN wg ON h.g = wg.g),
sizes AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS w_mass FROM hw GROUP BY doc_id),
inter AS (
    SELECT c.doc_a, c.doc_b, CAST(sum(a.w) AS BIGINT) AS inter_w
    FROM cand c
    JOIN hw a ON a.doc_id = c.doc_a
    JOIN hw b ON b.doc_id = c.doc_b AND b.g = a.g
    GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b, inter_w,
       sa.w_mass + sb.w_mass - inter_w AS union_w,
       {sql_rnd('CAST(inter_w AS DOUBLE) / CAST(sa.w_mass + sb.w_mass - inter_w AS DOUBLE)', 6)} AS wjaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE {sql_rnd('CAST(inter_w AS DOUBLE) / CAST(sa.w_mass + sb.w_mass - inter_w AS DOUBLE)', 6)} >= {JACCARD_THRESHOLD}
"""


# ================= per-source fluency filter =================

FLUENCY_PCT = 0.10


def fluency_filter_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style fluency filter, applied: keep documents whose
    char-bigram LM score clears their OWN SOURCE's 10th percentile —
    the per-domain threshold practice (a code dump and a news feed
    have different fluency baselines; one global bar would gut the
    lower-entropy source). Completes the docs_bigram_likelihood story:
    that query SCORES, this one FILTERS.

    Exactness: scores are the bit-exact bigram means; the per-source
    bar is the exact interpolated grouped percentile (shared
    plans/common machinery); survival is one >= compare on the shared
    rounded doubles.

    Scale: scoring is the bigram plan (model broadcast, one doc_id
    exchange); the percentile runs group-partitioned ranking windows
    (never a global sort); the O(sources) bar table broadcasts back."""
    from tickdatapipeline_spark.operators.text import char_bigram_likelihood
    from tickdatapipeline_spark.plans.common import grouped_exact_percentiles

    docs = _docs(spark, sf_dir)
    scored = (
        char_bigram_likelihood(docs)
        .join(docs.select(F.col("doc_id").cast("long").alias("doc_id"), "source"),
              "doc_id")
    )
    from tickdatapipeline_spark.operators.globalorder import pin

    scored = pin(scored)  # percentile pass + survivor filter
    bar = grouped_exact_percentiles(
        scored.select("source", "avg_bigram_p"), "source", "avg_bigram_p",
        [FLUENCY_PCT], out_value="bar",
    ).select("source", "bar")
    return (
        scored.join(F.broadcast(bar), "source")
        .where(F.col("avg_bigram_p") >= F.col("bar"))
        .select("doc_id", "source", "avg_bigram_p", "bar")
        .orderBy("doc_id")
    )


def _fluency_filter_sql() -> str:
    from tickdatapipeline_spark.plans.common import sql_grouped_exact_percentiles

    scored = f"""SELECT s.doc_id, d.source, s.avg_bigram_p
FROM ({BIGRAM_LM_SQL.strip()}) s
JOIN (SELECT CAST(doc_id AS BIGINT) AS doc_id, source FROM documents) d
  ON s.doc_id = d.doc_id"""
    bar = sql_grouped_exact_percentiles(
        f"SELECT source, avg_bigram_p FROM ({scored})", "source",
        "avg_bigram_p", [FLUENCY_PCT], out_value="bar",
    )
    return f"""
WITH scored AS ({scored}),
bars AS ({bar})
SELECT scored.doc_id, scored.source, scored.avg_bigram_p, bars.bar
FROM scored JOIN bars ON scored.source = bars.source
WHERE scored.avg_bigram_p >= bars.bar
ORDER BY scored.doc_id
"""


# ================= round 8: ranked retrieval (BM25) =================

BM25_QUERY = ["part", "filter", "join"]  # mixed-df bag over the fixture corpus
BM25_TOPK = 10


def bm25_topk_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval for a fixed query bag — the relevance
    scorer completing the lexical-search family (operators/search.py:
    bm25_topk; rational idf keeps the oracle exact, see the operator
    docstring)."""
    from tickdatapipeline_spark.operators.search import bm25_topk

    return bm25_topk(_docs(spark, sf_dir), BM25_QUERY, BM25_TOPK)


def _bm25_sql(terms: "list[str]", k: int) -> str:
    from tickdatapipeline_spark.oracle import dlit

    one, qtr, half = dlit(1.25), dlit(2.25), dlit(0.5)
    b_, onemb = dlit(0.75), dlit(0.25)
    tf_cols = ",\n           ".join(
        f"CAST(sum(CASE WHEN token = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n           ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(len(terms))
    )
    avgdl = "(CAST(total_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    norm = f"{one} * ({onemb} + {b_} * (CAST(dl AS DOUBLE) / {avgdl}))"
    score_terms = " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN "
        f"((CAST(n_docs AS DOUBLE) - CAST(df{i} AS DOUBLE) + {half})"
        f" / (CAST(df{i} AS DOUBLE) + {half}))"
        f" * ((CAST(tf{i} AS DOUBLE) * {qtr}) / (CAST(tf{i} AS DOUBLE) + {norm}))"
        f" ELSE {dlit(0.0)} END)"
        for i in range(len(terms))
    )
    return f"""
WITH toks AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id, unnest({SQL_TOKENS}) AS token
    FROM documents
),
per_doc AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS dl,
           {tf_cols}
    FROM toks GROUP BY doc_id
),
stats AS (
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(dl) AS BIGINT) AS total_dl,
           {df_cols}
    FROM per_doc
),
scored AS (
    SELECT doc_id, dl, {score_terms} AS score_raw
    FROM per_doc, stats
)
SELECT doc_id, dl, {sql_rnd("score_raw")} AS score
FROM scored WHERE score_raw > {dlit(0.0)}
ORDER BY score_raw DESC, doc_id LIMIT {k}
"""


BM25_SQL = _bm25_sql(BM25_QUERY, BM25_TOPK)


# ================= round 8: KMV distinct sketch =================

KMV_K = 8


def kmv_daily_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-user sketch per day, audited
    against the exact count: estimate = (2^60 DIV h_k) * (k-1) where
    h_k is the k-th smallest 60-bit user hash — the mergeable sketch
    you reach for when exact countDistinct's expand is too expensive,
    with the exact count alongside so the error is measured, not
    assumed (same audit pattern as dedup_minhash_calibration).

    Exactness: integer DIV throughout (2^60 DIV h_k first, then the
    (k-1) multiply — no HUGEINT and no double rounding); days with
    fewer than k users fall back to the exact count (the sketch IS
    exact below k). rank() (not row_number) so a 2^-60 hash tie keeps
    both engines on identical row sets.

    Scale: the sketch path is one (day, user) distinct + a per-day
    rank window capped at k (WindowGroupLimit); sketches merge across
    shards/days by unioning min-sets — the property the exact count
    lacks."""
    from pyspark.sql import Window

    ev = read_events(spark, sf_dir)
    du = ev.select(
        F.expr("(ts DIV 1000000000 DIV 86400) * 86400").alias("day_s"),
        "user_id",
    ).distinct()
    h = du.select("day_s", h60(F.col("user_id").cast("string")).alias("hv"))
    w = Window.partitionBy("day_s").orderBy("hv")
    mins = (
        h.withColumn("rk", F.rank().over(w))
        .where(F.col("rk") <= KMV_K)
        .groupBy("day_s")
        .agg(F.max("hv").alias("hk"), F.count(F.lit(1)).alias("n_le"))
    )
    exact = du.groupBy("day_s").agg(F.count(F.lit(1)).alias("n_exact"))
    est = F.when(
        F.col("n_exact") < KMV_K, F.col("n_exact")
    ).otherwise(F.expr(f"({1 << 60} DIV hk) * {KMV_K - 1}"))
    return (
        exact.join(mins, "day_s")
        .select("day_s", "n_exact", est.alias("kmv_est"))
        .orderBy("day_s")
    )


KMV_SQL = f"""
WITH du AS (
    SELECT DISTINCT (epoch_us(ts) // 1000000 // 86400) * 86400 AS day_s, user_id
    FROM events
),
h AS (SELECT day_s, {sql_h60("CAST(user_id AS VARCHAR)")} AS hv FROM du),
mins AS (
    SELECT day_s, CAST(max(hv) AS BIGINT) AS hk, count(*) AS n_le
    FROM (SELECT day_s, hv, rank() OVER (PARTITION BY day_s ORDER BY hv) AS rk FROM h)
    WHERE rk <= {KMV_K} GROUP BY day_s
),
exact AS (SELECT day_s, CAST(count(*) AS BIGINT) AS n_exact FROM du GROUP BY day_s)
SELECT exact.day_s, n_exact,
       CAST(CASE WHEN n_exact < {KMV_K} THEN n_exact
            ELSE ({1 << 60} // hk) * {KMV_K - 1} END AS BIGINT) AS kmv_est
FROM exact JOIN mins ON exact.day_s = mins.day_s
ORDER BY exact.day_s
"""


# ================= round 8: hourly autocorrelation =================

ACF_LAGS = [1, 2, 3]


def hourly_acf_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the hourly event-count series per type at lags
    1-3h — the seasonality/burstiness diagnostic feeding cadence-aware
    monitors (a strong lag-24 ACF would justify the seasonal-anomaly
    model; a strong lag-1 means bursty traffic).

    Exactness: the Pearson r of (x_t, x_{t+L}) over the GAP-FILLED hour
    grid via integer five-sums — n, Sx, Sy, Sxy, Sxx, Syy are BIGINT
    sums of counts, the correlation is two exact sqrt()s and one
    division (same formulation as events_rolling_corr / the OLS trend).

    Scale: everything downstream of the hourly aggregate is O(hours x
    types x lags) rows; the lag pairing is an equi-join on (type,
    hour + L) — no window over the raw stream, no global sort. Same
    int64-budget contract as the OLS trend: an un-prunable raise_error
    folded into n_pairs bounds n*|Sxy| / n*Sxx / n*Syy below 2^62 —
    above ~100 K hours x 10^9-count hours the documented answer is
    "re-bin", never a silent wraparound."""
    ev = read_events(spark, sf_dir).select(
        F.expr("(ts DIV 1000000000 DIV 3600) * 3600").alias("hour_s"),
        "event_type",
    )
    hourly = ev.groupBy("event_type", "hour_s").agg(F.count(F.lit(1)).alias("n"))
    bounds = ev.agg(F.min("hour_s").alias("lo"), F.max("hour_s").alias("hi"))
    grid = (
        ev.select("event_type").distinct()
        .join(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.expr("sequence(lo, hi, 3600)")).alias("hour_s"),
        )
    )
    g = grid.join(hourly, ["event_type", "hour_s"], "left").select(
        "event_type", "hour_s", F.coalesce(F.col("n"), F.lit(0)).alias("x")
    )
    from tickdatapipeline_spark.operators.globalorder import pin

    g = pin(g)  # both sides of every lag join
    lagged = g.select(
        "event_type", "hour_s", F.col("x"),
        F.explode(F.array(*[F.lit(lag) for lag in ACF_LAGS])).alias("lag_h"),
    )
    y = g.select(
        F.col("event_type").alias("et"),
        F.col("hour_s").alias("hs"),
        F.col("x").alias("y"),
    )
    pairs = lagged.join(
        y,
        (F.col("event_type") == F.col("et"))
        & (F.col("hs") == F.col("hour_s") + F.col("lag_h") * 3600),
    )
    sums = pairs.groupBy("event_type", "lag_h").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    acf = F.when(
        (vx > 0) & (vy > 0),
        rnd(num / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))), 6),
    )
    guarded_n = _corr_budget_guard("events_hourly_acf")
    return sums.select(
        "event_type", F.col("lag_h").cast("long").alias("lag_h"),
        guarded_n.alias("n_pairs"), acf.alias("acf"),
    ).orderBy("event_type", "lag_h")


def _corr_budget_guard(op: str):
    """The correlation family's int64-budget guard (the exact pattern
    trend_over_hourly folds into n_hours): the five-sum Pearson algebra
    n*Sxy - Sx*Sy / sqrt(n*Sxx - Sx^2) / sqrt(n*Syy - Sy^2) is exact
    only while every product stays inside int64. Guarding n*|Sxy|,
    n*Sxx and n*Syy below 2^62 suffices — Cauchy-Schwarz bounds
    Sx^2 <= n*Sxx and |Sx*Sy| <= max(n*Sxx, n*Syy). Folded into the
    consumed n_pairs output so Catalyst cannot prune it; on trip it
    raises the documented re-bin message instead of an opaque ANSI
    arithmetic error (or a silent wraparound with ANSI off)."""
    # division form, not n*sum < 2^62: the guard's own product could
    # overflow int64 first and surface the very ANSI arithmetic error
    # the guard exists to replace. n >= 1 always (count over a group).
    # (Shared implementation since r10: functions/guards.py — identical
    # condition order and message shape, one copy to fix.)
    from tickdatapipeline_spark.functions.guards import corr_budget_guard

    return corr_budget_guard(
        f"{op}: correlation five-sums exceed the int64 budget — re-bin the series"
    )


ACF_SQL = f"""
WITH e AS (
    SELECT (epoch_us(ts) // 1000000 // 3600) * 3600 AS hour_s, event_type
    FROM events
),
hourly AS (
    SELECT event_type, hour_s, CAST(count(*) AS BIGINT) AS n
    FROM e GROUP BY event_type, hour_s
),
bounds AS (SELECT min(hour_s) AS lo, max(hour_s) AS hi FROM e),
grid AS (
    SELECT t.event_type, h.hour_s
    FROM (SELECT DISTINCT event_type FROM e) t,
         (SELECT unnest(range(lo, hi + 3600, 3600)) AS hour_s FROM bounds) h
),
g AS (
    SELECT grid.event_type, grid.hour_s, coalesce(hourly.n, 0) AS x
    FROM grid LEFT JOIN hourly
      ON grid.event_type = hourly.event_type AND grid.hour_s = hourly.hour_s
),
pairs AS (
    SELECT a.event_type, lag_h, a.x AS x, b.x AS y
    FROM (SELECT *, unnest({ACF_LAGS}) AS lag_h FROM g) a
    JOIN g b ON a.event_type = b.event_type
            AND b.hour_s = a.hour_s + lag_h * 3600
),
sums AS (
    SELECT event_type, CAST(lag_h AS BIGINT) AS lag_h,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x * y) AS BIGINT) AS sxy,
           CAST(sum(x * x) AS BIGINT) AS sxx,
           CAST(sum(y * y) AS BIGINT) AS syy
    FROM pairs GROUP BY event_type, lag_h
)
SELECT event_type, lag_h, n AS n_pairs,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN {sql_rnd("CAST(n * sxy - sx * sy AS DOUBLE) / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))")}
       END AS acf
FROM sums
ORDER BY event_type, lag_h
"""


# ================= round 8: hard-negative mining =================


def hard_negatives_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining: for each query vector, the
    top-k most-similar vectors with a DIFFERENT label — the pairs a
    contrastive/metric-learning pipeline trains hardest on (similar
    embedding, different class). Rides the brute-force scorer's
    broadcast-probe contract (operators/similarity.py:_brute_topk) with
    the label inequality pushed into the join."""
    from pyspark.sql import Window

    from tickdatapipeline_spark.operators.similarity import _as_double, _dot, _norm

    emb = _emb(spark, sf_dir)
    base = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        _as_double(F.col("embedding")).alias("v"),
        F.col("label").cast("long").alias("label"),
    )
    queries = base.where(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("q"),
        F.col("label").alias("query_label"),
    )
    joined = base.join(
        F.broadcast(queries),
        (F.col("vec_id") != F.col("query_id"))
        & (F.col("label") != F.col("query_label")),
    )
    cos = rnd(_cos_sim(F.col("q"), F.col("v")), 6)
    scored = joined.select(
        "query_id", "query_label",
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        cos.alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= TOPK_K)
        .select("query_id", "query_label", "neighbor_id", "neighbor_label",
                "rank", "cosine")
    )


HARD_NEGATIVES_SQL = f"""
WITH base AS (
    SELECT CAST(vec_id AS BIGINT) AS vec_id, {SQL_VEC} AS v,
           CAST(label AS BIGINT) AS label
    FROM embeddings
),
q AS (
    SELECT vec_id AS query_id, v, label AS query_label
    FROM base WHERE vec_id % {QUERY_MOD} = 0
),
scored AS (
    SELECT q.query_id, q.query_label, b.vec_id AS neighbor_id,
           b.label AS neighbor_label, {_cos} AS cosine
    FROM base b JOIN q ON b.vec_id <> q.query_id AND b.label <> q.query_label
)
SELECT query_id, query_label, neighbor_id, neighbor_label, rank, cosine FROM (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
    FROM scored
) WHERE rank <= {TOPK_K}
"""


# ================= round 8: session concurrency sweep =================

DAY_US = 86_400_000_000


def session_concurrency_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the capacity-planning readout
    over the sessionized stream: interval algebra (sessions as
    [start, end] spans) swept with +1/-1 boundary events and a running
    sum, whose per-day maximum is the answer.

    Scale-safe formulation: a naive sweep is ONE global ordered window
    (serial at corpus scale). Instead every session is split into its
    per-day segments first (bounded explode, same trick as
    events_stickiness), clipped to the day, so the running-sum window
    partitions by day — embarrassingly parallel, no global sort. Ties
    order starts before ends (delta DESC), making touching sessions
    count as concurrent; the per-day MAX is invariant to row order
    within equal (t, delta) groups, so the window is deterministic.

    Exactness: integer microseconds and counts end to end."""
    from pyspark.sql import Window

    ev = read_events(spark, sf_dir).select(
        "user_id", "event_id", F.expr("ts DIV 1000").alias("tus")
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    gap = F.col("tus") - F.lag("tus").over(w)
    new_sess = F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60 * 1_000_000), 1).otherwise(0)
    sess = (
        ev.withColumn(
            "session_id",
            F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
        )
        .groupBy("user_id", "session_id")
        .agg(F.min("tus").alias("st"), F.max("tus").alias("en"))
    )
    seg = sess.select(
        F.explode(F.expr(f"sequence(st DIV {DAY_US}, en DIV {DAY_US})")).alias("day_i"),
        "st", "en",
    )
    # one pass, not a union of two projections over `seg`: the union
    # formulation re-executes everything above the sessionize exchange
    # (sort + two windows + session aggregate + day explode) once PER
    # BRANCH — exchange reuse shares only the shuffle, not the operators
    # above it. Emitting both boundary rows as a 2-element struct array
    # and exploding keeps the identical rows (same t/delta values) while
    # running the sessionize segment once.
    b = seg.select(
        "day_i",
        F.explode(F.array(
            F.struct(
                F.greatest(F.col("st"), F.col("day_i") * DAY_US).alias("t"),
                F.lit(1).alias("delta"),
            ),
            F.struct(
                (F.least(F.col("en"), F.col("day_i") * DAY_US + (DAY_US - 1)) + 1).alias("t"),
                F.lit(-1).alias("delta"),
            ),
        )).alias("_b"),
    ).select("day_i", F.col("_b.t").alias("t"), F.col("_b.delta").alias("delta"))
    sweep = Window.partitionBy("day_i").orderBy(
        F.col("t").asc(), F.col("delta").desc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    return (
        b.withColumn("run", F.sum("delta").over(sweep))
        .groupBy("day_i")
        .agg(
            F.max("run").cast("long").alias("max_concurrent"),
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).alias("n_segments"),
        )
        .select(
            (F.col("day_i") * 86400).alias("day_s"), "max_concurrent", "n_segments"
        )
        .orderBy("day_s")
    )


SESSION_CONCURRENCY_SQL = f"""
WITH g AS (
    SELECT user_id, event_id, epoch_us(ts) AS tus,
           epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
    FROM events
),
s AS (
    SELECT user_id, tus,
           CAST(sum(CASE WHEN gap IS NULL OR gap > {SESSION_GAP_MIN * 60 * 1_000_000} THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY tus, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
    FROM g
),
sess AS (
    SELECT user_id, session_id, min(tus) AS st, max(tus) AS en
    FROM s GROUP BY user_id, session_id
),
seg AS (
    SELECT unnest(range(st // {DAY_US}, en // {DAY_US} + 1)) AS day_i, st, en
    FROM sess
),
b AS (
    SELECT day_i, greatest(st, day_i * {DAY_US}) AS t, 1 AS delta FROM seg
    UNION ALL
    SELECT day_i, least(en, day_i * {DAY_US} + {DAY_US - 1}) + 1 AS t, -1 AS delta FROM seg
),
r AS (
    SELECT day_i, delta,
           sum(delta) OVER (PARTITION BY day_i ORDER BY t, delta DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
    FROM b
)
SELECT CAST(day_i * 86400 AS BIGINT) AS day_s,
       CAST(max(run) AS BIGINT) AS max_concurrent,
       CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_segments
FROM r GROUP BY day_i
ORDER BY day_s
"""


# ================= round 8: quality-vs-duplication diagnostic =================


def quality_vs_dup_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does low-quality text duplicate more? Near-dup incidence per
    stopword-ratio decile — the cross-family corpus diagnostic behind
    "dedup before or after quality filtering" decisions (template spam
    is usually both low-quality AND highly duplicated; if the high-dup
    mass sits in the low-quality buckets, the quality filter does most
    of the dedup work for free).

    Buckets are FIXED-WIDTH on the (already cross-engine-exact rounded)
    ratio — floor(ratio*10) — never NTILE: quantile bucketing needs a
    global sort; fixed-width is embarrassingly parallel and
    deterministic. Dup membership is the verified jaccard pair table's
    distinct doc set (one semi-ish left join on doc_id).

    Scale: rides the existing quality and LSH+verification sub-DAGs;
    the bucket rollup is map-side combinable."""
    from tickdatapipeline_spark.operators.dedup import jaccard_pairs
    from tickdatapipeline_spark.operators.text import quality_score

    docs = _docs(spark, sf_dir)
    q = quality_score(docs).select(
        "doc_id",
        F.floor(F.col("stopword_ratio") * 10).cast("long").alias("bucket"),
    )
    pairs = jaccard_pairs(docs, JACCARD_THRESHOLD, max_band_bucket=None)
    dup = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("_dup", F.lit(1))
    )
    return (
        q.join(dup, "doc_id", "left")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("_dup").alias("n_with_dup"),
        )
        .withColumn(
            "dup_rate",
            rnd(F.col("n_with_dup").cast("double") / F.col("n_docs").cast("double"), 6),
        )
        .orderBy("bucket")
    )


QUALITY_VS_DUP_SQL = f"""
WITH p AS ({JACCARD_SQL}),
dup AS (
    SELECT DISTINCT doc_id FROM (
        SELECT doc_a AS doc_id FROM p UNION ALL SELECT doc_b AS doc_id FROM p
    )
),
q AS (
    SELECT doc_id, CAST(floor(stopword_ratio * 10) AS BIGINT) AS bucket
    FROM ({QUALITY_SQL})
)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(dup.doc_id) AS BIGINT) AS n_with_dup,
       {sql_rnd("CAST(count(dup.doc_id) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS dup_rate
FROM q LEFT JOIN dup ON q.doc_id = dup.doc_id
GROUP BY bucket
ORDER BY bucket
"""


# ================= round 8: cross-source length drift (two-sample KS) ========


def length_ks_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the document-
    length distributions of every source pair — the "is source X
    sampled from the same regime as source Y" drift check, the docs
    twin of events_value_ks_drift (which tests each batch against one
    reference CDF).

    Exactness: D = max |F1 - F2| over pooled values is computed as the
    INTEGER max of |c1*n2 - c2*n1| (cumulative counts cross-multiplied)
    with ONE final division — no float CDFs accumulate.

    Scale: lengths reduce to (source, n_chars, cnt) first; the pair
    grid is O(sources^2) (sources = domains, inherently bounded) and
    each pair's sweep is a window over its pooled distinct lengths —
    partitioned by pair, never global."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    lengths = (
        docs.select("source", F.length("text").cast("long").alias("x"))
        .groupBy("source", "x")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = lengths.groupBy("source").agg(F.sum("cnt").alias("n"))
    s1 = totals.select(F.col("source").alias("s1"), F.col("n").alias("n1"))
    s2 = totals.select(F.col("source").alias("s2"), F.col("n").alias("n2"))
    grid = s1.join(s2, F.col("s1") < F.col("s2"))
    pooled = grid.join(
        lengths,
        (F.col("source") == F.col("s1")) | (F.col("source") == F.col("s2")),
    ).select(
        "s1", "s2", "n1", "n2", "x",
        F.when(F.col("source") == F.col("s1"), F.col("cnt")).otherwise(F.lit(0)).alias("c1"),
        F.when(F.col("source") == F.col("s2"), F.col("cnt")).otherwise(F.lit(0)).alias("c2"),
    ).groupBy("s1", "s2", "n1", "n2", "x").agg(
        F.sum("c1").alias("c1"), F.sum("c2").alias("c2")
    )
    w = Window.partitionBy("s1", "s2").orderBy("x").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sweep = pooled.select(
        "s1", "s2", "n1", "n2",
        F.abs(
            F.sum("c1").over(w) * F.col("n2") - F.sum("c2").over(w) * F.col("n1")
        ).alias("d_num"),
    )
    return (
        sweep.groupBy("s1", "s2", "n1", "n2")
        .agg(F.max("d_num").alias("ks_num"))
        .select(
            "s1", "s2", "n1", "n2", "ks_num",
            rnd(
                F.col("ks_num").cast("double")
                / (F.col("n1") * F.col("n2")).cast("double"),
                6,
            ).alias("ks"),
        )
        .orderBy("s1", "s2")
    )


LENGTH_KS_SQL = f"""
WITH lengths AS (
    SELECT source, CAST(length(text) AS BIGINT) AS x,
           CAST(count(*) AS BIGINT) AS cnt
    FROM documents GROUP BY source, length(text)
),
totals AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n FROM lengths GROUP BY source),
grid AS (
    SELECT a.source AS s1, b.source AS s2, a.n AS n1, b.n AS n2
    FROM totals a JOIN totals b ON a.source < b.source
),
pooled AS (
    SELECT s1, s2, n1, n2, x,
           CAST(sum(CASE WHEN source = s1 THEN cnt ELSE 0 END) AS BIGINT) AS c1,
           CAST(sum(CASE WHEN source = s2 THEN cnt ELSE 0 END) AS BIGINT) AS c2
    FROM grid JOIN lengths ON source = s1 OR source = s2
    GROUP BY s1, s2, n1, n2, x
),
sweep AS (
    SELECT s1, s2, n1, n2,
           abs(sum(c1) OVER w * n2 - sum(c2) OVER w * n1) AS d_num
    FROM pooled
    WINDOW w AS (PARTITION BY s1, s2 ORDER BY x
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT s1, s2, n1, n2, CAST(max(d_num) AS BIGINT) AS ks_num,
       {sql_rnd("CAST(max(d_num) AS DOUBLE) / CAST(n1 * n2 AS DOUBLE)")} AS ks
FROM sweep GROUP BY s1, s2, n1, n2
ORDER BY s1, s2
"""


# ================= round 8: irregular -> regular resampling =================

RESAMPLE_STEP_US = 21_600 * 1_000_000  # 6-hour grid


def value_resample_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample the irregular per-type value series onto a regular
    6-hour grid with linear interpolation between the bracketing
    events — THE tick-data primitive for aligning asynchronous streams
    (the reference's world is already regular by construction; real
    market/telemetry data is not). Grid points after the last event
    hold the last value (the pipeline's hold-last convention); points
    before the first event are null.

    One union + two windows, no join: events and grid points interleave
    in a single per-type ordered frame; a backward pass carries the
    last real (value, time) via last(ignorenulls), a forward pass the
    next via first(ignorenulls), and events sort BEFORE the grid point
    at an equal timestamp (tie key is_grid) so an exact-time event is
    its own sample (fraction 0). Interpolation is v1 + (v2-v1) * dt
    ratio — three IEEE ops on identical operands, then rounded.

    Scale: windows partition by event_type; the grid is O(span/step)
    broadcast-sized; no global sort anywhere."""
    from pyspark.sql import Window

    ev = read_events(spark, sf_dir).select(
        "event_type",
        F.expr("ts DIV 1000").alias("tus"),
        "event_id",
        "value",
        F.lit(0).alias("is_grid"),
    )
    bounds = ev.agg(
        F.expr(f"min(tus) DIV {RESAMPLE_STEP_US}").alias("lo_i"),
        F.expr(f"max(tus) DIV {RESAMPLE_STEP_US}").alias("hi_i"),
    )
    grid = (
        ev.select("event_type").distinct()
        .join(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.expr("sequence(lo_i, hi_i)")).alias("grid_i"),
        )
        .select(
            "event_type",
            (F.col("grid_i") * RESAMPLE_STEP_US).alias("tus"),
            F.lit(0).cast("long").alias("event_id"),
            F.lit(None).cast("double").alias("value"),
            F.lit(1).alias("is_grid"),
        )
    )
    u = ev.unionByName(grid)
    order = [F.col("tus"), F.col("is_grid"), F.col("event_id")]
    wb = Window.partitionBy("event_type").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wf = Window.partitionBy("event_type").orderBy(*order).rowsBetween(
        0, Window.unboundedFollowing
    )
    ann = u.select(
        "event_type", "tus", "is_grid",
        F.last("value", ignorenulls=True).over(wb).alias("pv"),
        F.last(F.when(F.col("value").isNotNull(), F.col("tus")), True).over(wb).alias("pt"),
        F.first("value", ignorenulls=True).over(wf).alias("nv"),
        F.first(F.when(F.col("value").isNotNull(), F.col("tus")), True).over(wf).alias("nt"),
    ).where(F.col("is_grid") == 1)
    frac = (F.col("tus") - F.col("pt")).cast("double") / (
        F.col("nt") - F.col("pt")
    ).cast("double")
    v = (
        F.when(F.col("pv").isNull(), F.lit(None).cast("double"))
        .when(F.col("nv").isNull() | (F.col("nt") == F.col("pt")), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    )
    return ann.select(
        "event_type",
        F.expr(f"tus DIV 1000000").alias("grid_s"),
        rnd(v, 6).alias("v_interp"),
    ).orderBy("event_type", "grid_s")


VALUE_RESAMPLE_SQL = f"""
WITH ev AS (
    SELECT event_type, epoch_us(ts) AS tus, event_id, value, 0 AS is_grid
    FROM events
),
bounds AS (
    SELECT min(tus) // {RESAMPLE_STEP_US} AS lo_i,
           max(tus) // {RESAMPLE_STEP_US} AS hi_i
    FROM ev
),
grid AS (
    SELECT t.event_type, g.i * {RESAMPLE_STEP_US} AS tus,
           CAST(0 AS BIGINT) AS event_id, CAST(NULL AS DOUBLE) AS value,
           1 AS is_grid
    FROM (SELECT DISTINCT event_type FROM ev) t,
         (SELECT unnest(range(lo_i, hi_i + 1)) AS i FROM bounds) g
),
u AS (SELECT * FROM ev UNION ALL SELECT * FROM grid),
ann AS (
    SELECT event_type, tus, is_grid,
           last_value(value IGNORE NULLS) OVER wb AS pv,
           last_value(CASE WHEN value IS NOT NULL THEN tus END IGNORE NULLS) OVER wb AS pt,
           first_value(value IGNORE NULLS) OVER wf AS nv,
           first_value(CASE WHEN value IS NOT NULL THEN tus END IGNORE NULLS) OVER wf AS nt
    FROM u
    WINDOW wb AS (PARTITION BY event_type ORDER BY tus, is_grid, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wf AS (PARTITION BY event_type ORDER BY tus, is_grid, event_id
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, tus // 1000000 AS grid_s,
       {sql_rnd("CASE WHEN pv IS NULL THEN NULL WHEN nv IS NULL OR nt = pt THEN pv ELSE pv + (nv - pv) * (CAST(tus - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE)) END")} AS v_interp
FROM ann WHERE is_grid = 1
ORDER BY event_type, grid_s
"""


# ================= round 8: cross-correlation at signed lags =================

CCF_MAX_LAG = 3


def hourly_ccf_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag detection between two event-type series: Pearson r of
    (views at hour t, clicks at hour t+L) for signed lags -3..+3 — the
    missing member of the correlation family (events_rolling_corr is
    same-time windowed, events_hourly_acf is self-lag). The argmax lag
    answers "does X lead Y, and by how much" — the alignment question
    behind cross-stream signal engineering.

    Exactness and scale exactly as events_hourly_acf: integer five-sums
    over the gap-filled O(hours) grid, two exact sqrt()s and one
    division at the end; the lag pairing is an equi-join on hour + L,
    O(hours x lags) rows, no windows over the raw stream — including
    the family's in-plan int64-budget raise_error guard on n_pairs
    (_corr_budget_guard: re-bin above ~100 K hours x 10^9-count
    hours, never a silent overflow)."""
    ev = read_events(spark, sf_dir).select(
        F.expr("(ts DIV 1000000000 DIV 3600) * 3600").alias("hour_s"),
        "event_type",
    ).where(F.col("event_type").isin(CORR_X_TYPE, CORR_Y_TYPE))
    hourly = ev.groupBy("hour_s").agg(
        F.sum(F.when(F.col("event_type") == CORR_X_TYPE, 1).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("event_type") == CORR_Y_TYPE, 1).otherwise(0)).alias("y"),
    )
    bounds = ev.agg(F.min("hour_s").alias("lo"), F.max("hour_s").alias("hi"))
    grid = bounds.select(
        F.explode(F.expr("sequence(lo, hi, 3600)")).alias("hour_s")
    )
    g = grid.join(hourly, "hour_s", "left").select(
        "hour_s",
        F.coalesce(F.col("x"), F.lit(0)).alias("x"),
        F.coalesce(F.col("y"), F.lit(0)).alias("y"),
    )
    from tickdatapipeline_spark.operators.globalorder import pin

    g = pin(g)  # both sides of every signed-lag join
    lags = list(range(-CCF_MAX_LAG, CCF_MAX_LAG + 1))
    xl = g.select(
        "hour_s", "x",
        F.explode(F.array(*[F.lit(lag) for lag in lags])).alias("lag_h"),
    )
    yl = g.select(F.col("hour_s").alias("hs"), F.col("y"))
    pairs = xl.join(yl, F.col("hs") == F.col("hour_s") + F.col("lag_h") * 3600)
    sums = pairs.groupBy("lag_h").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    ccf = F.when(
        (vx > 0) & (vy > 0),
        rnd(num / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))), 6),
    )
    return sums.select(
        F.col("lag_h").cast("long").alias("lag_h"),
        _corr_budget_guard("events_hourly_ccf").alias("n_pairs"),
        ccf.alias("ccf"),
    ).orderBy("lag_h")


HOURLY_CCF_SQL = f"""
WITH e AS (
    SELECT (epoch_us(ts) // 1000000 // 3600) * 3600 AS hour_s, event_type
    FROM events WHERE event_type IN ('{CORR_X_TYPE}', '{CORR_Y_TYPE}')
),
hourly AS (
    SELECT hour_s,
           CAST(sum(CASE WHEN event_type = '{CORR_X_TYPE}' THEN 1 ELSE 0 END) AS BIGINT) AS x,
           CAST(sum(CASE WHEN event_type = '{CORR_Y_TYPE}' THEN 1 ELSE 0 END) AS BIGINT) AS y
    FROM e GROUP BY hour_s
),
bounds AS (SELECT min(hour_s) AS lo, max(hour_s) AS hi FROM e),
g AS (
    SELECT h.hour_s, coalesce(x, 0) AS x, coalesce(y, 0) AS y
    FROM (SELECT unnest(range(lo, hi + 3600, 3600)) AS hour_s FROM bounds) h
    LEFT JOIN hourly USING (hour_s)
),
pairs AS (
    SELECT lag_h, a.x AS x, b.y AS y
    FROM (SELECT *, unnest({list(range(-CCF_MAX_LAG, CCF_MAX_LAG + 1))}) AS lag_h FROM g) a
    JOIN g b ON b.hour_s = a.hour_s + lag_h * 3600
),
sums AS (
    SELECT CAST(lag_h AS BIGINT) AS lag_h,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x * y) AS BIGINT) AS sxy,
           CAST(sum(x * x) AS BIGINT) AS sxx,
           CAST(sum(y * y) AS BIGINT) AS syy
    FROM pairs GROUP BY lag_h
)
SELECT lag_h, n AS n_pairs,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN {sql_rnd("CAST(n * sxy - sx * sy AS DOUBLE) / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))")}
       END AS ccf
FROM sums
ORDER BY lag_h
"""


# ============ consolidated registry panels (r10, rotation budget) ============
# The rotation-budget policy (COVERAGE.md) pays for registry growth by
# folding near-duplicate diagnostics. These two panels UNION the exact
# per-variant plans their predecessors gated individually — every row,
# value, and dtype of the old entries survives, labeled by family/
# variant, so coverage is unchanged while the gated count drops by 7.

_ANN_VARIANT_PLANS = (
    ("ivf", ann_topk_ivf),
    ("ivf_kmeans", ann_topk_ivf_kmeans),
    ("lsh", ann_topk_lsh),
    ("pq", ann_topk_pq),
    ("sq8", ann_topk_sq8),
    # r10: the production composite — IVF cells + product-quantized
    # RESIDUALS, ADC scoring (similarity.ann_topk_ivfpq); joins the
    # panel as a sixth variant, zero new registry slots
    ("ivfpq", ann_topk_ivfpq),
    # r11 (r10 verdict #5): exact re-rank — PQ top-R candidates
    # re-scored with the raw vectors (similarity.ann_rerank), the
    # two-stage retrieval a production PQ index runs; joins the panel
    # as a seventh variant, zero new registry slots
    ("pq_rerank",
     lambda emb, k, qm: ann_rerank(ann_topk_pq(emb, RERANK_R, qm), emb, k)),
    # r13: ADC — raw queries against the reconstructed corpus (the
    # deployment scoring; queries cost no storage and carry no
    # quantization error); eighth variant, zero new registry slots
    ("pq_adc", ann_topk_pq_adc),
    # r13: the composed deployment recipe — ADC candidates + exact
    # re-rank (measured 0.905 recall@5 at sf0.1, PERF.md r13); ninth
    # variant, zero new registry slots
    ("adc_rerank",
     lambda emb, k, qm: ann_rerank(
         ann_topk_pq_adc(emb, RERANK_R, qm), emb, k)),
)

# Candidate depth of the exact re-rank stage (R > k = TOPK_K). Set
# from the r12 sf0.1 R-sweep (scripts_dev/rerank_sweep.py, 2000
# vectors / 40 queries): recall@5 monotone in R at flat wall cost, and
# exact work stays O(queries x R) id-joins at any corpus size, so
# R = 10k is cheap insurance (FAISS refine practice). Re-measured r13
# under the trained 16x32 codebooks (PERF.md r13): raw pq 0.28,
# rerank-50 0.735 (r12's untrained 4x8 shape capped at 0.140).
RERANK_R = 50


def _pq_rerank_sql(r: int, k: int) -> str:
    """DuckDB twin of ann_rerank over the PQ candidate stage: the PQ
    oracle at k=R, then exact-cosine re-scoring of exactly those pairs
    (same _cos algebra as the brute-force oracle) and a fresh top-k."""
    return f"""
WITH cand AS (SELECT query_id, neighbor_id FROM ({_pq_topk_sql(k=r)})),
base AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, {SQL_VEC} AS v FROM embeddings),
scored AS (
    SELECT c.query_id, c.neighbor_id, {_cos} AS cosine
    FROM cand c
    JOIN base q ON q.vec_id = c.query_id
    JOIN base b ON b.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, rank, cosine FROM (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
    FROM scored
) WHERE rank <= {k}
"""


def _adc_rerank_sql(r: int, k: int) -> str:
    """DuckDB twin of ann_rerank over the ADC candidate stage — the
    composed deployment recipe (trained codebooks + asymmetric
    candidate scoring + exact re-rank)."""
    return f"""
WITH cand AS (SELECT query_id, neighbor_id FROM ({_pq_adc_topk_sql(k=r)})),
base AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, {SQL_VEC} AS v FROM embeddings),
scored AS (
    SELECT c.query_id, c.neighbor_id, {_cos} AS cosine
    FROM cand c
    JOIN base q ON q.vec_id = c.query_id
    JOIN base b ON b.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, rank, cosine FROM (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
    FROM scored
) WHERE rank <= {k}
"""


def ann_topk_variants_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All nine approximate top-k paths (IVF flat, IVF k-means-
    trained, LSH-bucketed, PQ, SQ8, IVF-PQ, PQ+exact-rerank, PQ-ADC,
    ADC+exact-rerank — the composed deployment recipe)
    as ONE labeled result — the
    consolidated registry entry replacing five per-variant entries
    (IVF-PQ joined the panel directly, never holding its own slot; same
    (query_id, neighbor_id, rank, cosine) contract, one ``variant``
    column). Each variant keeps its own plan shape and scale contract;
    the union is plan-level concatenation, no cross-variant shuffle."""
    emb = _emb(spark, sf_dir)
    out = None
    for name, fn in _ANN_VARIANT_PLANS:
        part = fn(emb, TOPK_K, QUERY_MOD).select(
            F.lit(name).alias("variant"),
            "query_id", "neighbor_id", "rank", "cosine",
        )
        out = part if out is None else out.unionByName(part)
    return out


def _ann_topk_variants_sql() -> str:
    """DuckDB twin of ann_topk_variants_fn: the nine oracle plans
    wrapped and unioned under the same variant labels."""
    plans = (
        ("ivf", IVF_SQL.format(query_mod=QUERY_MOD, k=TOPK_K)),
        ("ivf_kmeans", ivf_kmeans_sql(QUERY_MOD, TOPK_K)),
        ("lsh", ANN_TOPK_LSH_SQL),
        ("pq", _pq_topk_sql()),
        ("sq8", _sq8_topk_sql()),
        ("ivfpq", _ivfpq_topk_sql()),
        ("pq_rerank", _pq_rerank_sql(RERANK_R, TOPK_K)),
        ("pq_adc", _pq_adc_topk_sql()),
        ("adc_rerank", _adc_rerank_sql(RERANK_R, TOPK_K)),
    )
    return "\nUNION ALL\n".join(
        f"SELECT '{name}' AS variant, query_id, neighbor_id, rank, cosine"
        f" FROM ({sql})"
        for name, sql in plans
    )


def embedding_eval_panel_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space evaluation panel: the four sim_* calibration
    diagnostics (prefix-16 truncation recall, kNN label accuracy, IVF
    MRR, pairwise-cosine histogram) folded into one long-format table —
    (family, metric_key, n_a, n_b, value) — the consolidated registry
    entry replacing four single-diagnostic entries. Every original
    column survives relabeled: recall rows carry (query_id, n_exact,
    n_hit, recall); knn rows (true_label, n_queries, n_correct,
    accuracy); the mrr row (0, n_queries, 0, mrr); histogram rows
    (bin_id, n_pairs, 0, bin_lo). All counts stay BIGINT, all values
    the same rounded doubles the predecessors gated."""
    emb = _emb(spark, sf_dir)
    recall = ann_recall(
        cosine_topk_truncated(emb, MRL_DIM, TOPK_K, QUERY_MOD),
        cosine_topk(emb, TOPK_K, QUERY_MOD),
    )
    parts = [
        recall.select(
            F.lit("recall_prefix16").alias("family"),
            F.col("query_id").alias("metric_key"),
            F.col("n_exact").alias("n_a"), F.col("n_hit").alias("n_b"),
            F.col("recall").alias("value"),
        ),
        knn_label_accuracy_fn(spark, sf_dir).select(
            F.lit("knn_label_accuracy").alias("family"),
            F.col("true_label").alias("metric_key"),
            F.col("n_queries").alias("n_a"), F.col("n_correct").alias("n_b"),
            F.col("accuracy").alias("value"),
        ),
        ann_mrr_fn(spark, sf_dir).select(
            F.lit("mrr_ivf").alias("family"),
            F.lit(0).cast("long").alias("metric_key"),
            F.col("n_queries").alias("n_a"),
            F.lit(0).cast("long").alias("n_b"),
            F.col("mrr").alias("value"),
        ),
        cosine_histogram_fn(spark, sf_dir).select(
            F.lit("cosine_histogram").alias("family"),
            F.col("bin_id").alias("metric_key"),
            F.col("n_pairs").alias("n_a"),
            F.lit(0).cast("long").alias("n_b"),
            F.col("bin_lo").alias("value"),
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _embedding_eval_panel_sql() -> str:
    """DuckDB twin of embedding_eval_panel_fn: the four existing
    oracle plans wrapped into the shared long format."""
    recall = _ann_recall_sql(MRL_TOPK_SQL)
    return f"""
SELECT 'recall_prefix16' AS family, query_id AS metric_key,
       n_exact AS n_a, n_hit AS n_b, recall AS value
FROM ({recall})
UNION ALL
SELECT 'knn_label_accuracy', true_label, n_queries, n_correct, accuracy
FROM ({KNN_LABEL_SQL})
UNION ALL
SELECT 'mrr_ivf', CAST(0 AS BIGINT), n_queries, CAST(0 AS BIGINT), mrr
FROM ({ANN_MRR_SQL})
UNION ALL
SELECT 'cosine_histogram', bin_id, n_pairs, CAST(0 AS BIGINT), bin_lo
FROM ({COS_HIST_SQL})
"""


# ================= round-10 additions =================


def ngram_repetition_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document n-gram repetition per source — the Gopher-style
    "duplicate n-gram fraction" quality signal (Rae et al. 2021,
    §A1.1.3): heavily templated / boilerplate text repeats its own
    2- and 3-grams far above natural prose, and a source whose pooled
    duplicate fraction spikes needs a repetition filter before
    training. Complements the CROSS-doc dedup family (this is the
    within-doc axis the near-dup pass cannot see).

    Exactness: per doc, dup_n = total n-grams - distinct n-grams (both
    integer list lengths); pooled per source as BIGINT sums with
    integer-permille ratios (DIV both engines — never a float sum).

    Scale: entirely map-side per document (token array -> gram array ->
    two lengths) followed by ONE map-side-combinable groupBy(source);
    no explode, no join. The docs scan is fanned out first — a
    single-file toy table arrives as ONE partition and the gram pass
    (the whole cost) would run on one core (measured: 24 s -> ~2 s at
    sf0.1); at corpus scale the scan has thousands of splits and
    fan_out no-ops."""
    from tickdatapipeline_spark.functions.scale import fan_out

    docs = fan_out(_docs(spark, sf_dir))
    t = tokens(F.col("text"))

    def grams(n: int):
        return F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(t, (i + k).cast("int")) for k in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    per_doc = docs.select(
        "source",
        F.size(grams(2)).cast("long").alias("n2"),
        F.size(F.array_distinct(grams(2))).cast("long").alias("d2"),
        F.size(grams(3)).cast("long").alias("n3"),
        F.size(F.array_distinct(grams(3))).cast("long").alias("d3"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n2").alias("n_2grams"),
            F.sum(F.col("n2") - F.col("d2")).alias("dup_2grams"),
            F.sum("n3").alias("n_3grams"),
            F.sum(F.col("n3") - F.col("d3")).alias("dup_3grams"),
        )
        .select(
            "source", "n_docs", "n_2grams", "dup_2grams",
            F.when(F.col("n_2grams") > 0,
                   F.expr("dup_2grams * 1000 DIV n_2grams")).alias("dup2_permille"),
            "n_3grams", "dup_3grams",
            F.when(F.col("n_3grams") > 0,
                   F.expr("dup_3grams * 1000 DIV n_3grams")).alias("dup3_permille"),
        )
        .orderBy("source")
    )


NGRAM_REPETITION_SQL = f"""
WITH per_doc AS (
    SELECT source,
           len(g2) AS n2, len(list_distinct(g2)) AS d2,
           len(g3) AS n3, len(list_distinct(g3)) AS d3
    FROM (
        SELECT source,
               CASE WHEN len(t) >= 2
                    THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
                    ELSE CAST([] AS VARCHAR[]) END AS g2,
               CASE WHEN len(t) >= 3
                    THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                    ELSE CAST([] AS VARCHAR[]) END AS g3
        FROM (SELECT source, {SQL_TOKENS} AS t FROM documents)
    )
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n2) AS BIGINT) AS n_2grams,
       CAST(sum(n2 - d2) AS BIGINT) AS dup_2grams,
       CASE WHEN sum(n2) > 0
            THEN CAST(sum(n2 - d2) * 1000 // sum(n2) AS BIGINT) END AS dup2_permille,
       CAST(sum(n3) AS BIGINT) AS n_3grams,
       CAST(sum(n3 - d3) AS BIGINT) AS dup_3grams,
       CASE WHEN sum(n3) > 0
            THEN CAST(sum(n3 - d3) * 1000 // sum(n3) AS BIGINT) END AS dup3_permille
FROM per_doc GROUP BY source ORDER BY source
"""


def seasonal_profile_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality profile per event type: each (type,
    hod) slot's event count and its deviation from the type's flat
    baseline — the input a cadence-aware anomaly monitor needs BEFORE
    trusting a threshold (the ACF says a period exists; this says
    which hours carry the mass). dev_permyriad = share*24*10000-10000,
    so 0 = exactly the flat 1/24 share, +10000 = double it.

    Exactness: counts are BIGINT; the deviation is one integer DIV
    against the per-type total (identical floor semantics both
    engines). int64 headroom: n_events*240000 caps at ~1.9e13 events
    per (type, hod) slot — re-bin long before that.

    Scale: one map-side-combinable groupBy(type, hod) over the events
    scan (24 x types rows out), a broadcast-sized per-type total
    joined back, final sort on 24 x types rows."""
    from tickdatapipeline_spark.operators.globalorder import pin

    ev = read_events(spark, sf_dir).select(
        F.expr("(ts DIV 1000000000 DIV 3600) % 24").alias("hod"), "event_type"
    )
    # pinned: the 24 x types aggregate feeds both its own output and
    # the per-type totals — without the pin the events scan runs twice
    per = pin(ev.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).alias("n_events")))
    tot = per.groupBy("event_type").agg(F.sum("n_events").alias("total"))
    return (
        per.join(F.broadcast(tot), "event_type")
        .select(
            "event_type", F.col("hod").cast("long").alias("hod"), "n_events",
            F.expr("n_events * 240000 DIV total - 10000").alias("dev_permyriad"),
        )
        .orderBy("event_type", "hod")
    )


SEASONAL_PROFILE_SQL = """
WITH e AS (
    SELECT (epoch_us(ts) // 1000000 // 3600) % 24 AS hod, event_type FROM events
),
per AS (
    SELECT event_type, hod, CAST(count(*) AS BIGINT) AS n_events
    FROM e GROUP BY 1, 2
),
tot AS (SELECT event_type, CAST(sum(n_events) AS BIGINT) AS total FROM per GROUP BY 1)
SELECT p.event_type, CAST(hod AS BIGINT) AS hod, n_events,
       CAST(n_events * 240000 // total - 10000 AS BIGINT) AS dev_permyriad
FROM per p JOIN tot USING (event_type)
ORDER BY event_type, hod
"""


def type_affinity_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-occurrence lift: for every type pair, how much
    more often do users do BOTH than independence predicts —
    lift = (n_both * n_users) / (n_a * n_b). The product/funnel
    diagnostic next to events_funnel (that one assumes an order; this
    finds which pairs travel together at all, and a lift collapse is
    an instrumentation or mix-shift alarm).

    Exactness: all four counts are exact BIGINTs; lift crosses the
    oracle as ONE rounded double expression over double-cast counts
    (double *, / are correctly-rounded IEEE on identical operands —
    the integer products could overflow int64 at 1e9-user scale, the
    doubles cannot).

    Scale: the user-type incidence distincts map-side to O(users x
    types) rows; the self-join fans each user to C(k,2) pairs with k
    bounded by the type alphabet (NOT the event count); per-type
    totals and the 1-row user count broadcast back over the
    O(types^2) result."""
    # NULL user_id rows (tolerated elsewhere as anonymous traffic;
    # events_heavy_hitters filters them the same way) must not count:
    # they would inflate per-type totals while count_distinct and the
    # equi-join exclude them -- deflating every lift identically in
    # both engines, where the parity gate cannot see it
    ev = read_events(spark, sf_dir).where(
        F.col("user_id").isNotNull()).select("user_id", "event_type")
    from tickdatapipeline_spark.operators.globalorder import pin

    ut = pin(ev.distinct())  # both sides of the pair join + both rollups
    per_type = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    nu = ut.agg(F.count_distinct("user_id").alias("n_users"))
    both = (
        ut.alias("a")
        .join(ut.alias("b"),
              (F.col("a.user_id") == F.col("b.user_id"))
              & (F.col("a.event_type") < F.col("b.event_type")))
        .groupBy(F.col("a.event_type").alias("type_a"),
                 F.col("b.event_type").alias("type_b"))
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    lift = rnd(
        (F.col("n_both").cast("double") * F.col("n_users").cast("double"))
        / (F.col("n_a").cast("double") * F.col("n_b").cast("double")), 6)
    return (
        both.join(F.broadcast(per_type.select(F.col("event_type").alias("type_a"),
                                              F.col("n_t").alias("n_a"))), "type_a")
        .join(F.broadcast(per_type.select(F.col("event_type").alias("type_b"),
                                          F.col("n_t").alias("n_b"))), "type_b")
        .join(F.broadcast(nu))
        .select("type_a", "type_b", "n_both", "n_a", "n_b", "n_users",
                lift.alias("lift"))
        .orderBy("type_a", "type_b")
    )


TYPE_AFFINITY_SQL = f"""
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events WHERE user_id IS NOT NULL),
per_type AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_t FROM ut GROUP BY 1),
nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM ut),
co AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_both
    FROM ut a JOIN ut b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
)
SELECT type_a, type_b, n_both, pa.n_t AS n_a, pb.n_t AS n_b, n_users,
       {sql_rnd("CAST(n_both AS DOUBLE) * CAST(n_users AS DOUBLE) / (CAST(pa.n_t AS DOUBLE) * CAST(pb.n_t AS DOUBLE))")} AS lift
FROM co
JOIN per_type pa ON co.type_a = pa.event_type
JOIN per_type pb ON co.type_b = pb.event_type
CROSS JOIN nu
ORDER BY type_a, type_b
"""


def media_phash_clusters_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual duplicate CLUSTERS: connected components over the
    phash near-dup pair graph — completes the media dedup ladder
    (exact sha -> feature-LSH pairs -> phash pairs -> clusters), the
    same pairs->components step the text corpus takes via
    duplicate_clusters (a re-encode CHAIN A~B~C collapses to one
    cluster even when A and C sit beyond max_hamming of each other).
    Output: (media_id, cluster_id, cluster_size, is_representative)
    for every payload appearing in a pair; cluster_id = min media_id.

    Scale: rides phash_near_duplicates' banded join (never all-pairs)
    and connected_components' pointer-jumping rounds (O(log diameter)
    label propagation over the pair edges only)."""
    pairs = phash_near_duplicates(
        perceptual_fingerprints(synth_media_from_documents(_docs(spark, sf_dir))),
        max_hamming=PHASH_MAX_HAMMING,
    )
    return connected_components(pairs, "media_a", "media_b", id_col="media_id")


MEDIA_PHASH_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs AS MATERIALIZED (
    SELECT media_a, media_b FROM ({MEDIA_DEDUP_PHASH_SQL})
),
edges AS MATERIALIZED (
    SELECT media_a AS node, media_b AS nbr FROM pairs
    UNION ALL
    SELECT media_b AS node, media_a AS nbr FROM pairs
),
reach(node, label) AS (
    SELECT DISTINCT node, node FROM edges
    UNION
    SELECT e.node, r.label FROM edges e JOIN reach r ON r.node = e.nbr
),
comp AS (SELECT node, min(label) AS cluster_id FROM reach GROUP BY node),
csizes AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id)
SELECT c.node AS media_id, c.cluster_id,
       CAST(s.cluster_size AS BIGINT) AS cluster_size,
       CAST(CASE WHEN c.node = c.cluster_id THEN 1 ELSE 0 END AS BIGINT) AS is_representative
FROM comp c JOIN csizes s USING (cluster_id)
"""


SEASONAL_ANOM_THRESH_PM = 500  # flag hours >= ±50% off their hod mean


def seasonal_anomalies_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-ADJUSTED count anomalies: hours whose event count
    sits >= ±50% off their own (type, hour-of-day) baseline over the
    gap-filled grid — the detector events_seasonal_profile calibrates
    (a 3 a.m. spike is invisible to a global threshold when 3 p.m. is
    10x busier; comparing each hour to ITS OWN slot's mean removes the
    diurnal term the way the robust-MAD detector removes scale).

    Exactness: with s = the hod's total and n = its slot count, the
    relative deviation (x - s/n) / (s/n) equals (x*n - s)/s, so
    rel_abs_permille = |x*n - s| * 1000 DIV s is exact BIGINT algebra
    with ONE non-negative integer DIV (negative DIV floors in DuckDB
    but truncates in Spark — the abs keeps both engines on the same
    semantics; the direction travels separately as ±1). s > 0 for
    every emitted row (s = 0 forces x = 0: the slot's total includes
    the hour itself). Headroom: x*n caps int64 at ~4e9 events/hour
    over 2.4e9 slots — re-bin long before that.

    Scale: the same O(hours x types) gap-filled grid as
    events_hourly_acf (grid join, never a window over raw events),
    one broadcast of the 24 x types baseline, map-side flag filter."""
    ev = read_events(spark, sf_dir).select(
        F.expr("(ts DIV 1000000000 DIV 3600) * 3600").alias("hour_s"),
        "event_type",
    )
    hourly = ev.groupBy("event_type", "hour_s").agg(F.count(F.lit(1)).alias("n"))
    bounds = ev.agg(F.min("hour_s").alias("lo"), F.max("hour_s").alias("hi"))
    grid = (
        ev.select("event_type").distinct()
        .join(F.broadcast(bounds))
        .select("event_type",
                F.explode(F.expr("sequence(lo, hi, 3600)")).alias("hour_s"))
    )
    from tickdatapipeline_spark.operators.globalorder import pin

    g = pin(grid.join(hourly, ["event_type", "hour_s"], "left").select(
        "event_type", "hour_s",
        F.coalesce(F.col("n"), F.lit(0)).alias("x"),
        F.expr("(hour_s DIV 3600) % 24").alias("hod"),
    ))  # feeds both the baseline and the flag scan
    base = g.groupBy("event_type", "hod").agg(
        F.sum("x").alias("s"), F.count(F.lit(1)).alias("n_slots"))
    dev = F.col("x") * F.col("n_slots") - F.col("s")
    return (
        g.join(F.broadcast(base), ["event_type", "hod"])
        .where(F.col("s") > 0)
        .select(
            "event_type", "hour_s", F.col("hod").cast("long").alias("hod"),
            F.col("x").alias("n_events"),
            F.col("s").alias("hod_total"), F.col("n_slots").alias("hod_slots"),
            F.expr(f"abs(x * n_slots - s) * 1000 DIV s").alias("rel_abs_permille"),
            F.when(dev >= 0, F.lit(1)).otherwise(F.lit(-1))
            .cast("long").alias("direction"),
        )
        .where(F.col("rel_abs_permille") >= SEASONAL_ANOM_THRESH_PM)
        .orderBy("event_type", "hour_s")
    )


SEASONAL_ANOM_SQL = f"""
WITH e AS (
    SELECT (epoch_us(ts) // 1000000 // 3600) * 3600 AS hour_s, event_type
    FROM events
),
hourly AS (
    SELECT event_type, hour_s, CAST(count(*) AS BIGINT) AS n
    FROM e GROUP BY 1, 2
),
bounds AS (SELECT min(hour_s) AS lo, max(hour_s) AS hi FROM e),
grid AS (
    SELECT t.event_type, h.hour_s
    FROM (SELECT DISTINCT event_type FROM e) t,
         (SELECT unnest(range(lo, hi + 3600, 3600)) AS hour_s FROM bounds) h
),
g AS (
    SELECT grid.event_type, grid.hour_s, coalesce(hourly.n, 0) AS x,
           (grid.hour_s // 3600) % 24 AS hod
    FROM grid LEFT JOIN hourly
      ON grid.event_type = hourly.event_type AND grid.hour_s = hourly.hour_s
),
base AS (
    SELECT event_type, hod, CAST(sum(x) AS BIGINT) AS s,
           CAST(count(*) AS BIGINT) AS n_slots
    FROM g GROUP BY 1, 2
)
SELECT g.event_type, CAST(g.hour_s AS BIGINT) AS hour_s,
       CAST(g.hod AS BIGINT) AS hod, CAST(x AS BIGINT) AS n_events,
       s AS hod_total, n_slots AS hod_slots,
       CAST(abs(x * n_slots - s) * 1000 // s AS BIGINT) AS rel_abs_permille,
       CAST(CASE WHEN x * n_slots - s >= 0 THEN 1 ELSE -1 END AS BIGINT) AS direction
FROM g JOIN base ON g.event_type = base.event_type AND g.hod = base.hod
WHERE s > 0 AND abs(x * n_slots - s) * 1000 // s >= {SEASONAL_ANOM_THRESH_PM}
ORDER BY g.event_type, g.hour_s
"""


def _ivfpq_topk_sql(query_mod: int = QUERY_MOD, k: int = TOPK_K,
                    n_cells: int = 8, nprobe: int = 2,
                    n_sub: "int | None" = None,
                    k_codes: "int | None" = None) -> str:
    """DuckDB twin of similarity.ann_topk_ivfpq: the IVF assignment
    CTEs (IVF_SQL's pattern), elementwise residuals, the PQ
    codebook/argmin chain on residuals — codebooks k-means-TRAINED on
    the residual subvectors (_pq_train_ctes, same rounded fixed-order
    L2 as _pq_topk_sql) — reconstruction centroid + residual code,
    then ADC cosine within probed cells."""
    from tickdatapipeline_spark.operators.similarity import (
        PQ_ITERS, PQ_K, PQ_M)

    from tickdatapipeline_spark.operators.similarity import (
        TRAIN_SAMPLE_TARGET)

    n_sub = PQ_M if n_sub is None else n_sub
    k_codes = PQ_K if k_codes is None else k_codes
    sub = DIM // n_sub
    sim = sql_cos("b.v", "c")
    d2 = _pq_d2_sql(sub)
    target = max(100 * k_codes, TRAIN_SAMPLE_TARGET)
    train_ctes, cb_final = _pq_train_ctes("subt", n_sub, k_codes, sub,
                                          PQ_ITERS, prefix="r")
    train_block = ",\n".join(train_ctes)
    qcos = sql_cos("q.q", "recon.v")
    return f"""
WITH base AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, {SQL_VEC} AS v FROM embeddings),
cents AS (SELECT vec_id AS cell, v AS c FROM base WHERE vec_id < {n_cells}),
cscored AS (
    SELECT b.vec_id, b.v, cell, {sim} AS sim
    FROM base b CROSS JOIN cents
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS crank
    FROM cscored
),
assigned AS (SELECT vec_id, cell FROM ranked WHERE crank = 1),
probes AS (SELECT vec_id, cell AS probe_cell FROM ranked WHERE crank <= {nprobe}),
resid AS (
    SELECT a.vec_id, a.cell,
           list_transform(range(1, {DIM + 1}), i -> b.v[i] - ct.c[i]) AS r
    FROM assigned a
    JOIN base b ON a.vec_id = b.vec_id
    JOIN cents ct ON a.cell = ct.cell
),
sub AS (
    SELECT vec_id, m, list_transform(range(1, {sub + 1}), i -> r[m * {sub} + i]) AS s
    FROM resid, (SELECT unnest(range(0, {n_sub})) AS m) ms
),
smod AS (SELECT greatest(1, count(*) // {target}) AS sm FROM resid),
subt AS (SELECT sub.* FROM sub WHERE vec_id % (SELECT sm FROM smod) = 0),
{train_block},
pqscored AS (
    SELECT t.vec_id, t.m, cb.code, cb.c, {d2} AS d2
    FROM sub t JOIN {cb_final} cb ON t.m = cb.m
),
win AS (
    SELECT vec_id, m, c FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, code) AS rn
        FROM pqscored
    ) WHERE rn = 1
),
pqr AS (SELECT vec_id, flatten(list(c ORDER BY m)) AS pr FROM win GROUP BY vec_id),
recon AS (
    SELECT r.vec_id, r.cell,
           list_transform(range(1, {DIM + 1}), i -> p.pr[i] + ct.c[i]) AS v
    FROM pqr p JOIN resid r ON p.vec_id = r.vec_id JOIN cents ct ON r.cell = ct.cell
),
q AS (
    SELECT p.vec_id AS query_id, b.v AS q, p.probe_cell
    FROM probes p JOIN base b ON p.vec_id = b.vec_id
    WHERE p.vec_id % {query_mod} = 0
),
scored AS (
    SELECT q.query_id, recon.vec_id AS neighbor_id, {qcos} AS cosine
    FROM recon JOIN q ON recon.cell = q.probe_cell AND recon.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, rank, cosine FROM (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
    FROM scored
) WHERE rank <= {k}
"""


# ===== round-10 additions (cont.): heavy hitters / PageRank / LM bits =====

HH_K = 130  # heavy hitter = key with count > n_total/(K+1)


def heavy_hitters_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact user-id heavy hitters via the two-pass Misra-Gries sketch
    (operators/sketches.py): per-partition bounded-memory candidate
    summaries (no shuffle, <= K counters each), then an exact
    broadcast-semi-joined recount of candidates only, filtered against
    the exact total — names the keys the Gini diagnostic
    (events_key_skew) only sizes.

    Exact despite the sketch: the candidate union provably contains
    every key with global count > n/(K+1) (a globally heavy key is
    locally heavy somewhere), and the final filter compares EXACT
    recounts to the EXACT total, so false candidates drop out and the
    output is partitioning-independent.

    Scale: this is the 1e10-distinct-keys formulation — the full
    groupBy(key) count table (a 1e10-row shuffle) is never built; the
    shuffle is only over the candidate-restricted recount (<= K keys
    per partition, broadcast back)."""
    from tickdatapipeline_spark.operators.sketches import exact_heavy_hitters

    return exact_heavy_hitters(
        read_events(spark, sf_dir).select("user_id"), "user_id", HH_K
    )


HEAVY_HITTERS_SQL = f"""
WITH keyed AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
tot AS (SELECT count(*) AS n_total FROM keyed)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) * 1000000 // t.n_total AS BIGINT) AS share_ppm
FROM keyed CROSS JOIN tot t
GROUP BY user_id, t.n_total
HAVING count(*) * ({HH_K} + 1) > t.n_total
ORDER BY user_id
"""


PAGERANK_SCALE = 10**12
PAGERANK_ITERS = 5


def pagerank_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the LSH candidate graph — the centrality readout
    that ranks which documents sit at the CORE of a near-dup
    neighborhood (template hubs, mirrored shards) vs. its fringe;
    complements the triangle census (local density) and connected
    components (membership) with global importance. Damping 0.85,
    {PAGERANK_ITERS} fixed power iterations over the symmetrized
    candidate edges.

    Exactness: all arithmetic is scaled-integer (Q12 decimal: ranks
    sum to ~1e12): r'(v) = tele + (85 * sum_u(r(u) DIV deg(u))) DIV
    100 with tele = 15*SCALE DIV (100*N). Every operand is
    non-negative, so Spark's truncating DIV and DuckDB's flooring //
    agree, and integer sums are order-independent — the plan is
    bit-reproducible cross-engine with NO float in the loop (floats
    would diverge: each engine sums partial contributions in a
    different order). The oracle unrolls the same recurrence as
    {PAGERANK_ITERS} chained CTEs.

    Scale: per iteration one equi-join (ranks on edge src) + one
    map-side-combinable groupBy(dst) — the canonical distributed
    power iteration. The edge and degree tables materialize ONCE
    (localCheckpoint DISK_ONLY) and each iteration's rank frame
    checkpoints the same way — the connected_components posture:
    truncated lineage keeps iteration i's plan O(1) deep instead of
    re-deriving the LSH join i times (measured 28.7 s -> ~6 s at
    sf0.01). In a symmetric graph every node has deg >= 1 — no
    dangling-mass term. Loop lives in
    operators/dedup.pagerank_scores (unit-tested against a naive
    Python mirror of the same integer recurrence)."""
    from tickdatapipeline_spark.operators.dedup import pagerank_scores

    pairs = lsh_candidate_pairs(_docs(spark, sf_dir), max_band_bucket=None)
    return (
        pagerank_scores(pairs, "doc_a", "doc_b",
                        iters=PAGERANK_ITERS, scale=PAGERANK_SCALE)
        .withColumnRenamed("node", "doc_id")
        .orderBy("doc_id")
    )


def _pagerank_sql() -> str:
    its = []
    prev = "base"
    for i in range(1, PAGERANK_ITERS + 1):
        its.append(
            f"""it{i} AS (
    SELECT b.node, b.deg, b.tele,
           b.tele + ((85 * COALESCE(c.s, 0)) // 100) AS r
    FROM base b LEFT JOIN (
        SELECT e.dst AS node, SUM(x.r // x.deg) AS s
        FROM edges e JOIN {prev} x ON x.node = e.src
        GROUP BY e.dst
    ) c ON c.node = b.node
)"""
        )
        prev = f"it{i}"
    chain = ",\n".join(its)
    return f"""
WITH {MINHASH_CTE},
{_LSH_CAND_CTE},
edges AS MATERIALIZED (
    SELECT doc_a AS src, doc_b AS dst FROM cand
    UNION ALL
    SELECT doc_b AS src, doc_a AS dst FROM cand
),
deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
base AS MATERIALIZED (
    SELECT d.node, d.deg,
           CAST({PAGERANK_SCALE} AS BIGINT) // n.n_nodes AS r,
           (15 * CAST({PAGERANK_SCALE} AS BIGINT)) // (100 * n.n_nodes) AS tele
    FROM deg d CROSS JOIN (SELECT count(*) AS n_nodes FROM deg) n
),
{chain}
SELECT CAST(node AS BIGINT) AS doc_id,
       CAST(deg AS BIGINT) AS degree,
       CAST(r AS BIGINT) AS pagerank_e12
FROM {prev}
ORDER BY doc_id
"""


def lm_surprisal_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document corpus-bigram-LM surprisal — the CCNet-style
    quality axis (Wenzek et al. 2020 score documents by LM perplexity:
    text whose word transitions are IMPROBABLE under a corpus LM is
    noise/gibberish; text far too probable is boilerplate). The LM here
    is the corpus's own bigram table; the score is an integer-bit
    surrogate for -log2 P(doc): per bigram occurrence,
    bits = bitlen(n(w1 *)) - bitlen(n(w1 w2)) — within 1 bit of the
    true log2(n_ctx/n_bg) per gram, monotone in it, and EXACT integer
    algebra in both engines (bitlen = length of the base-2 digit
    string: conv() in Spark, bin() in DuckDB), where a float log2
    would be a cross-engine transcendental gamble. Ranking quality
    needs the order statistic, not calibrated nats.

    Scale: gram positions explode map-side; the bigram and context
    count tables are map-side-combinable groupBys; the per-doc join is
    against the doc's DISTINCT grams (multiplicity m carried, bits
    weighted by m) — join rows are O(distinct grams per doc), not
    positions. Hot-gram join skew is inherent corpus shape; AQE's
    skew-join split handles it (DEPLOYMENT.md playbook)."""
    from tickdatapipeline_spark.functions.scale import fan_out

    docs = fan_out(_docs(spark, sf_dir))
    t = tokens(F.col("text"))
    g2 = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(t, i.cast("int")),
                F.element_at(t, (i + 1).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    from tickdatapipeline_spark.operators.globalorder import pin

    pos = pin(docs.select("doc_id", F.explode(g2).alias("gram")))
    doc_gram = pos.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("m"))
    bgc = pos.groupBy("gram").agg(F.count(F.lit(1)).alias("n_bg"))
    ctx = (
        pos.select(F.expr("split_part(gram, ' ', 1)").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("n_ctx"))
    )
    bits = (
        F.length(F.conv(F.col("n_ctx").cast("string"), 10, 2))
        - F.length(F.conv(F.col("n_bg").cast("string"), 10, 2))
    ).cast("long")
    j = (
        doc_gram.join(bgc, "gram")
        .withColumn("w1", F.expr("split_part(gram, ' ', 1)"))
        .join(ctx, "w1")
        .select("doc_id", "m", bits.alias("bits"))
    )
    return (
        j.groupBy("doc_id")
        .agg(
            F.sum("m").alias("n_bigrams"),
            F.sum(F.col("m") * F.col("bits")).alias("total_bits"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "total_bits",
            F.expr("(total_bits * 1000) DIV n_bigrams").alias("bits_permille"),
        )
        .orderBy("doc_id")
    )


LM_SURPRISAL_SQL = f"""
WITH tok AS (SELECT doc_id, {SQL_TOKENS} AS t FROM documents),
pos AS MATERIALIZED (
    SELECT doc_id, unnest(
        CASE WHEN len(t) >= 2
             THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
             ELSE CAST([] AS VARCHAR[]) END) AS gram
    FROM tok
),
dg AS (SELECT doc_id, gram, count(*) AS m FROM pos GROUP BY doc_id, gram),
bgc AS (SELECT gram, count(*) AS n_bg FROM pos GROUP BY gram),
ctx AS (SELECT split_part(gram, ' ', 1) AS w1, count(*) AS n_ctx
        FROM pos GROUP BY 1),
j AS (
    SELECT d.doc_id, d.m,
           CAST(length(bin(c.n_ctx)) - length(bin(b.n_bg)) AS BIGINT) AS bits
    FROM dg d
    JOIN bgc b USING (gram)
    JOIN ctx c ON c.w1 = split_part(d.gram, ' ', 1)
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(sum(m) AS BIGINT) AS n_bigrams,
       CAST(sum(m * bits) AS BIGINT) AS total_bits,
       CAST((sum(m * bits) * 1000) // sum(m) AS BIGINT) AS bits_permille
FROM j
GROUP BY doc_id
ORDER BY doc_id
"""


def type_hod_rollup_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level OLAP ROLLUP over (event_type, hour-of-day): per-cell,
    per-type, and grand-total aggregates in ONE pass — the cube-style
    dashboard query every OLAP engine serves, exercised here because
    Spark's partial aggregation computes all rollup levels map-side in
    a single Expand+shuffle (explain shows one Expand node, not three
    scans) and the gate proves the GROUPING() semantics line up with
    ANSI (DuckDB) exactly.

    Exactness: counts and cent-sums are BIGINT; grouping flags travel
    as explicit g_type/g_hod BIGINT columns (each engine's packed
    grouping_id bit order is its own business — per-column GROUPING()
    is the portable form). Aggregated-level label columns are
    sentinel-coalesced ('<all>'/-1; the fixture's event_type is
    non-null, asserted upstream by read_events' contract).

    Scale: ROLLUP multiplies shuffle rows by levels (3x here) but all
    levels partial-aggregate map-side; cardinality after the shuffle
    is O(types x 24 + types + 1)."""
    ev = read_events(spark, sf_dir)
    vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    base = ev.select(
        "event_type",
        F.expr("(ts DIV 1000000000 DIV 3600) % 24").alias("hod"),
        vc.alias("vc"),
    )
    return (
        base.rollup("event_type", "hod")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("vc").alias("sum_vc"),
            F.grouping("event_type").cast("long").alias("g_type"),
            F.grouping("hod").cast("long").alias("g_hod"),
        )
        .select(
            F.coalesce("event_type", F.lit("<all>")).alias("event_type"),
            F.coalesce("hod", F.lit(-1)).alias("hod"),
            "g_type",
            "g_hod",
            "n_events",
            "sum_vc",
        )
        .orderBy("g_type", "g_hod", "event_type", "hod")
    )


TYPE_HOD_ROLLUP_SQL = """
WITH base AS (
    SELECT event_type,
           (epoch_us(ts) // 1000000 // 3600) % 24 AS hod,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
    FROM events
)
SELECT COALESCE(event_type, '<all>') AS event_type,
       COALESCE(hod, -1) AS hod,
       CAST(GROUPING(event_type) AS BIGINT) AS g_type,
       CAST(GROUPING(hod) AS BIGINT) AS g_hod,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(vc) AS BIGINT) AS sum_vc
FROM base
GROUP BY ROLLUP (event_type, hod)
ORDER BY g_type, g_hod, event_type, hod
"""


# ================= round 10: Count-Min sketch audit =================

CM_DEPTH = 3  # hash lanes
CM_WIDTH = 64  # buckets per lane
CM_PROBE_K = 10  # heaviest keys probed against the sketch


def count_min_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch point-frequency audit (Cormode & Muthukrishnan
    2005): build the D x W sketch over per-user event counts in ONE
    combinable pass, then probe the corpus's true heaviest users
    against it and report estimate vs exact — the audited-sketch
    pattern of events_distinct_kmv, for FREQUENCY instead of distinct
    count. Complements the Misra-Gries candidates (events_heavy_hitters
    names the heavy keys; CM answers point queries about ANY key in
    O(D) from O(D*W) state) — together the two mergeable-summary
    halves of a frequency monitor.

    Exactness: bucket_j(u) = h60('cm<j>:' || u) % W — the same
    md5-backed 60-bit draw both engines share; sketch cells and
    estimates are BIGINT counts; est = min over lanes. The CM
    guarantee est >= exact holds by construction (every lane's cell
    contains the key's full count plus non-negative collision mass) —
    `overest` is the audited error, never negative (pinned in
    tests/test_properties.py).

    Scale: the lane explode is map-side (3 rows per event) and the
    sketch aggregate partial-combines into at most D*W = 192 cells per
    partition before the shuffle — sketch state is O(D*W) regardless
    of key cardinality, the entire point; probes broadcast the
    192-cell sketch. The exact top-k side exists only because this is
    an AUDIT (TakeOrderedAndProject, never a rank window); deployments
    answer from the sketch alone."""
    ev = read_events(spark, sf_dir).select(F.col("user_id").cast("string").alias("uid"))
    lanes = F.array(*[
        F.struct(
            F.lit(j).cast("long").alias("lane"),
            (h60(F.concat(F.lit(f"cm{j}:"), F.col("uid"))) % CM_WIDTH).alias("bucket"),
        )
        for j in range(CM_DEPTH)
    ])
    cells = (
        ev.select(F.explode(lanes).alias("lb"))
        .groupBy(F.col("lb.lane").alias("lane"), F.col("lb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cell_cnt"))
    )
    top = (
        ev.groupBy("uid")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), F.col("uid"))
        .limit(CM_PROBE_K)
    )
    probes = top.select(
        "uid", "exact_cnt", F.explode(lanes.alias("lb")).alias("lb")
    ).select("uid", "exact_cnt", F.col("lb.lane").alias("lane"), F.col("lb.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(cells), ["lane", "bucket"])
        .groupBy("uid", "exact_cnt")
        .agg(F.min("cell_cnt").alias("cm_est"))
        .select(
            F.col("uid").cast("long").alias("user_id"),
            "exact_cnt",
            "cm_est",
            (F.col("cm_est") - F.col("exact_cnt")).alias("overest"),
        )
        .orderBy(F.col("exact_cnt").desc(), "user_id")
    )


def _count_min_sql() -> str:
    lane_buckets = " UNION ALL ".join(
        "SELECT {j} AS lane, {h} % {w} AS bucket, uid FROM ev".format(
            j=j, w=CM_WIDTH, h=sql_h60("'cm{}:' || uid".format(j)))
        for j in range(CM_DEPTH)
    )
    return f"""
WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS uid FROM events),
lb AS ({lane_buckets}),
cells AS (
    SELECT lane, bucket, CAST(count(*) AS BIGINT) AS cell_cnt
    FROM lb GROUP BY lane, bucket
),
top AS (
    SELECT uid, CAST(count(*) AS BIGINT) AS exact_cnt
    FROM ev GROUP BY uid
    ORDER BY exact_cnt DESC, uid LIMIT {CM_PROBE_K}
),
probes AS (
    SELECT DISTINCT t.uid, t.exact_cnt, l.lane, l.bucket
    FROM top t JOIN lb l ON t.uid = l.uid
)
SELECT CAST(p.uid AS BIGINT) AS user_id, p.exact_cnt,
       CAST(min(c.cell_cnt) AS BIGINT) AS cm_est,
       CAST(min(c.cell_cnt) - p.exact_cnt AS BIGINT) AS overest
FROM probes p JOIN cells c ON p.lane = c.lane AND p.bucket = c.bucket
GROUP BY p.uid, p.exact_cnt
ORDER BY p.exact_cnt DESC, user_id
"""


# ================= round 10: Zipf doubling-ratio tail profile ==========

ZIPF_RANKS = [1, 2, 4, 8, 16, 32, 64]  # f(r)/f(2r) probed at powers of 2


def zipf_doubling_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf tail-exponent profile via DOUBLING RATIOS: for ranks r in
    powers of two, report f(r)/f(2r) — under a Zipf law f(r) ~ r^-s
    the ratio is the constant 2^s, so a flat ratio column IS the
    power-law diagnostic and its level estimates s, with no log-log
    regression (float log is the measured cross-engine hard-NO — the
    doubling-ratio reformulation is the sanctioned integer route; the
    OLS machinery stays for genuinely linear series). Complements the
    existing rank-frequency profile (text.py) with the scale-free
    check a tokenizer/corpus audit actually wants.

    Exactness: frequencies are BIGINT counts; the ratio crosses the
    oracle as integer per-mille f(r)*1000 DIV f(2r) — no float at
    all. Ranks are row_number over (count DESC, token ASC), tie-
    deterministic on both engines.

    Scale: the vocabulary never globally sorts — the top-128 ranks
    come off a TakeOrderedAndProject (per-partition partial top-k),
    and the rank window + self-join run over those <=128 rows."""
    from tickdatapipeline_spark.operators.text import tokens
    from tickdatapipeline_spark.functions.scale import fan_out

    top_n = 2 * ZIPF_RANKS[-1]
    tok = fan_out(_docs(spark, sf_dir)).select(
        F.explode(tokens(F.col("text"))).alias("token"))
    top = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token"))
        .limit(top_n)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("freq").desc(), F.col("token"))  # <=128 rows
    ranked = top.select(
        F.row_number().over(w).cast("long").alias("rank"), "freq")
    r = ranked.where(F.col("rank").isin(ZIPF_RANKS)).alias("r")
    r2 = ranked.alias("r2")
    return (
        r.join(r2, F.col("r2.rank") == F.col("r.rank") * 2)
        .select(
            F.col("r.rank").alias("rank"),
            F.col("r.freq").alias("freq_r"),
            F.col("r2.freq").alias("freq_2r"),
            F.expr("r.freq * 1000 DIV r2.freq").alias("doubling_pm"),
        )
        .orderBy("rank")
    )


ZIPF_DOUBLING_SQL = f"""
WITH freqs AS (
    SELECT token, CAST(count(*) AS BIGINT) AS freq
    FROM (SELECT unnest({SQL_TOKENS}) AS token FROM documents)
    GROUP BY token
    ORDER BY freq DESC, token
    LIMIT {2 * ZIPF_RANKS[-1]}
),
ranked AS (
    SELECT CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT) AS rank, freq
    FROM freqs
)
SELECT r.rank AS rank, r.freq AS freq_r, r2.freq AS freq_2r,
       r.freq * 1000 // r2.freq AS doubling_pm
FROM ranked r JOIN ranked r2 ON r2.rank = r.rank * 2
WHERE r.rank IN ({", ".join(str(x) for x in ZIPF_RANKS)})
ORDER BY rank
"""


# ---- cross-document duplicated-span coverage (Lee et al. 2022) ----

DUP_SPAN_N = 5  # span gram width (tokens); = NGRAM_N, the dedup family's width


def dup_span_coverage_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-SPAN coverage pooled per source — how
    much of each source's token mass sits inside a 5-gram shared with
    at least one other document (the exact-substring-dedup statistic of
    Lee et al. 2022; see operators/text.dup_span_coverage for the full
    contract). Completes the dedup diagnostics triangle: MinHash/LSH
    answers "which DOCS are near-dups", docs_ngram_repetition answers
    "how much does a doc repeat ITSELF", this answers "how much of the
    corpus is cross-doc duplicated TEXT even when no doc pair clears
    the near-dup threshold"."""
    from tickdatapipeline_spark.operators.text import dup_span_coverage

    return dup_span_coverage(_docs(spark, sf_dir), DUP_SPAN_N)


DUP_SPAN_COVERAGE_SQL = f"""
WITH toks AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source, {SQL_TOKENS} AS t
    FROM documents
),
pos AS (
    SELECT doc_id, i - 1 AS start, i - 1 + {DUP_SPAN_N - 1} AS fin,
           {sql_h60(f"array_to_string(t[i:i+{DUP_SPAN_N - 1}], ' ')")} AS gh
    FROM (
        SELECT doc_id, t,
               unnest(CASE WHEN len(t) >= {DUP_SPAN_N}
                      THEN range(1, len(t) - {DUP_SPAN_N - 2}) ELSE [] END) AS i
        FROM toks
    )
),
dup AS (
    SELECT gh FROM (SELECT DISTINCT gh, doc_id FROM pos)
    GROUP BY gh HAVING count(*) >= 2
),
kept AS (SELECT pos.* FROM pos JOIN dup USING (gh)),
isl AS (
    SELECT doc_id, start, fin,
           CASE WHEN max(fin) OVER w_prev IS NULL
                  OR start > max(fin) OVER w_prev THEN 1 ELSE 0 END AS new_isl
    FROM kept
    WINDOW w_prev AS (PARTITION BY doc_id ORDER BY start
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
isl2 AS (
    SELECT doc_id, start, fin,
           sum(new_isl) OVER (PARTITION BY doc_id ORDER BY start
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
    FROM isl
),
doc_cov AS (
    SELECT doc_id, CAST(sum(c) AS BIGINT) AS covered
    FROM (SELECT doc_id, island, max(fin) - min(start) + 1 AS c
          FROM isl2 GROUP BY doc_id, island)
    GROUP BY doc_id
),
totals AS (SELECT doc_id, source, CAST(len(t) AS BIGINT) AS n_tok FROM toks)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE covered > 0) AS BIGINT) AS docs_with_dup,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       CAST(sum(covered) AS BIGINT) AS covered_tokens,
       CASE WHEN sum(n_tok) > 0
            THEN CAST(sum(covered) * 1000 // sum(n_tok) AS BIGINT)
       END AS coverage_permille
FROM (
    SELECT totals.source, coalesce(doc_cov.covered, 0) AS covered, totals.n_tok
    FROM totals LEFT JOIN doc_cov ON totals.doc_id = doc_cov.doc_id
)
GROUP BY source ORDER BY source
"""


# ---- label-propagation communities over the candidate graph ----

LPA_ITERS = 4


def lpa_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection over the LSH candidate graph — the fourth
    rung of the graph-diagnostics ladder (components = membership,
    triangles = local density, PageRank = centrality, THIS = which
    densely-linked template families live inside a blob): synchronous
    deterministic label propagation, LPA_ITERS fixed rounds,
    most-frequent-neighbor-label updates with min-label ties — all
    integer counting, bit-reproducible cross-engine (see
    operators/dedup.lpa_communities). A single accidental band
    collision bridging two real template families merges them in
    connected components but NOT here (the bridge contributes one
    vote; each family's internal edges contribute many).

    Scale: per round one equi-join + one combinable groupBy + a
    node-partitioned rank window over O(degree) rows; edges and each
    round's labels localCheckpoint DISK_ONLY (the pagerank posture).
    The oracle unrolls the same rounds as chained CTEs."""
    from tickdatapipeline_spark.operators.dedup import lpa_communities

    pairs = lsh_candidate_pairs(_docs(spark, sf_dir), max_band_bucket=None)
    return (
        lpa_communities(pairs, "doc_a", "doc_b", iters=LPA_ITERS)
        .withColumnRenamed("node", "doc_id")
        .orderBy("doc_id")
    )


def _lpa_sql() -> str:
    its = []
    prev = "l0"
    for i in range(1, LPA_ITERS + 1):
        its.append(
            f"""l{i} AS MATERIALIZED (
    SELECT node, label FROM (
        SELECT e.dst AS node, x.label, count(*) AS c,
               row_number() OVER (PARTITION BY e.dst
                                  ORDER BY count(*) DESC, x.label) AS rk
        FROM edges e JOIN {prev} x ON x.node = e.src
        GROUP BY e.dst, x.label
    ) WHERE rk = 1
)"""
        )
        prev = f"l{i}"
    chain = ",\n".join(its)
    return f"""
WITH {MINHASH_CTE},
{_LSH_CAND_CTE},
edges AS MATERIALIZED (
    SELECT doc_a AS src, doc_b AS dst FROM cand
    UNION ALL
    SELECT doc_b AS src, doc_a AS dst FROM cand
),
l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
{chain}
SELECT CAST(node AS BIGINT) AS doc_id, CAST(label AS BIGINT) AS community
FROM {prev}
ORDER BY doc_id
"""


# ========== r11 consolidations (rotation-budget policy, r10 verdict #4) =====
#
# Same contract as the r10 folds (ann_topk_variants / eval panel): each
# fold is a plan-level labeled union of the ORIGINAL entries' plans —
# every row, value and dtype survives (relabeled where the originals'
# score columns differed), one registry slot instead of several. The
# member fns/SQL stay defined and individually tested; only the
# registry slots consolidate. Registry diff + rationale: COVERAGE.md.


def ann_recall_variants_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of every approximate ANN path (IVF, PQ, PQ+rerank,
    PQ-ADC, LSH) against the same brute-force ground truth, as ONE
    labeled union — the consolidated slot replacing
    sim_ann_recall_{ivf,pq,lsh}. Same (query_id, n_exact, n_hit,
    recall) contract per variant."""
    emb = _emb(spark, sf_dir)
    variants = (
        ("ivf", lambda e: ann_topk_ivf(e, TOPK_K, QUERY_MOD)),
        ("pq", lambda e: ann_topk_pq(e, TOPK_K, QUERY_MOD)),
        # r11 (verdict #5): the rerank stage's measured recall uplift
        # sits right next to raw PQ's number
        ("pq_rerank", lambda e: ann_rerank(
            ann_topk_pq(e, RERANK_R, QUERY_MOD), e, TOPK_K)),
        # r13: ADC's recall uplift measured right next to symmetric PQ
        ("pq_adc", lambda e: ann_topk_pq_adc(e, TOPK_K, QUERY_MOD)),
        # r13: the composed recipe's recall (0.905 at sf0.1) gated too
        ("adc_rerank", lambda e: ann_rerank(
            ann_topk_pq_adc(e, RERANK_R, QUERY_MOD), e, TOPK_K)),
        ("lsh", lambda e: ann_topk_lsh(e, TOPK_K, QUERY_MOD)),
    )
    out = None
    for name, fn in variants:
        part = ann_recall(
            fn(emb), cosine_topk(emb, TOPK_K, QUERY_MOD)
        ).select(F.lit(name).alias("variant"),
                 "query_id", "n_exact", "n_hit", "recall")
        out = part if out is None else out.unionByName(part)
    return out


def _ann_recall_variants_sql() -> str:
    plans = (
        ("ivf", _ann_recall_ivf_sql()),
        ("pq", _ann_recall_sql(_pq_topk_sql())),
        ("pq_rerank", _ann_recall_sql(_pq_rerank_sql(RERANK_R, TOPK_K))),
        ("pq_adc", _ann_recall_sql(_pq_adc_topk_sql())),
        ("adc_rerank", _ann_recall_sql(_adc_rerank_sql(RERANK_R, TOPK_K))),
        ("lsh", _ann_recall_sql(ANN_TOPK_LSH_SQL)),
    )
    return "\nUNION ALL\n".join(
        f"SELECT '{n}' AS variant, query_id, n_exact, n_hit, recall"
        f" FROM ({s})" for n, s in plans)


def seasonal_anomaly_panel_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both seasonal detectors as one superset-schema panel — the
    consolidated slot replacing the near-twin events_seasonal_anomaly
    (top-k VALUE-sum deviation per type) and events_seasonal_anomalies
    (gap-filled COUNT anomalies >= the permille threshold). Columns
    belonging to the other detector are typed NULLs."""
    nl = lambda: F.lit(None).cast("long")  # noqa: E731
    nd = lambda: F.lit(None).cast("double")  # noqa: E731
    a = seasonal_anomaly_fn(spark, sf_dir).select(
        F.lit("topk_value").alias("detector"),
        "event_type", "hour_s", F.col("hod").cast("long").alias("hod"),
        "rnk", "hour_value", "stat", "n_hod", "baseline_mean",
        nl().alias("n_events"), nl().alias("hod_total"),
        nl().alias("hod_slots"), nl().alias("rel_abs_permille"),
        nl().alias("direction"))
    b = seasonal_anomalies_fn(spark, sf_dir).select(
        F.lit("count_permille").alias("detector"),
        "event_type", "hour_s", "hod",
        nl().alias("rnk"), nd().alias("hour_value"), nl().alias("stat"),
        nl().alias("n_hod"), nd().alias("baseline_mean"),
        "n_events", "hod_total", "hod_slots", "rel_abs_permille",
        "direction")
    return a.unionByName(b)


def _seasonal_anomaly_panel_sql() -> str:
    return f"""
SELECT 'topk_value' AS detector, event_type,
       CAST(hour_s AS BIGINT) AS hour_s, CAST(hod AS BIGINT) AS hod,
       rnk, hour_value, stat, n_hod, baseline_mean,
       CAST(NULL AS BIGINT) AS n_events, CAST(NULL AS BIGINT) AS hod_total,
       CAST(NULL AS BIGINT) AS hod_slots,
       CAST(NULL AS BIGINT) AS rel_abs_permille,
       CAST(NULL AS BIGINT) AS direction
FROM ({SEASONAL_ANOMALY_SQL})
UNION ALL
SELECT 'count_permille', event_type, hour_s, hod,
       CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT),
       CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
       n_events, hod_total, hod_slots, rel_abs_permille, direction
FROM ({SEASONAL_ANOM_SQL})
"""


def media_dedup_pair_variants_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both media near-dup PAIR detectors (feature-cosine SRP-LSH and
    perceptual-phash Hamming banding) as one labeled union — the
    consolidated slot replacing media_dedup_features and
    media_dedup_phash. The byte-exact manifest (media_dedup_exact)
    keeps its own slot: different output shape (groups, not pairs)."""
    a = media_dedup_features_fn(spark, sf_dir).select(
        F.lit("features").alias("variant"), "media_a", "media_b",
        "cosine", F.lit(None).cast("long").alias("hamming"))
    b = media_dedup_phash_fn(spark, sf_dir).select(
        F.lit("phash").alias("variant"), "media_a", "media_b",
        F.lit(None).cast("double").alias("cosine"), "hamming")
    return a.unionByName(b)


def _media_dedup_pair_variants_sql() -> str:
    return f"""
SELECT 'features' AS variant, media_a, media_b, cosine,
       CAST(NULL AS BIGINT) AS hamming
FROM ({MEDIA_DEDUP_FEATURES_SQL})
UNION ALL
SELECT 'phash', media_a, media_b, CAST(NULL AS DOUBLE), hamming
FROM ({MEDIA_DEDUP_PHASH_SQL})
"""


def value_anomaly_variants_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both per-type value anomaly detectors (z-score top-N and
    robust-MAD top-N) as one labeled union — the consolidated slot
    replacing events_value_anomalies and events_value_robust_anomalies;
    each arm keeps its own top-N semantics, scores relabel to one
    ``score`` column."""
    a = value_anomalies_fn(spark, sf_dir).select(
        F.lit("zscore").alias("detector"), "event_id", "event_type",
        F.col("z").alias("score"))
    b = robust_anomalies_fn(spark, sf_dir).select(
        F.lit("robust_mad").alias("detector"), "event_id", "event_type",
        F.col("robust_z").alias("score"))
    return a.unionByName(b)


def _value_anomaly_variants_sql() -> str:
    return f"""
SELECT 'zscore' AS detector, event_id, event_type, z AS score
FROM ({VALUE_ANOMALIES_SQL})
UNION ALL
SELECT 'robust_mad', event_id, event_type, robust_z
FROM ({ROBUST_ANOM_SQL})
"""


def dedup_pair_measures_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three LSH-verified pair MEASURES (symmetric Jaccard,
    asymmetric containment, IDF-weighted Jaccard) as one long-format
    union — the consolidated slot replacing dedup_jaccard_pairs,
    dedup_containment_pairs and dedup_weighted_jaccard. Relabeling:
    (inter, denom, score) = (inter_count, union_count, jaccard) /
    (inter_count, min_count, containment) / (inter_w, union_w,
    wjaccard)."""
    docs = _docs(spark, sf_dir)
    a = jaccard_pairs(docs, JACCARD_THRESHOLD, max_band_bucket=None).select(
        F.lit("jaccard").alias("measure"), "doc_a", "doc_b",
        F.col("inter_count").alias("inter"),
        F.col("union_count").alias("denom"),
        F.col("jaccard").alias("score"))
    b = containment_pairs(docs, CONTAINMENT_THRESHOLD,
                          max_band_bucket=None).select(
        F.lit("containment").alias("measure"), "doc_a", "doc_b",
        F.col("inter_count").alias("inter"),
        F.col("min_count").alias("denom"),
        F.col("containment").alias("score"))
    c = weighted_jaccard_pairs(docs, JACCARD_THRESHOLD,
                               max_band_bucket=None).select(
        F.lit("weighted_jaccard").alias("measure"), "doc_a", "doc_b",
        F.col("inter_w").alias("inter"),
        F.col("union_w").alias("denom"),
        F.col("wjaccard").alias("score"))
    return a.unionByName(b).unionByName(c)


def _dedup_pair_measures_sql() -> str:
    plans = (
        ("jaccard", JACCARD_SQL, "inter_count", "union_count", "jaccard"),
        ("containment", CONTAINMENT_SQL, "inter_count", "min_count",
         "containment"),
        ("weighted_jaccard", WEIGHTED_JACCARD_SQL, "inter_w", "union_w",
         "wjaccard"),
    )
    return "\nUNION ALL\n".join(
        f"SELECT '{n}' AS measure, doc_a, doc_b, {i} AS inter,"
        f" {d} AS denom, {s} AS score FROM ({sql})"
        for n, sql, i, d, s in plans)


def split_variants_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both train/val/test assignment strategies (per-doc hash draw and
    near-dup-cluster-aware draw) as one labeled union — the
    consolidated slot replacing docs_split_assignments and
    docs_split_group_aware (docs_split_leakage keeps its slot:
    different shape, it AUDITS a split rather than producing one)."""
    a = train_val_test_split(
        _docs(spark, sf_dir), SPLIT_VAL_PM, SPLIT_TEST_PM).select(
        F.lit("hash").alias("variant"), "doc_id",
        F.lit(None).cast("long").alias("cluster_id"), "split")
    b = cluster_aware_split(
        _docs(spark, sf_dir), SPLIT_VAL_PM, SPLIT_TEST_PM,
        JACCARD_THRESHOLD, max_band_bucket=None).select(
        F.lit("group_aware").alias("variant"), "doc_id", "cluster_id",
        "split")
    return a.unionByName(b)


def _split_variants_sql() -> str:
    return f"""
SELECT 'hash' AS variant, doc_id, CAST(NULL AS BIGINT) AS cluster_id, split
FROM ({SPLIT_SQL})
UNION ALL
SELECT 'group_aware', doc_id, cluster_id, split
FROM ({GROUP_SPLIT_SQL})
"""
