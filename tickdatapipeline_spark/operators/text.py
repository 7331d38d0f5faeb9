"""Text-analysis operators over the `documents` table.

Beyond-reference surface for training-data pipelines: token stats,
quality scoring, language ID, fingerprinting. Everything is built-in
column expressions (JVM-side, whole-stage codegen) — no Python UDFs.

Cross-engine conventions shared with the DuckDB oracle:
- tokens: regexp_extract_all(lower(text), '[a-z0-9]+')
- 64-bit-ish hashes: lower 60 bits of md5 (15 hex chars), identical in
  Spark (conv) and DuckDB (0x-cast).
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tickdatapipeline_spark.functions.rounding import rnd
from tickdatapipeline_spark.functions.scale import fan_out

logger = logging.getLogger(__name__)

TOKEN_RE = "[a-z0-9]+"

# Deployment default for the mixture-sampling epoch fan-out guard: a
# misconfigured mix (huge budget against a tiny source) otherwise
# explodes every doc of that source into millions of epoch rows. 100
# full repetitions is already far beyond any published mixing recipe;
# pass None for unguarded fan-out (oracle-compared entries pass an
# explicit generous cap instead).
DEFAULT_MAX_EPOCHS = 100

# deterministic multilingual stopword marker lists for the n-gram
# language-ID heuristic (public-knowledge common words)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein"),
    "fr": ("le", "la", "les", "et", "des", "est", "une"),
    "es": ("el", "la", "los", "de", "que", "es", "una"),
}

STOPWORDS_EN = ("the", "a", "of", "to", "and", "in", "is", "it", "that", "for")


def tokens(text: Column) -> Column:
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RE), 0)


def h60(c: Column) -> Column:
    """Lower 60 bits of md5 as a non-negative BIGINT (matches DuckDB
    CAST('0x'||substring(md5(x),18,15) AS BIGINT))."""
    return F.conv(F.substring(F.md5(c), 18, 15), 16, 10).cast("long")


def salted_doc_hash(salt: str) -> Column:
    """h60(salt || doc_id): the deterministic per-document draw behind
    every sampler/shuffler here (stratified_sample, token_budget_sample,
    shard_assignments) — reproducible across runs/engines/partitionings;
    a new salt redraws."""
    return h60(F.concat(F.lit(salt), F.col("doc_id").cast("string")))


def token_stats(docs: DataFrame) -> DataFrame:
    """Token counting: whitespace/regex tokens + uniques (SURVEY §2.9 /
    north-star text ops)."""
    t = tokens(F.col("text"))
    # sum of token lengths == length(concat of tokens): one JVM string op
    # instead of an interpreted per-element lambda fold (~6x faster).
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(t).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("long").alias("n_unique_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        rnd(
            F.when(F.size(t) > 0,
                   F.length(F.array_join(t, "")).cast("double") / F.size(t).cast("double")
                   ).otherwise(F.lit(0.0)), 6
        ).alias("avg_token_len"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Quality heuristics: length, punctuation/digit/upper/stopword ratios."""
    t = tokens(F.col("text"))
    # nullif: an empty document has no chars to ratio over — NULL
    # ratios instead of an ANSI crash on degenerate input
    nchars = F.nullif(F.length("text").cast("double"), F.lit(0.0))
    npunct = F.length(F.regexp_replace("text", r"[^.!?,;:]", "")).cast("double")
    ndigit = F.length(F.regexp_replace("text", r"[^0-9]", "")).cast("double")
    nupper = F.length(F.regexp_replace("text", r"[^A-Z]", "")).cast("double")
    nstop = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS_EN)))
    ntok = F.size(t)
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.length("text").cast("long").alias("n_chars"),
        ntok.cast("long").alias("n_tokens"),
        rnd(npunct / nchars, 6).alias("punct_ratio"),
        rnd(ndigit / nchars, 6).alias("digit_ratio"),
        rnd(nupper / nchars, 6).alias("upper_ratio"),
        rnd(
            F.when(ntok > 0, nstop.cast("double") / ntok.cast("double")).otherwise(F.lit(0.0)), 6
        ).alias("stopword_ratio"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """n-gram/common-word language ID: argmax of marker-word hit counts,
    ties broken by language code ascending; 'und' when no marker hits."""
    t = tokens(F.col("text"))
    scores = [
        F.size(F.filter(t, lambda x: x.isin(*words))).cast("long").alias(f"score_{lang}")
        for lang, words in sorted(LANG_MARKERS.items())
    ]
    df = docs.select(F.col("doc_id").cast("long").alias("doc_id"), F.col("lang").alias("lang_true"), *scores)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties -> apply in reverse
        pred = F.when((F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return df.select("doc_id", "lang_true", pred.alias("pred_lang"), best.alias("best_score"))


def langid_confusion(docs: DataFrame) -> DataFrame:
    """Confusion matrix of the n-gram language-ID heuristic against the
    corpus's labeled language — the classifier-evaluation sweep that
    says where the cheap detector can be trusted before it gates a
    100 TB curation run.

    Output: (lang_true, pred_lang, n_docs, frac_of_true) — the fraction
    each predicted label takes of its true-label row (recall on the
    diagonal). The fraction divides two exact integers (one IEEE op,
    rounded with the shared policy).

    Scale: lang_id is a pure map-side projection; the matrix is ONE
    map-side-combinable groupBy producing |langs|^2 rows, plus a
    broadcast join against the |langs|-row true-label totals.
    """
    m = lang_id(docs).groupBy("lang_true", "pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    totals = m.groupBy("lang_true").agg(F.sum("n_docs").alias("n_true"))
    return (
        m.join(F.broadcast(totals), on="lang_true")
        .select(
            "lang_true", "pred_lang", "n_docs",
            rnd(F.col("n_docs").cast("double") / F.col("n_true")).alias("frac_of_true"),
        )
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint: 60-bit hash of the whitespace-normalized
    lowercased text (stable content address for dedup joins)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), h60(norm).alias("fingerprint")
    )


def vocab_topk(docs: DataFrame, k: int = 100) -> DataFrame:
    """Corpus vocabulary: the k most frequent tokens with occurrence and
    document frequencies (the fast first look at any training corpus).

    Output: (token, n_occurrences, n_docs), deterministic order
    (count desc, token asc).

    Scale: one map-side-combinable groupBy over exploded tokens, then
    orderBy+limit — Spark plans this as TakeOrderedAndProject (per
    -partition partial top-k merged on the driver), so the full
    vocabulary is never globally sorted or single-partitioned.
    """
    tok = fan_out(docs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(tokens(F.col("text"))).alias("token"),
    )
    return (
        tok.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("token"))
        .limit(k)
    )


def source_top_tokens(docs: DataFrame, k: int = 5) -> DataFrame:
    """Per-source top-k vocabulary — the k most frequent tokens within
    each source (count desc, token asc): the 'what does each crawl
    actually talk about' fingerprint that makes source drift and
    boilerplate floods visible at a glance.

    Scale: ONE map-side-combinable groupBy on (source, token); the
    rank window partitions by source over that aggregate's rows (unique
    tokens per source, not occurrences). Output |sources| x k rows.

    Output: (source, token, n_occurrences, rank).
    """
    from pyspark.sql import Window

    counts = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    w = Window.partitionBy("source").orderBy(
        F.col("n_occurrences").desc(), F.col("token")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("source", "token", "n_occurrences", "rank")
    )


def token_commonness(docs: DataFrame) -> DataFrame:
    """Unigram-frequency commonness score: each document's mean corpus
    frequency over its token OCCURRENCES — the integer-exact stand-in
    for unigram-LM perplexity filtering (CCNet-style): very low means a
    rare-token/gibberish document, very high means stopword soup; both
    tails are curation candidates. Complements oov_rate (binary top-k
    membership) with a frequency-weighted signal.

    Cross-engine exactness: corpus frequencies and their per-doc sums
    are exact BIGINTs; the mean divides two identical integers (one
    IEEE op, shared rounding).

    Scale: one groupBy(token) for the frequency table, one equi-join on
    token (aggregate rows, not text), one groupBy(doc). The frequency
    table is corpus-sized in distinct tokens — the join shuffles on the
    token key; at deployment scale compute it once per corpus snapshot
    and reuse.

    Output: (doc_id, n_tokens, sum_freq, mean_token_freq).
    """
    occ = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(tokens(F.col("text"))).alias("token"),
    )
    freq = occ.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    return (
        occ.join(freq, on="token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("freq").alias("sum_freq"),
            rnd(F.sum("freq").cast("double") / F.count(F.lit(1))).alias("mean_token_freq"),
        )
    )


def stratified_sample(docs: DataFrame, rates: dict[str, int],
                      default_permille: int = 1000, salt: str = "sample:") -> DataFrame:
    """Deterministic per-language downsampling: keep a document iff
    h60(salt || doc_id) % 1000 < permille(lang) — the 'rebalance
    overrepresented languages' step of corpus curation.

    Hash-based (not rand()) so the sample is reproducible across runs,
    engines and partitionings; changing the salt redraws it. Output:
    (doc_id, lang) of the survivors. Pure map-side filter — no shuffle,
    scales trivially.
    """
    pm = F.lit(default_permille)
    for lang, rate in sorted(rates.items()):
        pm = F.when(F.col("lang") == lang, F.lit(rate)).otherwise(pm)
    keep = salted_doc_hash(salt) % 1000 < pm
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang"
    ).where(keep)


def _hash_order_token_prefix(docs: DataFrame, n_buckets: int,
                             salt: str) -> DataFrame:
    """(doc_id, n_tokens, _pre): each document's EXCLUSIVE global prefix
    sum of token counts in the deterministic hash order (bucket, h,
    doc_id) with h = h60(salt||doc_id), bucket = h % n_buckets — the
    shared core of token_budget_sample and pack_sequences.

    Scale design: the naive formulation is ONE global ordered cumsum —
    a SinglePartition window over the corpus. Instead, the same
    two-level algebra as operators/globalorder.py: per-bucket token
    totals (n_buckets rows — tiny) get an exclusive prefix over the
    bucket order, broadcast back; within each bucket the ordered
    window partitions BY bucket. The only full-data operations are one
    hash exchange on bucket and a per-bucket sort; the single-partition
    window runs over n_buckets aggregate rows only.
    """
    from pyspark.sql import Window

    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
        salted_doc_hash(salt).alias("h"),
    ).withColumn("bucket", F.pmod(F.col("h"), F.lit(n_buckets)))
    bucket_sums = base.groupBy("bucket").agg(F.sum("n_tokens").alias("_bt"))
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    bucket_offsets = bucket_sums.select(
        "bucket", F.coalesce(F.sum("_bt").over(wb), F.lit(0)).alias("_boff")
    )
    ww = (
        Window.partitionBy("bucket").orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        base.join(F.broadcast(bucket_offsets), on="bucket")
        .withColumn(
            "_pre", F.col("_boff") + F.coalesce(F.sum("n_tokens").over(ww), F.lit(0))
        )
        .select("doc_id", "n_tokens", "_pre")
    )


def train_val_test_split(docs: DataFrame, val_permille: int = 50,
                         test_permille: int = 50,
                         salt: str = "split:") -> DataFrame:
    """Deterministic corpus split into train/val/test by a salted hash
    draw: h60(salt||doc_id) % 1000 lands in [0, test) -> 'test',
    [test, test+val) -> 'val', else 'train'. Hash-based (not rand())
    so the split is stable across runs, engines, partitionings and
    incremental corpus refreshes — a document never migrates between
    splits when other documents are added or removed; a new salt
    redraws the whole split.

    Output: (doc_id, split). Pure map-side projection — no shuffle.
    """
    if min(val_permille, test_permille) < 0 or val_permille + test_permille >= 1000:
        raise ValueError(
            "val_permille and test_permille must be >= 0 and sum to < 1000"
        )
    draw = salted_doc_hash(salt) % 1000
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.when(draw < test_permille, F.lit("test"))
        .when(draw < test_permille + val_permille, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def token_budget_sample(docs: DataFrame, budget: int, n_buckets: int = 256,
                        salt: str = "budget:") -> DataFrame:
    """Deterministic token-budget sampling: admit documents in a
    reproducible hash order until the cumulative token count reaches
    ``budget`` — the "cut an N-token mix from a much larger corpus"
    step of training-data assembly.

    Admission order is (bucket, h, doc_id) with h = h60(salt||doc_id)
    and bucket = h % n_buckets; a document is kept iff the EXCLUSIVE
    prefix sum of n_tokens before it in that order is < budget (so the
    admitted set may overshoot by at most one document). Hash order
    (not rand()) makes the cut reproducible across runs, engines and
    partitionings; changing the salt redraws it.

    Scale: two-level prefix algebra — see _hash_order_token_prefix.

    Output: (doc_id, n_tokens) of the admitted documents.
    """
    return (
        _hash_order_token_prefix(docs, n_buckets, salt)
        .where(F.col("_pre") < budget)
        .select("doc_id", "n_tokens")
    )


def pack_sequences(docs: DataFrame, seq_len: int = 128, n_buckets: int = 256,
                   salt: str = "pack:") -> DataFrame:
    """Concat-and-chunk sequence packing: lay the corpus out as one
    virtual token stream in a deterministic hash order, then cut it
    into fixed ``seq_len``-token training examples — the step that
    turns a shuffled tokenized corpus into packed context windows
    (the GPT-style "concatenate documents, split every ctx tokens"
    batching scheme).

    Each document (empty docs excluded — they occupy no tokens) gets:
    - pack_id:     the training example its FIRST token lands in
    - pack_offset: its starting offset within that example
    - n_packs:     how many consecutive examples it spans
      (= last_pack - pack_id + 1; >1 means the doc straddles one or
      more example boundaries and will be split at training time)

    The layout order is (bucket, h, doc_id) with h = h60(salt||doc_id)
    — reproducible across runs, engines and partitionings; a new salt
    reshuffles the packing. Position math is pure integer arithmetic on
    the exclusive token prefix sum, so the assignment is exact at any
    scale (int64 bounds ~9e18 total tokens).

    Scale: identical two-level prefix algebra as token_budget_sample
    (see _hash_order_token_prefix) — no SinglePartition window over
    the corpus; the pack arithmetic is map-side.

    Output: (doc_id, n_tokens, pack_id, pack_offset, n_packs).
    """
    pre = _hash_order_token_prefix(docs, n_buckets, salt).where(F.col("n_tokens") > 0)
    first = F.expr(f"_pre DIV {seq_len}")
    last = F.expr(f"(_pre + n_tokens - 1) DIV {seq_len}")
    return pre.select(
        "doc_id",
        "n_tokens",
        first.alias("pack_id"),
        F.pmod(F.col("_pre"), F.lit(seq_len)).cast("long").alias("pack_offset"),
        (last - first + 1).alias("n_packs"),
    )


def snapshot_diff(old_docs: DataFrame, new_docs: DataFrame) -> DataFrame:
    """Corpus snapshot diff: classify every document across two crawl /
    curation snapshots as added (new only), removed (old only), changed
    (both, different content fingerprint) or unchanged — the
    incremental-ingest audit that tells a pipeline what actually moved
    between refreshes (and what downstream artifacts to invalidate).

    Content identity is the shared 60-bit normalized-text fingerprint
    (operators.text.fingerprint), so cosmetic whitespace changes do not
    count as edits.

    Scale: two map-side fingerprint projections + ONE full outer join
    co-partitioned on doc_id (the only shuffle); output is one row per
    doc_id ever seen. At 100 TB both sides shuffle compact (doc_id,
    fp64) pairs, not text.

    Output: (doc_id, status, old_fingerprint, new_fingerprint).
    """
    return fingerprint_diff(fingerprint(old_docs), fingerprint(new_docs))


def fingerprint_diff(old_fp: DataFrame, new_fp: DataFrame) -> DataFrame:
    """snapshot_diff's core over PRECOMPUTED (doc_id, fingerprint)
    frames — the shape the streaming twin needs, where the previous
    snapshot's fingerprints are read from parquet rather than recomputed
    from text. Same single full-outer join, same statuses."""
    # presence is keyed on doc_id flags, NOT fingerprint NULL-ness: a
    # NULL-text doc (e.g. a corrupt JSONL row) has a NULL fingerprint
    # but IS present on its side; the content comparison is null-safe
    # (NULL vs text -> changed, NULL vs NULL -> unchanged), matching
    # the oracle's IS DISTINCT FROM.
    a = old_fp.withColumnRenamed("fingerprint", "old_fingerprint") \
        .withColumn("_in_old", F.lit(True))
    b = new_fp.withColumnRenamed("fingerprint", "new_fingerprint") \
        .withColumn("_in_new", F.lit(True))
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(
            ~F.col("old_fingerprint").eqNullSafe(F.col("new_fingerprint")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return (
        a.join(b, on="doc_id", how="full_outer")
        .select("doc_id", status.alias("status"),
                "old_fingerprint", "new_fingerprint")
    )


def source_cap(docs: DataFrame, cap: int, salt: str = "cap:",
               oversample: float = 2.0) -> DataFrame:
    """Per-source frequency capping: keep at most ``cap`` documents per
    source, chosen hash-deterministically — the Common-Crawl-style
    "no host may dominate the corpus" guard applied before mixing
    (rate-based sampling is ``stratified_sample``; this is the absolute
    ceiling variant curation recipes state as "top N per domain").

    Selection rule (identical in the SQL twin, so it IS the contract):
    a doc is admitted when its draw h = h60(salt||doc_id) falls in the
    source's oversample band (h/2^60 < oversample*cap/n_src, computed
    with the same IEEE ops both engines), then the admitted docs are
    ranked by (h, doc_id) per source and rows ranked past ``cap`` drop.
    Full sources (n_src <= cap/oversample band covers everything) pass
    through whole.

    Scale — why the band exists: a bare row_number over
    partitionBy(source) ranks EVERY doc of a mega-source in one task.
    The band pre-filter needs only the broadcast per-source counts and
    map-side hashing, cutting the ranked set to ~oversample*cap rows
    per source, so the window is bounded by the cap, not the corpus
    (the same oversample-then-rank trick as distributed top-k). The
    hash is uniform, so the band holds fewer than ``cap`` docs only
    with vanishing probability (Chernoff at oversample=2) — and both
    engines agree exactly even then.

    Output: (doc_id, source, sample_rank), sample_rank 1..cap.
    """
    from pyspark.sql import Window

    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        salted_doc_hash(salt).alias("h"),
    )
    counts = base.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    frac = F.least(
        F.lit(1.0), F.lit(float(oversample * cap)) / F.col("n_src").cast("double")
    )
    pre = base.join(F.broadcast(counts), on="source").where(
        F.col("h").cast("double") < frac * F.lit(float(1 << 60))
    )
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    return (
        pre.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .where(F.col("sample_rank") <= cap)
        .select("doc_id", "source", "sample_rank")
    )


def mixture_sample(docs: DataFrame, targets: dict[str, int], budget: int,
                   salt: str = "mix:",
                   max_epochs: int | None = DEFAULT_MAX_EPOCHS) -> DataFrame:
    """Weighted corpus mixing: draw a ``budget``-token training mix
    whose per-source token shares match ``targets`` (source ->
    permille of the budget), upsampling scarce sources by repeating
    them across epochs — the Pile/Dolma-style "mix sources at fixed
    weights" step of training-data assembly. Sources absent from
    ``targets`` (or with share 0) are dropped.

    Per source s: rate_pm = (budget * share_pm[s]) DIV avail_tokens[s]
    (a per-mille sampling rate; > 1000 means the whole source repeats).
    A document with draw h_pm = h60(salt||doc_id) % 1000 is admitted in
    every epoch e >= 0 with e*1000 + h_pm < rate_pm, so the expected
    admitted token mass is avail * rate_pm / 1000 ~ the source's budget
    share, and full epochs contain the entire source (deterministic:
    hash draws, not rand(); a new salt redraws the fractional epoch).

    Scale: one map-side-combinable per-source aggregate (|sources|
    rows) broadcast back over the corpus; admission + epoch fan-out is
    map-side explode. Pure integer arithmetic (exact for budgets to
    ~9e15 tokens at permille shares).

    Epoch-fan-out guard: ``max_epochs`` (default DEFAULT_MAX_EPOCHS)
    clamps each doc's repetitions — a degenerate mix (10^12-token
    budget against a 1K-token source) otherwise asks for ~10^9 epochs
    PER DOC and OOMs an executor mid-explode. Because the maximum
    fan-out of a source is determined by rate_pm alone (the per-doc
    draw only subtracts), the guard is evaluated on the |sources|-row
    availability aggregate: it is collected once (tiny), each clamped
    source is WARN-logged with its requested epoch count, and the
    collected rows are fed back as the broadcast side — the corpus is
    still scanned exactly once. Pass None for unguarded, fully lazy
    fan-out.

    Output: (doc_id, source, epoch, n_tokens).
    """
    share_pm = F.lit(0)
    for src, pm in sorted(targets.items()):
        share_pm = F.when(F.col("source") == src, F.lit(pm)).otherwise(share_pm)
    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
        (salted_doc_hash(salt) % 1000).alias("h_pm"),
        share_pm.alias("share_pm"),
    )
    avail = base.groupBy("source").agg(F.sum("n_tokens").alias("avail_tokens"))
    n_epochs = F.greatest(F.lit(0).cast("long"),
                          F.expr("(rate_pm - h_pm + 999) DIV 1000"))
    if max_epochs is not None:
        rows = avail.collect()  # O(|sources|) rows — the guard's only job
        for r in rows:
            pm = targets.get(r["source"], 0)
            if pm <= 0 or not r["avail_tokens"]:
                continue
            rate_pm = (budget * pm) // r["avail_tokens"]
            want = (rate_pm + 999) // 1000  # max epochs at draw h_pm=0
            if want > max_epochs:
                logger.warning(
                    "mixture_sample epoch guard: source %r wants up to %d "
                    "epochs (rate %d pm); clamping to max_epochs=%d",
                    r["source"], want, rate_pm, max_epochs,
                )
        if rows:
            avail = docs.sparkSession.createDataFrame(rows, schema=avail.schema)
        n_epochs = F.least(F.lit(max_epochs).cast("long"), n_epochs)
    return (
        base.join(F.broadcast(avail), on="source")
        .where((F.col("share_pm") > 0) & (F.col("avail_tokens") > 0))
        .withColumn(
            "rate_pm", F.expr(f"({budget}L * share_pm) DIV avail_tokens")
        )
        .withColumn("n_epochs", n_epochs)
        .where(F.col("n_epochs") > 0)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("n_epochs") - 1)
            ).alias("epoch"),
            "n_tokens",
        )
    )


def chunk_windows(docs: DataFrame, window: int = 64,
                  stride: int = 48) -> DataFrame:
    """Sliding-window document chunking: cut each document's token
    stream into overlapping ``window``-token chunks advancing by
    ``stride`` tokens — the RAG-indexing / long-doc-pretraining step
    that turns whole documents into retrievable or trainable pieces
    with ``window - stride`` tokens of overlap for context continuity.

    Chunk count per doc is 1 + ceil(max(0, n - window) / stride), so
    every token is covered and the final chunk always reaches the end
    of the document (it may be shorter than ``window``; it is never
    empty). Empty documents yield no chunks.

    Scale: tokenize + explode is pure map-side JVM (whole-stage
    codegen, no shuffle, no Python) — each input split fans out to its
    own chunks independently, so the operator scales linearly with
    corpus bytes and parallelizes to any partition count. Output rows
    ≈ corpus_tokens / stride.

    Output: (doc_id, chunk_idx, chunk_start, chunk_len, chunk_text).
    """
    if not 0 < stride <= window:
        raise ValueError("require 0 < stride <= window")
    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        tokens(F.col("text")).alias("t"),
    ).withColumn("n", F.size("t").cast("long")).where(F.col("n") > 0)
    # ceil on non-negative ints only: DIV (truncating) == floor division
    n_chunks = F.lit(1) + F.expr(
        f"(greatest(0L, n - {window}) + {stride - 1}) DIV {stride}"
    )
    start = (F.col("chunk_idx") * stride).cast("long")
    return (
        base.withColumn(
            "chunk_idx", F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1))
        )
        .select(
            "doc_id",
            "chunk_idx",
            start.alias("chunk_start"),
            F.least(F.lit(window).cast("long"), F.col("n") - start).alias("chunk_len"),
            F.array_join(
                F.slice(F.col("t"), (start + 1).cast("int"), window), " "
            ).alias("chunk_text"),
        )
    )


def repetition_score(docs: DataFrame) -> DataFrame:
    """Per-document repetition metrics — the Gopher-style quality rules
    that catch boilerplate/spam (Rae et al. 2021 §A1.1 family):

    - dup_token_frac:  fraction of tokens that are repeats of an
      earlier token (1 - unique/total)
    - top_token_frac:  share of the single most frequent token
    - dup_bigram_frac: fraction of repeated word bigrams

    Output: (doc_id, n_tokens, dup_token_frac, top_token_frac,
    dup_bigram_frac); empty docs score 0.0 everywhere.

    Scale: array stats (sizes, distincts) are pure map-side JVM
    expressions; the one aggregation pair (per-doc token mode) is two
    map-side-combinable groupBys on (doc_id, token) — never a window,
    never a global sort.
    """
    t = tokens(F.col("text"))
    bg = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(t, i.cast("int")),
                F.element_at(t, (i + 1).cast("int"))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = fan_out(docs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        t.alias("toks"),
        bg.alias("bigrams"),
    )
    stats = base.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("_n_uniq"),
        F.size("bigrams").cast("long").alias("_n_bg"),
        F.size(F.array_distinct("bigrams")).cast("long").alias("_n_bg_uniq"),
    )
    top = (
        base.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("doc_id").agg(F.max("_c").alias("_top_cnt"))
    )

    def frac(num, den):
        return rnd(
            F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(F.lit(0.0)), 6
        )

    return (
        stats.join(top, on="doc_id", how="left")
        .select(
            "doc_id",
            "n_tokens",
            frac(F.col("n_tokens") - F.col("_n_uniq"), F.col("n_tokens")).alias("dup_token_frac"),
            frac(F.coalesce("_top_cnt", F.lit(0)), F.col("n_tokens")).alias("top_token_frac"),
            frac(F.col("_n_bg") - F.col("_n_bg_uniq"), F.col("_n_bg")).alias("dup_bigram_frac"),
        )
    )


def shard_assignments(docs: DataFrame, n_shards: int = 16,
                      salt: str = "shard:") -> DataFrame:
    """Deterministic global shuffle of a corpus into training shards:
    shard = h % n_shards, position-within-shard by (h, doc_id) — the
    "shuffle the corpus and write N shard files" step before training.
    Hash order (not rand()) so the shuffle is reproducible across runs,
    engines and partitionings; changing the salt redraws it.

    Output: (doc_id, shard, pos) with pos 0-based within its shard.

    Scale: shard assignment is map-side; the position window partitions
    BY shard — n_shards-way parallel sorts, never a global one. The
    downstream write is `df.repartition("shard").sortWithinPartitions
    (...)` + partitionBy("shard") — no driver involvement.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                    salted_doc_hash(salt).alias("h"))
        .withColumn("shard", F.pmod(F.col("h"), F.lit(n_shards)))
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .select("doc_id", "shard", "pos")
    )


def write_training_shards(docs: DataFrame, out_dir: str, n_shards: int = 16,
                          salt: str = "shard:") -> int:
    """Materialize the shuffled corpus as training shards: each
    ``shard=N`` partition directory holds its documents parquet-encoded
    in shard_assignments' deterministic (hash, doc_id) order.

    Returns the number of documents written.

    Scale: one hash exchange on shard + per-shard sorts
    (repartition(shard) + sortWithinPartitions), then a partitioned
    write — no global sort, no driver involvement. Readers stream one
    shard per training worker with `spark.read.parquet(out).where(
    shard = N)` (partition-pruned scan)."""
    assigned = shard_assignments(docs, n_shards, salt)
    full = docs.join(assigned, on="doc_id")
    (
        full.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )
    # count from the written parquet footers (metadata-only scan) —
    # counting `full` would re-run the whole join+window lineage
    return docs.sparkSession.read.parquet(out_dir).count()


def tfidf_topk(docs: DataFrame, k: int = 3, scale: int = 1_000_000) -> DataFrame:
    """Per-document top-k characteristic terms by an integer-exact
    tf-idf variant: score = tf * scale // doc_freq (reciprocal-df
    weighting — same monotone tf/df intent as classic log-idf, but pure
    64-bit integer arithmetic so both engines rank identically; a float
    log idf would be ulp-unstable across engines at ranking boundaries).

    Output: (doc_id, token, tf, doc_freq, score_q, rank), rank 1..k by
    (score desc, token asc).

    Scale: two map-side-combinable groupBys (term frequency, document
    frequency), one unhinted join on token (AQE: broadcast while the
    vocabulary fits, shuffle beyond), and a per-document rank window —
    partitioned by doc_id, never global.
    """
    tok = fan_out(docs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(tokens(F.col("text"))).alias("token"),
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        tok.distinct().groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("score_q").desc(), F.col("token"))
    return (
        tf.join(dfreq, on="token")
        .withColumn("score_q", F.expr(f"tf * {scale} DIV doc_freq"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("doc_id", "token", "tf", "doc_freq", "score_q", "rank")
    )


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """SimHash over tokens: per bit, majority vote of token-hash bits
    (sum of +-1 > 0), reassembled into a `bits`-wide signature.

    Scale path: one hash per token row, then `bits` conditional SUM
    aggregates in a single map-side-combinable groupBy — no bits-fold row
    explosion; shuffle volume is O(docs x bits) packed into one row per
    doc, independent of document length.

    Measured and REJECTED (r15, alternating A/B at matched probe): a
    per-(doc, token) pre-count before the md5 (the oracle-pinned h60 is
    the dominant per-row cost and tokens repeat ~2.3x within documents
    at sf0.1) — the pair groupBy's extra exchange + stage round-trips
    cost more than the 2.3x md5/vote-update saving at every size the
    bench sees (solo mins 1.62 s per-occurrence vs 1.89 s pre-counted;
    bench entry 1.46 -> 2.35 s), and unlike the FIR scatter there is no
    in-plan size signal to gate it on. Recorded so the next round does
    not re-try it blind; at md5-bound corpus scale the trade may flip,
    but proving that needs a cluster, not this box.
    """
    tok = fan_out(docs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(tokens(F.col("text"))).alias("tok"),
    ).withColumn("h", h60(F.col("tok")))
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"v{b}")
            for b in range(bits)
        ]
    )
    sig = None
    for b in range(bits):
        term = F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return votes.select("doc_id", sig.cast("long").alias("simhash"))


def oov_rate(docs: DataFrame, vocab_k: int = 1000) -> DataFrame:
    """Out-of-vocabulary rate per document: the share of token
    occurrences not in the corpus's top-``vocab_k`` vocabulary — the
    tokenizer-coverage / domain-mismatch check run before committing a
    vocabulary size or admitting a new source.

    Output: (doc_id, n_tokens, n_oov, oov_rate rounded to 6);
    token-free docs are excluded (no occurrences to measure).

    Scale: the vocabulary is the top-k aggregate of the corpus
    (TakeOrdered — never a global sort) and broadcasts; scoring is a
    broadcast left join over the exploded tokens plus one map-side-
    combinable groupBy on doc_id. Like the quantile length filter,
    this is inherently two passes over the corpus (the vocab is itself
    a corpus aggregate); at deployment scale compute the vocab once
    per corpus build and score batches against the artifact.
    """
    voc = vocab_topk(docs, vocab_k).select("token").withColumn("_in", F.lit(1))
    tok = fan_out(docs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(tokens(F.col("text"))).alias("token"),
    )
    scored = tok.join(F.broadcast(voc), on="token", how="left")
    n_tok = F.count(F.lit(1))
    n_oov = F.count(F.when(F.col("_in").isNull(), 1))
    return scored.groupBy("doc_id").agg(
        n_tok.alias("n_tokens"),
        n_oov.alias("n_oov"),
        rnd(n_oov.cast("double") / n_tok.cast("double")).alias("oov_rate"),
    )


def boilerplate_ngrams(docs: DataFrame, n: int = 5, k: int = 100,
                       min_docs: int = 2) -> DataFrame:
    """Span-level boilerplate detector: the ``k`` word n-grams shared
    by the most documents (document frequency >= ``min_docs``) — the
    cheap first pass of exact-substring dedup (Lee et al. 2022's
    motivation): headers, footers, license blocks and template
    sentences surface as high-df grams long before doc-level dedup
    fires.

    Output: (shingle, n_docs, example_doc_id = min doc containing it),
    ordered (n_docs desc, shingle asc), top k.

    Scale: distinct (doc, gram) pairs -> ONE map-side-combinable
    groupBy on the gram; top-k plans TakeOrdered, never a global sort.
    """
    from tickdatapipeline_spark.operators.dedup import shingles

    return (
        shingles(docs, n)
        .groupBy("shingle")
        .agg(
            # shingles() already deduplicated (doc, gram) pairs, so a
            # plain count IS the doc frequency — countDistinct would
            # re-shuffle the gram stream for nothing
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("example_doc_id"),
        )
        .where(F.col("n_docs") >= min_docs)
        .orderBy(F.col("n_docs").desc(), "shingle")
        .limit(k)
    )


def vocab_drift(docs_a: DataFrame, docs_b: DataFrame, k: int = 100) -> DataFrame:
    """Vocabulary drift between two corpus slices (yesterday's crawl vs
    today's, source A vs source B): for the k highest-combined-count
    tokens, each side's occurrence count and corpus share, and the
    absolute share difference — the distribution-shift monitor that
    catches a scraper regression or a topic flood before training does.

    Output: (token, cnt_a, cnt_b, share_a, share_b, drift), ordered
    (cnt_a + cnt_b desc, token), shares/drift rounded to 6. Tokens
    absent from one side count 0 there.

    Scale: both sides union into ONE map-side-combinable groupBy on
    token (conditional sums — no join between the sides); the two
    corpus totals broadcast back as a 1-row frame; top-k plans
    TakeOrdered, so the full vocabulary is never globally sorted.
    When both slices live in ONE table, prefer vocab_drift_tagged —
    it tags sides off a single scan instead of two filtered scans.
    """
    tagged = fan_out(docs_a).select(
        F.explode(tokens(F.col("text"))).alias("token"), F.lit(0).alias("side")
    ).unionByName(
        fan_out(docs_b).select(
            F.explode(tokens(F.col("text"))).alias("token"), F.lit(1).alias("side")
        )
    )
    return _vocab_drift_core(tagged, k)


def vocab_drift_tagged(docs: DataFrame, side: Column, k: int = 100) -> DataFrame:
    """vocab_drift over ONE table: ``side`` is a column expression
    evaluating to 0 (slice A) or 1 (slice B); rows where it is NULL or
    any other value are excluded. Same output contract as vocab_drift,
    but the corpus is scanned once instead of once per side."""
    tagged = (
        fan_out(docs)
        .select(F.col("text"), side.alias("side"))
        .where(F.col("side").isin(0, 1))
        .select(F.explode(tokens(F.col("text"))).alias("token"), "side")
    )
    return _vocab_drift_core(tagged, k)


def _vocab_drift_core(tagged: DataFrame, k: int) -> DataFrame:
    from tickdatapipeline_spark.operators.globalorder import pin

    # pinned: both the 1-row totals aggregate and the final projection
    # consume `counts`, and the two consumers' plans are NOT identical
    # exchanges (different column pruning), so without the pin the
    # expensive scan+explode+groupBy lineage would execute twice
    counts = pin(
        tagged.groupBy("token").agg(
            F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("cnt_a"),
            F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("cnt_b"),
        )
    )
    totals = counts.agg(
        F.sum("cnt_a").alias("_ta"), F.sum("cnt_b").alias("_tb")
    )
    share_a = F.when(
        F.col("_ta") > 0, F.col("cnt_a").cast("double") / F.col("_ta").cast("double")
    ).otherwise(F.lit(0.0))
    share_b = F.when(
        F.col("_tb") > 0, F.col("cnt_b").cast("double") / F.col("_tb").cast("double")
    ).otherwise(F.lit(0.0))
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "token", "cnt_a", "cnt_b",
            rnd(share_a).alias("share_a"),
            rnd(share_b).alias("share_b"),
            rnd(F.abs(share_a - share_b)).alias("drift"),
        )
        .orderBy((F.col("cnt_a") + F.col("cnt_b")).desc(), "token")
        .limit(k)
    )


def source_quality_report(docs: DataFrame) -> DataFrame:
    """Per-source curation report: document counts, language spread,
    token volume and average document shape — the first dashboard over
    any multi-source crawl (which sources are thin, which dominate the
    token budget, which are single-language).

    Output per source: (source, n_docs, n_langs, total_tokens,
    avg_chars, avg_tokens) with the averages derived from exact integer
    sums and rounded to 6.

    Scale: ONE map-side-combinable groupBy on source (|sources| result
    rows); the count-distinct on lang expands to the standard two-level
    aggregate, still keyed on the compact (source, lang) pair.
    """
    n_tok = F.size(tokens(F.col("text"))).cast("long")
    base = docs.select("source", "lang", F.length("text").cast("long").alias("n_chars"),
                       n_tok.alias("n_tokens"))
    n = F.count(F.lit(1))
    return base.groupBy("source").agg(
        n.alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_tokens").alias("total_tokens"),
        rnd(F.sum("n_chars").cast("double") / n.cast("double")).alias("avg_chars"),
        rnd(F.sum("n_tokens").cast("double") / n.cast("double")).alias("avg_tokens"),
    )


# GPT-2-style pre-tokenizer regex, lookahead-free so Java regex (Spark)
# and RE2 (DuckDB) split identically: contraction suffixes, space-glued
# letter runs, space-glued digit runs, space-glued punctuation runs,
# residual whitespace. Whitespace is spelled as an explicit class
# because the engines' \s differ (Java includes U+000B vertical tab,
# RE2 does not — a \s here made a vtab-adjacent-to-punctuation doc
# tokenize differently per engine). The real BPE merge table comes
# from the tokenizer artifact; this pre-split is the piece a corpus
# engine needs for token accounting, and its counts track BPE counts
# closely enough for budget math (each pre-token maps to >= 1 BPE
# token).
_WS = r" \t\n\x0B\f\r"
BPE_PRETOKEN_RE = (
    r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^"
    + _WS + r"\p{L}\p{N}]+|[" + _WS + r"]+"
)
_BPE_WORD_RE = r"^ ?\p{L}+$"
_BPE_NUM_RE = r"^ ?\p{N}+$"


def bpe_token_stats(docs: DataFrame) -> DataFrame:
    """Token accounting under a BPE-ish pre-tokenizer (vs token_stats'
    plain [a-z0-9]+ words): per document, the pre-token count, its
    word/number/other breakdown, and chars-per-token — the unit that
    token budgets, packing and pricing are denominated in.

    Output: (doc_id, n_bpe_tokens, n_word, n_num, n_other,
    chars_per_token rounded to 6; whitespace runs count as 'other').

    Scale: one regexp_extract_all + array stats per row — pure map-side
    JVM expressions, no shuffle.
    """
    toks = F.regexp_extract_all(F.col("text"), F.lit(BPE_PRETOKEN_RE), 0)
    n = F.size(toks)
    n_word = F.size(F.filter(toks, lambda t: t.rlike(_BPE_WORD_RE)))
    n_num = F.size(F.filter(toks, lambda t: t.rlike(_BPE_NUM_RE)))
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n.cast("long").alias("n_bpe_tokens"),
        n_word.cast("long").alias("n_word"),
        n_num.cast("long").alias("n_num"),
        (n - n_word - n_num).cast("long").alias("n_other"),
        rnd(
            F.when(n > 0, F.length("text").cast("double") / n.cast("double"))
            .otherwise(F.lit(0.0))
        ).alias("chars_per_token"),
    )


# PII patterns shared with the DuckDB oracle: plain character classes
# and ASCII word boundaries only — identical semantics under Java
# regex (Spark) and RE2 (DuckDB). Deliberately precision-leaning
# (training-data scrubbing wants few false redactions); a deployment
# extends PII_PATTERNS with its own (placeholder, regex) rules.
PII_EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PII_IP_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE_RE = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"

# applied in order: emails first (they contain dots and digits that
# the later patterns could otherwise clip), then IPs, then phones
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("n_emails", "<EMAIL>", PII_EMAIL_RE),
    ("n_ips", "<IP>", PII_IP_RE),
    ("n_phones", "<PHONE>", PII_PHONE_RE),
)


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrubbing for training corpora: replace emails, IPv4
    addresses and phone numbers with typed placeholders, keeping
    per-category match counts for curation reporting.

    Counts are taken against the ORIGINAL text (each pattern
    independently), then the redactions apply in PII_PATTERNS order so
    an earlier rewrite can't hide a later pattern's count. Adds
    (n_emails, n_ips, n_phones, clean_text) to the input frame.

    Scale: pure map-side JVM regexp expressions (whole-stage codegen)
    — no shuffle, no Python; scales linearly with corpus bytes.
    """
    out = df
    for count_col, _ph, pat in PII_PATTERNS:
        out = out.withColumn(
            count_col,
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)).cast("long"),
        )
    clean = F.col(text_col)
    for _cc, placeholder, pat in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, placeholder)
    return out.withColumn("clean_text", clean)


def importance_weights(docs: DataFrame, target_source: str,
                       scale: int = 1_000_000) -> DataFrame:
    """Data-selection importance weights over hashed text features —
    the DSIR recipe (Xie et al. 2023, "Data Selection for Language
    Models via Importance Resampling"): score every document by how
    much more likely its features are under a small TARGET distribution
    (here: the docs of ``target_source``) than under the overall corpus
    distribution, so a sampler can up-weight target-like raw data.

    Features are hashed word unigrams AND bigrams (h60 of 'u|tok' /
    'b|tok tok'), add-one smoothed. Where DSIR averages per-feature
    LOG-likelihood ratios, this scores the per-feature ratio itself,
    quantized to integers — floor(scale * (ct_f+1) DIV (cs_f+1)) — so
    every cross-row accumulation is a BIGINT sum (the repo-wide
    exactness rule: no multi-row float sum ever crosses the oracle).
    The two corpus-level normalizers (Ts+V)/(Tt+V) are constant across
    features and applied once, in doubles, at the end:

        score(d) = (Ts+V)/(Tt+V)
                   * sum_f n_f(d) * (scale*(ct_f+1) DIV (cs_f+1))
                   / (scale * sum_f n_f(d))

    with ct/cs the target/corpus feature counts, Tt/Ts their totals,
    V the distinct-feature count. Ranking by this ratio-mean upweights
    the same target-like docs as the log version; the log's tail
    damping is the one behavioral difference, traded for bit-exact
    cross-engine replay.

    Output: (doc_id, source, n_feats, score) for every doc with >= 1
    token; score rounded (rnd) for the oracle hash.

    Scale: the feature explosion is O(total tokens) behind fan_out;
    both count tables are map-side-combinable groupBys; doc-features
    join feature-stats on the 8-byte hash (equi-shuffle — the feature
    table is vocab-sized, too big to broadcast at corpus scale); the
    1-row totals frame is a broadcast cross join. int64 bounds:
    scale*(ct_f+1) caps the corpus at ~9e12 target tokens for the
    default scale — drop ``scale`` for bigger targets.
    """
    t = tokens(F.col("text"))
    feats = F.concat(
        F.transform(t, lambda x: F.concat(F.lit("u|"), x)),
        F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: F.concat(
                    F.lit("b|"), F.element_at(t, i.cast("int")),
                    F.lit(" "), F.element_at(t, (i + 1).cast("int")),
                ),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    from tickdatapipeline_spark.operators.globalorder import pin

    # three consumers (feature stats, totals, the scored join) — pinned
    # so the token explosion + per-doc count runs ONCE, not three times
    df = pin(
        fan_out(docs)
        .select(F.col("doc_id").cast("long").alias("doc_id"), "source",
                F.explode(feats).alias("feat"))
        .select("doc_id", "source", h60(F.col("feat")).alias("f"))
        .groupBy("doc_id", "source", "f")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    is_target = (F.col("source") == target_source).cast("long")
    fs = df.groupBy("f").agg(
        F.sum("n").alias("cs"), F.sum(F.col("n") * is_target).alias("ct")
    )
    totals = fs.agg(
        F.sum("cs").alias("ts"), F.sum("ct").alias("tt"),
        F.count(F.lit(1)).alias("v"),
    )
    lf = F.expr(f"{scale} * (ct + 1) DIV (cs + 1)")
    scored = (
        df.join(fs.withColumn("lf", lf).select("f", "lf"), "f")
        .groupBy("doc_id", "source")
        .agg(F.sum(F.col("n") * F.col("lf")).alias("num"),
             F.sum("n").alias("den"))
    )
    const = (F.col("ts") + F.col("v")).cast("double") / (F.col("tt") + F.col("v"))
    return (
        scored.join(F.broadcast(totals))
        .select(
            "doc_id", "source", F.col("den").alias("n_feats"),
            rnd(F.col("num").cast("double") / (F.lit(float(scale)) * F.col("den")) * const)
            .alias("score"),
        )
    )


def char_bigram_likelihood(docs: DataFrame) -> DataFrame:
    """Character-bigram LM fluency score: for every document, the mean
    conditional probability P(c2 | c1) of its character bigrams under
    the corpus-level bigram model — the classic perplexity-proxy
    quality filter (gibberish / mojibake / base64 blobs pair characters
    the corpus never pairs and score near 0, fluent prose scores high).

    Documented deviation from the usual mean-LOG-prob form: ln() is not
    bit-reproducible across engines (Spark's JVM Math.log vs DuckDB's
    libm differ in the last ulp on ~1% of arguments; measured), so the
    score is the arithmetic mean of the probabilities instead — built
    ONLY from correctly-rounded IEEE ops (each P is one BIGINT/BIGINT
    division, each term one multiply, the per-doc sum a left fold in
    bigram byte order, both engines memcmp) — and therefore bit-exact
    cross-engine. Same low-is-garbage ordering for filtering use.

    Output: (doc_id, n_bigrams, avg_bigram_p); docs shorter than one
    bigram after whitespace normalization are dropped.

    Scale: the position explosion reduces map-side to (doc_id, bigram)
    counts; the model is O(charset^2) rows — broadcast both joins; one
    doc_id exchange re-aggregates, with the per-doc fold bounded by
    distinct-bigrams-per-doc <= charset^2."""
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    docbg = (
        docs.select(F.col("doc_id").cast("long").alias("doc_id"), norm.alias("s"))
        # length guard BEFORE the sequence: Spark's sequence(1, 0) is the
        # DESCENDING [1, 0], not empty like DuckDB's range(1, 1)
        .where(F.length("s") >= 2)
        .select("doc_id", F.explode(F.sequence(F.lit(1), F.length("s") - 1)).alias("p"), "s")
        .select("doc_id", F.expr("substring(s, p, 2)").alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    from tickdatapipeline_spark.operators.globalorder import pin

    docbg = pin(docbg)  # feeds the model aggregate AND the scoring join
    model = docbg.groupBy("bg").agg(F.sum("occ").alias("cnt_bg"))
    pre = model.groupBy(F.substring("bg", 1, 1).alias("c1")).agg(
        F.sum("cnt_bg").alias("cnt_pre")
    )
    terms = (
        docbg.join(F.broadcast(model), "bg")
        .join(F.broadcast(pre), F.substring(F.col("bg"), 1, 1) == F.col("c1"))
        .select(
            "doc_id", "bg", "occ",
            (F.col("occ").cast("double")
             * (F.col("cnt_bg").cast("double") / F.col("cnt_pre").cast("double"))
             ).alias("term"),
        )
    )
    folded = terms.groupBy("doc_id").agg(
        F.sum("occ").alias("n_bigrams"),
        F.aggregate(
            F.transform(F.sort_array(F.collect_list(F.struct("bg", "term"))),
                        lambda x: x["term"]),
            F.lit(0.0), lambda a, x: a + x,
        ).alias("psum"),
    )
    return folded.select(
        "doc_id", "n_bigrams",
        rnd(F.col("psum") / F.col("n_bigrams").cast("double"), 6).alias("avg_bigram_p"),
    ).orderBy("doc_id")


COLLOC_MIN_COUNT = 5
COLLOC_TOP_K = 50


def collocations(docs: DataFrame, min_count: int = COLLOC_MIN_COUNT,
                 top_k: int = COLLOC_TOP_K) -> DataFrame:
    """Collocation (phrase) mining: the word pairs that co-occur far
    more than independence predicts — the phrase-detection score of
    word2vec's preprocessing (Mikolov et al. 2013) and the classic
    PMI collocation test, reported as LIFT = N * c(xy) / (c(x) * c(y))
    rather than its logarithm (PMI = ln lift): ln is not
    bit-reproducible across engines, the ranking is identical either
    way, and lift is ONE correctly-rounded division of two exact
    BIGINTs (c(xy)*N <= ~1e14, c(x)*c(y) <= ~1e16 — both inside
    int64).

    Output: top_k rows (token_a, token_b, pair_count, count_a,
    count_b, lift), ordered by lift DESC with ties to the pair text;
    pairs rarer than ``min_count`` are noise-filtered before scoring
    (the standard guard — a 1-occurrence pair of two hapaxes has
    lift = N).

    Scale: adjacent-pair and unigram counts are two map-side
    combinable groupBys over exploded grams; unigram totals broadcast
    onto the (filtered, hence small) pair table twice; the global
    top-k plans as TakeOrdered, never a full sort."""
    t = tokens(F.col("text"))
    pairs = (
        # greatest(..., 0): ANSI slice() rejects negative lengths on
        # token-less docs; an empty slice explodes to nothing
        docs.select(F.explode(
            F.zip_with(F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
                       F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
                       lambda a, b: F.struct(a.alias("ta"), b.alias("tb")))
        ).alias("p"))
        .select(F.col("p.ta").alias("token_a"), F.col("p.tb").alias("token_b"))
        .groupBy("token_a", "token_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .where(F.col("pair_count") >= min_count)
    )
    uni = (
        docs.select(F.explode(t).alias("tok"))
        .groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    )
    from tickdatapipeline_spark.operators.globalorder import pin

    uni = pin(uni)  # consumed by the two broadcast sides AND the N scalar
    n_tot = uni.agg(F.sum("cnt").alias("n")).select("n")
    scored = (
        pairs.join(F.broadcast(uni.select(F.col("tok").alias("token_a"),
                                          F.col("cnt").alias("count_a"))), "token_a")
        .join(F.broadcast(uni.select(F.col("tok").alias("token_b"),
                                     F.col("cnt").alias("count_b"))), "token_b")
        .join(F.broadcast(n_tot))
        .select(
            "token_a", "token_b", "pair_count", "count_a", "count_b",
            rnd((F.col("pair_count") * F.col("n")).cast("double")
                / (F.col("count_a") * F.col("count_b")).cast("double"), 6
                ).alias("lift"),
        )
    )
    return scored.orderBy(F.desc("lift"), "token_a", "token_b").limit(top_k)


BPE_N_MERGES = 3


def bpe_learn_merges(docs: DataFrame, n_merges: int = BPE_N_MERGES) -> DataFrame:
    """BPE tokenizer induction (Sennrich et al. 2016): learn the first
    ``n_merges`` byte-pair merges from the corpus — per iteration,
    count adjacent-symbol pairs over the word-frequency table, merge
    the most frequent pair everywhere, repeat. The missing flagship of
    the tokenizer family (bpe_token_stats APPLIES a fixed pre-tokenizer;
    this LEARNS one).

    Output: (merge_idx, sym_a, sym_b, pair_count) — one row per learned
    merge, the head of the merges.txt every BPE tokenizer ships.

    Exact: each argmax is a 1-row TakeOrdered (ties: count DESC, then
    symbol pair ascending) broadcast back over the word table — the
    iterations chain through lazy lineage cuts (pin, as in
    duplicate_clusters' label propagation: without the cut each round
    would re-derive the previous ones twice) — and the
    re-segmentation is a
    plain string replace over a DOUBLE-SPACE spelled word: with
    " a  b " as the pattern (symbols carry exactly one adjacent space
    each side, separators are two spaces), a match can't start or end
    inside a multi-char symbol, and consecutive merge sites keep one
    space each so leftmost non-overlapping replace == greedy
    left-to-right BPE (both engines' replace() scans identically).
    Everything is integer counts + string ops — nothing float.

    Scale: pair counting runs over the DISTINCT-WORD table (Zipf:
    orders of magnitude smaller than the corpus) weighted by word
    counts; each iteration is one map-side-combinable aggregate plus a
    1-row broadcast — n_merges more rounds is n_merges more cheap
    aggregates, never a corpus rescan."""
    words = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    )
    from tickdatapipeline_spark.operators.globalorder import pin

    # " " + chars joined by "  " + " ": the boundary-safe spelling
    spelled = words.select(
        "cnt",
        F.concat(F.lit(" "),
                 F.array_join(F.split(F.col("w"), ""), "  "),
                 F.lit(" ")).alias("s"),
    )
    cur = pin(spelled)  # each iteration consumes it twice (pairs + rewrite)
    merges = []
    for k in range(1, n_merges + 1):
        syms = F.split(F.trim(F.col("s")), "  ")
        pairs = (
            cur.select(
                "cnt",
                F.explode(F.zip_with(
                    F.slice(syms, 1, F.greatest(F.size(syms) - 1, F.lit(0))),
                    F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("sa"), b.alias("sb")),
                )).alias("p"),
            )
            .groupBy(F.col("p.sa").alias("sym_a"), F.col("p.sb").alias("sym_b"))
            .agg(F.sum("cnt").alias("pair_count"))
        )
        best = pin(
            pairs.orderBy(F.desc("pair_count"), "sym_a", "sym_b").limit(1)
        )
        merges.append(best.select(
            F.lit(k).cast("long").alias("merge_idx"), "sym_a", "sym_b", "pair_count"
        ))
        pat = F.concat(F.lit(" "), F.col("sym_a"), F.lit("  "), F.col("sym_b"), F.lit(" "))
        rep = F.concat(F.lit(" "), F.col("sym_a"), F.col("sym_b"), F.lit(" "))
        cur = pin(
            cur.join(F.broadcast(best))
            .select("cnt", F.replace(F.col("s"), pat, rep).alias("s"))
        )
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out.orderBy("merge_idx")


def bpe_compression_report(docs: DataFrame,
                           n_merges: int = BPE_N_MERGES) -> DataFrame:
    """APPLY the learned BPE merges back to the corpus: segment every
    word with the first ``n_merges`` merges and report the corpus-level
    compression — the acceptance metric for a tokenizer change
    (symbols/word drives training cost at a fixed token budget).

    Output: one row (n_words, n_symbols_char, n_symbols_bpe,
    compression) where compression = n_symbols_bpe / n_symbols_char
    (ONE division of two exact BIGINTs).

    Scale: shares bpe_learn_merges' shape — everything runs on the
    distinct-word table weighted by counts; the final reduce is one
    map-side-combinable aggregate."""
    words = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    )
    from tickdatapipeline_spark.operators.globalorder import pin

    spelled = words.select(
        "cnt",
        F.concat(F.lit(" "),
                 F.array_join(F.split(F.col("w"), ""), "  "),
                 F.lit(" ")).alias("s"),
    )
    cur = pin(spelled)
    base = cur  # char-level segmentation, for the denominator
    for _ in range(n_merges):
        syms = F.split(F.trim(F.col("s")), "  ")
        pairs = (
            cur.select(
                "cnt",
                F.explode(F.zip_with(
                    F.slice(syms, 1, F.greatest(F.size(syms) - 1, F.lit(0))),
                    F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("sa"), b.alias("sb")),
                )).alias("p"),
            )
            .groupBy(F.col("p.sa").alias("sym_a"), F.col("p.sb").alias("sym_b"))
            .agg(F.sum("cnt").alias("pair_count"))
        )
        best = pin(pairs.orderBy(F.desc("pair_count"), "sym_a", "sym_b").limit(1))
        pat = F.concat(F.lit(" "), F.col("sym_a"), F.lit("  "), F.col("sym_b"), F.lit(" "))
        rep = F.concat(F.lit(" "), F.col("sym_a"), F.col("sym_b"), F.lit(" "))
        cur = pin(
            cur.join(F.broadcast(best))
            .select("cnt", F.replace(F.col("s"), pat, rep).alias("s"))
        )
    nsyms = lambda c: F.sum(  # noqa: E731
        F.col("cnt") * F.size(F.split(F.trim(F.col("s")), "  "))
    )
    before = base.agg(F.sum("cnt").alias("n_words"), nsyms(base).alias("n_symbols_char"))
    after = cur.agg(nsyms(cur).alias("n_symbols_bpe"))
    return before.join(F.broadcast(after)).select(
        "n_words", "n_symbols_char", "n_symbols_bpe",
        rnd(F.col("n_symbols_bpe").cast("double")
            / F.col("n_symbols_char").cast("double"), 6).alias("compression"),
    )


def dup_span_coverage(docs: DataFrame, n: int = 5) -> DataFrame:
    """Cross-document duplicated-SPAN coverage per source: the fraction
    of token positions lying inside a word n-gram that also occurs in
    at least one OTHER document — the span-level statistic behind exact
    -substring dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better"): doc-level MinHash misses a corpus
    where every doc is unique but 30% of each is a shared license
    block. Complements docs_ngram_repetition (WITHIN-doc repetition)
    and boilerplate_ngrams (top-k shared grams): this measures how much
    of the corpus the shared spans actually cover.

    Per doc: positional n-grams (start index + 60-bit gram hash, the
    hashed_shingles convention — joins shuffle 8-byte ints; a cross-doc
    hash collision can overcount one span, odds ~pairs/2^61, and the
    SQL twin hashes identically); grams whose distinct-doc frequency
    >= 2 become intervals [start, start+n-1]; per-doc interval UNION
    via gaps-and-islands (running max(end) over a doc-partitioned
    window — bounded by doc length, never a global sort); covered
    token counts pool per source as exact BIGINTs with ONE integer
    permille division (pooled ratios — never averaged floats).

    Output: (source, n_docs, docs_with_dup, total_tokens,
    covered_tokens, coverage_permille) ordered by source.

    Scale: the gram explosion fans out first (single-file docs tables
    arrive as one partition); the df>=2 filter is a combinable groupBy
    on the 8-byte hash; the island windows partition BY DOC. 100 TB
    posture: every shuffle is keyed by gram hash or doc_id — no skew
    beyond natural gram df (a stop-gram's positions stay with their
    docs; only the tiny (gh, df) table aggregates per gram)."""
    from pyspark.sql import Window

    t = tokens(F.col("text"))
    gram_hashes = F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: h60(F.concat_ws(
                " ", *[F.element_at(t, (i + k).cast("int")) for k in range(n)])),
        ),
    ).otherwise(F.array().cast("array<long>"))
    pos = fan_out(docs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(gram_hashes).alias("start", "gh"),
    ).withColumn("end", F.col("start") + F.lit(n - 1))
    dup = (
        pos.select("gh", "doc_id").distinct()
        .groupBy("gh").agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= 2)
        .select("gh")
    )
    kept = pos.join(dup, "gh")
    wo = Window.partitionBy("doc_id").orderBy("start")
    prev_end = F.max("end").over(wo.rowsBetween(Window.unboundedPreceding, -1))
    isl = kept.select(
        "doc_id", "start", "end",
        F.when(prev_end.isNull() | (F.col("start") > prev_end), 1).otherwise(0).alias("new_isl"),
    ).withColumn(
        "island",
        F.sum("new_isl").over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    doc_cov = (
        isl.groupBy("doc_id", "island")
        .agg((F.max("end") - F.min("start") + 1).alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("covered"))
    )
    totals = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tok"),
    )
    return (
        totals.join(doc_cov, "doc_id", "left")
        .withColumn("covered", F.coalesce(F.col("covered"), F.lit(0)))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("covered") > 0, F.lit(1))).alias("docs_with_dup"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum("covered").alias("covered_tokens"),
        )
        .select(
            "source", "n_docs", "docs_with_dup", "total_tokens", "covered_tokens",
            # a source whose every doc tokenizes to nothing has no
            # denominator — NULL, never a divide-by-zero (ANSI raises;
            # found by the hypothesis mirror)
            F.when(F.col("total_tokens") > 0,
                   F.expr("covered_tokens * 1000 DIV total_tokens"))
            .alias("coverage_permille"),
        )
        .orderBy("source")
    )
