"""Zero-denominator / degenerate-source audit as a pinned regression
(r10 verdict #7; the f170a14 zero-token-source crash was a CLASS, not
an instance).

Every registry query must survive (a) an EMPTY corpus — the
empty-partition day a 100 TB pipeline absolutely hits — and (b) a
degenerate corpus that zeroes every denominator class at once:
empty/NULL/whitespace texts, an all-empty-text source, a ZERO
embedding vector plus an identical pair (zero norm / zero spread),
events all at one instant with value 0.0 and a single user+type
(zero spans, zero sums, zero sigma, MAD 0), zero-price /
100%-discount lineitems. "Survive" = no exception; NULL outputs are
the documented answer for undefined ratios (cosine of a zero vector,
z with sigma 0, ratios of an empty doc).

ALLOWED_RAISES: operators whose documented contract is a LOUD,
actionable raise on unusable input, which is the opposite failure
mode this audit hunts (silent-crash-deep-in-a-stage):
- sim_top_component: power iteration seeds from the vec_id == 0 row
  and raises USER_RAISED_EXCEPTION naming the fix when it is absent.

The full two-fixture sweep over all ~205 queries is `slow` (one
Spark pass each); the default battery runs a smoke subset over the
division-heavy families so a regression still fails fast in-repo.
"""
import pytest

from scripts_dev.degenerate_sweep import build_fixture, sweep

ALLOWED_RAISES = {"sim_top_component"}

SMOKE = [
    # one per denominator class found crashing in the r11 audit
    "sim_cosine_topk",            # zero-norm cosine
    "sim_semantic_dedup",         # zero-norm centroid sim
    "dedup_embedding_cosine",     # zero-norm pair cosine
    "sim_embedding_eval_panel",   # pooled mrr over zero queries (empty)
    "events_value_anomaly_variants",  # sigma-0 z-score
    "text_quality_score",         # empty-doc char ratios
    "docs_dedup_savings",         # zero-token source
    "docs_dup_span_coverage",     # the original f170a14 class
]


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    root = tmp_path_factory.mktemp("degen")
    dirs = {}
    for kind, empty in (("empty", True), ("degenerate", False)):
        d = root / kind
        d.mkdir()
        build_fixture(str(d), empty)
        dirs[kind] = str(d)
    return dirs


@pytest.mark.parametrize("kind", ["empty", "degenerate"])
def test_degenerate_smoke_subset(spark, fixtures, kind):
    errs = sweep(spark, fixtures[kind], names=SMOKE)
    errs = {n: e for n, e in errs.items() if n not in ALLOWED_RAISES}
    assert errs == {}, f"{kind}: {errs}"


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["empty", "degenerate"])
def test_degenerate_full_sweep(spark, fixtures, kind):
    errs = sweep(spark, fixtures[kind])
    errs = {n: e for n, e in errs.items() if n not in ALLOWED_RAISES}
    assert errs == {}, f"{kind}: {errs}"


# the cosine-family gated entries: every one whose Spark plan guards
# zero-norm via similarity._cos_sim and whose oracle now mirrors it
# through beyond.sql_cos / the nullif'd label-centroid twin
COSINE_FAMILY = [
    "sim_cosine_topk",
    "sim_semantic_dedup",
    "sim_diversity_sample",
    "sim_label_centroid_cosine",
    "dedup_embedding_cosine",
    "sim_ann_topk_variants",
]


@pytest.mark.parametrize("name", COSINE_FAMILY)
@pytest.mark.heavy
def test_degenerate_cosine_cross_engine(spark, fixtures, name):
    """Zero-norm behavior must be identical CROSS-ENGINE, not just
    non-crashing on the Spark side: both engines score a zero vector's
    cosine as NULL (nullif'd denominator), so the degenerate fixture —
    which plants a zero embedding — must hash-match between the Spark
    plan and its DuckDB oracle, the same gate the driver runs on the
    benign sf fixtures. Before the sql_cos guard the oracles divided
    unguarded and parity here was fixture-dependent."""
    import duckdb

    import __spark_entry__ as E
    from scripts_dev.oracle_parity import TABLES, canon, equal

    fn, sql = E._registry()[name]
    assert sql is not None
    d = fixtures["degenerate"]
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{d}/{t}.parquet')")
        sdf = canon(fn(spark, d).toPandas())
        ddf = canon(con.sql(sql).df())
    finally:
        con.close()
    assert len(sdf) == len(ddf)
    assert list(sdf.columns) == list(ddf.columns)
    bad = []
    for c in sdf.columns:
        same, why = equal(sdf[c], ddf[c])
        if not same:
            bad.append((c, why))
    assert not bad, f"{name}: {bad}"
