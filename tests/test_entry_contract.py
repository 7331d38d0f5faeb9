"""Smoke the driver contract: entry() runs, every queries() entry has a
well-formed callable, and a fast subset agrees with its DuckDB oracle at
sf0.001 (the full sweep is scripts_dev/oracle_parity.py)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

FAST_ORACLE_SUBSET = [
    "q7_price_range",
    "text_fingerprint",
    "dedup_exact",
    "rel_setops_segments",
    "rel_customers_without_orders",
    "rel_pricing_summary",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


def test_entry_runs(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert "sig_re" in df.columns and "status_flag" in df.columns


def test_registry_shape():
    qs, oracles = E.queries(), E.oracle_sql()
    assert len(qs) >= 30
    assert set(oracles) <= set(qs)
    # every callable is (spark, sf_dir) -> DataFrame; names are unique
    missing_oracle = set(qs) - set(oracles)
    # only genuinely non-SQL ops may omit the oracle: a stubbed demuxer,
    # a true recurrence, a sketch-based approximation, and a wall-clock
    # latency report
    assert missing_oracle <= {
        "media_frame_sample", "ema_state", "q2_percentiles_approx",
        "pipeline_latency_metrics",
        "docs_length_filter_approx", "events_distinct_users_daily_approx",
        "events_weekly_users_hll",  # Datasketches HLL merge — sketch
    }


@pytest.mark.parametrize("name", FAST_ORACLE_SUBSET)
def test_oracle_agreement_fast_subset(spark, con, name):
    qs, oracles = E.queries(), E.oracle_sql()
    sdf = canon(qs[name](spark, SF_DIR).toPandas())
    ddf = canon(con.sql(oracles[name]).df())
    assert len(sdf) == len(ddf)
    assert list(sdf.columns) == list(ddf.columns)
    for c in sdf.columns:
        a, b = sdf[c], ddf[c]
        if a.dtype.kind == "f":
            assert ((a == b) | (a.isna() & b.isna())).all(), f"col {c}"
        else:
            assert (a.fillna("\0").astype(str) == b.fillna("\0").astype(str)).all(), f"col {c}"


@pytest.mark.heavy
def test_registry_rotation_covers_every_gated_query(monkeypatch):
    """The driver hash-verifies only the FIRST 50 registry entries; the
    gated ordering is least-recently-verified first (from the committed
    CORRECTNESS files), so from ANY starting coverage state every gated
    query lands inside the window within ceil(n_gated/50) rounds."""
    import math

    import __spark_entry__ as mod

    n_gated = sum(1 for s in mod.oracle_sql().values() if s is not None)
    n_rounds = math.ceil(n_gated / 50)

    # simulate the driver loop from a worst-case empty coverage state:
    # each simulated round marks its 50-entry window green, feeding the
    # next round's ordering. Simulated rounds run AFTER the committed
    # FINGERPRINTS horizon (as real future driver rounds do): a green
    # must be NEWER than a query's recorded round to demote it from the
    # edited-promotion tier — greens numbered 1..n would leave any
    # mid-session-edited query permanently tier-0 in the simulation
    # (re-entering every window, starving another query) in a way the
    # real driver loop cannot.
    base = max(
        (v.get("round", 0) for v in mod._recorded_fingerprints().values()),
        default=0,
    )
    coverage: dict[str, int] = {}
    seen: dict[str, int] = {}
    for rnd_no in range(base + 1, base + n_rounds + 1):
        monkeypatch.setattr(mod, "_last_green_round", lambda c=dict(coverage): c)
        window = list(mod.queries())[:50]
        gated_in_window = [n for n in window if n in mod.oracle_sql()]
        assert len(gated_in_window) == 50  # rows-only entries sort last
        for n in gated_in_window:
            coverage[n] = rnd_no
            seen.setdefault(n, rnd_no)
    assert len(seen) == n_gated, "some gated query never enters the window"
    assert max(seen.values()) <= base + n_rounds

    # and with the REAL committed CORRECTNESS files: tier-0 queries
    # (never green on current code) lead the next window. When a build
    # session adds MORE than 50 new queries, the overflow defers — the
    # guarantee is then "the window holds nothing BUT tier 0", with the
    # remainder landing in the following round(s) (they stay tier 0
    # until green, and the simulated loop above already proves every
    # query enters within ceil(n/50) rounds).
    monkeypatch.undo()
    real_last = mod._last_green_round()
    window = list(mod.queries())[:50]
    never_green = [n for n in mod.oracle_sql() if n not in real_last]
    if len(never_green) <= 50:
        assert all(n in window for n in never_green), (
            f"never-verified queries missing from next window: "
            f"{[n for n in never_green if n not in window]}"
        )
    else:
        assert all(n in never_green for n in window), (
            "tier-0 overflow round must spend its whole window on tier 0"
        )


@pytest.mark.heavy
def test_edited_query_leads_next_window(monkeypatch):
    """Changed-lineage promotion: a gated query whose implementation
    fingerprint drifted from its committed FINGERPRINTS.json recording
    (with no newer green round) jumps to the HEAD of the gated ordering
    — the driver hash-checks it the very next round instead of waiting
    out the ceil(n/50)-round rotation. Once a NEWER round greens it, it
    drops back into normal rotation even before FINGERPRINTS.json is
    refreshed (tier 0 drains itself, no starvation)."""
    import __spark_entry__ as mod

    recorded = mod._recorded_fingerprints()
    last = mod._last_green_round()
    reg = mod._registry()
    # pick the gated query that would otherwise sort LAST (most recently
    # verified) so the promotion is unambiguous — drawn ONLY from queries
    # whose recording is CURRENT (live fingerprint matches): a query
    # genuinely edited this session is already tier 0 at the head of the
    # ordering, and choosing it as victim fails the `index > 0` baseline
    # (the r09 flavor of this test's environment-dependence).
    baseline = [
        n for n in mod.oracle_sql()
        if n in recorded and recorded[n].get("fp") == mod._fingerprint(*reg[n])
    ]
    victim = max(baseline, key=lambda n: last.get(n, 0))

    def tier1_names(order):
        # queries with a green row AND an unchanged recording (live
        # fingerprint matches) — the rotating tier the promoted victim
        # must lead; genuinely-edited queries are legitimately tier 0
        # themselves and are excluded
        rec = mod._recorded_fingerprints()
        return [
            n for n in order
            if n in last and n in rec and n != victim
            and rec[n].get("fp") == mod._fingerprint(*reg[n])
        ]

    order = list(mod.queries())
    assert order.index(victim) > 0

    # simulate "victim's plan fn / SQL was edited this session". The fake
    # recording's round must be AT-OR-AFTER the victim's last green round,
    # or a fresh driver CORRECTNESS deposit (last[victim] > the old
    # recorded round) makes the engine — correctly — treat the newer green
    # as clearing the promotion and the test reds on every deposit (the
    # r07/r08 failure class). max() makes the simulation deposit-invariant.
    fake_round = max(last.get(victim, 0), recorded[victim]["round"])
    fake = dict(recorded)
    fake[victim] = {"fp": "0" * 16, "round": fake_round}
    monkeypatch.setattr(mod, "_recorded_fingerprints", lambda: fake)
    order = list(mod.queries())
    vi = order.index(victim)
    # the victim now precedes EVERY tier-1 query AND every never-green
    # newcomer (edited previously-green queries are sub-tier 0.0: a
    # regression in certified code outranks a new query's first check)
    # — in particular it is inside the driver's 50-entry window
    assert all(vi < order.index(n) for n in tier1_names(order))
    assert vi < 50

    # a green row NEWER than the recording clears the promotion: the
    # victim drops back to the TAIL (it is the most recently verified)
    newer = dict(last)
    newer[victim] = fake_round + 1
    monkeypatch.setattr(mod, "_last_green_round", lambda: newer)
    order = list(mod.queries())
    vi = order.index(victim)
    assert all(vi > order.index(n) for n in tier1_names(order))


def test_fingerprints_json_is_current():
    """FINGERPRINTS.json must be refreshed (scripts_dev/
    update_fingerprints.py) at session start on the driver-verified
    snapshot: every query that greened at-or-before the recording
    horizon has a recording (greens NEWER than the horizon are a fresh
    driver deposit — the driver commits CORRECTNESS_r{N}.json after the
    builder's last refresh every round, so they must not redden a
    finished round), and fingerprint drift (a deliberate edit pending
    re-verification, which the registry promotes) is allowed but
    bounded so a stale file can't silently pin the whole surface to
    tier 0."""
    import __spark_entry__ as mod

    missing, promoted = mod._fingerprint_freshness_issues()
    assert not missing, (
        f"queries green at-or-before the FINGERPRINTS.json horizon with no "
        f"recording — run scripts_dev/update_fingerprints.py: {missing[:10]}"
    )
    assert len(promoted) <= 50, (
        f"{len(promoted)} queries pending re-verification exceeds the driver "
        f"window — refresh FINGERPRINTS.json at session start"
    )


def test_bench_headline_resolves_against_registry():
    """Every bench HEADLINE entry must resolve to a registry query (or
    a bench-local deploy variant) — a renamed/removed query would
    otherwise only surface as a KeyError inside the driver's bench run.
    The first 15 entries are the legacy band and must stay a stable
    prefix (legacy15_total continuity with BENCH_r01-r08)."""
    import bench

    import __spark_entry__ as mod

    resolvable = set(mod.queries()) | {"media_dedup_features_deploy"}
    missing = [n for n in bench.HEADLINE if n not in resolvable]
    assert not missing, f"HEADLINE entries without a query: {missing}"
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
    assert bench.HEADLINE[:15] == [
        "tick_pipeline_derivative", "tick_pipeline_multistream",
        "tick_pipeline_cpm", "bars_boxcar", "bars_fir", "q1_delta_stats",
        "q6_sigma_buckets", "q10_bar_audit", "text_token_stats",
        "text_simhash", "dedup_lsh_candidates", "sim_cosine_topk",
        "asof_join_events", "rel_pricing_summary", "rel_revenue_by_nation",
    ]


def test_no_shadowed_names_in_plan_modules():
    """A plans module defining the same top-level name twice (a second
    `funnel_fn`, a second SQL constant) silently SHADOWS the first —
    and a duplicate string key inside a dict literal silently keeps the
    last value, so `_registry`'s cross-module duplicate assert never
    sees it. Both almost shipped in round 8: a second funnel_fn/
    FUNNEL_SQL pair replaced the original windowed funnel's gated
    entry. Parse every plans module and reject duplicate top-level
    defs/constants and duplicate dict-literal keys."""
    import ast
    import inspect

    from tickdatapipeline_spark.plans import analytics, beyond, market, relational

    for mod in (analytics, beyond, market, relational):
        tree = ast.parse(inspect.getsource(mod))
        names: list[str] = []
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                names.append(node.name)
            elif isinstance(node, ast.Assign):
                names.extend(
                    t.id for t in node.targets if isinstance(t, ast.Name)
                )
        dupes = sorted({n for n in names if names.count(n) > 1})
        assert not dupes, f"{mod.__name__}: shadowed top-level names {dupes}"
        for node in ast.walk(tree):
            if isinstance(node, ast.Dict):
                keys = [
                    k.value for k in node.keys
                    if isinstance(k, ast.Constant) and isinstance(k.value, str)
                ]
                kdupes = sorted({k for k in keys if keys.count(k) > 1})
                assert not kdupes, f"{mod.__name__}: duplicate dict keys {kdupes}"


def test_parity_head_artifact_covers_gated_surface():
    """PARITY_HEAD.json — the committed artifact of the last full
    oracle-parity sweep (scripts_dev/oracle_parity.py with no filters)
    — must contain no bad rows and must cover every gated query that
    both exists in the current registry AND has a FINGERPRINTS.json
    recording (i.e. existed at the artifact's sweep). Queries added
    after the sweep are exempt — they lead the driver window instead."""
    import json
    from pathlib import Path

    import __spark_entry__ as mod

    p = Path(mod.__file__).resolve().parent / "PARITY_HEAD.json"
    assert p.exists(), (
        "run a FULL scripts_dev/oracle_parity.py sweep and commit PARITY_HEAD.json"
    )
    artifact = json.loads(p.read_text())
    results = artifact["results"]
    bad = sorted(n for n, r in results.items() if r["status"] == "bad")
    assert not bad, f"last full sweep recorded failures: {bad[:10]}"
    reg = mod._registry()
    gated = {n for n, (_f, s) in reg.items() if s is not None}
    missing = sorted((gated & set(mod._recorded_fingerprints())) - set(results))
    assert not missing, f"gated queries absent from the last full sweep: {missing[:10]}"


def test_fingerprint_freshness_exempts_fresh_driver_deposit():
    """A CORRECTNESS_r{N}.json the driver deposits AFTER the builder's
    last fingerprint refresh (green rounds newer than the recording
    horizon) must not read as 'missing recording' — while a query that
    greened at-or-before the horizon without a recording (a real
    mid-session omission) still must."""
    import __spark_entry__ as mod

    reg = mod._registry()
    gated = [n for n, (_f, s) in reg.items() if s is not None]
    a, b, c = gated[:3]
    recorded = {a: {"fp": mod._fingerprint(*reg[a]), "round": 7}}  # horizon = 7

    # b greened in round 8 (> horizon): fresh driver deposit -> exempt
    last = {a: 7, b: 8}
    missing, promoted = mod._fingerprint_freshness_issues(recorded, last, reg)
    assert missing == [] and promoted == []

    # c greened in round 6 (<= horizon) with no recording: flagged
    last[c] = 6
    missing, _ = mod._fingerprint_freshness_issues(recorded, last, reg)
    assert missing == [c]

    # drifted recording with no newer green: promoted (bounded, not missing)
    recorded[a] = {"fp": "0" * 16, "round": 7}
    missing, promoted = mod._fingerprint_freshness_issues(recorded, last, reg)
    assert missing == [c] and promoted == [a]

    # a green NEWER than its drifted recording clears the promotion
    last[a] = 8
    _, promoted = mod._fingerprint_freshness_issues(recorded, last, reg)
    assert promoted == []


def test_freshness_audit_fails_on_empty_fingerprints_file():
    """A lost/empty FINGERPRINTS.json must NOT disarm the tripwire: with
    the horizon at 0 every green would read as 'newer than the horizon'
    and be exempt. Instead an empty recorded dict against a non-empty
    green surface is itself the audit failure."""
    import __spark_entry__ as mod

    reg = mod._registry()
    gated = [n for n, (_f, s) in reg.items() if s is not None]
    a, b = gated[:2]
    missing, promoted = mod._fingerprint_freshness_issues({}, {a: 7, b: 8}, reg)
    assert missing == sorted([a, b]) and promoted == []
    # no greens at all -> genuinely nothing to audit, stays clean
    missing, promoted = mod._fingerprint_freshness_issues({}, {}, reg)
    assert missing == [] and promoted == []


def test_meta_tests_survive_fresh_driver_deposit(monkeypatch):
    """Deposit-invariance regression case (the r07/r08 failure class):
    after the driver synthetically deposits an all-green
    CORRECTNESS_r{N+1}.json — every gated query green at a round NEWER
    than anything in FINGERPRINTS.json — the freshness audit stays
    clean AND the edited-query promotion still works when the simulated
    edit is recorded at max(last_green, recorded_round)."""
    import __spark_entry__ as mod

    reg = mod._registry()
    recorded = mod._recorded_fingerprints()
    horizon = max(v.get("round", 0) for v in recorded.values())
    deposit_round = horizon + 1
    fake_last = {
        n for n, (_f, s) in reg.items() if s is not None
    }
    fake_last = {n: deposit_round for n in fake_last}
    monkeypatch.setattr(mod, "_last_green_round", lambda: fake_last)

    # 1. freshness audit: every green is newer than the horizon -> exempt
    missing, promoted = mod._fingerprint_freshness_issues(
        recorded, fake_last, reg
    )
    assert missing == []
    assert len(promoted) <= 50

    # 2. edited-query promotion, simulated exactly as
    #    test_edited_query_leads_next_window constructs it: round =
    #    max(last, recorded) keeps the promotion live despite the deposit
    victim = next(n for n in mod.oracle_sql() if n in recorded)
    fake_round = max(fake_last[victim], recorded[victim]["round"])
    fake_rec = dict(recorded)
    fake_rec[victim] = {"fp": "0" * 16, "round": fake_round}
    monkeypatch.setattr(mod, "_recorded_fingerprints", lambda: fake_rec)
    order = list(mod.queries())
    assert order.index(victim) < 50
