"""Config TOML round-trip + validation rules
(/root/reference/src/PipelineConfig.jl:537-634 test style)."""

from __future__ import annotations

import pytest

from tickdatapipeline_spark.config import (
    BarProcessingConfig,
    PipelineConfig,
    SignalProcessingConfig,
    load_config,
    save_config,
    validate_config,
)


def test_defaults_valid():
    ok, errors = validate_config(PipelineConfig())
    assert ok, errors


def test_invalid_encoder_rejected():
    cfg = PipelineConfig(signal_processing=SignalProcessingConfig(encoder_type="fm"))
    ok, errors = validate_config(cfg)
    assert not ok
    assert any("encoder" in e for e in errors)


@pytest.mark.parametrize("field,value", [
    ("winsorize_delta_threshold", 0),
    ("max_jump", -1),
    ("agc_alpha", 1.5),
])
def test_signal_range_rules(field, value):
    cfg = PipelineConfig(signal_processing=SignalProcessingConfig(**{field: value}))
    ok, _ = validate_config(cfg)
    assert not ok


def test_cpm_rule_is_encoder_conditional():
    # mirrors the reference: cpm_* rules only apply when encoder is cpm
    bad = SignalProcessingConfig(encoder_type="cpm", cpm_modulation_index=0.0)
    ok, _ = validate_config(PipelineConfig(signal_processing=bad))
    assert not ok
    ignored = SignalProcessingConfig(encoder_type="amc", cpm_modulation_index=0.0)
    ok, _ = validate_config(PipelineConfig(signal_processing=ignored))
    assert ok


def test_price_range_ordering_rule():
    cfg = PipelineConfig(signal_processing=SignalProcessingConfig(min_price=50000, max_price=40000))
    ok, _ = validate_config(cfg)
    assert not ok


def test_bar_rules():
    cfg = PipelineConfig(bar_processing=BarProcessingConfig(enabled=True, ticks_per_bar=0))
    ok, _ = validate_config(cfg)
    assert not ok
    cfg = PipelineConfig(bar_processing=BarProcessingConfig(enabled=True, bar_method="ema"))
    ok, _ = validate_config(cfg)
    assert not ok


def test_toml_round_trip(tmp_path):
    cfg = PipelineConfig(
        pipeline_name="rt",
        signal_processing=SignalProcessingConfig(encoder_type="cpm", cpm_modulation_index=0.25),
        bar_processing=BarProcessingConfig(enabled=True, ticks_per_bar=12, bar_method="FIR"),
    )
    p = tmp_path / "cfg.toml"
    save_config(cfg, p)
    back = load_config(p)
    assert back == cfg
