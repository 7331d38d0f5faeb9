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


REFERENCE_DEFAULT_TOML = """\
pipeline_name = "default"
description = "Default tick processing pipeline"
version = "1.0"
tick_file_path = "data/raw/ticks.txt"

[signal_processing]
encoder_type = "derivative"
cpm_modulation_index = 0.2
cpm_lut_size = 1024
amc_carrier_period = 16.0
amc_lut_size = 1024
tick_derivative_imag_scale = 2.0
agc_alpha = 0.125
agc_min_scale = 4
agc_max_scale = 50
winsorize_delta_threshold = 10
min_price = 36600
max_price = 43300
max_jump = 50

[flow_control]
delay_ms = 0.0

[channels]
priority_buffer_size = 4096
standard_buffer_size = 2048

[performance]
target_latency_us = 500
max_latency_us = 1000
target_throughput_tps = 10000.0

[bar_processing]
enabled = true
ticks_per_bar = 21
bar_method = "FIR"
normalization_window_bars = 120
winsorize_bar_threshold = 50
max_bar_jump = 100
bar_derivative_imag_scale = 4.0
"""


def test_reference_toml_layout_loads_unchanged(tmp_path):
    """A user's existing reference TOML (same sections/keys as
    /root/reference/config/pipeline/default.toml) loads as-is."""
    p = tmp_path / "default.toml"
    p.write_text(REFERENCE_DEFAULT_TOML)
    cfg = load_config(p)
    assert cfg.signal_processing.encoder_type == "derivative"
    assert cfg.signal_processing.tick_derivative_imag_scale == 2.0
    assert cfg.signal_processing.cpm_modulation_index == 0.2
    assert cfg.bar_processing.enabled and cfg.bar_processing.ticks_per_bar == 21
    assert cfg.bar_processing.bar_method == "FIR"
    assert cfg.performance.target_throughput_tps == 10000.0


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
