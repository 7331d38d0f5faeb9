"""Pipeline configuration: TOML round-trip + validation.

Mirrors the reference's config surface and validation rules
(/root/reference/src/PipelineConfig.jl:28-221 structs, :537-634 rules,
shipped defaults /root/reference/config/pipeline/default.toml) so a user
of the reference can bring their TOML file unchanged.
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass, field, asdict
from pathlib import Path
from typing import Any

VALID_ENCODERS = ("hexad16", "cpm", "amc", "derivative")
VALID_BAR_METHODS = ("boxcar", "FIR")


@dataclass(frozen=True)
class SignalProcessingConfig:
    """PipelineConfig.jl:28-66 (struct defaults at :44-58)."""

    agc_alpha: float = 0.125
    agc_min_scale: int = 4
    agc_max_scale: int = 50
    winsorize_delta_threshold: int = 10
    min_price: int = 36600
    max_price: int = 43300
    max_jump: int = 50
    encoder_type: str = "amc"
    cpm_modulation_index: float = 0.5
    cpm_lut_size: int = 1024
    # Validated but never wired into the hot loop (increment is hardcoded
    # 2^32/16 — TickHotLoopF32.jl:112-115). Preserved deliberately.
    amc_carrier_period: float = 16.0
    amc_lut_size: int = 1024
    tick_derivative_imag_scale: float = 4.0


@dataclass(frozen=True)
class BarProcessingConfig:
    """PipelineConfig.jl:100-131."""

    enabled: bool = False
    ticks_per_bar: int = 21
    normalization_window_bars: int = 120
    winsorize_bar_threshold: int = 50
    max_bar_jump: int = 100
    bar_derivative_imag_scale: float = 4.0
    bar_method: str = "boxcar"


@dataclass(frozen=True)
class FlowControlConfig:
    delay_ms: float = 0.0


@dataclass(frozen=True)
class ChannelConfig:
    priority_buffer_size: int = 4096
    standard_buffer_size: int = 2048


@dataclass(frozen=True)
class PerformanceConfig:
    target_latency_us: int = 500
    max_latency_us: int = 1000
    target_throughput_tps: float = 10000.0


@dataclass(frozen=True)
class PipelineConfig:
    pipeline_name: str = "default"
    description: str = ""
    version: str = "1.0"
    tick_file_path: str = ""
    signal_processing: SignalProcessingConfig = field(default_factory=SignalProcessingConfig)
    bar_processing: BarProcessingConfig = field(default_factory=BarProcessingConfig)
    flow_control: FlowControlConfig = field(default_factory=FlowControlConfig)
    channels: ChannelConfig = field(default_factory=ChannelConfig)
    performance: PerformanceConfig = field(default_factory=PerformanceConfig)

    def to_dict(self) -> dict[str, Any]:
        return asdict(self)


def _section(d: dict[str, Any], name: str) -> dict[str, Any]:
    return dict(d.get(name, {}) or {})


def config_from_dict(d: dict[str, Any]) -> PipelineConfig:
    return PipelineConfig(
        pipeline_name=d.get("pipeline_name", "default"),
        description=d.get("description", ""),
        version=d.get("version", "1.0"),
        tick_file_path=d.get("tick_file_path", ""),
        signal_processing=SignalProcessingConfig(**_section(d, "signal_processing")),
        bar_processing=BarProcessingConfig(**_section(d, "bar_processing")),
        flow_control=FlowControlConfig(**_section(d, "flow_control")),
        channels=ChannelConfig(**_section(d, "channels")),
        performance=PerformanceConfig(**_section(d, "performance")),
    )


def load_config(path: str | Path) -> PipelineConfig:
    """Load + validate a TOML config (PipelineConfig.jl:356-466)."""
    with open(path, "rb") as f:
        data = tomllib.load(f)
    cfg = config_from_dict(data)
    ok, errors = validate_config(cfg)
    if not ok:
        raise ValueError("invalid pipeline config: " + "; ".join(errors))
    return cfg


def save_config(cfg: PipelineConfig, path: str | Path) -> None:
    """TOML writer (stdlib has no dumper; minimal emitter for round-trip,
    PipelineConfig.jl:477-524)."""

    def fmt(v: Any) -> str:
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, str):
            return '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'
        return repr(v)

    d = cfg.to_dict()
    lines = []
    for key in ("pipeline_name", "description", "version", "tick_file_path"):
        lines.append(f"{key} = {fmt(d[key])}")
    for section in ("signal_processing", "bar_processing", "flow_control", "channels", "performance"):
        lines.append("")
        lines.append(f"[{section}]")
        for k, v in d[section].items():
            lines.append(f"{k} = {fmt(v)}")
    Path(path).write_text("\n".join(lines) + "\n")


def validate_config(cfg: PipelineConfig) -> tuple[bool, list[str]]:
    """Every rule from PipelineConfig.jl:537-634, same messages."""
    errors: list[str] = []
    sp = cfg.signal_processing
    if sp.agc_min_scale >= sp.agc_max_scale:
        errors.append("agc_min_scale must be < agc_max_scale")
    if sp.agc_min_scale < 1:
        errors.append("agc_min_scale must be >= 1")
    if not (0.0 < sp.agc_alpha < 1.0):
        errors.append("agc_alpha must be in range (0.0, 1.0)")
    if sp.winsorize_delta_threshold <= 0:
        errors.append("winsorize_delta_threshold must be positive")
    if sp.min_price >= sp.max_price:
        errors.append("min_price must be < max_price")
    if sp.max_jump <= 0:
        errors.append("max_jump must be positive")
    if sp.encoder_type not in VALID_ENCODERS:
        errors.append('encoder_type must be either "hexad16", "cpm", "amc", or "derivative"')
    if sp.encoder_type == "cpm":
        if not (0.0 < sp.cpm_modulation_index <= 1.0):
            errors.append("cpm_modulation_index must be in range (0.0, 1.0]")
        if sp.cpm_lut_size != 1024:
            errors.append("cpm_lut_size must be 1024 (only size currently supported)")
    if sp.encoder_type == "amc":
        if sp.amc_carrier_period <= 0.0:
            errors.append("amc_carrier_period must be positive")
        if sp.amc_lut_size != 1024:
            errors.append("amc_lut_size must be 1024 (only size currently supported)")
    if sp.encoder_type == "derivative":
        if sp.tick_derivative_imag_scale <= 0.0:
            errors.append("tick_derivative_imag_scale must be positive")
    if cfg.flow_control.delay_ms < 0.0:
        errors.append("delay_ms must be non-negative")
    if cfg.channels.priority_buffer_size < 1:
        errors.append("priority_buffer_size must be >= 1")
    if cfg.channels.standard_buffer_size < 1:
        errors.append("standard_buffer_size must be >= 1")
    bp = cfg.bar_processing
    if bp.ticks_per_bar < 1:
        errors.append("ticks_per_bar must be >= 1")
    if bp.normalization_window_bars < 1:
        errors.append("normalization_window_bars must be >= 1")
    if bp.normalization_window_bars < 20 and bp.enabled:
        errors.append("normalization_window_bars should be >= 20 for stable normalization (recommended)")
    if bp.winsorize_bar_threshold <= 0:
        errors.append("winsorize_bar_threshold must be positive")
    if bp.max_bar_jump <= 0:
        errors.append("max_bar_jump must be positive")
    if bp.bar_derivative_imag_scale <= 0.0:
        errors.append("bar_derivative_imag_scale must be positive")
    if bp.bar_method not in VALID_BAR_METHODS:
        errors.append('bar_method must be either "boxcar" or "FIR"')
    perf = cfg.performance
    if perf.max_latency_us <= perf.target_latency_us:
        errors.append("max_latency_us must be > target_latency_us")
    if perf.target_throughput_tps <= 0.0:
        errors.append("target_throughput_tps must be positive")
    return (not errors, errors)


DEFAULT_CONFIG = PipelineConfig(
    # Shipped default: derivative encoder (config/pipeline/default.toml:12),
    # bars enabled, 21 ticks/bar, FIR, 120-bar normalization window.
    signal_processing=SignalProcessingConfig(encoder_type="derivative", tick_derivative_imag_scale=2.0,
                                             cpm_modulation_index=0.2),
    bar_processing=BarProcessingConfig(enabled=True, ticks_per_bar=21, normalization_window_bars=120,
                                       bar_method="FIR"),
)
