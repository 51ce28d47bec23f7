"""Pipeline configuration models (YAML -> validated config tree).

Capability parity with the reference's config layer
(/root/reference/src/data_extractor/models.py:14-84): a pipeline is
``extract`` (one source step) -> ``transform`` (ordered steps) ->
``load`` (one sink step), plus optional incremental-cursor and
retry/backoff settings. Validation is eager and fail-fast, before any
I/O. Unlike the reference, ``on_failure`` is actually honored by the
engine (the reference parses but ignores it — SURVEY.md §0).
"""

from __future__ import annotations

from typing import Any, Literal

from pydantic import BaseModel, Field


class StepConfig(BaseModel):
    """One pipeline step: a registry key plus free-form plugin config."""

    model_config = {"extra": "forbid"}

    type: str = Field(min_length=1)
    config: dict[str, Any] = Field(default_factory=dict)


class IncrementalConfig(BaseModel):
    """Cursor-based incremental extraction (reference engine.py:62-128)."""

    model_config = {"extra": "forbid"}

    cursor_field: str
    initial_value: Any = None
    cursor_param: str | None = None  # API sources: query param to inject


class RetryConfig(BaseModel):
    """Retry with exponential backoff for extract/load (engine.py:201-218)."""

    model_config = {"extra": "forbid"}

    max_attempts: int = Field(default=3, ge=1)
    backoff_seconds: float = Field(default=2.0, ge=0)


class SettingsConfig(BaseModel):
    model_config = {"extra": "forbid"}

    retry: RetryConfig = Field(default_factory=RetryConfig)
    on_failure: Literal["abort", "skip", "warn"] = "abort"


class PipelineDefinition(BaseModel):
    model_config = {"extra": "forbid"}

    name: str = Field(min_length=1)
    extract: StepConfig
    transform: list[StepConfig] = Field(default_factory=list)
    load: StepConfig | None = None
    incremental: IncrementalConfig | None = None


class PipelineConfig(BaseModel):
    model_config = {"extra": "forbid"}

    version: int = 1
    pipeline: PipelineDefinition
    settings: SettingsConfig = Field(default_factory=SettingsConfig)


def load_config(path: str, inline: dict[str, Any] | None = None) -> PipelineConfig:
    """Parse + validate a YAML pipeline config; ``inline`` overrides win
    (reference engine.py:136-147 merge semantics)."""
    import yaml

    with open(path, "r", encoding="utf-8") as fh:
        raw = yaml.safe_load(fh) or {}
    if inline:
        raw = _deep_merge(raw, inline)
    return PipelineConfig.model_validate(raw)


def _deep_merge(base: dict, override: dict) -> dict:
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out
