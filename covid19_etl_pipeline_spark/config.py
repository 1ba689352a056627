"""YAML pipeline configuration (reference parity: ``config/config.yaml``
loaded by ``main.py`` at startup — sources, database, spark block,
countries of interest, config/config.yaml:4-66).

The engine keeps every knob callable-first (library functions take
explicit arguments), and this module binds a config FILE onto that
surface: ``load_config`` parses/validates the yaml, ``build_registry``
turns the ``data_sources`` block into a :class:`SourceRegistry`, and
``session_kwargs`` maps the ``spark`` block onto :func:`get_spark`.
``python -m covid19_etl_pipeline_spark --config pipeline.yaml`` drives
the whole E2E from the file, exactly like ``python main.py`` does in the
reference — but the file is optional, never load-bearing state.

Scale note: configuration is driver-only metadata — nothing here touches
the data path. The one scale-relevant mapping is ``spark.config``
passthrough, which lets a deployment pin shuffle partitions / memory per
environment without code changes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import yaml

from covid19_etl_pipeline_spark.sources.http import NamedSource, SourceRegistry


@dataclass(frozen=True)
class SourceConfig:
    """One ``data_sources`` entry (url + format + optional filename
    pattern with a ``{date}`` slot)."""

    name: str
    url: str
    format: str = "csv"
    description: str = ""
    filename_pattern: str | None = None

    def pattern(self) -> str:
        return self.filename_pattern or f"{self.name}_{{date}}.{self.format}"


@dataclass(frozen=True)
class PipelineConfig:
    """Validated view of the yaml file; every field has a sane default
    so a partial config (or none) still drives a full run."""

    sources: tuple[SourceConfig, ...] = ()
    countries: tuple[str, ...] = ()
    app_name: str | None = None
    master: str | None = None
    spark_conf: dict[str, str] = field(default_factory=dict)
    serving_root: str | None = None
    serving_url: str | None = None  # JDBC url for the external hand-off
    raw: dict[str, Any] = field(default_factory=dict)


def load_config(path: str | Path) -> PipelineConfig:
    """Parse + validate a pipeline yaml (reference config.yaml shape)."""
    doc = yaml.safe_load(Path(path).read_text()) or {}
    if not isinstance(doc, dict):
        raise ValueError(f"config root must be a mapping, got {type(doc).__name__}")

    sources = []
    for name, entry in (doc.get("data_sources") or {}).items():
        if not isinstance(entry, dict) or "url" not in entry:
            raise ValueError(f"data_sources.{name} needs a url")
        sources.append(
            SourceConfig(
                name=name,
                url=str(entry["url"]),
                format=str(entry.get("format", "csv")),
                description=str(entry.get("description", "")),
                filename_pattern=entry.get("filename_pattern"),
            )
        )

    spark_block = doc.get("spark") or {}
    conf = {str(k): str(v) for k, v in (spark_block.get("config") or {}).items()}

    processing = doc.get("processing") or {}
    countries = tuple(str(c) for c in processing.get("countries_of_interest") or ())

    database = doc.get("database") or {}
    return PipelineConfig(
        sources=tuple(sources),
        countries=countries,
        app_name=spark_block.get("app_name"),
        master=spark_block.get("master"),
        spark_conf=conf,
        serving_root=database.get("path"),
        serving_url=database.get("jdbc_url"),
        raw=doc,
    )


def build_registry(cfg: PipelineConfig) -> SourceRegistry:
    """Bind the config's sources into a named registry (S2)."""
    reg = SourceRegistry()
    for s in cfg.sources:
        reg.register(NamedSource(name=s.name, url=s.url, filename_pattern=s.pattern()))
    return reg


def session_kwargs(cfg: PipelineConfig) -> dict[str, Any]:
    """Map the ``spark`` block onto :func:`session.get_spark` kwargs."""
    kwargs: dict[str, Any] = {}
    if cfg.app_name:
        kwargs["app_name"] = cfg.app_name
    if cfg.master:
        kwargs["master"] = cfg.master
    conf = dict(cfg.spark_conf)
    shuffle = conf.pop("spark.sql.shuffle.partitions", None)
    if shuffle is not None:
        kwargs["shuffle_partitions"] = int(shuffle)
    if conf:
        kwargs["extra_conf"] = conf
    return kwargs
