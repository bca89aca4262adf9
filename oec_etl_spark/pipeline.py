"""Declarative pipeline specs: one YAML file = one CDC job.

The reference runs each pipeline as a script binding conns.yaml
endpoints to hardcoded step params
(/root/reference/etl/trade_comtrade_monthly_pipeline.py:89-135); the
Spark engine's equivalent unit of deployment is one EngineConfig plus
a mode. This module makes that a reviewable artifact:

    mode: replay            # replay (backfill) | tail (continuous)
    changes: changelog      # connector NAME (with `connectors:`) or path
    connectors: conns.yaml
    params: {table: transcripts}
    target: /lake/transcripts
    checkpoint: /ckpt/transcripts
    buckets: 32
    table_mode: mor
    minor_compact_after: 4
    constraints:
      text_present: "length(text) > 0"
    derives:                # pre-merge transforms, applied in order
      text: "trim(text)"
      n_chars: "length(text)"
    enrich:                 # stream-static broadcast dim join
      path: dims/roles
      key: role
      dim_key: role_key
      select: {actor_kind: actor_kind}
    archive_dir: done/      # in-loop binlog retention
    files_per_bucket: 4     # sub-bucket write fan-out
    key_bloom_bits: 16384   # per-file key blooms in the zone-map sidecars
    ttl_seconds: 2592000    # event-time TTL (truncate horizon trails max ts)
    ttl_advance_s: 86400    # min horizon move per truncate version
    profile: true           # per-batch payload null counts in lineage

Keys map 1:1 onto EngineConfig fields (a few CLI-style short names are
accepted, see _RENAME); unknown keys fail loudly — a typo'd knob must
never silently become a default. Relative paths resolve against the
YAML file's directory so a spec directory is self-contained.
"""

from __future__ import annotations

import dataclasses
import os

import yaml

from oec_etl_spark.config import EngineConfig

_RENAME = {
    "changes": "changes_dir",
    "target": "target_dir",
    "checkpoint": "checkpoint_dir",
    "buckets": "n_buckets",
    "connectors": "connectors_path",
    "params": "source_params",
    "quarantine": "quarantine_dir",
    "compact_after": "compact_after_deltas",
    "interval": "processing_interval",
    "metrics": "metrics_path",
    "lineage": "lineage_path",
}
_MODES = ("replay", "tail")
_PATH_FIELDS = (
    "target_dir", "checkpoint_dir", "connectors_path", "quarantine_dir",
    "metrics_path", "lineage_path", "archive_dir",
)


def load_pipeline(path: str) -> tuple[str, EngineConfig]:
    """Parse a pipeline YAML into (mode, EngineConfig). Raises on
    unknown keys, bad mode, or missing required fields."""
    with open(path) as f:
        spec = yaml.safe_load(f) or {}
    if not isinstance(spec, dict):
        raise ValueError(f"{path}: pipeline spec must be a mapping")
    mode = spec.pop("mode", "replay")
    if mode not in _MODES:
        raise ValueError(f"{path}: mode must be one of {_MODES}, got {mode!r}")
    fields = {f.name for f in dataclasses.fields(EngineConfig)}
    kwargs: dict = {}
    for key, value in spec.items():
        name = _RENAME.get(key, key)
        if name not in fields:
            raise ValueError(f"{path}: unknown pipeline key {key!r}")
        if key in kwargs or name in kwargs:
            raise ValueError(f"{path}: duplicate setting for {name!r}")
        kwargs[name] = value
    missing = [k for k in ("changes_dir", "target_dir", "checkpoint_dir") if k not in kwargs]
    if missing:
        raise ValueError(f"{path}: missing required keys {missing}")
    base = os.path.dirname(os.path.abspath(path))

    def _abs(p):
        return p if os.path.isabs(p) else os.path.join(base, p)

    for name in _PATH_FIELDS:
        if kwargs.get(name):
            kwargs[name] = _abs(kwargs[name])
    # changes_dir is a connector NAME when connectors_path is set
    if not kwargs.get("connectors_path"):
        kwargs["changes_dir"] = _abs(kwargs["changes_dir"])
    if kwargs.get("mviews"):
        kwargs["mviews"] = [
            dict(m, path=_abs(m["path"])) if m.get("path") else m
            for m in kwargs["mviews"]
        ]
    if kwargs.get("indexes"):
        kwargs["indexes"] = [
            dict(i, path=_abs(i["path"])) if i.get("path") else i
            for i in kwargs["indexes"]
        ]
    if kwargs.get("neardup_gate") and kwargs["neardup_gate"].get("index_path"):
        kwargs["neardup_gate"] = dict(
            kwargs["neardup_gate"],
            index_path=_abs(kwargs["neardup_gate"]["index_path"]),
        )
    if kwargs.get("enrich") and kwargs["enrich"].get("path"):
        kwargs["enrich"] = dict(kwargs["enrich"], path=_abs(kwargs["enrich"]["path"]))
    return mode, EngineConfig(**kwargs)
