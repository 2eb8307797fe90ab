"""Engine settings tree — the reference's aggregated pydantic settings
(``mex/extractors/settings.py:36-147``: one ``ExtractorsSettings`` with
per-extractor submodels, env-overridable) re-expressed for the CDC engine.

Every knob the pipelines read lives here, env-overridable with the
``MEX_RAY_`` prefix (the reference uses ``MEX_``), so ``ray job submit``
deployments configure the engine without code changes.
"""

from __future__ import annotations

import os

from pydantic import BaseModel, Field


class IngestSettings(BaseModel):
    num_partitions: int = Field(64, description="lake partition count (P); changes go through repartition_lake")
    batch_size: int = Field(65_536, description="resolve/combiner batch rows")
    shuffle: str = Field("hash", description="'hash' (co-location only) or 'sort'")
    mode: str = Field("last_wins", description="'last_wins' or 'first_wins' apply semantics")
    delta: bool = Field(True, description="write per-window delta files (bytes ∝ delta, not partition)")
    compact_threshold: int = Field(8, description="fold base+deltas into one file at this many files")
    skip_sources: list[str] = Field(default_factory=list,
                                    description="sources dropped at resolve (skip_extractors analog)")


class TailSettings(BaseModel):
    poll_seconds: float = 5.0
    log_dir: str = ""
    lake_dir: str = ""


class ChecksSettings(BaseModel):
    rules: list[dict] = Field(default_factory=list, description="drift rules (state/checks.py)")
    blocking: bool = Field(True, description="raise on violation (the reference's blocking=True)")


class BenchSettings(BaseModel):
    sf_dir: str = "/root/testdata/sf0.1"
    num_cpus: int = 32
    events_multiplier: int = Field(20, description="log size = events-table rows x this")


class EngineSettings(BaseModel):
    """The aggregate tree (ExtractorsSettings analog)."""

    ingest: IngestSettings = Field(default_factory=IngestSettings)
    tail: TailSettings = Field(default_factory=TailSettings)
    checks: ChecksSettings = Field(default_factory=ChecksSettings)
    bench: BenchSettings = Field(default_factory=BenchSettings)
    registry_path: str = Field("", description="schema-registry JSON (empty = stock sequence_registry)")
    work_root: str = "/tmp/mex_ray_work"

    @classmethod
    def from_env(cls, env: dict | None = None) -> "EngineSettings":
        """Flat env override: MEX_RAY_<SECTION>_<FIELD>, e.g.
        MEX_RAY_INGEST_NUM_PARTITIONS=128."""
        env = dict(os.environ if env is None else env)
        s = cls()
        for section_name in ("ingest", "tail", "checks", "bench"):
            section = getattr(s, section_name)
            for field in type(section).model_fields:
                key = f"MEX_RAY_{section_name.upper()}_{field.upper()}"
                if key in env:
                    current = getattr(section, field)
                    raw = env[key]
                    if isinstance(current, bool):
                        value = raw.lower() in ("1", "true", "yes")
                    elif isinstance(current, int):
                        value = int(raw)
                    elif isinstance(current, float):
                        value = float(raw)
                    elif isinstance(current, list):
                        import json

                        value = json.loads(raw)
                    else:
                        value = raw
                    setattr(section, field, value)
        for field in ("registry_path", "work_root"):
            key = f"MEX_RAY_{field.upper()}"
            if key in env:
                setattr(s, field, env[key])
        return s
