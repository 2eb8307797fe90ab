"""Write-time constraint gate on the change stream, with a dead-letter
side table.

The reference gates every load: YAML filter rules reject records before
the sink with a logged reason (``mex/extractors/filters.py:18-84``,
``mex/extractors/logging.py:13-32``), and checked loads block on rule
violations (``mex/extractors/pipeline/checks/main.py``). This module puts
the same discipline at the CDC ingest boundary: events violating a
declarative rule list never reach the merge — AS IF NEVER SENT, so
last-wins is computed over the valid events only — and land instead in a
dead-letter parquet dir with ``_reject_reason`` lineage.

Exactly-once story (why the DLQ needs no two-phase commit): the dead
letters are a PURE FUNCTION of (change log, constraint list) — the log is
the durable input and the gate is deterministic — so the DLQ dir is a
recomputable VIEW, rebuilt wholesale on each gated ingest of the window
(rm + rewrite, the same discipline as a transform view). The LAKE's
exactly-once guarantees are untouched: the gate runs before the shuffle,
and the apply path sees an ordinary (smaller) stream.

Rule shape = ``stages.filters`` (the same dicts the YAML loader
``config.filter_yaml_to_rules`` emits): reject-rules, first match wins.
Delete events carry null payloads, so value rules (``>``, ``in`` on
payload columns) pass them through (SQL null-comparison semantics) unless
a rule targets ``op``/``doc_id`` explicitly.
"""

from __future__ import annotations

import shutil
from pathlib import Path


def gate_change_log(log_paths, constraints: list[dict],
                    rejects_out: str | Path | None = None):
    """The CLEAN change stream as a Dataset (one pass; rejects side-written
    inside the same pass when ``rejects_out`` is given — the dir is
    REBUILT, see module docstring)."""
    import ray.data

    from mex_extractors_ray.stages.filters import apply_rule_filter

    ds = (log_paths if isinstance(log_paths, ray.data.Dataset)
          else ray.data.read_parquet(log_paths))
    if rejects_out is not None:
        rejects_out = Path(rejects_out)
        shutil.rmtree(rejects_out, ignore_errors=True)
        rejects_out.mkdir(parents=True)
        rejects_out = str(rejects_out)
    return apply_rule_filter(ds, constraints, reject_sink_dir=rejects_out)


def read_rejects(rejects_dir: str | Path):
    """The dead-letter table (original event columns + ``_reject_reason``)
    as a Dataset."""
    import ray.data

    return ray.data.read_parquet(str(rejects_dir))
