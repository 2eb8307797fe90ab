"""CDC core: partitioned keyed-MERGE apply with an exactly-once manifest sink."""

from mex_extractors_ray.cdc.apply import ingest_change_log, read_lake
from mex_extractors_ray.cdc.manifest import PartitionManifest, read_manifest
from mex_extractors_ray.cdc.replayer import replay_reference

__all__ = [
    "ingest_change_log",
    "read_lake",
    "PartitionManifest",
    "read_manifest",
    "replay_reference",
    "replicate_lake",
]


def __getattr__(name):
    # lazy: replicate pulls in pipelines.incremental_export; keep the core
    # import light for workers that only need the apply
    if name == "replicate_lake":
        from mex_extractors_ray.cdc.replicate import replicate_lake

        return replicate_lake
    raise AttributeError(name)
