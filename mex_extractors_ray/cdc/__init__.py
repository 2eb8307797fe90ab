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
]
