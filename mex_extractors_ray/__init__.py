"""mex_extractors_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch re-expression of the query/data-processing capabilities of
``robert-koch-institut/mex-extractors`` (reference at ``/root/reference``) as a
change-log-tail → lake-upsert architecture over Parquet tables of pre-tokenized
training sequences, built on ``ray.data.Dataset`` + ``map_batches`` over
zero-copy Arrow, with actor pools for stateful stages.

Subpackages
-----------
``cdc``        the keyed-MERGE upsert core: schema registry, partitioned apply,
               exactly-once manifest sink, single-process reference replayer.
``stages``     the operator library mirroring the reference's transform/filter/
               dedup/join/aggregate inventory (SURVEY.md §2) plus training-data
               ops (dedup families, similarity search, text analysis).
``sources``    reader helpers (CSV/JSON/XML/parquet) mirroring the reference's
               connector shapes.
``pipelines``  the query catalog exposed through ``__ray_entry__``.

None of this code calls ``ray.init()``/``ray.shutdown()``; sessions are owned
by the caller (driver, tests' conftest fixture, bench.py).
"""

__version__ = "0.1.0"
