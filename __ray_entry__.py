"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship CDC pipeline (events-derived change log →
full partitioned ingest → manifest-committed lake → final-state projection)
on sf0.001. ``queries()``/``oracle_sql()`` expose the operator catalog from
``mex_extractors_ray.pipelines.catalog`` (one entry per operator family of
SURVEY.md §2 plus the training-data extensions).

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ``ray.init()``/``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from mex_extractors_ray.pipelines import catalog


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    return catalog.q_cdc_final_state("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sql()
