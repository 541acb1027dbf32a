"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in refined_ray) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``      — flagship web-page ER pipeline on sf0.001.
- ``queries()``    — one callable per implemented operator/pipeline
                     from SURVEY.md §2 (see refined_ray/pipelines/queries.py).
- ``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible
                     query (column names and float canonicalization
                     match the Ray side exactly).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from refined_ray.pipelines.entity_resolution import er_cluster_pages

    return er_cluster_pages("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from refined_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from refined_ray.pipelines.queries import oracles

    return oracles()
