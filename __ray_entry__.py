"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship exact-dedup pipeline on sf0.001;
``queries()`` / ``oracle_sql()`` expose one entry per implemented
operator family from SURVEY.md §2 (implementations live in
``duplicate_finder_ray/pipelines/queries.py``). Ray is initialised by the
driver before import — nothing here calls ray.init/ray.shutdown.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from duplicate_finder_ray.pipelines.queries import ORACLE_SQL, QUERIES


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: exact-dup membership
    table (file_id, …, group_id, n_files, rank, is_keeper)."""
    return QUERIES["exact_dup_members"]("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
