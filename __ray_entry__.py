"""Driver contract for the graft builder (Ray Data target).

The driver initialises Ray BEFORE importing this module; nothing here (or in
the gitprov_ray library) calls ``ray.init``/``ray.shutdown``.

- ``entry()``: flagship KG pipeline (documents-derived page corpus →
  sorted deduped PROV triples) on /root/testdata/sf0.001.
- ``queries()``: one callable per implemented operator family
  (SURVEY.md §2 + the training-data ops); each takes ``sf_dir``.
- ``oracle_sql()``: DuckDB twins for the SQL-expressible subset; column
  names match the Ray results exactly.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 (driver checks rows>=0)."""
    from gitprov_ray.pipelines import flagship

    return flagship.flagship("/root/testdata/sf0.001", num_buckets=16)


def queries() -> dict[str, Callable[[str], Any]]:
    from gitprov_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from gitprov_ray.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
