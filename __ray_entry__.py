"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ``ray.init()`` / ``ray.shutdown()``.

* ``entry()``      — flagship pipeline on /root/testdata/sf0.001: build the
  full inverted index (analyze → lexicon → sort-shuffle → compressed
  segments + WAND) over the ``documents`` table and serve the fixed BM25
  query set with Block-Max WAND through the actor-pool executor.
* ``queries()``    — one entry per implemented operator/pipeline
  (SURVEY.md §2 + the training-data ops); see ``pisa_ray.catalog``.
* ``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible entry.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from pisa_ray.catalog import QUERY_SET, get_index_dir
    from pisa_ray.query.engine import run_queries

    sf_dir = "/root/testdata/sf0.001"
    index_dir = get_index_dir(sf_dir)
    queries_list = [(qid, " ".join(terms)) for qid, terms in QUERY_SET]
    res = run_queries(queries_list, index_dir, k=10,
                      algorithm="block_max_wand", concurrency=2)
    return res.to_pandas()


def queries() -> dict[str, Callable[[str], Any]]:
    from pisa_ray.catalog import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from pisa_ray.catalog import ORACLE_SQL

    return dict(ORACLE_SQL)
