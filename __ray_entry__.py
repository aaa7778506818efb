"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Implementation lives in ``tilers_tools_ray`` (SURVEY.md §2 inventory):
the flagship tile-pyramid engine plus the relational / dedup / ANN /
text-analysis operator layer. No ``ray.init``/``ray.shutdown`` here or
in library code — the driver owns the session.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Ray workers may not share this driver-side sys.path entry (the driver
# calls ray.init before importing this module), so register the package
# for by-value cloudpickle serialization — worker processes then never
# need to import `tilers_tools_ray` from disk.
try:  # pragma: no cover - environment-dependent safety net
    import tilers_tools_ray as _ttr

    from ray import cloudpickle as _cp

    _cp.register_pickle_by_value(_ttr)
except Exception:
    pass

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship: build the base tile layer of the pyramid over the
    deterministic engine corpus (Ray Data end-to-end: read →
    fragment actor pool → part-grouped composite shuffle → stats),
    plus a quick scan of the sf0.001 tables to prove the driver data
    path. Returns a small stats DataFrame (stable schema)."""
    import pandas as pd

    from tilers_tools_ray.relational import ops, queries

    stats = queries.tile_pyramid_stats(SF0001)
    # driver-testdata touch: count rows of two sf0.001 tables via Ray
    n_li = ops.read(SF0001, "lineitem", columns=["l_orderkey"]).count()
    n_docs = ops.read(SF0001, "documents", columns=["doc_id"]).count()
    stats = stats.copy()
    stats["sf_lineitem_rows"] = int(n_li)
    stats["sf_document_rows"] = int(n_docs)
    return pd.DataFrame(stats)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2.
    See ``tilers_tools_ray/relational/queries.py`` for the registry."""
    from tilers_tools_ray.relational import queries as q

    return dict(q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; the
    LSH / heuristic / tiling entries are rows-only by design."""
    from tilers_tools_ray.relational import queries as q

    return dict(q.ORACLES)
