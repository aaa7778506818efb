"""Lance image+caption scan (SURVEY.md §2 S9).

The task's input_hint names a Lance table of (image_id, bytes, w, h,
fmt, caption, phash) rows. ``ray.data.read_lance`` is the native scan
(column projection + fragment-parallel reads); the ``lance`` package
is NOT installed in this sandbox, so the engine's corpora are parquet
with the identical schema and every pipeline accepts either — a
``.lance`` URI routes here and raises a clear error when the library
is absent instead of silently misreading.
"""

from __future__ import annotations


def is_lance_uri(path) -> bool:
    return str(path).rstrip("/").endswith(".lance")


def read_lance(uri, columns=None, num_blocks=None):
    """Open a Lance dataset as a Ray Dataset (column-pruned scan)."""
    try:
        import lance  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "the 'lance' package is not available in this environment; "
            "the images table is served from parquet with the identical "
            "input_hint schema (S9 stand-in, SURVEY.md §2.1). Install "
            "pylance to scan .lance datasets directly."
        ) from e
    import ray.data as rd

    kwargs = {}
    if columns is not None:
        kwargs["columns"] = columns
    if num_blocks is not None:
        kwargs["override_num_blocks"] = num_blocks
    return rd.read_lance(uri, **kwargs)
