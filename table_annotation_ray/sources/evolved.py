"""Schema-evolution-tolerant parquet reading — the lakehouse reality
that plain ``read_parquet`` rejects: a table written over months gains
and loses columns, and a union of those files must normalize every
block to ONE schema (mixed block schemas break the first downstream
exchange — CLAUDE.md union rule).

``read_parquet_evolved`` resolves the UNION schema from file FOOTERS
only (metadata reads, no data I/O on the driver), groups paths by
footer schema so each group is one parallel ``read_parquet``, and
maps every group onto the union schema: missing columns materialize
as typed nulls, int64 promotes to float64 where any file widened, and
column order is canonical (first-seen).  Incompatible redefinitions
(e.g. string vs int64) raise at PLAN time with the offending file —
fail-at-read, not mid-pipeline.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

_PROMOTE = {
    (pa.int64(), pa.float64()): pa.float64(),
    (pa.float64(), pa.int64()): pa.float64(),
    (pa.int32(), pa.int64()): pa.int64(),
    (pa.int64(), pa.int32()): pa.int64(),
}


def _resolve(a: pa.DataType, b: pa.DataType, col: str, path: str) -> pa.DataType:
    if a.equals(b):
        return a
    p = _PROMOTE.get((a, b))
    if p is not None:
        return p
    raise ValueError(
        f"incompatible schema evolution for column {col!r}: "
        f"{a} vs {b} (file {path})"
    )


def read_parquet_evolved(paths: list[str], **read_kwargs) -> rd.Dataset:
    """Read parquet files with differing schemas as ONE dataset on the
    union schema (module docstring).  ``read_kwargs`` pass through to
    each group's ``read_parquet`` (e.g. ``columns`` is applied AFTER
    normalization — pass it to prune the union)."""
    want_cols = read_kwargs.pop("columns", None)

    union: dict[str, pa.DataType] = {}
    groups: dict[tuple, list[str]] = {}
    for p in paths:
        sch = pq.read_schema(p)
        for f in sch:
            if f.name in union:
                union[f.name] = _resolve(union[f.name], f.type, f.name, p)
            else:
                union[f.name] = f.type
        key = tuple((f.name, str(f.type)) for f in sch)
        groups.setdefault(key, []).append(p)

    if want_cols is not None:
        missing = set(want_cols) - set(union)
        if missing:
            raise ValueError(f"columns not in any file: {sorted(missing)}")
        union = {c: union[c] for c in want_cols}
    target = pa.schema(list(union.items()))

    def normalize(t: pa.Table) -> pa.Table:
        cols = []
        for f in target:
            if f.name in t.schema.names:
                cols.append(t[f.name].cast(f.type))
            else:
                cols.append(pa.nulls(len(t), f.type))
        return pa.Table.from_arrays(cols, schema=target)

    out = None
    for key, ps in groups.items():
        part = rd.read_parquet(ps, **read_kwargs).map_batches(
            normalize, batch_format="pyarrow"
        )
        out = part if out is None else out.union(part)
    return out
