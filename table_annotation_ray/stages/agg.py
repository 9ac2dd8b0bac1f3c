"""High-cardinality-safe distributed group-by reduction.

Ray 2.49's ``groupby(key).aggregate(...)`` runs per-KEY Python in both
the AggregateMap and AggregateReduce suboperators, so its cost scales
with key cardinality, not row count — measured 36 s vs 1-4 s against
this module's pattern on a 450k-row / 20k-key exchange (and
``map_groups`` pays a per-group UDF call, which is fine at thousands of
groups but not at millions).  The safe shape for million-key
aggregations:

1. **map-side partial combine** — each batch reduces to one row per
   (key, batch) with a vectorized pandas groupby, tagged with ``bucket
   = row_hash(keys) % num_buckets``;
2. **bucket exchange** — ONE ``groupby(bucket)`` sort shuffle over ≤64
   distinct values (per-bucket Python only);
3. **vectorized finalize** — each bucket group reduces with one pandas
   groupby over all its keys at once.

Supported composable reducers: sum / min / max / count (count partials
sum in the finalize).  Mean = sum ÷ count by the caller.  Output is an
Arrow table (pandas blocks would poison any downstream sort-shuffle —
measured 62 s vs 3 s).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

_PARTIAL_OPS = {"sum": "sum", "min": "min", "max": "max", "count": "size"}
_FINAL_OPS = {"sum": "sum", "min": "min", "max": "max", "count": "sum"}


def grouped_reduce(
    ds: rd.Dataset,
    key_cols: list[str],
    reducers: dict[str, tuple[str | None, str]],
    num_buckets: int = 64,
    batch_size: int | None = 65536,
) -> rd.Dataset:
    """``reducers``: out_col -> (in_col, op) with op in sum|min|max|
    count (in_col ignored for count).  Returns one row per distinct key
    combination with the key columns and every out_col."""
    for out_col, (_, op) in reducers.items():
        if op not in _PARTIAL_OPS:
            raise ValueError(f"unsupported op {op!r} for {out_col!r}")

    in_cols = list(
        dict.fromkeys(c for c, _ in reducers.values() if c is not None)
    )
    nb = np.uint64(num_buckets)

    def partial(b: pd.DataFrame) -> pa.Table:
        g = b[key_cols + in_cols].groupby(key_cols, sort=False)
        pieces = {}
        for out_col, (in_col, op) in reducers.items():
            kind = _PARTIAL_OPS[op]
            pieces[out_col] = g.size() if kind == "size" else g[in_col].agg(kind)
        out = pd.DataFrame(pieces).reset_index()
        keyframe = out[key_cols[0]] if len(key_cols) == 1 else out[key_cols]
        bkt = (
            pd.util.hash_pandas_object(keyframe, index=False).to_numpy() % nb
        ).astype(np.int64)
        out["__gr_bkt"] = bkt
        return pa.Table.from_pandas(out, preserve_index=False)

    def finalize(g: pd.DataFrame) -> pa.Table:
        # partial columns already carry the OUT names; count partials sum
        gb = g.groupby(key_cols, sort=False)
        pieces = {
            out_col: gb[out_col].agg(_FINAL_OPS[op])
            for out_col, (_, op) in reducers.items()
        }
        out = pd.DataFrame(pieces).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    kw = {} if batch_size is None else {"batch_size": batch_size}
    return (
        ds.map_batches(partial, batch_format="pandas", **kw)
        .groupby("__gr_bkt")
        .map_groups(finalize, batch_format="pandas")
    )


def bucketed_distinct(
    ds: rd.Dataset,
    key_cols: list[str],
    num_buckets: int = 64,
    batch_size: int = 65536,
) -> rd.Dataset:
    """First row per distinct key combination — ``groupby(keys).head(1)``
    without per-key Python: hash-bucket exchange + one vectorized
    ``drop_duplicates`` per bucket.  Row CONTENT for duplicate keys is
    whichever copy sorts first within the bucket group (callers here
    dedup identical rows, so the choice is immaterial)."""
    nb = np.uint64(num_buckets)

    def tag(b: pd.DataFrame) -> pa.Table:
        out = b.drop_duplicates(key_cols)  # map-side shrink
        keyframe = out[key_cols[0]] if len(key_cols) == 1 else out[key_cols]
        out = out.copy()
        out["__bd_bkt"] = (
            pd.util.hash_pandas_object(keyframe, index=False).to_numpy() % nb
        ).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def uniq(g: pd.DataFrame) -> pa.Table:
        out = g.drop_duplicates(key_cols).drop(columns="__bd_bkt")
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        ds.map_batches(tag, batch_format="pandas", batch_size=batch_size)
        .groupby("__bd_bkt")
        .map_groups(uniq, batch_format="pandas")
    )
