"""Distributed data-quality audit — declarative column/table checks
with exact violation counts (the Great-Expectations-style contract
gate a 100-TB ingest runs before anything downstream trusts the data).

Check kinds and their distributed shapes:

* ``not_null`` / ``in_range`` / ``accepted_values`` / ``matches_regex``
  — map-only: every batch emits ONE partial-count row; the driver sums
  a few-KB frame.  All same-table map checks share a SINGLE pass.
* ``unique`` — total count vs distinct count via the
  ``agg.bucketed_distinct`` hash exchange (never a driver-side set).
* ``foreign_key`` — orphan child keys via the size-gated
  ``relational.anti_join_keys`` (broadcast parents when small,
  co-location exchange otherwise).

Returns one row per check: ``(check, n_rows, n_violations, passed)``.
Beyond-reference operator (SURVEY §2: pipeline breadth beyond the
annotator); semantics mirror plain SQL COUNT/filter aggregates, which
is how the oracle pins them.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


@dataclass
class Check:
    name: str
    table: str
    kind: str  # not_null | in_range | accepted_values | matches_regex | unique | foreign_key
    col: str | list[str] | None = None
    lo: float | None = None
    hi: float | None = None
    values: list | None = None
    pattern: str | None = None
    parent_table: str | None = None
    parent_col: str | None = None
    extra: dict = field(default_factory=dict)


_MAP_KINDS = ("not_null", "in_range", "accepted_values", "matches_regex")


def _map_violations(b: pd.DataFrame, checks: list[Check]) -> pa.Table:
    names, viols = [], []
    for c in checks:
        s = b[c.col]
        if c.kind == "not_null":
            bad = s.isna()
        elif c.kind == "in_range":
            bad = ~s.between(c.lo, c.hi) | s.isna()
        elif c.kind == "accepted_values":
            bad = ~s.isin(c.values)
        else:  # matches_regex
            pat = re.compile(c.pattern)
            bad = ~s.fillna("").str.match(pat)
        names.append(c.name)
        viols.append(int(bad.to_numpy().sum()))
    return pa.table(
        {
            "check": pa.array(names, pa.string()),
            "n_rows": pa.array([len(b)] * len(names), pa.int64()),
            "n_violations": pa.array(viols, pa.int64()),
        }
    )


def dq_audit(tables: dict[str, rd.Dataset], checks: list[Check]) -> pd.DataFrame:
    """Run every check, one shared pass per table for the map-only
    kinds.  ``tables`` maps table name -> Dataset (already column-pruned
    by the caller).  The returned frame is driver-sized by construction
    (one row per check)."""
    from .agg import bucketed_distinct
    from .relational import anti_join_keys

    rows: list[dict] = []

    for tname in sorted({c.table for c in checks}):
        mine = [c for c in checks if c.table == tname]
        ds = tables[tname]
        mapc = [c for c in mine if c.kind in _MAP_KINDS]
        if mapc:
            part = ds.map_batches(
                lambda b, _cs=mapc: _map_violations(b, _cs),
                batch_format="pandas",
            ).to_pandas()
            agg = part.groupby("check", sort=False)[["n_rows", "n_violations"]].sum()
            for c in mapc:
                rows.append(
                    {
                        "check": c.name,
                        "n_rows": int(agg.loc[c.name, "n_rows"]),
                        "n_violations": int(agg.loc[c.name, "n_violations"]),
                    }
                )
        for c in mine:
            if c.kind == "unique":
                cols = [c.col] if isinstance(c.col, str) else list(c.col)
                total = ds.count()
                # count() on the distinct exchange is metadata-cheap
                distinct = bucketed_distinct(
                    ds.map_batches(
                        lambda t, _cols=cols: t.select(_cols),
                        batch_format="pyarrow",
                    ),
                    cols,
                ).count()
                rows.append(
                    {
                        "check": c.name,
                        "n_rows": int(total),
                        "n_violations": int(total - distinct),
                    }
                )
            elif c.kind == "foreign_key":
                parent = tables[c.parent_table]
                orphans = anti_join_keys(ds, parent, c.col, c.parent_col)
                rows.append(
                    {
                        "check": c.name,
                        "n_rows": int(ds.count()),
                        "n_violations": int(orphans.count()),
                    }
                )
            elif c.kind not in _MAP_KINDS:
                raise ValueError(f"unknown check kind {c.kind!r}")

    out = pd.DataFrame(rows).sort_values("check").reset_index(drop=True)
    out["passed"] = out["n_violations"] == 0
    return out


def snapshot_diff(
    old: rd.Dataset,
    new: rd.Dataset,
    key: str,
    compare_cols: list[str],
    num_buckets: int = 64,
) -> rd.Dataset:
    """Table-snapshot reconciliation — per-key diff status between two
    versions of a table (the data-reconciliation twin of
    :func:`dq_audit`): ``added`` (new only), ``removed`` (old only),
    ``changed`` (both sides, any ``compare_cols`` value differs, NaN ==
    NaN), ``unchanged``.  Keys must be unique per side (snapshot
    contract; duplicates raise).

    One hash(key) co-location exchange of (key, compare cols) rows —
    payload columns outside ``compare_cols`` never move.  Returns a
    Dataset ``(key, status)``; aggregate downstream for the summary."""
    nb = np.uint64(num_buckets)
    cols = [key] + list(compare_cols)

    def tagger(side: int):
        def tag(b: pd.DataFrame) -> pa.Table:
            out = b[cols].copy()
            out["__sd_side"] = np.int64(side)
            h = pd.util.hash_pandas_object(out[key], index=False).to_numpy()
            out["__sd_bkt"] = (h.astype(np.uint64) % nb).astype(np.int64)
            return pa.Table.from_pandas(out, preserve_index=False)
        return tag

    both = old.map_batches(tagger(0), batch_format="pandas").union(
        new.map_batches(tagger(1), batch_format="pandas")
    )

    def diff(g: pd.DataFrame) -> pa.Table:
        o = g[g["__sd_side"] == 0]
        n = g[g["__sd_side"] == 1]
        for side, name in ((o, "old"), (n, "new")):
            if side[key].duplicated().any():
                raise ValueError(f"snapshot_diff: duplicate keys on {name} side")
        m = o.merge(n, on=key, how="outer", suffixes=("_o", "_n"),
                    indicator=True)
        status = np.where(
            m["_merge"] == "left_only", "removed",
            np.where(m["_merge"] == "right_only", "added", "unchanged"),
        ).astype(object)
        bothmask = (m["_merge"] == "both").to_numpy()
        if bothmask.any():
            changed = np.zeros(len(m), dtype=bool)
            for c in compare_cols:
                a, b = m[c + "_o"], m[c + "_n"]
                neq = ~((a == b) | (a.isna() & b.isna()))
                changed |= neq.to_numpy()
            status[bothmask & changed] = "changed"
        return pa.table(
            {
                key: pa.Array.from_pandas(m[key]),
                "status": pa.array(status.astype(str), pa.string()),
            }
        )

    return both.groupby("__sd_bkt").map_groups(diff, batch_format="pandas")


def embedding_audit(
    ds: rd.Dataset,
    vec_col: str = "embedding",
    expected_dim: int | None = None,
) -> pd.DataFrame:
    """Embedding-column health gate — the vector twin of
    :func:`dq_audit`: row count, wrong-dimension rows, rows containing
    non-finite values, and the L2-norm min/max/mean.  A corrupt
    embedding export (truncated rows, NaNs from a failed encoder, norm
    collapse) should fail HERE, not inside an ANN index three stages
    later.

    Map-only: each batch emits one partial row (counts + norm
    sum/min/max over its rows); the driver folds ≤ blocks rows.
    ``expected_dim`` defaults to the first row's length."""
    first = ds.take(1)
    if not first:
        return pd.DataFrame(
            {"n_rows": [0], "n_bad_dim": [0], "n_nonfinite": [0],
             "min_norm": [np.nan], "max_norm": [np.nan], "mean_norm": [np.nan]}
        )
    dim = expected_dim if expected_dim is not None else len(first[0][vec_col])

    def part(b: pd.DataFrame) -> pd.DataFrame:
        lens = b[vec_col].map(len).to_numpy()
        good = lens == dim
        n_bad = int((~good).sum())
        rows = {
            "n": len(b), "bad": n_bad, "nonfin": 0,
            "s": 0.0, "mn": np.inf, "mx": -np.inf, "k": 0,
        }
        if good.any():
            m = np.vstack(
                [np.asarray(v, dtype=np.float64)
                 for v, g in zip(b[vec_col], good) if g]
            )
            finite = np.isfinite(m).all(axis=1)
            rows["nonfin"] = int((~finite).sum())
            if finite.any():
                norms = np.sqrt((m[finite] ** 2).sum(axis=1))
                rows["s"] = float(norms.sum())
                rows["mn"] = float(norms.min())
                rows["mx"] = float(norms.max())
                rows["k"] = int(len(norms))
        return pd.DataFrame({kk: [vv] for kk, vv in rows.items()})

    p = ds.map_batches(part, batch_format="pandas").to_pandas()
    k = int(p["k"].sum())
    return pd.DataFrame(
        {
            "n_rows": [int(p["n"].sum())],
            "n_bad_dim": [int(p["bad"].sum())],
            "n_nonfinite": [int(p["nonfin"].sum())],
            "min_norm": [round(float(p["mn"].min()), 6) if k else np.nan],
            "max_norm": [round(float(p["mx"].max()), 6) if k else np.nan],
            "mean_norm": [round(float(p["s"].sum()) / k, 6) if k else np.nan],
        }
    )


def benford_audit(ds: rd.Dataset, col: str) -> pd.DataFrame:
    """Benford's-law first-digit audit — the classic fraud /
    synthetic-data screen: the distribution of leading significant
    digits of ``col`` against the Benford expectation ``log10(1+1/d)``.
    Contract: values must be >= 1 (the integer part carries the leading
    digit); audit a shifted/scaled column upstream otherwise.

    Output: 9 rows ``(digit, n, share, expected_share)`` — shares
    rounded half-away at 6 dp (oracle convention).

    Shape: one map-only pass (vectorized repeated integer division —
    exact, no log10 float edge on powers of ten) emitting <= 9 rows per
    batch, one 9-key reduce, driver finalize.  Nothing scales with rows
    but the scan."""
    from .agg import grouped_reduce

    def partial(b: pd.DataFrame) -> pa.Table:
        d = np.floor(b[col].to_numpy(dtype=np.float64)).astype(np.int64)
        if (d < 1).any():
            raise ValueError(f"benford_audit: {col} has values < 1")
        while (d >= 10).any():
            d = np.where(d >= 10, d // 10, d)
        vc = pd.Series(d).value_counts(sort=False)
        return pa.table(
            {
                "digit": pa.array(vc.index.to_numpy(dtype=np.int64), pa.int64()),
                "n": pa.array(vc.to_numpy().astype(np.int64), pa.int64()),
            }
        )

    counts = grouped_reduce(
        ds.map_batches(partial, batch_format="pandas"),
        ["digit"],
        {"n": ("n", "sum")},
    ).to_pandas()
    counts = counts.sort_values("digit").reset_index(drop=True)
    total = float(counts["n"].sum())
    share = counts["n"].to_numpy(dtype=np.float64) / total
    expected = np.log10(1.0 + 1.0 / counts["digit"].to_numpy(dtype=np.float64))

    def _r6(a: np.ndarray) -> np.ndarray:
        return np.sign(a) * np.floor(np.abs(a) * 1e6 + 0.5) / 1e6

    return pd.DataFrame(
        {
            "digit": counts["digit"].astype("int64"),
            "n": counts["n"].astype("int64"),
            "share": _r6(share),
            "expected_share": _r6(expected),
        }
    )


def table_checksum(
    ds: rd.Dataset,
    cols: list[str],
    sep: str = "|",
) -> pd.DataFrame:
    """Order-independent content fingerprint of a table — the
    cross-system reconciliation primitive (same checksum ⇔ same
    multiset of rows, regardless of partitioning, file layout or row
    order): ``sum(md5_60bit(canonical_row)) mod (2^63-1)``.

    Canonical row = the ``sep``-joined string forms of ``cols`` (ints
    render as decimal, NULL as empty — document the contract per use;
    callers with floats must quantize first).  md5 keeps the digest
    engine-portable (DuckDB/Spark/Python all agree), 60 bits per row
    keeps the sum in HUGEINT/Python-int range at any row count, and the
    SUM makes the reduce fully associative: every batch emits one
    (count, partial-mod) row, map-only — nothing shuffles.

    The per-row md5 is inherent to content checksumming (no vectorized
    kernel exists); it's one C call per row over an already-built
    string column.  Returns one row: ``(n_rows, checksum)``.
    """
    import hashlib

    M = 9223372036854775807  # 2^63 - 1

    def partial(b: pd.DataFrame) -> pa.Table:
        parts = []
        for c in cols:
            s = b[c]
            if s.dtype.kind in "iu":
                parts.append(s.astype("int64").astype(str))
            else:
                parts.append(s.fillna("").astype(str))
        key = parts[0]
        for p in parts[1:]:
            key = key + sep + p
        tot = 0
        for s in key.to_numpy():
            tot += int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
        return pa.table(
            {
                "n": pa.array([len(b)], pa.int64()),
                "c": pa.array([tot % M], pa.int64()),
            }
        )

    p = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return pd.DataFrame(
        {
            "n_rows": pd.Series([int(p["n"].sum())], dtype="int64"),
            "checksum": pd.Series(
                [int(sum(int(x) for x in p["c"])) % M], dtype="int64"
            ),
        }
    )


def k_anonymity(
    ds: rd.Dataset,
    qi_cols: list[str],
    k: int = 10,
    num_buckets: int = 64,
) -> rd.Dataset:
    """k-anonymity audit over a quasi-identifier combination — the
    re-identification risk check a PII-bearing corpus runs before
    release: every QI equivalence class with its row count and a
    ``risky`` flag (count < k means an individual hides among fewer
    than k records).  ONE grouped_reduce exchange (map-side partial
    counts); output ``(qi..., n, risky)``.
    """
    import pyarrow as pa

    from .agg import grouped_reduce

    counts = grouped_reduce(
        ds.select_columns(list(qi_cols)),
        list(qi_cols),
        {"n": (None, "count")},
        num_buckets=num_buckets,
    )
    kk = int(k)

    def flag(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy().astype(np.int64)
        t = t.set_column(t.schema.get_field_index("n"), "n",
                         pa.array(n, pa.int64()))
        return t.append_column(
            "risky", pa.array((n < kk).astype(np.int64), pa.int64())
        )

    return counts.map_batches(flag, batch_format="pyarrow")


def functional_dependencies(
    ds: rd.Dataset,
    pairs: list[tuple[str, str]],
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Functional-dependency discovery over candidate column pairs —
    the schema-profiling primitive behind key inference and
    normalization advice: ``det -> dep`` holds iff every determinant
    value maps to exactly one dependent value.

    Per candidate pair: ONE bucketed-distinct exchange over (det, dep)
    followed by a skinny per-det distinct count (both rows are
    distinct-pair-bounded, never raw data).  Output one row per pair:
    ``(det, dep, n_det, n_pairs, n_violating, holds)`` where
    ``n_violating`` counts determinant values with >1 dependent.
    """
    from .agg import bucketed_distinct, grouped_reduce

    rows = []
    for det, dep in pairs:
        dp = bucketed_distinct(
            ds.select_columns([det, dep]), [det, dep],
            num_buckets=num_buckets,
        )
        per_det = grouped_reduce(
            dp, [det], {"n_dep": (None, "count")}, num_buckets=num_buckets
        ).to_pandas()
        n_det = int(len(per_det))
        n_pairs = int(per_det["n_dep"].sum())
        n_viol = int((per_det["n_dep"] > 1).sum())
        rows.append(
            {
                "det": det, "dep": dep, "n_det": n_det,
                "n_pairs": n_pairs, "n_violating": n_viol,
                "holds": int(n_viol == 0),
            }
        )
    out = pd.DataFrame(rows)
    for c in ("n_det", "n_pairs", "n_violating", "holds"):
        out[c] = out[c].astype("int64")
    return out


def l_diversity(
    ds: rd.Dataset,
    qi_cols: list[str],
    sensitive_col: str,
    l: int = 3,
    num_buckets: int = 64,
) -> rd.Dataset:
    """l-diversity audit — :func:`k_anonymity`'s necessary companion:
    a QI class can be large yet still leak if everyone in it shares
    the same SENSITIVE value.  Per QI equivalence class: row count,
    distinct sensitive values, and ``risky`` when diversity < l.
    One distinct-count exchange (bucketed distinct on QI+sensitive,
    then per-QI counts) + one row-count exchange.  Output
    ``(qi..., n, n_sensitive, risky)``.
    """
    import pyarrow as pa

    from .agg import distinct_count_by_key, grouped_reduce
    from .relational import equi_join

    qi = list(qi_cols)
    counts = grouped_reduce(
        ds.select_columns(qi), qi, {"n": (None, "count")},
        num_buckets=num_buckets,
    )
    div = distinct_count_by_key(
        ds.select_columns(qi + [sensitive_col]), qi, sensitive_col,
        out_col="n_sensitive", num_buckets=num_buckets,
    )
    # join on a composite int is unavailable for string QI sets; the
    # QI class table is class-cardinality-sized -> broadcast merge
    cdf = counts.to_pandas()
    ddf = div.to_pandas()
    out = cdf.merge(ddf, on=qi, how="inner")
    out["n"] = out["n"].astype("int64")
    out["n_sensitive"] = out["n_sensitive"].astype("int64")
    out["risky"] = (out["n_sensitive"] < int(l)).astype("int64")
    return out.sort_values(qi).reset_index(drop=True)
