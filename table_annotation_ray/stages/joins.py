"""Time-keyed joins Ray Data lacks natively: as-of join and interval
(range) join, both built on the repo's union + groupby co-location
pattern (``ds.join`` is unusable in Ray 2.49 — ArrowInvalid on empty
hash partitions, see CLAUDE.md).

**As-of join** — for each left row, the single latest right row with
the same key and ``right_ts <= left_ts`` (SQL ``ASOF JOIN``; ties on
``right_ts`` broken by the largest ``right_tiebreak``).  Both sides are
tagged into one schema, one ``groupby(key)`` sort shuffle co-locates a
key's rows, and the per-group match is a vectorized
``np.searchsorted`` against the right side sorted by (ts, tiebreak) —
no per-row Python.

**Interval join** — pairs (left, right) where ``right_ts`` falls in
the left row's half-open ``[start, end)`` (optionally also key-equal).
Each interval is replicated to the fixed-width time buckets it
overlaps; each right row lands in exactly ONE bucket
(``floor(ts/width)``), so every qualifying pair is tested and emitted
exactly once — no cross-bucket dedup needed.  The in-bucket probe is a
sorted ``searchsorted`` range per interval with vectorized pair
expansion (``np.repeat`` + offset arithmetic).

Partitioning assumptions (documented per the custom-operator rule):

* as-of: one key's rows fit in a worker heap (groups are per-entity
  histories; salt or time-split pathological keys upstream).
* interval: one (key, bucket)'s rows fit in a worker heap — choose
  ``bucket_width`` on the order of the interval length so an interval
  replicates to ~2 buckets and buckets stay small.

No reference counterpart (SURVEY §2: relational breadth beyond the
annotator); semantics mirror SQL ASOF JOIN / inequality range join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data as rd

_TS_I8 = "datetime64[us]"


def _sentinel_for(dtype) -> object:
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return pd.Timestamp(0)
    if pd.api.types.is_float_dtype(dtype):
        return 0.0
    if pd.api.types.is_bool_dtype(dtype):
        return False
    if pd.api.types.is_integer_dtype(dtype):
        return 0
    return ""


def _tag_union(
    left: rd.Dataset,
    right: rd.Dataset,
    left_cols: list[str],
    right_cols: list[str],
    extra_left,
    extra_right,
) -> rd.Dataset:
    """Union both sides under ONE schema: every output column exists on
    both sides, sentinel-filled where absent (Arrow schema unification
    rejects dtype drift — CLAUDE.md empty-frame rule).  ``extra_*``
    optionally append computed columns (e.g. bucket ids) per batch and
    may RETURN a longer frame (replication)."""
    all_cols = list(dict.fromkeys(left_cols + right_cols))

    # resolve sentinel values/dtypes from both schemas once, driver-side.
    # Fetching an UNKNOWN schema executes the upstream and DISCARDS it
    # (the union below then re-executes — measured 2x upstream cost on
    # chained joins); materialize-once first so the schema read is
    # metadata-only and the union reuses the same blocks.
    if left.schema(fetch_if_missing=False) is None:
        left = left.materialize()
    if right.schema(fetch_if_missing=False) is None:
        right = right.materialize()
    # the dicts are closed over by value so workers never touch module
    # globals
    fill_val: dict[str, object] = {}
    fill_dt: dict[str, object] = {}
    for sch in (left.schema(), right.schema()):
        for name, typ in zip(sch.names, sch.types):
            if name in all_cols and name not in fill_val:
                # schema types are Arrow types OR numpy dtypes/`object`
                # depending on the block format upstream
                pdt = typ.to_pandas_dtype() if hasattr(typ, "to_pandas_dtype") else typ
                dt = pd.Series([], dtype=pdt).dtype
                if str(typ).startswith(("timestamp", "datetime")):
                    dt = np.dtype(_TS_I8)
                fill_val[name] = _sentinel_for(dt)
                fill_dt[name] = dt

    import pyarrow as pa

    def mk(side_cols: list[str], is_right: bool, extra):
        # emits ARROW: pandas-format blocks make the downstream groupby
        # sort-shuffle ~20× slower in ray 2.49 (measured 62 s vs 3 s on
        # 450k rows / 20k keys)
        def f(b: pd.DataFrame) -> pa.Table:
            out = b[side_cols].copy()
            if extra is not None:
                out = extra(out)
            n = len(out)
            for c in all_cols:
                if c not in out.columns:
                    out[c] = pd.Series([fill_val[c]] * n, dtype=fill_dt[c])
            out["__j_side"] = np.full(n, 1 if is_right else 0, dtype=np.int8)
            extras = [c for c in out.columns if c.startswith("__j_") and c != "__j_side"]
            return pa.Table.from_pandas(
                out[all_cols + extras + ["__j_side"]], preserve_index=False
            )

        return f

    return left.map_batches(
        mk(left_cols, False, extra_left), batch_format="pandas"
    ).union(
        right.map_batches(mk(right_cols, True, extra_right), batch_format="pandas", batch_size=16384)
    )


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
    right_cols: list[str],
    right_tiebreak: str,
    how: str = "inner",
) -> rd.Dataset:
    """For every left row, attach the latest right row of the same
    ``key`` with ``right_ts <= left_ts`` (ties: max ``right_tiebreak``).

    ``left_cols`` / ``right_cols`` are the payload columns each side
    contributes (must be disjoint apart from ``key``; rename upstream
    with ``map_batches`` if both sides share a timestamp column name).
    ``how='left'`` keeps unmatched left rows with nulls.
    """
    if key not in left_cols or key not in right_cols:
        raise ValueError("key must be listed in both column sets")
    overlap = (set(left_cols) & set(right_cols)) - {key}
    if overlap:
        raise ValueError(f"overlapping payload columns: {sorted(overlap)}")
    out_right = [c for c in right_cols if c != key]
    out_left = list(left_cols)

    # exchange on a 64-value hash bucket of the key (a Ray group per
    # key is pathological at entity-scale key counts — CLAUDE.md r3);
    # in-group: loop over key segments, numpy searchsorted bodies, one
    # output frame per bucket
    def add_kb(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__j_kb"] = (
            pd.util.hash_pandas_object(b[key], index=False).to_numpy()
            % np.uint64(64)
        ).astype(np.int64)
        return b

    tagged = _tag_union(left, right, left_cols, right_cols, add_kb, add_kb)

    def match(g: pd.DataFrame) -> pd.DataFrame:
        g = g.reset_index(drop=True)
        is_r = g["__j_side"].to_numpy() == 1
        lt = np.where(
            ~is_r, g[left_ts].to_numpy().astype(_TS_I8).astype(np.int64), 0
        )
        rt = np.where(
            is_r, g[right_ts].to_numpy().astype(_TS_I8).astype(np.int64), 0
        )
        tb = np.where(is_r, g[right_tiebreak].to_numpy(), 0)
        l_take: list[np.ndarray] = []
        r_take: list[np.ndarray] = []
        m_take: list[np.ndarray] = []
        for _, idx in g.groupby(key, sort=False).indices.items():
            seg_l = idx[~is_r[idx]]
            seg_r = idx[is_r[idx]]
            if len(seg_l) == 0:
                continue
            if len(seg_r) == 0:
                if how == "left":
                    l_take.append(seg_l)
                    r_take.append(np.zeros(len(seg_l), dtype=np.int64))
                    m_take.append(np.zeros(len(seg_l), dtype=bool))
                continue
            order = np.lexsort((tb[seg_r], rt[seg_r]))
            seg_r = seg_r[order]
            pos = np.searchsorted(rt[seg_r], lt[seg_l], side="right") - 1
            matched = pos >= 0
            if how == "inner":
                seg_l, pos = seg_l[matched], pos[matched]
                if len(seg_l) == 0:
                    continue
                l_take.append(seg_l)
                r_take.append(seg_r[pos])
                m_take.append(np.ones(len(seg_l), dtype=bool))
            else:
                l_take.append(seg_l)
                r_take.append(seg_r[np.clip(pos, 0, None)])
                m_take.append(matched)
        sampleL = g[out_left].iloc[:0]
        sampleR = g[out_right].iloc[:0]
        if not l_take:
            return pd.concat([sampleL, sampleR], axis=1)
        li = np.concatenate(l_take)
        ri = np.concatenate(r_take)
        mm = np.concatenate(m_take)
        out = g.iloc[li][out_left].reset_index(drop=True)
        take = g.iloc[ri][out_right].reset_index(drop=True)
        if how == "inner":
            for c in out_right:
                out[c] = take[c]
            return out
        m = pd.Series(mm)
        for c in out_right:
            out[c] = take[c].where(m)
        return out

    return tagged.groupby("__j_kb").map_groups(match, batch_format="pandas")


def interval_join(
    left: rd.Dataset,
    right: rd.Dataset,
    start: str,
    end: str,
    right_ts: str,
    left_cols: list[str],
    right_cols: list[str],
    key: str | None = None,
    bucket_width_us: int = 300_000_000,
) -> rd.Dataset:
    """Emit one row per (left, right) pair with ``start <= right_ts <
    end`` (and ``left[key] == right[key]`` when ``key`` is given).

    ``left_cols`` must include ``start``/``end`` (+ ``key``);
    ``right_cols`` must include ``right_ts`` (+ ``key``).  Output =
    left_cols + right_cols (key deduplicated).  Timestamps are
    ``timestamp[us]``; ``bucket_width_us`` sets the replication
    granularity (default 5 min).
    """
    w = np.int64(bucket_width_us)

    def explode_left(b: pd.DataFrame) -> pd.DataFrame:
        s = b[start].to_numpy().astype(_TS_I8).astype(np.int64)
        e = b[end].to_numpy().astype(_TS_I8).astype(np.int64)
        b0 = s // w
        b1 = np.maximum(e - 1, s) // w  # half-open end: last covered bucket
        reps = (b1 - b0 + 1).astype(np.int64)
        out = b.iloc[np.repeat(np.arange(len(b)), reps)].copy()
        total = int(reps.sum())
        offs = np.arange(total) - np.repeat(np.cumsum(reps) - reps, reps)
        out["__j_bucket"] = np.repeat(b0, reps) + offs
        return out

    def bucket_right(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        ts = b[right_ts].to_numpy().astype(_TS_I8).astype(np.int64)
        out["__j_bucket"] = ts // w
        return out

    group_keys = ["__j_bucket"] if key is None else [key, "__j_bucket"]

    # the exchange groups on a 64-value HASH of (key, time-bucket) —
    # a Ray group per (key, bucket) is pathological once keys × covered
    # buckets reach the tens of thousands (CLAUDE.md r3; measured 110 s
    # → seconds at sf0.1); the in-group probe loops over its (key,
    # bucket) segments with pure-numpy bodies and materializes ONE
    # frame per bucket group
    def add_gb(extra):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            out = extra(b)
            out["__j_gb"] = (
                pd.util.hash_pandas_object(out[group_keys], index=False).to_numpy()
                % np.uint64(64)
            ).astype(np.int64)
            return out

        return f

    tagged = _tag_union(
        left, right, left_cols, right_cols,
        add_gb(explode_left), add_gb(bucket_right),
    )
    out_cols = list(dict.fromkeys(left_cols + right_cols))

    def probe(g: pd.DataFrame) -> pd.DataFrame:
        g = g.reset_index(drop=True)
        is_r = g["__j_side"].to_numpy() == 1
        ts_all = np.where(
            is_r,
            g[right_ts].to_numpy().astype(_TS_I8).astype(np.int64),
            0,
        )
        s_all = np.where(
            is_r, 0, g[start].to_numpy().astype(_TS_I8).astype(np.int64)
        )
        e_all = np.where(
            is_r, 0, g[end].to_numpy().astype(_TS_I8).astype(np.int64)
        )
        l_take: list[np.ndarray] = []
        r_take: list[np.ndarray] = []
        for _, idx in g.groupby(group_keys, sort=False).indices.items():
            seg_r = idx[is_r[idx]]
            seg_l = idx[~is_r[idx]]
            if len(seg_l) == 0 or len(seg_r) == 0:
                continue
            order = np.argsort(ts_all[seg_r], kind="stable")
            seg_r = seg_r[order]
            r_ts = ts_all[seg_r]
            lo = np.searchsorted(r_ts, s_all[seg_l], side="left")
            hi = np.searchsorted(r_ts, e_all[seg_l], side="left")
            # empty/inverted intervals (end <= start) match nothing —
            # without the clamp hi < lo yields a NEGATIVE count and
            # np.repeat raises, crashing the whole bucket (review r4)
            cnt = np.maximum(hi - lo, 0).astype(np.int64)
            total = int(cnt.sum())
            if total == 0:
                continue
            l_take.append(np.repeat(seg_l, cnt))
            pos = np.repeat(lo, cnt) + (
                np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
            )
            r_take.append(seg_r[pos])
        if not l_take:
            return g[out_cols].iloc[:0]
        li = np.concatenate(l_take)
        ri = np.concatenate(r_take)
        out = g.iloc[li][[c for c in left_cols]].reset_index(drop=True)
        rr = g.iloc[ri].reset_index(drop=True)
        for c in right_cols:
            if c not in out.columns:
                out[c] = rr[c]
        return out[out_cols]

    return tagged.groupby("__j_gb").map_groups(probe, batch_format="pandas")


def nearest_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
    right_cols: list[str],
    right_tiebreak: str,
    tolerance: pd.Timedelta | None = None,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Nearest-neighbor temporal join: for every left row, the same-key
    right row minimizing ``|right_ts − left_ts|`` (optionally within
    ``tolerance``) — the sensor-alignment / context-attachment variant
    of :func:`asof_join` (which looks backward only).  Distance ties
    break toward the EARLIER right row, then min ``right_tiebreak`` —
    the SQL ``ORDER BY abs(diff), r.ts, r.tiebreak LIMIT 1`` contract.
    Inner semantics: left rows with no same-key right row (or none
    within tolerance) drop.

    Same shape as asof_join: one hash(key) % num_buckets co-location
    under the sentinel-unified schema, in-bucket sort + two-candidate
    searchsorted pick (backward + forward neighbor), all vectorized."""
    if key not in left_cols or key not in right_cols:
        raise ValueError("key must be listed in both column sets")
    overlap = (set(left_cols) & set(right_cols)) - {key}
    if overlap:
        raise ValueError(f"overlapping payload columns: {sorted(overlap)}")
    out_right = [c for c in right_cols if c != key]
    out_left = list(left_cols)
    tol = (
        np.int64(tolerance // pd.Timedelta(microseconds=1))
        if tolerance is not None
        else None
    )

    def add_kb(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__j_kb"] = (
            pd.util.hash_pandas_object(b[key], index=False).to_numpy()
            % np.uint64(64)
        ).astype(np.int64)
        return b

    tagged = _tag_union(left, right, left_cols, right_cols, add_kb, add_kb)

    def match(g: pd.DataFrame) -> pd.DataFrame:
        g = g.reset_index(drop=True)
        is_r = g["__j_side"].to_numpy() == 1
        lt = np.where(
            ~is_r, g[left_ts].to_numpy().astype(_TS_I8).astype(np.int64), 0
        )
        rt = np.where(
            is_r, g[right_ts].to_numpy().astype(_TS_I8).astype(np.int64), 0
        )
        tb = np.where(is_r, g[right_tiebreak].to_numpy(), 0)
        l_take: list[np.ndarray] = []
        r_take: list[np.ndarray] = []
        for _, idx in g.groupby(key, sort=False).indices.items():
            seg_l = idx[~is_r[idx]]
            seg_r = idx[is_r[idx]]
            if len(seg_l) == 0 or len(seg_r) == 0:
                continue
            # sort right by (ts, tiebreak): within an equal-ts run the
            # FIRST element is the min-tiebreak one, and searchsorted
            # boundaries land on run edges
            order = np.lexsort((tb[seg_r], rt[seg_r]))
            seg_r = seg_r[order]
            rts = rt[seg_r]
            lts = lt[seg_l]
            # back = last right <= lt ; fwd = first right > lt
            fwd = np.searchsorted(rts, lts, side="right")
            back = fwd - 1
            has_b = back >= 0
            has_f = fwd < len(rts)
            d_b = np.where(has_b, lts - rts[np.clip(back, 0, None)],
                           np.iinfo(np.int64).max)
            d_f = np.where(
                has_f, rts[np.clip(fwd, None, len(rts) - 1)] - lts,
                np.iinfo(np.int64).max,
            )
            # prefer backward on distance ties (earlier right row);
            # equal-ts runs: `side=right` puts back on the run's LAST
            # element — step to the run's first for the min tiebreak
            use_b = d_b <= d_f
            pick = np.where(use_b, back, fwd)
            dist = np.where(use_b, d_b, d_f)
            ok = dist < np.iinfo(np.int64).max
            if tol is not None:
                ok &= dist <= tol
            if not ok.any():
                continue
            pick = pick[ok]
            # min-tiebreak within the picked ts run
            pick = np.searchsorted(rts, rts[pick], side="left")
            l_take.append(seg_l[ok])
            r_take.append(seg_r[pick])
        sampleL = g[out_left].iloc[:0]
        sampleR = g[out_right].iloc[:0]
        if not l_take:
            return pd.concat([sampleL, sampleR], axis=1)
        li = np.concatenate(l_take)
        ri = np.concatenate(r_take)
        out = g.iloc[li][out_left].reset_index(drop=True)
        take = g.iloc[ri][out_right].reset_index(drop=True)
        for c in out_right:
            out[c] = take[c]
        return out

    return tagged.groupby("__j_kb").map_groups(match, batch_format="pandas")


def _lev1_equal_len(xs: np.ndarray, ys: np.ndarray, L: int) -> np.ndarray:
    """Vectorized 'exactly one substitution' check for same-length
    string pairs: unicode codepoint matrices, count mismatching
    positions == 1."""
    A = np.array(xs, dtype=f"<U{L}").view(np.uint32).reshape(len(xs), L)
    B = np.array(ys, dtype=f"<U{L}").view(np.uint32).reshape(len(ys), L)
    return (A != B).sum(axis=1) == 1


def _lev1_del(xs: np.ndarray, ys: np.ndarray, L: int) -> np.ndarray:
    """Vectorized 'one deletion' check: ``xs`` of length L, ``ys`` of
    length L-1; valid iff longest-common-prefix + longest-common-suffix
    >= L-1 (the classic two-pointer identity, batched)."""
    A = np.array(xs, dtype=f"<U{L}").view(np.uint32).reshape(len(xs), L)
    B = np.array(ys, dtype=f"<U{L-1}").view(np.uint32).reshape(len(ys), L - 1)
    eqp = A[:, : L - 1] == B
    p = np.where(eqp.all(axis=1), L - 1, eqp.argmin(axis=1))
    eqs = (A[:, 1:] == B)[:, ::-1]
    s = np.where(eqs.all(axis=1), L - 1, eqs.argmin(axis=1))
    return p + s >= L - 1


def _lev1_mask(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact edit-distance<=1 verdict per (a, b) string pair, grouped by
    length class so each class runs one vectorized matrix compare."""
    la = np.fromiter((len(x) for x in a), np.int64, len(a))
    lb = np.fromiter((len(x) for x in b), np.int64, len(b))
    out = np.zeros(len(a), dtype=bool)
    eq = la == lb
    for L in np.unique(la[eq]):
        m = eq & (la == L)
        if L == 0:
            out[m] = False  # equal empty strings are distinct() upstream
        else:
            out[m] = _lev1_equal_len(a[m], b[m], int(L))
    d1 = la == lb + 1
    for L in np.unique(la[d1]):
        if L < 2:
            m = d1 & (la == L)
            out[m] = True  # 1-char vs empty: one deletion
            continue
        m = d1 & (la == L)
        out[m] = _lev1_del(a[m], b[m], int(L))
    d2 = lb == la + 1
    for L in np.unique(lb[d2]):
        m = d2 & (lb == L)
        if L < 2:
            out[m] = True
        else:
            out[m] = _lev1_del(b[m], a[m], int(L))
    return out


def fuzzy_pairs_1del(
    ds: rd.Dataset,
    col: str,
    max_group: int = 1000,
    num_buckets: int = 64,
    trunc_counter=None,
) -> rd.Dataset:
    """Edit-distance-<=1 fuzzy self-join over the DISTINCT strings of
    ``col`` — the SymSpell deletion-neighborhood join: every pair of
    distinct strings at Levenshtein distance 1 (equality is excluded by
    distinctness), found WITHOUT an all-pairs compare.

    Completeness: two strings at distance <=1 always share an element
    of ``{s} ∪ {s minus one char}`` (substitution → both delete the
    differing position; insert/delete → one deletes into the other), so
    co-locating by deletion variant sees every true pair.  Shared
    variants can also arise at distance 2 (``abc``/``bca`` share
    ``bc``), so candidates are verified with an exact vectorized
    distance-<=1 check (one codepoint-matrix compare per length class,
    no per-pair Python DP).

    Shape: distinct strings (one bucketed_distinct exchange) → variant
    explode (×(len+1) skinny rows) → ONE hash(variant) co-location with
    per-variant pairwise expansion — Σ|variant-group|², never |vocab|²
    — → exact verify → ONE pair-hash distinct exchange (a pair can be
    found under several shared variants).  Variant groups larger than
    ``max_group`` are truncated to the lexicographically-first members
    and COUNTED on ``trunc_counter`` (never silent; a hot variant is a
    mass near-collision, e.g. a serial-number prefix).  Output
    ``(a, b)`` with ``a < b``.
    """
    import pyarrow as pa

    from ..stages.agg import bucketed_distinct

    uniq = bucketed_distinct(ds.select_columns([col]), [col])
    nb = np.uint64(num_buckets)

    def explode(b: pd.DataFrame) -> pa.Table:
        outs_v, outs_o = [], []
        for s in b[col].dropna().to_numpy():
            outs_v.append(s)
            outs_o.append(s)
            for i in range(len(s)):
                outs_v.append(s[:i] + s[i + 1:])
                outs_o.append(s)
        var = pd.Series(outs_v, dtype=object)
        bkt = (
            pd.util.hash_pandas_object(var, index=False).to_numpy() % nb
        ).astype(np.int64)
        return pa.table(
            {
                "__fz_var": pa.array(outs_v, pa.string()),
                "orig": pa.array(outs_o, pa.string()),
                "__fz_bkt": pa.array(bkt, pa.int64()),
            }
        )

    MULT = np.uint64(0x9E3779B97F4A7C15)

    def candidate_pairs(g: pd.DataFrame) -> pa.Table:
        g = (
            g.drop_duplicates(["__fz_var", "orig"])
            .sort_values(["__fz_var", "orig"], kind="mergesort")
            .reset_index(drop=True)
        )
        codes, _ = pd.factorize(g["__fz_var"], sort=False)
        _, starts, counts = np.unique(codes, return_index=True, return_counts=True)
        n_trunc = int((counts > max_group).sum())
        if n_trunc:
            kept = np.minimum(counts, max_group)
            dropped = int((counts * (counts - 1) // 2
                           - kept * (kept - 1) // 2).sum())
            if trunc_counter is not None:
                ray.get(trunc_counter.add.remote(n_trunc, dropped))
            keep_mask = (np.arange(len(codes))
                         - np.repeat(starts, counts)) < max_group
            g = g[keep_mask].reset_index(drop=True)
            codes = codes[keep_mask]
            _, starts, counts = np.unique(
                codes, return_index=True, return_counts=True)
        origs = g["orig"].to_numpy()
        pos = np.arange(len(codes), dtype=np.int64)
        rank = pos - np.repeat(starts, counts)
        rem = np.repeat(counts, counts) - rank - 1
        ii = np.repeat(pos, rem)
        if len(ii) == 0:
            return pa.table(
                {"a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
                 "__fz_pb": pa.array([], pa.int64())}
            )
        off = (
            np.arange(int(rem.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(rem) - rem, rem) + 1
        )
        x, y = origs[ii], origs[ii + off]
        swap = x > y
        a = np.where(swap, y, x)
        b = np.where(swap, x, y)
        pairs = pd.DataFrame({"a": a, "b": b}).drop_duplicates()
        ok = _lev1_mask(pairs["a"].to_numpy(), pairs["b"].to_numpy())
        pairs = pairs[ok]
        h = (
            pd.util.hash_pandas_object(pairs["a"], index=False).to_numpy()
            .astype(np.uint64) * MULT
            ^ pd.util.hash_pandas_object(pairs["b"], index=False).to_numpy()
            .astype(np.uint64)
        )
        return pa.table(
            {
                "a": pa.array(pairs["a"].to_numpy(), pa.string()),
                "b": pa.array(pairs["b"].to_numpy(), pa.string()),
                "__fz_pb": pa.array((h % nb).astype(np.int64), pa.int64()),
            }
        )

    def pair_dedup(g: pd.DataFrame) -> pa.Table:
        out = g[["a", "b"]].drop_duplicates()
        return pa.table(
            {
                "a": pa.array(out["a"].to_numpy(), pa.string()),
                "b": pa.array(out["b"].to_numpy(), pa.string()),
            }
        )

    return (
        uniq.map_batches(explode, batch_format="pandas")
        .groupby("__fz_bkt")
        .map_groups(candidate_pairs, batch_format="pandas")
        .groupby("__fz_pb")
        .map_groups(pair_dedup, batch_format="pandas")
    )
