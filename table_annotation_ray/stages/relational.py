"""Distributed semi-/anti-join on a key column — size-gated between a
broadcast key set and a co-location aggregate.

Ray Data has no native anti-join, and ``ds.join`` is unusable here
(Ray 2.49 hash join loses the schema of empty partitions — ArrowInvalid
FieldRef, see CLAUDE.md).  The two shapes that work at either end of the
scale spectrum:

* **broadcast** (small right side): distinct right keys collected once,
  ``ray.put`` once, membership-filter the left in one streaming map.
  Gated on the right side's ROW count (metadata-cheap ``count()``, no
  extra pass) — distinct keys can only be fewer.
* **co-location** (large right side): both sides reduced to tagged key
  rows, one ``groupby(hash(key) % 64)`` sort shuffle co-locates each
  key's left/right counts, a vectorized in-bucket pandas groupby sums
  them and survivors re-expand with ``np.repeat`` to preserve left
  multiplicity.  Nothing driver-side, per-BUCKET Python only (ray's
  per-key aggregate is pathological at high cardinality — CLAUDE.md
  r3).  An opt-in Bloom pre-filter keeps definitely-absent left rows
  out of the exchange for selective joins.

The co-location output carries ONLY the key column (left payload would
need a second co-location pass to reattach); that matches the dominant
use — anti/semi filters on dimension keys (e.g. "parts never bulk
ordered").  Reference has no counterpart (SURVEY §2: relational breadth
beyond the annotator); semantics mirror SQL ``WHERE key [NOT] IN
(SELECT ...)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

DEFAULT_BROADCAST_BELOW = 5_000_000  # right-side rows; ~40 MB of int64 keys

# UDF-call granularity for the streaming map stages.  Tasks are still
# one-per-block; this only sets how many rows each fn call sees — large
# enough that the map-side combiners actually combine, small enough not
# to force block bundling that would cut task parallelism.
JOIN_BATCH = int(__import__("os").environ.get("TA_JOIN_BATCH", "16384"))


def _filter_by_membership(
    left: rd.Dataset, col: str, keys_ref, keep_members: bool
) -> rd.Dataset:
    import ray

    from ..state.worker_state import get_worker_state, ref_key

    def f(b: pd.DataFrame) -> pd.DataFrame:
        ks = get_worker_state(
            ("joinkeys", ref_key(keys_ref)), lambda: ray.get(keys_ref)
        )
        mask = b[col].isin(ks)
        return b[mask if keep_members else ~mask][[col]]

    return left.map_batches(f, batch_format="pandas", batch_size=JOIN_BATCH)


def _colocated(
    left: rd.Dataset,
    right: rd.Dataset,
    col: str,
    right_col: str,
    keep_members: bool,
    num_buckets: int = 64,
) -> rd.Dataset:

    def tag(flag_left: bool, src_col: str):
        # map-side combiner: the shuffle moves one row per DISTINCT key
        # per batch, not one per occurrence — on a fact-table right side
        # (many occurrences per key) this shrinks the sort exchange by
        # the per-batch duplication factor at zero extra passes.
        # Output is an ARROW table keyed by a HASH BUCKET, not the key
        # itself: ray 2.49's groupby().aggregate() does per-key Python
        # in both map and reduce, which is pathological at high key
        # cardinality (measured 36 s vs 1-4 s for this exact exchange on
        # 450k rows / 20k keys) — a 64-value bucket groupby plus a
        # vectorized in-group pandas groupby-sum does the same exchange
        # with per-BUCKET Python only.
        def f(b: pd.DataFrame) -> pa.Table:
            counts = b[src_col].value_counts(sort=False)
            n = len(counts)
            zeros = np.zeros(n, dtype=np.int64)
            per_key = counts.to_numpy().astype(np.int64)
            keys = counts.index.to_numpy()
            bkt = (
                pd.util.hash_pandas_object(pd.Series(keys), index=False).to_numpy()
                % np.uint64(num_buckets)
            ).astype(np.int64)
            return pa.table(
                {
                    col: keys,
                    "nl": per_key if flag_left else zeros,
                    "nr": zeros if flag_left else per_key,
                    "__cj_bkt": bkt,
                }
            )

        return f

    tagged = left.map_batches(tag(True, col), batch_format="pandas", batch_size=JOIN_BATCH).union(
        right.map_batches(tag(False, right_col), batch_format="pandas", batch_size=JOIN_BATCH)
    )

    def combine(g: pd.DataFrame) -> pa.Table:
        s = g.groupby(col, sort=False)[["nl", "nr"]].sum()
        present = s["nr"].to_numpy() > 0
        keep = present if keep_members else ~present
        keys = s.index.to_numpy()[keep]
        reps = s["nl"].to_numpy()[keep]  # 0 for right-only keys
        return pa.table({col: np.repeat(keys, reps)})

    return tagged.groupby("__cj_bkt").map_groups(combine, batch_format="pandas")


def _keyed_join(
    left: rd.Dataset,
    right: rd.Dataset,
    col: str,
    right_col: str | None,
    broadcast_below: int,
    keep_members: bool,
    bloom_bits: int | None = None,
) -> rd.Dataset:
    import ray

    right_col = right_col or col
    # single-execution rule (the r4 equi_join fix, applied here too):
    # the size gate's count() would execute the right pipeline once and
    # the collect/exchange would re-execute it — materialize ONCE, then
    # count() is metadata-only and every consumer reads object-store
    # blocks
    right = right.materialize()
    if broadcast_below and right.count() <= broadcast_below:
        # map-side per-block distinct + driver set union: strictly
        # cheaper than unique()'s all-to-all for a broadcast-sized side
        uniq = right.map_batches(
            lambda t, c=right_col: t.select([c])
            .combine_chunks()
            .group_by([c])
            .aggregate([]),
            batch_format="pyarrow",
        ).to_pandas()
        keys = set(uniq[right_col])
        return _filter_by_membership(left, col, ray.put(keys), keep_members)

    if not bloom_bits:
        return _colocated(left, right, col, right_col, keep_members)

    # Bloom pre-filter (stages/bloom.py): a FIXED-size broadcast shrinks
    # the left side entering the all-to-all shuffle to the "maybe"
    # residue — bloom-absent keys are definitely non-members, so for a
    # semi join they drop on the map side and for an anti join they are
    # emitted directly (exactness preserved; only false POSITIVES exist,
    # and those flow through the exact co-location check).
    from ..state.worker_state import get_worker_state, ref_key
    from .bloom import BloomFilter, build_bloom

    bf = build_bloom(right, right_col, m_bits=bloom_bits)
    bref = ray.put(bf.to_bytes())
    h = bf.h

    def splitter(keep_maybe: bool):
        # emits ARROW: `definite` below unions with _colocated's Arrow
        # blocks — mixed block types break downstream batchers
        # (CLAUDE.md r3; review r4)
        def f(b: pd.DataFrame) -> pa.Table:
            w = get_worker_state(
                ("bloom", ref_key(bref)),
                lambda: BloomFilter.from_bytes(ray.get(bref), h),
            )
            maybe = w.contains(b[col].to_numpy())
            return pa.Table.from_pandas(
                b[maybe if keep_maybe else ~maybe][[col]],
                preserve_index=False,
            )

        return f

    residue = left.map_batches(splitter(True), batch_format="pandas", batch_size=JOIN_BATCH)
    exact = _colocated(residue, right, col, right_col, keep_members)
    if keep_members:
        return exact
    # anti join: definitely-absent rows skip the shuffle entirely
    # (second streaming read of `left` — a scan is far cheaper than
    # shuffling these rows would have been)
    definite = left.map_batches(splitter(False), batch_format="pandas", batch_size=JOIN_BATCH)
    return definite.union(exact)


def anti_join_keys(
    left: rd.Dataset,
    right: rd.Dataset,
    col: str,
    right_col: str | None = None,
    broadcast_below: int = DEFAULT_BROADCAST_BELOW,
    bloom_bits: int | None = None,
) -> rd.Dataset:
    """Left ``col`` values (with multiplicity) that never appear in
    ``right[right_col]`` — SQL ``WHERE col NOT IN (SELECT right_col)``.
    On the co-location path, pass ``bloom_bits`` to pre-filter with a
    Bloom broadcast — worth its two extra scans when most left keys are
    absent from the right (low-selectivity anti joins); pure overhead
    when most keys match, hence OPT-IN."""
    return _keyed_join(left, right, col, right_col, broadcast_below, False,
                       bloom_bits)


def filter_rows_by_keys(
    left: rd.Dataset,
    keys: rd.Dataset,
    col: str,
    keys_col: str | None = None,
    keep_members: bool = True,
    broadcast_below: int = DEFAULT_BROADCAST_BELOW,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Payload-PRESERVING semi/anti filter: every ``left`` column
    survives, rows kept by ``col`` membership in ``keys[keys_col]``.

    The key-only :func:`semi_join_keys` / :func:`anti_join_keys` cover
    dimension-key filters; this is the row-filter flavor a curation
    pipeline needs (drop near-dup victim DOCUMENTS, not victim ids).

    * **broadcast** (keys side ≤ ``broadcast_below`` rows): distinct
      keys ``ray.put`` once, one streaming membership mask — zero
      shuffle of the payload.
    * **bucketed co-location** (large keys side): both sides tagged
      with ``bucket = hash(key) % num_buckets``; ONE
      ``groupby(bucket)`` sort shuffle co-locates payload rows with the
      key rows that own the same bucket, and the in-group set-membership
      filter runs vectorized per bucket.  The payload crosses the wire
      once — the same cost class as the exact-dedup groupby.  Size
      ``num_buckets`` so corpus/num_buckets rows fit a worker heap.

    Key column must be integer-like (the bucket hash is the repo's
    overflow-safe multiplicative ``id_hash_bucket`` family)."""
    import ray

    from ..state.worker_state import get_worker_state, ref_key

    keys_col = keys_col or col
    # single-execution rule: materialize once so the size-gate count()
    # and the collect/exchange don't each re-run the keys pipeline
    keys = keys.materialize()
    if broadcast_below and keys.count() <= broadcast_below:
        uniq = keys.map_batches(
            lambda t, c=keys_col: t.select([c])
            .combine_chunks()
            .group_by([c])
            .aggregate([]),
            batch_format="pyarrow",
        ).to_pandas()
        kset = set(uniq[keys_col])
        kref = ray.put(kset)

        def f(b: pd.DataFrame) -> pd.DataFrame:
            ks = get_worker_state(
                ("rowfilter", ref_key(kref)), lambda: ray.get(kref)
            )
            mask = b[col].isin(ks)
            return b[mask if keep_members else ~mask]

        return left.map_batches(f, batch_format="pandas", batch_size=JOIN_BATCH)

    MULT = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 multiplier

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        u = b[col].to_numpy(dtype=np.int64).astype(np.uint64)
        b["__j_rfb"] = (
            ((u * MULT) >> np.uint64(32)).astype(np.int64) % num_buckets
        )
        return b

    # both union sides under ONE sentinel-filled schema via the shared
    # joins._tag_union (resolves sentinels from the ACTUAL dtypes incl.
    # timestamps — the hand-rolled fillers dict this replaced defaulted
    # e.g. timestamp payload columns to int64 0 and broke schema
    # unification at the exchange; review r4)
    from .joins import _tag_union

    if keys_col != col:
        keys = keys.map_batches(
            lambda b, kc=keys_col, c=col: b.rename(columns={kc: c}),
            batch_format="pandas",
        )
    # fetching an UNKNOWN left schema would execute the left upstream
    # and discard it (then the exchange re-executes) — materialize once
    # instead, same rule as equi_join's bucketed path
    l_schema = left.schema(fetch_if_missing=False)
    if l_schema is None:
        left = left.materialize()
        l_schema = left.schema()
    left_cols = list(l_schema.names)
    tagged = _tag_union(left, keys, left_cols, [col], add_bucket, add_bucket)

    def filter_group(g: pd.DataFrame) -> pd.DataFrame:
        is_key = g["__j_side"].to_numpy() == 1
        kset = set(g.loc[is_key, col])
        payload = g[~is_key]
        mask = payload[col].isin(kset)
        out = payload[mask if keep_members else ~mask]
        return out.drop(columns=["__j_rfb", "__j_side"])

    return tagged.groupby("__j_rfb").map_groups(filter_group, batch_format="pandas")


def equi_join(
    left: rd.Dataset,
    right: rd.Dataset,
    col: str,
    right_col: str | None = None,
    broadcast_below: int = 2_000_000,
    num_buckets: int = 64,
    how: str = "inner",
    hot_keys=None,
) -> rd.Dataset:
    """Payload-preserving equi-join (all columns from both sides;
    names apart from the key must be disjoint — rename upstream).
    ``how``: "inner" | "left" | "full".  LEFT works on both paths (an
    unmatched left row is decidable per batch once the whole right side
    is in hand); FULL requires the bucketed path (an unmatched RIGHT
    row is only decidable with every same-key left row co-located, so a
    ``broadcast_below`` hit is ignored for it).  Right join = left join
    with the sides swapped.  Unmatched payload columns come back null
    (int columns widen to float, pandas semantics — cast in the
    caller).  ``ds.join`` is unusable in Ray 2.49 (CLAUDE.md), so:

    * **broadcast** (right side ≤ ``broadcast_below`` rows): right
      collected once, ``ray.put`` once, per-batch pandas merge on the
      left stream — zero shuffle (the ``orders_by_segment`` pattern,
      generalized to full payload and duplicate right keys).
    * **bucketed co-location** (large right side): both sides tagged
      ``bucket = hash(key) % num_buckets`` under ONE sentinel-filled
      schema, one ``groupby(bucket)`` sort shuffle, vectorized
      in-bucket pandas merge.  Each side crosses the wire once — the
      large-large join shape a broadcast can't survive.

    * **skew split** (``hot_keys``, opt-in): a hash-bucketed join
      co-locates every row of a key in ONE bucket, so a hot key (a
      celebrity node, a default value) serializes its whole row mass
      into a single group task.  Passing ``hot_keys`` (e.g. the output
      of ``sketches.heavy_hitters`` over the left key column) splits
      both sides: hot-key rows join on the broadcast path (right rows
      for the hot keys are small by the star-skew contract — assert
      with ``broadcast_below``), cold rows take the normal size-gated
      path, results union.  inner/left only (full needs global
      co-location); identical output to the unsplit join,
      pytest-pinned.

    Key must be integer-like for the bucket hash.  Output row count is
    the SQL inner-join cardinality (duplicate keys multiply)."""
    import ray

    from ..state.worker_state import get_worker_state, ref_key

    if how not in ("inner", "left", "full"):
        raise ValueError(f"how must be inner|left|full, got {how!r}")
    right_col = right_col or col

    if hot_keys is not None and len(hot_keys) > 0:
        if how == "full":
            raise ValueError("hot_keys split supports inner|left only")
        if not broadcast_below or broadcast_below <= 0:
            raise ValueError(
                "hot_keys requires a positive broadcast_below: the hot "
                "side joins by replication, which a disabled broadcast "
                "gate cannot express"
            )
        hot = np.asarray(sorted(hot_keys), dtype=np.int64)

        def split(side_col: str, keep_hot: bool):
            def f(b: pd.DataFrame) -> pd.DataFrame:
                m = np.isin(b[side_col].to_numpy(dtype=np.int64), hot)
                return b[m if keep_hot else ~m]
            return f

        # single-execution rule: BOTH sides materialize before deriving
        # hot/cold splits — a nondeterministic upstream replayed into
        # each leg could otherwise drop or duplicate join rows
        left = left.materialize()
        right = right.materialize()
        l_hot = left.map_batches(split(col, True), batch_format="pandas",
                                 batch_size=JOIN_BATCH)
        l_cold = left.map_batches(split(col, False), batch_format="pandas",
                                  batch_size=JOIN_BATCH)
        # materialize r_hot so the count guard and the recursive join's
        # own materialize reuse one execution instead of replaying split
        r_hot = right.map_batches(split(right_col, True),
                                  batch_format="pandas",
                                  batch_size=JOIN_BATCH).materialize()
        r_cold = right.map_batches(split(right_col, False),
                                   batch_format="pandas", batch_size=JOIN_BATCH)
        # hot side MUST broadcast (that is the point of the split); the
        # star-skew contract says hot right rows are few — enforce it
        if r_hot.count() > broadcast_below:
            raise ValueError(
                "hot-key right side exceeds broadcast_below; a key hot on "
                "BOTH sides cannot be joined by replication — pre-aggregate"
            )
        hot_join = equi_join(l_hot, r_hot, col, right_col,
                             broadcast_below=broadcast_below, how=how)
        cold_join = equi_join(l_cold, r_cold, col, right_col,
                              broadcast_below=broadcast_below,
                              num_buckets=num_buckets, how=how)
        return hot_join.union(cold_join)

    # single key column in the output: fold the right key onto `col`
    if right_col != col:
        right = right.map_batches(
            lambda b, rc=right_col, c=col: b.rename(columns={rc: c}),
            batch_format="pandas",
        )

    # materialize the right side ONCE: the size gate (count) plus the
    # chosen path (to_pandas or the bucket exchange) would otherwise
    # re-execute the whole right pipeline 2-3x (measured on
    # triangle_count's degree joins — a grouped_reduce replayed per use)
    right = right.materialize()
    r_cols = list(right.schema().names)

    # overlap check (the broadcast path's pandas merge would otherwise
    # silently suffix shared columns to _x/_y — review r4) — but
    # fetching an UNKNOWN left schema executes the whole left upstream
    # and DISCARDS it, so a chain of N lazy joins re-ran shared
    # exchanges N times (min_cost_supplier: 19.6 s vs 7.9 s measured).
    # Validate eagerly only when the schema is already known (free);
    # otherwise the broadcast path re-checks per batch and the bucketed
    # path materializes the left once (strictly cheaper than
    # schema-fetch + re-execution).
    l_schema = left.schema(fetch_if_missing=False)
    if l_schema is not None:
        overlap = (set(l_schema.names) & set(r_cols)) - {col}
        if overlap:
            raise ValueError(f"overlapping payload columns: {sorted(overlap)}")

    if how != "full" and broadcast_below and right.count() <= broadcast_below:
        rdf = right.to_pandas()
        rref = ray.put(rdf)

        def bjoin(b: pd.DataFrame) -> pd.DataFrame:
            ov = (set(b.columns) & set(rdf_cols)) - {col}
            if ov:
                raise ValueError(f"overlapping payload columns: {sorted(ov)}")
            r = get_worker_state(("equijoin", ref_key(rref)), lambda: ray.get(rref))
            return b.merge(r, on=col, how=how)

        rdf_cols = list(rdf.columns)
        return left.map_batches(bjoin, batch_format="pandas", batch_size=JOIN_BATCH)

    if l_schema is None:
        left = left.materialize()
        l_schema = left.schema()
    l_cols = list(l_schema.names)
    overlap = (set(l_cols) & set(r_cols)) - {col}
    if overlap:
        raise ValueError(f"overlapping payload columns: {sorted(overlap)}")
    all_cols = list(dict.fromkeys(l_cols + r_cols))

    from .joins import _tag_union

    MULT = np.uint64(0x9E3779B97F4A7C15)

    def bucketer(b: pd.DataFrame) -> pd.DataFrame:
        u = b[col].to_numpy(dtype=np.int64).astype(np.uint64)
        b = b.copy()
        b["__j_bucket"] = (
            ((u * MULT) >> np.uint64(32)) % np.uint64(num_buckets)
        ).astype(np.int64)
        return b

    tagged = _tag_union(left, right, l_cols, r_cols, bucketer, bucketer)

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        is_r = g["__j_side"].to_numpy() == 1
        L = g[~is_r][l_cols]
        R = g[is_r][r_cols]
        return L.merge(R, on=col, how="outer" if how == "full" else how)[all_cols]

    return tagged.groupby("__j_bucket").map_groups(join_group, batch_format="pandas")


def cooccurrence_pairs(
    ds: rd.Dataset,
    basket_col: str,
    item_col: str,
    min_count: int = 1,
    num_buckets: int = 64,
    batch_size: int = 65536,
) -> rd.Dataset:
    """Market-basket co-occurrence: (item_a, item_b, n_baskets) for
    every unordered pair of DISTINCT items sharing a basket, counted
    once per basket — the association-mining primitive.

    Shape: baskets co-locate on ``hash(basket) % num_buckets`` (baskets
    span input blocks, so a map-side-only pass would undercount);
    in-bucket the pair explosion is ONE vectorized self-merge on the
    basket key (filtered ``a < b``, deduped per basket), locally
    pre-counted; the pair counts then reduce through
    :func:`~.agg.grouped_reduce` (pair-cardinality keys).  Skew note:
    pair volume is Σ|basket|² — cap or sample pathological baskets
    upstream (TPC-H-style baskets are ≤ single digits)."""

    from .agg import grouped_reduce

    nb = np.uint64(num_buckets)

    def tag(b: pd.DataFrame) -> pa.Table:
        out = b[[basket_col, item_col]].drop_duplicates()
        out = out.copy()
        out["__co_bkt"] = (
            pd.util.hash_pandas_object(out[basket_col], index=False).to_numpy() % nb
        ).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def pairs(g: pd.DataFrame) -> pa.Table:
        g = g[[basket_col, item_col]].drop_duplicates()
        m = g.merge(g, on=basket_col, suffixes=("_a", "_b"))
        m = m[m[f"{item_col}_a"] < m[f"{item_col}_b"]]
        out = (
            m.groupby([f"{item_col}_a", f"{item_col}_b"], as_index=False)
            .size()
            .rename(columns={"size": "partial", f"{item_col}_a": "item_a",
                             f"{item_col}_b": "item_b"})
        )
        out["partial"] = out["partial"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    counts = grouped_reduce(
        ds.map_batches(tag, batch_format="pandas", batch_size=batch_size)
        .groupby("__co_bkt")
        .map_groups(pairs, batch_format="pandas"),
        ["item_a", "item_b"],
        {"n_baskets": ("partial", "sum")},
        num_buckets=num_buckets,
    )
    if min_count > 1:
        import pyarrow.compute as pc

        counts = counts.map_batches(
            lambda t: t.filter(pc.greater_equal(t["n_baskets"], pa.scalar(min_count))),
            batch_format="pyarrow",
        )
    return counts


def grouped_topk(
    ds: rd.Dataset,
    group_cols: list[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tiebreak: str | None = None,
) -> rd.Dataset:
    """Top-``k`` rows per group by ``order_col`` WITHOUT a global sort:
    a map-side combiner keeps ≤k rows per (group, batch) — the sort
    shuffle then moves at most ``k × groups × batches`` rows instead of
    the whole table — and the per-group finalizer re-selects top-k over
    the combined survivors.  Equivalent to SQL
    ``row_number() OVER (PARTITION BY g ORDER BY o) <= k``.

    Deterministic under ties when ``tiebreak`` (ascending, unique) is
    given — both passes order by (order_col, tiebreak), so the boundary
    row selection matches the SQL window's.  All input columns survive.
    """

    by = [order_col] + ([tiebreak] if tiebreak else [])
    asc = [not descending] + ([True] if tiebreak else [])

    def partial(b: pd.DataFrame) -> pa.Table:
        # arrow out: pandas blocks poison the downstream sort-shuffle;
        # the exchange groups on a 64-value hash bucket of the group
        # key, not the key itself — a Ray group per key is pathological
        # at high group counts (CLAUDE.md r3)
        out = (
            b.sort_values(by, ascending=asc, kind="mergesort")
            .groupby(group_cols, sort=False)
            .head(k)
            .copy()
        )
        keyframe = out[group_cols[0]] if len(group_cols) == 1 else out[group_cols]
        out["__tk_bkt"] = (
            pd.util.hash_pandas_object(keyframe, index=False).to_numpy()
            % np.uint64(64)
        ).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def final(g: pd.DataFrame) -> pa.Table:
        # one vectorized sort + per-group head over the whole bucket
        out = (
            g.sort_values(by, ascending=asc, kind="mergesort")
            .groupby(group_cols, sort=False)
            .head(k)
            .drop(columns="__tk_bkt")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=JOIN_BATCH)
        .groupby("__tk_bkt")
        .map_groups(final, batch_format="pandas")
    )


def semi_join_keys(
    left: rd.Dataset,
    right: rd.Dataset,
    col: str,
    right_col: str | None = None,
    broadcast_below: int = DEFAULT_BROADCAST_BELOW,
    bloom_bits: int | None = None,
) -> rd.Dataset:
    """Left ``col`` values (with multiplicity) that appear in
    ``right[right_col]`` — SQL ``WHERE col IN (SELECT right_col)``.
    On the co-location path, pass ``bloom_bits`` to pre-filter with a
    Bloom broadcast — worth its two extra scans when few left keys
    match (selective semi joins); pure overhead when most match, hence
    OPT-IN."""
    return _keyed_join(left, right, col, right_col, broadcast_below, True,
                       bloom_bits)


def pivot_table(
    ds: rd.Dataset,
    index_cols: list[str],
    pivot_col: str,
    value_col: str,
    agg: str = "sum",
    values: list | None = None,
    prefix: str | None = None,
    num_buckets: int = 64,
    max_values: int = 1000,
) -> rd.Dataset:
    """Wide pivot: one output row per distinct ``index_cols``
    combination, one column per distinct ``pivot_col`` value, cells
    aggregated from ``value_col`` (``agg``: sum|min|max|count).

    Scale contract: the PIVOT domain must be bounded (the output schema
    IS the domain) — ``max_values`` hard-caps it; the index side may be
    corpus-cardinality (rides ``agg.grouped_reduce``'s hash-bucket
    exchange, never per-key Ray groups).  When ``values`` is omitted it
    is discovered with a map-side per-batch unique + tiny driver union
    (≤ max_values rows cross the wire).  Missing cells are 0 for
    sum/count and NaN for min/max — mirror with ``COALESCE(..., 0)`` in
    SQL oracles.  Beyond-reference operator (no counterpart in
    Orange-OpenSource/Table-Annotation)."""
    from .agg import grouped_reduce

    if agg not in ("sum", "min", "max", "count"):
        raise ValueError(f"unsupported agg {agg!r}")
    if agg != "count":
        # non-numeric cells widen to object columns that are all-NaN in
        # batches missing a pivot value — pa.Table.from_pandas infers
        # Arrow NULL for those partials and breaks block unification at
        # the grouped_reduce exchange (the empty-object-dtype class)
        if ds.schema(fetch_if_missing=False) is None:
            ds = ds.materialize()  # materialize-before-schema rule
        sch = ds.schema()
        vt = dict(zip(sch.names, sch.types))[value_col]
        numeric = (
            pa.types.is_integer(vt) or pa.types.is_floating(vt)
            or pa.types.is_boolean(vt) or pa.types.is_decimal(vt)
        ) if isinstance(vt, pa.DataType) else np.issubdtype(vt, np.number)
        if not numeric:
            raise ValueError(
                f"pivot agg={agg!r} requires a numeric value_col; "
                f"{value_col!r} is {vt} — cast upstream or use agg='count'"
            )
    if values is None:
        # discovery consumes ds once and widen consumes it again —
        # materialize so a derived upstream runs once (equi_join rule)
        ds = ds.materialize()

        def batch_uniq(b: pd.DataFrame) -> pd.DataFrame:
            # dropna BEFORE the cap (a NaN in a head slot would let an
            # over-limit domain slip past the guard below), then cap the
            # per-batch emission: an unbounded domain costs the driver
            # collect at most batches x (max_values + 1) rows and still
            # trips the driver-side ValueError (raising here would
            # surface as an opaque RayTaskError instead)
            return b.dropna().drop_duplicates().head(max_values + 1)

        uniq = ds.select_columns([pivot_col]).map_batches(
            batch_uniq, batch_format="pandas", batch_size=JOIN_BATCH,
        ).to_pandas()[pivot_col].unique()
        values = sorted(uniq.tolist())
    if len(values) > max_values:
        raise ValueError(
            f"pivot domain {len(values)} exceeds max_values={max_values}; "
            "an unbounded pivot cannot have a bounded schema"
        )
    pref = f"{agg}_" if prefix is None else prefix
    out_cols = {v: f"{pref}{v}" for v in values}
    named = list(out_cols.values())
    if len(set(named)) != len(named) or set(named) & set(index_cols):
        raise ValueError(
            f"pivot output columns collide ({named} vs index {index_cols}); "
            "distinct pivot values with identical string forms, or a value "
            "matching an index column name — adjust `prefix`"
        )

    def widen(b: pd.DataFrame) -> pd.DataFrame:
        # one column per pivot value BEFORE the exchange, so the partial
        # combine is a plain grouped_reduce over a fixed schema
        out = b[index_cols].copy()
        pv = b[pivot_col]
        numeric = b[value_col].dtype.kind in "iufb"
        for v, oc in out_cols.items():
            cell = b[value_col].where(pv == v)
            if agg == "count":
                out[oc] = cell.notna().astype("int64")
            elif numeric:
                # stable dtype across batches: where() keeps int64 when
                # the mask is all-True but upcasts to float64 otherwise —
                # the same column must not alternate types per batch
                # (Arrow block-unification rule)
                out[oc] = cell.astype("float64")
            else:
                out[oc] = cell
        return out

    reducers = {
        oc: (oc, "sum" if agg == "count" else agg) for oc in out_cols.values()
    }
    # pandas sum skipna -> all-missing sum/count cells come back 0
    return grouped_reduce(
        ds.map_batches(widen, batch_format="pandas", batch_size=JOIN_BATCH),
        index_cols, reducers, num_buckets=num_buckets,
    )


def unpivot(
    ds: rd.Dataset,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "measure",
    value_name: str = "value",
) -> rd.Dataset:
    """Melt ``value_cols`` into (``var_name``, ``value_name``) long
    rows — SQL ``UNION ALL`` of one SELECT per measure.  Pure map
    (zero shuffle, k× row fan-out inside each batch); emits Arrow so a
    downstream groupby/sort stays on the fast block path.
    ``value_cols`` must share a type family (all numeric, or all
    string) — a numeric/object mix would melt to per-batch-inferred
    object blocks and break Arrow block unification at the next
    shuffle (CLAUDE.md mixed-block rule), exactly as SQL rejects a
    UNION ALL of mismatched types.  Numeric melts emit float64
    (a nullable int column would otherwise flip int64/float64 per
    block).  Beyond-reference operator."""
    if not value_cols:
        raise ValueError("value_cols must be non-empty")

    def melt(b: pd.DataFrame) -> pa.Table:
        kinds = {b[c].dtype.kind for c in value_cols}
        if len(kinds) > 1 and not kinds <= {"i", "u", "f"}:
            raise ValueError(
                f"unpivot value_cols mix type families ({sorted(kinds)}); "
                "cast upstream — SQL UNION ALL would reject this too"
            )
        out = b.melt(
            id_vars=id_cols, value_vars=value_cols,
            var_name=var_name, value_name=value_name,
        )
        if kinds <= {"i", "u", "f", "b"}:
            # normalize: a nullable int parquet column arrives int64 in
            # null-free batches and float64 in batches with nulls —
            # without this the melted column's Arrow type flips per
            # block and the next shuffle dies on unification
            out[value_name] = out[value_name].astype("float64")
        return pa.Table.from_pandas(out, preserve_index=False)

    return ds.map_batches(melt, batch_format="pandas", batch_size=JOIN_BATCH)


def char_jaccard_link(
    ds: rd.Dataset,
    id_col: str,
    text_col: str,
    threshold: float,
    num_buckets: int = 64,
    max_block: int = 20_000,
) -> rd.Dataset:
    """Blocked record linkage: (a, b, sim) pairs of rows whose
    character-SET Jaccard similarity ≥ ``threshold``, candidates
    restricted to the same blocking key (first character — the classic
    ER blocking predicate; mirror the identical ``substr(name,1,1)``
    predicate in a SQL oracle, whose ``jaccard()`` is the same
    case-sensitive char-set measure).  Empty/null texts are dropped
    (no char set; DuckDB's jaccard errors on them too).

    Scale shape: one hash(block) exchange; each block verifies with a
    bool chars-matrix matmul (n×c @ c×n intersections, vectorized) —
    O(n²) per block by design, so the BLOCKING predicate is the scale
    lever.  ``max_block`` hard-fails a degenerate block (a blocked ER
    pass that silently truncates would under-link, and unlike the
    dedup family's recall caps there is no secondary probe here to
    catch the loss).  Beyond-reference operator."""
    nb = np.uint64(num_buckets)

    def tag(b: pd.DataFrame) -> pa.Table:
        t = b[text_col].fillna("")
        keep = t.str.len() > 0
        b, t = b[keep], t[keep]
        blk = t.str[0]
        bkt = (
            pd.util.hash_pandas_object(blk, index=False).to_numpy() % nb
        ).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(b[id_col].to_numpy(dtype=np.int64), pa.int64()),
                "__fj_text": pa.array(t.tolist(), pa.string()),
                "__fj_blk": pa.array(blk.tolist(), pa.string()),
                "__fj_bkt": pa.array(bkt, pa.int64()),
            }
        )

    def verify(g: pd.DataFrame) -> pa.Table:
        out_a, out_b, out_s = [], [], []
        for _, blk in g.groupby("__fj_blk", sort=False):
            n = len(blk)
            if n < 2:
                continue
            if n > max_block:
                raise ValueError(
                    f"ER block of {n} rows exceeds max_block={max_block}; "
                    "tighten the blocking predicate"
                )
            texts = blk["__fj_text"].tolist()
            ids = blk[id_col].to_numpy(dtype=np.int64)
            vocab: dict[str, int] = {}
            for s in texts:
                for ch in set(s):
                    vocab.setdefault(ch, len(vocab))
            M = np.zeros((n, len(vocab)), dtype=np.float64)
            for i, s in enumerate(texts):
                for ch in set(s):
                    M[i, vocab[ch]] = 1.0
            inter = M @ M.T
            sz = M.sum(axis=1)
            union = sz[:, None] + sz[None, :] - inter
            sim = inter / union
            ii, jj = np.triu_indices(n, k=1)
            m = sim[ii, jj] >= threshold
            a, b = ids[ii[m]], ids[jj[m]]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            out_a.append(lo)
            out_b.append(hi)
            # half-away rounding (repo oracle rule; sims are >= 0)
            out_s.append(np.floor(sim[ii, jj][m] * 1e6 + 0.5) / 1e6)
        if out_a:
            a = np.concatenate(out_a); b = np.concatenate(out_b)
            s = np.concatenate(out_s)
        else:
            a = b = np.array([], dtype=np.int64)
            s = np.array([], dtype=np.float64)
        return pa.table(
            {"a": pa.array(a.astype(np.int64), pa.int64()),
             "b": pa.array(b.astype(np.int64), pa.int64()),
             "sim": pa.array(s, pa.float64())}
        )

    return (
        ds.map_batches(tag, batch_format="pandas", batch_size=JOIN_BATCH)
        .groupby("__fj_bkt")
        .map_groups(verify, batch_format="pandas")
    )


def set_op_distinct(
    a: rd.Dataset,
    b: rd.Dataset,
    cols: list[str],
    op: str,
    num_buckets: int = 64,
) -> rd.Dataset:
    """SQL ``INTERSECT`` / ``EXCEPT`` / ``UNION`` (distinct set
    semantics) on the named columns: rows of ``a`` present (or absent)
    in ``b`` — or all distinct rows of either, for ``union``.  ONE
    hash(cols) bucket exchange over map-side-deduped rows; per bucket a
    vectorized groupby collapses side flags (never a Ray group per
    key).  Column dtypes must match across the two inputs (the union
    schema).  NULLs follow SQL set-op semantics: two NULL keys compare
    EQUAL (unlike join equality), so a row with NULLs survives as one
    distinct row — ``dropna=False`` through the combine, nulls
    re-emitted as Arrow nulls."""
    if op not in ("intersect", "except", "union"):
        raise ValueError(f"op must be intersect|except|union, got {op!r}")
    nb = np.uint64(num_buckets)

    def tag(side: int):
        def f(batch: pd.DataFrame) -> pa.Table:
            out = batch[cols].drop_duplicates().copy()  # map-side shrink
            keyframe = out[cols[0]] if len(cols) == 1 else out[cols]
            out["__so_bkt"] = (
                pd.util.hash_pandas_object(keyframe, index=False).to_numpy() % nb
            ).astype(np.int64)
            out["__so_a"] = np.int64(1 - side)
            out["__so_b"] = np.int64(side)
            return pa.Table.from_pandas(out, preserve_index=False)
        return f

    both = a.map_batches(tag(0), batch_format="pandas", batch_size=JOIN_BATCH).union(
        b.map_batches(tag(1), batch_format="pandas", batch_size=JOIN_BATCH)
    )

    def combine(g: pd.DataFrame) -> pa.Table:
        # dropna=False: SQL INTERSECT/EXCEPT/UNION treat NULL keys as
        # equal and keep them as one distinct row
        s = g.groupby(cols, sort=False, dropna=False)[["__so_a", "__so_b"]].max()
        in_a = s["__so_a"].to_numpy() == 1
        in_b = s["__so_b"].to_numpy() == 1
        if op == "intersect":
            keep = in_a & in_b
        elif op == "except":
            keep = in_a & ~in_b
        else:  # union: every distinct key combination survives
            keep = in_a | in_b
        out = s.index.to_frame(index=False)[keep]
        # explicit string typing: an empty object column infers Arrow
        # NULL and breaks unification (CLAUDE.md empty-array rule);
        # NaN sentinels from dropna=False re-emit as Arrow nulls
        return pa.table(
            {c: (pa.array([v if pd.notna(v) else None for v in out[c]],
                          pa.string())
                 if out[c].dtype == object else
                 pa.array(out[c].to_numpy()))
             for c in cols}
        )

    return both.groupby("__so_bkt").map_groups(combine, batch_format="pandas")


def _skyline_mask(crit: pd.DataFrame) -> np.ndarray:
    """Row mask of the 2-criteria skyline of ``crit`` (both columns
    already oriented MINIMIZE).  SQL NOT-EXISTS strict-dominance
    semantics: a row survives iff no other row is <= on both criteria
    and < on at least one; exact duplicates of a frontier point all
    survive.  Fully vectorized: unique points sorted by (x asc, y asc),
    a point is on the frontier iff its y beats the running min of every
    strictly-preceding point (same-x predecessors have smaller y and
    dominate; smaller-x predecessors dominate iff y <=)."""
    x, y = crit.columns
    uniq = crit.drop_duplicates().sort_values([x, y], kind="mergesort")
    ys = uniq[y].to_numpy()
    prev_min = np.empty(len(ys))
    prev_min[0] = np.inf
    if len(ys) > 1:
        np.minimum.accumulate(ys[:-1], out=prev_min[1:])
    front = uniq[ys < prev_min]
    keep = crit.merge(
        front.assign(__sky=True), on=[x, y], how="left"
    )["__sky"].notna()
    return keep.to_numpy()


def skyline(
    ds: rd.Dataset,
    minimize: list[str] = (),
    maximize: list[str] = (),
    batch_size: int | None = 65536,
) -> pd.DataFrame:
    """Distributed 2-criteria skyline (Pareto frontier): the rows not
    strictly dominated by any other row.  Two-phase shape — a local
    vectorized skyline per block (each block's survivors are a superset
    of its contribution to the global frontier, by dominance
    transitivity), then one driver-side pass over the union of local
    survivors (tiny: O(frontier) per block).  No exchange at all — the
    only data movement is the local survivors.  Criteria columns are
    oriented internally (maximize = negate); exact duplicates of a
    frontier point all survive (SQL NOT EXISTS parity).  Criteria must
    be non-null (SQL's NULL-comparison rules would keep every
    null-criteria row; here they'd be dropped).  Exactly two criteria
    (the canonical price-vs-capability frontier); higher-d needs a
    pairwise verify pass — not implemented.

    No reference counterpart (SURVEY §2 relational breadth); semantics
    mirror ``WHERE NOT EXISTS (SELECT 1 ... dominator)``.
    """
    crit_cols = list(minimize) + list(maximize)
    if len(crit_cols) != 2:
        raise NotImplementedError(
            f"skyline supports exactly 2 criteria, got {len(crit_cols)}"
        )

    def orient(b: pd.DataFrame) -> pd.DataFrame:
        o = b[crit_cols].astype(float)
        for c in maximize:
            o[c] = -o[c]
        return o

    def local(b: pd.DataFrame) -> pa.Table:
        out = b[_skyline_mask(orient(b))]
        return pa.Table.from_pandas(out, preserve_index=False)

    kw = {} if batch_size is None else {"batch_size": batch_size}
    cand = ds.map_batches(local, batch_format="pandas", **kw).to_pandas()
    if not len(cand):
        return cand
    return cand[_skyline_mask(orient(cand))].reset_index(drop=True)


def merge_upsert(
    base: rd.Dataset,
    changes: rd.Dataset,
    key: str,
    ts_col: str,
    tiebreak: str,
    delete_col: str | None = None,
    num_buckets: int = 64,
) -> rd.Dataset:
    """CDC latest-wins merge (the lakehouse MERGE / SCD-1 compaction):
    apply a change stream onto a base snapshot, keeping ONE row per key.

    Semantics (mirrors ``row_number() OVER (PARTITION BY key ORDER BY
    side DESC, ts DESC, tiebreak ASC) = 1``):

    * any change beats any base row for the same key (snapshot rows are
      by definition older than the stream);
    * among changes, highest ``ts_col`` wins, ties to the smallest
      ``tiebreak`` (must be unique within a key+ts);
    * if ``delete_col`` (bool, changes side) is true on the winning
      row, the key is dropped from the output (a tombstone).

    Scale shape: latest-wins is associative, so a map-side combiner
    keeps ≤1 row per (key, batch) and the single hash(key) bucket
    exchange moves one row per key per batch — never the stream.
    Winner rows are selected as Arrow ``take`` indices, so arbitrary
    payload schemas survive untouched (no pandas round-trip of the
    payload columns)."""
    # materialize-before-schema rule (CLAUDE.md r5): an unknown-schema
    # fetch executes the upstream and discards it; both sides are
    # consumed below anyway
    if base.schema(fetch_if_missing=False) is None:
        base = base.materialize()
    if changes.schema(fetch_if_missing=False) is None:
        changes = changes.materialize()
    if base.schema().names != changes.schema().names:
        raise ValueError(
            "merge_upsert: base and changes must share one schema "
            f"({base.schema().names} vs {changes.schema().names})"
        )
    if delete_col is not None and delete_col not in changes.schema().names:
        raise ValueError(f"merge_upsert: missing delete column {delete_col!r}")
    nb = np.uint64(num_buckets)

    def tagger(side: int):
        def tag(t: pa.Table) -> pa.Table:
            return t.append_column(
                "__mu_side",
                pa.array(np.full(t.num_rows, side, np.int64), pa.int64()),
            )
        return tag

    def _winners(t: pa.Table) -> np.ndarray:
        """Index of the winning row per key within one table."""
        df = pd.DataFrame(
            {
                "k": t[key].to_pandas(),
                "s": t["__mu_side"].to_numpy(),
                "ts": t[ts_col].to_pandas(),
                "tb": t[tiebreak].to_pandas(),
            }
        )
        top = (
            df.sort_values(
                ["k", "s", "ts", "tb"],
                ascending=[True, False, False, True],
                kind="mergesort",
            )
            .groupby("k", sort=False)
            .head(1)
        )
        return top.index.to_numpy()

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("__mu_bkt", pa.array([], pa.int64()))
        out = t.take(_winners(t))
        h = pd.util.hash_pandas_object(
            out[key].to_pandas(), index=False
        ).to_numpy().astype(np.uint64)
        return out.append_column(
            "__mu_bkt", pa.array((h % nb).astype(np.int64), pa.int64())
        )

    def final(t: pa.Table) -> pa.Table:
        out = t.take(_winners(t))
        if delete_col is not None:
            alive = ~(
                (out["__mu_side"].to_numpy() == 1)
                & out[delete_col].to_numpy(zero_copy_only=False).astype(bool)
            )
            out = out.filter(pa.array(alive))
        return out.drop_columns(["__mu_side", "__mu_bkt"])

    both = base.map_batches(tagger(0), batch_format="pyarrow").union(
        changes.map_batches(tagger(1), batch_format="pyarrow")
    )
    return (
        both.map_batches(partial, batch_format="pyarrow")
        .groupby("__mu_bkt")
        .map_groups(final, batch_format="pyarrow")
    )


def audience_overlap(
    ds: rd.Dataset,
    key_col: str,
    cat_col: str,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Pairwise audience overlap between categories — for every
    category pair (a < b), how many distinct keys appear in BOTH, and
    the Jaccard |A∩B| / |A∪B| (the segment-similarity / co-audience
    primitive behind "viewers who also purchase").

    Shape: one ``bucketed_distinct`` exchange dedups (key, category);
    per-key category pairs explode map-side (bounded by the category
    domain, like ``cooccurrence_pairs``) into a ``grouped_reduce``
    count; per-category distinct counts ride the same distinct rows.
    The closing Jaccard arithmetic is category-pair-sized on the
    driver."""
    from .agg import bucketed_distinct, grouped_reduce

    pairs_src = bucketed_distinct(
        ds.map_batches(
            lambda t, _c=[key_col, cat_col]: t.select(_c),
            batch_format="pyarrow",
        ),
        [key_col, cat_col],
        num_buckets=num_buckets,
    ).materialize()  # pair explode AND per-category counts

    sizes = grouped_reduce(
        pairs_src, [cat_col], {"n": (None, "count")}, num_buckets=num_buckets
    ).to_pandas().set_index(cat_col)["n"]

    def explode(b: pd.DataFrame) -> pa.Table:
        out_a, out_b = [], []
        for _, grp in b.groupby(key_col, sort=False):
            cats = sorted(grp[cat_col].unique())
            for i in range(len(cats)):
                for j in range(i + 1, len(cats)):
                    out_a.append(cats[i])
                    out_b.append(cats[j])
        return pa.table(
            {
                "cat_a": pa.array(out_a, pa.string()),
                "cat_b": pa.array(out_b, pa.string()),
            }
        )

    # a key's rows may straddle blocks after the distinct exchange? No:
    # bucketed_distinct groups by hash of the FULL key (key, cat), so
    # one key's categories can land in different buckets — re-exchange
    # on hash(key) to co-locate each key's category set
    nb = np.uint64(num_buckets)

    def tag(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            t[key_col].to_pandas(), index=False
        ).to_numpy()
        return t.append_column(
            "__ao_bkt", pa.array((h.astype(np.uint64) % nb).astype(np.int64))
        )

    inter = grouped_reduce(
        pairs_src.map_batches(tag, batch_format="pyarrow")
        .groupby("__ao_bkt")
        .map_groups(explode, batch_format="pandas"),
        ["cat_a", "cat_b"], {"n_both": (None, "count")},
        num_buckets=num_buckets,
    ).to_pandas()

    inter["n_a"] = inter["cat_a"].map(sizes).astype("int64")
    inter["n_b"] = inter["cat_b"].map(sizes).astype("int64")
    union = inter["n_a"] + inter["n_b"] - inter["n_both"]
    inter["jaccard"] = (inter["n_both"] / union).round(6)
    inter["n_both"] = inter["n_both"].astype("int64")
    return (
        inter[["cat_a", "cat_b", "n_a", "n_b", "n_both", "jaccard"]]
        .sort_values(["cat_a", "cat_b"])
        .reset_index(drop=True)
    )


def association_rules(
    ds: rd.Dataset,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    num_buckets: int = 64,
    batch_size: int = 65536,
) -> rd.Dataset:
    """Directed association rules ``antecedent -> consequent`` over
    market baskets, with the classic rule-mining triple: ``support``
    |A∩B|/N, ``confidence`` |A∩B|/|A|, ``lift`` |A∩B|·N/(|A|·|B|)
    (Agrawal et al., frequent-itemset mining at pair length).

    Shape: unordered pair-in-basket counts ride
    :func:`cooccurrence_pairs` (hash(basket) co-location + one
    ``grouped_reduce``); per-item distinct-basket supports ride
    :func:`~.agg.distinct_count_by_key`.  The item-support table is
    dictionary-bounded by contract (items are a categorical domain,
    like ``pivot_table``'s column values), so it broadcasts via
    ``ray.put`` into ONE map-only pass over the surviving pairs that
    emits both rule directions — no join exchange.  N (distinct
    baskets) is a scalar count over a ``bucketed_distinct``.  Floats
    are raw float64 — round at compare time.
    """
    import ray

    from ..state.worker_state import get_worker_state, ref_key
    from .agg import bucketed_distinct, distinct_count_by_key

    pairs = cooccurrence_pairs(
        ds,
        basket_col,
        item_col,
        min_count=min_pair_count,
        num_buckets=num_buckets,
        batch_size=batch_size,
    )
    item_counts = distinct_count_by_key(
        ds.map_batches(
            lambda t, _c=[basket_col, item_col]: t.select(_c),
            batch_format="pyarrow",
        ),
        [item_col],
        basket_col,
        out_col="n_item",
        num_buckets=num_buckets,
    ).to_pandas()
    supp = dict(
        zip(item_counts[item_col], item_counts["n_item"].astype("int64"))
    )
    n_baskets = int(
        bucketed_distinct(
            ds.map_batches(
                lambda t, _c=[basket_col]: t.select(_c), batch_format="pyarrow"
            ),
            [basket_col],
            num_buckets=num_buckets,
        ).count()
    )
    sref = ray.put(supp)
    nf = float(n_baskets)

    def rules(t: pa.Table) -> pa.Table:
        s = get_worker_state(
            ("assoc-supp", ref_key(sref)), lambda: ray.get(sref)
        )
        item_t = t.schema.field("item_a").type  # empty-batch type anchor
        b = t.to_pandas()
        n_both = np.tile(b["n_baskets"].to_numpy(np.int64), 2)
        ant = pd.concat([b["item_a"], b["item_b"]], ignore_index=True)
        con = pd.concat([b["item_b"], b["item_a"]], ignore_index=True)
        n_ant = ant.map(s).to_numpy(np.int64) if len(b) else np.empty(0, np.int64)
        n_con = con.map(s).to_numpy(np.int64) if len(b) else np.empty(0, np.int64)
        nbf = n_both.astype(np.float64)
        return pa.table(
            {
                "antecedent": pa.array(ant.to_numpy(), item_t),
                "consequent": pa.array(con.to_numpy(), item_t),
                "n_both": pa.array(n_both),
                "n_ant": pa.array(n_ant),
                "n_cons": pa.array(n_con),
                "support": pa.array(nbf / nf),
                "confidence": pa.array(nbf / n_ant.astype(np.float64)),
                "lift": pa.array(
                    n_both * nf / (n_ant * n_con).astype(np.float64)
                ),
            }
        )

    return pairs.map_batches(rules, batch_format="pyarrow")


def regex_extract(
    ds: rd.Dataset,
    col: str,
    pattern: str,
    keep_cols: list[str] | None = None,
) -> rd.Dataset:
    """Vectorized regex group extraction — structured fields from a
    string column via the Arrow C++ kernel ``pc.extract_regex`` (one
    call per batch, zero per-row Python): the pattern's NAMED groups
    (``(?P<name>...)``) become output columns; non-matching rows get
    NULLs.  ``keep_cols`` pass through unchanged.  Map-only."""
    import re as _re

    import pyarrow.compute as pc

    names = list(_re.compile(pattern).groupindex)
    if not names:
        raise ValueError("pattern needs at least one named group")

    def ext(t: pa.Table) -> pa.Table:
        s = pc.cast(t[col], pa.string())
        m = pc.extract_regex(s, pattern)
        cols = {c: t[c] for c in (keep_cols or [])}
        for nm in names:
            cols[nm] = pc.struct_field(m, nm)
        return pa.table(cols)

    return ds.map_batches(ext, batch_format="pyarrow")


def incremental_join(
    base_l: rd.Dataset,
    delta_l: rd.Dataset,
    base_r: rd.Dataset,
    delta_r: rd.Dataset,
    col: str,
    right_col: str | None = None,
    broadcast_below: int = 2_000_000,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Incremental maintenance of an inner-join view — the lakehouse
    delta pattern: given each side split into an already-joined BASE
    and a new DELTA, emit exactly the join rows the update adds::

        Δ(L ⋈ R) = (ΔL ⋈ (R_base ∪ ΔR)) ∪ (L_base ⋈ ΔR)

    The base×base term — the quadratic bulk a full re-join would
    redo — never executes; each term is a size-gated
    :func:`equi_join`.  ΔR is materialized once (it feeds both the
    union and the second join — single-execution rule), and both legs
    are normalized to Arrow blocks with one canonical column order
    before the union (mixed pandas/arrow unions break downstream
    batchers, CLAUDE.md r3).  Output: the delta join rows, same schema
    as the full join.
    """
    delta_r = delta_r.materialize()
    leg1 = equi_join(
        delta_l, base_r.union(delta_r), col, right_col,
        broadcast_below=broadcast_below, num_buckets=num_buckets,
    )
    leg2 = equi_join(
        base_l, delta_r, col, right_col,
        broadcast_below=broadcast_below, num_buckets=num_buckets,
    )

    cols_holder: dict = {}

    def norm(t: pa.Table) -> pa.Table:
        order = cols_holder.setdefault("c", sorted(t.schema.names))
        return t.select(order)

    a = leg1.map_batches(norm, batch_format="pyarrow")
    b = leg2.map_batches(norm, batch_format="pyarrow")
    return a.union(b)


def cooccurrence_cosine(
    ds: rd.Dataset,
    basket_col: str,
    item_col: str,
    min_count: int = 1,
    broadcast_below: int = 2_000_000,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Cosine-normalized co-occurrence graph — the weighted bipartite
    projection recommender engines rank with: for every item pair,
    ``cosine = n_ab / sqrt(n_a * n_b)`` where ``n_ab`` counts shared
    baskets and ``n_a`` counts the item's distinct baskets (so a pair
    of niche items co-occurring often outranks two bestsellers that
    merely both appear everywhere).

    Shape: :func:`cooccurrence_pairs` (one basket co-location) +
    :func:`distinct_count_by_key` basket counts (one exchange) + two
    size-gated equi_joins (item-count table is item-cardinality) + a
    map-only score.  ``cosine`` is ``int / sqrt(int*int)`` — sqrt and
    divide are single IEEE ops, so a SQL mirror is bit-identical.
    Output ``(item_a, item_b, n_ab, n_a, n_b, cosine)``.
    """
    from .agg import distinct_count_by_key

    pairs = cooccurrence_pairs(
        ds, basket_col, item_col, min_count=min_count,
        num_buckets=num_buckets,
    )
    counts = distinct_count_by_key(
        ds.select_columns([item_col, basket_col]), [item_col], basket_col,
        num_buckets=num_buckets,
    )

    def as_a(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"item_a": b[item_col], "n_a": b["n_distinct"].astype("int64")}
        )

    def as_b(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"item_b": b[item_col], "n_b": b["n_distinct"].astype("int64")}
        )

    joined = equi_join(
        equi_join(pairs, counts.map_batches(as_a, batch_format="pandas"),
                  "item_a", broadcast_below=broadcast_below,
                  num_buckets=num_buckets),
        counts.map_batches(as_b, batch_format="pandas"), "item_b",
        broadcast_below=broadcast_below, num_buckets=num_buckets,
    )

    def score(t: pa.Table) -> pa.Table:
        nab = t["n_baskets"].to_numpy().astype(np.int64)
        na = t["n_a"].to_numpy().astype(np.int64)
        nbv = t["n_b"].to_numpy().astype(np.int64)
        cos = nab / np.sqrt((na * nbv).astype(np.float64))
        return pa.table(
            {
                "item_a": pa.array(t["item_a"].to_numpy().astype(np.int64),
                                   pa.int64()),
                "item_b": pa.array(t["item_b"].to_numpy().astype(np.int64),
                                   pa.int64()),
                "n_ab": pa.array(nab, pa.int64()),
                "n_a": pa.array(na, pa.int64()),
                "n_b": pa.array(nbv, pa.int64()),
                "cosine": pa.array(cos, pa.float64()),
            }
        )

    return joined.map_batches(score, batch_format="pyarrow")


def auto_skew_join(
    left: rd.Dataset,
    right: rd.Dataset,
    col: str,
    right_col: str | None = None,
    hot_count: int | None = None,
    sketch_k: int = 4096,
    broadcast_below: int = 2_000_000,
    num_buckets: int = 64,
    how: str = "inner",
) -> rd.Dataset:
    """Skew-safe equi-join with AUTOMATIC hot-key detection: run the
    exact heavy-hitter pass (Misra-Gries sketch + verify,
    ``sketches.heavy_hitters``) over the left key column and route any
    key above ``hot_count`` (default: ``n/sketch_k + 1``, the
    sketch's guarantee floor) through :func:`equi_join`'s replication
    path while cold keys take the normal bucketed exchange — the
    hands-off version of the manual ``hot_keys`` parameter, for
    pipelines that cannot know their celebrity keys up front.

    The left side is materialized ONCE (sketch pass + join legs —
    single-execution rule).  Identical output to the unsplit join,
    pinned in pytest.
    """
    from .sketches import heavy_hitters

    left = left.materialize()
    n = left.count()
    if n == 0:
        return equi_join(left, right, col, right_col,
                         broadcast_below=broadcast_below,
                         num_buckets=num_buckets, how=how)
    floor = n // sketch_k + 1
    hc = max(int(hot_count), floor) if hot_count is not None else floor
    hh = heavy_hitters(left.select_columns([col]), col, min_count=hc,
                       k=sketch_k)
    hot = hh[col].tolist() if len(hh) else []
    return equi_join(
        left, right, col, right_col,
        broadcast_below=broadcast_below, num_buckets=num_buckets,
        how=how, hot_keys=hot if hot else None,
    )
