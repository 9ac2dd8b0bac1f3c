"""Training-data pipeline operators — PII scrubbing, deterministic
sampling, repetition stats, entropy scoring, and sequence packing.

These extend the textstats family (round-2 additions): every operator is
a single-pass ``map_batches`` transform except :func:`pack_documents`,
which demonstrates the distributed prefix-sum pattern (per-chunk
aggregate → tiny driver scan → broadcast offsets).  Semantics are chosen
to be exactly reproducible in DuckDB SQL (RE2-compatible regexes, pure
integer arithmetic) so the driver's oracle can value-hash them — see
``__ray_entry__.oracle_sql``.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pandas as pd

import ray.data as rd

# RE2-compatible patterns (no lookbehind/backrefs) so the identical
# strings run in DuckDB's regexp_replace / regexp_extract_all
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+?\d[\d().-]{7,}\d"

_EMAIL_RE = re.compile(PII_EMAIL)
_IP_RE = re.compile(PII_IPV4)
_PHONE_RE = re.compile(PII_PHONE)
_WS = re.compile(r"\s+")
_SENT_SPLIT = r"\.\s+"
_SENT_RE = re.compile(_SENT_SPLIT)

# Knuth multiplicative hash constants — reproducible with 64-bit integer
# arithmetic in any SQL engine
HASH_MULT = 2654435761
HASH_MOD = 4294967296


def pii_scrub(batch: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, text) → scrubbed text + per-kind redaction counts.
    Emails → <EMAIL>, IPv4s → <IP>, phone-like digit runs → <PHONE>,
    applied in that order (order matters: an IP inside an email-like
    token must not double-count)."""
    text = batch["text"].fillna("")
    n_email = text.str.count(PII_EMAIL).astype("int64")
    text = text.str.replace(_EMAIL_RE, "<EMAIL>", regex=True)
    n_ip = text.str.count(PII_IPV4).astype("int64")
    text = text.str.replace(_IP_RE, "<IP>", regex=True)
    n_phone = text.str.count(PII_PHONE).astype("int64")
    text = text.str.replace(_PHONE_RE, "<PHONE>", regex=True)
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "scrubbed": text,
            "n_email": n_email,
            "n_ip": n_ip,
            "n_phone": n_phone,
        }
    )


def hash_sample(batch: pd.DataFrame, pct: int = 20, id_col: str = "doc_id") -> pd.DataFrame:
    """Deterministic ``pct``% sample by multiplicative id hash — the
    stratified-sampling primitive for corpus mixing.  Pure integer
    arithmetic, so the identical expression runs in SQL (no RNG state,
    no cluster-order dependence)."""
    keep = id_hash_bucket(batch[id_col]) < pct
    return batch.loc[keep, [id_col]]


def id_hash_bucket(ids: pd.Series) -> np.ndarray:
    """(id * HASH_MULT) mod 2^32 mod 100 for ANY int64 id: the multiply
    runs in uint64, whose silent wraparound is exact mod 2^64 and hence
    exact mod 2^32 (2^32 | 2^64) — int64 math would overflow for
    id ≳ 3.47e9 and negative ids would take sign-following ``%``.  The
    SQL mirror is HUGEINT multiply + non-negative mod:
    ``((CAST(id AS HUGEINT) * M) % 2^32 + 2^32) % 2^32 % 100``."""
    u = ids.to_numpy(dtype=np.int64).astype(np.uint64)
    return (u * np.uint64(HASH_MULT)) % np.uint64(HASH_MOD) % np.uint64(100)


def bottomk_by_hash(
    ds,
    id_col: str,
    k: int,
    batch_size: int = 65536,
):
    """Deterministic fixed-size uniform sample: the k rows with the
    smallest multiplicative id hash (ties broken by id) — the
    "bottom-k sketch" sampling primitive.  Unlike ``hash_sample`` (a
    fixed RATE) this yields an exact COUNT, and unlike a reservoir it
    is order-independent and mergeable, so it distributes: each batch
    keeps its own ≤k smallest (vectorized sort+head), and only those
    ≤ k-per-batch partials reach the final ``sort().limit(k)`` — the
    input is never globally sorted.  SQL mirror: ``ORDER BY <hash
    expr>, id LIMIT k`` (same HUGEINT expression as hash_sample)."""
    import pyarrow as pa

    def partial(b: pd.DataFrame) -> pa.Table:
        u = b[id_col].to_numpy(dtype=np.int64).astype(np.uint64)
        hb = ((u * np.uint64(HASH_MULT)) % np.uint64(HASH_MOD)).astype(np.int64)
        out = (
            b.assign(__hb=hb)
            .sort_values(["__hb", id_col], kind="mergesort")
            .head(k)
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)
        .sort(["__hb", id_col])
        .limit(k)
        .drop_columns(["__hb"])  # return the input schema, not the sort key
    )


def grouped_uniform_sample(
    ds,
    group_cols: list[str],
    id_col: str,
    k: int,
    batch_size: int = 65536,
):
    """Deterministic per-group fixed-k uniform sample: the k rows with
    the smallest multiplicative id hash WITHIN EACH GROUP — per-group
    :func:`bottomk_by_hash`, composed from ``grouped_topk`` (map-side
    ≤k-per-(group,batch) combiner, hash-bucket exchange — never a Ray
    group per key).  Exact per-group count (min(k, group size)),
    order-independent, mergeable, no RNG state.  SQL mirror:
    ``row_number() OVER (PARTITION BY g ORDER BY <hash expr>, id) <= k``.
    Returns the input schema (the hash key is internal)."""
    from .relational import grouped_topk

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        u = b[id_col].to_numpy(dtype=np.int64).astype(np.uint64)
        hb = ((u * np.uint64(HASH_MULT)) % np.uint64(HASH_MOD)).astype(np.int64)
        return b.assign(__gs_hash=hb)

    out = grouped_topk(
        ds.map_batches(tag, batch_format="pandas", batch_size=batch_size),
        group_cols,
        "__gs_hash",
        k,
        descending=False,
        tiebreak=id_col,
    )
    return out.drop_columns(["__gs_hash"])


def repetition_stats(batch: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, text) → sentence counts + duplicate-sentence ratio (the
    boilerplate/repetition quality signal).  Sentences split on
    ``\\.\\s+`` (RE2-safe; identical in regexp_split_to_array)."""
    out = {"doc_id": [], "n_sent": [], "n_uniq_sent": [], "dup_ratio": []}
    for doc_id, text in zip(batch["doc_id"], batch["text"].fillna("")):
        sents = _SENT_RE.split(text)
        n = len(sents)
        u = len(set(sents))
        out["doc_id"].append(doc_id)
        out["n_sent"].append(n)
        out["n_uniq_sent"].append(u)
        out["dup_ratio"].append(round((n - u) / n, 6) if n else 0.0)
    df = pd.DataFrame(out)
    for c in ("n_sent", "n_uniq_sent"):
        df[c] = df[c].astype("int64")
    return df


def char_entropy(batch: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, text) → character-level Shannon entropy in bits — the
    cheap perplexity proxy (gibberish/compressed blobs score high,
    repetitive boilerplate low)."""
    out = {"doc_id": [], "entropy": []}
    for doc_id, text in zip(batch["doc_id"], batch["text"].fillna("")):
        n = len(text)
        if n == 0:
            h = 0.0
        else:
            counts = np.fromiter(Counter(text).values(), dtype=np.float64)
            p = counts / n
            h = float(-(p * np.log2(p)).sum())
        out["doc_id"].append(doc_id)
        out["entropy"].append(round(h, 6))
    return pd.DataFrame(out)


def _token_offsets(
    docs: rd.Dataset,
    chunk: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """(id, n_tokens, token_offset) Dataset + corpus total — the
    distributed-prefix-sum core shared by :func:`pack_documents` and
    :func:`shard_by_token_budget`.  Documents in ``id`` order are laid
    end-to-end; ``token_offset`` is each doc's global start.

    No global sort: (1) per-doc whitespace token counts in
    ``map_batches``; (2) ``groupby(doc_id // chunk)`` sums — one
    bounded-key shuffle whose result (one row per chunk) is tiny;
    (3) the driver scans chunk sums into prefix offsets (10^12 docs /
    4096 ≈ 2.4×10^8 chunks — raise ``chunk`` at that scale) and
    broadcasts them; (4) a second pass computes in-chunk cumulative sums
    and adds the chunk prefix.  Every heavy step streams."""
    def count_tokens(b: pd.DataFrame) -> pd.DataFrame:
        from .textstats import _ws_tokens

        _, n = _ws_tokens(b[text_col])
        return pd.DataFrame(
            {
                id_col: b[id_col],
                "n_tokens": n,
                "chunk_id": (b[id_col] // chunk).astype("int64"),
            }
        )

    toks = docs.map_batches(count_tokens, batch_format="pandas")
    return _offsets_from_lengths(toks, id_col=id_col)


def _offsets_from_lengths(toks: rd.Dataset, id_col: str = "doc_id"):
    """Distributed prefix sum over precomputed per-row lengths:
    ``toks`` carries (id_col, n_tokens, chunk_id) rows; returns the
    (id, n_tokens, token_offset) Dataset + total (the
    :func:`_token_offsets` contract, reusable for any length source —
    whitespace counts, BPE id-list lengths, byte sizes)."""
    import ray

    from ..state.worker_state import get_worker_state, ref_key

    toks = toks.materialize()

    from .agg import grouped_reduce

    # grouped_reduce, not the builtin aggregate: chunk cardinality grows
    # with the corpus (CLAUDE.md r3 per-key-Python pathology)
    chunk_sums = grouped_reduce(
        toks, ["chunk_id"], {"total": ("n_tokens", "sum")}
    ).to_pandas()
    chunk_sums = chunk_sums.sort_values("chunk_id")
    prefix = {}
    running = 0
    for cid, total in zip(chunk_sums["chunk_id"], chunk_sums["total"]):
        prefix[int(cid)] = running
        running += int(total)
    prefix_ref = ray.put(prefix)

    # exchange on a 64-value bucket of chunk_id, not chunk_id itself —
    # chunk cardinality grows with the corpus and per-chunk Ray groups
    # are pathological (CLAUDE.md r3); the in-bucket cumsum vectorizes
    # over ALL the bucket's chunks at once via groupby-transform
    import pyarrow as pa

    def bucketed(b: pd.DataFrame) -> pa.Table:
        out = b.copy()
        out["_pk_bkt"] = (
            pd.util.hash_pandas_object(b["chunk_id"], index=False).to_numpy()
            % np.uint64(64)
        ).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def assign(group: pd.DataFrame) -> pa.Table:
        pre = get_worker_state(("pack-prefix", ref_key(prefix_ref)), lambda: ray.get(prefix_ref))
        g = group.sort_values(["chunk_id", id_col])
        base = g["chunk_id"].map(pre).to_numpy()
        within = (
            g.groupby("chunk_id", sort=False)["n_tokens"]
            .cumsum()
            .to_numpy() - g["n_tokens"].to_numpy()
        )
        offs = base + within
        return pa.table(
            {
                id_col: g[id_col].to_numpy(),
                "n_tokens": g["n_tokens"].to_numpy().astype("int64"),
                "token_offset": offs.astype("int64"),
            }
        )

    out = (
        toks.map_batches(bucketed, batch_format="pandas", batch_size=65536)
        .groupby("_pk_bkt")
        .map_groups(assign, batch_format="pandas")
    )
    return out, running


def pack_documents(
    docs: rd.Dataset,
    max_tokens: int = 512,
    chunk: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Assign every document a (pack_id, token_offset) for fixed-size
    training-sequence packing: documents in ``doc_id`` order are laid
    end-to-end and ``pack_id = token_offset // max_tokens``.  Returns a
    DATASET (one row per document — corpus cardinality); collection is
    the caller's choice at the caller's scale.  Rides the
    :func:`_token_offsets` distributed prefix sum."""
    import pyarrow as pa

    offs, _ = _token_offsets(docs, chunk=chunk, id_col=id_col, text_col=text_col)

    def finish(b: pd.DataFrame) -> pa.Table:
        off = b["token_offset"].to_numpy(dtype=np.int64)
        return pa.table(
            {
                id_col: b[id_col].to_numpy(),
                "pack_id": (off // max_tokens).astype("int64"),
                "token_offset": off,
            }
        )

    return offs.map_batches(finish, batch_format="pandas")


def shard_by_token_budget(
    docs: rd.Dataset,
    n_shards: int,
    chunk: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Balanced training-shard assignment: documents in ``id`` order are
    cut into ``n_shards`` contiguous shards of ~equal TOKEN budget (not
    equal doc count — the quantity that balances training work), by
    bucketing each doc's global start offset: ``shard_id = min(S-1,
    (token_offset · S) // total_tokens)``.  Pure integer arithmetic on
    the :func:`_token_offsets` prefix sum, so the result is
    order-independent and SQL hash-exact (window running sum + the same
    floor-division).  Feed the result to a partitioned-parquet sink
    keyed on ``shard_id`` for resumable training-data writes.  The
    int64 product bounds: 10^12-token corpora × 10^4 shards sit at
    10^16 ≪ 2^63."""
    import pyarrow as pa

    offs, total = _token_offsets(docs, chunk=chunk, id_col=id_col, text_col=text_col)
    denom = max(int(total), 1)  # all-empty corpus: everything lands in shard 0

    def finish(b: pd.DataFrame) -> pa.Table:
        off = b["token_offset"].to_numpy(dtype=np.int64)
        sid = np.minimum(n_shards - 1, off * np.int64(n_shards) // np.int64(denom))
        return pa.table(
            {
                id_col: b[id_col].to_numpy(),
                "n_tokens": b["n_tokens"].to_numpy().astype("int64"),
                "token_offset": off,
                "shard_id": sid.astype("int64"),
            }
        )

    return offs.map_batches(finish, batch_format="pandas")


def stratified_sample(
    batch: pd.DataFrame,
    rates: dict[str, int],
    group_col: str = "lang",
    default_pct: int = 0,
    id_col: str = "doc_id",
) -> pd.DataFrame:
    """Per-group deterministic sampling — the corpus-mixing primitive
    (e.g. upweight English, downsample boilerplate sources).  A row
    survives iff ``id_hash_bucket(id) < rates[group]`` (percent, 0–100);
    groups absent from ``rates`` fall back to ``default_pct``.  Pure
    integer arithmetic on the id like :func:`hash_sample`, so the result
    is independent of batch/cluster order and SQL-replicable with a CASE
    over the same hash expression."""
    buckets = id_hash_bucket(batch[id_col])
    pct = (
        batch[group_col]
        .map(lambda g: rates.get(g, default_pct))
        .to_numpy(dtype=np.int64)
    )
    return batch[buckets < pct]


def shuffle_order(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    num_buckets: int = 1024,
) -> rd.Dataset:
    """Deterministic global training-shuffle order: every row gets its
    0-based ``position`` in the ordering by ``(hash(id), id)`` — the
    reproducible alternative to ``random_shuffle`` (same order at any
    parallelism, resumable mid-epoch by position range).

    SQL mirror: ``row_number() OVER (ORDER BY hash_expr, id) - 1``.

    Distributed rank without a global sort barrier: the hash's top bits
    give an ORDER-ALIGNED bucket (every key in bucket b sorts before
    every key in bucket b+1), so (1) one ``groupby(bucket)`` count pass
    → tiny driver prefix scan (``num_buckets`` rows); (2) in-bucket
    sort + cumcount + bucket prefix in ``map_groups``.  Both heavy
    passes stream; nothing driver-side exceeds ``num_buckets`` rows.
    Size ``num_buckets`` so corpus/num_buckets rows fit a worker heap
    (raise it at 100 TB)."""
    import pyarrow as pa
    import ray

    from ..state.worker_state import get_worker_state, ref_key

    span = HASH_MOD // num_buckets  # 2^32 / buckets: order-aligned split

    def add_key(b: pd.DataFrame) -> pa.Table:
        # Arrow out: the bucket groupby below is a sort-shuffle
        # (CLAUDE.md r3 invariant; code-review r4)
        u = b[id_col].to_numpy(dtype=np.int64).astype(np.uint64)
        key = (u * np.uint64(HASH_MULT)) % np.uint64(HASH_MOD)
        return pa.table(
            {
                id_col: b[id_col].to_numpy(),
                "_key": key.astype(np.int64),
                "_bucket": (key // np.uint64(span)).astype(np.int64),
            }
        )

    keyed = docs.map_batches(add_key, batch_format="pandas").materialize()

    # bucket counts via per-batch bincount partials + driver sum — the
    # global_rank shape; the old groupby(Count) spent a SECOND full
    # all-to-all of the keyed relation to produce num_buckets rows
    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        h = np.bincount(b["_bucket"].to_numpy(), minlength=num_buckets)
        return pd.DataFrame({"h": [h.astype(np.int64).tobytes()]})

    parts = keyed.map_batches(count_partial, batch_format="pandas").to_pandas()
    totals = np.stack(
        [np.frombuffer(x, dtype=np.int64) for x in parts["h"]]
    ).sum(axis=0)
    prefix = {
        int(b): int(p)
        for b, p in enumerate(np.r_[0, np.cumsum(totals)[:-1]])
    }
    prefix_ref = ray.put(prefix)

    def rank(group: pd.DataFrame) -> pd.DataFrame:
        pre = get_worker_state(
            ("shuffle-prefix", ref_key(prefix_ref)), lambda: ray.get(prefix_ref)
        )
        g = group.sort_values(["_key", id_col])
        base = pre[int(g["_bucket"].iloc[0])]
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                "position": base + np.arange(len(g), dtype=np.int64),
            }
        )

    return keyed.groupby("_bucket").map_groups(rank, batch_format="pandas")


def global_rank(
    ds,
    order_cols: list[str],
    tiebreak: str,
    num_buckets: int = 256,
    sample_size: int = 10_000,
    out_col: str = "position",
    running_sums: dict[str, str] | None = None,
):
    """Distributed ``row_number() OVER (ORDER BY order_cols, tiebreak)
    - 1`` over ARBITRARY sort keys — the range-partitioned rank
    (TeraSort shape), generalizing :func:`shuffle_order` (whose
    order-aligned buckets only exist for uniform hash keys):

    1. one deterministic bottom-``sample_size``-by-hash sample of the
       key columns picks ``num_buckets-1`` boundary rows;
    2. every row is tagged with its range bucket (vectorized
       lexicographic searchsorted over the broadcast boundaries);
    3. one ``groupby(bucket)`` count pass → tiny driver prefix scan;
    4. in-bucket sort + cumcount + bucket prefix (same final shape as
       shuffle_order).

    Boundary quality only affects bucket BALANCE, never correctness —
    counts give exact prefixes and the in-bucket sort is total (the
    unique ``tiebreak`` column makes the order deterministic).  All
    input columns survive.  Skew guard: a degenerate sample (few
    distinct keys) just yields fewer, larger buckets.

    ``running_sums`` (out_col -> in_col) additionally emits the
    INCLUSIVE prefix sum of each in_col over the same global order
    (SQL ``sum(x) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)``) —
    same two passes, the per-bucket count pass just also carries one
    sum per bucket and the driver prefix-scans it.  Exact for integer
    columns (Python-int driver scan + int64 in-bucket cumsum)."""
    import ray
    import pyarrow as pa

    from ..state.worker_state import get_worker_state, ref_key

    key_cols = list(order_cols) + [tiebreak]

    sample = (
        bottomk_by_hash(ds.select_columns(key_cols), tiebreak, k=sample_size)
        .to_pandas()
        .sort_values(key_cols, kind="mergesort")
    )
    n_bounds = min(num_buckets - 1, max(len(sample) - 1, 0))
    if n_bounds > 0:
        idx = np.linspace(0, len(sample) - 1, n_bounds + 2).astype(int)[1:-1]
        bounds = sample.iloc[idx][key_cols].reset_index(drop=True)
    else:
        bounds = sample.iloc[:0][key_cols]
    bref = ray.put(bounds)

    def _bucket_of(frame: pd.DataFrame, bnd: pd.DataFrame) -> np.ndarray:
        if len(bnd) == 0:
            return np.zeros(len(frame), dtype=np.int64)
        # lexicographic searchsorted via merge-rank: concatenate rows,
        # stable-sort by keys with boundaries FIRST on ties, then each
        # row's bucket = number of boundaries before it
        tag = np.r_[np.zeros(len(bnd), dtype=np.int64),
                    np.ones(len(frame), dtype=np.int64)]
        both = pd.concat([bnd, frame[bnd.columns]], ignore_index=True)
        both["__is_row"] = tag
        order = both.sort_values(
            list(bnd.columns) + ["__is_row"], kind="mergesort"
        ).index.to_numpy()
        n_before = np.empty(len(both), dtype=np.int64)
        seen = 0
        pos_sorted = np.empty(len(both), dtype=np.int64)
        pos_sorted[order] = np.arange(len(both))
        is_bnd_sorted = (tag[order] == 0)
        n_before_sorted = np.cumsum(is_bnd_sorted) - is_bnd_sorted
        n_before = n_before_sorted[pos_sorted]
        return n_before[len(bnd):]

    def tag(b: pd.DataFrame) -> pa.Table:
        bnd = get_worker_state(("grank_b", ref_key(bref)), lambda: ray.get(bref))
        b = b.copy()
        b["__gr_bucket"] = _bucket_of(b, bnd)
        return pa.Table.from_pandas(b, preserve_index=False)

    tagged = ds.map_batches(tag, batch_format="pandas").materialize()

    rs = dict(running_sums or {})  # out_col -> in_col, exact (int-safe)

    def bucket_partials(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("__gr_bucket")
        out = pd.DataFrame({"n": g.size()})
        for oc, ic in rs.items():
            out[oc] = g[ic].sum()
        return out.reset_index(names="__gr_bucket")

    per_bucket = (
        tagged.map_batches(bucket_partials, batch_format="pandas")
        .to_pandas()
        .groupby("__gr_bucket")
        .sum()
        .sort_index()
    )
    prefix, running = {}, 0
    sum_prefix: dict[int, dict[str, int]] = {}
    run_sums = {oc: 0 for oc in rs}
    for bkt, row in per_bucket.iterrows():
        prefix[int(bkt)] = running
        running += int(row["n"])
        sum_prefix[int(bkt)] = dict(run_sums)
        for oc in rs:
            run_sums[oc] += row[oc].item()
    pref = ray.put((prefix, sum_prefix))

    def rank_bucket(g: pd.DataFrame) -> pa.Table:
        pre, spre = get_worker_state(
            ("grank_p", ref_key(pref)), lambda: ray.get(pref)
        )
        g = g.sort_values(key_cols, kind="mergesort").reset_index(drop=True)
        bkt = int(g["__gr_bucket"].iloc[0])
        g[out_col] = pre[bkt] + np.arange(len(g), dtype=np.int64)
        for oc, ic in rs.items():
            g[oc] = spre[bkt][oc] + np.cumsum(g[ic].to_numpy())
        return pa.Table.from_pandas(
            g.drop(columns="__gr_bucket"), preserve_index=False
        )

    return tagged.groupby("__gr_bucket").map_groups(
        rank_bucket, batch_format="pandas"
    )


def weighted_sample_k(
    ds,
    id_col: str,
    weight_col: str,
    k: int,
    batch_size: int = 65536,
):
    """Deterministic weighted sampling without replacement — the
    Efraimidis–Spirakis exponential-sort scheme (Inf. Proc. Letters
    2006): each row gets key ``u^(1/w)`` with ``u`` a deterministic
    uniform from the multiplicative id hash; the k LARGEST keys are the
    sample (inclusion probability proportional to weight, exactly the
    ES guarantee).  Same distributed shape as :func:`bottomk_by_hash`:
    per-batch partial top-k, then sort+limit over ≤k-per-batch partials
    — mergeable, order-independent, reproducible (no RNG state).

    Keys are compared as ``log(u)/w`` (monotone transform, better float
    behavior near 1).  Rows with weight ≤ 0 are excluded (SQL: WHERE
    w > 0).  Ties broken by id."""
    import pyarrow as pa

    def partial(b: pd.DataFrame) -> pa.Table:
        w = b[weight_col].to_numpy(dtype=np.float64)
        u64 = b[id_col].to_numpy(dtype=np.int64).astype(np.uint64)
        h = (u64 * np.uint64(HASH_MULT)) % np.uint64(HASH_MOD)
        u = (h.astype(np.float64) + 0.5) / float(HASH_MOD)  # (0, 1)
        with np.errstate(divide="ignore", invalid="ignore"):
            key = np.where(w > 0, np.log(u) / w, -np.inf)
        out = (
            b.assign(__es_key=key)
            .sort_values(["__es_key", id_col], ascending=[False, True],
                         kind="mergesort")
            .head(k)
        )
        out = out[out["__es_key"] > -np.inf]
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)
        .sort(["__es_key", id_col], descending=[True, False])
        .limit(k)
        .drop_columns(["__es_key"])  # return the input schema, not the sort key
    )


def profile_columns(
    ds,
    numeric_cols: list[str],
    string_cols: list[str] | None = None,
    batch_size: int = 65536,
) -> pd.DataFrame:
    """One-pass data-quality profile — per column: row/null counts,
    min/max, and sum (numerics) or min/max length (strings).  The
    ingestion-validation primitive (schema drift, null explosions,
    out-of-range values) as one streaming scan: per-batch vectorized
    partials, canonical-sorted driver merge (partial count is
    O(batches); route through sketches.tree_reduce beyond ~10^5
    batches).  Returns one LONG row per column: (column, n_rows,
    n_nulls, min, max, sum) with min/max/sum for strings being
    length-based and sum null."""
    string_cols = string_cols or []

    def part(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        n = len(b)
        for c in numeric_cols:
            v = b[c]
            nn = int(v.isna().sum())
            vv = v.dropna()
            rows.append(
                (c, n, nn,
                 float(vv.min()) if len(vv) else np.nan,
                 float(vv.max()) if len(vv) else np.nan,
                 float(vv.sum()) if len(vv) else 0.0)
            )
        for c in string_cols:
            v = b[c]
            nn = int(v.isna().sum())
            ln = v.dropna().str.len()
            rows.append(
                (c, n, nn,
                 float(ln.min()) if len(ln) else np.nan,
                 float(ln.max()) if len(ln) else np.nan,
                 np.nan)
            )
        return pd.DataFrame(
            rows, columns=["column", "n_rows", "n_nulls", "mn", "mx", "sm"]
        )

    parts = ds.map_batches(
        part, batch_format="pandas", batch_size=batch_size
    ).to_pandas()
    parts = parts.sort_values(["column", "n_rows", "mn", "mx"], kind="mergesort")
    out = parts.groupby("column", as_index=False).agg(
        n_rows=("n_rows", "sum"),
        n_nulls=("n_nulls", "sum"),
        min=("mn", "min"),
        max=("mx", "max"),
        # min_count=1: an all-NaN group (string columns) must stay NaN —
        # pandas' default min_count=0 sums it to 0.0, contradicting the
        # documented "sum for strings is null" (code-review r4)
        sum=("sm", lambda s: s.sum(min_count=1)),
    )
    for c in ("n_rows", "n_nulls"):
        out[c] = out[c].astype("int64")
    return out.sort_values("column").reset_index(drop=True)


def chunk_documents(
    ds,
    chunk_tokens: int = 128,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_size: int = 8192,
):
    """Fixed-size token chunking with overlap — the context-window
    preprocessing every RAG / training pipeline runs: doc d with n
    whitespace tokens yields chunks starting every ``chunk_tokens -
    overlap`` tokens; a trailing start that would only re-cover the
    previous chunk's overlap is not emitted (``n_chunks = 1 +
    ceil((n - chunk)/(chunk - overlap))`` for n > chunk, 1 for
    0 < n ≤ chunk, 0 for empty docs).  Output (id, chunk_idx,
    start_tok, n_tokens) — the assignment table a slicing pass joins
    back to text (same contract as pack_documents).  Fully vectorized:
    token counts from one pandas str op, chunk explode via
    repeat+arange, no per-row Python.  Tokenization = lowercase-free
    whitespace split, identical to pack_documents/vocab_topk."""
    import pyarrow as pa

    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")

    def chunks(b: pd.DataFrame) -> pa.Table:
        from .textstats import _ws_tokens

        _, n = _ws_tokens(b[text_col])
        n_chunks = np.where(
            n == 0, 0,
            np.where(n <= chunk_tokens, 1,
                     1 + np.ceil((n - chunk_tokens) / stride).astype(np.int64)),
        ).astype(np.int64)
        ids = np.repeat(b[id_col].to_numpy(dtype=np.int64), n_chunks)
        n_rep = np.repeat(n, n_chunks)
        offsets = np.r_[0, np.cumsum(n_chunks)]
        idx = np.arange(int(n_chunks.sum()), dtype=np.int64) - np.repeat(
            offsets[:-1], n_chunks
        )
        start = idx * stride
        return pa.table(
            {
                id_col: ids,
                "chunk_idx": idx,
                "start_tok": start,
                "n_tokens": np.minimum(chunk_tokens, n_rep - start),
            }
        )

    return ds.map_batches(chunks, batch_format="pandas", batch_size=batch_size)


def ntile_of_position(p: np.ndarray, n: int, k: int) -> np.ndarray:
    """1-based SQL NTILE of 0-based global positions ``p``: the first
    ``n % k`` tiles hold ``⌈n/k⌉`` rows, the rest ``⌊n/k⌋`` (pure
    closed form — hypothesis-tested against the window definition)."""
    q, rem = divmod(n, k)
    if q == 0:  # fewer rows than tiles: tile i+1 gets row i
        return p + 1
    thr = rem * (q + 1)
    return np.where(p < thr, p // (q + 1), rem + (p - thr) // q) + 1


def ntile(
    ds,
    order_cols: list[str],
    tiebreak: str,
    k: int,
    out_col: str = "tile",
    num_buckets: int = 256,
):
    """SQL ``NTILE(k) OVER (ORDER BY order_cols, tiebreak)`` — equal-
    size tiles over a GLOBAL ordering without a global sort: rides
    :func:`global_rank` (range-partitioned TeraSort rank), then the
    tile is a closed form of the 0-based position: the first ``n % k``
    tiles hold ``⌈n/k⌉`` rows, the rest ``⌊n/k⌋`` (exact SQL window
    semantics, 1-based).  Beyond-reference operator."""
    import pyarrow as pa

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # one execution of the input, not three: count + global_rank's
    # sample pass + its tag pass would each replay a derived upstream
    # (the equi_join right-side rule) — and a nondeterministic upstream
    # would make n disagree with the ranked rows
    ds = ds.materialize()
    n = ds.count()
    ranked = global_rank(ds, order_cols, tiebreak,
                         num_buckets=num_buckets, out_col="__nt_pos")
    def assign(b: pd.DataFrame) -> pa.Table:
        p = b["__nt_pos"].to_numpy(dtype=np.int64)
        t = ntile_of_position(p, n, k)
        b = b.drop(columns="__nt_pos")
        b[out_col] = t.astype(np.int64)
        return pa.Table.from_pandas(b, preserve_index=False)

    return ranked.map_batches(assign, batch_format="pandas")


def percent_rank(
    ds,
    order_cols: list[str],
    tiebreak: str,
    out_col: str = "pct_rank",
    num_buckets: int = 256,
):
    """SQL ``PERCENT_RANK() OVER (ORDER BY order_cols, tiebreak)`` —
    position/(n−1) over the global total order (the unique tiebreak
    makes RANK ≡ ROW_NUMBER, so the windowed definition collapses to
    the closed form); rides :func:`global_rank`, one range exchange,
    no single-node sort.  n == 1 yields 0.0 (SQL convention)."""
    import pyarrow as pa

    ds = ds.materialize()  # count + sample + tag: one input execution
    n = ds.count()
    denom = float(n - 1) if n > 1 else 1.0
    ranked = global_rank(ds, order_cols, tiebreak,
                         num_buckets=num_buckets, out_col="__pr_pos")

    def assign(b: pd.DataFrame) -> pa.Table:
        p = b["__pr_pos"].to_numpy(dtype=np.float64)
        b = b.drop(columns="__pr_pos")
        b[out_col] = p / denom
        return pa.Table.from_pandas(b, preserve_index=False)

    return ranked.map_batches(assign, batch_format="pandas")


def temperature_quotas(
    counts: "pd.Series",
    total_k: int,
    alpha: float = 0.5,
) -> dict:
    """Per-group sample quotas for temperature-balanced corpus mixing
    (the multilingual-LM sampling rule: p_g ∝ n_g**alpha flattens the
    group distribution; alpha=1 keeps natural proportions, alpha→0
    approaches uniform).  At ``alpha=0.5`` the whole computation is
    integer arithmetic — weights ``floor(sqrt(n_g))`` (IEEE sqrt is
    correctly rounded, so DuckDB's ``floor(sqrt(n))`` is bit-identical)
    and floor-division quotas ``(total_k·w_g) // Σw`` — making the
    downstream sample hash-exact oracle-able.  Other alphas take a
    float path (pytest-covered only; ceil/floor boundaries of float
    quotas are not portable across engines)."""
    if alpha == 0.5:
        w = {g: int(math.floor(math.sqrt(float(n)))) for g, n in counts.items()}
        wsum = sum(w.values())
        return {g: min(int(counts[g]), (total_k * w[g]) // wsum) for g in w}
    w = {g: float(n) ** alpha for g, n in counts.items()}
    wsum = sum(w.values())
    return {g: min(int(counts[g]), int(math.floor(total_k * w[g] / wsum))) for g in w}


def temperature_sample(
    docs: rd.Dataset,
    total_k: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    batch_size: int = 65536,
) -> rd.Dataset:
    """Temperature-balanced corpus sampling: draw ~``total_k`` docs with
    per-group quotas ∝ n_g**alpha (:func:`temperature_quotas`), each
    group's quota filled by its ``k_g`` lowest-multiplicative-hash ids —
    deterministic, order-independent, no RNG state.

    Two passes, both scale-shaped: (1) per-group counts via map-side
    ``value_counts`` partials combined on the driver (group cardinality
    = languages/sources — bounded, never corpus-cardinality); (2) the
    ``grouped_topk`` two-pass combiner with a PER-GROUP k: map side
    keeps ≤k_g rows per (group, batch) so the 64-bucket hash exchange
    moves at most k_g×groups×batches rows, and the in-bucket finalizer
    re-selects the global bottom-k_g.  SQL mirror (alpha=0.5):
    ``row_number() OVER (PARTITION BY g ORDER BY <hash>, id) <=
    least(n, (K·floor(sqrt(n))) // Σfloor(sqrt(n)))``."""
    import pyarrow as pa

    def cnt(b: pd.DataFrame) -> pd.DataFrame:
        vc = b[group_col].value_counts()
        return pd.DataFrame(
            {group_col: vc.index.to_numpy(), "n": vc.to_numpy().astype(np.int64)}
        )

    parts = docs.map_batches(
        cnt, batch_format="pandas", batch_size=batch_size
    ).to_pandas()
    counts = parts.groupby(group_col, sort=False)["n"].sum()
    kmap = temperature_quotas(counts, total_k, alpha)

    def select(d: pd.DataFrame) -> pd.DataFrame:
        d = d.sort_values(["__ts_hash", id_col], kind="mergesort")
        cc = d.groupby(group_col, sort=False).cumcount().to_numpy()
        kk = d[group_col].map(kmap).fillna(0).to_numpy(dtype=np.int64)
        return d[cc < kk]

    def partial(b: pa.Table) -> pa.Table:
        # explicit output schema: a batch whose every row is filtered
        # out must not let empty object columns infer Arrow NULL
        # (CLAUDE.md empty-frame rule)
        out_schema = b.schema.append(pa.field("__ts_hash", pa.int64())).append(
            pa.field("__ts_bkt", pa.int64())
        )
        d = b.to_pandas()
        u = d[id_col].to_numpy(dtype=np.int64).astype(np.uint64)
        d = d.assign(
            __ts_hash=((u * np.uint64(HASH_MULT)) % np.uint64(HASH_MOD)).astype(
                np.int64
            )
        )
        out = select(d).copy()
        out["__ts_bkt"] = (
            pd.util.hash_pandas_object(out[group_col], index=False).to_numpy()
            % np.uint64(64)
        ).astype(np.int64)
        return pa.Table.from_pandas(out, schema=out_schema, preserve_index=False)

    def final(g: pd.DataFrame) -> pa.Table:
        out = select(g).drop(columns=["__ts_hash", "__ts_bkt"])
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        docs.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .groupby("__ts_bkt")
        .map_groups(final, batch_format="pandas")
    )


def pack_token_ids(
    encoded: rd.Dataset,
    block_len: int = 128,
    eos_id: int = 0,
    chunk: int = 4096,
    id_col: str = "doc_id",
    ids_col: str = "token_ids",
    drop_partial: bool = True,
    num_buckets: int = 64,
) -> rd.Dataset:
    """GPT-style sequence packing at the TOKEN-ID level: documents in
    ``id_col`` order (integer ids) are laid end-to-end, ``eos_id``
    appended after each document, and the stream chopped into fixed
    ``block_len`` blocks — the step after :func:`~.bpe.bpe_encode` that
    produces actual training sequences (``pack_documents`` assigns
    pack ids from token COUNTS; this materializes the id blocks).

    Three exchanges, none carrying more than it must:

    1. skinny (id, length) rows → per-chunk sums (``grouped_reduce``),
       driver scans ≤ #chunks rows into prefix offsets, broadcast;
    2. the PAYLOAD exchange — ids bucketed by hash(chunk_id); each
       chunk group computes its docs' global offsets (in-chunk cumsum +
       broadcast chunk prefix) and splits every doc's ids at block
       boundaries, emitting (block_id, start_in_block, part) rows;
    3. parts bucketed by hash(block_id); each block reassembles by
       ``start_in_block`` into one flat buffer.

    Returns ``(block_id, token_ids list<int32>, n_docs)`` where
    ``n_docs`` counts documents ENDING in the block.  The trailing
    short block is dropped when ``drop_partial`` (the usual pretraining
    choice) else emitted as-is."""
    import pyarrow as pa

    import ray

    from ..state.worker_state import get_worker_state, ref_key
    from .agg import grouped_reduce

    nb = np.uint64(num_buckets)
    L = int(block_len)

    def lengths(t) -> pd.DataFrame:
        import pyarrow.compute as pc

        ids = t[id_col].to_numpy()
        n = pc.list_value_length(t[ids_col]).to_numpy().astype(np.int64) + 1
        return pd.DataFrame(
            {id_col: ids, "n_tokens": n, "chunk_id": ids // chunk}
        )

    encoded = encoded.materialize()  # lengths pass AND payload pass
    skinny = encoded.map_batches(lengths, batch_format="pyarrow")
    chunk_sums = grouped_reduce(
        skinny, ["chunk_id"], {"total": ("n_tokens", "sum")}
    ).to_pandas().sort_values("chunk_id")
    prefix, running = {}, 0
    for cid, total in zip(chunk_sums["chunk_id"], chunk_sums["total"]):
        prefix[int(cid)] = running
        running += int(total)
    pref_ref = ray.put(prefix)
    n_blocks_total = running // L if drop_partial else -(-running // L)

    def tag_chunk(t):
        ids = t[id_col].to_numpy()
        bkt = ((ids // chunk).astype(np.uint64) % nb).astype(np.int64)
        return t.append_column("__pt_bkt", pa.array(bkt, pa.int64()))

    def split_parts(t: pa.Table) -> pa.Table:
        pre = get_worker_state(
            ("packid-prefix", ref_key(pref_ref)), lambda: ray.get(pref_ref)
        )
        order = np.argsort(t[id_col].to_numpy(), kind="mergesort")
        t = t.take(order)
        dids = t[id_col].to_numpy()
        lists = t[ids_col].to_pylist()
        cids = dids // chunk
        lens = np.fromiter((len(x) + 1 for x in lists), np.int64, len(lists))
        # in-chunk cumsum + broadcast chunk prefix = global offsets
        s = pd.Series(lens)
        within = s.groupby(pd.Series(cids)).cumsum().to_numpy() - lens
        starts = np.fromiter(
            (pre[int(c)] for c in cids), np.int64, len(cids)
        ) + within

        out_block, out_start, out_final = [], [], []
        flat_parts: list[np.ndarray] = []
        for ids_, o in zip(lists, starts):
            arr = np.empty(len(ids_) + 1, np.int32)
            arr[:-1] = ids_
            arr[-1] = eos_id
            pos = o
            while len(arr):
                take = min(L - (pos % L), len(arr))
                out_block.append(pos // L)
                out_start.append(pos % L)
                out_final.append(take == len(arr))
                flat_parts.append(arr[:take])
                arr = arr[take:]
                pos += take
        flat = (
            np.concatenate(flat_parts) if flat_parts else np.empty(0, np.int32)
        )
        offs = np.zeros(len(flat_parts) + 1, np.int32)
        np.cumsum(
            np.fromiter((len(p) for p in flat_parts), np.int64,
                        len(flat_parts)),
            out=offs[1:],
        )
        blk = np.asarray(out_block, np.int64)
        return pa.table(
            {
                "block_id": pa.array(blk, pa.int64()),
                "start": pa.array(np.asarray(out_start, np.int64), pa.int64()),
                "doc_final": pa.array(np.asarray(out_final, bool), pa.bool_()),
                "part": pa.ListArray.from_arrays(
                    pa.array(offs, pa.int32()), pa.array(flat, pa.int32())
                ),
                "__pt_bbkt": pa.array(
                    (blk.astype(np.uint64) % nb).astype(np.int64), pa.int64()
                ),
            }
        )

    parts = (
        encoded.map_batches(tag_chunk, batch_format="pyarrow")
        .groupby("__pt_bkt")
        .map_groups(split_parts, batch_format="pyarrow")
    )

    def assemble(t: pa.Table) -> pa.Table:
        df_order = np.lexsort(
            (t["start"].to_numpy(), t["block_id"].to_numpy())
        )
        t = t.take(df_order)
        blk = t["block_id"].to_numpy()
        fin = t["doc_final"].to_numpy(zero_copy_only=False)
        plists = t["part"].to_pylist()
        ub, starts_i, counts = np.unique(blk, return_index=True,
                                         return_counts=True)
        out_blk, out_ids, out_nd = [], [], []
        for b, si, c in zip(ub, starts_i, counts):
            if int(b) >= n_blocks_total:
                continue
            seq = np.concatenate(
                [np.asarray(p, np.int32) for p in plists[si:si + c]]
            )
            if drop_partial and len(seq) < L:
                continue
            out_blk.append(int(b))
            out_ids.append(seq)
            out_nd.append(int(fin[si:si + c].sum()))
        flat = (
            np.concatenate(out_ids) if out_ids else np.empty(0, np.int32)
        )
        offs = np.zeros(len(out_ids) + 1, np.int32)
        np.cumsum(
            np.fromiter((len(x) for x in out_ids), np.int64, len(out_ids)),
            out=offs[1:],
        )
        return pa.table(
            {
                "block_id": pa.array(np.asarray(out_blk, np.int64), pa.int64()),
                "token_ids": pa.ListArray.from_arrays(
                    pa.array(offs, pa.int32()), pa.array(flat, pa.int32())
                ),
                "n_docs": pa.array(np.asarray(out_nd, np.int64), pa.int64()),
            }
        )

    return (
        parts.groupby("__pt_bbkt").map_groups(assemble, batch_format="pyarrow")
    )


def conversation_windows(
    turns: rd.Dataset,
    window: int = 4,
    stride: int = 2,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
    role_col: str | None = None,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Sliding windows of consecutive turns per conversation — the
    chat-format training-example generator (a dialogue LM trains on
    bounded context windows, not whole conversations): for each
    conversation, windows of ``window`` turns starting every ``stride``
    turns, in ``idx_col`` order; a conversation shorter than ``window``
    yields one window with all its turns, and a final tail window
    (start = n − window) is added whenever the stride grid would leave
    trailing turns uncovered — every turn appears in ≥ 1 window.  With
    ``role_col``, each turn renders as ``role: text`` (the standard
    chat template shape).

    One hash(conv) exchange co-locates each conversation's turns; the
    per-bucket UDF sorts once and slices windows vectorized per conv.
    Emits ``(conv_id, window_idx, first_turn, last_turn, n_turns,
    text)`` — window_idx = start // stride."""
    import pyarrow as pa

    nb = np.uint64(num_buckets)
    cols = [conv_col, idx_col, text_col] + ([role_col] if role_col else [])

    def tag(b: pd.DataFrame) -> pa.Table:
        out = b[cols].copy()
        h = pd.util.hash_pandas_object(out[conv_col], index=False).to_numpy()
        out["__cw_bkt"] = (h.astype(np.uint64) % nb).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def windows(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values([conv_col, idx_col], kind="mergesort")
        if role_col:
            rendered = g[role_col].fillna("") + ": " + g[text_col].fillna("")
        else:
            rendered = g[text_col].fillna("")
        out = {
            conv_col: [], "window_idx": [], "first_turn": [],
            "last_turn": [], "n_turns": [], "text": [],
        }
        # plain loop over conversations inside the bucket (the group
        # count per bucket is corpus/num_buckets conversations; the
        # inner slicing is vectorized)
        frame = pd.DataFrame(
            {"conv": g[conv_col].to_numpy(), "r": rendered.to_numpy(),
             "i": g[idx_col].to_numpy()}
        )
        for conv, grp in frame.groupby("conv", sort=False):
            texts = grp["r"].to_numpy()
            idxs = grp["i"].to_numpy()
            n = len(texts)
            if n >= window:
                starts = list(range(0, n - window + 1, stride))
                if starts[-1] != n - window:  # cover the tail
                    starts.append(n - window)
            else:
                starts = [0]
            for wi, s in enumerate(starts):
                e = min(s + window, n)
                out[conv_col].append(conv)
                out["window_idx"].append(wi)
                out["first_turn"].append(int(idxs[s]))
                out["last_turn"].append(int(idxs[e - 1]))
                out["n_turns"].append(e - s)
                out["text"].append("\n".join(texts[s:e]))
        return pa.table(
            {
                conv_col: pa.array(out[conv_col], pa.string()),
                "window_idx": pa.array(out["window_idx"], pa.int64()),
                "first_turn": pa.array(out["first_turn"], pa.int64()),
                "last_turn": pa.array(out["last_turn"], pa.int64()),
                "n_turns": pa.array(out["n_turns"], pa.int64()),
                "text": pa.array(out["text"], pa.string()),
            }
        )

    return (
        turns.map_batches(tag, batch_format="pandas")
        .groupby("__cw_bkt")
        .map_groups(windows, batch_format="pandas")
    )


def zorder_key(
    ds,
    x_col: str,
    y_col: str,
    bits: int = 10,
    out_col: str = "zkey",
):
    """Morton / z-order interleave of two quantized dimensions — the
    multi-dimensional clustering key behind Delta/Iceberg ``OPTIMIZE
    ZORDER``: range-partitioning 100 TB by ``zkey`` (via
    :func:`global_rank` or ``ds.sort``) gives every output partition a
    tight bounding BOX in both dimensions at once, so per-file min/max
    column stats prune 2-D range scans that a single-column sort order
    can't (a one-dim sort makes the other dimension's min/max span the
    whole domain in every file).

    Inputs must already be integers quantized to ``[0, 2**bits)``; they
    are mask-wrapped defensively (``% 2**bits``).  Map-only, vectorized
    (one numpy pass per bit plane, ``bits`` iterations over the whole
    batch — never per row); the exchange, if any, belongs to the sort
    that consumes the key.  Bit layout: x occupies even bits, y odd —
    reproducible in ANSI SQL as a sum of shift/mask terms, so the
    layout query is oracle hash-exact.
    """
    import pyarrow as pa

    mask = (1 << bits) - 1

    def add(b: pd.DataFrame) -> pa.Table:
        b = b.copy()
        x = b[x_col].to_numpy(dtype=np.int64) & mask
        y = b[y_col].to_numpy(dtype=np.int64) & mask
        z = np.zeros(len(b), dtype=np.int64)
        for k in range(bits):
            z |= ((x >> k) & 1) << (2 * k)
            z |= ((y >> k) & 1) << (2 * k + 1)
        b[out_col] = z
        return pa.Table.from_pandas(b, preserve_index=False)

    return ds.map_batches(add, batch_format="pandas")


def ring_negative_samples(
    ds,
    id_col: str = "doc_id",
    group_col: str = "lang",
    k: int = 2,
    lookahead: int = 8,
    num_buckets: int = 64,
):
    """Deterministic negative sampling for contrastive training: every
    row gets up to ``k`` negatives (rows from a DIFFERENT ``group_col``
    value), picked as the first k different-group rows among the next
    ``lookahead`` positions on a pseudo-random RING.

    The ring order is ``md5(str(id))`` (tie-break id) — reproducible in
    ANSI SQL (``ORDER BY md5(CAST(id AS VARCHAR)), id``), so the oracle
    hash-compares exactly; md5 scatters groups uniformly, so a
    different-group row is almost always within a few hops.  Rows whose
    next ``lookahead`` hops are all same-group get fewer than k
    negatives (deterministically, on both sides).

    Scale shape — a HALO exchange, not a self-join: after one
    :func:`global_rank` range partition assigns ring positions, each
    row is shipped to its own position-bucket plus (if it sits within
    ``lookahead`` of a bucket start) to the PREVIOUS bucket as a
    read-only halo candidate; buckets then resolve every anchor locally
    with vectorized searchsorted probes over the ``lookahead`` ring
    offsets.  Each row crosses the wire at most twice, vs the O(N*L)
    pair blow-up of the naive range self-join the SQL oracle runs.

    Returns ``(id, neg_rank 1..k, neg_id)``.
    """
    import hashlib

    import pyarrow as pa

    if k < 1 or lookahead < k:
        raise ValueError("need k >= 1 and lookahead >= k")

    def add_hash(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[id_col, group_col]].copy()
        b["__h"] = [
            hashlib.md5(str(v).encode()).hexdigest() for v in b[id_col]
        ]
        return b

    ranked = global_rank(
        ds.map_batches(add_hash, batch_format="pandas"),
        ["__h"],
        id_col,
        out_col="__p",
    ).materialize()
    n = ranked.count()
    if n == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "neg_rank": pa.array([], pa.int64()),
                    "neg_id": pa.array([], pa.int64()),
                }
            )
        )
    # bucket width must exceed the halo so a lookahead spans <= 2 buckets
    bw = max(-(-n // num_buckets), lookahead + 1)
    nb_eff = -(-n // bw)

    def emit(b: pd.DataFrame) -> pa.Table:
        p = b["__p"].to_numpy(dtype=np.int64)
        ids = b[id_col].to_numpy(dtype=np.int64)
        grp = b[group_col].to_numpy(dtype=object)
        own = p // bw
        halo_mask = (p % bw) < lookahead
        rb = np.concatenate([own, (own[halo_mask] - 1) % nb_eff])
        return pa.table(
            {
                id_col: pa.array(np.concatenate([ids, ids[halo_mask]]), pa.int64()),
                "__g": pa.array(np.concatenate([grp, grp[halo_mask]]), pa.string()),
                "__p": pa.array(np.concatenate([p, p[halo_mask]]), pa.int64()),
                "__anchor": pa.array(
                    np.concatenate(
                        [np.ones(len(p), np.int64),
                         np.zeros(int(halo_mask.sum()), np.int64)]
                    ),
                    pa.int64(),
                ),
                "__rb": pa.array(rb, pa.int64()),
            }
        )

    def resolve(g: pd.DataFrame) -> pa.Table:
        cand = g.drop_duplicates("__p").sort_values("__p")
        cpos = cand["__p"].to_numpy(dtype=np.int64)
        cid = cand[id_col].to_numpy(dtype=np.int64)
        cgrp = cand["__g"].to_numpy(dtype=object)
        a = g[g["__anchor"] == 1]
        ap = a["__p"].to_numpy(dtype=np.int64)
        aid = a[id_col].to_numpy(dtype=np.int64)
        agrp = a["__g"].to_numpy(dtype=object)
        out_id, out_rank, out_neg = [], [], []
        taken = np.zeros(len(ap), dtype=np.int64)
        for d in range(1, lookahead + 1):
            want = (ap + d) % n
            j = np.searchsorted(cpos, want)
            ok = (j < len(cpos)) & (cpos[np.minimum(j, len(cpos) - 1)] == want)
            hit = ok & (taken < k)
            if not hit.any():
                continue
            jj = j[hit]
            diff = cgrp[jj] != agrp[hit]
            sel = np.zeros(len(ap), dtype=bool)
            sel[np.flatnonzero(hit)[diff]] = True
            if sel.any():
                taken[sel] += 1
                out_id.append(aid[sel])
                out_rank.append(taken[sel].copy())
                out_neg.append(cid[j[sel]])
        return pa.table(
            {
                id_col: pa.array(
                    np.concatenate(out_id) if out_id else np.empty(0, np.int64),
                    pa.int64(),
                ),
                "neg_rank": pa.array(
                    np.concatenate(out_rank) if out_rank else np.empty(0, np.int64),
                    pa.int64(),
                ),
                "neg_id": pa.array(
                    np.concatenate(out_neg) if out_neg else np.empty(0, np.int64),
                    pa.int64(),
                ),
            }
        )

    return (
        ranked.map_batches(emit, batch_format="pandas")
        .groupby("__rb")
        .map_groups(resolve, batch_format="pandas")
    )


def abc_classify(
    ds,
    key_col: str,
    val_col: str,
    out_col: str = "abc_class",
    cum_col: str = "cum_value",
    a_frac: tuple[int, int] = (4, 5),
    b_frac: tuple[int, int] = (19, 20),
    num_buckets: int = 256,
):
    """Pareto / ABC classification: rank keys by ``val_col`` DESCENDING
    and label the head that covers the first ``a_frac`` of the total
    'A', through ``b_frac`` 'B', the tail 'C' — the inventory /
    revenue-concentration working-set split (which 20% of parts carry
    80% of revenue).  Beyond-reference operator.

    ``val_col`` must be an exact integer measure (cents, counts): the
    class test is a pure INTEGER cross-multiplication
    (``cum * a_den <= total * a_num``), so both engines classify
    boundary rows identically — no float share ever exists.  int64
    bound: ``total * max(denominator)`` must fit (document per caller).

    Rides :func:`global_rank` with ``running_sums`` — two passes over
    the (already aggregated, one-row-per-key) input, no single-node
    sort.  Output adds ``position`` (0-based rank), the inclusive
    ``cum_col`` and the class label.
    """
    import pyarrow as pa

    ds = ds.materialize()  # count/sample/tag: one input execution
    total = int(
        ds.map_batches(
            lambda b: pd.DataFrame({"s": [b[val_col].sum()]}),
            batch_format="pandas",
        )
        .to_pandas()["s"]
        .sum()
    )
    with_neg = ds.map_batches(
        lambda b: b.assign(__abc_neg=-b[val_col]), batch_format="pandas"
    )
    ranked = global_rank(
        with_neg, ["__abc_neg"], key_col, num_buckets=num_buckets,
        out_col="position", running_sums={cum_col: val_col},
    )
    a_num, a_den = a_frac
    b_num, b_den = b_frac

    def classify(b: pd.DataFrame) -> pa.Table:
        cum = b[cum_col].to_numpy()
        cls = np.where(
            cum * a_den <= total * a_num, "A",
            np.where(cum * b_den <= total * b_num, "B", "C"),
        )
        b = b.drop(columns="__abc_neg")
        b[out_col] = cls
        return pa.Table.from_pandas(b, preserve_index=False)

    return ranked.map_batches(classify, batch_format="pandas")


def rfm_segments(
    orders,
    key_col: str,
    ts_col: str,
    amount_col: str,
    k: int = 5,
    num_buckets: int = 64,
):
    """RFM (recency / frequency / monetary) customer segmentation — the
    classic CRM quantile scoring: per key, days since last order
    (relative to the corpus-max order date), order count, and exact
    int64-cent revenue, each cut into ``k`` NTILE quantile tiles over a
    deterministic total order (recency ASC / frequency DESC / monetary
    DESC, key as tiebreak — tile 1 is always the "best" band).
    Beyond-reference operator.

    One ``agg.grouped_reduce`` exchange collapses the fact table to one
    row per key; the three NTILE passes ride :func:`ntile` (range-
    partitioned global_rank) over that key-sized frame.  Every output
    column is integer (recency_days by exact int64 µs floor-division,
    cents by half-up lattice snap), so the SQL oracle hash-compares
    with no float slack.

    Output: ``(key, recency_days, frequency, monetary_cents, r_tile,
    f_tile, m_tile, rfm_code)`` with ``rfm_code = r*100 + f*10 + m``.
    """
    import pyarrow as pa

    from .agg import grouped_reduce

    def prep(b: pd.DataFrame) -> pa.Table:
        p = b[amount_col].to_numpy(dtype=np.float64)
        cents = np.floor(p * 100.0 + 0.5).astype(np.int64)
        t = b[ts_col].astype("datetime64[ns]").astype("int64") // 1000
        return pa.table(
            {
                key_col: pa.array(b[key_col]),
                "__cents": pa.array(cents, pa.int64()),
                "__t_us": pa.array(t.to_numpy(dtype=np.int64), pa.int64()),
            }
        )

    agg = grouped_reduce(
        orders.map_batches(prep, batch_format="pandas"),
        [key_col],
        {
            "frequency": (None, "count"),
            "monetary_cents": ("__cents", "sum"),
            "__last_us": ("__t_us", "max"),
        },
        num_buckets=num_buckets,
    ).materialize()
    max_us = int(agg.max("__last_us"))

    def recency(b: pd.DataFrame) -> pa.Table:
        b = b.copy()
        b["recency_days"] = (max_us - b["__last_us"].to_numpy()) // 86_400_000_000
        b["__neg_f"] = -b["frequency"]
        b["__neg_m"] = -b["monetary_cents"]
        return pa.Table.from_pandas(
            b.drop(columns="__last_us"), preserve_index=False
        )

    base = agg.map_batches(recency, batch_format="pandas")
    t1 = ntile(base, ["recency_days"], key_col, k, out_col="r_tile")
    t2 = ntile(t1, ["__neg_f"], key_col, k, out_col="f_tile")
    t3 = ntile(t2, ["__neg_m"], key_col, k, out_col="m_tile")

    def code(b: pd.DataFrame) -> pa.Table:
        b = b.drop(columns=["__neg_f", "__neg_m"])
        b["rfm_code"] = (
            b["r_tile"] * 100 + b["f_tile"] * 10 + b["m_tile"]
        ).astype("int64")
        return pa.Table.from_pandas(b, preserve_index=False)

    return t3.map_batches(code, batch_format="pandas")


def target_encode(
    ds: rd.Dataset,
    id_col: str,
    cat_col: str,
    target_col: str,
    broadcast_below: int = 2_000_000,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Leave-one-out target encoding — the standard high-cardinality
    categorical feature for tabular ML, leak-free by construction: each
    row's encoding uses its category's target statistics EXCLUDING the
    row itself (``loo_sum = Σ_cat - t_row``, ``loo_n = n_cat - 1``).
    Emits ``(id, cat, loo_sum, loo_n, loo_mean)``; the sum/count pair
    is exact int64 (callers needing oracle-grade determinism consume
    those; ``loo_mean`` is their float quotient rounded half-away 6 dp,
    NULL for singleton categories).  ``target_col`` must be integer
    (convert money to cents upstream — the round-5 exactness rule).

    One grouped_reduce over the category builds (Σ, n); attaching it
    back is size-gated like every small-side join in this repo:
    ≤ ``broadcast_below`` categories ride a ``ray.put`` dict into a
    map-only pass, above that the category table co-locates through
    :func:`~.relational.equi_join` — never a driver bottleneck."""
    import pyarrow as pa

    import ray

    from ..state.worker_state import get_worker_state, ref_key
    from .agg import grouped_reduce

    stats = grouped_reduce(
        ds.map_batches(
            lambda b: pa.table(
                {
                    "__te_cat": pa.Array.from_pandas(b[cat_col]),
                    "__te_t": pa.array(
                        b[target_col].to_numpy(dtype=np.int64), pa.int64()
                    ),
                }
            ),
            batch_format="pandas",
        ),
        ["__te_cat"],
        {"cat_sum": ("__te_t", "sum"), "cat_n": (None, "count")},
        num_buckets=num_buckets,
    ).materialize()

    def _emit(b: pd.DataFrame, cs: np.ndarray, cn: np.ndarray) -> pa.Table:
        t = b[target_col].to_numpy(dtype=np.int64)
        loo_sum = cs - t
        loo_n = cn - 1
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = np.where(loo_n > 0, loo_sum / np.maximum(loo_n, 1), np.nan)
        mean = np.where(
            np.isnan(mean), np.nan,
            np.sign(mean) * np.floor(np.abs(mean) * 1e6 + 0.5) / 1e6,
        )
        return pa.table(
            {
                id_col: pa.array(b[id_col].to_numpy(dtype=np.int64), pa.int64()),
                cat_col: pa.Array.from_pandas(b[cat_col]),
                "loo_sum": pa.array(loo_sum, pa.int64()),
                "loo_n": pa.array(loo_n, pa.int64()),
                "loo_mean": pa.array(mean, pa.float64()),
            }
        )

    if stats.count() <= broadcast_below:
        ref = ray.put(stats.to_pandas().set_index("__te_cat"))

        def encode(b: pd.DataFrame, _r=ref) -> pa.Table:
            lut = get_worker_state(("te", ref_key(_r)), lambda: ray.get(_r))
            cs = b[cat_col].map(lut["cat_sum"]).to_numpy(dtype=np.int64)
            cn = b[cat_col].map(lut["cat_n"]).to_numpy(dtype=np.int64)
            return _emit(b, cs, cn)

        return ds.map_batches(encode, batch_format="pandas")

    # corpus-cardinality categories: tag-union co-location by hash(cat)
    # (string-keyed; equi_join's bucketed path is int64-keyed), in-bucket
    # pandas merge on the TRUE category — exact under hash collisions
    nb = np.uint64(num_buckets)

    def _bkt(s: pd.Series) -> np.ndarray:
        return (
            pd.util.hash_pandas_object(s, index=False).to_numpy() % nb
        ).astype(np.int64)

    def tag_rows(b: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(dtype=np.int64),
                "__te_cat": b[cat_col].to_numpy(),
                "__te_t": b[target_col].to_numpy(dtype=np.int64),
                "cat_sum": np.int64(0),
                "cat_n": np.int64(0),
                "__side": np.int8(0),
            }
        )
        out["__te_bkt"] = _bkt(out["__te_cat"])
        return pa.Table.from_pandas(out, preserve_index=False)

    def tag_stats(b: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame(
            {
                id_col: np.int64(0),
                "__te_cat": b["__te_cat"].to_numpy(),
                "__te_t": np.int64(0),
                "cat_sum": b["cat_sum"].to_numpy(dtype=np.int64),
                "cat_n": b["cat_n"].to_numpy(dtype=np.int64),
                "__side": np.int8(1),
            }
        )
        out["__te_bkt"] = _bkt(out["__te_cat"])
        return pa.Table.from_pandas(out, preserve_index=False)

    def join_bucket(g: pd.DataFrame) -> pa.Table:
        rows = g[g["__side"] == 0]
        st = g[g["__side"] == 1][["__te_cat", "cat_sum", "cat_n"]]
        m = rows[[id_col, "__te_cat", "__te_t"]].merge(st, on="__te_cat")
        b = pd.DataFrame(
            {
                id_col: m[id_col],
                cat_col: m["__te_cat"],
                target_col: m["__te_t"],
            }
        )
        return _emit(
            b,
            m["cat_sum"].to_numpy(dtype=np.int64),
            m["cat_n"].to_numpy(dtype=np.int64),
        )

    return (
        ds.map_batches(tag_rows, batch_format="pandas")
        .union(stats.map_batches(tag_stats, batch_format="pandas"))
        .groupby("__te_bkt")
        .map_groups(join_bucket, batch_format="pandas")
    )


def pruning_stats(
    ds,
    x_col: str,
    y_col: str,
    id_col: str,
    x_range: tuple[int, int],
    y_range: tuple[int, int],
    file_rows: int = 500,
    bits: int = 10,
) -> pd.DataFrame:
    """File-skipping effectiveness audit — the measurable payoff of
    :func:`zorder_key`: lay the table out as fixed-size files under
    (a) the NATURAL order (by ``id_col``) and (b) the Morton z-order,
    compute every file's 2-D min/max bounding box, and count how many
    files a rectangular predicate ``x in x_range AND y in y_range``
    can skip outright (box disjoint from the rectangle — exactly what
    Parquet row-group / Iceberg file stats pruning does).

    Both layouts ride ONE range-partition exchange each (global_rank,
    TeraSort shape); the box aggregate and the skip count are
    grouped_reduce rows (file-count-sized metadata, never raw data —
    only TWO summary rows reach the driver).  Output per layout:
    ``(layout, n_files, n_skipped, rows_scanned)`` — exact integers.
    """
    import pyarrow as pa

    from .agg import grouped_reduce

    xlo, xhi = int(x_range[0]), int(x_range[1])
    ylo, yhi = int(y_range[0]), int(y_range[1])

    def summarize(ranked, layout: str) -> pd.DataFrame:
        def part_tag(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "part": b["position"].to_numpy(dtype=np.int64)
                    // file_rows,
                    x_col: b[x_col].to_numpy(dtype=np.int64),
                    y_col: b[y_col].to_numpy(dtype=np.int64),
                }
            )

        boxes = grouped_reduce(
            ranked.map_batches(part_tag, batch_format="pandas"),
            ["part"],
            {
                "n_rows": (None, "count"),
                "min_x": (x_col, "min"), "max_x": (x_col, "max"),
                "min_y": (y_col, "min"), "max_y": (y_col, "max"),
            },
        )

        def skipflag(t: pa.Table) -> pa.Table:
            mnx = t["min_x"].to_numpy().astype(np.int64)
            mxx = t["max_x"].to_numpy().astype(np.int64)
            mny = t["min_y"].to_numpy().astype(np.int64)
            mxy = t["max_y"].to_numpy().astype(np.int64)
            n = t["n_rows"].to_numpy().astype(np.int64)
            skip = (mxx < xlo) | (mnx > xhi) | (mxy < ylo) | (mny > yhi)
            return pa.table(
                {
                    "one": pa.array(np.ones(len(n), np.int64), pa.int64()),
                    "skipped": pa.array(skip.astype(np.int64), pa.int64()),
                    "scanned": pa.array(
                        np.where(skip, 0, n).astype(np.int64), pa.int64()
                    ),
                }
            )

        summary = grouped_reduce(
            boxes.map_batches(skipflag, batch_format="pyarrow"),
            ["one"],
            {
                "n_files": (None, "count"),
                "n_skipped": ("skipped", "sum"),
                "rows_scanned": ("scanned", "sum"),
            },
        ).to_pandas()
        return pd.DataFrame(
            {
                "layout": [layout],
                "n_files": summary["n_files"].astype("int64"),
                "n_skipped": summary["n_skipped"].astype("int64"),
                "rows_scanned": summary["rows_scanned"].astype("int64"),
            }
        )

    base = ds.materialize()  # consumed by both layouts once

    def dup_key(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__nat_ord"] = b[id_col]  # global_rank needs key != tiebreak
        return b

    nat = global_rank(
        base.map_batches(dup_key, batch_format="pandas"),
        ["__nat_ord"], id_col, out_col="position",
    )
    z = zorder_key(base, x_col, y_col, bits=bits)
    zr = global_rank(z, ["zkey"], id_col, out_col="position")
    out = pd.concat(
        [summarize(nat, "natural"), summarize(zr, "zorder")],
        ignore_index=True,
    )
    return out.sort_values("layout").reset_index(drop=True)


def compaction_plan(
    files: pd.DataFrame,
    id_col: str,
    size_col: str,
    capacity: int,
) -> pd.DataFrame:
    """Small-file compaction planning (the OPTIMIZE bin-packing step):
    assign files to merge bins of total size <= ``capacity`` with
    first-fit-decreasing — deterministic (size desc, id asc; first bin
    that fits), within 11/9 OPT + 1 bins of optimal.  Driver math over
    FILE METADATA (file-count-bounded, the resample/quantile driver
    contract — the planner consumes a listing, never data).  Files
    larger than ``capacity`` get their own bin (already-compact files
    pass through).  Output ``(id, size, bin)`` plus per-row
    ``bin_total`` for audit.
    """
    f = files[[id_col, size_col]].copy()
    f = f.sort_values([size_col, id_col],
                      ascending=[False, True]).reset_index(drop=True)
    bins: list[int] = []  # remaining capacity per bin
    assign = np.empty(len(f), dtype=np.int64)
    for i, sz in enumerate(f[size_col].to_numpy()):
        placed = False
        for bi in range(len(bins)):
            if bins[bi] >= sz:
                bins[bi] -= int(sz)
                assign[i] = bi
                placed = True
                break
        if not placed:
            bins.append(max(int(capacity) - int(sz), 0))
            assign[i] = len(bins) - 1
    f["bin"] = assign
    totals = f.groupby("bin")[size_col].transform("sum").astype("int64")
    f["bin_total"] = totals
    return f.reset_index(drop=True)


def length_batching_stats(
    ds,
    id_col: str,
    len_col: str,
    batch_rows: int = 32,
) -> pd.DataFrame:
    """Padding-waste audit of length-bucketed inference batching: fixed
    ``batch_rows`` micro-batches under (a) NATURAL order (by id) and
    (b) LENGTH-SORTED order; per layout the total padded cells
    ``sum_b (batch_max * rows_in_batch - batch_len_sum)`` — the
    measured payoff of sorting by sequence length before batched
    model inference (same shape as :func:`pruning_stats` for scans).

    Two range-partition exchanges (global_rank), per-batch aggregates
    through grouped_reduce, TWO summary rows to the driver — exact
    integers, SQL hash-exact.  Output ``(layout, n_batches,
    total_cells, padded_cells, pad_fraction)``.
    """
    import pyarrow as pa

    from .agg import grouped_reduce

    def summarize(ranked, layout: str) -> pd.DataFrame:
        def tag(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "batch": b["position"].to_numpy(dtype=np.int64)
                    // batch_rows,
                    "ln": b[len_col].to_numpy(dtype=np.int64),
                }
            )

        per_batch = grouped_reduce(
            ranked.map_batches(tag, batch_format="pandas"),
            ["batch"],
            {"n": (None, "count"), "mx": ("ln", "max"), "sm": ("ln", "sum")},
        )

        def cells(t: pa.Table) -> pa.Table:
            n = t["n"].to_numpy().astype(np.int64)
            mx = t["mx"].to_numpy().astype(np.int64)
            sm = t["sm"].to_numpy().astype(np.int64)
            return pa.table(
                {
                    "one": pa.array(np.ones(len(n), np.int64), pa.int64()),
                    "cells": pa.array(mx * n, pa.int64()),
                    "pad": pa.array(mx * n - sm, pa.int64()),
                }
            )

        s = grouped_reduce(
            per_batch.map_batches(cells, batch_format="pyarrow"),
            ["one"],
            {"n_batches": (None, "count"), "total_cells": ("cells", "sum"),
             "padded_cells": ("pad", "sum")},
        ).to_pandas()
        out = pd.DataFrame(
            {
                "layout": [layout],
                "n_batches": s["n_batches"].astype("int64"),
                "total_cells": s["total_cells"].astype("int64"),
                "padded_cells": s["padded_cells"].astype("int64"),
            }
        )
        out["pad_fraction"] = out["padded_cells"].to_numpy(
            np.float64) / out["total_cells"].to_numpy(np.float64)
        return out

    base = ds.materialize()

    def dup_key(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__lb_ord"] = b[id_col]
        return b

    nat = global_rank(
        base.map_batches(dup_key, batch_format="pandas"),
        ["__lb_ord"], id_col, out_col="position",
    )
    srt = global_rank(base, [len_col], id_col, out_col="position")
    out = pd.concat(
        [summarize(nat, "natural"), summarize(srt, "sorted")],
        ignore_index=True,
    )
    return out.sort_values("layout").reset_index(drop=True)


def mix_rebalance(
    ds,
    group_col: str,
    id_col: str,
    targets: dict,
    num_buckets: int = 64,
):
    """Down-sample a corpus to a TARGET group mix (the data-mixing
    step before pretraining: "20% code, 30% web, ..."), deterministic
    and SQL-reproducible: the largest output size needing NO
    upsampling is ``N_out = min_g n_g / share_g``; each group keeps an
    integer-percent hash slice ``pct_g = floor(100 * share_g * N_out /
    n_g)`` selected by the Knuth multiplicative id hash
    (:func:`id_hash_bucket` — pure integer arithmetic, identical in
    SQL, no RNG / cluster-order dependence).

    Two passes: one grouped_reduce for group counts (driver-tiny),
    one broadcast-dict filter map.  Returns ``(kept_ds, plan)`` where
    plan is ``(group, n_in, pct)``.  Groups missing from ``targets``
    are dropped (pct 0).
    """
    from .agg import grouped_reduce

    counts = grouped_reduce(
        ds.select_columns([group_col]), [group_col],
        {"n_in": (None, "count")}, num_buckets=num_buckets,
    ).to_pandas()
    counts["n_in"] = counts["n_in"].astype("int64")
    tot_share = float(sum(targets.values()))
    share = {g: float(s) / tot_share for g, s in targets.items()}
    n_out = min(
        float(n) / share[g]
        for g, n in zip(counts[group_col], counts["n_in"])
        if share.get(g)
    )
    # +1e-9 before floor (mirrored in the SQL oracle): the anchor
    # group computes 100*(n/share)*share/n which lands an ulp BELOW
    # 100 and would floor to 99, silently shaving the scarcest group
    pct = {
        g: int(np.floor(100.0 * share[g] * n_out / float(n) + 1e-9))
        if share.get(g) else 0
        for g, n in zip(counts[group_col], counts["n_in"])
    }

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        pcts = b[group_col].map(pct).fillna(0).to_numpy(dtype=np.int64)
        m = id_hash_bucket(b[id_col]) < pcts
        return b[m]

    plan = counts.copy()
    plan["pct"] = plan[group_col].map(pct).astype("int64")
    plan = plan.sort_values(group_col).reset_index(drop=True)
    return ds.map_batches(keep, batch_format="pandas"), plan
