"""Distributed ranked retrieval: BM25 top-k over a document column.

Two streaming passes, no shuffle:

1. **corpus statistics** — one ``map_batches`` pass emits a single
   partial row per batch (doc count, summed doc length, per-term
   document frequencies); partials are summed driver-side (one row per
   batch — bounded and tiny, the sketch-partial shape).
2. **score + top-k** — per-batch vectorized scoring (pandas
   ``str.count`` with word-boundary regexes per query term — no
   per-row Python), each batch keeps only its local top-k, the driver
   merges ``batches × k`` rows.

Scores use the Robertson/Sparck-Jones BM25 with the +1 idf floor:
``idf = ln((N - df + .5)/(df + .5) + 1)``,
``score = Σ idf · tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl))``,
with ``dl`` = whitespace token count (the token_stats convention).

Scores are rounded half-away at ``round_dp`` decimals BEFORE ranking so
the ordering is reproducible against a SQL oracle computing the same
formula (ln differs in the last ulp across libms); ties break by
ascending doc id.  Docs matching no term (score 0) are excluded.

No reference counterpart (SURVEY §2 extension: text-analysis family).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _round_ha(v: np.ndarray, d: int) -> np.ndarray:
    f = 10.0**d
    return np.sign(v) * np.floor(np.abs(v) * f + 0.5) / f


def bm25_topk(
    docs: rd.Dataset,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.5,
    b: float = 0.75,
    round_dp: int = 6,
) -> pd.DataFrame:
    """Top-``k`` documents by BM25 score for ``terms`` — returns a
    driver-small DataFrame ``(doc_id, score)`` ranked by (score desc,
    id asc)."""
    docs = docs.select_columns([id_col, text_col])
    pats = [r"\b" + re.escape(t.lower()) + r"\b" for t in terms]
    nt = len(terms)

    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        low = batch[text_col].str.lower()
        stripped = low.str.strip()
        dl = np.where(stripped.str.len() == 0, 0, stripped.str.count(r"\s+") + 1)
        row = {"n": [len(batch)], "dl_sum": [int(dl.sum())]}
        for i, p in enumerate(pats):
            row[f"df{i}"] = [int((low.str.count(p) > 0).sum())]
        return pd.DataFrame(row)

    parts = docs.map_batches(stats, batch_format="pandas").to_pandas()
    n = int(parts["n"].sum())
    if n == 0:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype=float)})
    avgdl = float(parts["dl_sum"].sum()) / n
    idf = np.array(
        [np.log((n - int(parts[f"df{i}"].sum()) + 0.5)
                / (int(parts[f"df{i}"].sum()) + 0.5) + 1.0)
         for i in range(nt)]
    )

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        low = batch[text_col].str.lower()
        stripped = low.str.strip()
        dl = np.where(
            stripped.str.len() == 0, 0, stripped.str.count(r"\s+") + 1
        ).astype(np.float64)
        norm = k1 * (1.0 - b + b * dl / avgdl)
        s = np.zeros(len(batch))
        for i, p in enumerate(pats):
            tf = low.str.count(p).to_numpy(dtype=np.float64)
            s += idf[i] * tf * (k1 + 1.0) / (tf + norm)
        out = pd.DataFrame({id_col: batch[id_col], "score": _round_ha(s, round_dp)})
        out = out[out["score"] > 0]
        return out.sort_values(
            ["score", id_col], ascending=[False, True]
        ).head(k)

    top = docs.map_batches(score, batch_format="pandas").to_pandas()
    if top.empty:  # all-empty blocks drop the schema
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype=float)})
    return (
        top.sort_values(["score", id_col], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def inverted_postings(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Sharded inverted-index construction: (term, doc_id, tf, df)
    posting rows, co-located by term — the materialization BM25/ANN
    serving tiers load, where :func:`bm25_topk` is the index-free
    query-time flavor.

    One exchange, and it is the minimum possible one: a document's
    tokens never split across batches, so per-(term, doc) ``tf`` is
    FINAL map-side (vectorized Arrow tokenize → flatten → pandas
    groupby per batch); the ``hash(term) % num_buckets`` exchange then
    only attaches ``df`` (posting-list length) with a vectorized
    in-bucket transform.  Consumers shard the postings by the same term
    hash — feed to a partitioned sink for a resumable on-disk index.
    Lowercased whitespace terms (the token_stats convention); empty
    docs contribute nothing."""
    import pyarrow as pa

    from .textstats import _ws_tokens

    import pyarrow.compute as pc

    out_schema = pa.schema(
        [
            ("term", pa.string()),
            (id_col, pa.int64()),
            ("tf", pa.int64()),
            ("__ip_bkt", pa.int64()),
        ]
    )

    def explode(b: pd.DataFrame) -> pa.Table:
        toks, n = _ws_tokens(b[text_col], lower=True)
        keep = n > 0
        ids_all = b[id_col].to_numpy(dtype=np.int64)
        if not keep.all():
            toks = toks.filter(pa.array(keep))
            ids_all = ids_all[keep]
            n = n[keep]
        ids = np.repeat(ids_all, n)
        terms = pc.list_flatten(toks).to_pandas()
        tf = (
            pd.DataFrame({"term": terms.to_numpy(), id_col: ids})
            .groupby(["term", id_col], sort=False)
            .size()
            .rename("tf")
            .reset_index()
        )
        tf["__ip_bkt"] = (
            pd.util.hash_pandas_object(tf["term"], index=False).to_numpy()
            % np.uint64(num_buckets)
        ).astype(np.int64)
        # explicit schema: an all-empty-doc batch yields a 0-row frame
        # whose object columns would otherwise infer Arrow NULL
        # (CLAUDE.md empty-frame rule)
        return pa.Table.from_pandas(tf, schema=out_schema, preserve_index=False)

    def attach_df(g: pd.DataFrame) -> pa.Table:
        out = g.drop(columns="__ip_bkt").copy()
        out["df"] = out.groupby("term", sort=False)[id_col].transform("size")
        for c in ("tf", "df"):
            out[c] = out[c].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        docs.map_batches(explode, batch_format="pandas")
        .groupby("__ip_bkt")
        .map_groups(attach_df, batch_format="pandas")
    )


def bm25_topk_indexed(
    postings: rd.Dataset,
    doc_lens: rd.Dataset,
    terms: list[str],
    id_col: str = "doc_id",
    dl_col: str = "n_tokens",
    k: int = 10,
    k1: float = 1.5,
    b: float = 0.75,
    round_dp: int = 6,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Index-backed BM25 top-k: score from a materialized
    :func:`inverted_postings` table plus a doc-length table (e.g.
    ``token_stats`` output), instead of re-scanning raw text per query.
    Only the QUERY TERMS' posting rows and two ints per doc cross the
    wire — at corpus scale that is the difference between touching a
    few posting lists and re-reading 100 TB of text per query.

    Same formula/rounding/tie-break as :func:`bm25_topk` (idf with the
    +1 floor, half-away rounding before ranking); results are identical
    whenever tokens are punctuation-free, the one divergence being
    tokenization (the index is whitespace-token-based, the scan flavor
    counts regex word boundaries — pytest pins the equivalence).

    Shape: tiny driver aggregates for N/avgdl/df, then ONE
    hash(doc)-bucket exchange carrying (query-term postings ∪ doc
    lengths); per-doc scores complete in-bucket (a doc's rows co-locate),
    so each bucket emits only its local top-k."""
    import pyarrow as pa
    import pyarrow.compute as pc

    tset = sorted({t.lower() for t in terms})

    def dstats(bf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [len(bf)], "dl_sum": [int(bf[dl_col].sum())]})

    doc_lens = doc_lens.select_columns([id_col, dl_col]).materialize()
    parts = doc_lens.map_batches(dstats, batch_format="pandas").to_pandas()
    n = int(parts["n"].sum())
    empty = pd.DataFrame(
        {id_col: pd.Series([], dtype="int64"), "score": pd.Series([], dtype=float)}
    )
    if n == 0:
        return empty
    avgdl = float(parts["dl_sum"].sum()) / n

    qschema = pa.schema(
        [("term", pa.string()), (id_col, pa.int64()), ("tf", pa.int64()),
         ("df", pa.int64())]
    )

    def filt(bt: pa.Table) -> pa.Table:
        mask = pc.is_in(bt["term"], value_set=pa.array(tset, pa.string()))
        return bt.filter(mask).select(["term", id_col, "tf", "df"]).cast(qschema)

    # materialize: the filtered postings feed BOTH the df aggregate and
    # the scoring exchange (single-execution inputs rule)
    qpost = postings.map_batches(filt, batch_format="pyarrow").materialize()

    def dpart(bf: pd.DataFrame) -> pd.DataFrame:
        return bf.groupby("term", sort=False)["df"].max().reset_index()

    dff = qpost.map_batches(dpart, batch_format="pandas").to_pandas()
    dfs = {} if dff.empty else dff.groupby("term")["df"].max().to_dict()
    idf = {
        t: float(np.log((n - dfs.get(t, 0) + 0.5) / (dfs.get(t, 0) + 0.5) + 1.0))
        for t in tset
    }

    uschema = pa.schema(
        [(id_col, pa.int64()), ("tf", pa.float64()), ("idfv", pa.float64()),
         ("dl", pa.float64()), ("__bm_bkt", pa.int64())]
    )

    def _bkt(ids: np.ndarray) -> np.ndarray:
        return (
            pd.util.hash_pandas_object(pd.Series(ids), index=False).to_numpy()
            % np.uint64(num_buckets)
        ).astype(np.int64)

    def tag_post(bf: pd.DataFrame) -> pa.Table:
        ids = bf[id_col].to_numpy(dtype=np.int64)
        return pa.Table.from_pandas(
            pd.DataFrame(
                {
                    id_col: ids,
                    "tf": bf["tf"].to_numpy(dtype=np.float64),
                    "idfv": bf["term"].map(idf).to_numpy(dtype=np.float64),
                    "dl": np.full(len(bf), -1.0),
                    "__bm_bkt": _bkt(ids),
                }
            ),
            schema=uschema,
            preserve_index=False,
        )

    def tag_len(bf: pd.DataFrame) -> pa.Table:
        ids = bf[id_col].to_numpy(dtype=np.int64)
        return pa.Table.from_pandas(
            pd.DataFrame(
                {
                    id_col: ids,
                    "tf": np.zeros(len(bf)),
                    "idfv": np.zeros(len(bf)),
                    "dl": bf[dl_col].to_numpy(dtype=np.float64),
                    "__bm_bkt": _bkt(ids),
                }
            ),
            schema=uschema,
            preserve_index=False,
        )

    both = qpost.map_batches(tag_post, batch_format="pandas").union(
        doc_lens.map_batches(tag_len, batch_format="pandas")
    )

    def score_bucket(g: pd.DataFrame) -> pa.Table:
        posts = g[g["dl"] < 0]
        lens = g[g["dl"] >= 0].set_index(id_col)["dl"]
        m_dl = posts[id_col].map(lens).to_numpy(dtype=np.float64)
        norm = k1 * (1.0 - b + b * m_dl / avgdl)
        tf = posts["tf"].to_numpy(dtype=np.float64)
        contrib = posts["idfv"].to_numpy() * tf * (k1 + 1.0) / (tf + norm)
        s = (
            pd.DataFrame({id_col: posts[id_col].to_numpy(), "c": contrib})
            .groupby(id_col, sort=False)["c"]
            .sum()
        )
        out = pd.DataFrame({id_col: s.index.to_numpy(), "score": _round_ha(s.to_numpy(), round_dp)})
        out = out[out["score"] > 0].sort_values(
            ["score", id_col], ascending=[False, True]
        ).head(k)
        return pa.table(
            {
                id_col: pa.array(out[id_col].to_numpy(dtype=np.int64), pa.int64()),
                "score": pa.array(out["score"].to_numpy(dtype=np.float64), pa.float64()),
            }
        )

    top = both.groupby("__bm_bkt").map_groups(score_bucket, batch_format="pandas").to_pandas()
    if top.empty:
        return empty
    return (
        top.sort_values(["score", id_col], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def term_tf_topk(
    docs: rd.Dataset,
    terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Per-term term-frequency top-k ranking — the trivial deterministic
    ranker used as the system-under-test for :func:`ranking_metrics`:
    rank = tf DESC, doc_id ASC, docs with tf 0 excluded.  One
    vectorized token-equality pass per term (flattened Arrow tokens +
    cumsum segment sums — the textstats _member_counts shape), then
    :func:`~..stages.relational.grouped_topk`.  Returns a pandas frame
    ``(term, doc_id, tf, rank)`` — driver-bounded by terms x k."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .relational import grouped_topk
    from .textstats import _ws_tokens

    def score(b: pd.DataFrame) -> pa.Table:
        toks, _ = _ws_tokens(b[text_col])
        flat = toks.flatten()
        off = toks.offsets.to_numpy()
        ids_np = b[id_col].to_numpy()
        parts = []
        for t in terms:
            hit = pc.equal(flat, t).to_numpy(zero_copy_only=False)
            c = np.r_[0, np.cumsum(hit.astype(np.int64))]
            tf = c[off[1:]] - c[off[:-1]]
            nz = tf > 0
            parts.append(
                pa.table(
                    {
                        "term": pa.array(
                            np.full(int(nz.sum()), t, object), pa.string()
                        ),
                        id_col: pa.array(ids_np[nz], pa.int64()),
                        "tf": pa.array(tf[nz], pa.int64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    top = grouped_topk(
        docs.map_batches(score, batch_format="pandas"),
        ["term"], "tf", k, descending=True, tiebreak=id_col,
    ).to_pandas()
    top = top.sort_values(
        ["term", "tf", id_col], ascending=[True, False, True]
    ).reset_index(drop=True)
    top["rank"] = top.groupby("term").cumcount() + 1
    return top


def ranking_metrics(
    rel: rd.Dataset,
    ranked: pd.DataFrame,
    query_col: str = "term",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
    round_dp: int = 6,
) -> pd.DataFrame:
    """Retrieval quality metrics — NDCG@k / MRR / recall@k per query,
    binary relevance.

    ``rel`` is the (possibly corpus-sized) Dataset of RELEVANT
    ``(query, doc)`` pairs; ``ranked`` is the system-under-test's
    result list (driver-bounded by queries x k).  ONE streaming pass
    over ``rel`` — no exchange: each batch emits per-query partial
    relevant counts plus the (query, doc) pairs that appear in the
    broadcast ranked set; both are bounded (queries x batches and
    queries x k rows).  The metric arithmetic runs on the driver over
    queries x k rows.

    NDCG uses binary gains: DCG = Σ 1/log2(rank+1) over relevant ranked
    docs, IDCG = Σ_{i=1..min(n_rel,k)} 1/log2(i+1).  Queries with no
    relevant docs get NULL metrics.  Floats rounded half-away at
    ``round_dp`` (oracle convention)."""
    import pyarrow as pa

    import ray

    from ..state.worker_state import get_worker_state, ref_key

    ranked = ranked[ranked[rank_col] <= k]
    rref = ray.put(
        np.asarray(
            [f"{a}|{b}" for a, b in zip(ranked[query_col], ranked[id_col])],
            dtype=object,
        )
    )

    def scan(b: pd.DataFrame) -> pa.Table:
        rs = get_worker_state(("rankm", ref_key(rref)), lambda: ray.get(rref))
        q = b[query_col].to_numpy(dtype=object)
        d = b[id_col].to_numpy()
        cnt = pd.Series(q).value_counts()
        combined = pd.Series(q).str.cat(pd.Series(d).astype(str), sep="|")
        hit = combined.isin(rs).to_numpy()
        return pa.table(
            {
                query_col: pa.array(
                    np.concatenate([cnt.index.to_numpy(dtype=object), q[hit]]),
                    pa.string(),
                ),
                id_col: pa.array(
                    np.concatenate(
                        [np.full(len(cnt), -1, np.int64),
                         d[hit].astype(np.int64)]
                    ),
                    pa.int64(),
                ),
                "n": pa.array(
                    np.concatenate(
                        [cnt.to_numpy(dtype=np.int64),
                         np.zeros(int(hit.sum()), np.int64)]
                    ),
                    pa.int64(),
                ),
            }
        )

    parts = rel.map_batches(scan, batch_format="pandas").to_pandas()
    n_rel = (
        parts[parts[id_col] == -1].groupby(query_col)["n"].sum().astype("int64")
    )
    rel_pairs = set(
        zip(parts.loc[parts[id_col] >= 0, query_col],
            parts.loc[parts[id_col] >= 0, id_col])
    )

    def _r(v: float) -> float:
        f = 10.0**round_dp
        return float(np.sign(v) * np.floor(abs(v) * f + 0.5) / f)

    rows = []
    for q in sorted(set(ranked[query_col])):
        nr = int(n_rel.get(q, 0))
        sub = ranked[ranked[query_col] == q].sort_values(rank_col)
        hits = [
            int(r) for r, d in zip(sub[rank_col], sub[id_col])
            if (q, d) in rel_pairs
        ]
        if nr == 0:
            rows.append((q, 0, None, None, None))
            continue
        dcg = sum(1.0 / np.log2(r + 1) for r in hits)
        idcg = sum(1.0 / np.log2(i + 1) for i in range(1, min(nr, k) + 1))
        mrr = 1.0 / hits[0] if hits else 0.0
        rows.append(
            (q, nr, _r(dcg / idcg), _r(mrr), _r(len(hits) / nr))
        )
    return pd.DataFrame(
        rows, columns=[query_col, "n_rel", "ndcg", "mrr", "recall"]
    )


def _doc_grams(b: pd.DataFrame, id_col: str, text_col: str, n: int) -> pd.DataFrame:
    """Distinct (doc, token-n-gram) rows for a batch — vectorized Arrow
    tokenize + take/join, shared by rare_term_pairs (blocking) and
    containment_pairs (verification) so both use ONE gram definition."""
    import pyarrow.compute as pc

    from .textstats import _ws_tokens

    toks, nt = _ws_tokens(b[text_col], lower=True)
    flat = (
        toks.combine_chunks().flatten()
        if isinstance(toks, pa.ChunkedArray)
        else toks.flatten()
    )
    off = (
        toks.combine_chunks().offsets.to_numpy()
        if isinstance(toks, pa.ChunkedArray)
        else toks.offsets.to_numpy()
    )
    g_per_doc = np.maximum(nt - n + 1, 0)
    total = int(g_per_doc.sum())
    if total == 0:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "gram": pd.Series([], dtype="object")})
    doc_idx = np.repeat(np.arange(len(b)), g_per_doc)
    first = np.r_[0, np.cumsum(g_per_doc)][:-1]
    pos = np.arange(total, dtype=np.int64) - np.repeat(first, g_per_doc)
    starts = off[:-1][doc_idx] + pos
    if n == 1:
        grams = flat.take(pa.array(starts))
    else:
        parts = [flat.take(pa.array(starts + k)) for k in range(n)]
        grams = pc.binary_join_element_wise(*parts, " ")
    return pd.DataFrame(
        {
            id_col: b[id_col].to_numpy(dtype=np.int64)[doc_idx],
            "gram": grams.to_numpy(zero_copy_only=False),
        }
    ).drop_duplicates()


def rare_term_pairs(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 1,
    max_df: int = 20,
    min_shared: int = 2,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Candidate document pairs sharing ≥ ``min_shared`` RARE terms
    (document frequency ≤ ``max_df``) — the classic blocking /
    candidate-generation step for near-dup and plagiarism checks:
    rare-term co-occurrence is a far stronger signal than common-term
    overlap, and capping df bounds the pair explosion at Σ_rare df²
    (stopword-grade terms never generate pairs, by construction, not
    by stopword list).  ``ngram`` generalizes the unit to token
    n-grams — small closed vocabularies (where every unigram is
    common) still block well on 3-4-grams.

    Shapes: vectorized gram explode distinct per (doc, gram) map-side
    (a doc never splits across batches, so batch-distinct is globally
    distinct) → ONE hash(gram) co-location where df filtering AND the
    a<b pair explosion happen per gram (all of a gram's docs are in
    one bucket) with local pre-count → pair-count sum through
    grouped_reduce → ``n_shared ≥ min_shared`` filter.  Emits
    ``(doc_a, doc_b, n_shared)``, exact integers; empty result keeps
    its schema (explicitly typed Arrow columns)."""
    import pyarrow.compute as pc

    from ..stages.agg import grouped_reduce
    from .textstats import _ws_tokens

    if ngram < 1:
        raise ValueError("ngram must be >= 1")
    nb = np.uint64(num_buckets)
    n = ngram

    def explode(b: pd.DataFrame) -> pa.Table:
        out = _doc_grams(b, id_col, text_col, n)
        bkt = (
            pd.util.hash_pandas_object(out["gram"], index=False).to_numpy()
            % nb
        ).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(out[id_col].to_numpy(), pa.int64()),
                "gram": pa.array(out["gram"].to_numpy(), pa.string()),
                "__rt_bkt": pa.array(bkt, pa.int64()),
            }
        )

    def pairs(g: pd.DataFrame) -> pa.Table:
        df_ok = g.groupby("gram", sort=False)[id_col].transform("size") <= max_df
        g = g[df_ok][["gram", id_col]]
        m = g.merge(g, on="gram", suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        c = (
            m.groupby([f"{id_col}_a", f"{id_col}_b"], sort=False)
            .size()
            .reset_index(name="c")
        )
        return pa.table(
            {
                "doc_a": pa.array(c[f"{id_col}_a"].to_numpy(dtype=np.int64), pa.int64()),
                "doc_b": pa.array(c[f"{id_col}_b"].to_numpy(dtype=np.int64), pa.int64()),
                "c": pa.array(c["c"].to_numpy(dtype=np.int64), pa.int64()),
            }
        )

    counts = grouped_reduce(
        docs.map_batches(explode, batch_format="pandas")
        .groupby("__rt_bkt")
        .map_groups(pairs, batch_format="pandas"),
        ["doc_a", "doc_b"],
        {"n_shared": ("c", "sum")},
        num_buckets=num_buckets,
    )
    return counts.map_batches(
        lambda t, _k=min_shared: t.filter(
            pc.greater_equal(t["n_shared"], _k)
        ),
        batch_format="pyarrow",
    )


def fuse_rankings(
    rankings: "list[rd.Dataset]",
    id_col: str,
    rank_col: str,
    method: str = "borda",
    rrf_k: int = 60,
) -> rd.Dataset:
    """Rank fusion across retrieval systems (BM25 ⊕ dense ⊕ ...).

    * ``borda`` (default): fused score = Σ over lists of the item's
      rank, items MISSING from a list charged that list's
      ``len + 1`` — pure integer arithmetic, so the fused order is
      SQL hash-exact (lower = better).  Emits
      ``(id, fused_rank_sum, n_lists)``.
    * ``rrf``: reciprocal-rank fusion Σ 1/(k + rank) (higher = better),
      the TREC standard — emits ``fused_score`` rounded half-away at
      6 dp (float; pairs with the borda column set for oracle use).

    Each input list is materialized once for its length (single-
    execution rule), then all lists union into ONE grouped_reduce over
    the id — no pairwise joins, #lists-independent exchange count.
    """
    import pyarrow.compute as pc  # noqa: F401

    from ..stages.agg import grouped_reduce

    if method not in ("borda", "rrf"):
        raise ValueError(f"unknown fusion method {method!r}")
    mats = [r.materialize() for r in rankings]
    lens = [m.count() for m in mats]
    penalty_total = sum(n + 1 for n in lens)

    tagged = None
    for m, n in zip(mats, lens):
        def prep(t: pa.Table, _n=n) -> pa.Table:
            rank = t[rank_col].to_numpy().astype(np.int64)
            cols = {
                "id": pa.array(t[id_col].to_numpy().astype(np.int64), pa.int64()),
                # rank minus this list's penalty; the constant total of
                # penalties is added back in the finalize
                "adj": pa.array(rank - (_n + 1), pa.int64()),
                "rr": pa.array(1.0 / (rrf_k + rank), pa.float64()),
                "one": pa.array(np.ones(len(t), np.int64), pa.int64()),
            }
            return pa.table(cols)

        piece = m.map_batches(prep, batch_format="pyarrow")
        tagged = piece if tagged is None else tagged.union(piece)

    fused = grouped_reduce(
        tagged,
        ["id"],
        {"adj": ("adj", "sum"), "rr_sum": ("rr", "sum"), "n_lists": ("one", "sum")},
    )

    def finalize(t: pa.Table, _p=penalty_total, _m=method) -> pa.Table:
        out = {
            id_col: t["id"].combine_chunks(),
            "n_lists": t["n_lists"].combine_chunks(),
        }
        adj = t["adj"].to_numpy().astype(np.int64)
        out["fused_rank_sum"] = pa.array(adj + _p, pa.int64())
        if _m == "rrf":
            s = t["rr_sum"].to_numpy(zero_copy_only=False)
            out["fused_score"] = pa.array(
                np.sign(s) * np.floor(np.abs(s) * 1e6 + 0.5) / 1e6, pa.float64()
            )
        return pa.table(out)

    return fused.map_batches(finalize, batch_format="pyarrow")


def containment_pairs(
    docs: rd.Dataset,
    candidates: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 4,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Exact set-similarity for CANDIDATE document pairs: over each
    pair's distinct token-``ngram`` sets, the shared-gram count plus
    both directed containments (``|A∩B|/|A|``, the quote/subset-dup
    signal Jaccard misses) and Jaccard itself.

    Shape: the candidate pair list (typically the output of
    :func:`rare_term_pairs` — bounded by the blocking contract) is
    collected once and broadcast; one hash(gram) co-location emits a
    count per (pair, shared gram) via a per-gram partner lookup against
    the broadcast adjacency; one grouped_reduce sums to ``|A∩B|``;
    per-doc distinct-gram sizes ride a second skinny exchange and two
    size-gated joins.  All ratios are single double divisions of exact
    ints — SQL bit-identical.  Output ``(doc_a, doc_b, n_shared,
    size_a, size_b, containment_a, containment_b, jaccard)``.
    """
    import ray

    from ..stages.agg import grouped_reduce
    from ..stages.relational import equi_join

    cand = candidates.to_pandas()
    adj: dict = {}
    for a, b in zip(cand["doc_a"].astype(int), cand["doc_b"].astype(int)):
        adj.setdefault(a, set()).add(b)
    aref = ray.put(adj)
    nb = np.uint64(num_buckets)

    def explode(b: pd.DataFrame) -> pa.Table:
        out = _doc_grams(b, id_col, text_col, ngram)
        bkt = (
            pd.util.hash_pandas_object(out["gram"], index=False).to_numpy() % nb
        ).astype(np.int64)
        return pa.table(
            {
                "doc": pa.array(out[id_col].to_numpy(), pa.int64()),
                "gram": pa.array(out["gram"].to_numpy(), pa.string()),
                "__ct_bkt": pa.array(bkt, pa.int64()),
            }
        )

    exploded = docs.map_batches(
        explode, batch_format="pandas", batch_size=65536
    ).materialize()

    def shared(g: pd.DataFrame) -> pa.Table:
        from ..state.worker_state import get_worker_state, ref_key

        am = get_worker_state(("ctadj", ref_key(aref)), lambda: ray.get(aref))
        out_a, out_b = [], []
        for _, sub in g.groupby("gram", sort=False):
            ds_ = np.unique(sub["doc"].to_numpy(dtype=np.int64))
            present = set(int(x) for x in ds_)
            for a in ds_:
                ps = am.get(int(a))
                if not ps:
                    continue
                for b in ps:
                    if b in present:
                        out_a.append(int(a))
                        out_b.append(b)
        return pa.table(
            {
                "doc_a": pa.array(np.asarray(out_a, np.int64), pa.int64()),
                "doc_b": pa.array(np.asarray(out_b, np.int64), pa.int64()),
            }
        )

    inter = grouped_reduce(
        exploded.groupby("__ct_bkt").map_groups(shared, batch_format="pandas"),
        ["doc_a", "doc_b"],
        {"n_shared": (None, "count")},
        num_buckets=num_buckets,
    )

    sizes = grouped_reduce(
        exploded.select_columns(["doc"]),
        ["doc"],
        {"sz": (None, "count")},
        num_buckets=num_buckets,
    )

    def as_a(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_a": b["doc"], "size_a": b["sz"].astype("int64")})

    def as_b(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_b": b["doc"], "size_b": b["sz"].astype("int64")})

    joined = equi_join(
        equi_join(inter, sizes.map_batches(as_a, batch_format="pandas"),
                  "doc_a"),
        sizes.map_batches(as_b, batch_format="pandas"), "doc_b",
    )

    def score(t: pa.Table) -> pa.Table:
        ns = t["n_shared"].to_numpy().astype(np.int64)
        sa = t["size_a"].to_numpy().astype(np.int64)
        sb = t["size_b"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "doc_a": pa.array(t["doc_a"].to_numpy().astype(np.int64),
                                  pa.int64()),
                "doc_b": pa.array(t["doc_b"].to_numpy().astype(np.int64),
                                  pa.int64()),
                "n_shared": pa.array(ns, pa.int64()),
                "size_a": pa.array(sa, pa.int64()),
                "size_b": pa.array(sb, pa.int64()),
                "containment_a": pa.array(
                    ns / sa.astype(np.float64), pa.float64()),
                "containment_b": pa.array(
                    ns / sb.astype(np.float64), pa.float64()),
                "jaccard": pa.array(
                    ns / (sa + sb - ns).astype(np.float64), pa.float64()),
            }
        )

    return joined.map_batches(score, batch_format="pyarrow")


def cosine_pairs_tf(
    docs: rd.Dataset,
    candidates: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Exact term-frequency cosine for CANDIDATE document pairs: the
    bag-of-words similarity ``dot(tf_a, tf_b) / (||tf_a|| * ||tf_b||)``
    computed embedding-free — the verification stage after a blocking
    pass (:func:`rare_term_pairs`), completing the block-then-verify
    text-similarity family (containment/Jaccard are set-based; this is
    the weighted counterpart).

    Exactness: tf vectors are integer counts, so the dot product and
    both squared norms are exact int64 sums; the cosine is
    ``dot / (sqrt(na2) * sqrt(nb2))`` — two IEEE sqrts and one
    multiply/divide in the same order as the SQL mirror.  Shape: doc
    norms fall out map-side (a doc never splits across batches); ONE
    hash(token) co-location emits per-token tf products for the
    broadcast candidate adjacency; one grouped_reduce sums the dot;
    two size-gated joins attach norms.  Output ``(doc_a, doc_b, dot,
    norm2_a, norm2_b, cosine)``.
    """
    import ray

    from ..stages.agg import grouped_reduce
    from ..stages.relational import equi_join
    from .textstats import _ws_tokens

    cand = candidates.to_pandas()
    adj: dict = {}
    for a, b in zip(cand["doc_a"].astype(int), cand["doc_b"].astype(int)):
        adj.setdefault(a, set()).add(b)
    aref = ray.put(adj)
    nb = np.uint64(num_buckets)

    def explode(b: pd.DataFrame) -> pa.Table:
        toks, _ = _ws_tokens(b[text_col], lower=True)
        flat = (
            toks.combine_chunks().flatten()
            if isinstance(toks, pa.ChunkedArray)
            else toks.flatten()
        )
        import pyarrow.compute as pc

        nt = pc.list_value_length(
            toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        ).to_numpy(zero_copy_only=False)
        ids = np.repeat(b[id_col].to_numpy(dtype=np.int64), nt)
        df = pd.DataFrame(
            {"doc": ids, "token": flat.to_numpy(zero_copy_only=False)}
        )
        tf = df.groupby(["doc", "token"], sort=False).size().rename(
            "tf").reset_index()
        bkt = (
            pd.util.hash_pandas_object(tf["token"], index=False).to_numpy()
            % nb
        ).astype(np.int64)
        return pa.table(
            {
                "doc": pa.array(tf["doc"].to_numpy(dtype=np.int64),
                                pa.int64()),
                "token": pa.array(tf["token"].tolist(), pa.string()),
                "tf": pa.array(tf["tf"].to_numpy(dtype=np.int64), pa.int64()),
                "__cp_bkt": pa.array(bkt, pa.int64()),
            }
        )

    exploded = docs.map_batches(
        explode, batch_format="pandas", batch_size=65536
    ).materialize()

    def products(g: pd.DataFrame) -> pa.Table:
        from ..state.worker_state import get_worker_state, ref_key

        am = get_worker_state(("cpadj", ref_key(aref)), lambda: ray.get(aref))
        out_a, out_b, out_p = [], [], []
        for _, sub in g.groupby("token", sort=False):
            dd = dict(zip(sub["doc"].to_numpy(dtype=np.int64),
                          sub["tf"].to_numpy(dtype=np.int64)))
            for a, ta in dd.items():
                ps = am.get(int(a))
                if not ps:
                    continue
                for b in ps:
                    tb = dd.get(b)
                    if tb is not None:
                        out_a.append(int(a))
                        out_b.append(int(b))
                        out_p.append(int(ta) * int(tb))
        return pa.table(
            {
                "doc_a": pa.array(np.asarray(out_a, np.int64), pa.int64()),
                "doc_b": pa.array(np.asarray(out_b, np.int64), pa.int64()),
                "p": pa.array(np.asarray(out_p, np.int64), pa.int64()),
            }
        )

    dots = grouped_reduce(
        exploded.groupby("__cp_bkt").map_groups(products,
                                                batch_format="pandas"),
        ["doc_a", "doc_b"],
        {"dot": ("p", "sum")},
        num_buckets=num_buckets,
    )

    def norm_rows(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"doc": t["doc"].to_numpy(),
             "sq": t["tf"].to_numpy().astype(np.int64) ** 2}
        )
        s = df.groupby("doc", sort=False)["sq"].sum().reset_index()
        return pa.table(
            {
                "doc": pa.array(s["doc"].to_numpy(dtype=np.int64),
                                pa.int64()),
                "n2": pa.array(s["sq"].to_numpy(dtype=np.int64), pa.int64()),
            }
        )

    norms = grouped_reduce(
        exploded.map_batches(norm_rows, batch_format="pyarrow"),
        ["doc"],
        {"n2": ("n2", "sum")},
        num_buckets=num_buckets,
    )

    def as_a(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_a": b["doc"],
                             "norm2_a": b["n2"].astype("int64")})

    def as_b(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_b": b["doc"],
                             "norm2_b": b["n2"].astype("int64")})

    joined = equi_join(
        equi_join(dots, norms.map_batches(as_a, batch_format="pandas"),
                  "doc_a"),
        norms.map_batches(as_b, batch_format="pandas"), "doc_b",
    )

    def score(t: pa.Table) -> pa.Table:
        d = t["dot"].to_numpy().astype(np.int64)
        na = t["norm2_a"].to_numpy().astype(np.int64)
        nbv = t["norm2_b"].to_numpy().astype(np.int64)
        cos = d / (np.sqrt(na.astype(np.float64))
                   * np.sqrt(nbv.astype(np.float64)))
        return pa.table(
            {
                "doc_a": pa.array(t["doc_a"].to_numpy().astype(np.int64),
                                  pa.int64()),
                "doc_b": pa.array(t["doc_b"].to_numpy().astype(np.int64),
                                  pa.int64()),
                "dot": pa.array(d, pa.int64()),
                "norm2_a": pa.array(na, pa.int64()),
                "norm2_b": pa.array(nbv, pa.int64()),
                "cosine": pa.array(cos, pa.float64()),
            }
        )

    return joined.map_batches(score, batch_format="pyarrow")
