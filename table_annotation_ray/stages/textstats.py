"""Text-analysis operators over a documents table — token counting,
quality scoring, language ID, document fingerprinting.

These are the training-data-pipeline operators the reference lacks
(round brief): all are single-pass ``map_batches`` transforms, pandas
string kernels (vectorized), no shuffle.  Semantics are chosen to be
exactly reproducible in ANSI SQL (DuckDB) so the driver's oracle can
value-hash them — see __ray_entry__.oracle_sql.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_WS = re.compile(r"\s+")
_PUNCT = re.compile(r"[^\w\s]")
_DIGIT = re.compile(r"\d")

# GPT-2-style pre-tokenizer classes (letters / digits / other runs, each
# with optional leading space) — the "BPE-ish regex" token count; the
# `regex` module supports \p{L}/\p{N} like RE2 does, so the SQL oracle
# can run the identical pattern
try:
    import regex as _regex

    _BPE = _regex.compile(r" ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+")
except ImportError:  # pragma: no cover
    _BPE = re.compile(r" ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+")

BPE_PATTERN_SQL = r" ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
# the same alternation MINUS the whitespace-run branch: scanning with it
# yields exactly the full pattern's non-whitespace tokens (between two
# tokens the whitespace run is either consumed by \s+ [full] or skipped
# by the scanner with at most one space absorbed into the next token's
# optional leading space [reduced] — either way one match per token), so
# pc.count_substring_regex over it equals findall+filter, with no
# per-row Python (VERDICT r4 #9)
_BPE_NONSPACE_RE2 = r" ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def _ws_tokens(text: pd.Series, lower: bool = False):
    """Arrow-side whitespace tokenization of trimmed text: returns
    (list_array, n_tokens int64 ndarray) with n_tokens = 0 for
    empty/whitespace-only rows — the vectorized replacement for
    ``str.split(_WS).map(len)``."""
    arr = pc.utf8_trim_whitespace(pa.Array.from_pandas(text.fillna("")))
    if lower:
        arr = pc.utf8_lower(arr)
    toks = pc.split_pattern_regex(arr, pattern=r"\s+")
    n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    # "" splits to [""] — mask empties to 0 like the pandas .where did
    n[pc.equal(pc.utf8_length(arr), 0).to_numpy(zero_copy_only=False)] = 0
    return toks, n


def _member_counts(toks, value_set) -> np.ndarray:
    """Per-row count of list elements that belong to ``value_set`` —
    flatten + pc.is_in + prefix-sum differences; no per-row Python.
    (np.add.reduceat mishandles empty lists, hence the cumsum form.)"""
    hit = pc.is_in(
        toks.flatten(), value_set=pa.array(sorted(value_set), pa.string())
    ).to_numpy(zero_copy_only=False)
    off = toks.offsets.to_numpy()
    c = np.r_[0, np.cumsum(hit.astype(np.int64))]
    return c[off[1:]] - c[off[:-1]]

# small multilingual stopword sets for the n-gram/stopword language heuristic
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "you", "that", "was", "for"},
    "fr": {"le", "la", "les", "de", "des", "et", "un", "une", "est", "que", "pour", "dans"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von", "mit", "für"},
    "es": {"el", "la", "los", "las", "de", "y", "un", "una", "es", "que", "por", "para"},
}


def token_stats(batch: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, text) → n_tokens (whitespace), n_chars, n_tokens_bpe
    (GPT-2-style pre-tokenizer segments, whitespace runs excluded).

    SQL-equivalents: ``array_length(regexp_split_to_array(trim(text),
    '\\s+'))`` and ``len(list_filter(regexp_extract_all(text, BPE), ...))``.
    """
    text = batch["text"].fillna("")
    arr = pa.Array.from_pandas(text)
    _, n_tokens = _ws_tokens(text)
    n_bpe = pc.count_substring_regex(
        arr, pattern=_BPE_NONSPACE_RE2
    ).to_numpy(zero_copy_only=False)
    out = pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": n_tokens,
            "n_chars": pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype("int64"),
            "n_tokens_bpe": n_bpe.astype("int64"),
        }
    )
    return out


def quality_scores(batch: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, text) → punct_ratio, digit_ratio, stopword_ratio,
    mean_token_len — the reference-free quality heuristics.  All ratios
    are #matching chars (or tokens) / total, reproducible via
    regexp_replace length arithmetic in SQL."""
    text = batch["text"].fillna("")
    n_chars = text.str.len().astype("float64")
    denom = n_chars.replace(0.0, 1.0)
    punct = (n_chars - text.str.replace(_PUNCT, "", regex=True).str.len()) / denom
    digit = (n_chars - text.str.replace(_DIGIT, "", regex=True).str.len()) / denom
    toks, n_tokens = _ws_tokens(text, lower=True)
    denom_tok = np.maximum(n_tokens, 1).astype("float64")
    stop_ratio = pd.Series(
        np.where(
            n_tokens > 0,
            _member_counts(toks, _LANG_STOPWORDS["en"]) / denom_tok,
            0.0,
        ),
        index=batch.index,
    )
    stripped_arr = pc.utf8_trim_whitespace(pa.Array.from_pandas(text))
    nonws_chars = pc.utf8_length(
        pc.replace_substring_regex(stripped_arr, pattern=r"\s+", replacement="")
    ).to_numpy(zero_copy_only=False)
    mean_tok = pd.Series(
        np.where(n_tokens > 0, nonws_chars / denom_tok, 0.0), index=batch.index
    )
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "punct_ratio": punct.round(6),
            "digit_ratio": digit.round(6),
            "stopword_ratio": stop_ratio.round(6),
            "mean_token_len": mean_tok.round(6),
        }
    )


def lang_id(batch: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, text) → predicted language by stopword-hit voting (the
    classic n-gram-lite heuristic); 'und' when nothing matches.

    Vectorized vote: one is_in membership pass per language over the
    flattened token array, then a columnar argmax — first language in
    declaration order wins ties (identical to the old strictly-greater
    per-row loop, since np.argmax returns the first maximum)."""
    toks, _ = _ws_tokens(batch["text"], lower=True)
    hits = np.stack(
        [_member_counts(toks, stops) for stops in _LANG_STOPWORDS.values()]
    )
    langs = np.array(list(_LANG_STOPWORDS), dtype=object)
    pred = np.where(hits.max(axis=0) > 0, langs[hits.argmax(axis=0)], "und")
    return pd.DataFrame(
        {"doc_id": batch["doc_id"],
         "pred_lang": pd.Series(pred, index=batch.index, dtype="object")}
    )


def fingerprint(batch: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, text) → md5 of the whitespace-normalized lowercased text.
    SQL-equivalent: ``md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))``.
    Normalization runs in Arrow re2 kernels (the md5 itself has no
    vectorized kernel and stays a per-row hashlib call)."""
    col = pa.Array.from_pandas(batch["text"].fillna(""))
    norm = pc.replace_substring_regex(
        pc.utf8_lower(pc.utf8_trim_whitespace(col)), pattern=r"\s+", replacement=" "
    )
    fp = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in norm.to_pylist()]
    return pd.DataFrame({"doc_id": batch["doc_id"], "fp": fp})


URL_PATTERN = r"https?://[^\s]+"
DOMAIN_PATTERN = r"https?://([^/\s]+)"
_URL_RE = re.compile(URL_PATTERN)
_DOMAIN_RE = re.compile(DOMAIN_PATTERN)


def domain_stats(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Per-domain URL statistics over a documents table — the
    source-filtering primitive of web-corpus curation (count URL
    occurrences and reached documents per domain, then block/downsample
    domains upstream).  Output: (domain, n_urls, n_docs).

    ONE bucket exchange: the map side extracts every URL, lowercases
    its host, and pre-aggregates per (domain, doc) within the batch
    (≤ distinct pairs per batch cross the wire, Arrow blocks); the
    exchange groups on ``hash(domain) % 64`` — never a Ray group per
    domain (web corpora have 10^7+ domains, the CLAUDE.md r3 per-key
    pathology) — and each bucket reduces with one vectorized pandas
    groupby (n_urls = Σ counts, n_docs = nunique, exact because every
    copy of a domain's pairs co-locates).

    SQL mirror: unnest(regexp_extract_all(text, URL)) → regexp_extract
    host → GROUP BY with count(*) / count(DISTINCT doc_id).  Both
    regexes are RE2-safe and shared verbatim with the oracle."""
    from .agg import grouped_reduce  # noqa: F401  (shape reference)

    NB = np.uint64(64)

    def partial(b: pd.DataFrame) -> pa.Table:
        urls = b.set_index(b[id_col])[text_col].fillna("").str.findall(_URL_RE)
        exploded = urls.explode().dropna()
        if len(exploded) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "domain": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        dom = exploded.str.extract(_DOMAIN_RE, expand=False).str.lower()
        out = (
            pd.DataFrame({id_col: dom.index.to_numpy(), "domain": dom.to_numpy()})
            .groupby([id_col, "domain"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        out["_db"] = (
            pd.util.hash_pandas_object(out["domain"], index=False).to_numpy() % NB
        ).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("domain", as_index=False).agg(
            n_urls=("n", "sum"), n_docs=(id_col, "nunique")
        )
        out["n_urls"] = out["n_urls"].astype("int64")
        out["n_docs"] = out["n_docs"].astype("int64")
        return out

    return (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("_db")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


def vocab_topk(docs, k: int = 100, text_col: str = "text"):
    """Corpus-wide token frequency top-``k`` — the vocabulary-building /
    tokenizer-training primitive.  Tokens are lowercased
    whitespace-splits (empty strings dropped), ties broken by token text
    so the result is deterministic at any parallelism.

    Scale shape: per-batch ``value_counts`` combiner (one row per
    DISTINCT token per batch crosses the wire) → ``groupby(token)`` sum
    → sort + limit.  The sort runs over VOCABULARY cardinality — already
    aggregated, orders of magnitude below corpus cardinality (Heaps'
    law), so the final exchange is cheap even at 100 TB.

    SQL mirror: unnest(regexp_split_to_array(lower(text),'\\s+')) …
    GROUP BY / ORDER BY n DESC, token LIMIT k."""

    from .agg import grouped_reduce

    def partial(b: pd.DataFrame) -> pa.Table:
        toks = b[text_col].fillna("").str.lower().str.split(_WS).explode()
        toks = toks[(toks.notna()) & (toks.str.len() > 0)]
        vc = toks.value_counts(sort=False)
        return pa.table(
            {"token": vc.index.astype(str), "n": vc.to_numpy().astype("int64")}
        )

    # grouped_reduce, not groupby().aggregate(): the builtin is per-key
    # Python and vocabulary cardinality is the key count (CLAUDE.md r3)
    return (
        grouped_reduce(
            docs.map_batches(partial, batch_format="pandas"),
            ["token"], {"n": ("n", "sum")},
        )
        .sort(key=["n", "token"], descending=[True, False])
        .limit(k)
    )


def tfidf_topk(
    docs,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    num_buckets: int = 64,
):
    """Top-``k`` TF-IDF keywords per document — the corpus-level
    keyword-extraction primitive.  Tokens are ``[a-z]+`` runs of the
    lowercased text; score = tf × ln(N / df), rounded to 6 decimals
    BEFORE ranking so the ordering is engine-portable (np.log vs SQL
    ln can differ by one ulp); ties broken by term ascending —
    identical to the SQL window ``row_number() OVER (PARTITION BY doc
    ORDER BY score DESC, term)``.  Beyond-reference operator.

    Scale shape (a document is one row, so TF needs NO exchange):
      1. per-batch tokenize → (doc, term, tf) via one explode+groupby;
      2. DF via ``agg.grouped_reduce`` keyed on term (vocabulary
         cardinality rides the hash-bucket exchange, never per-key Ray
         groups);
      3. tf↔df co-location on hash(term) % num_buckets (terms are
         strings — the union+groupby idiom, not a driver-broadcast
         vocabulary, which at web scale would not fit);
      4. top-k per doc through ``relational.grouped_topk`` (map-side
         ≤k combiner, deterministic tiebreak).
    """
    import pyarrow as pa

    import ray.data as rd  # noqa: F401  (docs is a Dataset)

    from .agg import grouped_reduce
    from .relational import grouped_topk

    # one execution of the input: count + the term_freqs map would each
    # replay a derived upstream (the equi_join right-side rule); for a
    # plain parquet read both legs stay metadata/stream-cheap either way
    docs = docs.materialize()
    n_docs = docs.count()

    def term_freqs(b: pd.DataFrame) -> pa.Table:
        toks = b[text_col].fillna("").str.lower().str.findall(r"[a-z]+")
        long = pd.DataFrame(
            {id_col: b[id_col], "term": toks}
        ).explode("term").dropna(subset=["term"])
        tf = long.groupby([id_col, "term"], sort=False).size().reset_index(name="tf")
        return pa.table(
            {
                id_col: pa.array(tf[id_col].to_numpy(dtype=np.int64), pa.int64()),
                "term": pa.array(tf["term"].tolist(), pa.string()),
                "tf": pa.array(tf["tf"].to_numpy(dtype=np.int64), pa.int64()),
            }
        )

    tf_ds = docs.map_batches(term_freqs, batch_format="pandas").materialize()

    # DF: tf rows are already distinct per (doc, term), so counting per
    # term IS the document frequency — no extra distinct pass
    df_ds = grouped_reduce(
        tf_ds, ["term"], {"df": (None, "count")}, num_buckets=num_buckets
    )

    nb = np.uint64(num_buckets)

    def tag(side: int):
        def f(b: pd.DataFrame) -> pa.Table:
            b = b.copy()
            b["__tw_bkt"] = (
                pd.util.hash_pandas_object(b["term"], index=False).to_numpy() % nb
            ).astype(np.int64)
            b["__tw_side"] = np.int64(side)
            for c in (id_col, "tf", "df"):  # sentinel-fill the union schema
                if c not in b.columns:
                    b[c] = np.int64(-1)
            return pa.Table.from_pandas(
                b[[id_col, "term", "tf", "df", "__tw_bkt", "__tw_side"]],
                preserve_index=False,
            )
        return f

    both = tf_ds.map_batches(tag(0), batch_format="pandas").union(
        df_ds.map_batches(tag(1), batch_format="pandas")
    )

    n_f = float(n_docs)

    def score(g: pd.DataFrame) -> pa.Table:
        is_df = g["__tw_side"].to_numpy() == 1
        dfm = g[is_df][["term", "df"]]
        dfm = dfm[dfm["df"] >= min_df]
        tfm = g[~is_df][[id_col, "term", "tf"]]
        m = tfm.merge(dfm, on="term", how="inner")
        # ln(N/df), the exact SQL expression shape (ln N - ln df can
        # differ by an ulp and flip a rounded rank boundary)
        s = m["tf"].to_numpy(dtype=np.float64) * np.log(
            n_f / m["df"].to_numpy(dtype=np.float64)
        )
        # half-AWAY rounding (scores are >= 0): SQL round() is
        # half-away; np.round is half-even (CLAUDE.md oracle rule)
        s6 = np.floor(s * 1e6 + 0.5) / 1e6
        return pa.table(
            {
                id_col: pa.array(m[id_col].to_numpy(dtype=np.int64), pa.int64()),
                "term": pa.array(m["term"].tolist(), pa.string()),
                "tf": pa.array(m["tf"].to_numpy(dtype=np.int64), pa.int64()),
                "tfidf": pa.array(s6, pa.float64()),
            }
        )

    scored = both.groupby("__tw_bkt").map_groups(score, batch_format="pandas")
    return grouped_topk(scored, [id_col], "tfidf", k, descending=True,
                        tiebreak="term")


def pmi_pairs(
    docs,
    k: int = 20,
    min_pairs: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
):
    """Collocation mining: top-``k`` token pairs by pointwise mutual
    information, ``pmi = ln(N·c_ab / (df_a·df_b))`` over per-document
    DISTINCT tokens (``[a-z]+`` runs of the lowercased text), pairs
    counted once per doc and gated on ``c_ab ≥ min_pairs``.  Rounded
    half-away to 6 decimals BEFORE the (pmi desc, term_a, term_b)
    ranking so the top-k boundary is engine-portable.

    Shape: pair counts ride :func:`~.relational.cooccurrence_pairs`
    (doc-bucket co-locate + pair-keyed grouped_reduce); the two df
    attachments are string-keyed union+groupby co-locates on
    hash(term) — like :func:`tfidf_topk`, the vocabulary is never a
    driver broadcast.  Beyond-reference operator."""
    import pyarrow as pa

    from .agg import grouped_reduce
    from .relational import cooccurrence_pairs

    docs = docs.materialize()  # consumed by tokens AND the count
    n_docs = docs.count()

    def distinct_terms(b: pd.DataFrame) -> pa.Table:
        toks = b[text_col].fillna("").str.lower().str.findall(r"[a-z]+")
        long = pd.DataFrame(
            {id_col: b[id_col], "term": toks}
        ).explode("term").dropna(subset=["term"]).drop_duplicates()
        return pa.table(
            {
                id_col: pa.array(long[id_col].to_numpy(dtype=np.int64), pa.int64()),
                "term": pa.array(long["term"].tolist(), pa.string()),
            }
        )

    tok_ds = docs.map_batches(distinct_terms, batch_format="pandas").materialize()
    pairs = cooccurrence_pairs(
        tok_ds, id_col, "term", min_count=min_pairs, num_buckets=num_buckets
    )
    df_ds = grouped_reduce(
        tok_ds, ["term"], {"df": (None, "count")}, num_buckets=num_buckets
    ).materialize()  # both attachments consume it

    nb = np.uint64(num_buckets)

    def _attach(pair_ds, key: str, out: str):
        """Co-locate pair rows with df rows on hash(term) and merge —
        exact string-key join, no vocabulary broadcast.  Both union
        branches are sentinel-filled to ONE shared schema (the
        CLAUDE.md mixed-block/union rule)."""
        pair_cols = list(pair_ds.schema().names)
        all_cols = pair_cols + [out]
        str_cols = {"item_a", "item_b"}

        def _typed(o: pd.DataFrame, cols) -> pa.Table:
            # explicit types: an empty pandas object column would infer
            # Arrow NULL and break schema unification (CLAUDE.md rule)
            return pa.table(
                {c: pa.array(o[c].tolist(),
                             pa.string() if c in str_cols else pa.int64())
                 for c in cols}
            )

        def to_schema(o: pd.DataFrame, side: int) -> pa.Table:
            for c in all_cols:
                if c not in o.columns:
                    o[c] = "" if c in str_cols else np.int64(-1)
            o = o[all_cols].copy()
            o["__pm_bkt"] = (
                pd.util.hash_pandas_object(o[key], index=False).to_numpy() % nb
            ).astype(np.int64)
            o["__pm_side"] = np.int64(side)
            return _typed(o, all_cols + ["__pm_bkt", "__pm_side"])

        tagged_pairs = pair_ds.map_batches(
            lambda b: to_schema(b.copy(), 0), batch_format="pandas"
        )
        tagged_df = df_ds.map_batches(
            lambda b: to_schema(
                pd.DataFrame({key: b["term"], out: b["df"].astype("int64")}), 1
            ),
            batch_format="pandas",
        )

        def merge(g: pd.DataFrame) -> pa.Table:
            is_df = g["__pm_side"].to_numpy() == 1
            dfr = g[is_df][[key, out]]
            pr = g[~is_df].drop(columns=[out, "__pm_bkt", "__pm_side"])
            m = pr.merge(dfr, on=key, how="inner")
            return _typed(m, list(m.columns))

        return tagged_pairs.union(tagged_df).groupby("__pm_bkt").map_groups(
            merge, batch_format="pandas"
        )

    with_a = _attach(pairs, "item_a", "df_a")
    with_b = _attach(with_a, "item_b", "df_b")

    n_f = float(n_docs)

    def score(b: pd.DataFrame) -> pa.Table:
        c = b["n_baskets"].to_numpy(dtype=np.float64)
        da = b["df_a"].to_numpy(dtype=np.float64)
        db = b["df_b"].to_numpy(dtype=np.float64)
        # the exact SQL expression shape: (N * c) / (df_a * df_b)
        pmi = np.log((n_f * c) / (da * db))
        pmi6 = np.floor(pmi * 1e6 + 0.5) / 1e6  # half-away; see tfidf note
        neg = pmi < 0
        pmi6[neg] = -(np.floor(-pmi[neg] * 1e6 + 0.5) / 1e6)
        return pa.table(
            {
                "term_a": pa.array(b["item_a"].tolist(), pa.string()),
                "term_b": pa.array(b["item_b"].tolist(), pa.string()),
                "n_ab": pa.array(b["n_baskets"].to_numpy(dtype=np.int64), pa.int64()),
                "pmi": pa.array(pmi6, pa.float64()),
            }
        )

    return (
        with_b.map_batches(score, batch_format="pandas")
        .sort(key=["pmi", "term_a", "term_b"], descending=[True, False, False])
        .limit(k)
    )


def hashed_text_features(
    docs,
    dim: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = True,
):
    """Feature-hashing ("hashing trick") text featurizer: each document
    becomes a ``dim``-wide ``list<double>`` vector with
    ``v[hash(term) % dim] += sign(term)`` over its whitespace tokens
    (signed hashing keeps collision noise zero-mean, Weinberger et al.
    2009), optionally L2-normalized — text → vector with NO vocabulary
    pass, no model, and no fixed dictionary to broadcast, so the
    embedding-free corpus feeds the existing k-means / ANN / SemDeDup
    machinery directly.

    Map-only (zero exchanges): vectorized Arrow tokenize → one
    ``np.add.at`` scatter per batch → the shared vectorized Arrow list
    build.  Deterministic (fixed hash key) and order-independent."""
    from .similarity import _list_col

    def featurize(b: pd.DataFrame) -> pa.Table:
        toks, n = _ws_tokens(b[text_col], lower=True)
        m = np.zeros((len(b), dim), dtype=np.float64)
        if n.sum() > 0:
            keep = n > 0
            rows = np.repeat(np.flatnonzero(keep), n[keep])
            terms = pc.list_flatten(toks.filter(pa.array(keep))).to_pandas()
            h = pd.util.hash_pandas_object(terms, index=False).to_numpy()
            col = (h % np.uint64(dim)).astype(np.int64)
            sign = np.where((h >> np.uint64(63)) & np.uint64(1), 1.0, -1.0)
            np.add.at(m, (rows, col), sign)
        if normalize:
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            m = m / norms
        return pa.table(
            {
                id_col: pa.array(b[id_col].to_numpy(dtype=np.int64), pa.int64()),
                "embedding": _list_col(m),
            }
        )

    return docs.map_batches(featurize, batch_format="pandas")


def compression_stats(
    batch: pd.DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> pd.DataFrame:
    """Per-document zlib compression ratio — the Gopher-family quality
    signal the length/punctuation heuristics can't see: highly
    repetitive or templated text compresses far below natural prose
    (natural English sits near ratio ~0.4–0.6 at level 6; boilerplate
    and keyword-stuffed spam drop under ~0.25).

    Map-only (one C zlib call per document inside ``map_batches`` —
    embarrassingly parallel, no exchange).  Returns ``(id, n_bytes,
    n_compressed, ratio)``; empty documents get ratio 1.0 so they are
    never flagged by a low-ratio gate (they have their own filters)."""
    import zlib

    texts = batch[text_col].fillna("")
    raw = [t.encode("utf-8", "replace") for t in texts]
    n_bytes = np.fromiter((len(b) for b in raw), np.int64, len(raw))
    n_comp = np.fromiter(
        (len(zlib.compress(b, level)) for b in raw), np.int64, len(raw)
    )
    ratio = np.where(n_bytes > 0, n_comp / np.maximum(n_bytes, 1), 1.0)
    return pd.DataFrame(
        {
            id_col: batch[id_col].to_numpy(),
            "n_bytes": n_bytes,
            "n_compressed": n_comp,
            "ratio": np.round(ratio, 6),
        }
    )


def ngram_repetition_stats(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 2,
    dup_n: int = 5,
):
    """Gopher-style within-document repetition signals (Rae et al. 2021
    appendix A1.1): the character mass of the single most frequent
    ``top_n``-gram, and the character mass covered by ``dup_n``-grams
    that occur >= 2 times inside the SAME document.  These are the
    repetition quality rules the length/punctuation heuristics in
    :func:`quality_scores` can't see (templated spam repeats n-grams at
    normal length/punct ratios).

    Emits INTEGER char counts, not fractions — ratios of ints can land
    on a rounding boundary at the oracle's 6-dp compare, counts can't;
    callers divide by ``total_chars`` themselves.  Tokens are the
    whitespace split; char mass counts token characters only (joining
    spaces excluded).  The top gram tie-breaks to the lexicographically
    smallest; docs shorter than the gram order emit ''/zeros.

    Map-only — zero exchanges; the per-document scan is sequential by
    nature (like HTML parse / image decode), the batch dimension is the
    parallelism.  Beyond-reference operator (training-data curation;
    no counterpart in Orange-OpenSource/Table-Annotation).
    """
    from collections import Counter

    def run(b: pd.DataFrame) -> pa.Table:
        n_rows = len(b)
        n_tokens = np.zeros(n_rows, np.int64)
        total_chars = np.zeros(n_rows, np.int64)
        top_gram = np.full(n_rows, "", dtype=object)
        top_count = np.zeros(n_rows, np.int64)
        top_chars = np.zeros(n_rows, np.int64)
        dup_chars = np.zeros(n_rows, np.int64)
        for r, text in enumerate(b[text_col].fillna("")):
            toks = text.split()
            t = len(toks)
            n_tokens[r] = t
            lens = np.fromiter((len(x) for x in toks), np.int64, t)
            total_chars[r] = lens.sum()
            if t >= top_n:
                cnt = Counter(
                    " ".join(toks[i : i + top_n]) for i in range(t - top_n + 1)
                )
                g, c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
                top_gram[r] = g
                top_count[r] = c
                # tokens carry no spaces, so gram char mass = len - joins
                top_chars[r] = c * (len(g) - (top_n - 1))
            if t >= dup_n:
                grams = [
                    " ".join(toks[i : i + dup_n]) for i in range(t - dup_n + 1)
                ]
                cnt5 = Counter(grams)
                covered = np.zeros(t, dtype=bool)
                for i, g5 in enumerate(grams):
                    if cnt5[g5] >= 2:
                        covered[i : i + dup_n] = True
                dup_chars[r] = lens[covered].sum()
        try:  # empty-batch type anchor (r4 rule)
            id_t = pa.from_numpy_dtype(b[id_col].dtype)
        except (pa.ArrowNotImplementedError, TypeError):
            id_t = pa.string()
        return pa.table(
            {
                id_col: pa.array(b[id_col].to_numpy(), id_t),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "top_gram": pa.array(top_gram, pa.string()),
                "top_count": pa.array(top_count, pa.int64()),
                "top_chars": pa.array(top_chars, pa.int64()),
                "dup_chars": pa.array(dup_chars, pa.int64()),
                "total_chars": pa.array(total_chars, pa.int64()),
            }
        )

    return docs.map_batches(run, batch_format="pandas")


def lexical_stats(batch: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, text) → n_tokens, n_types (distinct lowercased
    whitespace tokens) and the type-token ratio — the per-document
    lexical-diversity signal (template/spam pages repeat a tiny
    vocabulary; TTR exposes them where length alone can't).
    Beyond-reference operator; map-only, embarrassingly parallel.

    SQL mirror: ``len(list_distinct(regexp_split_to_array(lower(
    trim(text)), '\\s+')))`` with the token_stats empty-text CASE.
    ``ttr = n_types / n_tokens`` is ONE int/int division — both engines
    divide bit-identical exact doubles, so the 6-dp round never sits on
    a boundary disagreement (even power-of-two denominators land ON the
    lattice, not between points).

    The distinct count is vectorized: flatten + row-index repeat +
    pandas drop_duplicates + groupby-size — no per-row Python sets.
    """
    text = batch["text"].fillna("")
    toks, n_tokens = _ws_tokens(text, lower=True)
    off = toks.offsets.to_numpy()
    lens = np.diff(off)
    rows = np.repeat(np.arange(len(n_tokens), dtype=np.int64), lens)
    valid = np.repeat(n_tokens > 0, lens)
    df = pd.DataFrame(
        {"r": rows[valid],
         "t": toks.flatten().to_pandas().to_numpy()[valid]}
    )
    per_row = df.drop_duplicates().groupby("r").size()
    n_types = np.zeros(len(n_tokens), dtype=np.int64)
    n_types[per_row.index.to_numpy()] = per_row.to_numpy()
    with np.errstate(invalid="ignore", divide="ignore"):
        ttr = np.where(
            n_tokens > 0, n_types / np.maximum(n_tokens, 1), np.nan
        )
    ttr = np.where(np.isnan(ttr), np.nan,
                   np.sign(ttr) * np.floor(np.abs(ttr) * 1e6 + 0.5) / 1e6)
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": n_tokens,
            "n_types": n_types,
            "ttr": ttr,
        }
    )


# the 8 Gopher "required words" (Rae et al. 2021, §A1.1 quality rules)
_GOPHER_REQUIRED = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(batch: pd.DataFrame) -> pd.DataFrame:
    """Gopher document-quality rule bundle (Rae et al. 2021 §A1.1) as
    one map-only pass — every rule evaluated in INTEGER arithmetic so
    the gate has no float-rounding boundary anywhere (the round-5
    oracle lesson):

    - ``r_words``:       50 ≤ n_words ≤ 100000
    - ``r_wordlen``:     3 ≤ mean word length ≤ 10, as
                         ``3·n_words ≤ Σlen(word) ≤ 10·n_words``
    - ``r_symbol``:      (# '#' + # '...' + # '…') / n_words ≤ 0.1, as
                         ``10·n_symbols ≤ n_words``
    - ``r_bullet``:      ≤ 10% of lines start with a bullet
                         (•, ‣, ▪, -, *), as ``10·n_bullet ≤ n_lines``
    - ``r_ellipsis``:    ≤ 30% of lines end with '...' or '…', as
                         ``10·n_ellipsis ≤ 3·n_lines``
    - ``r_alpha``:       ≥ 80% of words contain a letter, as
                         ``5·n_alpha_words ≥ 4·n_words``
    - ``r_required``:    ≥ 2 distinct of the 8 required words
                         (lowercased whole tokens)
    - ``keep``:          AND of all rules

    Emits the integer signals alongside the booleans, so the output is
    SQL hash-exact (DuckDB regexp/list kernels are RE2, same as Arrow).
    Zero exchanges; composes with any downstream filter.
    """
    text = batch["text"].fillna("")
    arr = pc.utf8_trim_whitespace(pa.Array.from_pandas(text))
    toks = pc.split_pattern_regex(arr, pattern=r"\s+")
    n_words = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    empty = pc.equal(pc.utf8_length(arr), 0).to_numpy(zero_copy_only=False)
    n_words[empty] = 0

    flat = toks.flatten()
    off = toks.offsets.to_numpy()

    def _seg_sum(per_tok: np.ndarray) -> np.ndarray:
        c = np.r_[0, np.cumsum(per_tok.astype(np.int64))]
        s = c[off[1:]] - c[off[:-1]]
        s[empty] = 0
        return s

    word_chars = _seg_sum(
        pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    )
    alpha_words = _seg_sum(
        pc.greater(
            pc.count_substring_regex(flat, pattern=r"\p{L}"), 0
        ).to_numpy(zero_copy_only=False)
    )

    n_symbols = sum(
        pc.count_substring(pa.Array.from_pandas(text), pattern=p)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
        for p in ("#", "...", "…")
    )

    lines = pc.split_pattern(pa.Array.from_pandas(text), pattern="\n")
    n_lines = pc.list_value_length(lines).to_numpy(zero_copy_only=False).astype(np.int64)
    lflat = lines.flatten()
    loff = lines.offsets.to_numpy()

    def _lseg(per_line: np.ndarray) -> np.ndarray:
        c = np.r_[0, np.cumsum(per_line.astype(np.int64))]
        return c[loff[1:]] - c[loff[:-1]]

    n_bullet = _lseg(
        pc.match_substring_regex(
            lflat, pattern=r"^\s*[•‣▪*-]"
        ).to_numpy(zero_copy_only=False)
    )
    n_ellipsis = _lseg(
        pc.match_substring_regex(
            lflat, pattern=r"(\.\.\.|…)\s*$"
        ).to_numpy(zero_copy_only=False)
    )

    lower_toks = pc.split_pattern_regex(pc.utf8_lower(arr), pattern=r"\s+")
    n_required = sum(
        (_member_counts(lower_toks, {w}) > 0).astype(np.int64)
        for w in _GOPHER_REQUIRED
    )
    n_required[empty] = 0

    r_words = (n_words >= 50) & (n_words <= 100_000)
    r_wordlen = (3 * n_words <= word_chars) & (word_chars <= 10 * n_words) & (n_words > 0)
    r_symbol = 10 * n_symbols <= n_words
    r_bullet = 10 * n_bullet <= n_lines
    r_ellipsis = 10 * n_ellipsis <= 3 * n_lines
    r_alpha = (5 * alpha_words >= 4 * n_words) & (n_words > 0)
    r_required = n_required >= 2
    keep = (
        r_words & r_wordlen & r_symbol & r_bullet & r_ellipsis
        & r_alpha & r_required
    )
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_words": n_words,
            "word_chars": word_chars,
            "n_symbols": n_symbols,
            "n_lines": n_lines,
            "n_bullet": n_bullet,
            "n_ellipsis": n_ellipsis,
            "alpha_words": alpha_words,
            "n_required": n_required,
            "r_words": r_words,
            "r_wordlen": r_wordlen,
            "r_symbol": r_symbol,
            "r_bullet": r_bullet,
            "r_ellipsis": r_ellipsis,
            "r_alpha": r_alpha,
            "r_required": r_required,
            "keep": keep,
        }
    )


def vocab_drift(
    docs: rd.Dataset,
    split_col: str,
    text_col: str = "text",
    top_k: int = 50,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Vocabulary drift between two corpus slices: the top-``top_k``
    tokens of each side (``split_col`` == 0 vs 1, count-desc /
    lexicographic order) aligned into one table — the monitoring view
    that catches a scrape-source or template change before it poisons
    training.  Output one row per token in EITHER top list:
    ``(token, n_a, n_b, rank_a, rank_b)`` with rank NULL (and count 0)
    when the token misses that side's list.

    One grouped_reduce exchange counts (side, token); the per-side
    top-K collect is bounded (blocks x K, the train_bigram_lm prune
    pattern).  Counts are exact ints — SQL hash-exact.
    """
    from .agg import grouped_reduce

    def explode(b: pd.DataFrame) -> pa.Table:
        toks, _ = _ws_tokens(b[text_col], lower=True)
        flat = (
            toks.combine_chunks().flatten()
            if isinstance(toks, pa.ChunkedArray)
            else toks.flatten()
        )
        nt = (
            pc.list_value_length(toks).to_numpy(zero_copy_only=False)
            if not isinstance(toks, pa.ChunkedArray)
            else pc.list_value_length(toks.combine_chunks()).to_numpy(
                zero_copy_only=False)
        )
        side = np.repeat(b[split_col].to_numpy(dtype=np.int64), nt)
        df = pd.DataFrame(
            {"side": side, "token": flat.to_numpy(zero_copy_only=False)}
        )
        p = df.groupby(["side", "token"], sort=False).size().rename(
            "n").reset_index()
        return pa.table(
            {
                "side": pa.array(p["side"].to_numpy(dtype=np.int64),
                                 pa.int64()),
                "token": pa.array(p["token"].tolist(), pa.string()),
                "n": pa.array(p["n"].to_numpy(dtype=np.int64), pa.int64()),
            }
        )

    counts = grouped_reduce(
        docs.map_batches(explode, batch_format="pandas", batch_size=65536),
        ["side", "token"],
        {"n": ("n", "sum")},
        num_buckets=num_buckets,
    )

    def prune(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.sort_values(["side", "n", "token"],
                          ascending=[True, False, True])
            .groupby("side", sort=False)
            .head(top_k)
        )

    allc = counts.map_batches(prune, batch_format="pandas").to_pandas()
    out = {}
    for side in (0, 1):
        sub = (
            allc[allc["side"] == side]
            .sort_values(["n", "token"], ascending=[False, True])
            .head(top_k)
            .reset_index(drop=True)
        )
        for rank, r in sub.iterrows():
            e = out.setdefault(
                r["token"],
                {"token": r["token"], "n_a": 0, "n_b": 0,
                 "rank_a": np.nan, "rank_b": np.nan},
            )
            e["n_a" if side == 0 else "n_b"] = int(r["n"])
            e["rank_a" if side == 0 else "rank_b"] = rank + 1
    df = pd.DataFrame(sorted(out.values(), key=lambda e: e["token"]))
    df["n_a"] = df["n_a"].astype("int64")
    df["n_b"] = df["n_b"].astype("int64")
    # ranks stay float64 even when no NULL is present in this corpus
    # slice (a missing side is NULL — dtype must not depend on data)
    df["rank_a"] = df["rank_a"].astype("float64")
    df["rank_b"] = df["rank_b"].astype("float64")
    return df.reset_index(drop=True)


def ncd_pairs(
    docs: rd.Dataset,
    candidates: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Normalized compression distance (Cilibrasi–Vitányi) for
    CANDIDATE pairs: ``NCD(a,b) = (C(ab) - min(C(a),C(b))) /
    max(C(a),C(b))`` with zlib sizes — the parameter-free similarity
    that catches structural/templated duplication token measures miss
    (near-0 = compressible together = near-duplicates).

    Shape: candidate texts are fetched by a size-gated key filter
    (bounded by the blocking contract), co-located per pair by a
    hash(pair) exchange, and each pair compresses once per side plus
    once joined — per-row CPU inside map tasks, no all-pairs.
    zlib is not expressible in SQL — rows-only; monotonicity and
    self-distance pinned in pytest.  Output ``(doc_a, doc_b, c_a,
    c_b, c_ab, ncd)``.
    """
    import zlib

    import ray
    import ray.data as rd

    from .relational import filter_rows_by_keys

    cand = candidates.to_pandas()[["doc_a", "doc_b"]]
    docs_needed = pd.DataFrame(
        {id_col: np.unique(np.concatenate(
            [cand["doc_a"].to_numpy(), cand["doc_b"].to_numpy()]
        ).astype(np.int64))}
    )
    texts = filter_rows_by_keys(
        docs.select_columns([id_col, text_col]),
        rd.from_pandas(docs_needed), id_col, id_col,
    ).to_pandas()
    tmap_ref = ray.put(dict(zip(texts[id_col].astype(int),
                                texts[text_col].fillna(""))))
    pairs_ds = rd.from_pandas(cand)

    def score(b: pd.DataFrame) -> pa.Table:
        from ..state.worker_state import get_worker_state, ref_key

        tm = get_worker_state(("ncdt", ref_key(tmap_ref)),
                              lambda: ray.get(tmap_ref))
        ca, cb, cab, ncd = [], [], [], []
        for a, bb in zip(b["doc_a"].astype(int), b["doc_b"].astype(int)):
            ta = tm.get(a, "").encode()
            tb = tm.get(bb, "").encode()
            la = len(zlib.compress(ta, 6))
            lb = len(zlib.compress(tb, 6))
            lab = len(zlib.compress(ta + b"\\n" + tb, 6))
            ca.append(la)
            cb.append(lb)
            cab.append(lab)
            ncd.append((lab - min(la, lb)) / max(la, lb))
        return pa.table(
            {
                "doc_a": pa.array(b["doc_a"].to_numpy(dtype=np.int64),
                                  pa.int64()),
                "doc_b": pa.array(b["doc_b"].to_numpy(dtype=np.int64),
                                  pa.int64()),
                "c_a": pa.array(ca, pa.int64()),
                "c_b": pa.array(cb, pa.int64()),
                "c_ab": pa.array(cab, pa.int64()),
                "ncd": pa.array(ncd, pa.float64()),
            }
        )

    return pairs_ds.map_batches(score, batch_format="pandas")


def vocab_growth(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    grid: tuple[int, ...] = (10, 20, 50, 100, 200, 500),
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Heaps-law vocabulary growth: distinct vocabulary size after the
    first k documents (in ``id_col`` order) for each grid point — the
    sublinear V(k) curve whose log-log slope says how fast new data
    stops buying new vocabulary.

    Sequential-looking but ONE exchange: each token's FIRST document
    (grouped_reduce min over the exploded (token, doc) rows) turns
    cumulative vocabulary into a simple count of first-occurrences
    <= k — exact integers, SQL hash-exact.  Output ``(k, vocab,
    total_tokens_at_k)``.
    """
    from .agg import grouped_reduce

    def explode(b: pd.DataFrame) -> pa.Table:
        toks, nt = _ws_tokens(b[text_col], lower=True)
        flat = (
            toks.combine_chunks().flatten()
            if isinstance(toks, pa.ChunkedArray)
            else toks.flatten()
        )
        ids = np.repeat(b[id_col].to_numpy(dtype=np.int64),
                        np.asarray(nt, dtype=np.int64))
        df = pd.DataFrame(
            {"token": flat.to_numpy(zero_copy_only=False), "doc": ids}
        )
        p = df.groupby("token", sort=False).agg(
            first_doc=("doc", "min"), n=("doc", "size")
        ).reset_index()
        return pa.table(
            {
                "token": pa.array(p["token"].tolist(), pa.string()),
                "first_doc": pa.array(
                    p["first_doc"].to_numpy(dtype=np.int64), pa.int64()),
                "n": pa.array(p["n"].to_numpy(dtype=np.int64), pa.int64()),
            }
        )

    firsts = grouped_reduce(
        docs.map_batches(explode, batch_format="pandas", batch_size=65536),
        ["token"],
        {"first_doc": ("first_doc", "min"), "n": ("n", "sum")},
        num_buckets=num_buckets,
    ).to_pandas()
    firsts["first_doc"] = firsts["first_doc"].astype("int64")
    firsts["n"] = firsts["n"].astype("int64")

    # token totals per doc for the cumulative token count at k
    def doc_tokens(b: pd.DataFrame) -> pa.Table:
        _, nt = _ws_tokens(b[text_col], lower=True)
        return pa.table(
            {
                "doc": pa.array(b[id_col].to_numpy(dtype=np.int64),
                                pa.int64()),
                "nt": pa.array(np.asarray(nt, dtype=np.int64), pa.int64()),
            }
        )

    per_doc = grouped_reduce(
        docs.map_batches(doc_tokens, batch_format="pandas"),
        ["doc"], {"nt": ("nt", "sum")}, num_buckets=num_buckets,
    ).to_pandas()
    per_doc["doc"] = per_doc["doc"].astype("int64")
    per_doc["nt"] = per_doc["nt"].astype("int64")

    rows = []
    fd = firsts["first_doc"].to_numpy()
    for k in grid:
        rows.append(
            {
                "k": int(k),
                "vocab": int((fd < k).sum()),
                "total_tokens_at_k": int(
                    per_doc.loc[per_doc["doc"] < k, "nt"].sum()),
            }
        )
    out = pd.DataFrame(rows)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def doc_novelty(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Per-document novelty in corpus order: of a doc's DISTINCT
    tokens, the fraction seen for the FIRST time in this doc (token's
    min doc id == this doc) — the marginal-value curve of appending
    more data, per document.

    One hash(token) co-location computes each token's first doc and
    emits per-(doc, token) contribution rows; one grouped_reduce sums
    per doc.  Exact integers + one double division — SQL hash-exact.
    Output ``(doc, n_distinct, n_new, novelty)``.
    """
    from .agg import grouped_reduce

    nb = np.uint64(num_buckets)

    def explode(b: pd.DataFrame) -> pa.Table:
        toks, _ = _ws_tokens(b[text_col], lower=True)
        flat = (
            toks.combine_chunks().flatten()
            if isinstance(toks, pa.ChunkedArray)
            else toks.flatten()
        )
        nt = pc.list_value_length(
            toks.combine_chunks() if isinstance(toks, pa.ChunkedArray)
            else toks
        ).to_numpy(zero_copy_only=False)
        ids = np.repeat(b[id_col].to_numpy(dtype=np.int64), nt)
        df = pd.DataFrame(
            {"doc": ids, "token": flat.to_numpy(zero_copy_only=False)}
        ).drop_duplicates()
        bkt = (
            pd.util.hash_pandas_object(df["token"], index=False).to_numpy()
            % nb
        ).astype(np.int64)
        return pa.table(
            {
                "doc": pa.array(df["doc"].to_numpy(), pa.int64()),
                "token": pa.array(df["token"].to_numpy(), pa.string()),
                "__nv_bkt": pa.array(bkt, pa.int64()),
            }
        )

    def contrib(g: pd.DataFrame) -> pa.Table:
        first = g.groupby("token", sort=False)["doc"].transform("min")
        return pa.table(
            {
                "doc": pa.array(g["doc"].to_numpy(dtype=np.int64),
                                pa.int64()),
                "one": pa.array(np.ones(len(g), np.int64), pa.int64()),
                "new": pa.array(
                    (g["doc"].to_numpy() == first.to_numpy()).astype(np.int64),
                    pa.int64()),
            }
        )

    sums = grouped_reduce(
        docs.map_batches(explode, batch_format="pandas", batch_size=65536)
        .groupby("__nv_bkt")
        .map_groups(contrib, batch_format="pandas"),
        ["doc"],
        {"n_distinct": ("one", "sum"), "n_new": ("new", "sum")},
        num_buckets=num_buckets,
    )

    def ratio(t: pa.Table) -> pa.Table:
        nd = t["n_distinct"].to_numpy().astype(np.int64)
        nn = t["n_new"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "doc": pa.array(t["doc"].to_numpy().astype(np.int64),
                                pa.int64()),
                "n_distinct": pa.array(nd, pa.int64()),
                "n_new": pa.array(nn, pa.int64()),
                "novelty": pa.array(nn / nd.astype(np.float64), pa.float64()),
            }
        )

    return sums.map_batches(ratio, batch_format="pyarrow")


def skipgram_pairs(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 3,
    min_count: int = 1,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Skip-gram co-occurrence counts — the word2vec/GloVe training
    table: ordered token pairs ``(center, context)`` within distance
    1..``window`` inside a document, counted over the corpus.
    Direction is kept (left/right contexts both emit, as word2vec
    does), so ``(a, b)`` and ``(b, a)`` are separate rows.

    Map-side: one vectorized shift per offset (no per-token Python),
    per-batch combine; ONE grouped_reduce sums across the corpus.
    Output ``(center, context, n)`` with ``n >= min_count``."""
    from .agg import grouped_reduce

    def explode(b: pd.DataFrame) -> pa.Table:
        toks, nt = _ws_tokens(b[text_col], lower=True)
        flat = (
            toks.combine_chunks().flatten()
            if isinstance(toks, pa.ChunkedArray)
            else toks.flatten()
        ).to_numpy(zero_copy_only=False)
        nt = np.asarray(nt, dtype=np.int64)
        doc_idx = np.repeat(np.arange(len(b)), nt)
        centers, contexts = [], []
        for d in range(1, window + 1):
            ok = (doc_idx[d:] == doc_idx[:-d]) if len(doc_idx) > d else \
                np.zeros(0, dtype=bool)
            a = flat[:-d][ok]
            c = flat[d:][ok]
            centers.append(np.concatenate([a, c]))
            contexts.append(np.concatenate([c, a]))
        if centers and sum(len(x) for x in centers):
            df = pd.DataFrame(
                {"center": np.concatenate(centers),
                 "context": np.concatenate(contexts)}
            )
            p = df.groupby(["center", "context"], sort=False).size().rename(
                "n").reset_index()
        else:
            p = pd.DataFrame({"center": [], "context": [], "n": []})
        return pa.table(
            {
                "center": pa.array(p["center"].tolist(), pa.string()),
                "context": pa.array(p["context"].tolist(), pa.string()),
                "n": pa.array(
                    p["n"].to_numpy(dtype=np.int64)
                    if len(p) else np.empty(0, np.int64), pa.int64()),
            }
        )

    counts = grouped_reduce(
        docs.map_batches(explode, batch_format="pandas", batch_size=65536),
        ["center", "context"],
        {"n": ("n", "sum")},
        num_buckets=num_buckets,
    )
    if min_count > 1:
        counts = counts.filter(expr=f"n >= {int(min_count)}")
    return counts
