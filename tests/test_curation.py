"""Curation composition: payload-preserving key filter, resumable
partitioned sink, and the end-to-end curation pipeline."""

import json
import os

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def corpus_df():
    import numpy as np

    rng = np.random.default_rng(42)
    vocab = [f"word{c}{n}" for c in "abcdefghij" for n in range(20)]
    rows = []
    for i in range(20):
        body = " and the ".join(rng.choice(vocab, size=8, replace=False))
        rows.append(
            {
                "doc_id": i,
                "text": f"the story of day {i} is about the {body} in the field",
            }
        )
    rows += [
        # exact dup of doc 0
        {"doc_id": 100, "text": rows[0]["text"]},
        # near dup of doc 1 (one word appended)
        {"doc_id": 101, "text": rows[1]["text"] + " tonight"},
        # junk: no stopwords, long tokens -> quality gate drops it
        {"doc_id": 102, "text": "xqzvkjw plmgrtx bnvczsd qwertyzx mnbvcxza"},
        # French -> dropped when allowed_langs=("en",)
        {"doc_id": 103, "text": "le renard brun et rapide saute par dessus le chien et la foret"},
        # English doc with PII
        {
            "doc_id": 104,
            "text": "please contact the team at alice@example.com for more details "
            "about the quick survey and the data",
        },
    ]
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def corpus_path(tmp_path_factory, corpus_df):
    p = tmp_path_factory.mktemp("curation") / "documents.parquet"
    corpus_df.to_parquet(p, index=False)
    return str(p)


def test_filter_rows_by_keys_both_paths(ray_session, corpus_df):
    import ray.data as rd

    from table_annotation_ray.stages.relational import filter_rows_by_keys

    left = rd.from_pandas(corpus_df)
    keys = rd.from_items([{"doc_id": i} for i in (1, 3, 101, 104)])

    for keep in (True, False):
        bc = filter_rows_by_keys(
            left, keys, "doc_id", keep_members=keep, broadcast_below=10_000
        ).to_pandas()
        dist = filter_rows_by_keys(
            left, keys, "doc_id", keep_members=keep, broadcast_below=0
        ).to_pandas()
        want = set(corpus_df.doc_id) & {1, 3, 101, 104} if keep else set(
            corpus_df.doc_id
        ) - {1, 3, 101, 104}
        assert set(bc.doc_id) == want
        assert set(dist.doc_id) == want
        # payload survives both paths, byte-identical
        for got in (bc, dist):
            assert list(got.columns) == ["doc_id", "text"]
            merged = got.merge(corpus_df, on="doc_id", suffixes=("", "_orig"))
            assert (merged.text == merged.text_orig).all()


def test_write_partitioned_resume(ray_session, tmp_path, corpus_df):
    import ray.data as rd

    from table_annotation_ray.stages.sinks import write_partitioned

    out = str(tmp_path / "sink")
    ds = rd.from_pandas(corpus_df)
    m1 = write_partitioned(ds, out, key_col="doc_id", num_partitions=4)
    assert m1["total_rows"] == len(corpus_df)
    assert m1["resumed_partitions"] == []
    parts = sorted(int(p["rows"]) for p in m1["partitions"].values())
    assert sum(parts) == len(corpus_df)
    for name in os.listdir(out):
        if name.startswith("part="):
            assert os.path.exists(os.path.join(out, name, "_SUCCESS"))

    # simulate a crash on one partition: drop its _SUCCESS -> rerun must
    # rewrite ONLY that partition and skip (not double-write) the rest
    victim = sorted(
        n for n in os.listdir(out) if n.startswith("part=")
    )[0]
    os.remove(os.path.join(out, victim, "_SUCCESS"))
    m2 = write_partitioned(ds, out, key_col="doc_id", num_partitions=4)
    assert m2["total_rows"] == len(corpus_df)  # no duplicates
    victim_id = victim.split("=")[1]
    assert m2["partitions"][victim_id]["status"] == "written"
    resumed = [p for k, p in m2["partitions"].items() if k != victim_id]
    assert all(p["status"] == "resumed(skip)" for p in resumed)
    assert m2["partitions"][victim_id]["rows"] == m1["partitions"][victim_id]["rows"]

    # full reread equals the input
    back = rd.read_parquet(out).to_pandas()
    assert sorted(back.doc_id) == sorted(corpus_df.doc_id)


def test_curation_pipeline_end_to_end(ray_session, tmp_path, corpus_path, corpus_df):
    import ray.data as rd

    from table_annotation_ray.pipelines.curation_pipeline import run_curation_pipeline

    out = str(tmp_path / "curated")
    manifest = run_curation_pipeline(
        corpus_path,
        out,
        minhash_threshold=0.8,
        allowed_langs=("en",),
        max_tokens=64,
        num_partitions=4,
    )
    assert manifest["n_input"] == len(corpus_df)
    # exact dup 100 collapses into 0
    assert manifest["n_after_exact_dedup"] == len(corpus_df) - 1
    # near-dup 101 is a victim of 1's component
    assert manifest["n_near_dup_victims"] >= 1
    # retention funnel is monotonic
    assert (
        manifest["n_input"]
        > manifest["n_after_exact_dedup"]
        > manifest["n_curated"]
        > 0
    )

    docs = rd.read_parquet(os.path.join(out, "docs")).to_pandas()
    assert len(docs) == manifest["n_curated"]
    ids = set(docs.doc_id)
    assert 100 not in ids  # exact dup gone
    assert 101 not in ids  # near dup gone
    assert 102 not in ids  # junk quality gone
    assert 103 not in ids  # non-English gone
    assert 104 in ids  # PII doc survives, scrubbed
    pii_row = docs[docs.doc_id == 104].iloc[0]
    assert "<EMAIL>" in pii_row.text and "alice@example.com" not in pii_row.text
    assert pii_row.n_email == 1
    # provenance columns ride along
    for c in ("stopword_ratio", "mean_token_len", "pred_lang", "n_email"):
        assert c in docs.columns
    assert (docs.pred_lang == "en").all()

    packs = rd.read_parquet(os.path.join(out, "packs")).to_pandas()
    assert sorted(packs.doc_id) == sorted(docs.doc_id)
    # packing invariant: offsets in doc_id order are a running sum
    packs = packs.sort_values("doc_id").reset_index(drop=True)
    assert packs.token_offset.iloc[0] == 0
    assert (packs.pack_id == packs.token_offset // 64).all()

    # top-level manifest persisted with the funnel
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        top = json.load(f)
    assert top["n_curated"] == manifest["n_curated"]


def test_bigram_lm_perplexity_orders_quality(ray_session):
    """In-distribution text must score lower perplexity than
    shuffled-vocab gibberish under the corpus-trained bigram LM."""
    import ray.data as rd

    from table_annotation_ray.stages.lm import score_perplexity, train_bigram_lm

    rng = np.random.default_rng(19)
    sents = [
        "the quick brown fox jumps over the lazy dog",
        "a stitch in time saves nine every single day",
        "practice makes perfect when the work is steady",
    ]
    docs = []
    for i in range(60):
        docs.append({"doc_id": i, "text": sents[i % 3]})
    vocab = " ".join(sents).split()
    for i in range(60, 70):  # gibberish: same vocab, shuffled order
        docs.append({"doc_id": i, "text": " ".join(rng.permutation(vocab)[:9])})
    ds = rd.from_items(docs).repartition(4)
    model = train_bigram_lm(ds)
    out = score_perplexity(ds, model).to_pandas().sort_values("doc_id")
    clean = out[out.doc_id < 60]["ppl"].mean()
    noise = out[out.doc_id >= 60]["ppl"].mean()
    assert clean * 3 < noise, (clean, noise)
    # determinism across block layouts
    model2 = train_bigram_lm(rd.from_items(docs).repartition(7))
    out2 = score_perplexity(ds, model2).to_pandas().sort_values("doc_id")
    np.testing.assert_allclose(out["ppl"].to_numpy(), out2["ppl"].to_numpy(), rtol=1e-12)
    # short/empty docs get the finite OOV perplexity, not inf/nan
    short = score_perplexity(
        rd.from_items([{"doc_id": 0, "text": ""}, {"doc_id": 1, "text": "one"}]), model
    ).to_pandas()
    assert np.isfinite(short["ppl"]).all()


def test_bigram_lm_counts_match_brute_force(ray_session):
    """The fused single-exchange training pass (sentinel context-margin
    unigrams) must reproduce brute-force Counter counts exactly,
    including top-K truncation order and the context-consistency
    filter on bigrams."""
    import collections

    import ray.data as rd

    from table_annotation_ray.stages.lm import _tokenize, train_bigram_lm

    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(40)]
    docs = [
        {"doc_id": i,
         "text": " ".join(rng.choice(vocab, size=int(rng.integers(0, 12))))}
        for i in range(300)
    ]
    ds = rd.from_items(docs).repartition(6)

    uni = collections.Counter()
    bi = collections.Counter()
    for d in docs:
        ts = _tokenize(d["text"])
        uni.update(ts)
        bi.update(zip(ts[:-1], ts[1:]))
    uni_sorted = sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))
    bi_sorted = sorted(bi.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))

    # untruncated: exact count equivalence, filter is a no-op
    model = train_bigram_lm(ds, max_unigrams=10_000, max_bigrams=100_000)
    assert model["uni"] == dict(uni_sorted)
    assert model["bi"] == dict(bi_sorted)
    assert model["V"] == len(uni_sorted) + 1

    # truncated, num_buckets=1 so the per-block top-K IS the global
    # top-K pool: kept bigrams = the global raw top-60 restricted to
    # surviving contexts (the documented pool-then-filter semantics)
    model_t = train_bigram_lm(
        ds, max_unigrams=25, max_bigrams=60, num_buckets=1
    )
    uni_ref = dict(uni_sorted[:25])
    bi_ref = dict([kv for kv in bi_sorted[:60] if kv[0][0] in uni_ref])
    assert model_t["uni"] == uni_ref
    assert model_t["bi"] == bi_ref
    assert model_t["V"] == len(uni_ref) + 1


def test_curation_victim_literal_matches_pipeline(ray_session):
    """The minhash victim set injected into the curation_funnel SQL
    oracle (__ray_entry__._CURATION_VICTIMS_SF001) must equal what the
    pipeline actually computes at sf0.01 — the oracle's one non-SQL
    stage is pinned here instead."""
    import os
    import sys

    import ray.data as rd

    from table_annotation_ray.stages.dedup import exact_dedup, minhash_dedup

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entry

    docs = rd.read_parquet(
        "/root/testdata/sf0.01/documents.parquet", columns=["doc_id", "text"]
    )
    survivors = exact_dedup(docs, keep_text=True).materialize()
    comps = minhash_dedup(survivors, threshold=0.8)
    victims = sorted(
        int(x)
        for x in comps.filter(expr="doc_id != component")
        .select_columns(["doc_id"])
        .to_pandas()["doc_id"]
    )
    literal = sorted(
        int(t) for t in entry._CURATION_VICTIMS_SF001.strip("()").split(",")
    )
    assert victims == literal


def test_bigram_lm_context_consistency_under_truncation(ray_session):
    """Every retained bigram's context unigram must survive the unigram
    cutoff, so c(a) >= c(a,b) and P(b|a) <= 1 always — a kept bigram
    with a truncated context scored (c+k)/(0+kV) > 1 (review r4)."""
    import ray.data as rd

    from table_annotation_ray.stages.lm import score_perplexity, train_bigram_lm

    # 'rare' appears 8x only inside the bigram 'rare gem' — with
    # max_unigrams=3 'rare' loses its unigram slot while the bigram
    # count would keep it in an unfiltered top-bigram table
    docs = (
        [{"doc_id": i, "text": "the cat sat"} for i in range(50)]
        + [{"doc_id": 100 + i, "text": "rare gem " * 4} for i in range(8)]
    )
    ds = rd.from_items(docs).repartition(3)
    model = train_bigram_lm(ds, max_unigrams=3, max_bigrams=100)
    uni_toks = set(model["uni"])
    assert all(a in uni_toks for a, _ in model["bi"])
    out = score_perplexity(ds, model).to_pandas()
    assert (out["ppl"] >= 1.0).all()  # P<=1 everywhere, log P <= 0


def test_quality_classifier_planted_signal(ray_session):
    """Distributed hashed-n-gram logistic training must recover a
    planted vocabulary signal (AUC ≈ 1 on the training distribution)
    and be invariant to block layout (full-batch GD: gradients sum
    commutatively across partitions)."""
    import ray.data as rd

    from table_annotation_ray.stages.classifier import (
        score_quality_classifier,
        train_quality_classifier,
    )

    rng = np.random.default_rng(5)
    good = ["clear", "concise", "helpful", "informative", "structured"]
    bad = ["spam", "clickbait", "lottery", "winner", "unsubscribe"]
    docs = []
    for i in range(1200):
        y = i % 2
        words = ["the", "quick", "text", "about", "topic"] + list(
            rng.choice(good if y else bad, size=4)
        )
        docs.append(
            {"doc_id": i, "text": " ".join(rng.permutation(words)), "label": y}
        )
    ds = rd.from_items(docs).repartition(8)
    model = train_quality_classifier(ds, dim=1 << 14, epochs=6, lr=1.0)

    scores = (
        score_quality_classifier(ds, model)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    y = np.array([d["label"] for d in docs])
    s = scores["score"].to_numpy()
    order = np.argsort(s)
    ranks = np.empty(len(s))
    ranks[order] = np.arange(1, len(s) + 1)
    n1, n0 = int((y == 1).sum()), int((y == 0).sum())
    auc = (ranks[y == 1].sum() - n1 * (n1 + 1) / 2) / (n1 * n0)
    assert auc > 0.99, auc

    # block-layout invariance: identical weights from a 3-block layout
    model2 = train_quality_classifier(
        rd.from_items(docs).repartition(3), dim=1 << 14, epochs=6, lr=1.0
    )
    np.testing.assert_allclose(model["w"], model2["w"], atol=1e-12)
    assert model["bias"] == pytest.approx(model2["bias"], abs=1e-12)

    # degenerate inputs
    with pytest.raises(ValueError):
        train_quality_classifier(rd.from_items([]).repartition(1))


def test_bpe_merges_match_reference_and_engines_agree(ray_session):
    """BPE training must reproduce a hand-rolled single-process Sennrich
    reference byte-for-byte, and the distributed dataset engine must
    equal the driver engine on the same corpus."""
    import collections

    import ray.data as rd

    from table_annotation_ray.stages.bpe import (
        EOW,
        bpe_token_counts,
        encode_word,
        train_bpe,
    )

    docs = [
        {"doc_id": i, "text": t}
        for i, t in enumerate(
            [
                "low lower lowest newer new news",
                "the newer widow showed the new show",
                "low low low lower lowest newest",
                "wide wider widest new newer widow",
            ]
            * 5
        )
    ]
    ds = rd.from_items(docs).repartition(4)

    # independent reference: Counter-based word counts + direct
    # full-recount merge loop (no imports from the module under test
    # beyond the EOW constant)
    wc: collections.Counter = collections.Counter()
    for d in docs:
        wc.update(d["text"].lower().split())
    table = {w: list(w) + [EOW] for w in wc}
    ref_merges = []
    for _ in range(25):
        stats: collections.Counter = collections.Counter()
        for w, syms in table.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += wc[w]
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        ref_merges.append((a, b))
        for w, syms in table.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            table[w] = out

    m_driver = train_bpe(ds, num_merges=25, engine="driver")
    assert m_driver == ref_merges
    m_dataset = train_bpe(
        ds, num_merges=25, engine="dataset", driver_max_words=0,
        repartition_blocks=4,
    )
    assert m_dataset == ref_merges

    # encode: 'low' must compress under the trained merges, and the
    # trained-tokenizer counts must equal a direct per-doc encode
    ranks = {p: i for i, p in enumerate(ref_merges)}
    assert len(encode_word("low", ranks)) < len("low") + 1
    counts = (
        bpe_token_counts(ds, ref_merges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for d in docs[:8]:
        want = sum(len(encode_word(w, ranks)) for w in d["text"].lower().split())
        assert int(counts.loc[counts.doc_id == d["doc_id"], "n_tokens"].iloc[0]) == want


def test_bpe_encode_agrees_with_encode_word_and_counts(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.bpe import (
        bpe_encode,
        bpe_token_counts,
        bpe_vocab,
        corpus_alphabet,
        encode_word,
        train_bpe,
    )

    docs = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": [
                "the cat sat on the mat",
                "the cat ate the rat",
                "low lower lowest newer newest",
                "",          # empty doc -> empty id list
                None,        # null doc
                "zzüq unseen-ish",  # chars that may be rare
            ],
        }
    )
    ds = rd.from_pandas(docs).repartition(3)
    merges = train_bpe(ds, num_merges=30)
    alpha = corpus_alphabet(ds)
    vocab = bpe_vocab(merges, alpha)
    ranks = {p: i for i, p in enumerate(merges)}

    out = (
        bpe_encode(ds, merges, vocab)
        .to_pandas().set_index("doc_id").sort_index()
    )
    # count consistency with the counting stage
    cnt = (
        bpe_token_counts(ds, merges)
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert (out["n_tokens"] == cnt["n_tokens"]).all()
    # per-word agreement with the single-word encoder
    inv = {i: s for s, i in vocab.items()}
    for r in docs.itertuples():
        txt = r.text or ""
        want = []
        for w in txt.lower().split():
            want += [vocab[s] for s in encode_word(w, ranks)]
        got = list(out.loc[r.doc_id, "token_ids"])
        assert got == want, r.doc_id
        # round-trip: symbols re-join to the original words
        if want:
            joined = "".join(inv[i] for i in got).replace("</w>", " ").strip()
            assert joined == " ".join(txt.lower().split())
    assert out.loc[3, "n_tokens"] == 0 and len(out.loc[3, "token_ids"]) == 0


def test_pack_token_ids_matches_reference(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from table_annotation_ray.stages.datapipe import pack_token_ids

    rng = np.random.default_rng(9)
    n_docs, L, EOS = 40, 32, 0
    lists = [
        rng.integers(1, 500, rng.integers(0, 90)).astype("int32").tolist()
        for _ in range(n_docs)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "token_ids": pa.array(lists, pa.list_(pa.int32())),
        }
    )
    ds = rd.from_arrow(t).repartition(5)

    # single-process reference: concatenate in doc order with EOS
    stream, finals = [], []
    for ids in lists:
        stream.extend(ids + [EOS])
        finals.append(len(stream) - 1)  # index of each doc's last token
    n_blocks = len(stream) // L
    ref_blocks = [stream[i * L:(i + 1) * L] for i in range(n_blocks)]
    ref_ndocs = [
        sum(1 for f in finals if i * L <= f < (i + 1) * L)
        for i in range(n_blocks)
    ]

    # chunk=8 forces multi-chunk prefix sums; small L forces straddling
    out = (
        pack_token_ids(ds, block_len=L, eos_id=EOS, chunk=8)
        .to_pandas().sort_values("block_id").reset_index(drop=True)
    )
    assert list(out["block_id"]) == list(range(n_blocks))
    for i in range(n_blocks):
        assert list(out.loc[i, "token_ids"]) == ref_blocks[i], i
        assert out.loc[i, "n_docs"] == ref_ndocs[i], i

    # keep_partial flavor: one extra (short) trailing block iff remainder
    rem = len(stream) % L
    out2 = pack_token_ids(
        ds, block_len=L, eos_id=EOS, chunk=8, drop_partial=False
    ).to_pandas()
    assert len(out2) == n_blocks + (1 if rem else 0)


def test_conversation_windows_matches_reference(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from table_annotation_ray.stages.datapipe import conversation_windows

    rng = np.random.default_rng(6)
    rows = []
    for c in range(12):
        n = int(rng.integers(1, 11))  # 1..10 turns: shorter and longer than window
        for i in range(n):
            rows.append(
                {"conv_id": f"c{c}", "turn_idx": i,
                 "role": "user" if i % 2 == 0 else "assistant",
                 "text": f"t{c}-{i}"}
            )
    df = pd.DataFrame(rows).sample(frac=1, random_state=0)  # shuffled input
    out = (
        conversation_windows(
            rd.from_pandas(df).repartition(5), window=4, stride=2,
            role_col="role",
        )
        .to_pandas()
        .sort_values(["conv_id", "window_idx"])
        .reset_index(drop=True)
    )

    # single-process reference
    ref = []
    for c, g in df.sort_values("turn_idx").groupby("conv_id"):
        rend = [f"{r.role}: {r.text}" for r in g.itertuples()]
        n = len(rend)
        if n >= 4:
            starts = list(range(0, n - 4 + 1, 2))
            if starts[-1] != n - 4:
                starts.append(n - 4)
        else:
            starts = [0]
        for wi, s in enumerate(starts):
            e = min(s + 4, n)
            ref.append((c, wi, "\n".join(rend[s:e]), e - s))
    ref = sorted(ref)
    got = sorted(
        (r.conv_id, int(r.window_idx), r.text, int(r.n_turns))
        for r in out.itertuples()
    )
    assert got == ref
    # full coverage: every turn appears in at least one window
    assert (out.groupby("conv_id")["last_turn"].max()
            == df.groupby("conv_id")["turn_idx"].max()).all()
