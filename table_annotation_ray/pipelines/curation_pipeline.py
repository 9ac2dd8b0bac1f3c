"""End-to-end training-data curation pipeline over a documents table.

    read_parquet(documents: doc_id, text)        [column-pruned scan]
      → exact_dedup                              [digest groupby, text moves once]
      → minhash_dedup → victim ids               [LSH bands → verify → components]
      → filter_rows_by_keys(anti)                [size-gated: broadcast / bucketed
                                                  co-location — payload-preserving]
      → quality + language gate                  [one vectorized map, no shuffle]
      → pii_scrub                                [one vectorized map, no shuffle]
      → pack_documents                           [distributed prefix sum]
      → write hash(doc_id)-partitioned Parquet   [docs/ + packs/ sinks, resumable]

This is the LLM-data composition of the repo's operator family
(SURVEY.md round brief: dedup → quality → scrub → pack is what a 100 TB
pre-training corpus actually runs).  The reference has no counterpart;
every stage is an already-tested operator — this module only wires them
and owns the sink layout.

Scale shape: three all-to-alls total (exact-dedup digest groupby, the
minhash band groupby + verify co-location inside ``minhash_dedup``, and
the victim anti-filter when the victim set is too big to broadcast);
everything else is streaming ``map_batches``.  The two intermediates
consumed twice (survivors, curated) are ``materialize()``-d into the
object store — block-distributed and spillable, never driver-resident.

Nothing here calls ray.init() — the caller owns the session.
"""

from __future__ import annotations

import pandas as pd

import ray.data as rd

from ..stages.datapipe import pack_documents, pii_scrub
from ..stages.dedup import exact_dedup, minhash_dedup
from ..stages.relational import filter_rows_by_keys
from ..stages.sinks import write_partitioned
from ..stages.textstats import lang_id, quality_scores


def quality_gate(
    batch: pd.DataFrame,
    min_stopword_ratio: float = 0.05,
    max_mean_token_len: float = 8.0,
    allowed_langs: tuple[str, ...] | None = None,
) -> pd.DataFrame:
    """Score-and-filter in ONE pass, keeping the payload: the quality
    columns and predicted language ride along on surviving rows (the
    curated corpus keeps its provenance signals)."""
    qs = quality_scores(batch)
    lid = lang_id(batch)
    out = batch.copy()
    for c in ("punct_ratio", "digit_ratio", "stopword_ratio", "mean_token_len"):
        out[c] = qs[c].to_numpy()
    out["pred_lang"] = lid["pred_lang"].to_numpy()
    mask = (out["stopword_ratio"] >= min_stopword_ratio) & (
        out["mean_token_len"] < max_mean_token_len
    )
    if allowed_langs is not None:
        mask &= out["pred_lang"].isin(allowed_langs)
    return out[mask]


def scrub_keep_payload(batch: pd.DataFrame) -> pd.DataFrame:
    """pii_scrub, preserving the quality/lang columns: ``text`` is
    replaced by the scrubbed text, redaction counts appended."""
    scrubbed = pii_scrub(batch[["doc_id", "text"]])
    out = batch.copy()
    out["text"] = scrubbed["scrubbed"].to_numpy()
    for c in ("n_email", "n_ip", "n_phone"):
        out[c] = scrubbed[c].to_numpy()
    return out


def run_curation_pipeline(
    docs_path: str,
    out_dir: str,
    minhash_threshold: float = 0.8,
    min_stopword_ratio: float = 0.05,
    max_mean_token_len: float = 8.0,
    allowed_langs: tuple[str, ...] | None = None,
    max_tokens: int = 512,
    num_partitions: int = 16,
    victims_broadcast_below: int = 5_000_000,
) -> dict:
    """Run the curation DAG; returns the combined run manifest.

    Output layout (both sinks resumable, see stages/sinks.py):

    * ``out_dir/docs/part=N/``  — curated documents: doc_id, scrubbed
      text, quality columns, pred_lang, redaction counts;
    * ``out_dir/packs/part=N/`` — (doc_id, pack_id, token_offset)
      sequence-packing assignment over the curated corpus;
    * ``out_dir/_MANIFEST.json`` — per-stage row counts (the lineage
      a 100 TB run needs to audit its retention funnel).
    """
    import json
    import os

    from ..sources.jsonl import read_documents

    docs = read_documents(docs_path, columns=["doc_id", "text"])
    n_input = docs.count()

    # keep_text: survivors carry their payload, consumed twice below
    survivors = exact_dedup(docs, keep_text=True).materialize()
    n_after_exact = survivors.count()

    comps = minhash_dedup(survivors, threshold=minhash_threshold)
    # victims = every near-duplicated doc except its component's min-id
    # representative; tiny relative to the corpus, materialized once so
    # the count and the filter don't re-run the LSH subtree
    victims = (
        comps.filter(expr="doc_id != component").select_columns(["doc_id"]).materialize()
    )
    n_victims = victims.count()
    uniq = filter_rows_by_keys(
        survivors,
        victims,
        "doc_id",
        keep_members=False,
        broadcast_below=victims_broadcast_below,
    )

    curated = uniq.map_batches(
        quality_gate,
        batch_format="pandas",
        fn_kwargs={
            "min_stopword_ratio": min_stopword_ratio,
            "max_mean_token_len": max_mean_token_len,
            "allowed_langs": allowed_langs,
        },
    ).map_batches(scrub_keep_payload, batch_format="pandas").materialize()
    n_curated = curated.count()

    docs_manifest = write_partitioned(
        curated,
        os.path.join(out_dir, "docs"),
        key_col="doc_id",
        num_partitions=num_partitions,
        lineage={"stage": "curated_docs"},
    )
    packs = pack_documents(curated, max_tokens=max_tokens)
    packs_manifest = write_partitioned(
        packs,
        os.path.join(out_dir, "packs"),
        key_col="doc_id",
        num_partitions=num_partitions,
        lineage={"stage": "pack_assignments"},
    )

    manifest = {
        "n_input": n_input,
        "n_after_exact_dedup": n_after_exact,
        "n_near_dup_victims": n_victims,
        "n_curated": n_curated,
        "max_tokens": max_tokens,
        "docs": docs_manifest,
        "packs": packs_manifest,
    }
    with open(os.path.join(out_dir, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest
