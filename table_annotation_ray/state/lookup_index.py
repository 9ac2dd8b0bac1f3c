"""In-actor fuzzy entity-lookup index — from-scratch replacement for the
Elasticsearch lookup (`lookup/es_lookup.py:27-210`, `lookup/settings.py`).

Recall layer (stands in for the ES ``match`` + ``fuzziness: AUTO`` query,
es_lookup.py:30-77):
  * exact normalized-label dict;
  * token inverted index with a SymSpell-style deletion neighborhood:
    1-deletion sets for every token ≥ 4 chars (edit distance 1, the
    dominant typo class) and 2-deletion sets for tokens ≥ 6 chars —
    ES ``fuzziness: AUTO`` parity (2 edits allowed at length ≥ 6,
    es_lookup.py:30-44; configurable via two_edit_min_token_len);
  * ES-style label-length window filters: len·0.25 ≤ len(label) ≤ len·4
    OR |len(label) − len| ≤ 4 (es_lookup.py:205-210).

Scoring layer — the reference formula, term by term
(es_lookup.py:108-198):
  ratio components mix lowercased and raw-case comparisons 0.9/0.1;
  token-set only at 0.5 < length ratio < 2; partial-exact-match set
  (partial>0.9 ∧ token_diff ≤ 2, or token_set>0.9 at similar length);
  final fuzzy = mean of top-2 of {char, token_sort, token_set};
  alias factors MAIN_ALIAS 0.94 / SUB_ALIAS 0.88; adaptive threshold
  max(0.70, max_ratio − 0.25); final score = 0.7·fuzzy +
  0.1·log2-normalized pagerank + 0.2·bm25 — bm25 here is an IDF
  token-overlap score normalized by the best hit, standing in for the
  ES BM25 ``_score/max_score``.

The index is built once per actor in ``__init__`` from the broadcast
KBData (SURVEY.md §2.4 J1/J2; ST3).
"""

from __future__ import annotations

import math
from functools import lru_cache

from ..config import LookupConfig
from ..functions import fuzzy
from ..functions.text import normalize_label
from .kb import KBData


def _deletions(token: str) -> set[str]:
    if len(token) <= 3:
        return set()
    return {token[:i] + token[i + 1 :] for i in range(len(token))}


def _deletions2(token: str) -> set[str]:
    """Depth-2 deletion neighborhood (SymSpell): covers 2-edit typos in
    long tokens, matching ES ``fuzziness: AUTO``'s 2-edit allowance for
    tokens ≥ 6 chars (es_lookup.py:30-44)."""
    out: set[str] = set()
    for i in range(len(token)):
        d1 = token[:i] + token[i + 1 :]
        for j in range(len(d1)):
            out.add(d1[:j] + d1[j + 1 :])
    return out


class LabelIndex:
    def __init__(
        self,
        kb: KBData,
        cfg: LookupConfig | None = None,
        df_override: tuple[dict[str, int], int] | None = None,
    ):
        """``df_override=(token_df, n_docs)``: use CORPUS-GLOBAL document
        frequencies for IDF weighting instead of the locally-counted ones
        — required when this index holds only a shard of the label table
        (state/sharded_lookup.py) so bm25 weights match the single
        index exactly."""
        self.cfg = cfg or LookupConfig()
        # label rows: (entity, label, norm_lower, origin, pr, token_count)
        self.rows: list[tuple[str, str, str, str, float, int]] = []
        self.exact: dict[str, list[int]] = {}
        self.token_index: dict[str, list[int]] = {}
        self.deletion_index: dict[str, list[int]] = {}
        self.deletion2_index: dict[str, list[int]] = {}
        self.token_df: dict[str, int] = {}
        two_edit_len = self.cfg.two_edit_min_token_len
        for entity, label, origin, pr in kb.label_rows:
            norm = normalize_label(label).lower()
            if not norm:
                continue
            row_id = len(self.rows)
            toks = norm.split()
            self.rows.append((entity, label, norm, origin, float(pr), len(toks)))
            self.exact.setdefault(norm, []).append(row_id)
            seen_toks = set(toks)
            for tok in seen_toks:
                self.token_index.setdefault(tok, []).append(row_id)
                self.token_df[tok] = self.token_df.get(tok, 0) + 1
                for d in _deletions(tok):
                    self.deletion_index.setdefault(d, []).append(row_id)
                if two_edit_len and len(tok) >= two_edit_len:
                    for d in _deletions2(tok):
                        self.deletion2_index.setdefault(d, []).append(row_id)
        self.n_docs = max(1, len(self.rows))
        if df_override is not None:
            self.token_df, self.n_docs = df_override
        # bound the per-actor result cache
        self._search_cached = lru_cache(maxsize=self.cfg.cache_size)(self._search)

    def df_stats(self) -> tuple[dict[str, int], int]:
        return self.token_df, self.n_docs

    # ---------------- recall ----------------
    def _candidate_rows(self, norm_mention: str) -> dict[int, float]:
        """row_id -> accumulated IDF overlap (the bm25 stand-in, pre-norm)."""
        hits: dict[int, float] = {}
        for rid in self.exact.get(norm_mention, []):
            hits[rid] = hits.get(rid, 0.0) + 2.0 * self._idf_of_row(rid)
        two_edit_len = self.cfg.two_edit_min_token_len
        for tok in set(norm_mention.split()):
            idf = math.log(1.0 + self.n_docs / (1 + self.token_df.get(tok, 0)))
            matched: set[int] = set()
            matched.update(self.token_index.get(tok, ()))
            # fuzzy token match via deletion neighborhoods (edit distance 1)
            dels1 = _deletions(tok)
            for d in dels1:
                matched.update(self.token_index.get(d, ()))
                matched.update(self.deletion_index.get(d, ()))
            matched.update(self.deletion_index.get(tok, ()))
            if two_edit_len and len(tok) >= two_edit_len:
                # edit distance 2 for long tokens (ES AUTO parity): any
                # common string across the ≤2-deletion neighborhoods of
                # query and index token implies ed ≤ 2 (candidates are
                # verified downstream by the fuzzy-ratio scorer)
                matched.update(self.deletion2_index.get(tok, ()))
                for d in dels1:
                    matched.update(self.deletion2_index.get(d, ()))
                for d2 in _deletions2(tok):
                    matched.update(self.token_index.get(d2, ()))
                    matched.update(self.deletion_index.get(d2, ()))
                    matched.update(self.deletion2_index.get(d2, ()))
            for rid in matched:
                hits[rid] = hits.get(rid, 0.0) + idf
        return hits

    def _idf_of_row(self, rid: int) -> float:
        toks = self.rows[rid][2].split()
        return sum(
            math.log(1.0 + self.n_docs / (1 + self.token_df.get(t, 0))) for t in toks
        ) / max(1, len(toks))

    # ---------------- scoring ----------------
    def scored_candidates(
        self, raw_mention: str
    ) -> dict[str, tuple[float, float, float, bool]]:
        """Per-entity partial scores BEFORE the query-global steps:
        ``{entity: (fuzzy_ratio, raw_overlap, pr, is_partial_exact)}``.

        The query-global steps (bm25 normalization by the best hit,
        adaptive threshold from the max ratio, PR log-normalization,
        final mix, sort) live in :func:`finalize_candidates` — this
        split is what makes the sharded lookup tier
        (state/sharded_lookup.py) EXACTLY equivalent to the single
        index WHILE the ``cfg.max_hits`` row cap does not bind: shards
        compute partials over their rows, the router merges and
        finalizes globally.  When a mention's filtered candidate rows
        EXCEED max_hits, truncation is inherently layout-dependent
        (the kept set under equal-overlap ties follows index insertion
        order, so even two differently-built single indexes can
        differ); the sharded tier then evaluates the union of
        per-shard top-max_hits — a SUPERSET of any single index's rows
        (recall never lower; adaptive-threshold scores may shift).
        Mentions with >max_hits surviving rows are ultra-generic
        strings the annotator's candidate cap would down-rank anyway
        (code-review r4)."""
        cfg = self.cfg
        new_label = normalize_label(raw_mention)
        label_lower = new_label.lower()
        if not label_lower:
            return {}
        hits = self._candidate_rows(label_lower)
        if not hits:
            return {}
        # ES length-window filters (es_lookup.py:205-210): analyzed-field
        # window OR keyword-field ±LABEL_TOKEN_DIFF window
        lo1 = int(len(new_label) * cfg.label_length_min_factor)
        hi1 = int(len(new_label) * cfg.label_length_max_factor)
        lo2 = max(0, len(new_label) - cfg.label_token_diff)
        hi2 = len(new_label) + cfg.label_token_diff
        n_mention_toks = len(label_lower.split())

        entity_fuzzy: dict[str, float] = {}
        entity_overlap: dict[str, float] = {}
        entity_pr: dict[str, float] = {}
        partial_exact: set[str] = set()
        n_hits = 0
        # ratio components depend only on the LABEL STRING (not the
        # entity), and label strings repeat heavily across entities
        # (namesakes) — memoize per (label, origin) within this search
        label_score_cache: dict[tuple[str, str], tuple[float, bool]] = {}
        for rid, overlap in sorted(hits.items(), key=lambda kv: -kv[1]):
            if n_hits >= cfg.max_hits:
                break
            entity, ent_label, ent_norm, origin, pr, n_toks = self.rows[rid]
            ll = len(ent_label)
            if not (lo1 <= ll <= hi1 or lo2 <= ll <= hi2):
                continue
            n_hits += 1
            entity_pr[entity] = pr
            entity_overlap[entity] = max(entity_overlap.get(entity, overlap), overlap)

            cached = label_score_cache.get((ent_label, origin))
            if cached is None:
                ent_lower = ent_norm
                char_r = 0.9 * fuzzy.ratio(label_lower, ent_lower) + 0.1 * fuzzy.ratio(
                    new_label, ent_label
                )
                tsort_r = 0.9 * fuzzy.token_sort_ratio(label_lower, ent_lower) + 0.1 * (
                    fuzzy.token_sort_ratio(new_label, ent_label)
                )
                len_ratio = len(label_lower) / max(1, len(ent_lower))
                if 0.5 < len_ratio < 2.0:
                    tset_r = 0.9 * fuzzy.token_set_ratio(label_lower, ent_lower) + 0.1 * (
                        fuzzy.token_set_ratio(new_label, ent_label)
                    )
                else:
                    tset_r = 0.0
                partial_r = 0.9 * fuzzy.partial_ratio(label_lower, ent_lower) + 0.1 * (
                    fuzzy.partial_ratio(new_label, ent_label)
                )
                token_diff = abs(n_mention_toks - n_toks)
                is_partial = (partial_r > 0.9 and token_diff <= 2) or (
                    tset_r > 0.9 and 0.5 < len_ratio < 2.0
                )
                r2 = sorted((char_r, tsort_r, tset_r), reverse=True)[:2]
                r = (r2[0] + r2[1]) / 2
                if origin == "MAIN_ALIAS":
                    r *= cfg.main_alias_factor
                elif origin == "SUB_ALIAS":
                    r *= cfg.sub_alias_factor
                cached = (r, is_partial)
                label_score_cache[(ent_label, origin)] = cached
            r, is_partial = cached
            if is_partial:
                partial_exact.add(entity)
            if r > entity_fuzzy.get(entity, -1.0):
                entity_fuzzy[entity] = r

        return {
            e: (entity_fuzzy[e], entity_overlap[e], entity_pr[e], e in partial_exact)
            for e in entity_fuzzy
        }

    def _search(self, raw_mention: str) -> tuple[tuple[str, float], ...]:
        return finalize_candidates(self.scored_candidates(raw_mention), self.cfg)

    def search(self, raw_mention: str, k: int | None = None) -> list[tuple[str, float]]:
        res = self._search_cached(raw_mention)
        return list(res[:k]) if k else list(res)


def finalize_candidates(
    cands: dict[str, tuple[float, float, float, bool]],
    cfg: LookupConfig,
) -> tuple[tuple[str, float], ...]:
    """Query-global scoring tail (es_lookup.py:170-198): adaptive
    threshold over the max fuzzy ratio, bm25 normalization by the best
    overlap, locally log-normalized pagerank, 0.7/0.1/0.2 mix,
    deterministic sort.  Shared by the single index and the sharded
    tier (merge shard partials, then call this once)."""
    if not cands:
        return ()
    max_ratio = max(v[0] for v in cands.values())
    bm25_max = max(v[1] for v in cands.values()) or 1.0
    threshold = max(cfg.adaptive_ratio_min_threshold, max_ratio - cfg.adaptive_ratio_max_gap)
    kept = [e for e, (r, _o, _p, part) in cands.items() if r >= threshold or part]
    if not kept:
        return ()
    max_pr = max((cands[e][2] for e in kept), default=0.0) or 1.0
    fuzz_w = 1.0 - cfg.page_rank_factor - cfg.bm25_factor
    scored = [
        (
            e,
            fuzz_w * cands[e][0]
            + cfg.page_rank_factor * math.log2(cands[e][2] + 1) / math.log2(max_pr + 1)
            + cfg.bm25_factor * (cands[e][1] / bm25_max),
        )
        for e in kept
    ]
    # deterministic total order: score desc, then entity id (SURVEY §7
    # "hard parts" — the reference relies on dict insertion order)
    scored.sort(key=lambda t: (-t[1], t[0]))
    return tuple(scored)


def merge_candidates(
    parts: list[dict[str, tuple[float, float, float, bool]]],
) -> dict[str, tuple[float, float, float, bool]]:
    """Merge per-shard partials: max fuzzy/overlap/pr, OR partial flag.
    (An entity lives in exactly one shard when sharding by entity hash,
    so this is a plain union there; max-merge keeps it correct for any
    sharding.)"""
    out: dict[str, tuple[float, float, float, bool]] = {}
    for part in parts:
        for e, (r, o, p, flag) in part.items():
            cur = out.get(e)
            if cur is None:
                out[e] = (r, o, p, flag)
            else:
                out[e] = (max(cur[0], r), max(cur[1], o), max(cur[2], p), cur[3] or flag)
    return out
