"""Knowledge-base backend: Parquet mini-KB → broadcast dict → per-actor reader.

Replaces the reference's LMDB hashmap + ES server pair
(`annot_scripts/knowledge_bases.py:50-77`, `data/lookup/entity_indexing.py`)
with a Parquet-backed KB loaded ONCE on the driver, shared via
``ray.put`` (object-store broadcast — every actor on a node maps the
same plasma copy), and wrapped per actor in :class:`KBReader` which
reproduces the ``Wikidata_KB`` query surface
(knowledge_bases.py:63-203).

SCALE NOTE — this in-memory image is the SMALL-KB FAST PATH.  The
reference's production KB is a 248 GB LMDB (`data/hashmap/
wd_hashmap_indexing.py:45`); a KB that size must not be broadcast.  The
scale path is :mod:`.sharded_kb` (KB-subgraph actor tier, entities
hash-sharded across K actors, batched fetches + per-worker LRU) +
:mod:`.sharded_lookup` (label-index tier) — both produce BYTE-IDENTICAL
annotation output (tests/test_sharded_kb.py) and are enabled with
``run_kg_pipeline(..., sharded_kb=True)``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pyarrow.parquet as pq

ENTITY_RANKS = ("NORMAL", "PREFERRED", "DEPRECATED")

# transitive properties (knowledge_bases.py:46-47)
TRANSITIVE_PIDS = frozenset(
    ["P131", "P276", "P279", "P361", "P403", "P460", "P527", "P706", "P927",
     "P1647", "P2094", "P3373", "P3403", "P5607", "P5973", "P171"]
)

TYPE_PROPERTIES = ("P31", "P106", "P39", "P105")  # knowledge_bases.py:30
INSTANCE_OF = "P31"
SUBCLASS_OF = "P279"
UNIT_SYMBOL = "P5061"


@dataclass
class KBData:
    """Plain-dict KB image — picklable, broadcast with ray.put."""

    # qid -> {pid: {obj: kind}}  (kind = rank for entities, type tag for literals)
    subgraphs: dict[str, dict[str, dict[str, str]]] = field(default_factory=dict)
    labels: dict[str, str] = field(default_factory=dict)  # qid -> en label
    num_edges: dict[str, int] = field(default_factory=dict)
    # lookup label table rows: (entity, label, origin, pr)
    label_rows: list[tuple[str, str, str, float]] = field(default_factory=list)


def load_kb(kb_dir: str) -> KBData:
    """Load the 3 KB Parquet tables into dicts (driver-side, once)."""
    kb = KBData()
    edges = pq.read_table(os.path.join(kb_dir, "kb_edges.parquet"))
    for src, pid, obj, kind in zip(
        edges["src"].to_pylist(),
        edges["pid"].to_pylist(),
        edges["obj"].to_pylist(),
        edges["obj_kind"].to_pylist(),
    ):
        kb.subgraphs.setdefault(src, {}).setdefault(pid, {})[obj] = kind

    meta = pq.read_table(os.path.join(kb_dir, "kb_entity_meta.parquet"))
    for ent, lab, n in zip(
        meta["entity"].to_pylist(),
        meta["en_label"].to_pylist(),
        meta["num_edges"].to_pylist(),
    ):
        # a null en_label stored as None would bypass the reader's
        # "No English Label" default (the key EXISTS) and crash
        # get_symbol_of_unit_entity's .lower() (code-review r4)
        if lab is not None:
            kb.labels[ent] = lab
        kb.num_edges[ent] = int(n)

    labels = pq.read_table(os.path.join(kb_dir, "kb_labels.parquet"))
    kb.label_rows = list(
        zip(
            labels["entity"].to_pylist(),
            labels["label"].to_pylist(),
            labels["origin"].to_pylist(),
            labels["pr"].to_pylist(),
        )
    )
    return kb


class KBReader:
    """Per-actor KB query interface — the ``Wikidata_KB`` surface
    (knowledge_bases.py:63-203) over a :class:`KBData` image."""

    def __init__(self, kb: KBData):
        self.kb = kb
        self.transitive_pids = TRANSITIVE_PIDS

    # -- identity / formatting (knowledge_bases.py:63-67, 182-203) --------
    @staticmethod
    def is_valid_id(entity_id: str) -> bool:
        return (
            len(entity_id) > 1
            and entity_id[0] in ("P", "Q")
            and entity_id[1:].isdigit()
        )

    @staticmethod
    def prefixing_entity(entity: str) -> str:
        if entity.startswith("Q"):
            return "http://www.wikidata.org/entity/" + entity
        if entity.startswith("P"):
            return "http://www.wikidata.org/prop/direct/" + entity
        return entity

    @staticmethod
    def map_rank(rank: str) -> int:
        if rank == "PREFERRED":
            return 2
        if rank == "NORMAL":
            return 1
        return 0

    # -- graph getters (knowledge_bases.py:69-180) ------------------------
    # Every derived getter below routes through these three primitives so
    # a backend that stores the graph elsewhere (state/sharded_kb.py's
    # actor tier) only overrides the primitives.
    def get_subgraph_of_entity(self, entity_id: str) -> dict[str, dict[str, str]]:
        return self.kb.subgraphs.get(entity_id, {})

    def get_label_of_entity(self, entity_id: str) -> str:
        return self.kb.labels.get(entity_id, "No English Label")

    def get_num_edges(self, entity_id: str) -> int:
        return self.kb.num_edges.get(entity_id, 0)

    def prefetch(self, entity_ids) -> None:
        """Warm-up hint: a remote-backed reader batches these ids into
        shard round trips; the in-memory image needs nothing."""

    def get_symbol_of_unit_entity(self, unit_entity_id: str):
        sub = self.get_subgraph_of_entity(unit_entity_id)
        if not sub:
            return None
        if "Q8142" in sub.get(INSTANCE_OF, {}):
            # currency unit → snake_cased label (knowledge_bases.py:110-112;
            # the reference's call has a latent only_one bug — fixed here)
            return "_".join(self.get_label_of_entity(unit_entity_id).lower().split(" "))
        syms = sub.get(UNIT_SYMBOL)
        if syms:
            return sorted(syms)[0]
        return None

    def get_supertypes_of_type(self, type_id: str) -> dict[str, str]:
        # same literal-kind guard as the type props below: a
        # literal-valued P279 edge must not leak a raw string into the
        # annotator's supertype sets / CTA voting (code-review r4 found
        # the guard applied at level 1 only — pass 7 completes it)
        sup = self.get_subgraph_of_entity(type_id).get(SUBCLASS_OF)
        if not sup:
            return {}
        return {o: k for o, k in sup.items() if k in ENTITY_RANKS}

    def get_types_of_entity(self, entity_id: str, num_level: int = 1) -> dict[str, dict]:
        """3-level hierarchical types (knowledge_bases.py:136-180): level 1
        from P106/P39/P105 if any, else P31; higher levels walk P279."""
        hierarchical: dict[str, dict] = {}
        if num_level <= 0:
            return hierarchical
        sub = self.get_subgraph_of_entity(entity_id)
        instance_types: dict[str, str] = {}
        other_types: dict[str, str] = {}
        for prop in TYPE_PROPERTIES:
            objs = sub.get(prop)
            if objs:
                # literal-valued type props (e.g. a DateTime P39 edge in
                # the mini-KB) are not types — keep entity objs only; the
                # same guard applies to P31 (a literal P31 would leak a
                # raw string into level_1 and CTA voting, code-review r4)
                ent_objs = {o: k for o, k in objs.items() if k in ENTITY_RANKS}
                if prop == INSTANCE_OF:
                    instance_types.update(ent_objs)
                else:
                    other_types.update(ent_objs)
        hierarchical["level_1"] = other_types if other_types else instance_types
        inter = hierarchical["level_1"]
        for lvl in range(2, num_level + 1):
            nxt: dict[str, str] = {}
            for t in inter:
                # entity-ranked P279 edges only (see get_supertypes_of_type)
                nxt.update(self.get_supertypes_of_type(t))
            hierarchical[f"level_{lvl}"] = nxt
            inter = nxt
        return hierarchical

    # -- ours: NER gazetteer derived from the KB --------------------------
    _TYPE_TO_NER = {
        "Q515": "GPE", "Q486972": "GPE", "Q6256": "GPE",
        "Q5": "PERSON",
        "Q11424": "WORK_OF_ART",
        "Q476028": "ORG", "Q43229": "ORG",
    }

    def build_gazetteer(self) -> dict[str, str]:
        """lowercased surface form -> NER label, from KB labels + P31."""
        gaz: dict[str, str] = {}
        for entity, label, _origin, _pr in self.kb.label_rows:
            p31 = self.kb.subgraphs.get(entity, {}).get(INSTANCE_OF, {})
            ner = None
            for t in p31:
                ner = self._TYPE_TO_NER.get(t)
                if ner:
                    break
            if ner:
                gaz[label.lower()] = ner
        return gaz
