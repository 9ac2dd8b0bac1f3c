"""Deterministic synthetic data: mini-KB + conversation transcripts + goldens.

Implements FIXTURES.md F-1/F-3/F-4/F-5: a small Wikidata-style KB whose
content exercises every annotation code path (3-level P31/P279 chains,
direct + 2-hop + reverse relations, DateTime / DateTime-Period /
Quantity-unit / String literal edges, aliases and near-miss
distractors), and Parquet transcript tables of shape
(conv_id, turn_idx, role, text, tool, ts) per BASELINE.json input_hint.

A conversation encodes one logical table (SURVEY.md §1.2): every turn's
``text`` is the row's cells joined by " | ".  The generator knows the
ground-truth entity of every mention, so it also emits golden CEA /
CPA / CTA assignments and the golden (subj, pred, obj) triple set the
P/R gate compares against.

Everything is seeded — same (n_convs, seed) in, same bytes out.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

WD_ENTITY_PREFIX = "http://www.wikidata.org/entity/"
WD_PROP_PREFIX = "http://www.wikidata.org/prop/direct/"

# bump when generator output changes — keys the /tmp cache so stale data
# from an older generator can never be read
GENERATOR_VERSION = 2

# --------------------------------------------------------------------------
# curated world
# --------------------------------------------------------------------------

# entity -> (label, [aliases], type chain handled separately)
COUNTRIES = {
    "Q142": ("France", ["French Republic"]),
    "Q183": ("Germany", ["Federal Republic of Germany", "Deutschland"]),
    "Q29": ("Spain", ["Kingdom of Spain"]),
    "Q38": ("Italy", ["Italian Republic"]),
    "Q145": ("United Kingdom", ["UK", "Great Britain"]),
    "Q30": ("United States", ["USA", "United States of America"]),
    "Q17": ("Japan", ["Nippon"]),
    "Q155": ("Brazil", ["Federative Republic of Brazil"]),
}

# city -> (label, aliases, country, founded_date, nickname)
# nicknames deliberately avoid tokens that collide with KB labels so the
# nickname column's lookup coverage is ~0 → the <0.3 demotion path
# (annotation_models.py:273-277) fires and the column is re-classified
# as textual (then matched via String literal edges P1449)
CITIES = {
    "Q90": ("Paris", ["City of Light"], "Q142", "1163-04-12", "Ville Lumière"),
    "Q64": ("Berlin", [], "Q183", "1237-10-28", "Athens on the Spree"),
    "Q2807": ("Madrid", [], "Q29", "0865-05-09", "Villa y Corte"),
    "Q220": ("Rome", ["Eternal City"], "Q38", "0753-04-21", "Caput Mundi"),
    "Q84": ("London", [], "Q145", "0047-01-15", "The Big Smoke"),
    "Q61": ("Washington, D.C.", ["Washington"], "Q30", "1790-07-16", "Seat of Power"),
    "Q1490": ("Tokyo", ["Edo"], "Q17", "1457-06-08", "Eastern Metropolis"),
    "Q2844": ("Brasília", [], "Q155", "1960-04-21", "Plano Piloto"),
    "Q456": ("Lyon", [], "Q142", "0043-10-09", "Gastronomy Hub"),
    "Q1055": ("Hamburg", [], "Q183", "0808-05-02", "Gateway to Trade"),
    "Q1492": ("Barcelona", [], "Q29", "0218-03-01", "Ciudad Condal"),
    "Q490": ("Milan", [], "Q38", "0590-09-22", "Moral Center"),
    "Q18419": ("Manchester", [], "Q145", "0079-06-17", "Cottonopolis"),
    "Q1297": ("Chicago", ["Chi-Town"], "Q30", "1837-03-04", "Windy Town"),
    "Q35765": ("Osaka", [], "Q17", "0645-08-12", "Nation's Kitchen"),
    "Q8678": ("Rio de Janeiro", ["Rio"], "Q155", "1565-03-01", "Marvelous Town"),
}
CAPITALS = {"Q90", "Q64", "Q2807", "Q220", "Q84", "Q61", "Q1490", "Q2844"}

# deterministic country areas (km²), shared by the KB edges and the
# transcript cells so Quantity matching (annotation_models.py:646-670)
# resolves exactly
COUNTRY_AREAS = {
    qid: round(10000 + (int(qid[1:]) * 7919) % 8_000_000 + 0.5, 1) for qid in COUNTRIES
}

# films -> (label, aliases, actor, character, published)
FILMS = {
    "Q104123": ("Pulp Fiction", [], "Q80938", "Vincent Vega", "1994-05-21"),
    "Q206717": ("Casino Royale", [], "Q4547", "James Bond", "2006-11-14"),
    "Q1398776": ("The Virgin Suicides", ["Virgin Suicides"], "Q76478", "Lux Lisbon", "1999-05-19"),
    "Q172241": ("The Godfather", [], "Q36949", "Michael Corleone", "1972-03-15"),
    "Q190050": ("The Matrix", [], "Q43416", "Neo", "1999-03-31"),
    "Q36479": ("Titanic", [], "Q38111", "Jack Dawson", "1997-12-19"),
}

ACTORS = {
    "Q80938": ("John Travolta", ["Travolta"]),
    "Q4547": ("Daniel Craig", ["Craig"]),
    "Q76478": ("Kirsten Dunst", ["Dunst"]),
    "Q36949": ("Al Pacino", ["Pacino"]),
    "Q43416": ("Keanu Reeves", ["Reeves"]),
    "Q38111": ("Leonardo DiCaprio", ["DiCaprio"]),
}

# synthetic mayors: person -> (label, city, country, term_period, birth)
# the governed city and the birthplace city differ (birthplace is the
# "next" capital) so CPA(person, city) has a unique winner (-)P6
MAYORS = {
    "Q900001": ("Anne Moreau", "Q90", "Q142", "2014-05-16:2020-06-28", "1959-06-23"),
    "Q900002": ("Karl Fischer", "Q64", "Q183", "2011-09-01:2021-12-21", "1964-11-04"),
    "Q900003": ("Lucia Ortega", "Q2807", "Q29", "2015-06-13:2019-06-15", "1968-03-12"),
    "Q900004": ("Marco Bianchi", "Q220", "Q38", "2016-06-22:2021-10-21", "1972-07-30"),
    "Q900005": ("Oliver Hayes", "Q84", "Q145", "2016-05-09:2024-05-06", "1970-01-19"),
    "Q900006": ("Grace Palmer", "Q61", "Q30", "2015-01-02:2023-01-02", "1971-08-27"),
    "Q900007": ("Haruto Sato", "Q1490", "Q17", "2016-07-31:2024-07-30", "1966-12-05"),
    "Q900008": ("Pedro Lima", "Q2844", "Q155", "2015-01-01:2018-12-31", "1963-04-14"),
}

# classes / misc
TYPES = {
    "Q515": ("city", []),
    "Q486972": ("human settlement", []),
    "Q2221906": ("geographic location", []),
    "Q6256": ("country", []),
    "Q7275": ("state", []),
    "Q43229": ("organization", []),
    "Q5": ("human", []),
    "Q215627": ("person", []),
    "Q795052": ("individual", []),
    "Q11424": ("film", []),
    "Q2431196": ("audiovisual work", []),
    "Q838948": ("work of art", []),
    "Q82955": ("politician", []),
    "Q33999": ("actor", []),
    "Q476028": ("association football club", []),
    "Q712226": ("square kilometre", []),
    "Q8142": ("currency", []),
}
TYPE_CHAIN = {  # P279 child -> parent
    "Q515": "Q486972", "Q486972": "Q2221906",
    "Q6256": "Q7275", "Q7275": "Q43229",
    "Q5": "Q215627", "Q215627": "Q795052",
    "Q11424": "Q2431196", "Q2431196": "Q838948",
}

DISTRACTORS = {
    # near-miss traps for fuzzy lookup (es_lookup.py:118-120 spirit)
    "Q47899": ("Paris Hilton", [], "Q5"),
    "Q830149": ("Paris, Texas", [], "Q515"),
    "Q18656": ("Manchester United F.C.", ["MUFC", "Man United"], "Q476028"),
    "Q9188": ("Berlin, New Hampshire", [], "Q515"),
    "Q620674": ("Rome, Georgia", [], "Q515"),
    "Q60": ("New York City", ["NYC", "New York"], "Q515"),
}

PIDS = {
    "P17": "country",
    "P36": "capital",
    "P1376": "capital of",
    "P571": "inception",
    "P1449": "nickname",
    "P161": "cast member",
    "P674": "characters",
    "P577": "publication date",
    "P31": "instance of",
    "P279": "subclass of",
    "P106": "occupation",
    "P6": "head of government",
    "P27": "country of citizenship",
    "P19": "place of birth",
    "P569": "date of birth",
    "P39": "position held",
    "P580": "start time",
    "P2046": "area",
    "P5061": "unit symbol",
}


@dataclass
class MiniKB:
    """In-memory build product; `to_parquet` writes the 3 KB tables."""

    labels: list[tuple[str, str, str, float]] = field(default_factory=list)  # entity,label,origin,pr
    edges: list[tuple[str, str, str, str]] = field(default_factory=list)  # src,pid,obj,obj_kind
    meta: dict[str, str] = field(default_factory=dict)  # entity -> en_label
    unit_symbols: dict[str, str] = field(default_factory=dict)  # unitQID -> symbol

    def add_entity(self, qid: str, label: str, aliases: list[str], pr: float):
        self.labels.append((qid, label, "LABEL", pr))
        for i, a in enumerate(aliases):
            origin = "MAIN_ALIAS" if i == 0 else "SUB_ALIAS"
            self.labels.append((qid, a, origin, pr))
        self.meta[qid] = label

    def add_edge(self, src: str, pid: str, obj: str, kind: str, reverse: bool = True):
        self.edges.append((src, pid, obj, kind))
        if reverse and kind in ("NORMAL", "PREFERRED", "DEPRECATED"):
            # reverse edges mirror wd_hashmap_indexing.py:66-74 "(-)" entries
            self.edges.append((obj, "(-)" + pid, src, kind))


def build_mini_kb(n_extra: int = 200, seed: int = 42) -> MiniKB:
    """Build the curated world + ``n_extra`` seeded filler entities (noise
    for the lookup index; scale knob for bench runs)."""
    rng = np.random.RandomState(seed)
    kb = MiniKB()

    for qid, (label, aliases) in TYPES.items():
        kb.add_entity(qid, label, aliases, pr=5.0)
    for child, parent in TYPE_CHAIN.items():
        kb.add_edge(child, "P279", parent, "NORMAL")
    kb.unit_symbols["Q712226"] = "km²"
    kb.add_edge("Q712226", "P5061", "km²", "String", reverse=False)

    for qid, (label, aliases) in COUNTRIES.items():
        kb.add_entity(qid, label, aliases, pr=float(rng.uniform(50, 100)))
        kb.add_edge(qid, "P31", "Q6256", "NORMAL")
        kb.add_edge(qid, "P2046", str(COUNTRY_AREAS[qid]), "Quantity-Q712226", reverse=False)

    for qid, (label, aliases, country, founded, nickname) in CITIES.items():
        kb.add_entity(qid, label, aliases, pr=float(rng.uniform(20, 80)))
        kb.add_edge(qid, "P31", "Q515", "NORMAL")
        kb.add_edge(qid, "P17", country, "NORMAL")
        if qid in CAPITALS:
            kb.add_edge(country, "P36", qid, "PREFERRED")
        kb.add_edge(qid, "P571", founded, "DateTime-Gregorian", reverse=False)
        kb.add_edge(qid, "P1449", nickname, "String", reverse=False)

    for qid, (label, aliases, actor, character, published) in FILMS.items():
        kb.add_entity(qid, label, aliases, pr=float(rng.uniform(10, 60)))
        kb.add_edge(qid, "P31", "Q11424", "NORMAL")
        kb.add_edge(qid, "P161", actor, "NORMAL")
        kb.add_edge(qid, "P674", character, "String", reverse=False)
        kb.add_edge(qid, "P577", published, "DateTime-Gregorian", reverse=False)

    for qid, (label, aliases) in ACTORS.items():
        kb.add_entity(qid, label, aliases, pr=float(rng.uniform(10, 60)))
        kb.add_edge(qid, "P31", "Q5", "NORMAL")
        kb.add_edge(qid, "P106", "Q33999", "NORMAL")

    capitals = sorted(CAPITALS)
    for qid, (label, city, country, term, birth) in MAYORS.items():
        kb.add_entity(qid, label, [], pr=float(rng.uniform(1, 10)))
        kb.add_edge(qid, "P31", "Q5", "NORMAL")
        kb.add_edge(qid, "P106", "Q82955", "NORMAL")
        kb.add_edge(city, "P6", qid, "PREFERRED")
        kb.add_edge(qid, "P27", country, "NORMAL")
        birthplace = capitals[(capitals.index(city) + 1) % len(capitals)]
        kb.add_edge(qid, "P19", birthplace, "NORMAL")
        kb.add_edge(qid, "P39", term, "DateTime-Period", reverse=False)
        kb.add_edge(qid, "P580", term.split(":")[0], "DateTime-Gregorian", reverse=False)
        kb.add_edge(qid, "P569", birth, "DateTime-Gregorian", reverse=False)

    for qid, (label, aliases, typ) in DISTRACTORS.items():
        kb.add_entity(qid, label, aliases, pr=float(rng.uniform(5, 40)))
        kb.add_edge(qid, "P31", typ, "NORMAL")
        if qid in ("Q830149", "Q9188", "Q620674", "Q60"):
            kb.add_edge(qid, "P17", "Q30", "NORMAL")

    first_names = ["James", "Maria", "Wei", "Fatima", "Ivan", "Aiko", "Lucas",
                   "Nadia", "Omar", "Elena", "Kofi", "Ingrid", "Ravi", "Sofia"]
    last_names = ["Smith", "Garcia", "Chen", "Khan", "Petrov", "Tanaka",
                  "Silva", "Novak", "Hassan", "Rossi", "Mensah", "Larsen",
                  "Patel", "Costa"]
    city_qids = list(CITIES)
    for i in range(n_extra):
        qid = f"Q8{700000 + i}"
        name = f"{first_names[int(rng.randint(len(first_names)))]} {last_names[int(rng.randint(len(last_names)))]}"
        if i % 7 == 0:  # collide with an existing person-ish label as a trap
            name = name + " Jr."
        kb.add_entity(qid, name, [], pr=float(rng.uniform(0.1, 2.0)))
        kb.add_edge(qid, "P31", "Q5", "NORMAL")
        kb.add_edge(qid, "P19", city_qids[int(rng.randint(len(city_qids)))], "NORMAL")
    return kb


def kb_to_parquet(kb: MiniKB, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    from . import schemas

    labels = pa.table(
        {
            "entity": [r[0] for r in kb.labels],
            "label": [r[1] for r in kb.labels],
            "length": pa.array([len(r[1]) for r in kb.labels], pa.int32()),
            "origin": [r[2] for r in kb.labels],
            "pr": [float(r[3]) for r in kb.labels],
        },
        schema=schemas.KB_LABELS,
    )
    pq.write_table(labels, os.path.join(out_dir, "kb_labels.parquet"))

    edges = pa.table(
        {
            "src": [r[0] for r in kb.edges],
            "pid": [r[1] for r in kb.edges],
            "obj": [r[2] for r in kb.edges],
            "obj_kind": [r[3] for r in kb.edges],
        },
        schema=schemas.KB_EDGES,
    )
    pq.write_table(edges, os.path.join(out_dir, "kb_edges.parquet"))

    num_edges: dict[str, int] = {}
    for src, _, _, _ in kb.edges:
        num_edges[src] = num_edges.get(src, 0) + 1
    ents = sorted(kb.meta)
    meta = pa.table(
        {
            "entity": ents,
            "en_label": [kb.meta[e] for e in ents],
            "num_edges": pa.array([num_edges.get(e, 0) for e in ents], pa.int64()),
        },
        schema=schemas.KB_ENTITY_META,
    )
    pq.write_table(meta, os.path.join(out_dir, "kb_entity_meta.parquet"))


# --------------------------------------------------------------------------
# transcript templates: each conversation = one logical table
# --------------------------------------------------------------------------
# template: (name, columns, CPA golden {(head,tail): pid}, CTA golden {col: type})
CITY_TEMPLATE = {
    "name": "cities",
    "n_cols": 5,  # [city, country, founded(date), nickname(text), area(quantity)]
    "cpa": {(0, 1): "P17", (0, 2): "P571", (0, 3): "P1449", (1, 4): "P2046"},
    "cta": {0: "Q515", 1: "Q6256"},
    "entity_cols": [0, 1],
}
FILM_TEMPLATE = {
    "name": "films",
    "n_cols": 4,  # [film, actor, character(text), published(date)]
    "cpa": {(0, 1): "P161", (0, 2): "P674", (0, 3): "P577"},
    "cta": {0: "Q11424", 1: "Q33999"},
    "entity_cols": [0, 1],
}
MAYOR_TEMPLATE = {
    "name": "mayors",
    "n_cols": 4,  # [person, city, country, term_start(date)]
    "cpa": {(0, 1): "(-)P6", (0, 2): "P27", (0, 3): "P580", (1, 2): "P17"},
    "cta": {0: "Q82955", 1: "Q515", 2: "Q6256"},
    "entity_cols": [0, 1, 2],
}
TEMPLATES = [CITY_TEMPLATE, FILM_TEMPLATE, MAYOR_TEMPLATE]

from .schemas import CELL_SEP  # transcript cell convention (re-export)


def _typo(rng, s: str) -> str:
    """Deterministic single-char deletion (not the first char)."""
    if len(s) < 5:
        return s
    i = 1 + int(rng.randint(len(s) - 2))
    return s[:i] + s[i + 1 :]


def _mojibake(s: str) -> str:
    """Render as the classic UTF-8-bytes-read-as-latin1 corruption."""
    try:
        return s.encode("utf-8").decode("latin-1")
    except Exception:
        return s


@dataclass
class SynthResult:
    transcripts: pa.Table
    golden_cea: pa.Table  # conv_id, turn_idx, col_slot, entity_id
    golden_cpa: pa.Table  # conv_id, head_col, tail_col, pid
    golden_cta: pa.Table  # conv_id, col_slot, type_id
    golden_triples: pa.Table  # subj, pred, obj (set semantics)


def _rows_for_template(t: dict, rng) -> list[tuple[list[str], list[str | None]]]:
    """All candidate (cells, truth_qids) rows for a template."""
    rows = []
    if t["name"] == "cities":
        for qid, (label, _al, country, founded, nickname) in CITIES.items():
            c_label = COUNTRIES[country][0]
            area_cell = f"{COUNTRY_AREAS[country]} km2"
            rows.append(
                (
                    [label, c_label, founded, nickname, area_cell],
                    [qid, country, None, None, None],
                )
            )
    elif t["name"] == "films":
        for qid, (label, _al, actor, character, published) in FILMS.items():
            rows.append(
                ([label, ACTORS[actor][0], character, published], [qid, actor, None, None])
            )
    else:
        for qid, (label, city, country, term, _birth) in MAYORS.items():
            cells = [label, CITIES[city][0], COUNTRIES[country][0], term.split(":")[0]]
            rows.append((cells, [qid, city, country, None]))
    return rows


def generate(
    n_convs: int = 100,
    seed: int = 42,
    typo_rate: float = 0.04,
    mojibake_rate: float = 0.03,
    hot_fraction: float = 0.02,
    hot_turns: int = 120,
    with_goldens: bool = True,
) -> SynthResult:
    """Generate ``n_convs`` conversations.  A ``hot_fraction`` of them are
    "hot" (``hot_turns`` turns) to exercise skew handling."""
    rng = np.random.RandomState(seed)
    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    g_cea: list[tuple[str, int, int, str]] = []
    g_cpa: list[tuple[str, int, int, str]] = []
    g_cta: list[tuple[str, int, str]] = []
    clean_cells: dict[tuple[str, int, int], str] = {}

    base_ts = np.datetime64("2025-01-01T00:00:00", "us")
    template_rows = [_rows_for_template(t, rng) for t in TEMPLATES]

    for ci in range(n_convs):
        conv_id = "conv-" + hashlib.sha1(f"{seed}:{ci}".encode()).hexdigest()[:12]
        ti = int(rng.randint(len(TEMPLATES)))
        template, all_rows = TEMPLATES[ti], template_rows[ti]
        is_hot = rng.uniform() < hot_fraction
        n_turns = hot_turns if is_hot else 3 + int(rng.randint(8))
        row_ids = rng.randint(len(all_rows), size=n_turns)
        ts = base_ts + np.timedelta64(int(ci) * 3_600_000_000, "us")
        seen_pairs = set()
        for turn in range(n_turns):
            cells, truths = all_rows[int(row_ids[turn])]
            out_cells = []
            for slot, cell in enumerate(cells):
                rendered = cell
                if truths[slot] is not None and rng.uniform() < typo_rate:
                    rendered = _typo(rng, rendered)
                if rng.uniform() < mojibake_rate:
                    rendered = _mojibake(rendered)
                out_cells.append(rendered)
                if with_goldens:
                    clean_cells[(conv_id, turn, slot)] = cell
                    if truths[slot] is not None:
                        g_cea.append((conv_id, turn, slot, truths[slot]))
            conv_ids.append(conv_id)
            turn_idxs.append(turn)
            roles.append("user" if turn % 2 == 0 else "assistant")
            texts.append(CELL_SEP.join(out_cells))
            tools.append("" if turn % 5 else "table_lookup")
            tss.append(ts + np.timedelta64(turn * 30_000_000, "us"))
        for (h, t_), pid in template["cpa"].items():
            g_cpa.append((conv_id, h, t_, pid))
        for col, typ in template["cta"].items():
            g_cta.append((conv_id, col, typ))

    transcripts = pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        }
    )

    golden_cea = pa.table(
        {
            "conv_id": [r[0] for r in g_cea],
            "turn_idx": pa.array([r[1] for r in g_cea], pa.int32()),
            "col_slot": pa.array([r[2] for r in g_cea], pa.int32()),
            "entity_id": [r[3] for r in g_cea],
        }
    )
    golden_cpa = pa.table(
        {
            "conv_id": [r[0] for r in g_cpa],
            "head_col": pa.array([r[1] for r in g_cpa], pa.int32()),
            "tail_col": pa.array([r[2] for r in g_cpa], pa.int32()),
            "pid": [r[3] for r in g_cpa],
        }
    )
    golden_cta = pa.table(
        {
            "conv_id": [r[0] for r in g_cta],
            "col_slot": pa.array([r[1] for r in g_cta], pa.int32()),
            "type_id": [r[2] for r in g_cta],
        }
    )
    if with_goldens:
        golden_triples = _golden_triples(golden_cea, golden_cpa, golden_cta, clean_cells)
    else:
        golden_triples = pa.table({"subj": [], "pred": [], "obj": []})
    return SynthResult(transcripts, golden_cea, golden_cpa, golden_cta, golden_triples)


def _golden_triples(
    cea: pa.Table,
    cpa: pa.Table,
    cta: pa.Table,
    cells: dict[tuple[str, int, int], str],
) -> pa.Table:
    """Expected deduplicated triple set (see stages/triples.py for the
    emission rules these goldens mirror).  ``cells`` holds the CLEAN cell
    text — the pipeline emits literals after encoding repair."""
    cea_map: dict[tuple[str, int, int], str] = {}
    for r in cea.to_pylist():
        cea_map[(r["conv_id"], r["turn_idx"], r["col_slot"])] = r["entity_id"]
    turns_per_conv: dict[str, int] = {}
    for conv_id, turn, _slot in cells:
        turns_per_conv[conv_id] = max(turns_per_conv.get(conv_id, 0), turn + 1)

    triples: set[tuple[str, str, str]] = set()
    for r in cpa.to_pylist():
        conv, h, t, pid = r["conv_id"], r["head_col"], r["tail_col"], r["pid"]
        for turn in range(turns_per_conv[conv]):
            subj = cea_map.get((conv, turn, h))
            if subj is None:
                continue
            obj_qid = cea_map.get((conv, turn, t))
            if obj_qid is not None:
                obj = WD_ENTITY_PREFIX + obj_qid
            else:
                obj = cells.get((conv, turn, t))
                if obj is None:
                    continue
            if pid.startswith("(-)"):
                if obj_qid is None:
                    continue
                triples.add((obj, WD_PROP_PREFIX + pid[3:], WD_ENTITY_PREFIX + subj))
            else:
                triples.add((WD_ENTITY_PREFIX + subj, WD_PROP_PREFIX + pid, obj))
    for r in cta.to_pylist():
        conv, col, typ = r["conv_id"], r["col_slot"], r["type_id"]
        for turn in range(turns_per_conv[conv]):
            subj = cea_map.get((conv, turn, col))
            if subj is not None:
                triples.add(
                    (WD_ENTITY_PREFIX + subj, WD_PROP_PREFIX + "P31", WD_ENTITY_PREFIX + typ)
                )
    rows = sorted(triples)
    return pa.table(
        {
            "subj": [r[0] for r in rows],
            "pred": [r[1] for r in rows],
            "obj": [r[2] for r in rows],
        }
    )


# --------------------------------------------------------------------------
# cached materialization for tests / bench / queries
# --------------------------------------------------------------------------

def materialize(
    root: str,
    n_convs: int = 100,
    seed: int = 42,
    n_extra_entities: int = 200,
    with_goldens: bool = True,
    **kwargs,
) -> str:
    """Write transcripts + KB + goldens under ``root`` (idempotent: skips
    when the directory is already complete). Returns ``root``."""
    marker = os.path.join(root, "_COMPLETE")
    if os.path.exists(marker):
        return root
    os.makedirs(root, exist_ok=True)
    res = generate(n_convs=n_convs, seed=seed, with_goldens=with_goldens, **kwargs)
    # modest row groups so ray.data.read_parquet can split the read into
    # parallel tasks (a single row group = a serial read)
    pq.write_table(
        res.transcripts, os.path.join(root, "transcripts.parquet"), row_group_size=16384
    )
    pq.write_table(res.golden_cea, os.path.join(root, "golden_cea.parquet"))
    pq.write_table(res.golden_cpa, os.path.join(root, "golden_cpa.parquet"))
    pq.write_table(res.golden_cta, os.path.join(root, "golden_cta.parquet"))
    pq.write_table(res.golden_triples, os.path.join(root, "golden_triples.parquet"))
    kb = build_mini_kb(n_extra=n_extra_entities, seed=seed)
    kb_to_parquet(kb, os.path.join(root, "kb"))
    with open(marker, "w") as f:
        f.write("ok\n")
    return root


def default_dataset(n_convs: int = 100, seed: int = 42, with_goldens: bool | None = None) -> str:
    """Materialize (once) under /tmp keyed by parameters.  Goldens are
    skipped by default above 50k conversations (bench-scale data — the
    golden computation is driver-side and memory-heavy)."""
    if with_goldens is None:
        with_goldens = n_convs <= 50_000
    root = f"/tmp/ta_ray_synth/v{GENERATOR_VERSION}_convs{n_convs}_seed{seed}"
    return materialize(root, n_convs=n_convs, seed=seed, with_goldens=with_goldens)
