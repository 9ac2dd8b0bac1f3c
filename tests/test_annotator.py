"""Per-conversation annotation model (stages/annotator.py) against the
designed mini-KB world — no Ray needed."""

import pytest

from table_annotation_ray import synth
from table_annotation_ray.functions.typing_rules import GazetteerNER, type_cell
from table_annotation_ray.stages.annotator import ActorCaches, TableAnnotator


@pytest.fixture(scope="module")
def annotate(kb_objects):
    kb, kbr, idx = kb_objects
    ner = GazetteerNER(kbr.build_gazetteer())
    annotator = TableAnnotator(idx, kbr, caches=ActorCaches())

    def run(table):
        typings, datatypes = {}, {}
        for row in table:
            for cell in row:
                if cell not in typings:
                    typings[cell], datatypes[cell] = type_cell(cell, ner)
        return annotator.annotate(table, typings, datatypes), annotator

    return run


def _template_table(template, n=8):
    return [cells for cells, _ in synth._rows_for_template(template, None)[:n]]


def test_cities_table(annotate):
    res, ann = annotate(_template_table(synth.CITY_TEMPLATE))
    assert res.entity_cols == [0, 1]
    # nickname column demoted (coverage < 0.3) → textual; date col typed DATE
    assert 3 in ann.textual_cols and 2 in ann.date_cols
    assert 4 in ann.numeral_cols["with_unit"]
    assert res.cta[0][0][0] == "Q515"
    assert res.cta[1][0][0] == "Q6256"
    assert res.cpa[(0, 1)][0][0] == "P17"
    assert res.cpa[(0, 2)][0][0] == "P571"
    assert res.cpa[(0, 3)][0][0] == "P1449"
    assert res.cpa[(1, 4)][0][0] == "P2046"
    # every city resolved correctly
    table = _template_table(synth.CITY_TEMPLATE)
    truth = {cells[0]: truths[0] for cells, truths in synth._rows_for_template(synth.CITY_TEMPLATE, None)}
    for (row, col), (eid, score) in res.cea.items():
        if col == 0:
            assert eid == truth[table[row][0]]


def test_mayors_table(annotate):
    res, ann = annotate(_template_table(synth.MAYOR_TEMPLATE))
    assert res.entity_cols == [0, 1, 2]
    assert res.cpa[(0, 1)][0][0] == "(-)P6"
    assert res.cpa[(0, 2)][0][0] == "P27"
    assert res.cpa[(0, 3)][0][0] == "P580"
    assert res.cpa[(1, 2)][0][0] == "P17"
    assert res.cta[0][0][0] == "Q82955"


def test_films_table(annotate):
    res, ann = annotate(_template_table(synth.FILM_TEMPLATE, 6))
    assert res.entity_cols == [0, 1]
    assert res.cpa[(0, 1)][0][0] == "P161"
    assert res.cpa[(0, 2)][0][0] == "P674"
    assert res.cpa[(0, 3)][0][0] == "P577"
    assert res.cta[0][0][0] == "Q11424"
    assert res.cta[1][0][0] == "Q33999"


def test_single_column_table(annotate):
    # no context → score = sim (annotation_models.py:795-798)
    res, _ = annotate([["Paris"], ["Berlin"], ["Rome"]])
    assert res.cea[(0, 0)][0] == "Q90"
    assert res.cea[(1, 0)][0] == "Q64"


def test_typo_cells_still_resolve(annotate):
    table = _template_table(synth.CITY_TEMPLATE)
    table[0][0] = "Pais"  # Paris with a deletion
    res, _ = annotate(table)
    assert res.cea[(0, 0)][0] == "Q90"


def test_empty_table(annotate):
    res, _ = annotate([["", ""], ["", ""]])
    assert res.cea == {} and res.cta == {} and res.cpa == {}


def test_determinism(annotate):
    t = _template_table(synth.MAYOR_TEMPLATE)
    r1, _ = annotate(t)
    r2, _ = annotate(t)
    assert r1.cea == r2.cea and r1.cta == r2.cta and r1.cpa == r2.cpa
