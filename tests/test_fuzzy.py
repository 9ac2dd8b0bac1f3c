"""Fuzzy-ratio semantics (functions/fuzzy.py) vs a reference DP and
hand-computed values from the reference's formulas
(annot_scripts/utils.py:65-75, lookup/es_lookup.py:138-152)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from table_annotation_ray.functions import fuzzy


def lcs_dp(a: str, b: str) -> int:
    prev = [0] * (len(b) + 1)
    for ch in a:
        cur = [0] * (len(b) + 1)
        for j, cb in enumerate(b):
            cur[j + 1] = prev[j] + 1 if ch == cb else max(prev[j + 1], cur[j])
        prev = cur
    return prev[-1]


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet="abcde ", max_size=30),
    st.text(alphabet="abcde ", max_size=30),
)
def test_bitparallel_lcs_matches_dp(a, b):
    assert fuzzy.lcs_length(a, b) == lcs_dp(a, b)


def test_ratio_basics():
    assert fuzzy.ratio("", "") == 1.0
    assert fuzzy.ratio("abc", "abc") == 1.0
    assert fuzzy.ratio("abc", "") == 0.0
    # 2*LCS/(la+lb): LCS("universal","universal picture")=9 → 18/26
    assert fuzzy.ratio("universal", "universal picture") == pytest.approx(18 / 26)


def test_token_set_ratio_subset_is_one():
    # the canonical motivation case (es_lookup.py:154-157 comment)
    assert fuzzy.token_set_ratio("universal", "universal picture") == 1.0


def test_partial_ratio_substring_is_one():
    assert fuzzy.partial_ratio("yankees", "new york yankees") == 1.0


def test_textual_similarity_top2_mean():
    # mean of top-2 of the three ratios, lowercased
    s = fuzzy.textual_similarity("Universal", "universal picture")
    char = fuzzy.ratio("universal", "universal picture")
    tsort = fuzzy.token_sort_ratio("universal", "universal picture")
    tset = 1.0
    expected = (sorted([char, tsort, tset], reverse=True)[0] + sorted([char, tsort, tset], reverse=True)[1]) / 2
    assert s == pytest.approx(expected)


def test_token_sort_order_invariance():
    assert fuzzy.token_sort_ratio("new york", "york new") == 1.0
