"""Property tests for the ES-wildcard → regex translation behind
q_search_wildcard: for patterns limited to ?/* metachars (exactly ES
WildcardQuery's language), the anchored regex must agree with Python's
fnmatch (an independent implementation of the same glob semantics) on every
input — including metachar-at-edges, empty runs, and regex-special literals."""

from __future__ import annotations

import fnmatch
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from hbase_observer_es_spark.operators.search import _wildcard_to_regex

# plain letters plus regex-special literals the translator must escape; no
# [ ] ! which fnmatch treats as character classes but ES wildcard does not
_ALPHABET = "abs.+()c|{}^$"
_pattern = st.text(alphabet=_ALPHABET + "?*", max_size=8)
_candidate = st.text(alphabet=_ALPHABET, max_size=10)


@given(pat=_pattern, s=_candidate)
@settings(max_examples=500, deadline=None)
def test_translation_agrees_with_fnmatch(pat, s):
    ours = re.search(_wildcard_to_regex(pat), s) is not None  # rx is ^…$-anchored
    theirs = fnmatch.fnmatchcase(s, pat)
    assert ours == theirs, (pat, s)


def test_anchoring_is_explicit():
    # "a*" must not match as a substring scan: the regex is ^…$-anchored so
    # rlike (an unanchored search) still applies whole-term semantics
    rx = _wildcard_to_regex("a*b")
    assert rx.startswith("^") and rx.endswith("$")
    assert re.search(rx, "xaby") is None
    assert re.search(rx, "ab") is not None
