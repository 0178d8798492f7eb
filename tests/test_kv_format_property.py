"""Property-based check of the compat key:value line format.

The reference's whole data plane is `key:value` text lines
(workerimpl.cc:256-261); compat.write_kv_text/read_kv_text must round-
trip ANY key the map contract can emit — including keys containing
colons — because the reducer splits on the LAST colon.  The parse is a
Spark-side regex; this mirrors it in Python's re (both are leftmost-
greedy backtracking dialects with identical semantics for this
pattern) so hypothesis can hammer it without a JVM round-trip per
example; one Spark-side spot check of the adversarial corner lives in
tests/test_compat.py.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

# The exact pattern used in compat.read_kv_text.
_PATTERN = re.compile(r"^(.*):(-?\d+)$")

keys = st.text(
    alphabet=st.characters(blacklist_characters="\n\r", blacklist_categories=("Cs",)),
    min_size=0,
    max_size=40,
)
values = st.integers(min_value=-(2**62), max_value=2**62)


@given(key=keys, value=values)
@settings(max_examples=500, deadline=None)
def test_kv_line_roundtrip(key, value):
    line = f"{key}:{value}"
    m = _PATTERN.match(line)
    assert m is not None, line
    assert m.group(1) == key
    assert int(m.group(2)) == value


@given(key=keys)
@settings(max_examples=200, deadline=None)
def test_non_numeric_tail_never_parses_as_value(key):
    # A line whose tail is not an integer must not silently yield a row
    # with a mangled key.
    line = f"{key}:xyz"
    m = _PATTERN.match(line)
    assert m is None
