"""Property test for the z-order pruning math (pure Python, no Spark):
if zorder_candidate_buckets ever misses a bucket that contains an
in-box point, zorder_box_probe silently drops rows — the worst failure
mode a pruning layer can have.  Completeness must hold for EVERY
domain/box/point combination, which is exactly what hypothesis probes
and an example-based test cannot."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from mapreduce_framework_spark.queries.scans import zorder_candidate_buckets


def _bucket(x, y, xmin, xspan, ymin, yspan):
    xh = (((x - xmin) * 256) // xspan) // 32
    yh = (((y - ymin) * 256) // yspan) // 32
    z = 0
    for i in range(3):
        z += ((xh >> i) & 1) << (2 * i)
        z += ((yh >> i) & 1) << (2 * i + 1)
    return z


@st.composite
def domain_box_point(draw):
    xmin = draw(st.integers(-10_000, 10_000))
    ymin = draw(st.integers(-10_000, 10_000))
    xspan = draw(st.integers(1, 2_000_000))
    yspan = draw(st.integers(1, 2_000_000))
    x_lo = draw(st.integers(xmin, xmin + xspan - 1))
    x_hi = draw(st.integers(x_lo + 1, xmin + xspan))
    y_lo = draw(st.integers(ymin, ymin + yspan - 1))
    y_hi = draw(st.integers(y_lo + 1, ymin + yspan))
    x = draw(st.integers(x_lo, x_hi - 1))
    y = draw(st.integers(y_lo, y_hi - 1))
    return (xmin, xspan, ymin, yspan, x_lo, x_hi, y_lo, y_hi, x, y)


@settings(max_examples=500, deadline=None)
@given(domain_box_point())
def test_candidates_cover_every_in_box_point(params):
    xmin, xspan, ymin, yspan, x_lo, x_hi, y_lo, y_hi, x, y = params
    cands = zorder_candidate_buckets(
        x_lo, x_hi, y_lo, y_hi, xmin, xspan, ymin, yspan
    )
    b = _bucket(x, y, xmin, xspan, ymin, yspan)
    assert b in cands, (
        f"bucket {b} of in-box point ({x},{y}) missing from candidates "
        f"{cands} — the probe would silently drop this row"
    )
    assert len(cands) <= 64 and len(set(cands)) == len(cands)


@settings(max_examples=200, deadline=None)
@given(domain_box_point())
def test_candidates_are_tight_on_the_grid(params):
    """Soundness direction: every candidate corresponds to a grid cell
    the box's high-bit rectangle actually touches (no spurious buckets
    beyond the rectangle cover)."""
    xmin, xspan, ymin, yspan, x_lo, x_hi, y_lo, y_hi, _, _ = params
    cands = set(
        zorder_candidate_buckets(x_lo, x_hi, y_lo, y_hi, xmin, xspan, ymin, yspan)
    )
    xh = {(((v - xmin) * 256) // xspan) // 32 for v in (x_lo, x_hi - 1)}
    yh = {(((v - ymin) * 256) // yspan) // 32 for v in (y_lo, y_hi - 1)}
    xh_range = range(min(xh), max(xh) + 1)
    yh_range = range(min(yh), max(yh) + 1)
    expect = set()
    for a in xh_range:
        for b in yh_range:
            z = 0
            for i in range(3):
                z += ((a >> i) & 1) << (2 * i)
                z += ((b >> i) & 1) << (2 * i + 1)
            expect.add(z)
    assert cands == expect
