"""Property tests for the r11 operators' math, engine-free (the
test_r8/r9/r10_math_properties.py pattern): the cross-engine hash
proves Spark == DuckDB run the same formula; these prove the SHARED
formula equals a brute-force simulation, catching a bug both engines
would implement identically. Pure Python + hypothesis — no
SparkSession.
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

# ---- interval_union_coverage: running-max sweep == brute-force union


def _sweep_union(intervals: list[tuple[int, int]]) -> int:
    """The registered formula: sort by (start, idx); covered += max(0,
    e - max(s, prev_max_e))."""
    total = 0
    prev_max_e = None
    for s, e in sorted(intervals):
        lo = s if prev_max_e is None else max(s, prev_max_e)
        total += max(0, e - lo)
        prev_max_e = e if prev_max_e is None else max(prev_max_e, e)
    return total


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(0, 400), min_size=1, max_size=40))
def test_interval_union_sweep_equals_pointwise(starts):
    width = 25
    intervals = [(s, s + width) for s in starts]
    covered_points = set()
    for s, e in intervals:
        covered_points.update(range(s, e))
    assert _sweep_union(intervals) == len(covered_points)


# ---- churn_hazard_curve: suffix-sum at-risk == definition


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(0, 30), min_size=1, max_size=60))
def test_hazard_suffix_sum_equals_definition(tenures):
    from collections import Counter

    deaths = Counter(tenures)
    # registered formula: at_risk(t) = suffix sum of deaths over s >= t
    suffix = {}
    acc = 0
    for t in sorted(deaths, reverse=True):
        acc += deaths[t]
        suffix[t] = acc
    for t, d in deaths.items():
        at_risk_def = sum(1 for x in tenures if x >= t)
        assert suffix[t] == at_risk_def
        hazard_ppm = d * 1000000 // suffix[t]
        assert 0 < hazard_ppm <= 1000000


# ---- acf_daily_revenue: integer identity == definitional ACF


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 1000), min_size=9, max_size=40),
       st.integers(1, 7))
def test_acf_integer_identity_equals_definition(xs, k):
    n = len(xs)
    s = sum(xs)
    sxx = sum(x * x for x in xs)
    sxy = sum(xs[t] * xs[t - k] for t in range(k, n))
    sa = sum(xs[k:])
    sb = sum(xs[: n - k])
    den = n * (n * sxx - s * s)
    if den == 0:  # constant series — both forms undefined
        return
    got = Fraction(n * n * sxy - n * s * (sa + sb) + (n - k) * s * s, den)
    mu = Fraction(s, n)
    want = Fraction(
        sum((Fraction(xs[t]) - mu) * (Fraction(xs[t - k]) - mu)
            for t in range(k, n))
    ) / sum((Fraction(x) - mu) ** 2 for x in xs)
    assert got == want


# ---- equi-depth CDF quintile (rfm_segmentation_histogram): every
# quintile label is 1..5, monotone in the value order, and cell sizes
# stay within one tie-group of n/5


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(0, 50), min_size=1, max_size=200))
def test_cdf_quintile_labels_monotone_and_bounded(vals):
    from collections import Counter

    n = len(vals)
    counts = Counter(vals)
    cum = 0
    labels = {}
    for v in sorted(counts):
        cum += counts[v]
        labels[v] = (5 * cum + n - 1) // n
    ordered = [labels[v] for v in sorted(labels)]
    assert all(1 <= q <= 5 for q in ordered)
    assert ordered == sorted(ordered)  # monotone in value order
    assert ordered[-1] == 5  # the top value always lands in quintile 5
    # tie-free case: exact equi-depth (each quintile within ceil(n/5))
    if len(counts) == n:
        sizes = Counter(labels[v] for v in vals)
        assert max(sizes.values()) <= -(-n // 5) + 1
