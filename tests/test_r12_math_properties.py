"""Property tests for the r12 operators' math, engine-free (the
test_r8..r11_math_properties.py pattern): the cross-engine hash proves
Spark == DuckDB run the same formula; these prove the SHARED formula
equals a brute-force simulation, catching a bug both engines would
implement identically. Pure Python + hypothesis — no SparkSession.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

# ---- stratified_train_eval_split: integer ceil + quota semantics


@settings(max_examples=500, deadline=None)
@given(st.integers(1, 10**15))
def test_integer_ceil_identity(n):
    """(n + 9) div 10 == ceil(n/10) in EXACT arithmetic — the quota must
    never go through float division (n/10 loses integer precision past
    2^53, so math.ceil(n/10) is wrong for big strata; the registered
    form is pure integer)."""
    assert (n + 9) // 10 == -((-n) // 10)
    if n < 2**52:  # float ceil is only trustworthy here
        assert (n + 9) // 10 == math.ceil(n / 10)


@settings(max_examples=120, deadline=None)
@given(
    st.dictionaries(
        st.sampled_from(["en", "de", "fr", "ja", "ko"]),
        st.lists(st.integers(0, 10**6), min_size=1, max_size=60,
                 unique=True),
        min_size=1,
    )
)
def test_stratified_quota_split_simulation(strata):
    """Per stratum: exactly ceil(10%) docs land in eval, chosen as the
    lowest (md5(id), id) ranks — the registered query's semantics,
    simulated with the same hash."""
    for _lang, ids in strata.items():
        n = len(ids)
        quota = (n + 9) // 10
        ranked = sorted(ids, key=lambda i: (hashlib.md5(
            str(i).encode()).hexdigest(), i))
        eval_set, train_set = ranked[:quota], ranked[quota:]
        assert len(eval_set) == quota
        assert len(eval_set) + len(train_set) == n
        # determinism: recomputing from a shuffled copy picks the same set
        ranked2 = sorted(sorted(ids, reverse=True), key=lambda i: (
            hashlib.md5(str(i).encode()).hexdigest(), i))
        assert ranked2[:quota] == eval_set


# ---- quantile_sketch_merge: merge associativity + CDF readoff rank


def _bin(v: float, width: int = 1000) -> int:
    return math.floor(v / width)


def _readoff(merged: dict[int, int], q_pct: int) -> int:
    total = sum(merged.values())
    cum = 0
    for b in sorted(merged):
        cum += merged[b]
        if cum * 100 >= q_pct * total:
            return b
    raise AssertionError("unreachable for q_pct <= 100")


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from("abcde"),
                  st.floats(0, 600000, allow_nan=False)),
        min_size=1,
        max_size=300,
    ),
    st.sampled_from([50, 90, 99]),
)
def test_quantile_merge_equals_direct_and_rank(rows, q_pct):
    """(1) Summing per-source histograms == histogram of the union (the
    associative merge the operator's stage 2 relies on); (2) the CDF
    readoff bin is exactly the bin holding the ceil(q*N/100)-th smallest
    value (the estimator's accuracy-within-bin-width contract)."""
    per_source: dict[str, Counter] = {}
    for src, v in rows:
        per_source.setdefault(src, Counter())[_bin(v)] += 1
    merged: Counter = Counter()
    for c in per_source.values():
        merged.update(c)
    direct = Counter(_bin(v) for _, v in rows)
    assert merged == direct

    values = sorted(v for _, v in rows)
    n = len(values)
    k = -((-q_pct * n) // 100)  # ceil(q*N/100), exact integers
    assert _readoff(dict(merged), q_pct) == _bin(values[k - 1])
