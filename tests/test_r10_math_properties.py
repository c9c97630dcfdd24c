"""Property tests for the r10 operators' math, engine-free (the
test_r8/r9_math_properties.py pattern): the cross-engine hash proves
Spark == DuckDB run the same formula; these prove the SHARED formula
equals a brute-force simulation, catching a bug both engines would
implement identically. Pure Python + hypothesis — no SparkSession.
"""

from __future__ import annotations

import math
from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

# ---- passk_estimator: falling-factorial form == binomial definition


@settings(max_examples=300, deadline=None)
@given(st.integers(3, 12), st.integers(0, 12))
def test_passk_falling_factorial_equals_binomial(n, c_raw):
    c = min(c_raw, n)
    m = n - c
    # registered formula (k=3): (n(n-1)(n-2) - m(m-1)(m-2)) / n(n-1)(n-2)
    num = n * (n - 1) * (n - 2) - m * (m - 1) * (m - 2)
    den = n * (n - 1) * (n - 2)
    got_ppm = 1000000 * num // den
    want = 1 - Fraction(math.comb(m, 3), math.comb(n, 3))
    want_ppm = (1000000 * want.numerator) // want.denominator
    assert got_ppm == want_ppm


# ---- majority_vote_accuracy: plurality with smallest-answer tie-break


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(0, 4), min_size=1, max_size=15))
def test_majority_vote_tiebreak(answers):
    counts: dict[int, int] = {}
    for a in answers:
        counts[a] = counts.get(a, 0) + 1
    # the query's ORDER BY c DESC, ans + rn=1
    by_rule = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    best = max(counts.values())
    assert counts[by_rule] == best
    assert by_rule == min(a for a, c in counts.items() if c == best)


# ---- fleiss_kappa_raters: integer reduction == float definition


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5), st.integers(0, 5)),
        min_size=2,
        max_size=40,
    )
)
def test_fleiss_kappa_integer_reduction(cells_raw):
    # normalize each item's 3-category counts to sum to n=5
    items = []
    for a, b, c in cells_raw:
        tot = a + b + c
        if tot == 0:
            a = 5
            tot = 5
        # scale to 5 raters by greedy rounding
        sa = a * 5 // tot
        sb = b * 5 // tot
        sc = 5 - sa - sb
        if sc < 0:
            sb += sc
            sc = 0
        items.append((sa, sb, sc))
    n = 5
    N = len(items)
    sq = sum(x * x for row in items for x in row)
    cj = [sum(row[j] for row in items) for j in range(3)]
    c2 = sum(c * c for c in cj)
    if 25 * N * N == c2:  # degenerate: all mass in one category
        return
    # float definition
    p_i = [(sum(x * x for x in row) - n) / (n * (n - 1)) for row in items]
    pbar = sum(p_i) / N
    pe = sum((c / (N * n)) ** 2 for c in cj)
    kappa = (pbar - pe) / (1 - pe)
    # integer reduction from the query: X/(4Y)
    X = 5 * (sq - 5 * N) * N - 4 * c2
    Y = 25 * N * N - c2
    got = Fraction(X, 4 * Y)
    assert abs(float(got) - kappa) < 1e-9


# ---- pareto frontier: running-max rule == dominance definition


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 15)),
        min_size=1,
        max_size=60,
    )
)
def test_skyline_running_max_equals_dominance(points_raw):
    pts = sorted(set(points_raw))
    # dominance definition: minimize price (first), maximize size (second)
    def dominated(p):
        return any(
            b[0] <= p[0] and b[1] >= p[1] and (b[0] < p[0] or b[1] > p[1])
            for b in pts
        )

    want = {p for p in pts if not dominated(p)}
    # the query's rule: (price asc, size desc) order; on frontier iff
    # size strictly exceeds the running max of all predecessors
    order = sorted(pts, key=lambda p: (p[0], -p[1]))
    got = set()
    run = -1
    for p in order:
        if p[1] > run:
            got.add(p)
            run = p[1]
    assert got == want


# ---- t_closeness EMD: integer common-denominator form == float EMD


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(0, 20), min_size=2, max_size=8),
    st.lists(st.integers(0, 20), min_size=2, max_size=8),
)
def test_emd_integer_form(g_raw, a_extra):
    m = max(len(g_raw), len(a_extra))
    g = g_raw + [0] * (m - len(g_raw))
    extra = a_extra + [0] * (m - len(a_extra))
    a = [gi + ei for gi, ei in zip(g, extra)]  # group ⊆ all
    gtot, atot = sum(g), sum(a)
    if gtot == 0 or atot == 0 or m < 2:
        return
    # float definition: mean |cum(p) - cum(q)| over m-1 prefixes... the
    # standard ordered-EMD uses all m prefixes / (m-1); the query sums
    # ALL buckets' cum gaps (the last is always 0) over (m-1)
    cg = ca = 0
    total = 0
    for gi, ai in zip(g, a):
        cg += gi
        ca += ai
        total += abs(cg * atot - ca * gtot)
    got = Fraction(total, (m - 1) * gtot * atot)
    # brute float
    cgf = caf = 0.0
    tf = 0.0
    for gi, ai in zip(g, a):
        cgf += gi / gtot
        caf += ai / atot
        tf += abs(cgf - caf)
    assert abs(float(got) - tf / (m - 1)) < 1e-9


# ---- poisson bootstrap: ppm thresholds are the exact inverse CDF


def test_poisson_ppm_thresholds():
    e = math.exp(-1)
    cum = 0.0
    want = []
    for k in range(6):
        cum += e / math.factorial(k)
        want.append(round(cum * 1e6))
    assert want == [367879, 735759, 919699, 981012, 996340, 999406]
    # cap loses < 6e-5 of mass
    assert 1e6 - want[-1] < 600


# ---- weighted median: threshold rule == definition


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 50), st.integers(1, 9)),
        min_size=1,
        max_size=40,
    )
)
def test_weighted_median_threshold_rule(pairs):
    # collapse duplicates like the query's per-price pre-aggregate
    agg: dict[int, int] = {}
    for v, w in pairs:
        agg[v] = agg.get(v, 0) + w
    tw = sum(agg.values())
    cum = 0
    got = None
    for v in sorted(agg):
        cum += agg[v]
        if 2 * cum >= tw and got is None:
            got = v
    # definition of lower weighted median: smallest x with
    # sum(w over values <= x) >= tw/2
    want = min(
        v for v in sorted(agg)
        if sum(w for x, w in agg.items() if x <= v) * 2 >= tw
    )
    assert got == want


# ---- time-in-state: duration weighting == piecewise-constant integral


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10**6), st.integers(0, 500)),
        min_size=2,
        max_size=30,
        unique_by=lambda t: t[0],
    )
)
def test_twa_equals_step_integral(events):
    evs = sorted(events)
    num = den = 0
    for (t0, v), (t1, _) in zip(evs, evs[1:]):
        dt = t1 - t0
        num += v * dt
        den += dt
    if den == 0:
        return
    got = num // den
    # piecewise-constant integral of the step function / total time
    integral = sum(
        v * (t1 - t0) for (t0, v), (t1, _) in zip(evs, evs[1:])
    )
    assert got == integral // den
    assert min(v for _, v in evs[:-1]) <= got <= max(v for _, v in evs[:-1])


# ---- shapley_attribution_exact: quantized lattice sum == definition


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(1, 30), st.integers(0, 30)),
        min_size=1,
        max_size=20,
    )
)
def test_shapley_lattice_matches_definition(mask_rows):
    # masks: (mask, cnt, conv<=cnt)
    masks: dict[int, tuple[int, int]] = {}
    for m, cnt, cv in mask_rows:
        c0, v0 = masks.get(m, (0, 0))
        masks[m] = (c0 + cnt, v0 + min(cv, cnt))

    def v_ppm(t):
        cnt = sum(c for m, (c, _) in masks.items() if m & t == m)
        cv = sum(v for m, (_, v) in masks.items() if m & t == m)
        return 0 if cnt == 0 else 1000000 * cv // cnt

    w = {0: 6, 1: 2, 2: 2, 3: 6}
    got = {}
    for name, bit in (("view", 1), ("click", 2), ("signup", 4), ("error", 8)):
        s = sum(
            w[bin(t0).count("1")] * (v_ppm(t0 + bit) - v_ppm(t0))
            for t0 in range(16)
            if t0 & bit == 0
        )
        got[name] = s // 24 if s >= 0 else -((-s) // 24)
    # efficiency on the QUANTIZED game holds within the truncation bound:
    # sum of per-channel values ~ v(full) - v(empty), each phi truncated
    total = sum(got.values())
    exact_gap = v_ppm(15) - v_ppm(0)
    assert abs(total - exact_gap) <= 8  # 4 channels x truncation < 2 ppm
    # and each quantized phi is within 1 ppm + quantization of the float
    # Shapley of the quantized value function (same formula over floats)
    for name, bit in (("view", 1), ("click", 2), ("signup", 4), ("error", 8)):
        f = sum(
            w[bin(t0).count("1")] / 24 * (v_ppm(t0 + bit) - v_ppm(t0))
            for t0 in range(16)
            if t0 & bit == 0
        )
        assert abs(got[name] - f) <= 1


# ---- capped waterfill: closed form == greedy simulation


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(1, 1000), min_size=1, max_size=25))
def test_waterfill_closed_form(caps):
    total = sum(caps)
    budget = total // 2
    m = len(caps)
    order = sorted(range(m), key=lambda i: (caps[i], i))
    sorted_caps = [caps[i] for i in order]
    pfx = []
    s = 0
    for c in sorted_caps:
        s += c
        pfx.append(s)
    # closed form from the query
    k = 0
    for rn in range(1, m + 1):
        if pfx[rn - 1] + (m - rn) * sorted_caps[rn - 1] <= budget:
            k = rn
    pfx_k = pfx[k - 1] if k else 0
    t = (budget - pfx_k) // (m - k) if m - k else 0
    r = (budget - pfx_k) % (m - k) if m - k else 0
    alloc = []
    for rn in range(1, m + 1):
        if rn <= k:
            alloc.append(sorted_caps[rn - 1])
        elif rn - k <= r:
            alloc.append(t + 1)
        else:
            alloc.append(t)
    # invariants: exact budget, never exceeds cap, level fairness
    assert sum(alloc) == budget
    assert all(a <= c for a, c in zip(alloc, sorted_caps))
    uncapped = [a for rn, a in enumerate(alloc, 1) if rn > k]
    if uncapped:
        assert max(uncapped) - min(uncapped) <= 1
    # greedy water-filling simulation reaches the same total shape
    lo, hi = 0, max(caps)
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if sum(min(c, mid) for c in caps) <= budget:
            lo = mid
        else:
            hi = mid - 1
    base = sum(min(c, lo) for c in caps)
    assert base <= budget <= base + sum(1 for c in caps if c > lo)
    if m - k:
        assert t == lo or t + 1 == lo or (t == lo and True)
