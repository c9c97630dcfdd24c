"""Property tests for the r9 operators' math, engine-free (the
test_r8_math_properties.py pattern): the cross-engine hash proves
Spark == DuckDB; these prove the shared formulas == brute-force
simulations, catching a bug both engines would implement identically.
Pure Python + hypothesis — no SparkSession.
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

# ---- hybrid_retrieval_eval: RRF fusion order == exact rational order


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(0, 1), min_size=1, max_size=40),
    st.randoms(use_true_random=False),
)
def test_rrf_fusion_double_order_matches_rational(rels, rnd):
    """The fused score 1/(60+sem) + 1/(60+lex) is compared as a double
    in both engines; with ranks <= ~1e6 the double total order must
    equal the exact Fraction order (no two distinct rational scores
    collapse to the same double in opposite order)."""
    n = len(rels)
    sem = list(range(1, n + 1))
    rnd.shuffle(sem)
    # lexical rank present for a subset only (union-fusion semantics)
    lex_pool = list(range(1, n + 1))
    rnd.shuffle(lex_pool)
    lex = [r if rnd.random() < 0.7 else None for r in lex_pool]
    as_double = [
        1.0 / (60 + s) + (1.0 / (60 + l) if l is not None else 0.0)
        for s, l in zip(sem, lex)
    ]
    as_frac = [
        Fraction(1, 60 + s) + (Fraction(1, 60 + l) if l is not None else 0)
        for s, l in zip(sem, lex)
    ]
    # tiebreak by doc index, exactly like the query's ", doc_id"
    order_d = sorted(range(n), key=lambda i: (-as_double[i], i))
    order_f = sorted(range(n), key=lambda i: (-as_frac[i], i))
    # doubles may tie where fractions differ ONLY if the double compare
    # still yields the same sorted order — assert full order equality
    assert order_d == order_f


# ---- retrieval metrics: ppm integer forms == Fraction definitions


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(0, 1), min_size=1, max_size=50))
def test_precision_recall_mrr_ppm_identities(rel_at_rank):
    k = 10
    topk = rel_at_rank[:k]
    hits = sum(topk)
    n_rel_total = sum(rel_at_rank) or 1  # query guaranteed >=0 rel; guard
    prec_ppm = hits * 1_000_000 // k
    rec_ppm = hits * 1_000_000 // n_rel_total
    assert prec_ppm == int(Fraction(hits, k) * 1_000_000)
    assert rec_ppm == int(Fraction(hits, n_rel_total) * 1_000_000)
    best = next((i + 1 for i, r in enumerate(topk) if r == 1), None)
    mrr_ppm = 1_000_000 // best if best else 0
    if best:
        assert mrr_ppm == int(Fraction(1_000_000, best))
        assert 100_000 <= mrr_ppm <= 1_000_000  # best in 1..10
    else:
        assert hits == 0


# ---- streaming/ivm.py: the signed fold is wave-partition invariant


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from("abcd"),
            st.integers(-50, 50),
            st.sampled_from(["I", "R"]),
        ),
        max_size=30,
    ),
    st.lists(st.integers(0, 3), min_size=30, max_size=30),
)
def test_ivm_fold_wave_partition_invariant(events, wave_of):
    """Assigning each event to ANY of 4 micro-batches (in any order of
    waves) yields the same final state as a one-shot aggregate — the
    merge algebra is a commutative monoid fold, including negative
    intermediates (a retraction can precede its insert)."""

    def effects(batch):
        out: dict[str, list[int]] = {}
        for k, v, op in batch:
            sign = -1 if op == "R" else 1
            c = out.setdefault(k, [0, 0])
            c[0] += sign
            c[1] += sign * v
        return out

    def merge(state, eff):
        for k, (dn, dv) in eff.items():
            c = state.setdefault(k, [0, 0])
            c[0] += dn
            c[1] += dv
        return {k: c for k, c in state.items() if c[0] != 0 or c[1] != 0}

    waves: list[list] = [[], [], [], []]
    for ev, w in zip(events, wave_of):
        waves[w].append(ev)
    state: dict[str, list[int]] = {}
    for w in waves:
        state = merge(state, effects(w))
    oneshot = merge({}, effects(events))
    assert state == oneshot


# ---- lexical retriever: integer Jaccard ppm == Fraction floor, bounded


@settings(max_examples=300, deadline=None)
@given(st.sets(st.integers(0, 40)), st.sets(st.integers(0, 40)))
def test_jaccard_ppm_floor_and_bounds(a, b):
    if not a or not b:
        return
    overlap = len(a & b)
    union = len(a) + len(b) - overlap
    ppm = overlap * 1_000_000 // union
    assert ppm == int(Fraction(overlap, union) * 1_000_000)
    assert 0 <= ppm <= 1_000_000
    assert (ppm == 1_000_000) == (a == b)


# ---- ndcg_fused_eval: integer-weight NDCG == float-definition NDCG


def test_ndcg_weight_table_matches_definition():
    import math

    from fitness_nutrition_data_pipeline_spark.queries.serving_ops import (
        _EVAL_K,
        _NDCG_CUM,
        _NDCG_W,
    )

    assert len(_NDCG_W) == _EVAL_K and _NDCG_W[0] == 1_000_000
    for i, w in enumerate(_NDCG_W, start=1):
        assert w == round(1_000_000 / math.log2(i + 1))
    # strictly decreasing discounts; cumsum table is their prefix sums
    assert list(_NDCG_W) == sorted(_NDCG_W, reverse=True)
    assert _NDCG_CUM == tuple(
        sum(_NDCG_W[: k + 1]) for k in range(_EVAL_K)
    )


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(0, 1), min_size=1, max_size=50))
def test_ndcg_ppm_tracks_float_ndcg(rel_at_rank):
    """dcg*1e6 div idcg over the rounded integer weights must stay
    within 10 ppm of the textbook float NDCG (binary gains): the
    quantization error of round(1e6/log2) weights is ~1e-6 relative,
    so the integer metric is the float metric for any consumer."""
    import math

    from fitness_nutrition_data_pipeline_spark.queries.serving_ops import (
        _EVAL_K,
        _NDCG_CUM,
        _NDCG_W,
    )

    k = _EVAL_K
    topk = rel_at_rank[:k]
    n_rel = sum(rel_at_rank)
    dcg_w = sum(w for w, r in zip(_NDCG_W, topk) if r)
    idcg_w = _NDCG_CUM[min(n_rel, k) - 1] if n_rel else 0
    ndcg_ppm = (dcg_w * 1_000_000) // idcg_w if idcg_w else 0

    dcg_f = sum(
        r / math.log2(i + 2) for i, r in enumerate(topk)
    )
    idcg_f = sum(1 / math.log2(i + 2) for i in range(min(n_rel, k)))
    ndcg_f = dcg_f / idcg_f if idcg_f else 0.0
    assert abs(ndcg_ppm - ndcg_f * 1_000_000) <= 10
    assert 0 <= ndcg_ppm <= 1_000_000


# ---- pretraining_mix_plan: allocation/packing integer identities


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(1, 10**9), min_size=1, max_size=20))
def test_mix_budget_allocation_conserves_and_packs(token_counts):
    """Floor-div allocation never over-spends the global budget; each
    source's ceil-div sequence count covers its budget exactly (no
    sequence short by more than SEQ_LEN-1 tokens); shard counts cover
    sequences the same way."""
    from fitness_nutrition_data_pipeline_spark.queries.curation import (
        _MIX_BUDGET,
        _SEQ_LEN,
        _SHARD_SEQS,
    )

    weights = [round((t ** 0.7) * 1_000) for t in token_counts]
    tot = sum(weights)
    # int64 headroom: BUDGET * weight must not overflow for any source
    # up to ~4e15 tokens (the x1000-not-ppm quantization exists for
    # exactly this; a 100 TB corpus is ~2e13 tokens total)
    assert _MIX_BUDGET * round((4e15 ** 0.7) * 1_000) < 2**63
    budgets = [(_MIX_BUDGET * w) // tot for w in weights]
    assert sum(budgets) <= _MIX_BUDGET  # floor-div never over-allocates
    # floor-div under-allocation is bounded by one unit per source
    assert _MIX_BUDGET - sum(budgets) < len(weights)
    for b in budgets:
        n_seq = (b + _SEQ_LEN - 1) // _SEQ_LEN
        assert n_seq * _SEQ_LEN >= b
        assert n_seq * _SEQ_LEN - b < _SEQ_LEN
        n_shard = (n_seq + _SHARD_SEQS - 1) // _SHARD_SEQS
        assert n_shard * _SHARD_SEQS >= n_seq
        assert n_shard * _SHARD_SEQS - n_seq < _SHARD_SEQS
    # monotone: a source with more tokens never gets a smaller budget
    order = sorted(range(len(token_counts)), key=lambda i: token_counts[i])
    for a, b in zip(order, order[1:]):
        assert budgets[a] <= budgets[b]


# ---- partition_restatement_audit: scoped recompute == full recompute


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 100), st.booleans()),
        min_size=1,
        max_size=60,
    )
)
def test_partition_restatement_equals_full_recompute(rows):
    """(day, value, is_late) rows: recomputing ONLY late-touched days
    from full rows and keeping nightly aggregates elsewhere must equal
    the full per-day recompute — for ANY late/on-time split."""
    from collections import defaultdict

    full = defaultdict(lambda: [0, 0])
    nightly = defaultdict(lambda: [0, 0])
    affected = set()
    for day, v, late in rows:
        full[day][0] += 1
        full[day][1] += v
        if late:
            affected.add(day)
        else:
            nightly[day][0] += 1
            nightly[day][1] += v
    restated = {
        d: agg for d, agg in nightly.items() if d not in affected
    }
    for d in affected:
        restated[d] = full[d]
    assert restated == dict(full)


# ---- kcore_peel_audit: peel invariants


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=80,
    )
)
def test_kcore_peel_monotone_and_fixpoint_consistent(raw):
    """Two peel rounds (k=3) over a symmetrized simple graph: vertex
    and edge counts shrink monotonically, every surviving round-2
    vertex had round-1 degree >= k, and a round that removes nothing
    is a fixpoint (round 2 == round 1)."""
    k = 3
    edges = {(a, b) for a, b in raw if a != b}
    edges |= {(b, a) for a, b in edges}

    def degrees(es):
        d = {}
        for a, _ in es:
            d[a] = d.get(a, 0) + 1
        return d

    traces = []
    es = edges
    for _ in range(3):
        d = degrees(es)
        traces.append((len(d), sum(d.values())))
        keep = {v for v, deg in d.items() if deg >= k}
        es = {(a, b) for a, b in es if a in keep and b in keep}
    (v0, e0), (v1, e1), (v2, e2) = traces
    assert v0 >= v1 >= v2 and e0 >= e1 >= e2
    if (v1, e1) == (v0, e0):  # nothing removed -> fixpoint
        assert (v2, e2) == (v1, e1)
