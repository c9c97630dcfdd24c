"""Connected components: transitive closure, convergence, LSH integration."""

from fitness_nutrition_data_pipeline_spark.operators.components import (
    connected_components,
    near_dup_components,
)
from fitness_nutrition_data_pipeline_spark.operators.dedup import lsh_bands, minhash_signatures


def test_two_components_and_chain(spark):
    # chain 1-2-3-4 (one component), pair 10-11, transitive via chain
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    out = {r.vertex: r.component for r in connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_long_path_converges(spark):
    # path 0-1-2-...-9: needs multiple propagation rounds
    edges = spark.createDataFrame([(i, i + 1) for i in range(9)], "src long, dst long")
    out = {r.vertex: r.component for r in connected_components(edges).collect()}
    assert set(out.values()) == {0}
    assert len(out) == 10


def test_near_dup_components_from_lsh(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sigs = minhash_signatures(docs, "doc_id", "text")
    bands = lsh_bands(sigs, "doc_id")
    comps = near_dup_components(bands, "doc_id")
    rows = comps.collect()
    assert len(rows) > 0
    # component label is always ≤ every member's id (min-label invariant)
    assert all(r.component <= r.doc_id for r in rows)
    # canonical members map to themselves
    canon = {r.component for r in rows}
    self_mapped = {r.doc_id for r in rows if r.doc_id == r.component}
    assert canon == self_mapped


def test_near_dup_pipeline_end_to_end(spark, sf_dir):
    """Composed MinHash→LSH→Jaccard pipeline: runs, bounded, and agrees
    with directly-computed Jaccard on its candidate pairs."""
    from fitness_nutrition_data_pipeline_spark.operators.dedup import near_dup_pipeline

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = near_dup_pipeline(docs, "doc_id", "text", threshold=0.5)
    rows = out.collect()
    assert len(rows) > 0
    assert all(0.0 <= r.jaccard <= 1.0 for r in rows)
    assert all((r.jaccard >= 0.5) == (r.is_near_dup == 1) for r in rows)
    # pairs are canonical-oriented (bucket min first)
    assert all(r.id_a < r.id_b for r in rows)


def test_dedup_clusters_bipartite_chain(spark):
    """Transitivity through shared buckets: 1~2 via x, 2~3 via y ⇒ one
    cluster labeled 1; isolated doc 10 keeps its own label."""
    from fitness_nutrition_data_pipeline_spark.operators.dedup import dedup_clusters

    mem = spark.createDataFrame(
        [(1, "x"), (2, "x"), (2, "y"), (3, "y"), (10, "z")],
        "doc_id long, bucket string",
    )
    out = {
        r.doc_id: r.cluster_id
        for r in dedup_clusters(mem, "doc_id", "bucket", iterations=3).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 10: 10}


def test_bipartite_clusters_refine_fixpoint_components(spark, sf_dir):
    """Bounded-round bipartite propagation (dedup_clusters, oracle-
    verifiable) must REFINE the true components (connected_components
    fixpoint): every bounded cluster sits inside one true component,
    and labels never cross components. The real sf0.001 LSH graph has
    duplicate chains longer than 3 bucket-hops, so equality does NOT
    hold — the bounded form under-merges, never over-merges."""
    from pyspark.sql import functions as F

    from fitness_nutrition_data_pipeline_spark.operators.dedup import dedup_clusters

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bands = lsh_bands(minhash_signatures(docs, "doc_id", "text"), "doc_id")
    membership = bands.select(
        "doc_id",
        F.concat(F.col("band_id").cast("string"), F.col("band_key")).alias("bucket"),
    )
    bip = {
        r.doc_id: r.cluster_id
        for r in dedup_clusters(
            membership, "doc_id", "bucket", iterations=3
        ).collect()
    }
    fixpoint = {
        r.doc_id: r.component
        for r in near_dup_components(bands, "doc_id").collect()
    }
    # every doc the fixpoint clusters is present in the bipartite result
    assert set(fixpoint) <= set(bip)
    for doc, cluster in bip.items():
        # label is a real doc in the same true component (or self)
        assert cluster <= doc
        if doc in fixpoint:
            assert fixpoint.get(cluster, cluster) == fixpoint[doc]
        else:
            assert cluster == doc  # singleton stays itself
    # refinement is strict here: chains longer than 3 hops exist
    shared = set(fixpoint)
    assert len({bip[d] for d in shared}) > len({fixpoint[d] for d in shared})


def test_cdc_chunks_shift_invariance(spark):
    """The CDC selling point: prepending one token re-hashes only the
    chunks up to the first content boundary; later chunk hashes are
    IDENTICAL, where any fixed-size blocking would shift every block."""
    from fitness_nutrition_data_pipeline_spark.operators.text import cdc_chunks

    base = " ".join(f"w{i % 37}q{i % 11}" for i in range(400))
    df = spark.createDataFrame(
        [(1, base), (2, "INSERTED " + base)], "doc_id long, text string"
    )
    chunks = cdc_chunks(df, "doc_id", "text", gram=4, mask=8).collect()
    h1 = {r.chunk_hash for r in chunks if r.doc_id == 1}
    h2 = {r.chunk_hash for r in chunks if r.doc_id == 2}
    assert h1 != h2  # docs differ
    shared = h1 & h2
    # the overwhelming majority of chunks survive the shift
    assert len(shared) >= 0.7 * len(h1), (len(shared), len(h1))


def test_star_cc_matches_fixpoint(spark):
    """Large-star/small-star must produce the identical (vertex,
    component) labeling as the min-label fixpoint on a mixed graph
    (cliques + chains + isolated pair)."""
    from fitness_nutrition_data_pipeline_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    edges = (
        [(i, i + 1) for i in range(40)]
        + [(100 + i, 100 + j) for i in range(5) for j in range(i + 1, 5)]
        + [(200, 201), (300, 301), (301, 302), (302, 300)]
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    fix = {
        (r.vertex, r.component)
        for r in connected_components(df, max_iterations=50).collect()
    }
    # default path: the edge state is tiny, so the r18 single-task
    # union-find finish is what actually runs here
    star = {
        (r.vertex, r.component) for r in connected_components_star(df).collect()
    }
    # local_finish_rows=0 forces the distributed star-alternation loop,
    # keeping it covered now that every test-sized graph takes the finish
    star_dist = {
        (r.vertex, r.component)
        for r in connected_components_star(df, local_finish_rows=0).collect()
    }
    assert fix == star
    assert fix == star_dist


def test_star_cc_logarithmic_rounds_on_chain(spark):
    """The reason the variant exists: a 120-hop duplicate CHAIN needs 119
    one-hop label-propagation rounds but must converge within 12
    star alternations (O(log n)) — pinned by capping max_rounds at 12
    and asserting the labeling is still exactly right."""
    from fitness_nutrition_data_pipeline_spark.operators.components import (
        connected_components_star,
    )

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(119)], "src long, dst long"
    )
    # local_finish_rows=0: the round bound is a property of the
    # DISTRIBUTED alternation; the small-state union-find finish would
    # otherwise absorb the chain in one task and prove nothing
    got = {
        r.vertex: r.component
        for r in connected_components_star(
            df, max_rounds=12, local_finish_rows=0
        ).collect()
    }
    assert got == {i: 0 for i in range(120)}


def test_star_cc_local_finish_gate_and_equivalence(spark):
    """The r18 small-state finish: at the default threshold a test-sized
    graph runs the single-task union-find (plan carries a MapInPandas
    node, zero star rounds); forcing local_finish_rows=0 runs the
    distributed loop (no Python node). Labels identical either way, on a
    graph mixing chains, a clique, string-ordering-sensitive cases not
    applicable (long ids)."""
    from fitness_nutrition_data_pipeline_spark.operators.components import (
        connected_components_star,
    )

    edges = (
        [(i, i + 1) for i in range(30)]
        + [(500 + i, 500 + j) for i in range(4) for j in range(i + 1, 4)]
        + [(900, 901)]
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    local = connected_components_star(df)
    dist = connected_components_star(df, local_finish_rows=0)
    assert "mapinpandas" in local._jdf.queryExecution().analyzed().toString().lower()
    assert (
        "mapinpandas"
        not in dist._jdf.queryExecution().analyzed().toString().lower()
    )
    assert {(r.vertex, r.component) for r in local.collect()} == {
        (r.vertex, r.component) for r in dist.collect()
    }


def test_star_cc_random_graphs_property(spark):
    """Property: on ANY graph, large-star/small-star labels equal the
    min-label fixpoint's AND equal a driver-side union-find ground truth
    (three independent implementations, one answer). Hypothesis drives
    random edge lists; union-find is pure Python, so a disagreement
    pinpoints which distributed variant broke."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from fitness_nutrition_data_pipeline_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    edge = st.tuples(
        st.integers(min_value=0, max_value=25),
        st.integers(min_value=0, max_value=25),
    ).filter(lambda e: e[0] != e[1])

    @settings(
        max_examples=5, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(st.lists(edge, min_size=1, max_size=25))
    def check(edges):
        # driver-side union-find ground truth
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        truth = {v: find(v) for v in parent}

        df = spark.createDataFrame(edges, "src long, dst long")
        star = {
            r.vertex: r.component
            for r in connected_components_star(df).collect()
        }
        fix = {
            r.vertex: r.component
            for r in connected_components(df, max_iterations=60).collect()
        }
        assert star == truth
        assert fix == truth

    check()


def test_star_cc_local_finish_preserves_huge_int64_ids(spark):
    """Regression (r18 review): vertex ids above 2^53 must survive the
    single-task finish exactly — a pandas float64 inference anywhere in
    the Arrow path would silently round them (xxhash64-derived ids live
    up there). Verified against a driver-side union-find ground truth."""
    from fitness_nutrition_data_pipeline_spark.operators.components import (
        connected_components_star,
    )

    base = 2**62
    # two components with adjacent huge ids that float64 would collapse
    edges = [
        (base + 1, base + 2),
        (base + 2, base + 3),
        (base + 10_001, base + 10_002),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.vertex: r.component for r in connected_components_star(df).collect()
    }
    assert got == {
        base + 1: base + 1,
        base + 2: base + 1,
        base + 3: base + 1,
        base + 10_001: base + 10_001,
        base + 10_002: base + 10_001,
    }
