"""kmeans_lloyd_step: assignment + mean-recompute semantics."""

from pyspark.sql import functions as F

from fitness_nutrition_data_pipeline_spark.operators.similarity import (
    kmeans_lloyd_step,
)


def test_lloyd_step_means_and_counts(spark):
    """Two well-separated direction clusters: members assign to the
    nearest centroid by cosine and the new centroid is the element-wise
    mean of its members."""
    vecs = spark.createDataFrame(
        [
            (10, [1.0, 0.0]),
            (11, [0.8, 0.2]),
            (20, [0.0, 1.0]),
            (21, [0.2, 0.8]),
            (22, [0.0, 2.0]),
        ],
        "vec_id long, vec array<double>",
    )
    cents = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, vec array<double>"
    )
    out = kmeans_lloyd_step(vecs, cents, "vec_id", "vec").collect()
    by_cd = {(r.centroid_id, r.i): r for r in out}
    assert by_cd[(1, 0)].n_assigned == 2
    assert by_cd[(2, 0)].n_assigned == 3
    assert abs(by_cd[(1, 0)].new_comp - 0.9) < 1e-12  # mean(1.0, 0.8)
    assert abs(by_cd[(1, 1)].new_comp - 0.1) < 1e-12  # mean(0.0, 0.2)
    assert abs(by_cd[(2, 1)].new_comp - (1.0 + 0.8 + 2.0) / 3) < 1e-12


def test_lloyd_step_iterates_toward_cluster_means(spark):
    """Feeding the recomputed centroids back in reassigns nothing once
    clusters are stable — drift goes to zero (fixpoint)."""
    vecs = spark.createDataFrame(
        [(i, [1.0 + 0.01 * i, 0.0]) for i in range(5)]
        + [(i, [0.0, 1.0 + 0.01 * i]) for i in range(10, 15)],
        "vec_id long, vec array<double>",
    )
    cents = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, vec array<double>"
    )
    step1 = kmeans_lloyd_step(vecs, cents, "vec_id", "vec")
    new_cents = (
        step1.groupBy("centroid_id")
        .agg(F.sort_array(F.collect_list(F.struct("i", "new_comp"))).alias("s"))
        .select(
            F.col("centroid_id").alias("vec_id"),
            F.transform("s", lambda x: x["new_comp"]).alias("vec"),
        )
    )
    step2 = kmeans_lloyd_step(vecs, new_cents, "vec_id", "vec").collect()
    assert {r.n_assigned for r in step2} == {5}
    # stable assignment ⇒ identical means in round 2
    m1 = {(r.centroid_id, r.i): r.new_comp for r in step1.collect()}
    m2 = {(r.centroid_id, r.i): r.new_comp for r in step2}
    assert all(abs(m1[k] - m2[k]) < 1e-12 for k in m1)


def test_hyperplane_lsh_seeds_are_independent_tables(spark):
    """Different seeds must derive different hyperplanes (bucket layouts
    differ for at least one vector) — the amplification premise."""
    from fitness_nutrition_data_pipeline_spark.operators.similarity import (
        random_hyperplane_lsh,
    )

    df = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 5) - 2.0 for j in range(16)]) for i in range(20)],
        "id long, vec array<double>",
    )
    h = {
        r.id: r.bucket_id
        for r in random_hyperplane_lsh(df, "id", "vec", n_planes=8, dim=16).collect()
    }
    g = {
        r.id: r.bucket_id
        for r in random_hyperplane_lsh(
            df, "id", "vec", n_planes=8, dim=16, seed="g"
        ).collect()
    }
    assert set(h) == set(g)
    assert any(h[i] != g[i] for i in h)


def test_pca_power_iteration_finds_dominant_direction(spark, sf_dir):
    """On the real corpus: the registered single-step estimate must be a
    unit vector; on synthetic data with one dominant axis, iterating the
    X^T(Xv) step aligns v with that axis."""
    import math

    from pyspark.sql import functions as F

    from fitness_nutrition_data_pipeline_spark.queries import all_specs

    out = all_specs()["pca_power_iteration"].builder(spark, sf_dir).collect()
    assert len(out) == 64
    norm = math.sqrt(sum(r.v1_comp**2 for r in out))
    assert abs(norm - 1.0) < 1e-3  # rounded components, unit norm

    # synthetic: variance concentrated on axis 0
    rows = [(i, [float(3 * ((i * 7) % 5 - 2)), 0.1 * ((i * 3) % 3 - 1), 0.05])
            for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, emb array<double>")
    vecs = df.select("vec_id", F.posexplode("emb").alias("i", "x"))
    v = {0: 0.5, 1: 0.5, 2: 0.7}  # arbitrary non-degenerate start
    for _ in range(3):
        vdf = spark.createDataFrame(list(v.items()), "i int, v double")
        xv = (
            vecs.join(vdf, "i")
            .groupBy("vec_id")
            .agg(F.sum(F.col("x") * F.col("v")).alias("dot"))
        )
        s = {
            r.i: r.sd
            for r in vecs.join(xv, "vec_id")
            .groupBy("i")
            .agg(F.sum(F.col("x") * F.col("dot")).alias("sd"))
            .collect()
        }
        n = math.sqrt(sum(x * x for x in s.values()))
        v = {i: x / n for i, x in s.items()}
    assert abs(abs(v[0]) - 1.0) < 0.01  # aligned with the dominant axis
    assert abs(v[1]) < 0.1 and abs(v[2]) < 0.1


def test_prefix_filter_join_exact_vs_bruteforce(spark):
    """The zero-false-negative claim: on seeded random corpora the
    prefix-filtered join must return EXACTLY the pairs a brute-force
    all-pairs shingle-Jaccard finds at the threshold — no misses (the
    pigeonhole prefix bound is the load-bearing step) and no extras
    (the verify stage is exact)."""
    import random

    from fitness_nutrition_data_pipeline_spark.operators.dedup import (
        prefix_filter_join,
    )

    def shingles(text, n=3):
        toks = text.lower().split()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    for seed in (7, 41, 1234):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(30)]
        docs = []
        for i in range(40):
            base = [rng.choice(vocab) for _ in range(rng.randint(4, 18))]
            docs.append((i, " ".join(base)))
            # planted near-dups: light edits of an earlier doc
            if i % 5 == 0 and i > 0:
                edited = list(docs[i - 1][1].split())
                edited[rng.randrange(len(edited))] = rng.choice(vocab)
                docs.append((100 + i, " ".join(edited)))

        expected = set()
        for ai in range(len(docs)):
            for bi in range(ai + 1, len(docs)):
                ida, ta = docs[ai]
                idb, tb = docs[bi]
                sa, sb = shingles(ta), shingles(tb)
                if not sa or not sb:
                    continue
                j = len(sa & sb) / len(sa | sb)
                if j >= 0.5:
                    expected.add((min(ida, idb), max(ida, idb)))

        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            (r.doc_a, r.doc_b)
            for r in prefix_filter_join(df, "doc_id", "text", threshold=0.5).collect()
        }
        assert got == expected, f"seed {seed}: {got ^ expected}"
