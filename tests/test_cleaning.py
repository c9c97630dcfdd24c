"""Unit tests for the cleaning Column expressions (SURVEY §2.6 F1-F3, P5)."""


from fitness_nutrition_data_pipeline_spark.config import FITNESS_GOALS
from fitness_nutrition_data_pipeline_spark.functions.cleaning import (
    clean_text_list,
    normalize_columns,
    null_out_of_range,
    standardize_fitness_goal,
    strip_units,
)


def _vals(spark, expr, data, dtype="string"):
    df = spark.createDataFrame([(d,) for d in data], f"v {dtype}")
    return [r.out for r in df.select(expr.alias("out")).collect()]


def test_clean_text_list(spark):
    out = _vals(
        spark,
        clean_text_list("v"),
        [
            "Squats, deadlifts, bench presses, and overhead presses",
            "A and B",
            "one,two\nthree",
            " , ,",
            None,
        ],
    )
    assert out[0] == ["squats", "deadlifts", "bench presses", "overhead presses"]
    assert out[1] == ["a", "b"]
    assert out[2] == ["one", "two", "three"]
    assert out[3] == []
    assert out[4] == []


def test_strip_units(spark):
    out = _vals(spark, strip_units("v"), ["0.26 g", "9.00 mg", "0.00 IU", "0.1g", "381", "abc", None])
    assert out == [0.26, 9.0, 0.0, 0.1, 381.0, None, None]


def test_standardize_fitness_goal(spark):
    out = _vals(
        spark,
        standardize_fitness_goal("v", FITNESS_GOALS),
        ["Weight Loss", "Weight Gain", "Cardio", "Yoga", "wellness", None],
    )
    # Weight Gain hits 'gain' → build_muscle (FIXTURES §7 note); Yoga matches
    # nothing → default; None → default.
    assert out == [
        "lose_weight",
        "build_muscle",
        "endurance",
        "maintain_health",
        "maintain_health",
        "maintain_health",
    ]


def test_first_match_wins_order(spark):
    # 'lose weight build muscle' contains keywords of two buckets — dict
    # order must win (lose_weight first).
    out = _vals(spark, standardize_fitness_goal("v", FITNESS_GOALS), ["lose weight build muscle"])
    assert out == ["lose_weight"]


def test_null_out_of_range_exclusive(spark):
    out = _vals(spark, null_out_of_range("v", 10, 60), [10.0, 10.01, 59.99, 60.0, 22.5, None], "double")
    assert out == [None, 10.01, 59.99, None, 22.5, None]


def test_normalize_columns(spark):
    df = spark.createDataFrame([(1, 2.0)], ["Weight (kg)", "Fitness Goal"])
    assert normalize_columns(df).columns == ["weight_(kg)", "fitness_goal"]


def test_chunk_documents_matches_closed_form(spark):
    """The executable chunker must agree with rag_chunk_plan's
    closed-form accounting on every invariant: chunk counts, full
    coverage, fixed-size non-final chunks, emitted-token identity,
    and lossless reconstruction with the overlap removed."""
    from pyspark.sql import functions as F

    from fitness_nutrition_data_pipeline_spark.operators.text import chunk_documents

    texts = [
        (1, " ".join(f"t{i}" for i in range(200))),   # multi-chunk
        (2, " ".join(f"u{i}" for i in range(64))),    # exactly one window
        (3, "single"),                                # tiny
        (4, " ".join(f"v{i}" for i in range(65))),    # one past the window
        (5, ""),                                      # empty -> no chunks
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    out = chunk_documents(df, size=64, stride=48).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 5 not in by_doc

    def closed_form(toks):
        if toks == 0:
            return 0
        if toks <= 64:
            return 1
        return 1 + -(-(toks - 64) // 48)

    for doc_id, text in texts:
        toks = [t for t in text.lower().split() if t]
        chunks = sorted(by_doc.get(doc_id, []), key=lambda r: r.chunk_id)
        assert len(chunks) == closed_form(len(toks)), doc_id
        if not chunks:
            continue
        # all but the last chunk are exactly `size` tokens
        assert all(c.n_tokens == 64 for c in chunks[:-1])
        # emitted = original + overlap * (chunks - 1)
        assert sum(c.n_tokens for c in chunks) == len(toks) + 16 * (
            len(chunks) - 1
        )
        # reconstruction: first chunk whole, then drop the 16-token
        # overlap from each subsequent chunk
        rebuilt = chunks[0].chunk_text.split()
        for c in chunks[1:]:
            rebuilt += c.chunk_text.split()[16:]
        assert rebuilt == toks, doc_id
