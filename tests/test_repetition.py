"""Repetition signals (ext/textstats.py::repetition_signals): known
hand-computed values plus the short-doc edges (the sequence(1,0)
descending-array pitfall lives exactly there)."""

from __future__ import annotations

from scala_data_pipeline_spark.ext.textstats import repetition_signals


def _by_id(df):
    return {r.doc_id: r for r in df.collect()}


def test_known_values(spark):
    rows = [
        # "ab ab ab": 2-grams = ["ab ab", "ab ab"] -> top count 2,
        # chars(gram) = 4, total chars = 6 -> frac = 8/6
        (1, "ab ab ab"),
        # no repeated 2-gram: top count 1; 5-gram dup needs >= 6 tokens
        (2, "a b c d e f"),
        # "x y x y x y x y x y": "x y"/"y x" runs; 10 tokens, chars 10;
        # 2-grams: x y (5 times), y x (4) -> top2 = "x y", cnt 5,
        # chars 2 -> frac 10/10 = 1.0; 5-grams: "x y x y x" x3,
        # "y x y x y" x3 -> dup chars = 3*5 + 3*5 = 30 -> weight 3.0
        (3, "x y x y x y x y x y"),
    ]
    out = _by_id(repetition_signals(spark.createDataFrame(rows, ["doc_id", "text"])))
    r1 = out[1]
    assert (r1.top2_gram, r1.top2_count) == ("ab ab", 2)
    assert r1.top2_char_frac == 8 / 6
    r2 = out[2]
    assert r2.top2_count == 1 and r2.dup5_chars == 0
    r3 = out[3]
    assert (r3.top2_gram, r3.top2_count, r3.top2_char_frac) == ("x y", 5, 1.0)
    assert (r3.dup5_chars, r3.dup5_char_weight) == (30, 3.0)


def test_tie_breaks_to_smallest_gram(spark):
    # "b c b c a d a d": "b c" x2, "a d" x2 (+ singles) -> tie at 2,
    # lexicographically smallest wins: "a d"
    rows = [(1, "b c b c a d a d")]
    out = _by_id(repetition_signals(spark.createDataFrame(rows, ["doc_id", "text"])))
    assert (out[1].top2_gram, out[1].top2_count) == ("a d", 2)


def test_short_docs(spark):
    rows = [(1, ""), (2, "one"), (3, "one two"), (4, "a b c d")]
    out = _by_id(repetition_signals(spark.createDataFrame(rows, ["doc_id", "text"])))
    assert out[1].n_tokens == 0 and out[1].top2_gram is None
    assert out[1].top2_char_frac == 0.0 and out[1].dup5_char_weight == 0.0
    assert out[2].top2_count == 0  # one token -> no 2-grams
    assert out[3].top2_count == 1 and out[3].top2_gram == "one two"
    assert out[4].dup5_chars == 0  # 4 tokens -> no 5-grams at all
