"""ExactSubstr-style duplicate-span extraction and removal
(operators/spans.py; Lee et al., ACL 2022)."""

import numpy as np
import pytest

from datacontract_cli_spark.operators.spans import (
    duplicate_spans,
    remove_duplicate_spans,
)

PASSAGE = ("this exact boilerplate passage is repeated verbatim across "
           "several documents in the corpus and must be cut once ")


def _docs(spark):
    rng = np.random.default_rng(4)

    def noise(n):
        return " ".join("w%04d" % v for v in rng.integers(0, 9999, n))

    rows = [
        (1, noise(40) + " " + PASSAGE + noise(40)),   # first: survives
        (5, noise(30) + " " + PASSAGE + noise(50)),   # later: cut
        (9, PASSAGE + noise(60)),                     # later: cut (at 0)
        (20, noise(80)),                              # unrelated
        (30, noise(75)),                              # unrelated
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicate_spans_exact_offsets(spark):
    df = _docs(spark)
    spans = duplicate_spans(df, min_len=len(PASSAGE) - 10).collect()
    got = {(r["id_a"], r["id_b"]) for r in spans}
    assert got == {(1, 5), (1, 9), (5, 9)}
    for r in spans:
        a_txt = df.filter(f"doc_id = {r['id_a']}").first()["text"]
        b_txt = df.filter(f"doc_id = {r['id_b']}").first()["text"]
        frag = a_txt[r["start_a"]:r["start_a"] + r["length"]]
        assert frag == b_txt[r["start_b"]:r["start_b"] + r["length"]]
        assert PASSAGE in frag or frag in PASSAGE


def test_remove_duplicate_spans_keep_first(spark):
    df = _docs(spark)
    spans = duplicate_spans(df, min_len=len(PASSAGE) - 10)
    out = {r["doc_id"]: r for r in
           remove_duplicate_spans(df, spans).collect()}
    orig = {r["doc_id"]: r["text"] for r in df.collect()}

    # the lowest-id occurrence survives verbatim
    assert out[1]["text"] == orig[1]
    assert out[1]["n_removed_chars"] == 0
    # later docs lose the passage (and only it, modulo boundary slack)
    for d in (5, 9):
        assert PASSAGE not in out[d]["text"]
        assert out[d]["n_removed_chars"] >= len(PASSAGE) - 10
        assert len(out[d]["text"]) \
            == len(orig[d]) - out[d]["n_removed_chars"]
    # unrelated docs untouched
    for d in (20, 30):
        assert out[d]["text"] == orig[d]
        assert out[d]["n_removed_chars"] == 0


def test_collapse_repeated_lines(spark):
    """Within-doc consecutive duplicates collapse; non-adjacent repeats,
    empty lines and single-line docs are preserved."""
    from datacontract_cli_spark.operators.lines import (
        collapse_repeated_lines,
    )

    df = spark.createDataFrame(
        [(1, "a\na\na\nb\nb\na"), (2, "only one line"),
         (3, "x\n\n\nx"), (4, None)],
        "doc_id long, text string")
    got = {r["doc_id"]: r["text"]
           for r in collapse_repeated_lines(df).collect()}
    assert got[1] == "a\nb\na"        # non-adjacent repeat survives
    assert got[2] == "only one line"
    assert got[3] == "x\n\nx"         # empty lines collapse too
    assert got[4] is None


def test_overlapping_cuts_merge(spark):
    # two pairs cut overlapping regions of doc 9; the rewrite must merge
    # the intervals instead of double-cutting
    df = _docs(spark)
    spans = duplicate_spans(df, min_len=40)
    out = {r["doc_id"]: r for r in
           remove_duplicate_spans(df, spans).collect()}
    d9 = out[9]
    assert d9["n_removed_chars"] <= len(df.filter("doc_id = 9")
                                        .first()["text"])
    assert PASSAGE not in d9["text"]


def test_duplicate_spans_periodic_passage(spark):
    """An internally periodic duplicated passage yields ONE distinct
    winnowing fingerprint — the default min_shared must still examine
    its pair (the superset guarantee)."""
    rng = np.random.default_rng(9)

    def noise(n):
        return " ".join("q%04d" % v for v in rng.integers(0, 9999, n))

    periodic = "=" * 48
    df = spark.createDataFrame(
        [(1, noise(30) + " " + periodic + " " + noise(30)),
         (2, periodic + " " + noise(50))],
        "doc_id long, text string")
    spans = duplicate_spans(df, min_len=40).collect()
    assert {(r["id_a"], r["id_b"]) for r in spans} == {(1, 2)}


def test_gopher_repetition_hand_computed(spark):
    from datacontract_cli_spark.operators.textstats import gopher_repetition

    rows = [
        (1, "a b\na b\nc d"),    # 2/3 dup lines; "a b" x2 of 5 bigrams
        (2, "unique one\nother"),
        (3, ""),
        (4, "x y x y x y"),      # "x y" x3
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_repetition(df).collect()}
    assert got[1]["dup_line_frac"] == pytest.approx(2 / 3)
    assert got[1]["dup_line_char_frac"] == pytest.approx(6 / 9)
    assert got[1]["top_bigram_char_frac"] == pytest.approx(6 / 11)
    assert got[2]["dup_line_frac"] == 0.0
    # count tie -> lexicographically greatest gram ("unique one", 10ch)
    assert got[2]["top_bigram_char_frac"] == pytest.approx(10 / 16)
    assert got[3]["dup_line_frac"] == 0.0
    assert got[3]["top_bigram_char_frac"] == 0.0
    assert got[4]["top_bigram_char_frac"] == pytest.approx(9 / 11)
