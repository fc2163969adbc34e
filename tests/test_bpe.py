"""BPE merge-loop semantics on hand-built corpora (the catalog oracle
harness covers fixture parity; these pin greedy-merge behavior)."""

from __future__ import annotations


def test_bpe_train_hand_corpus(spark):
    from auncel_spark.operators.bpe import bpe_train, word_freq

    # corpus: 'low' x5, 'lower' x2, 'newest' x6, 'widest' x3  (the
    # Sennrich et al. toy example shape)
    rows = (
        [("low",)] * 5 + [("lower",)] * 2 + [("newest",)] * 6 + [("widest",)] * 3
    )
    df = spark.createDataFrame(
        [(i, t) for i, (t,) in enumerate(rows)], "doc_id bigint, text string"
    )
    merges = bpe_train(word_freq(df, "text"), 4)
    # pair counts: es=9 (newest6+widest3), st=9, we=8(lower2+newest6... )
    # first merge ties (e,s)=9 with (s,t)=9 -> lexicographic (e,s)
    assert merges[0][:2] == ("e", "s") and merges[0][2] == 9
    # after merging es: (es,t)=9 is top
    assert merges[1][:2] == ("es", "t") and merges[1][2] == 9
    # then (l,o)=7 (low5+lower2)
    assert merges[2][:2] == ("l", "o") and merges[2][2] == 7
    # then (lo,w)=7
    assert merges[3][:2] == ("lo", "w") and merges[3][2] == 7


def test_bpe_greedy_overlap(spark):
    """'aaaa' under merge (a,a) must re-tokenize to aa,aa and 'aaa' to
    aa,a — left-to-right non-overlapping greedy, not pair recount."""
    from auncel_spark.operators.bpe import bpe_segment, bpe_train, word_freq

    df = spark.createDataFrame(
        [(0, "aaaa"), (1, "aaa")], "doc_id bigint, text string"
    )
    merges = bpe_train(word_freq(df, "text"), 1)
    # pairs: 'aaaa' has 3 (a,a), 'aaa' has 2 -> cnt 5
    assert merges == [("a", "a", 5)]
    seg = bpe_segment(df, merges)
    got = sorted((r["id"], r["token"]) for r in seg.collect())
    assert got == [(0, "aa"), (0, "aa"), (1, "a"), (1, "aa")] or got == [
        (0, "aa"),
        (0, "aa"),
        (1, "aa"),
        (1, "a"),
    ]


def test_bpe_segment_applies_merges_in_order(spark):
    from auncel_spark.operators.bpe import bpe_segment

    df = spark.createDataFrame([(7, "abab xy")], "doc_id bigint, text string")
    toks = {
        r["token"]
        for r in bpe_segment(df, [("a", "b", 0), ("ab", "ab", 0)]).collect()
    }
    assert toks == {"abab", "x", "y"}
