"""Decontamination (n-gram train/eval overlap) and sequence packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from auncel_spark.operators.decontaminate import decontaminate, ngram_overlap
from auncel_spark.operators.packing import pack_sequences, packing_stats

SF_DIR = "/root/testdata/sf0.01"


def test_ngram_overlap_planted(spark):
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "totally unrelated words here nothing shared"),
            (3, "prefix junk alpha beta gamma delta suffix"),
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta something else")], ["doc_id", "text"]
    )
    got = {
        (r["train_doc_id"], r["eval_doc_id"]): r["n_shared"]
        for r in ngram_overlap(train, ev, n=4).collect()
    }
    # doc1 shares 'alpha beta gamma delta' (1 distinct 4-gram); doc3 too
    assert got == {(1, 100): 1, (3, 100): 1}


def test_ngram_overlap_counts_distinct_shingles(spark):
    train = spark.createDataFrame(
        [(1, "a b c d e f")], ["doc_id", "text"]
    )
    ev = spark.createDataFrame([(9, "a b c d e f")], ["doc_id", "text"])
    got = ngram_overlap(train, ev, n=3).collect()
    assert len(got) == 1 and got[0]["n_shared"] == 4  # abc bcd cde def


def test_decontaminate_drops_flagged(spark):
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "clean document with no overlap at all"),
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame([(100, "alpha beta gamma delta")], ["doc_id", "text"])
    kept = [r["doc_id"] for r in decontaminate(train, ev, n=4).collect()]
    assert kept == [2]


def test_overlap_uses_broadcast_join(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ev = docs.where("source = 'src0'")
    tr = docs.where("source <> 'src0'")
    plan = (
        ngram_overlap(tr, ev, n=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_pack_invariants(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    budget = 512
    packed = pack_sequences(docs, budget).toPandas()
    assert len(packed) == docs.count()
    assert ((packed["offset_in_seq"] >= 0) & (packed["offset_in_seq"] < budget)).all()
    total = int(packed["n_tokens"].sum())
    # contiguous fill: offsets reconstruct the exclusive cumsum exactly
    glob = (budget * packed["seq_id"] + packed["offset_in_seq"]).sort_values().to_numpy()
    import numpy as np

    order = packed.assign(g=budget * packed["seq_id"] + packed["offset_in_seq"]).sort_values("g")
    cums = np.concatenate([[0], order["n_tokens"].cumsum().to_numpy()[:-1]])
    assert (order["g"].to_numpy() == cums).all()
    assert glob[-1] + int(order["n_tokens"].iloc[-1]) == total
    # last start-offset lands in the last started sequence
    assert int(packed["seq_id"].max()) == int(glob[-1]) // budget


def test_pack_deterministic(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = sorted(map(tuple, pack_sequences(docs, 256).toPandas().itertuples(index=False)))
    b = sorted(map(tuple, pack_sequences(docs, 256).toPandas().itertuples(index=False)))
    assert a == b


def test_pack_no_single_partition_window(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (
        pack_sequences(docs, 512)._jdf.queryExecution().executedPlan().toString()
    )
    # the global cumsum must NOT serialize through one task
    assert "SinglePartition" not in plan


def test_packing_stats(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    packed = pack_sequences(docs, 512)
    st = packing_stats(packed, 512)
    assert st.agg(F.sum("n_docs")).collect()[0][0] == docs.count()
