"""Streaming exact dedup == batch distinct across micro-batches:
first-arrival-wins state must suppress re-arrivals in later ingests."""

from __future__ import annotations


def test_stream_exact_dedup_across_batches(spark, tmp_path):
    from auncel_spark.streaming.dedup import stream_exact_dedup

    mk = lambda rows: spark.createDataFrame(rows, "doc_id bigint, text string")  # noqa: E731
    batch1 = mk([(i, f"doc {i % 30}") for i in range(60)])  # 30 distinct, each twice
    batch2 = mk(
        [(100 + i, f"doc {i}") for i in range(40)]  # 0-29 already seen, 30-39 new
    )

    sdir, out, ck = (str(tmp_path / p) for p in ("src", "out", "ck"))
    batch1.write.parquet(sdir)
    q = stream_exact_dedup(spark, sdir, "doc_id bigint, text string", out, ck)
    q.awaitTermination(120)
    batch2.write.mode("append").parquet(sdir)
    q2 = stream_exact_dedup(spark, sdir, "doc_id bigint, text string", out, ck)
    q2.awaitTermination(120)

    got = spark.read.parquet(out).collect()
    texts = [r["text"] for r in got]
    # one row per distinct text over BOTH ingests
    assert sorted(texts) == sorted({f"doc {i}" for i in range(40)})
    # cross-batch suppression: every batch-1 text kept its batch-1 row
    ids = {r["text"]: r["doc_id"] for r in got}
    assert all(ids[f"doc {i}"] < 100 for i in range(30))
    assert all(ids[f"doc {i}"] >= 100 for i in range(30, 40))
