"""SQL scalar-function surface == the Python Column builders."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_sql_functions_match_column_builders(spark):
    from auncel_spark.functions.sql import register_sql_functions
    from auncel_spark.operators.bloom import bloom_bit
    from auncel_spark.operators.sampling import sample_bucket

    names = register_sql_functions(spark)
    assert "l2sq" in names

    a, b = [1.0, 2.0, 3.0], [0.5, -1.0, 2.0]
    row = spark.sql(
        f"""SELECT l2sq(array({a[0]}F,{a[1]}F,{a[2]}F), array({b[0]}F,{b[1]}F,{b[2]}F)) AS l2,
               inner_prod(array({a[0]}F,{a[1]}F,{a[2]}F), array({b[0]}F,{b[1]}F,{b[2]}F)) AS ip,
               cosine_sim(array({a[0]}F,{a[1]}F,{a[2]}F), array({b[0]}F,{b[1]}F,{b[2]}F)) AS cos,
               vec_norm(array(3.0F, 4.0F)) AS nrm,
               hamming64(5, 3) AS hd,
               tok_count('  The quick  brown fox ') AS tc,
               word_ngrams('a b c d', 3) AS ng,
               sample_bucket(12345) AS sb,
               bloom_bit('hello world', 1, 65536) AS bb"""
    ).collect()[0]
    l2 = sum((x - y) ** 2 for x, y in zip(a, b))
    ip = sum(x * y for x, y in zip(a, b))
    assert abs(row["l2"] - l2) < 1e-9
    assert abs(row["ip"] - ip) < 1e-9
    assert abs(row["cos"] - ip / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))) < 1e-9
    assert row["nrm"] == 5.0
    assert row["hd"] == 2  # 0b101 ^ 0b011 = 0b110
    assert row["tc"] == 4
    assert row["ng"] == ["a b c", "b c d"]

    # cross-check against the Python builders on a tiny frame
    df = spark.createDataFrame([(12345, "hello world")], "id bigint, text string")
    py = df.select(
        sample_bucket("id").alias("sb"),
        (F.conv(F.substring(F.md5(F.concat_ws("#", F.col("text"), F.lit("1"))), 1, 15), 16, 10)
         .cast("bigint") % 65536).alias("bb"),
    ).collect()[0]
    assert row["sb"] == py["sb"] and row["bb"] == py["bb"]
    # bloom_bit builder itself agrees
    bb2 = df.select(bloom_bit(F.col("text"), 1, 65536)).collect()[0][0]
    assert row["bb"] == bb2


def test_sql_functions_run_over_tables(spark):
    """A SQL-only user can run a curation + similarity query with the
    registered macros over the fixture tables."""
    from auncel_spark.functions.sql import register_sql_functions

    register_sql_functions(spark)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").createOrReplaceTempView(
        "docs_v"
    )
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").createOrReplaceTempView(
        "emb_v"
    )
    r = spark.sql(
        """SELECT count(*) AS n FROM docs_v
           WHERE tok_count(text) > 10 AND sample_bucket(doc_id) < 2147483648"""
    ).collect()[0]
    assert 0 < r["n"] <= 500
    s = spark.sql(
        """SELECT e1.vec_id, cosine_sim(e1.embedding, e2.embedding) AS cs
           FROM emb_v e1 JOIN emb_v e2 ON e2.vec_id = 0 AND e1.vec_id < 5"""
    ).collect()
    assert len(s) == 5 and all(-1.0 - 1e-9 <= x["cs"] <= 1.0 + 1e-9 for x in s)


def test_as_matrix_matches_legacy_decode():
    """as_matrix must be value-identical to np.array(list(...), float64)
    for every cell type the kernels see: float32 ndarrays (Arrow), lists
    (driver-built frames), and the empty batch."""
    import numpy as np
    import pandas as pd

    from auncel_spark.functions.vector import as_matrix

    base = np.arange(60, dtype=np.float32).reshape(12, 5) / 7.0
    s = pd.Series([base[i] for i in range(12)])
    assert np.array_equal(as_matrix(s), np.array(list(s), dtype=np.float64))
    assert as_matrix(s).dtype == np.float64

    lists = pd.Series([[1.25, -2.5], [3.0, 4.125]])
    assert np.array_equal(as_matrix(lists), np.array(list(lists), dtype=np.float64))

    empty = pd.Series([], dtype=object)
    assert as_matrix(empty).shape == (0,)
