"""Pure-SQL function surface: the engine's core scalar expressions
installed as Spark 4 SQL scalar functions (``CREATE TEMPORARY
FUNCTION … RETURN <expr>``), so a SQL-only user can run vector and
text-curation queries with no Python in the loop — the macro bodies
are Catalyst expressions, codegen'd like any built-in (NOT Python
UDFs; this is the opposite of the slow path).

``register_sql_functions(spark)`` is idempotent (CREATE OR REPLACE)
and session-scoped. The definitions mirror the Column builders in
``functions/vector.py`` / ``functions/text.py`` /
``operators/sampling.py`` exactly — tests pin the equivalence."""

from __future__ import annotations

from pyspark.sql import SparkSession

_DDL: list[str] = [
    # -- vector math (float64 accumulation, like the batch kernels) --
    """CREATE OR REPLACE TEMPORARY FUNCTION l2sq(a ARRAY<FLOAT>, b ARRAY<FLOAT>)
RETURNS DOUBLE RETURN
aggregate(zip_with(a, b, (x, y) -> CAST(x - y AS DOUBLE) * CAST(x - y AS DOUBLE)),
          CAST(0 AS DOUBLE), (acc, v) -> acc + v)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION inner_prod(a ARRAY<FLOAT>, b ARRAY<FLOAT>)
RETURNS DOUBLE RETURN
aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
          CAST(0 AS DOUBLE), (acc, v) -> acc + v)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION vec_norm(a ARRAY<FLOAT>)
RETURNS DOUBLE RETURN
sqrt(aggregate(a, CAST(0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION cosine_sim(a ARRAY<FLOAT>, b ARRAY<FLOAT>)
RETURNS DOUBLE RETURN inner_prod(a, b) / (vec_norm(a) * vec_norm(b))""",
    # -- binary sketches --
    """CREATE OR REPLACE TEMPORARY FUNCTION hamming64(a BIGINT, b BIGINT)
RETURNS INT RETURN bit_count(a ^ b)""",
    # -- text curation --
    """CREATE OR REPLACE TEMPORARY FUNCTION tok_count(t STRING)
RETURNS INT RETURN size(split(lower(trim(t)), '\\\\s+'))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION word_ngrams(t STRING, n INT)
RETURNS ARRAY<STRING> RETURN
CASE WHEN size(split(lower(trim(t)), '\\\\s+')) >= n THEN
  transform(sequence(0, size(split(lower(trim(t)), '\\\\s+')) - n),
            i -> concat_ws(' ', slice(split(lower(trim(t)), '\\\\s+'), i + 1, n)))
ELSE array() END""",
    # -- deterministic sampling (operators/sampling.py LCG) --
    """CREATE OR REPLACE TEMPORARY FUNCTION sample_bucket(id BIGINT)
RETURNS BIGINT RETURN pmod(pmod(id, 4294967296) * 1103515245 + 12345, 4294967296)""",
    # -- bloom hash family (operators/bloom.py) --
    """CREATE OR REPLACE TEMPORARY FUNCTION bloom_bit(v STRING, seed INT, m BIGINT)
RETURNS BIGINT RETURN
pmod(CAST(conv(substring(md5(concat_ws('#', v, CAST(seed AS STRING))), 1, 15), 16, 10) AS BIGINT), m)""",
]

FUNCTION_NAMES = (
    "l2sq",
    "inner_prod",
    "vec_norm",
    "cosine_sim",
    "hamming64",
    "tok_count",
    "word_ngrams",
    "sample_bucket",
    "bloom_bit",
)


def register_sql_functions(spark: SparkSession) -> tuple[str, ...]:
    """Install the SQL function surface into the session; returns the
    registered names."""
    for ddl in _DDL:
        spark.sql(ddl)
    return FUNCTION_NAMES
