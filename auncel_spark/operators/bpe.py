"""BPE tokenizer training: the iterative merge loop over a distributed
word-frequency table — the operator an LLM data pipeline actually runs
after ``bpe_pair_stats`` computes the seed statistics.

Scale shape (the reason this is NOT a driver-side algorithm): BPE
trains on the word-TYPE table (distinct words × corpus frequency), not
the corpus — at 100 TB the corpus is petabytes but the heavy-hitter
vocab is millions of rows, and each merge round is one pair-count
shuffle over that small table plus one narrow map. The driver holds
only the per-round argmax (a single row), exactly like Lloyd's
iterations hold only the centroids.

Greedy-merge trick shared with the SQL oracle: a word's symbol
sequence is encoded as a DOUBLE-separator string
``⸱⸱c1⸱⸱c2⸱⸱…cn⸱⸱`` (⸱ = chr(30)); merging pair (a, b) is then a
plain ``replace(s, '⸱a⸱⸱b⸱', '⸱ab⸱')``. Because consecutive
occurrences share only ONE of the two separators, left-to-right
non-overlapping ``replace`` semantics — identical in Spark and ANSI
SQL — implement exactly the BPE greedy re-tokenization (e.g. ``aaa``
under merge (a,a) → ``aa, a``, never ``a, aa`` or ``aa, aa``).

Reference surface: tokenizer seed statistics appear in the reference's
text tooling only as raw counts; the merge loop itself is the standard
Sennrich et al. 2016 algorithm (public knowledge), expressed
Spark-first."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SEP = "\x1e"
SEP2 = SEP + SEP


def word_freq(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) corpus word-type table — the BPE training input.
    One explode + one shuffle; everything after runs on word TYPES."""
    from auncel_spark.operators.dedup import tokens

    return (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _sym_encode(word_col: str = "w") -> F.Column:
    """word → double-separator symbol string (one char per symbol)."""
    return F.concat(
        F.lit(SEP2), F.regexp_replace(F.col(word_col), "(.)", "$1" + SEP2)
    )


def _pair_counts(wf: DataFrame) -> DataFrame:
    """Adjacent symbol-pair counts weighted by word frequency.
    0-based [] indexing in the SQL expr (Spark array subscript)."""
    syms = F.filter(F.split(F.col("s"), SEP2), lambda x: x != F.lit(""))
    return (
        wf.select("freq", syms.alias("sym"))
        .where(F.size("sym") >= 2)
        .select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(sym) - 2),"
                    " j -> struct(sym[j] AS a, sym[j + 1] AS b))"
                )
            ).alias("pr"),
        )
        .groupBy(F.col("pr.a").alias("a"), F.col("pr.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_train(
    words: DataFrame, n_merges: int, driver_max_types: int = 1_000_000
) -> list[tuple[str, str, int]]:
    """Run ``n_merges`` BPE iterations over a (w, freq) word table.
    Returns the learned merge list [(left, right, pair_count)], in
    merge order, tie-broken (count desc, left asc, right asc) so the
    result is deterministic and oracle-replayable. Stops early if no
    pair remains.

    Size routing (the connected-components pattern): a word-TYPE table
    at or below ``driver_max_types`` rows is trained in one driver
    pass over the SAME double-separator encoding — Python
    ``str.replace`` shares Spark/SQL's left-to-right non-overlapping
    semantics, so the merge list is identical by construction — which
    replaces 2 Spark jobs per merge round with zero. The distributed
    loop stays the default for vocabularies above the gate."""
    if (
        driver_max_types
        and words.limit(driver_max_types + 1).count() <= driver_max_types
    ):
        pdf = words.select("w", "freq").toPandas()
        enc = [
            (SEP2 + "".join(c + SEP2 for c in w), int(f))
            for w, f in zip(pdf["w"], pdf["freq"])
        ]
        merges: list[tuple[str, str, int]] = []
        for _ in range(n_merges):
            counts: dict[tuple[str, str], int] = {}
            for s, f in enc:
                sym = [x for x in s.split(SEP2) if x]
                for j in range(len(sym) - 1):
                    key = (sym[j], sym[j + 1])
                    counts[key] = counts.get(key, 0) + f
            if not counts:
                break
            (a, b), cnt = min(
                counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            merges.append((a, b, int(cnt)))
            pat = SEP + a + SEP2 + b + SEP
            rep = SEP + a + b + SEP
            enc = [(s.replace(pat, rep), f) for s, f in enc]
        return merges
    wf = words.select(_sym_encode("w").alias("s"), "freq").persist()
    wf.count()
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(n_merges):
            top = (
                _pair_counts(wf)
                .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
            merges.append((a, b, cnt))
            pat = SEP + a + SEP2 + b + SEP
            rep = SEP + a + b + SEP
            nxt = wf.select(
                F.replace(F.col("s"), F.lit(pat), F.lit(rep)).alias("s"), "freq"
            ).persist()
            nxt.count()
            wf.unpersist()
            wf = nxt
    finally:
        wf.unpersist()
    return merges


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge list to a corpus: (id, token) rows after
    replaying every merge in order — the tokenizer's encode step as a
    chain of narrow column expressions (no shuffle, no Python UDF)."""
    from auncel_spark.operators.dedup import tokens

    w = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("w")
    )
    s = _sym_encode("w")
    for a, b, _ in merges:
        s = F.replace(s, F.lit(SEP + a + SEP2 + b + SEP), F.lit(SEP + a + b + SEP))
    syms = F.filter(F.split(s, SEP2), lambda x: x != F.lit(""))
    return w.select("id", F.explode(syms).alias("token"))
