"""Word-level tokenizer: deterministic vocab + text -> token-id arrays.

The bridge between the text-curation family and the engine's native
token-table shape ``(doc_id, tokens:array<int>, n_tok:int, source)`` —
the pre-tokenized input every rollup / segmentation / matcher operator
consumes. A curated text corpus runs through :func:`build_vocab` +
:func:`encode_text` and lands in exactly that schema, so the curation
output IS the training table (``corpus_job --vocab-size``).

Determinism is the contract: ids are assigned by ``(count DESC, token
ASC)`` rank — same corpus, same vocab, byte-identical token arrays on
re-run or task retry. Reserved ids: ``0 = <unk>`` (out-of-vocab),
``1 = <eos>`` (optional document terminator); real words start at 2.

Scale shape:

* :func:`build_vocab` — one hash agg on the word (map-side partial
  combine ships (word, count) pairs, never documents), then top-N. The
  final rank runs as a one-partition window over the already-limited
  ``vocab_size`` rows — bounded by the parameter, not the corpus.
* :func:`encode_text` — two physical strategies, parity-pinned:
  ``broadcast`` (default, the 100 TB path) ships the vocab dict to every
  executor once and maps each Arrow batch in place — ZERO shuffle, the
  document row never moves; ``join`` posexplodes words through a
  broadcast hash join and regroups on the doc id — one shuffle of
  (id, pos, token_id) ints, no Python, useful where the vocab exceeds
  comfortable python-dict size.

Tokenization reuses the engine-wide word normalizer (``dedup.words_col``:
lowercase, ``[^a-z0-9]+`` -> space, split) so vocab, dedup shingles and
classifier features all agree on what a word is.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _spread, words_col

UNK_ID = 0
EOS_ID = 1
N_RESERVED = 2


def build_vocab(
    docs: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Top-``vocab_size`` words by corpus frequency as ``(token:string,
    id:int, count:long)``, ids from ``N_RESERVED`` in ``(count DESC,
    token ASC)`` order — the tie-break makes the vocab a pure function
    of the corpus."""
    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")
    counts = (
        _spread(docs.select(text_col))
        .select(F.explode(words_col(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("count"))
        .filter(F.col("count") >= min_count)
    )
    order = [F.desc("count"), F.asc("token")]
    top = counts.orderBy(*order).limit(vocab_size)
    # rank the LIMITED frame: a one-partition window over <= vocab_size
    # rows (parameter-bounded, not corpus-bounded)
    return top.select(
        "token",
        (F.row_number().over(Window.orderBy(*order)) + F.lit(N_RESERVED - 1))
        .cast("int")
        .alias("id"),
        "count",
    )


def vocab_oracle_sql(docs_table: str, vocab_size: int,
                     text_col: str = "text", min_count: int = 1) -> str:
    """DuckDB SQL recomputing :func:`build_vocab` exactly."""
    return f"""
    WITH words AS (
      SELECT unnest(string_split(trim(regexp_replace(lower({text_col}),
                    '[^a-z0-9]+', ' ', 'g')), ' ')) AS token
      FROM {docs_table}
      WHERE {text_col} IS NOT NULL
        AND trim(regexp_replace(lower({text_col}), '[^a-z0-9]+', ' ', 'g')) != ''
    ), counts AS (
      SELECT token, count(*) AS count FROM words
      GROUP BY token HAVING count(*) >= {min_count}
    )
    SELECT token,
           CAST(row_number() OVER (ORDER BY count DESC, token ASC)
                + {N_RESERVED - 1} AS INT) AS id,
           count
    FROM counts
    ORDER BY count DESC, token ASC
    LIMIT {vocab_size}
    """


def encode_text(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "tokens",
    n_tok_col: str = "n_tok",
    add_eos: bool = False,
    method: str = "broadcast",
) -> DataFrame:
    """Append ``out_col`` = array<int> of token ids and ``n_tok_col``.

    Out-of-vocab words map to ``UNK_ID``; ``add_eos`` appends ``EOS_ID``
    per document. Empty and NULL text both encode to the empty array
    (n_tok 0, or 1 with eos) — a row never disappears. ``method``:

    - ``broadcast``: vocab dict to every executor, one ``mapInPandas``
      pass — zero shuffle, rows never move. The word normalizer is
      re-applied in pandas with the same ASCII regex semantics as
      ``words_col`` (parity with ``join`` is pinned in tests).
    - ``join``: posexplode + broadcast hash join + regroup on ``id_col``
      — one int-only shuffle, all JVM.
    """
    if method == "broadcast":
        return _encode_broadcast(
            docs, vocab, text_col, out_col, n_tok_col, add_eos
        )
    if method != "join":
        raise ValueError(f"unknown encode method {method!r}")

    ids = (
        _spread(docs.select(id_col, text_col))
        .select(
            F.col(id_col),
            F.posexplode_outer(words_col(text_col)).alias("_pos", "_w"),
        )
        .join(
            F.broadcast(vocab.select(F.col("token").alias("_w"), "id")),
            "_w",
            "left",
        )
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("_pos").isNotNull(),
                        F.struct(
                            F.col("_pos").alias("pos"),
                            F.coalesce(F.col("id"), F.lit(UNK_ID))
                            .cast("int")
                            .alias("id"),
                        ),
                    )
                )
            ).alias("_toks")
        )
        .select(
            id_col,
            F.transform(F.col("_toks"), lambda s: s["id"]).alias(out_col),
        )
    )
    if add_eos:
        ids = ids.withColumn(
            out_col,
            F.concat(F.col(out_col), F.array(F.lit(EOS_ID).cast("int"))),
        )
    ids = ids.withColumn(n_tok_col, F.size(out_col).cast("int"))
    return docs.join(ids, id_col, "left")


def _encode_broadcast(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str,
    out_col: str,
    n_tok_col: str,
    add_eos: bool,
) -> DataFrame:
    import re

    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StructField,
        StructType,
    )

    spark = docs.sparkSession
    mapping = {
        r["token"]: int(r["id"]) for r in vocab.select("token", "id").collect()
    }
    bc = spark.sparkContext.broadcast(mapping)
    out_schema = StructType(
        docs.schema.fields
        + [
            StructField(out_col, ArrayType(IntegerType(), False), False),
            StructField(n_tok_col, IntegerType(), False),
        ]
    )
    word_re = re.compile("[^a-z0-9]+")
    tail = [EOS_ID] if add_eos else []

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = bc.value

        def one(t):
            if t is None:
                return tail.copy()
            cleaned = word_re.sub(" ", t.lower()).strip()
            if not cleaned:
                return tail.copy()
            return [m.get(w, UNK_ID) for w in cleaned.split(" ")] + tail

        for pdf in batches:
            toks = pdf[text_col].map(one)
            pdf = pdf.copy()
            pdf[out_col] = toks
            pdf[n_tok_col] = toks.map(len).astype("int32")
            yield pdf

    return docs.mapInPandas(_enc, out_schema)


def encode_oracle_sql(docs_table: str, vocab_table: str,
                      text_col: str = "text", id_col: str = "doc_id",
                      add_eos: bool = False) -> str:
    """DuckDB SQL recomputing :func:`encode_text` exactly: per-doc
    ordered list of vocab ids with unk=0 (+ optional eos=1)."""
    tail = f" || [{EOS_ID}]" if add_eos else ""
    return f"""
    WITH wordlists AS (
      SELECT {id_col},
             string_split(trim(regexp_replace(lower({text_col}),
                          '[^a-z0-9]+', ' ', 'g')), ' ') AS ws
      FROM {docs_table}
      WHERE {text_col} IS NOT NULL
        AND trim(regexp_replace(lower({text_col}),
                 '[^a-z0-9]+', ' ', 'g')) != ''
    ), exploded AS (
      SELECT {id_col}, unnest(ws) AS word,
             generate_subscripts(ws, 1) AS pos
      FROM wordlists
    ), mapped AS (
      SELECT e.{id_col}, e.pos, coalesce(v.id, {UNK_ID}) AS tid
      FROM exploded e LEFT JOIN {vocab_table} v ON e.word = v.token
    ), lists AS (
      SELECT {id_col}, list(tid ORDER BY pos) AS toks
      FROM mapped GROUP BY {id_col}
    )
    SELECT d.{id_col},
           CAST(coalesce(l.toks, []){tail} AS INT[]) AS tokens,
           CAST(len(coalesce(l.toks, []){tail}) AS INT) AS n_tok
    FROM {docs_table} d LEFT JOIN lists l USING ({id_col})
    """


def decode_tokens(
    df: DataFrame,
    vocab: DataFrame,
    tokens_col: str = "tokens",
    out_col: str = "words",
) -> DataFrame:
    """Inverse mapping for audit: ids back to tokens, ``<unk>``/``<eos>``
    for the reserved ids, ``<invalid:N>`` for ids outside the vocab (a
    corrupt table should be visible, not silently skipped)."""
    inv = vocab.select(
        F.col("id").alias("_tid"), F.col("token").alias("_tok")
    )
    exploded = df.select(
        "*", F.posexplode_outer(tokens_col).alias("_pos", "_tid")
    ).join(F.broadcast(inv), "_tid", "left")
    word = (
        F.when(F.col("_tid") == UNK_ID, F.lit("<unk>"))
        .when(F.col("_tid") == EOS_ID, F.lit("<eos>"))
        .when(F.col("_tok").isNotNull(), F.col("_tok"))
        .when(
            F.col("_tid").isNotNull(),
            F.concat(F.lit("<invalid:"), F.col("_tid"), F.lit(">")),
        )
    )
    group_cols = [c for c in df.columns]
    return (
        exploded.groupBy(*group_cols)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("_pos").isNotNull(),
                        F.struct(F.col("_pos").alias("pos"), word.alias("w")),
                    )
                )
            ).alias("_ws")
        )
        .withColumn(out_col, F.transform(F.col("_ws"), lambda s: s["w"]))
        .drop("_ws")
    )
