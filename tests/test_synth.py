from __future__ import annotations

from pyspark.sql import functions as F

from timeseriesvectordbpattermatcher_spark.sources.synth import MAX_N_TOK, VOCAB_SIZE, synth_seqs


def test_determinism_across_partitionings(spark):
    a = synth_seqs(spark, 500, seed=7, partitions=1).orderBy("doc_id").collect()
    b = synth_seqs(spark, 500, seed=7, partitions=13).orderBy("doc_id").collect()
    assert a == b


def test_boundary_pins_and_ranges(spark, seqs_2k):
    rows = seqs_2k.filter(F.col("doc_id").endswith("_00000000")).collect()
    assert rows[0]["n_tok"] == 1
    rows = seqs_2k.filter(F.col("doc_id").endswith("_00000001")).collect()
    assert rows[0]["n_tok"] == MAX_N_TOK
    stats = seqs_2k.agg(
        F.min("n_tok"), F.max("n_tok"), F.min(F.array_min("tokens")), F.max(F.array_max("tokens"))
    ).collect()[0]
    assert stats[0] >= 1 and stats[1] <= MAX_N_TOK
    assert stats[2] >= 0 and stats[3] < VOCAB_SIZE


def test_n_tok_matches_token_length(seqs_2k):
    bad = seqs_2k.filter(F.size("tokens") != F.col("n_tok")).count()
    assert bad == 0


def test_source_skew(seqs_2k):
    counts = dict(seqs_2k.groupBy("source").count().collect())
    assert counts["web"] > 0.6 * 2000
    assert set(counts) == {"web", "code", "books", "wiki"}
