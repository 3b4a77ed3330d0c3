"""Sequence packing + chunking: known-value layouts, determinism, and
coverage invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mvrepair.operators import packing as P
from mvrepair.sources.corpus import shard_id


def test_pack_sequences_known_layout(spark):
    # one stream (n_streams=1): docs in id order, budget 10
    docs = [
        (1, "a b c d"),          # 4 toks -> pos 0,  seq 0 off 0
        (2, "e f g h i j k"),    # 7 toks -> pos 4,  seq 0 off 4 (straddles)
        (3, "l m"),              # 2 toks -> pos 11, seq 1 off 1
        (4, "n"),                # 1 tok  -> pos 13, seq 1 off 3
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r.doc_id: r for r in P.pack_sequences(df, budget=10, n_streams=1).collect()}
    assert [(got[i].seq_id, got[i].seq_offset, got[i].n_tokens) for i in (1, 2, 3, 4)] == [
        (0, 0, 4), (0, 4, 7), (1, 1, 2), (1, 3, 1)
    ]
    assert all(got[i].stream == 0 for i in (1, 2, 3, 4))


def test_pack_sequences_streams_are_independent_and_deterministic(spark):
    docs = [(i, " ".join(["t"] * (i % 7 + 1))) for i in range(40)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    a = {r.doc_id: (r.stream, r.seq_id, r.seq_offset) for r in P.pack_sequences(df, budget=16, n_streams=4).collect()}
    b = {r.doc_id: (r.stream, r.seq_id, r.seq_offset) for r in P.pack_sequences(df, budget=16, n_streams=4).collect()}
    assert a == b
    # stream assignment is the shared run-stable hash
    want = {r.doc_id: r.s for r in df.select("doc_id", shard_id(F.col("doc_id"), 4).alias("s")).collect()}
    assert {k: v[0] for k, v in a.items()} == want
    # within each stream, offsets replay the cumulative sum exactly
    for s in range(4):
        ids = sorted(k for k, v in a.items() if v[0] == s)
        pos = 0
        for i in ids:
            assert (a[i][1], a[i][2]) == (pos // 16, pos % 16)
            pos += i % 7 + 1


def test_chunk_documents_overlap_and_tail(spark):
    text = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        P.chunk_documents(df, chunk=4, overlap=2).collect(),
        key=lambda r: r.chunk_id,
    )
    # stride 2: starts 0,2,4,6,8 (0-based) -> 5 chunks, last is short
    assert [r.chunk_id for r in rows] == [0, 1, 2, 3, 4]
    assert rows[0].chunk_text == "w0 w1 w2 w3"
    assert rows[1].chunk_text == "w2 w3 w4 w5"
    assert rows[4].chunk_text == "w8 w9" and rows[4].n_tokens == 2
    # every token covered; consecutive chunks overlap by exactly 2 (except tail)
    assert rows[3].chunk_text.split(" ")[-2:] == rows[4].chunk_text.split(" ")[:2]


def test_chunk_documents_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "c")], ["doc_id", "text"])
    got = {r.doc_id: r for r in P.chunk_documents(df, chunk=8, overlap=3).collect()}
    assert got[1].chunk_id == 0 and got[1].chunk_text == "a b" and got[1].n_tokens == 2
    assert got[2].chunk_text == "c"


def test_chunk_documents_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        P.chunk_documents(df, chunk=4, overlap=4)


def test_training_order_deterministic_and_seed_dependent(spark):
    docs = spark.createDataFrame(
        [(i, "w " * 20) for i in range(40)], ["doc_id", "text"]
    )
    packed = P.pack_sequences(docs, budget=32, n_streams=4)
    a = [tuple(r) for r in P.training_order(packed).collect()]
    b = [tuple(r) for r in P.training_order(packed.repartition(7)).collect()]
    # same order regardless of input partitioning
    assert a == b
    # seqs all present exactly once
    assert len(a) == len({(r[0], r[1]) for r in a})
    # order follows the shuffle key
    keys = [r[-1] for r in a]
    assert keys == sorted(keys)
    # a different seed is a different permutation of the same rows
    c = [tuple(r)[:4] for r in P.training_order(packed, seed="epoch1").collect()]
    assert sorted(c) == sorted(t[:4] for t in a)
    assert c != [t[:4] for t in a]


def test_training_order_plan_is_range_sort_not_global_window(spark):
    docs = spark.createDataFrame([(1, "w " * 20)], ["doc_id", "text"])
    packed = P.pack_sequences(docs, budget=32, n_streams=2)
    plan = (
        P.training_order(packed)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # global ORDER BY compiles to a range exchange + per-partition sort
    assert "rangepartitioning" in plan
    assert "Sort [shuffle_key" in plan
    # the only window is pack_sequences' per-stream cumsum — every window
    # spec is PARTITIONED (an unpartitioned spec would funnel all rows
    # through one task, the shape this operator exists to avoid)
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert spec.lstrip().startswith("stream"), spec
