"""Pins for the 1-bit binary-quantization serve
(operators/similarity.py::emb_binary_hamming_topk /
sim_binary_recall_checked).

The packing (sign bits -> two 32-bit words) and the Hamming stage are
replicated in pure Python and compared exactly on a constructed
embeddings table; identity/antipode vectors pin the Hamming extremes
(0 and 64); the recall contract's internal consistency
(final <= candidate recall <= k, rerank is a subset of the pool) is
asserted on the real fixture.
"""

from __future__ import annotations

from distributed_video_analytics_flink_spark.operators.similarity import (
    _BIN_CAND,
    _BIN_TOPK,
    emb_binary_hamming_topk,
    sim_binary_recall_checked,
)

SF001 = "/root/testdata/sf0.001"


def _pack(vec):
    lo = sum(1 << i for i in range(32) if i < len(vec) and vec[i] > 0)
    hi = sum(1 << (i - 32) for i in range(32, 64) if i < len(vec) and vec[i] > 0)
    return lo, hi


def _hamming(a, b):
    la, ha = _pack(a)
    lb, hb = _pack(b)
    return bin(la ^ lb).count("1") + bin(ha ^ hb).count("1")


def _write_emb(spark, tmp_path, vecs):
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, [float(x) for x in v], i % 3) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(f"{sf}/embeddings.parquet")
    return sf


def test_hamming_extremes_and_replica(spark, tmp_path):
    q = [1.0 if i % 2 == 0 else -1.0 for i in range(64)]
    same = list(q)  # hamming 0: every sign agrees
    anti = [-x for x in q]  # hamming 64: every sign flips
    half = q[:32] + [-x for x in q[32:]]  # exactly 32 bits differ
    zeros = [0.0] * 64  # x > 0 false everywhere -> bits where q has 1s
    vecs = [q, same, anti, half, zeros]
    sf = _write_emb(spark, tmp_path, vecs)
    got = {
        r["vec_id"]: (r["hamming"], r["cosine"])
        for r in emb_binary_hamming_topk(spark, sf).collect()
    }
    assert got[1][0] == 0
    assert got[2][0] == 64
    assert got[3][0] == 32
    for i in (1, 2, 3, 4):
        assert got[i][0] == _hamming(vecs[i], q)
    # identical vector is the cosine head too
    assert abs(got[1][1] - 1.0) < 1e-9


def test_short_vector_packs_zero_bits_not_error(spark, tmp_path):
    # a 3-dim vector must fold out-of-range dims to 0 bits (try_element_at
    # contract), not raise under ANSI mode
    q = [1.0] * 64
    short = [1.0, -1.0, 1.0]
    sf = _write_emb(spark, tmp_path, [q, short])
    rows = emb_binary_hamming_topk(spark, sf).collect()
    assert len(rows) == 1
    # short vector: bits {0, 2} set; q has all 64 -> hamming = 62
    assert rows[0]["hamming"] == 62


def test_recall_contract_consistency(spark):
    row = sim_binary_recall_checked(spark, SF001).collect()[0]
    assert row["n_candidates"] <= _BIN_CAND
    assert 0 <= row["recall_at_10"] <= row["recall_cand_at_10"] <= _BIN_TOPK
