"""Property tests for the numeric kernels added in round 5: Morton
interleaving (bijective, order-compatible) and int8 quantization (error
bound holds on adversarial floats). Pure-python/numpy mirrors of the SQL
expressions — the oracle parity tests pin Spark==DuckDB; these pin that
the shared math is CORRECT, not just consistent."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from distributed_video_analytics_flink_spark.functions.zorder import (
    _SPREAD_STEPS,
    duck_zorder2,
)


def _spread16_py(x: int) -> int:
    x &= 0xFFFF
    for shift, mask in _SPREAD_STEPS:
        x = (x | (x << shift)) & mask
    return x


def _z2(a: int, b: int) -> int:
    return _spread16_py(a) | (_spread16_py(b) << 1)


def _unz2(z: int) -> tuple[int, int]:
    a = b = 0
    for i in range(16):
        a |= ((z >> (2 * i)) & 1) << i
        b |= ((z >> (2 * i + 1)) & 1) << i
    return a, b


@given(st.integers(0, 0xFFFF), st.integers(0, 0xFFFF))
def test_zorder_bijective(a, b):
    z = _z2(a, b)
    assert 0 <= z <= 0xFFFFFFFF
    assert _unz2(z) == (a, b)


@given(st.integers(0, 0xFFFF), st.integers(0, 0xFFFF))
def test_zorder_matches_duckdb_expression(a, b):
    import duckdb

    (got,) = duckdb.sql(f"select {duck_zorder2(str(a), str(b))}").fetchone()
    assert got == _z2(a, b)


@given(st.integers(0, 0xFFFF), st.integers(0, 0xFFFF), st.integers(0, 15))
def test_zorder_locality(a, b, dbit):
    """Flipping a LOW bit of either key moves z less than flipping a HIGH
    bit — the monotone-refinement property row-group pruning relies on."""
    za = _z2(a, b)
    lo = _z2(a ^ 1, b)
    hi = _z2(a ^ 0x8000, b)
    assert abs(za - lo) < abs(za - hi)


@settings(max_examples=50)
@given(
    st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=64,
    )
)
def test_int8_quantizer_error_bound(vec):
    """The half-step reconstruction bound emb_quantize_int8 promises:
    max |x - q*scale/127| <= scale/254 (+ulp slop), with q in [-127,127],
    on arbitrary (non-degenerate) float vectors."""
    V = np.asarray(vec, dtype=np.float64)
    mx = np.abs(V).max()
    if mx == 0:
        return  # filtered out by the query
    t = V * 127.0 / mx
    q = np.floor(np.abs(t) + 0.5) * np.sign(t)
    assert np.all(np.abs(q) <= 127)
    err = np.abs(V - q * mx / 127.0).max()
    assert err <= mx / 254.0 * 1.0000001
