import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from light_splade_spark.functions.vbyte import (
    concat_runs,
    decode_run,
    encode_run,
    vbyte_decode,
    vbyte_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=50, deadline=None)
def test_vbyte_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    buf = vbyte_encode(arr)
    out, off = vbyte_decode(buf, len(values))
    assert out.tolist() == values
    assert off == len(buf)


@given(
    st.lists(st.integers(min_value=0, max_value=10**12), min_size=1,
             max_size=300, unique=True)
)
@settings(max_examples=50, deadline=None)
def test_run_roundtrip(ids):
    ids = np.sort(np.array(ids, dtype=np.int64))
    w = (np.arange(ids.size) % 97).astype(np.float32) / 7
    d, ww = decode_run(encode_run(ids, w))
    assert (d == ids).all()
    assert (ww == w).all()


def test_empty_run():
    d, w = decode_run(encode_run(np.array([], dtype=np.int64),
                                 np.array([], dtype=np.float32)))
    assert d.size == 0 and w.size == 0


@pytest.mark.parametrize("cuts", [[100], [1, 900], [300, 600, 900]])
def test_concat_runs_equals_whole(cuts):
    rng = np.random.default_rng(7)
    ids = np.sort(rng.choice(10**9, 1000, replace=False)).astype(np.int64)
    w = rng.random(1000).astype(np.float32)
    pieces = np.split(np.arange(1000), cuts)
    runs = [encode_run(ids[p], w[p]) for p in pieces]
    spans = [(int(ids[p][0]), int(ids[p][-1])) for p in pieces]
    d, ww = decode_run(concat_runs(runs, spans))
    assert (d == ids).all() and (ww == w).all()


def test_compression_beats_raw():
    rng = np.random.default_rng(1)
    ids = np.sort(rng.choice(10**7, 50_000, replace=False)).astype(np.int64)
    w = rng.random(ids.size).astype(np.float32)
    enc = encode_run(ids, w)
    raw = ids.size * (8 + 4)  # int64 + float32
    assert len(enc) < raw * 0.5  # delta+vbyte at least halves it
