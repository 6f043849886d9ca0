"""Property-based (hypothesis) tests for the pure-Python media codecs
and the stego scheme: encode->decode identity must hold for ALL valid
inputs, not just the fixtures — these are the invariants the strict
multimodal path and the S17 import stand on."""

import numpy as np
from hypothesis import given, settings, strategies as st

from pears_lite_spark.functions import codecs as C

dims = st.tuples(st.integers(1, 24), st.integers(1, 24),
                 st.sampled_from([1, 2, 3, 4]))


@settings(max_examples=40, deadline=None)
@given(dims=dims, filter_type=st.integers(0, 4), seed=st.integers(0, 2**31))
def test_png_round_trip_property(dims, filter_type, seed):
    h, w, c = dims
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    want = arr[:, :, 0] if c == 1 else arr
    assert np.array_equal(
        C.decode_png(C.encode_png(arr, filter_type=filter_type)), want)


@settings(max_examples=25, deadline=None)
@given(h=st.integers(1, 16), w=st.integers(1, 16), seed=st.integers(0, 2**31))
def test_bmp_round_trip_property(h, w, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(C.decode_bmp(C.encode_bmp(arr)), arr)


@settings(max_examples=25, deadline=None)
@given(n=st.integers(1, 5000), rate=st.sampled_from([8000, 16000, 44100]),
       seed=st.integers(0, 2**31))
def test_wav_round_trip_property(n, rate, seed):
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, n).astype(np.int16)
    back, r = C.decode_wav(C.encode_wav(s, rate))
    assert r == rate and np.array_equal(back, s)


@settings(max_examples=40, deadline=None)
@given(text=st.text(alphabet=st.characters(min_codepoint=1,
                                           max_codepoint=765),
                    max_size=300))
def test_stego_round_trip_property(text):
    from pears_lite_spark.sources import (decode_stego_pod_png,
                                          encode_stego_pod_png)
    assert decode_stego_pod_png(encode_stego_pod_png(text)) == text


@settings(max_examples=30, deadline=None)
@given(dims=dims, w2=st.integers(1, 30), h2=st.integers(1, 30),
       seed=st.integers(0, 2**31))
def test_resize_shape_and_value_domain(dims, w2, h2, seed):
    h, w, c = dims
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    out = C.resize_nearest(arr, w2, h2)
    assert out.shape == (h2, w2, c)
    # every output pixel is an input pixel (nearest = pure gather)
    flat_in = set(map(tuple, arr.reshape(-1, c)))
    assert all(tuple(p) in flat_in for p in out.reshape(-1, c))
