"""Round-trip and strict-pipeline tests for the pure stdlib+numpy media
codecs (functions/codecs.py) and the REAL multimodal decode path.

The decoders are implemented from the public format specs (PNG RFC
2083, BITMAPINFOHEADER BMP, PCM WAV); these tests pin encode->decode
identity across every scanline filter and color type, and drive the
strict Spark path end-to-end.
"""

import numpy as np
import pytest

from pears_lite_spark.functions import codecs as C


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("shape", [(13, 9), (8, 8, 2), (16, 5, 3),
                                   (7, 11, 4), (1, 1), (2, 3, 3)])
def test_png_round_trip_all_filters_and_colors(shape, filter_type):
    rng = np.random.default_rng(hash((shape, filter_type)) % (2**32))
    arr = rng.integers(0, 256, shape, dtype=np.uint8)
    back = C.decode_png(C.encode_png(arr, filter_type=filter_type))
    assert np.array_equal(back, arr)


def test_png_rejects_non_png():
    with pytest.raises(ValueError):
        C.decode_png(b"\x00" * 32)


def test_bmp_round_trip_including_row_padding():
    rng = np.random.default_rng(11)
    for w in (5, 6, 7, 8):  # exercise 4-byte row padding variants
        arr = rng.integers(0, 256, (9, w, 3), dtype=np.uint8)
        assert np.array_equal(C.decode_bmp(C.encode_bmp(arr)), arr)


def test_wav_round_trip():
    rng = np.random.default_rng(12)
    s = rng.integers(-32768, 32768, 4001).astype(np.int16)
    back, rate = C.decode_wav(C.encode_wav(s, 22050))
    assert rate == 22050
    assert np.array_equal(back, s)


def test_resize_nearest_identity_and_shape():
    rng = np.random.default_rng(13)
    arr = rng.integers(0, 256, (10, 8, 3), dtype=np.uint8)
    assert np.array_equal(C.resize_nearest(arr, 8, 10), arr)
    assert C.resize_nearest(arr, 17, 3).shape == (3, 17, 3)
    # gray 2-D path
    g = rng.integers(0, 256, (6, 6), dtype=np.uint8)
    assert C.resize_nearest(g, 3, 2).shape == (2, 3)


def test_feature_histograms_sum_to_one_and_are_exact():
    rng = np.random.default_rng(14)
    arr = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
    f = C.image_features(arr)
    assert f.shape == (16,)
    assert abs(f.sum() - 1.0) < 1e-12
    # exact count semantics: features * n == integer histogram
    h = C.image_hist(arr)
    assert np.array_equal((f * 400).round().astype(np.int64), h)
    s = rng.integers(-32768, 32768, 777).astype(np.int16)
    fa = C.audio_features(s)
    assert abs(fa.sum() - 1.0) < 1e-12


def test_strict_media_features_real_decode(spark):
    """Strict (REAL) decode end-to-end in Spark: histograms computed
    from decoded payloads must equal histograms of the pre-encode
    arrays — a round-trip differential through Arrow + executors."""
    from pears_lite_spark.functions.multimodal import (
        FEATURE_DIM, extract_features_df, synth_media_real,
        synth_media_real_items)
    media = synth_media_real(spark, 24)
    out = (extract_features_df(media.filter("kind != 'video'"), strict=True)
           .collect())
    expected = {}
    for i, kind, payload, raw in synth_media_real_items(24):
        if kind == "image":
            expected[i] = C.image_features(raw, FEATURE_DIM)
        elif kind == "audio":
            expected[i] = C.audio_features(raw, FEATURE_DIM)
    assert len(out) == len(expected) > 0
    for r in out:
        assert np.allclose(r["features"], expected[r["doc_id"]],
                           rtol=0, atol=0)


def test_strict_media_features_video_raises(spark):
    from pears_lite_spark.functions.multimodal import (
        extract_features_df, synth_media_real)
    media = synth_media_real(spark, 6).filter("kind = 'video'")
    with pytest.raises(Exception, match="no codec"):
        extract_features_df(media, strict=True).collect()


def test_stego_pod_png_round_trip():
    """S17 pixel scheme (reference `index_pod_file.py:23-40`):
    chr((255-r)+(255-g)+(255-b)) per pixel, last pixel discarded.
    Round-trip through our encoder/decoder, incl. 2- and 3-value
    splits, and the documented 765 ceiling."""
    from pears_lite_spark.sources import (decode_stego_pod_png,
                                          encode_stego_pod_png)
    text = "0;https://e.org/a;T ɣ ʣ;snippet é\n1;u;t;s"
    assert decode_stego_pod_png(encode_stego_pod_png(text)) == text
    with pytest.raises(ValueError, match="765"):
        encode_stego_pod_png("Γ")  # U+0393 = 915 > 3*255


def test_stego_pod_import_df(spark, tmp_path):
    from pears_lite_spark.sources import (encode_stego_pod_png,
                                          read_stego_pods)
    lines = ["0;https://a;T1;S1;0.1;2;True", "1;https://b;T2;S2;0.2;3;False"]
    (tmp_path / "pod.png").write_bytes(encode_stego_pod_png("\n".join(lines)))
    rows = {r["url"]: r for r in
            read_stego_pods(spark, str(tmp_path)).collect()}
    assert set(rows) == {"https://a", "https://b"}
    assert rows["https://a"]["cc"] is True
    assert rows["https://b"]["title"] == "T2"


def test_strict_resize_real(spark):
    from pears_lite_spark.functions.multimodal import (
        resize_media_df, synth_media_real, synth_media_real_items)
    out = {r["doc_id"]: bytes(r["payload"])
           for r in resize_media_df(synth_media_real(spark, 24),
                                    width=10, height=6,
                                    strict=True).collect()}
    n = 0
    for i, kind, payload, raw in synth_media_real_items(24):
        if kind != "image":
            continue
        want = C.encode_png(C.resize_nearest(raw, 10, 6))
        assert out[i] == want
        n += 1
    assert n > 0 and len(out) == n


def test_png_decode_rejects_oversized_images():
    import numpy as np
    import pytest
    img = np.zeros((40, 40, 3), dtype=np.uint8)
    png = C.encode_png(img, filter_type=1)
    with pytest.raises(NotImplementedError, match="max_pixels"):
        C.decode_png(png, max_pixels=1599)
    assert C.decode_png(png, max_pixels=1600).shape == (40, 40, 3)
