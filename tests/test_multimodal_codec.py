"""Pure-numpy BMP/WAV codecs and the real (fake=False) decode paths."""

import numpy as np
import pyarrow as pa
import pytest

from dcpray.functions.multimodal import (
    ImageFeatureExtractor,
    ImageResizer,
    bmp_pixel_stats,
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    synthesize_bmp_media,
)


@pytest.mark.parametrize("h,w", [(8, 8), (3, 5), (1, 1), (16, 7)])
def test_bmp_roundtrip(h, w):
    """Round-trip incl. widths whose rows need padding (w*3 % 4 != 0)."""
    rng = np.random.RandomState(h * 100 + w)
    pix = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    out = decode_bmp(encode_bmp(pix))
    np.testing.assert_array_equal(out, pix)


def test_bmp_topdown_rows():
    """Decoder handles negative-height (top-down) BMPs too."""
    import struct

    pix = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    data = bytearray(encode_bmp(pix))
    # flip to top-down: negate height, reverse the row blocks
    h, w = 2, 2
    row_size = (w * 3 + 3) & ~3
    struct.pack_into("<i", data, 22, -h)
    rows = [bytes(data[54 + i * row_size : 54 + (i + 1) * row_size])
            for i in range(h)]
    data[54:] = b"".join(reversed(rows))
    np.testing.assert_array_equal(decode_bmp(bytes(data)), pix)


def test_bmp_rejects_garbage():
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"JUNKJUNKJUNK" * 10)


def test_wav_roundtrip():
    rng = np.random.RandomState(7)
    samples = rng.randint(-32768, 32767, 512, dtype=np.int16)
    out, rate = decode_wav(encode_wav(samples, rate=8000))
    assert rate == 8000
    np.testing.assert_array_equal(out[:, 0], samples)


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE" + b"\0" * 40)


def _media_batch():
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["hello world", "", "x" * 100]),
    })
    return synthesize_bmp_media(docs)


def test_bmp_pixel_stats_matches_closed_form():
    media = _media_batch()
    out = bmp_pixel_stats(media)
    n_chars = np.array([11, 0, 100])
    idx = np.arange(192)
    expect = ((n_chars[:, None] * 7 + idx[None, :] * 13) % 256).mean(axis=1)
    expect = np.floor(expect * 1e6 + 0.5) / 1e6
    np.testing.assert_allclose(out["pixel_mean"].to_numpy(), expect)
    assert out["width"].to_pylist() == [8, 8, 8]


def test_feature_extractor_real_mode_decodes():
    media = _media_batch()
    feats = ImageFeatureExtractor(fake=False)(media)
    f = np.stack(feats["features"].to_pylist())
    # unit-normalized 16-bin histogram of the DECODED pixels
    np.testing.assert_allclose(f.sum(axis=1), 1.0)
    pix = decode_bmp(media["payload"][0].as_py()).reshape(-1)
    hist = np.bincount(pix >> 4, minlength=16) / pix.size
    np.testing.assert_allclose(f[0], hist)


def test_resizer_real_mode():
    media = _media_batch()
    out = ImageResizer(4, 4, fake=False)(media)
    pix = decode_bmp(out["payload"][0].as_py())
    assert pix.shape == (4, 4, 3)
    # nearest-neighbor of the source at stride 2
    src = decode_bmp(media["payload"][0].as_py())
    np.testing.assert_array_equal(pix, src[::2, ::2])


def test_wav_audio_stats_matches_closed_form():
    from dcpray.functions.multimodal import synthesize_wav_media, wav_audio_stats

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["hello world", "", "x" * 100]),
    })
    media = synthesize_wav_media(docs)
    out = wav_audio_stats(media)
    n_chars = np.array([11, 0, 100])
    idx = np.arange(256)
    s = ((n_chars[:, None] * 11 + idx[None, :] * 17) % 512) - 256
    expect = np.sqrt((s.astype(float) ** 2).mean(axis=1))
    expect = np.floor(expect * 1e6 + 0.5) / 1e6
    np.testing.assert_allclose(out["rms"].to_numpy(), expect)
    assert out["n_samples"].to_pylist() == [256, 256, 256]
    assert out["rate"].to_pylist() == [16000, 16000, 16000]
