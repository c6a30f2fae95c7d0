"""Both branches of the optional-PIL image decode gate."""


import pytest
from gotsdb_spark.operators.multimodal import _fake_decode, decode_image

try:
    import PIL  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False


@pytest.mark.skipif(HAS_PIL, reason="PIL installed: gate does not raise")
def test_decode_image_raises_without_pil():
    with pytest.raises(NotImplementedError):
        decode_image(b"not an image")


@pytest.mark.skipif(not HAS_PIL, reason="PIL not installed")
def test_decode_image_real_codec_roundtrip():
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (7, 3)).save(buf, format="PNG")
    fingerprint, width, height = decode_image(buf.getvalue())
    assert (width, height) == (7, 3)
    assert len(fingerprint) == 32


def test_fake_decode_is_deterministic():
    a, b = _fake_decode(b"payload"), _fake_decode(b"payload")
    assert a == b
    h, w, ht = a
    assert len(h) == 32 and 0 <= w < 1024 and 0 <= ht < 1024


def test_ppm_decoder_rejects_malformed_payloads():
    """The netpbm parser is a real decoder: wrong magic, bad maxval and
    truncated pixel buffers all raise instead of returning garbage."""
    import pytest

    from gotsdb_spark.operators.multimodal import decode_ppm

    ok = b"P6\n2 1\n255\n" + bytes(6)
    assert decode_ppm(ok)[:2] == (2, 1)
    with pytest.raises(ValueError, match="not a P6"):
        decode_ppm(b"P5\n2 1\n255\n" + bytes(6))
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n2 1\n65535\n" + bytes(12))
    with pytest.raises(ValueError, match="pixel buffer"):
        decode_ppm(b"P6\n2 2\n255\n" + bytes(6))


def test_ppm_decoder_channel_order():
    """Channel means follow R,G,B interleaving, not planar order."""
    from gotsdb_spark.operators.multimodal import decode_ppm

    # 1x2 image: pixels (10,20,30) and (50,60,70)
    payload = b"P6\n2 1\n255\n" + bytes([10, 20, 30, 50, 60, 70])
    w, h, r, g, b = decode_ppm(payload)
    assert (w, h) == (2, 1)
    assert (r, g, b) == (30.0, 40.0, 50.0)


def test_wav_decoder_parses_real_riff():
    """The WAV path is a real RIFF parse: a hand-built file decodes to
    its known statistics, and a stereo file is rejected."""
    import io
    import struct
    import wave

    import pytest

    from gotsdb_spark.operators.multimodal import decode_wav

    def build(samples, channels=1):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(channels)
            wf.setsampwidth(2)
            wf.setframerate(8000)
            wf.writeframes(struct.pack(f"<{len(samples)}h", *samples))
        return buf.getvalue()

    n, rate, mean, rms, peak = decode_wav(build([3, -3, 4, -4]))
    assert (n, rate, mean, peak) == (4, 8000, 0.0, 4)
    assert rms == (12.5) ** 0.5
    with pytest.raises(ValueError, match="mono"):
        decode_wav(build([1, 2, 3, 4], channels=2))


def test_resize_nearest_known_indices():
    """Nearest-neighbor picks (target*src)//dst source indices."""
    import numpy as np

    from gotsdb_spark.operators.multimodal import resize_nearest

    arr = np.arange(4 * 6 * 3).reshape(4, 6, 3)
    small = resize_nearest(arr, 2, 2)
    # rows (0*4)//2=0, (1*4)//2=2; cols (0*6)//2=0, (1*6)//2=3
    assert (small == arr[np.ix_([0, 2], [0, 3])]).all()
    assert small.shape == (2, 2, 3)
