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
