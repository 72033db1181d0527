

# ---- baseline JPEG codec (pipelines/jpegcodec.py) ----------------------

def test_jpeg_roundtrip_smooth():
    """Smooth images survive quantization within small error; shape and
    odd (non-multiple-of-8) sizes are exact."""
    import numpy as np

    from lucene_kmp_ray.pipelines.jpegcodec import jpeg_decode, jpeg_encode
    y, x = np.mgrid[0:40, 0:56]
    img = (128 + 100 * np.sin(x / 9.0) * np.cos(y / 7.0)).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode(img, quality=95))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4

    odd = (x[:13, :17] * 7 % 256).astype(np.uint8)
    assert jpeg_decode(jpeg_encode(odd)).shape == (13, 17)


def test_jpeg_noise_roundtrip_structurally_valid():
    import numpy as np

    from lucene_kmp_ray.pipelines.jpegcodec import jpeg_decode, jpeg_encode
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    enc = jpeg_encode(img, quality=50)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    dec = jpeg_decode(enc)
    assert dec.shape == img.shape  # lossy, but structurally exact


def test_jpeg_quality_monotonic_size():
    import numpy as np

    from lucene_kmp_ray.pipelines.jpegcodec import jpeg_encode
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    sizes = [len(jpeg_encode(img, quality=q)) for q in (10, 50, 95)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_jpeg_rejects_unsupported():
    import pytest as _pytest

    from lucene_kmp_ray.pipelines.jpegcodec import jpeg_decode
    with _pytest.raises(ValueError):
        jpeg_decode(b"\x89PNG....")
    # progressive marker (SOF2) rejected
    with _pytest.raises(ValueError):
        jpeg_decode(b"\xff\xd8\xff\xc2\x00\x05aaa\xff\xd9")


def test_jpeg_rgb_input_uses_luma():
    import numpy as np

    from lucene_kmp_ray.pipelines.jpegcodec import jpeg_decode, jpeg_encode
    rgb = np.zeros((16, 16, 3), np.uint8)
    rgb[:, :, 1] = 200   # green-only: luma = 0.587*200 = 117.4
    dec = jpeg_decode(jpeg_encode(rgb, quality=95))
    assert abs(int(dec.mean()) - 117) <= 2


def test_image_decode_dispatches_jpeg():
    import numpy as np

    from lucene_kmp_ray.pipelines.jpegcodec import jpeg_encode
    from lucene_kmp_ray.pipelines.multimodal import _image_decode
    img = np.full((8, 8), 77, np.uint8)
    px = _image_decode(jpeg_encode(img, quality=95))
    assert px.shape == (8, 8, 3)
    assert abs(int(px.mean()) - 77) <= 1


def test_image_features_over_jpeg_table(ray_session):
    import ray.data as rd

    from lucene_kmp_ray.pipelines.multimodal import (image_features,
                                                     synthesize_bmp_table,
                                                     synthesize_jpeg_table)
    df = image_features(
        rd.from_arrow(synthesize_jpeg_table(6))).to_pandas()
    assert len(df) == 6
    # JPEG features are lossy-close to the BMP features of the same pixels
    bmp = image_features(
        rd.from_arrow(synthesize_bmp_table(6))).to_pandas()
    import numpy as np
    for i in range(6):
        a = df[df.media_id == i].iloc[0]
        b = bmp[bmp.media_id == i].iloc[0]
        # gray JPEG: its luminance must match the BMP pixels' luminance
        assert abs(a.luminance_mean - b.luminance_mean) < 3.0, i
