"""Native JPEG pipeline tests: parity with the PIL reference transform,
thread safety, corrupt-input handling, LSUN integration."""

import io

import numpy as np
import pytest
from PIL import Image

from damc_tpu.data.native_jpeg import (
    decode_crop_resize_batch,
    native_jpeg_available,
)

pytestmark = pytest.mark.skipif(
    not native_jpeg_available(), reason="no C++ toolchain / libjpeg"
)


def jpeg_bytes(arr: np.ndarray, quality=95) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def smooth_image(h, w, seed):
    """Low-frequency content so JPEG is near-lossless at q95."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack(
        [
            np.sin(yy / h * 3 + rng.rand() * 6) * 0.5 + 0.5,
            np.cos(xx / w * 4 + rng.rand() * 6) * 0.5 + 0.5,
            (yy / h + xx / w) / 2,
        ],
        axis=-1,
    )
    return (img * 255).astype(np.uint8)


class TestParityWithPIL:
    # (32, 40) crops to 32 == out_size: the identity-resize memcpy fast path.
    @pytest.mark.parametrize("hw", [(64, 64), (80, 48), (37, 91), (32, 40)])
    def test_matches_pil_reference_transform(self, hw):
        from damc_tpu.data.datasets import _decode_crop_resize

        h, w = hw
        buf = jpeg_bytes(smooth_image(h, w, seed=h + w))
        ref = _decode_crop_resize(buf, 32)  # PIL decode + crop + LANCZOS
        out, ok = decode_crop_resize_batch([buf], 32)
        assert ok.all() and out.shape == (1, 32, 32, 3)
        # Same libjpeg decode; resize differs only by PIL's fixed-point
        # coefficient rounding.
        diff = np.abs(out[0].astype(int) - ref.astype(int))
        assert diff.max() <= 3, diff.max()
        assert diff.mean() <= 0.5

    def test_grayscale_source_converted_to_rgb(self):
        buf = io.BytesIO()
        Image.fromarray(smooth_image(40, 40, 0)[..., 0], "L").save(buf, "JPEG")
        out, ok = decode_crop_resize_batch([buf.getvalue()], 16)
        assert ok.all()
        np.testing.assert_array_equal(out[0, ..., 0], out[0, ..., 1])


def test_batch_multithreaded_deterministic():
    bufs = [jpeg_bytes(smooth_image(50 + i, 60, i)) for i in range(24)]
    a, _ = decode_crop_resize_batch(bufs, 24, num_threads=8)
    b, _ = decode_crop_resize_batch(bufs, 24, num_threads=1)
    np.testing.assert_array_equal(a, b)


def test_corrupt_buffer_strict_raises_and_nonstrict_flags():
    good = jpeg_bytes(smooth_image(32, 32, 1))
    bad = b"\xff\xd8\xff" + b"garbage" * 10
    with pytest.raises(ValueError, match="corrupt"):
        decode_crop_resize_batch([good, bad], 16)
    out, ok = decode_crop_resize_batch([good, bad], 16, strict=False)
    assert ok.tolist() == [True, False]
    assert out[1].sum() == 0 and out[0].sum() > 0


def test_lsun_batch_uses_native_path(tmp_path):
    """LSUNClassImages batch indexing over JPEG blobs routes through the
    native decoder and matches the per-item PIL path."""
    from damc_tpu.data.datasets import LSUNClassImages
    from fake_lmdb import FakeEnv

    imgs = [smooth_image(48, 40, i) for i in range(6)]
    store = {f"k{i}".encode(): jpeg_bytes(imgs[i]) for i in range(6)}
    db = LSUNClassImages(str(tmp_path), size=32, env=FakeEnv(store))
    batch = db[np.array([0, 3, 5])]
    singles = np.stack([db[0], db[3], db[5]])
    diff = np.abs(batch.astype(int) - singles.astype(int))
    assert diff.max() <= 3  # native Lanczos vs PIL fixed-point rounding


def test_cmyk_jpeg_falls_back_to_pil_in_lsun_batch(tmp_path):
    """libjpeg cannot convert CMYK/YCCK (Adobe) sources to RGB, so the
    native decoder flags them not-ok; the LSUN batch path must then decode
    those items via PIL instead of aborting the batch — one Adobe-encoded
    image in a dataset must not kill training."""
    from damc_tpu.data.datasets import LSUNClassImages, _decode_crop_resize
    from fake_lmdb import FakeEnv

    rgb = smooth_image(48, 40, 0)
    buf = io.BytesIO()
    Image.fromarray(rgb, "RGB").convert("CMYK").save(buf, "JPEG", quality=95)
    cmyk_jpeg = buf.getvalue()
    assert cmyk_jpeg[:2] == b"\xff\xd8"
    # The native decoder itself refuses it...
    _, ok = decode_crop_resize_batch([cmyk_jpeg], 32, strict=False)
    assert not ok[0]

    store = {
        b"k0": jpeg_bytes(smooth_image(48, 40, 1)),
        b"k1": cmyk_jpeg,
        b"k2": jpeg_bytes(smooth_image(48, 40, 2)),
    }
    db = LSUNClassImages(str(tmp_path), size=32, env=FakeEnv(store))
    batch = db[np.array([0, 1, 2])]  # ...but the batch decode survives
    expect = _decode_crop_resize(cmyk_jpeg, 32)
    np.testing.assert_array_equal(batch[1], expect)
    # Genuinely corrupt data still raises (no silent substitute-sample-0).
    db_bad = LSUNClassImages(  # cache_keys=False: tmp_path already holds
        str(tmp_path), size=32, env=FakeEnv({b"k0": b"\xff\xd8garbage"}),
        cache_keys=False,  # the 3-key cache of the dataset above
    )
    with pytest.raises(Exception):
        db_bad[np.array([0])]
