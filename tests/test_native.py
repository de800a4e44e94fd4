import numpy as np
import pytest
from PIL import Image

from bayesdll_tpu import native
from bayesdll_tpu.data import vision_transforms as vt


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native library unavailable (no compiler?)")
    return True


def test_native_resize_close_to_pil(lib_ok):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (120, 160, 3), np.uint8)
    out_native = native.resize_bilinear(img, 60, 80)
    out_pil = np.asarray(
        Image.fromarray(img).resize((80, 60), Image.BILINEAR), np.uint8)
    # PIL-exact triangle filter with scaled support: only 8-bit rounding
    # differences remain
    diff = np.abs(out_native.astype(int) - out_pil.astype(int))
    assert diff.max() <= 1
    assert diff.mean() < 0.5


def test_native_eval_preprocess_matches_reference_math(lib_ok):
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (300, 280, 3), np.uint8)
    out = native.eval_preprocess(img, vt.IMAGENET_MEAN, vt.IMAGENET_STD)
    assert out.shape == (224, 224, 3)
    pil = vt.eval_transform(Image.fromarray(img), use_native=False)
    assert np.abs(out - pil).mean() < 0.15  # normalised units


def test_native_crop_flip_normalize_exact(lib_ok):
    import ctypes
    rng = np.random.RandomState(2)
    img = np.ascontiguousarray(rng.randint(0, 256, (64, 64, 3), np.uint8))
    mean = vt.IMAGENET_MEAN
    std = vt.IMAGENET_STD
    out = np.empty((32, 32, 3), np.float32)
    lib = native._load()
    lib.crop_flip_normalize(native._u8p(img), 64, 64, 10, 5, 32, 1,
                            native._f32p(mean), native._f32p(std),
                            native._f32p(out))
    expect = img[10:42, 5:37][:, ::-1].astype(np.float32) / 255.0
    expect = (expect - mean) / std
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


def test_eval_transform_uses_native_when_available(lib_ok):
    rng = np.random.RandomState(3)
    img = Image.fromarray(rng.randint(0, 256, (256, 256, 3), np.uint8))
    out = vt.eval_transform(img)
    assert out.shape == (224, 224, 3)
