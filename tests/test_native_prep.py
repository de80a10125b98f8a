"""Native C++ image-preprocessing kernel: PIL-path parity + fallback."""

import os

import numpy as np
import pytest
from PIL import Image

from llavamod_tpu import native
from llavamod_tpu.mm_utils import ImagePreprocessor


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.default_rng(0)
    return [Image.fromarray(rng.integers(0, 255, size=(h, w, 3),
                                         dtype=np.uint8))
            for h, w in [(48, 64), (36, 36), (23, 41), (97, 55)]]


@pytest.mark.skipif(not native.is_available(),
                    reason="no C++ toolchain / build failed")
@pytest.mark.parametrize("aspect", [None, "pad"])
def test_native_matches_pil(imgs, aspect):
    pp = ImagePreprocessor(size=36, image_aspect_ratio=aspect)
    ref = np.stack([pp.preprocess_one(im) for im in imgs])
    nat = pp._native_batch(imgs)
    assert nat is not None
    assert nat.shape == ref.shape and nat.dtype == np.float32
    # PIL quantizes each resample pass to uint8; agreement to ~1.5/255
    # in pixel space (scaled by 1/std after normalization)
    assert np.abs(ref - nat).max() < 1.6 / 255 / 0.26


@pytest.mark.skipif(not native.is_available(),
                    reason="no C++ toolchain / build failed")
def test_call_uses_native_and_matches(imgs):
    pp = ImagePreprocessor(size=36, image_aspect_ratio="pad")
    out = pp(imgs)
    assert out.shape == (4, 3, 36, 36)
    assert np.isfinite(out).all()


def test_env_kill_switch(imgs, monkeypatch):
    monkeypatch.setenv("LLAVAMOD_NO_NATIVE", "1")
    # force a fresh load decision
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)
    assert native.preprocess_batch(
        [np.zeros((8, 8, 3), np.uint8)], 8, pad_square=False,
        background=(0, 0, 0), mean=(0.5,) * 3, std=(0.5,) * 3) is None
    # ImagePreprocessor falls back to PIL silently
    pp = ImagePreprocessor(size=36)
    out = pp(imgs)
    assert out.shape == (4, 3, 36, 36)
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)
