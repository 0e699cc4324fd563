"""Native C++ data-plane tier vs numpy/scipy references."""

import numpy as np
import pytest
from scipy import ndimage

from svgpvae_tpu import native
from svgpvae_tpu.data.ball import _rasterize, make_path_batch

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")

RNG = np.random.RandomState(2)


def test_rasterize_matches_numpy():
    traj = make_path_batch(batch=6, tmax=10, lt=4.0, seed=3)
    traj_px = (traj * (32 / 5.0) + 16.0).astype(np.float32)
    got = native.rasterize_balls(traj_px, 32, 32, 3.0)
    want = np.stack([_rasterize(tp.astype(np.float64), 32, 32, 3.0)
                     for tp in traj_px])
    # identical up to float32-vs-float64 threshold ties on the circle edge
    mismatch = np.mean(got != want)
    assert mismatch < 1e-3
    assert got.dtype == np.float32


def test_rotate_matches_scipy_bilinear():
    imgs = RNG.rand(5, 28, 28)
    angles = np.array([0.0, 22.5, 90.0, 180.0, 270.0, 333.0])
    got = native.rotate_images(imgs, angles)
    assert got.shape == (5, 6, 28, 28)
    for i in range(5):
        for k, a in enumerate(angles):
            want = ndimage.rotate(imgs[i], a, reshape=False, order=1)
            # compare away from the 1-px border: at exact 90-degree
            # multiples scipy rounds boundary source coords just outside
            # the image and zero-fills, the native kernel keeps them
            np.testing.assert_allclose(got[i, k, 1:-1, 1:-1],
                                       want[1:-1, 1:-1], atol=1e-10)


def test_rotate_identity_at_zero():
    imgs = RNG.rand(3, 16, 16)
    got = native.rotate_images(imgs, np.array([0.0]))
    np.testing.assert_allclose(got[:, 0], imgs, atol=1e-12)
