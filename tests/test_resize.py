"""Golden-value tests: the matmul-based resize must match
torch.nn.functional.interpolate exactly (the reference's LR-synthesis /
baseline path, sres/base/util/array.py:72-93). torch (CPU) is available in
the test environment, so we compare against it directly rather than against
stored arrays."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from sres_tpu.ops.resize import downsample, multiscale_targets, resize, upsample


def _torch_interp(x_nhwc: np.ndarray, scale: float, mode: str) -> np.ndarray:
    t = torch.tensor(x_nhwc.transpose(0, 3, 1, 2), dtype=torch.float32)
    y = F.interpolate(t, scale_factor=scale, mode=mode)
    return y.numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize("mode", ["bicubic", "bilinear", "nearest"])
@pytest.mark.parametrize("scale", [4, 2, 3])
def test_downsample_matches_torch(mode, scale):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 48 * scale, 48 * scale, 3)).astype(np.float32)
    ours = np.asarray(downsample(x, float(scale), mode))
    ref = _torch_interp(x, 1.0 / scale, mode)
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("mode", ["bicubic", "bilinear", "nearest"])
@pytest.mark.parametrize("scale", [4, 2])
def test_upsample_matches_torch(mode, scale):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 48, 48, 2)).astype(np.float32)
    ours = np.asarray(upsample(x, float(scale), mode))
    ref = _torch_interp(x, float(scale), mode)
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)


def test_fractional_downsample_matches_torch():
    """data_downsample sweeps use non-integer factors like 1.05
    (reference: scripts/inference/scaling_results-swot-1.1v_20-20e.py:14)."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 192, 192, 1)).astype(np.float32)
    for ds in [1.05, 1.1, 1.25, 1.5]:
        ours = np.asarray(downsample(x, ds, "bicubic"))
        ref = _torch_interp(x, 1.0 / ds, "bicubic")
        assert ours.shape == ref.shape
        # fractional scales: same f32 coordinates/weights as torch, but the
        # separable two-matmul accumulation orders f32 sums differently →
        # ~1e-4 abs; integer scales (the training hot path) match to 2e-5.
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-4)


def test_round_trip_shapes():
    x = np.zeros((4, 192, 192, 1), np.float32)
    lr = downsample(x, 4.0)
    assert lr.shape == (4, 48, 48, 1)
    hr = upsample(np.asarray(lr), 4.0)
    assert hr.shape == x.shape


def test_multiscale_targets():
    hr = np.zeros((2, 192, 192, 1), np.float32)
    tgts = multiscale_targets(hr, [2, 2])
    assert [t.shape[1] for t in tgts] == [96, 192]


def test_resize_explicit_size():
    x = np.random.default_rng(3).normal(size=(1, 50, 70, 1)).astype(np.float32)
    y = resize(x, (25, 35), "bilinear")
    t = F.interpolate(torch.tensor(x.transpose(0, 3, 1, 2)), size=(25, 35), mode="bilinear")
    np.testing.assert_allclose(np.asarray(y)[..., 0], t.numpy()[:, 0], rtol=2e-5, atol=2e-5)


def test_pixel_shuffle_matches_torch():
    """NHWC pixel shuffle must reproduce torch's NCHW PixelShuffle channel
    order (weights converted from reference checkpoints depend on it)."""
    from sres_tpu.ops.shuffle import pixel_shuffle, pixel_unshuffle
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 16, 4, 4)).astype(np.float32)  # NCHW, C=16, r=2
    t = F.pixel_shuffle(torch.tensor(x), 2).numpy()
    ours = np.asarray(pixel_shuffle(x.transpose(0, 2, 3, 1), 2)).transpose(0, 3, 1, 2)
    np.testing.assert_array_equal(ours, t)
    back = np.asarray(pixel_unshuffle(np.asarray(
        pixel_shuffle(x.transpose(0, 2, 3, 1), 2)), 2))
    np.testing.assert_array_equal(back, x.transpose(0, 2, 3, 1))
