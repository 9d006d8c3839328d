"""Yearly-H5 MERRA2 datapipe (data/merra2_h5.py — working rebuild of the
reference's dead sres/data/era52merra2.py; see module docstring)."""
from __future__ import annotations

import numpy as np
import pytest

N, C, H, W = 16, 3, 12, 16


@pytest.fixture(scope="module")
def h5env(tmp_path_factory):
    import h5py
    tmp = tmp_path_factory.mktemp("m2h5")
    data = tmp / "data"
    stats = tmp / "stats"
    data.mkdir(), stats.mkdir()
    fields = {}
    for year in (2000, 2001):
        rng = np.random.default_rng(year)
        arr = rng.normal(size=(N, C, H, W)).astype(np.float32)
        arr += np.arange(C, dtype=np.float32)[None, :, None, None] * 10
        with h5py.File(data / f"{year}.h5", "w") as f:
            f.create_dataset("fields", data=arr)
        fields[year] = arr
    mu = np.stack([fields[2000], fields[2001]]).mean(axis=(0, 1, 3, 4))
    sd = np.stack([fields[2000], fields[2001]]).std(axis=(0, 1, 3, 4))
    np.save(stats / "global_means.npy", mu.reshape(1, C, 1, 1))
    np.save(stats / "global_stds.npy", sd.reshape(1, C, 1, 1))
    return dict(data=str(data), stats=str(stats), fields=fields,
                mu=mu, sd=sd)


def test_shapes_stride_and_values(h5env):
    from sres_tpu.data.merra2_h5 import MERRA2H5Datapipe
    dp = MERRA2H5Datapipe(h5env["data"], batch_size=2, num_steps=2, stride=3,
                          shuffle=False)
    # per-year samples truncated by num_steps*stride
    assert dp.num_samples_per_year == N - 6
    assert len(dp) == (2 * (N - 6)) // 2
    invar, outvar = next(iter(dp))
    assert invar.shape == (2, C, H, W)
    assert outvar.shape == (2, 2, C, H, W)
    # sample 0 (unshuffled): year 2000, t=0 → targets at t=3, t=6
    np.testing.assert_array_equal(invar[0], h5env["fields"][2000][0])
    np.testing.assert_array_equal(outvar[0, 0], h5env["fields"][2000][3])
    np.testing.assert_array_equal(outvar[0, 1], h5env["fields"][2000][6])


def test_normalization_and_channel_subset(h5env):
    from sres_tpu.data.merra2_h5 import MERRA2H5Datapipe
    dp = MERRA2H5Datapipe(h5env["data"], stats_dir=h5env["stats"],
                          channels=[2, 0], batch_size=1, shuffle=False)
    invar, outvar = next(iter(dp))
    assert invar.shape == (1, 2, H, W)
    want = (h5env["fields"][2000][0][[2, 0]]
            - h5env["mu"][[2, 0], None, None]) / h5env["sd"][[2, 0], None, None]
    np.testing.assert_allclose(invar[0], want, rtol=1e-5)
    # outvar normalized with the same [1,C,1,1] stats broadcast over T
    want_t = (h5env["fields"][2000][1][[2, 0]]
              - h5env["mu"][[2, 0], None, None]) / h5env["sd"][[2, 0], None, None]
    np.testing.assert_allclose(outvar[0, 0], want_t, rtol=1e-5)


def test_patch_size_crops_image(h5env):
    from sres_tpu.data.merra2_h5 import MERRA2H5Datapipe
    dp = MERRA2H5Datapipe(h5env["data"], patch_size=8, shuffle=False)
    invar, _ = next(iter(dp))
    assert invar.shape[-2:] == (8, 16)  # 12→8, 16→16


def test_rank_sharding_is_disjoint_and_complete(h5env):
    from sres_tpu.data.merra2_h5 import MERRA2H5Datapipe
    shards = [MERRA2H5Datapipe(h5env["data"], shuffle=False,
                               process_rank=r, world_size=3).indices
              for r in range(3)]
    allidx = np.concatenate(shards)
    assert len(np.unique(allidx)) == len(allidx)
    assert len(allidx) == 2 * (N - 1)  # num_steps=1, stride=1 default


def test_epoch_seeded_shuffle_identical_across_ranks(h5env):
    from sres_tpu.data.merra2_h5 import MERRA2H5Datapipe
    a = MERRA2H5Datapipe(h5env["data"], batch_size=4, shuffle=True)
    b = MERRA2H5Datapipe(h5env["data"], batch_size=4, shuffle=True)
    ia, _ = next(iter(a))
    ib, _ = next(iter(b))
    np.testing.assert_array_equal(ia, ib)   # same epoch → same permutation
    ia2, _ = next(iter(a))                  # epoch 1 → different permutation
    assert not np.array_equal(ia, ia2)


def test_validation_errors(h5env, tmp_path):
    from sres_tpu.data.merra2_h5 import MERRA2H5Datapipe
    with pytest.raises(IOError, match="does not exist"):
        MERRA2H5Datapipe(str(tmp_path / "nope"))
    with pytest.raises(ValueError, match="out of range"):
        MERRA2H5Datapipe(h5env["data"], channels=[0, 7])
    with pytest.raises(ValueError, match="samples available"):
        MERRA2H5Datapipe(h5env["data"], num_samples_per_year=99)
