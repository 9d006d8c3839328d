"""Multi-device (8 virtual CPU) parallelism tests: the sharded train step
matches a single-device step bit-for-bit, the mesh builds correctly, and
full-region multi-chip inference with on-device assembly agrees with the
host-assembly path (SURVEY.md §2.10 / BASELINE config #5)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh

from sres_tpu.config import ConfigContext, cfg
from sres_tpu.models import build_model
from sres_tpu.parallel.mesh import get_mesh, pad_to_multiple
from sres_tpu.trainer.step import (StepConfig, build_train_step, init_state)


def _tiny_setup():
    mcfg = dict(name="rcan", nfeatures=16, nlayers=1, nblocks=2, cbottleneck=2,
                kernel_size=3, downscale_factors=[2, 2], loss_fn="l2")
    model = build_model(mcfg, 1, 1, precision="f32")
    sc = StepConfig(4, (2, 2), "bicubic", "bicubic", "l2", 1.0, (0,), 1, False)
    opt = optax.adam(1e-3)
    state, _ = init_state(model, opt, jnp.zeros((1, 12, 12, 1)), seed=0)
    return model, sc, opt, state


def test_mesh_construction():
    mesh = get_mesh({"data": -1})
    assert mesh.shape["data"] == len(jax.devices()) == 8
    assert pad_to_multiple(36, 8) == 40


def test_sharded_step_matches_single_device():
    model, sc, opt, state = _tiny_setup()
    rng = np.random.default_rng(0)
    hr = jnp.asarray(rng.normal(size=(16, 1, 48, 48)).astype(np.float32))
    w = jnp.ones((16,), jnp.float32)

    mesh8 = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    s8, m8 = build_train_step(model, opt, sc, mesh8)(state, hr, w)
    _, sc2, _, state2 = _tiny_setup()
    s1, m1 = build_train_step(model, opt, sc, mesh1)(state2, hr, w)

    np.testing.assert_allclose(float(m8["mloss"]), float(m1["mloss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s8.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-6)


def test_padded_weights_do_not_affect_gradients():
    """Zero-weight padding tiles must not change the update."""
    model, sc, opt, state = _tiny_setup()
    rng = np.random.default_rng(1)
    hr = rng.normal(size=(8, 1, 48, 48)).astype(np.float32)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    step = build_train_step(model, opt, sc, mesh)

    _, _, _, state_a = _tiny_setup()
    sa, ma = step(state_a, jnp.asarray(hr), jnp.ones((8,), jnp.float32))
    hr_pad = np.concatenate([hr, 1e6 * np.ones((8, 1, 48, 48), np.float32)])
    w_pad = np.concatenate([np.ones(8, np.float32), np.zeros(8, np.float32)])
    _, _, _, state_b = _tiny_setup()
    sb, mb = step(state_b, jnp.asarray(hr_pad), jnp.asarray(w_pad))
    np.testing.assert_allclose(float(ma["sloss"]), float(mb["sloss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-6)


def test_on_device_region_assembly():
    from sres_tpu.ops.assemble import assemble_tiles
    tiles = jnp.arange(3 * 2 * 2, dtype=jnp.float32).reshape(3, 2, 2)
    ids = jnp.asarray([0, 3, 5])
    w = jnp.ones((3,))
    img = assemble_tiles(tiles, ids, dict(y=2, x=3), w)
    assert img.shape == (4, 6)
    np.testing.assert_allclose(np.asarray(img[0, 0]), 0.0)     # tile 0 top-left
    assert np.isnan(np.asarray(img[0, 2]))                     # slot 1 empty
    np.testing.assert_allclose(np.asarray(img[2, 4]), tiles[2, 0, 0])  # tile 5 → (1,2)


def test_infer_region_multichip(tmp_path):
    """Full-region inference sharded over 8 devices matches the host
    (process_image) assembly."""
    from sres_tpu.trainer import ModelTrainer
    ConfigContext.set_defaults(platform="local", task="synthetic-tiles-48",
                               dataset="synthetic", pipeline="sres")
    over = {
        "platform.root": str(tmp_path),
        "dataset.image_size": {"y": 192, "x": 144},
        "dataset.ntimes": 3, "dataset.nan_fraction": 0.1,
        "task.tile_size": {"x": 12, "y": 12}, "task.batch_size": 4,
        "task.ttsplit": {"train": 0.7, "valid": 0.3, "test": 0.0},
        "task.xyflip": False,
        "model.nfeatures": 8, "model.nlayers": 1,
        "pipeline.precision": "f32",
    }
    with ConfigContext("sres", model="edsr", **over) as cc:
        trainer = ModelTrainer(cc, seed=0)
        trainer.train(nepochs=2, refresh_state=True, seed=0)
        trainer.init_data_timestamps()
        from sres_tpu.data.inference_io import TSet
        ctime = trainer.data_timestamps[TSet.Train][0]
        region = trainer.infer_region(ctime)
        img = region["SST"]["model"]
        assert img.shape == (192, 144)
        assert np.isnan(img.data).any() and np.isfinite(img.data).any()
        # agreement with the host-assembled path
        images, _ = trainer.process_image(TSet.Validation, 0, update_model=False)
        host = images["SST"]["model"].data
        dev = img.data
        both = np.isfinite(host) & np.isfinite(dev)
        np.testing.assert_allclose(dev[both], host[both], rtol=1e-4, atol=1e-4)
        assert (np.isnan(host) == np.isnan(dev)).all()


def test_seamless_inference(tmp_path):
    """Overlapped-halo inference: same region coverage as the grid path, no
    shape surprises, NaN holes only at dropped land tiles."""
    from sres_tpu.trainer import ModelTrainer
    from sres_tpu.data.inference_io import TSet
    ConfigContext.set_defaults(platform="local", task="synthetic-tiles-48",
                               dataset="synthetic", pipeline="sres")
    over = {
        "platform.root": str(tmp_path),
        "dataset.image_size": {"y": 192, "x": 144},
        "dataset.ntimes": 3, "dataset.nan_fraction": 0.1,
        "task.tile_size": {"x": 12, "y": 12}, "task.batch_size": 4,
        "task.ttsplit": {"train": 1.0, "valid": 0.0, "test": 0.0},
        "task.xyflip": False,
        "model.nfeatures": 8, "model.nlayers": 1,
        "pipeline.precision": "f32",
    }
    with ConfigContext("sres", model="edsr", **over) as cc:
        trainer = ModelTrainer(cc, seed=0)
        trainer.train(nepochs=2, refresh_state=True, seed=0)
        trainer.init_data_timestamps()
        ctime = trainer.data_timestamps[TSet.Train][0]
        seamless = trainer.infer_region_seamless(ctime, margin=8)
        img = seamless["SST"]["model"]
        assert img.shape == (192, 144)
        assert np.isfinite(img.data).sum() > 0
        # input panel is the LR mosaic
        assert seamless["SST"]["input"].shape == (48, 36)
        # coverage identical to the non-overlapped device path
        grid_img = trainer.infer_region(ctime)["SST"]["model"]
        assert (np.isnan(grid_img.data) == np.isnan(img.data)).all()


def test_halo_conv2d_matches_unsharded():
    """Spatial parallelism (SURVEY §5.7): H-sharded conv with ppermute halo
    exchange is numerically identical to the unsharded zero-padded conv on
    the 8-device mesh."""
    import jax.numpy as jnp
    from jax import lax
    from sres_tpu.parallel.mesh import get_mesh
    from sres_tpu.parallel.spatial import halo_conv2d

    mesh = get_mesh({"data": 8})
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 24, 8)).astype(np.float32))
    for k in (3, 5):
        w = jnp.asarray(rng.normal(size=(k, k, 8, 16)).astype(np.float32) * 0.1)
        dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        want = lax.conv_general_dilated(x, w, (1, 1),
                                        [(k // 2, k // 2)] * 2,
                                        dimension_numbers=dn)
        got = halo_conv2d(x, w, mesh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_infer_region_sharded_matches_unsharded():
    """Whole-model spatial partitioning: RCAN (convs + global-pool channel
    attention + pixel shuffle) on an H-sharded region under GSPMD matches
    the single-device forward bitwise-ish; output sharding is preserved."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from sres_tpu.models import build_model
    from sres_tpu.parallel.mesh import get_mesh
    from sres_tpu.parallel.spatial import infer_region_sharded

    mcfg = dict(name="rcan", nfeatures=16, nlayers=2, nblocks=2, cbottleneck=2,
                kernel_size=3, downscale_factors=[2, 2], loss_fn="l2")
    model = build_model(mcfg, 1, 1, precision="f32")
    rng = np.random.default_rng(0)
    region = jnp.asarray(rng.normal(size=(1, 64, 24, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), region, train=False)
    want = model.apply(variables, region, train=False)

    mesh = get_mesh({"spatial": 8})
    got = infer_region_sharded(model, variables, region, mesh)
    assert tuple(got.sharding.spec)[:2] == (None, "spatial")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_2d_mesh_dp_sp_train_step_matches():
    """pipeline.mesh {data: 4, spatial: 2}: the SAME build_train_step /
    build_eval_step shards the batch over 'data' AND each tile's H over
    'spatial' (parallel/mesh.py:image_sharding); GSPMD inserts the conv halo
    exchanges. Update + metrics match the single-device step."""
    import jax
    import jax.numpy as jnp
    import optax
    from sres_tpu.models import build_model
    from sres_tpu.parallel.mesh import get_mesh
    from sres_tpu.trainer.step import (StepConfig, build_eval_step,
                                       build_train_step, init_state)

    mcfg = dict(name="rcan", nfeatures=16, nlayers=1, nblocks=2, cbottleneck=2,
                kernel_size=3, downscale_factors=[2, 2], loss_fn="l2")
    model = build_model(mcfg, 1, 1, precision="f32")
    opt = optax.adam(1e-3)
    state, has_bn = init_state(model, opt, jnp.zeros((1, 24, 24, 1), jnp.float32),
                               seed=0)
    sc = StepConfig(scale=4, downscale_factors=(2, 2), down_mode="bicubic",
                    up_mode="bicubic", loss_fn="l2", data_downsample=1.0,
                    target_idx=(0,), nchannels_in=1, has_bn=has_bn)
    mesh2d = get_mesh({"data": 4, "spatial": 2})
    step2d = build_train_step(model, opt, sc, mesh2d)
    step1 = build_train_step(model, opt, sc, mesh=None)

    rng = np.random.default_rng(0)
    hr = jnp.asarray(rng.normal(size=(8, 1, 96, 96)).astype(np.float32))
    w = jnp.ones((8,), jnp.float32)
    s1, m1 = step1(jax.tree.map(jnp.copy, state), hr, w)
    s2, m2 = step2d(jax.tree.map(jnp.copy, state), hr, w)
    np.testing.assert_allclose(float(m2["mloss"]), float(m1["mloss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    # eval outputs keep the dp x sp sharding
    ev = build_eval_step(model, sc, mesh2d)
    metrics, outs = ev(s2, hr, w)
    assert np.isfinite(float(metrics["mloss"]))
    assert "spatial" in str(outs[1].sharding.spec)


def test_2d_mesh_trainer_end_to_end(tmp_path):
    """Full ModelTrainer run on pipeline.mesh {data: 4, spatial: 2}: the
    staging/padding/input paths feed the 2D-sharded step end-to-end."""
    from sres_tpu.trainer import ModelTrainer
    ConfigContext.set_defaults(platform="local", task="synthetic-tiles-48",
                               dataset="synthetic", pipeline="sres")
    over = {
        "platform.root": str(tmp_path),
        "dataset.image_size": {"y": 144, "x": 144},
        "dataset.ntimes": 4, "dataset.nan_fraction": 0.0,
        "task.tile_size": {"x": 12, "y": 12}, "task.batch_size": 4,
        "task.ttsplit": {"train": 0.75, "valid": 0.25, "test": 0.0},
        "model.nfeatures": 8, "model.nlayers": 1,
        "pipeline.precision": "f32",
        "pipeline.mesh": {"data": 4, "spatial": 2},
    }
    with ConfigContext("sres", model="edsr", **over) as cc:
        trainer = ModelTrainer(cc, seed=0)
        assert dict(trainer.mesh.shape) == {"data": 4, "spatial": 2}
        out = trainer.train(nepochs=3, refresh_state=True, seed=0)
        assert np.isfinite(out["prediction"]) and out["prediction"] > 0


def test_infer_region_spatial_end_to_end(tmp_path):
    """trainer.infer_region_spatial: the whole region through the network as
    ONE H-sharded image (no tiling, no seams). Panels are full-region, NaN
    holes preserved, and the model panel agrees with the tiled seamless
    path where both are finite (different receptive-field context at tile
    borders → loose tolerance away from them is not meaningful; we check
    shapes, masks, and that values are in the denormalized data range)."""
    from sres_tpu.trainer import ModelTrainer
    from sres_tpu.data.inference_io import TSet
    ConfigContext.set_defaults(platform="local", task="synthetic-tiles-48",
                               dataset="synthetic", pipeline="sres")
    over = {
        "platform.root": str(tmp_path),
        "dataset.image_size": {"y": 192, "x": 144},
        "dataset.ntimes": 3, "dataset.nan_fraction": 0.1,
        "task.tile_size": {"x": 12, "y": 12}, "task.batch_size": 4,
        "task.ttsplit": {"train": 1.0, "valid": 0.0, "test": 0.0},
        "task.xyflip": False,
        "model.nfeatures": 8, "model.nlayers": 1,
        "pipeline.precision": "f32",
        "pipeline.mesh": {"data": 4, "spatial": 2},
    }
    with ConfigContext("sres", model="edsr", **over) as cc:
        trainer = ModelTrainer(cc, seed=0)
        trainer.train(nepochs=2, refresh_state=True, seed=0)
        trainer.init_data_timestamps()
        ctime = trainer.data_timestamps[TSet.Train][0]
        res = trainer.infer_region_spatial(ctime)
        img = res["SST"]["model"]
        assert img.shape == (192, 144)
        assert res["SST"]["input"].shape == (48, 36)
        assert np.isnan(img.data).any() and np.isfinite(img.data).any()
        # NaN holes follow the raw region
        tgt = res["SST"]["target"]
        assert (np.isnan(tgt.data) == np.isnan(img.data)).all()
        # denormalized values live in the target's data range (loose)
        fin = np.isfinite(img.data)
        lo, hi = np.nanmin(tgt.data), np.nanmax(tgt.data)
        span = hi - lo
        assert img.data[fin].min() > lo - 2 * span
        assert img.data[fin].max() < hi + 2 * span


def test_compiled_hlo_contains_gradient_collectives():
    """Permanent sharding-regression guard (round-2 verdict item #10): the
    data-sharded train step's COMPILED module must contain all-reduces (the
    gradient psum GSPMD inserts), and the 2D dp×sp step must additionally
    carry halo-exchange communication (collective-permute or all-reduce
    variants on the spatial axis). If a sharding annotation regresses to
    replicated-everything or sharded-nothing, these disappear and this test
    fails loudly."""
    model, sc, opt, state = _tiny_setup()
    hr = jnp.zeros((16, 1, 48, 48), jnp.float32)
    w = jnp.ones((16,), jnp.float32)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    step = build_train_step(model, opt, sc, mesh)
    txt = step.lower(state, hr, w).compile().as_text()
    assert "all-reduce" in txt, "no gradient all-reduce in compiled HLO"

    from sres_tpu.parallel.mesh import get_mesh
    mesh2d = get_mesh({"data": 4, "spatial": 2})
    _, sc2, opt2, state2 = _tiny_setup()
    step2 = build_train_step(model, opt2, sc, mesh2d)
    txt2 = step2.lower(state2, hr, w).compile().as_text()
    assert "all-reduce" in txt2
    halo = ("collective-permute" in txt2) or ("all-to-all" in txt2) \
        or txt2.count("all-reduce") > txt.count("all-reduce")
    assert halo, "no spatial-halo communication in the 2D-mesh compiled HLO"


def test_shard_map_step_matches_gspmd():
    """pipeline.shard_map: the model apply runs per data-shard inside
    shard_map (guaranteed per-shard execution of pallas kernels under dp;
    trainer/step.py:_apply) — one step matches the GSPMD-partitioned step
    to f32 roundoff, for both the direct and the winograd trunk."""
    from sres_tpu.models import build_model
    for extra in ({}, {"lane_pack": 2, "nfeatures": 64, "winograd": 4}):
        mcfg = dict(dict(name="rcan", nfeatures=8, nlayers=1, nblocks=1,
                         cbottleneck=2, kernel_size=3,
                         downscale_factors=[2, 2], loss_fn="l2"), **extra)
        model = build_model(mcfg, 1, 1, precision="f32")
        sc = StepConfig(4, (2, 2), "bicubic", "bicubic", "l2", 1.0, (0,), 1,
                        False)
        opt = optax.adam(1e-3)
        hw = 8 if extra else 48
        rng = np.random.default_rng(0)
        hr = jnp.asarray(rng.normal(size=(16, 1, hw, hw)).astype(np.float32))
        w = jnp.ones((16,), jnp.float32)
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
        state_a, _ = init_state(model, opt, jnp.zeros((2, hw // 4, hw // 4, 1)), seed=0)
        state_b, _ = init_state(model, opt, jnp.zeros((2, hw // 4, hw // 4, 1)), seed=0)
        sa, ma = build_train_step(model, opt, sc, mesh, smap=True)(state_a, hr, w)
        sb, mb = build_train_step(model, opt, sc, mesh)(state_b, hr, w)
        np.testing.assert_allclose(float(ma["mloss"]), float(mb["mloss"]),
                                   rtol=1e-5)
        for a, b in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=2e-6)


def test_infer_region_step_reused_across_calls(tmp_path):
    """infer_region must reuse its jitted step across timeslices (round-4
    fix: a fresh closure per call retraced + RECOMPILED the whole region
    program every call — measured 70-100 s each through the axon tunnel,
    scripts/bench/region_infer_bench.py)."""
    from sres_tpu.data.inference_io import TSet
    from sres_tpu.trainer import ModelTrainer
    ConfigContext.set_defaults(platform="local", task="synthetic-tiles-48",
                               dataset="synthetic", pipeline="sres")
    over = {
        "platform.root": str(tmp_path),
        "dataset.image_size": {"y": 96, "x": 96},
        "dataset.ntimes": 3, "dataset.nan_fraction": 0.1,
        "task.tile_size": {"x": 12, "y": 12}, "task.batch_size": 4,
        "task.ttsplit": {"train": 0.7, "valid": 0.3, "test": 0.0},
        "task.xyflip": False,
        "model.nfeatures": 8, "model.nlayers": 1,
        "pipeline.precision": "f32",
    }
    with ConfigContext("sres", model="edsr", **over) as cc:
        trainer = ModelTrainer(cc, seed=0)
        trainer.init_data_timestamps()
        ctimes = trainer.data_timestamps[TSet.Train]
        r1 = trainer.infer_region(ctimes[0])
        assert len(trainer._region_step_cache) == 1
        fn = next(iter(trainer._region_step_cache.values()))
        r2 = trainer.infer_region(ctimes[1 % len(ctimes)])
        assert len(trainer._region_step_cache) == 1
        assert next(iter(trainer._region_step_cache.values())) is fn
        img = r2["SST"]["model"]
        assert np.isfinite(img.data).any()


def test_infer_region_sharded_apply_cached():
    """parallel.spatial.infer_region_sharded reuses its jitted apply per
    (model, mesh, axis) instead of retracing every region call."""
    from sres_tpu.parallel import spatial
    mcfg = dict(name="edsr", nfeatures=8, nlayers=1, nblocks=2,
                kernel_size=3, downscale_factors=[2, 2], loss_fn="l2")
    model = build_model(mcfg, 1, 1, precision="f32")
    state, _ = init_state(model, optax.adam(1e-3),
                          jnp.zeros((1, 16, 16, 1)), seed=0)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 64, 16, 1)).astype(np.float32))
    spatial._APPLY_CACHE.clear()
    y1 = spatial.infer_region_sharded(model, {"params": state.params}, x, mesh)
    assert len(spatial._APPLY_CACHE) == 1
    fn = next(iter(spatial._APPLY_CACHE.values()))
    y2 = spatial.infer_region_sharded(model, {"params": state.params}, x, mesh)
    assert next(iter(spatial._APPLY_CACHE.values())) is fn
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_infer_region_stream_matches_per_call(tmp_path):
    """infer_region_stream (prefetch-pipelined multi-timeslice inference)
    yields bitwise the same images as repeated infer_region calls, in
    timeslice order, reusing the same cached jitted step."""
    from sres_tpu.data.inference_io import TSet
    from sres_tpu.trainer import ModelTrainer
    ConfigContext.set_defaults(platform="local", task="synthetic-tiles-48",
                               dataset="synthetic", pipeline="sres")
    over = {
        "platform.root": str(tmp_path),
        "dataset.image_size": {"y": 96, "x": 96},
        "dataset.ntimes": 4, "dataset.nan_fraction": 0.1,
        "task.tile_size": {"x": 12, "y": 12}, "task.batch_size": 4,
        "task.ttsplit": {"train": 0.75, "valid": 0.25, "test": 0.0},
        "task.xyflip": False,
        "model.nfeatures": 8, "model.nlayers": 1,
        "pipeline.precision": "f32",
    }
    with ConfigContext("sres", model="edsr", **over) as cc:
        trainer = ModelTrainer(cc, seed=0)
        trainer.init_data_timestamps()
        ctimes = list(trainer.data_timestamps[TSet.Train])[:3]
        expected = [(ct, trainer.infer_region(ct)) for ct in ctimes]
        streamed = list(trainer.infer_region_stream(ctimes, prefetch=2))
        assert len(trainer._region_step_cache) == 1
        assert [ct for ct, _ in streamed] == ctimes
        for (ct_e, res_e), (ct_s, res_s) in zip(expected, streamed):
            assert res_e.keys() == res_s.keys()
            for vname in res_e:
                assert res_e[vname].keys() == res_s[vname].keys()
                for panel in res_e[vname]:
                    np.testing.assert_array_equal(
                        res_e[vname][panel].data, res_s[vname][panel].data,
                        err_msg=f"{vname}/{panel} @ t={ct_s}")


def test_infer_region_stream_overlap_fetch_matches(tmp_path):
    """overlap_fetch=True (dispatch-ahead) yields the same images/order."""
    from sres_tpu.data.inference_io import TSet
    from sres_tpu.trainer import ModelTrainer
    ConfigContext.set_defaults(platform="local", task="synthetic-tiles-48",
                               dataset="synthetic", pipeline="sres")
    over = {
        "platform.root": str(tmp_path),
        "dataset.image_size": {"y": 96, "x": 96},
        "dataset.ntimes": 4, "dataset.nan_fraction": 0.1,
        "task.tile_size": {"x": 12, "y": 12}, "task.batch_size": 4,
        "task.ttsplit": {"train": 0.75, "valid": 0.25, "test": 0.0},
        "task.xyflip": False,
        "model.nfeatures": 8, "model.nlayers": 1,
        "pipeline.precision": "f32",
    }
    with ConfigContext("sres", model="edsr", **over) as cc:
        trainer = ModelTrainer(cc, seed=0)
        trainer.init_data_timestamps()
        ctimes = list(trainer.data_timestamps[TSet.Train])[:3]
        expected = [(ct, trainer.infer_region(ct)) for ct in ctimes]
        streamed = list(trainer.infer_region_stream(ctimes, prefetch=2,
                                                    overlap_fetch=True))
        assert [ct for ct, _ in streamed] == ctimes
        for (_, res_e), (ct_s, res_s) in zip(expected, streamed):
            for vname in res_e:
                for panel in res_e[vname]:
                    np.testing.assert_array_equal(
                        res_e[vname][panel].data, res_s[vname][panel].data,
                        err_msg=f"{vname}/{panel} @ t={ct_s}")
