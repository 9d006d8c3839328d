"""Aux subsystems: diagnostics, temporal features, stats accumulation,
zarr writer (SURVEY.md §5)."""
import os

import numpy as np

from sres_tpu.config import ConfigContext, cfg
from sres_tpu.models.temporal import (featurize_progress, get_day_progress,
                                      get_temporal_features, get_year_progress)
from sres_tpu.trainer.stats import StatsAccumulator
from sres_tpu.util.diagnostics import device_memory_stats, save_memory_snapshot


def test_temporal_features():
    assert get_temporal_features(None) is None
    t = np.array(["2011-09-13", "2011-09-14", "2012-03-13"], dtype="datetime64[D]")
    f = get_temporal_features(t)
    assert f.shape == (3, 4)
    np.testing.assert_allclose(f[0], [0, 1, 0, 1], atol=1e-6)   # t0: sin=0 cos=1
    np.testing.assert_allclose(f[1, :2], [0, 1], atol=1e-5)     # +1 day: day wraps


def test_progress_features():
    secs = np.array([0.0, 43200.0, 86400.0])
    dp = get_day_progress(secs, np.array([0.0, 180.0]))
    assert dp.shape == (3, 2)
    np.testing.assert_allclose(dp[0], [0.0, 0.5])
    np.testing.assert_allclose(dp[1], [0.5, 0.0], atol=1e-9)
    yp = get_year_progress(secs)
    assert np.all((0 <= yp) & (yp < 1))
    fz = featurize_progress(yp)
    assert set(fz) == {"progress", "progress_sin", "progress_cos"}


def test_stats_accumulator_weighted_merge(tmp_path):
    acc = StatsAccumulator("high")
    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, (4, 8, 8))
    b = rng.normal(0, 3, (12, 8, 8))
    acc.add_entry("sst", a)
    acc.add_entry("sst", b)
    mean = acc.accumulate("mean")["sst"]
    expect = (4 * a.mean() + 12 * b.mean()) / 16
    np.testing.assert_allclose(mean, expect, rtol=1e-12)
    std = acc.accumulate("std")["sst"]
    expect_std = np.sqrt((4 * a.std() ** 2 + 12 * b.std() ** 2) / 16)
    np.testing.assert_allclose(std, expect_std, rtol=1e-12)
    p = str(tmp_path / "stats" / "mean.nc")
    acc.save("mean", p)
    assert os.path.exists(p)


def test_memory_snapshot(tmp_path):
    ConfigContext.set_defaults(platform="local", task="synthetic-tiles-48",
                               dataset="synthetic", pipeline="sres")
    with ConfigContext("sres", model="edsr",
                       **{"platform.root": str(tmp_path), "pipeline.memory_debug": True}):
        stats = device_memory_stats()
        assert isinstance(stats, dict)
        path = save_memory_snapshot()
        assert path is not None and os.path.exists(path)


def test_training_plot_builds(tmp_path, monkeypatch):
    import matplotlib
    matplotlib.use("Agg")
    from sres_tpu.trainer.results import ResultsAccumulator
    from sres_tpu.view.training import TrainingPlot
    ConfigContext.set_defaults(platform="local", task="synthetic-tiles-48",
                               dataset="synthetic", pipeline="sres")
    with ConfigContext("sres", model="edsr", **{"platform.root": str(tmp_path)}) as cc:
        accum = ResultsAccumulator(cc)
        from sres_tpu.data.inference_io import TSet
        for e in range(5):
            accum.record_losses(TSet.Train, e, 1.0 / (e + 1), 0.5)
            accum.record_losses(TSet.Validation, e, 1.1 / (e + 1), 0.5)
        accum.flush()

        class FakeTrainer:
            results_accum = accum
        fig = TrainingPlot(FakeTrainer())
        assert fig.plot() is not None


def test_legacy_viz_modules():
    """forecast/multiscale/training_results browsers (reference:
    sres/view/{plot/forecast,multiscale,training_results}.py) build against
    LArray results headlessly."""
    import matplotlib
    matplotlib.use("Agg")
    from sres_tpu.util.larray import LArray
    from sres_tpu.view.forecast import mplplot as forecast_plot
    from sres_tpu.view.multiscale import mplplot as multiscale_plot
    from sres_tpu.view.training_results import mplplot_error, rmse_per_tile

    rng = np.random.default_rng(0)
    mk = lambda: LArray(rng.normal(size=(3, 2, 8, 8)).astype(np.float32),
                        ["tiles", "channels", "y", "x"],
                        coords=dict(channels=["SSS", "SST"]))
    target, model = mk(), mk()
    assert forecast_plot(target, ["SSS", "SST"], product=model) is not None
    assert multiscale_plot({"target": target, "model": model}) is not None
    canvas = mplplot_error(target, model, ["SSS", "SST"],
                           norms={"SST": {"mean": 15.0, "std": 2.0}})
    assert canvas is not None
    err = rmse_per_tile(target.data[:, 0] - model.data[:, 0])
    assert err.shape == (3,) and np.all(err > 0)


def test_graphcast_stacking_helpers():
    """dict_to_stacked / stacked_to_dict / normalize_stacked (reference
    GraphCast-derived ops: sres/base/util/ops.py:192-351)."""
    from sres_tpu.util.larray import (LArray, dict_to_stacked, normalize_stacked,
                                      stacked_to_dict)
    rng = np.random.default_rng(0)
    sss = LArray(rng.normal(35, 1, (4, 8, 8)).astype(np.float32), ["tiles", "y", "x"])
    sst = LArray(rng.normal(15, 2, (4, 8, 8)).astype(np.float32), ["tiles", "y", "x"])
    stacked = dict_to_stacked({"SST": sst, "SSS": sss})
    assert stacked.dims == ("channels", "tiles", "y", "x")
    assert list(stacked.coords["channels"]) == ["SSS", "SST"]   # sorted order
    np.testing.assert_array_equal(stacked.data[0], sss.data)
    back = stacked_to_dict(stacked)
    np.testing.assert_array_equal(back["SST"].data, sst.data)
    normed = normalize_stacked({"SST": sst, "SSS": sss},
                               scales={"SST": 2.0, "SSS": 1.0},
                               means={"SST": 15.0, "SSS": 35.0})
    assert abs(float(normed["SST"].data.mean())) < 0.2
    np.testing.assert_allclose(normed["SSS"].data, sss.data - 35.0, rtol=1e-6)


def test_result_browsers_refresh_and_click(tmp_path):
    """Tile/image browsers (reference: sres/view/plot/{tiles,images}.py):
    stepping time/tile refreshes imshow data, clims AND the RMSE/loss
    titles; the image browser wires the button_press click callback."""
    import matplotlib
    matplotlib.use("Agg")
    from sres_tpu.data.inference_io import ResultStructure, TSet, save_inference_results
    from sres_tpu.util.larray import LArray
    from sres_tpu.view.images import ResultImagePlot
    from sres_tpu.view.tiles import ResultTilePlot

    ConfigContext.set_defaults(platform="local", task="synthetic-tiles-48",
                               dataset="synthetic", pipeline="sres")
    with ConfigContext("sres", model="edsr", **{"platform.root": str(tmp_path)}):
        rng = np.random.default_rng(0)
        mk = lambda scale=1.0: LArray(
            (scale * rng.normal(size=(3, 16, 16))).astype(np.float32),
            ["tiles", "y", "x"])
        for t in (0, 1):
            save_inference_results(
                "SST", ResultStructure.Tiles,
                {"input": mk(), "target": mk(), "interpolated": mk(),
                 "model": mk(10.0 if t else 1.0)},
                t, dict(model=0.1 * (t + 1), interpolated=0.2))

        class FakeTrainer:
            target_variables = ["SST"]
            data_timestamps = {TSet.Train: [0, 1]}

            def process_image(self, tset, itime, var=None, **kw):
                img = lambda: LArray(rng.normal(size=(16, 16)).astype(np.float32),
                                     ["y", "x"])
                return ({"SST": {"input": img(), "target": img(),
                                 "interpolated": img(), "model": img()}},
                        {"SST": dict(model=0.05 * (itime + 1), interpolated=0.1)})

        tp = ResultTilePlot(FakeTrainer(), TSet.Validation)
        assert tp.plot() is not None
        t0_title = tp._axes["model"].get_title()
        assert "rmse=" in t0_title
        tp._set_time(1)          # model panel scale jumps 10x -> rmse changes
        assert tp._axes["model"].get_title() != t0_title
        before = np.asarray(tp.ims["model"].get_array())
        tp._set_tile(1)
        assert not np.array_equal(np.asarray(tp.ims["model"].get_array()), before)

        ip = ResultImagePlot(FakeTrainer(), TSet.Validation, "SST")
        assert ip.plot() is not None
        assert "loss=50.000" in ip._axes["model"].get_title()
        ip._set_time(1)
        assert "loss=100.000" in ip._axes["model"].get_title()

        # click callback is wired and handles events without raising
        class Ev:
            button, xdata, ydata = 1, 3.0, 4.0
        ip.select_point(Ev())


def test_profile_step_trace_parser(tmp_path):
    """scripts/bench/profile_step.py's perfetto parser buckets device-op
    wall time (validated against a synthetic trace with host + TPU
    tracks — host events must be excluded)."""
    import gzip
    import importlib.util
    import json
    import os as _os

    spec = importlib.util.spec_from_file_location(
        "profile_step", _os.path.join(_os.path.dirname(__file__), "..",
                                      "scripts", "bench", "profile_step.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    events = [
        {"ph": "M", "pid": 1, "name": "process_name", "args": {"name": "/host:CPU"}},
        {"ph": "M", "pid": 2, "name": "process_name", "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 2, "tid": 7, "name": "thread_name", "args": {"name": "XLA Ops"}},
        # host event: excluded
        {"ph": "X", "pid": 1, "tid": 3, "name": "PjitFunction", "dur": 9999, "ts": 0},
        # device events: bucketed
        {"ph": "X", "pid": 2, "tid": 7, "name": "convolution.42", "dur": 3000, "ts": 0},
        {"ph": "X", "pid": 2, "tid": 7, "name": "fusion.convert.7", "dur": 1000, "ts": 10},
        {"ph": "X", "pid": 2, "tid": 7, "name": "copy.3", "dur": 500, "ts": 20},
    ]
    d = tmp_path / "plugins" / "profile" / "run"
    d.mkdir(parents=True)
    with gzip.open(d / "perfetto_trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)

    totals, nops, sources = mod.parse_perfetto(str(tmp_path))
    assert nops == 3
    assert abs(totals["convolutions (fwd+dx+dW)"] - 3.0) < 1e-9
    assert abs(totals["convert+reduce fusions"] - 1.0) < 1e-9
    assert abs(totals["copies"] - 0.5) < 1e-9
    assert sum(totals.values()) < 5.0   # host 9999us excluded
    # hlo_category + source provenance take priority when present
    import gzip, json
    ev2 = [
        {"ph": "M", "pid": 2, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 2, "tid": 7, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "X", "pid": 2, "tid": 7, "name": "fusion.1", "dur": 2000,
         "ts": 0, "args": {"hlo_category": "convolution fusion",
                           "source": "/a/b/resize.py:10"}},
    ]
    d2 = tmp_path / "two" / "plugins" / "profile" / "run"
    d2.mkdir(parents=True)
    with gzip.open(d2 / "perfetto_trace.json.gz", "wt") as f:
        json.dump({"traceEvents": ev2}, f)
    t2, n2, s2 = mod.parse_perfetto(str(tmp_path / "two"))
    assert n2 == 1 and abs(t2["convolution fusion"] - 2.0) < 1e-9
    assert abs(s2["resize.py:10"] - 2.0) < 1e-9
