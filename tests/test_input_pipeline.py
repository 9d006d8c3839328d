"""Host input-pipeline backends (sres_tpu/data/input_pipeline.py): the
threads backend must reproduce the reference-sequential batch stream
bit-for-bit (same xyflip RNG draw order — reference: source/batch.py:37-49),
grain must gate cleanly when absent, and the glue must honor the trainer's
missing-batch `break` contract."""
import sys
import types

import numpy as np
import pytest

from sres_tpu.config import ConfigContext
from sres_tpu.data.inference_io import TSet
from sres_tpu.data.input_pipeline import BACKENDS, grain_available, iter_pipelined
from sres_tpu.trainer import ModelTrainer


# ------------------------------------------------------------------ unit
def test_sync_threads_equal_streams():
    items = list(range(20))
    produce = lambda x: ("item", x * x)
    a = list(iter_pipelined(produce, iter(items), "sync"))
    b = list(iter_pipelined(produce, iter(items), "threads", depth=3))
    assert a == b == [("item", x * x) for x in items]


def test_none_stops_stream_early():
    produce = lambda x: None if x == 5 else x
    for backend in ("sync", "threads"):
        assert list(iter_pipelined(produce, iter(range(20)), backend)) == \
            [0, 1, 2, 3, 4]


def test_producer_exception_propagates():
    def produce(x):
        if x == 3:
            raise RuntimeError("boom")
        return x

    for backend in ("sync", "threads"):
        it = iter_pipelined(produce, iter(range(10)), backend)
        got = []
        with pytest.raises(RuntimeError, match="boom"):
            for v in it:
                got.append(v)
        assert got == [0, 1, 2]


def test_consumer_break_unblocks_producer():
    # depth=1: the producer blocks on q.put; abandoning the iterator must
    # release it (generator close path)
    produced = []

    def produce(x):
        produced.append(x)
        return x

    it = iter_pipelined(produce, iter(range(100)), "threads", depth=1)
    assert next(it) == 0
    it.close()
    assert len(produced) < 100


def test_invalid_backend_rejected():
    with pytest.raises(ValueError, match="input_backend"):
        list(iter_pipelined(lambda x: x, iter([1]), "dali"))
    assert set(BACKENDS) == {"sync", "threads", "grain"}


def test_grain_backend_falls_back_when_absent():
    if grain_available():  # pragma: no cover - grain not in this image
        pytest.skip("grain installed; fallback path not reachable")
    out = list(iter_pipelined(lambda x: x + 1, iter(range(5)), "grain"))
    assert out == [1, 2, 3, 4, 5]


def test_grain_glue_with_stub_module(monkeypatch):
    """Exercise the grain code path via a minimal stub of the
    MapDataset.source().map().to_iter_dataset() API."""

    class FakeMapDataset:
        def __init__(self, src):
            self.src, self.fn = src, None

        @staticmethod
        def source(s):
            return FakeMapDataset(list(s))

        def map(self, fn):
            self.fn = fn
            return self

        def to_iter_dataset(self, read_options=None):
            assert read_options.num_threads == 2
            assert read_options.prefetch_buffer_size == 4
            return (self.fn(x) for x in self.src)

    class FakeReadOptions:
        def __init__(self, num_threads=1, prefetch_buffer_size=1):
            self.num_threads = num_threads
            self.prefetch_buffer_size = prefetch_buffer_size

    fake_pkg = types.ModuleType("grain")
    fake_py = types.ModuleType("grain.python")
    fake_py.MapDataset = FakeMapDataset
    fake_py.ReadOptions = FakeReadOptions
    fake_pkg.python = fake_py
    monkeypatch.setitem(sys.modules, "grain", fake_pkg)
    monkeypatch.setitem(sys.modules, "grain.python", fake_py)

    produce = lambda x: None if x == 3 else 10 * x
    out = list(iter_pipelined(produce, iter(range(6)), "grain",
                              depth=4, workers=2))
    assert out == [0, 10, 20]  # stops at the first None like the sync path


# ------------------------------------------------------------ integration
def _ctx(tmp_path, tag, backend):
    ConfigContext.set_defaults(platform="local", task="synthetic-tiles-48",
                               dataset="synthetic", pipeline="sres")
    over = {
        "platform.root": str(tmp_path / tag),
        "dataset.image_size": {"y": 144, "x": 96},
        "dataset.ntimes": 3, "dataset.nan_fraction": 0.1,
        "task.tile_size": {"x": 12, "y": 12}, "task.batch_size": 4,
        "task.xyflip": True,
        "task.ttsplit": {"train": 1.0, "valid": 0.0, "test": 0.0},
        "model.nfeatures": 8, "model.nlayers": 1,
        "pipeline.precision": "f32",
        "pipeline.input_backend": backend,
        "pipeline.input_depth": 2,
    }
    return ConfigContext("sres", model="edsr", **over)


def _run(tmp_path, tag, backend, seed=7):
    with _ctx(tmp_path, tag, backend) as cc:
        t = ModelTrainer(cc, seed=seed)
        t.train(nepochs=2, refresh_state=True, seed=seed)
        return [r.loss for r in t.results_accum.results if r.tset == TSet.Train]


def test_threads_backend_bit_identical_training(tmp_path):
    """The single-producer-thread pipeline preserves the xyflip draw order and
    batch sequence exactly: seeded trajectories match sync bit-for-bit."""
    a = _run(tmp_path, "sync", "sync")
    b = _run(tmp_path, "thr", "threads")
    np.testing.assert_allclose(a, b, rtol=0, atol=0)
    assert len(a) > 0


def test_grain_backend_trains_deterministically(tmp_path):
    """grain (→ threads fallback here) uses per-tile flip seeds: still a
    deterministic seeded trajectory, self-consistent across runs."""
    a = _run(tmp_path, "g1", "grain")
    b = _run(tmp_path, "g2", "grain")
    np.testing.assert_allclose(a, b, rtol=0, atol=0)
    assert len(a) > 0


def test_flip_index_for_stable():
    ConfigContext.set_defaults(platform="local", task="synthetic-tiles-48",
                               dataset="synthetic", pipeline="sres")
    with ConfigContext("sres", model="edsr") as cc:
        from sres_tpu.data.batch import BatchDataset
        from sres_tpu.config import cfg
        ds = BatchDataset(cfg().task, seed=3)
        i1 = ds.flip_index_for(0, dict(start=0, end=4))
        assert i1 == ds.flip_index_for(0, dict(start=0, end=4))
        assert 0 <= i1 < 8
        others = {ds.flip_index_for(t, dict(start=s, end=s + 4))
                  for t in range(4) for s in range(0, 32, 4)}
        assert len(others) > 1  # varies across tiles/times
