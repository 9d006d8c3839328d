"""Multi-host input sharding (SURVEY §7 build-order #5, round-1 verdict #6).

Launches REAL multi-process jax (2 processes × 2 virtual CPU devices each,
jax.distributed.initialize over localhost) running the full ModelTrainer on
the synthetic dataset: every host builds the same seeded batch sequence and
transfers only its slice (parallel/mesh.py:make_global_batch /
jax.make_array_from_process_local_data). The training trajectory must match
a single-process run on the same 4-device mesh to float tolerance.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys, json
pid, nproc, port, root = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
if nproc > 1:
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
from sres_tpu.config import ConfigContext
from sres_tpu.trainer import ModelTrainer

ConfigContext.set_defaults(platform="local", task="synthetic-tiles-48",
                           dataset="synthetic", pipeline="sres")
over = {
    "platform.root": root,
    "dataset.image_size": {"y": 144, "x": 144}, "dataset.ntimes": 4,
    "dataset.nan_fraction": 0.0,
    "task.tile_size": {"x": 12, "y": 12}, "task.batch_size": 4,
    "task.lr": 2e-3, "task.nepochs": 3,
    "task.ttsplit": {"train": 0.75, "valid": 0.25, "test": 0.0},
    "model.nfeatures": 16, "model.nlayers": 2,
    "pipeline.precision": "f32",
}
with ConfigContext("sres", model="edsr", **over) as cc:
    # per-host DIVERGENT seeds (process 0 gets 0): sync_seed must broadcast
    # process 0's value so every host builds the same batch sequence — the
    # real hazard with the reference's time-based default seed
    trainer = ModelTrainer(cc, seed=17 * pid)
    out = trainer.train(nepochs=3, refresh_state=True, seed=17 * pid)
    if pid == 0:
        with open(f"{root}/loss_{nproc}.json", "w") as f:
            json.dump({"loss": float(out["prediction"]),
                       "ndata": trainer.ndata,
                       "nproc": jax.process_count()}, f)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_training_matches_single(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = "/root/repo"
    env["JAX_PLATFORMS"] = "cpu"

    # single-process baseline on an identical 4-device mesh... except the
    # worker forces 2 devices; run it with 4 for the same data-axis size
    env1 = dict(env)
    root1 = str(tmp_path / "single")
    r = subprocess.run([sys.executable, "-c",
                        WORKER.replace('--xla_force_host_platform_device_count=2',
                                       '--xla_force_host_platform_device_count=4'),
                        "0", "1", "0", root1],
                       env=env1, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]

    port = _free_port()
    root2 = str(tmp_path / "multi")
    procs = [subprocess.Popen([sys.executable, str(worker), str(i), "2", str(port), root2],
                              env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se[-3000:]

    single = json.load(open(f"{root1}/loss_1.json"))
    multi = json.load(open(f"{root2}/loss_2.json"))
    assert multi["nproc"] == 2 and multi["ndata"] == 4 == single["ndata"]
    assert np.isfinite(multi["loss"])
    # same global mesh size → same reduction structure; float-level agreement
    np.testing.assert_allclose(multi["loss"], single["loss"], rtol=1e-5, atol=1e-6)
