"""Checkpoint manager: two rolling slots (train = latest, valid = best-val)
with .backup copies and epoch/itime resume metadata
(reference: sres/controller/checkpoints.py).

TPU-native difference: writes are asynchronous — the device→host fetch is the
only synchronous part; serialization + disk IO run on a worker thread so the
ICI-synchronized step loop never stalls on the filesystem (SURVEY.md §5.4).
"""
from __future__ import annotations

import os
import queue
import shutil
import threading
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

from sres_tpu.config import cfg
from sres_tpu.data.inference_io import TSet
from sres_tpu.trainer.step import SRTrainState
from sres_tpu.util.logging import lgm


class _AsyncWriter:
    def __init__(self):
        self._q: "queue.Queue" = queue.Queue()
        self._thread: Optional[threading.Thread] = None

    def _ensure(self):
        if self._thread is None or not self._thread.is_alive():
            self._thread = threading.Thread(target=self._run, daemon=True)
            self._thread.start()

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            path, payload = item
            try:
                if os.path.isfile(path):
                    shutil.copyfile(path, path + ".backup")
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(payload)
                os.replace(tmp, path)
            except Exception as e:  # pragma: no cover
                lgm().exception(f"checkpoint write failed: {e}")
            finally:
                self._q.task_done()

    def submit(self, path: str, payload: bytes):
        self._ensure()
        self._q.put((path, payload))

    def flush(self):
        self._q.join()


_TAIL_MARKERS = ("tail", "SPUpsample", "upsampler", "Upsample")


def _partial_restore(template: SRTrainState, saved: Dict[str, Any]) -> SRTrainState:
    """Leaf-wise restore of the *parameters* that match, tolerating mismatched
    upsampler-tail shapes; optimizer state restarts fresh (its moments would
    be inconsistent with a changed tail anyway)."""
    import jax

    tmpl_params = serialization.to_state_dict(jax.device_get(template)).get("params", {})
    saved_params = saved.get("params", {})

    def merge(t_node, s_node, path=""):
        if isinstance(t_node, dict):
            return {k: merge(v, (s_node or {}).get(k), f"{path}/{k}") for k, v in t_node.items()}
        if s_node is not None and np.shape(s_node) == np.shape(t_node):
            return s_node
        if any(m.lower() in path.lower() for m in _TAIL_MARKERS):
            lgm().log(f"partial restore: keeping fresh init for {path} "
                      f"({np.shape(s_node)} vs {np.shape(t_node)})", display=True)
            return t_node
        raise ValueError(f"checkpoint/model shape mismatch at {path}: "
                         f"{np.shape(s_node)} vs {np.shape(t_node)}")

    merged = merge(tmpl_params, saved_params)
    restored_params = serialization.from_state_dict(template.params, merged)
    return template.replace(params=restored_params)


class _OrbaxBackend:
    """Optional production backend (pipeline.checkpoint_backend: orbax):
    atomic versioned directories, async writes, native multi-host
    coordination, two retained steps ≈ the flax backend's slot+.backup."""

    def __init__(self, async_write: bool):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self._async = async_write
        self._mgrs: Dict[str, Any] = {}

    def _dir(self, tset: TSet) -> str:
        vtset = TSet.Validation if tset == TSet.Test else tset
        return (f"{cfg().platform.results}/checkpoints_orbax/"
                f"{cfg().task.training_version}.{vtset.value}")

    def _mgr(self, tset: TSet):
        d = self._dir(tset)
        if d not in self._mgrs:
            ocp = self._ocp
            options = ocp.CheckpointManagerOptions(
                max_to_keep=2, create=True,
                enable_async_checkpointing=self._async)
            self._mgrs[d] = ocp.CheckpointManager(d, options=options)
        return self._mgrs[d]

    def save(self, state_dict: Dict[str, Any], meta: Dict[str, Any], tset: TSet) -> str:
        ocp = self._ocp
        mgr = self._mgr(tset)
        step = (mgr.latest_step() or 0) + 1
        mgr.save(step, args=ocp.args.Composite(
            state=ocp.args.StandardSave(state_dict),
            meta=ocp.args.JsonSave(meta)))
        return self._dir(tset)

    def load(self, tset: TSet) -> Optional[Dict[str, Any]]:
        ocp = self._ocp
        mgr = self._mgr(tset)
        step = mgr.latest_step()
        if step is None:
            return None
        restored = mgr.restore(step, args=ocp.args.Composite(
            state=ocp.args.StandardRestore(),
            meta=ocp.args.JsonRestore()))
        blob = dict(restored["meta"])
        blob["state"] = restored["state"]
        return blob

    def clear(self, tset: TSet) -> None:
        d = self._dir(tset)
        self.flush()
        self._mgrs.pop(d, None)
        if os.path.isdir(d):
            shutil.rmtree(d)

    def flush(self) -> None:
        for mgr in self._mgrs.values():
            mgr.wait_until_finished()


class CheckpointManager:
    def __init__(self, async_write: Optional[bool] = None):
        if async_write is None:
            async_write = bool(cfg().pipeline.get("async_checkpoint", True))
        self.async_write = async_write
        self._writer = _AsyncWriter()
        self.backend = str(cfg().pipeline.get("checkpoint_backend", "flax"))
        self._orbax = (_OrbaxBackend(async_write)
                       if self.backend == "orbax" else None)

    @classmethod
    def checkpoint_path(cls, tset: TSet, backup: bool = False) -> str:
        vtset = TSet.Validation if tset == TSet.Test else tset
        path = f"{cfg().platform.results}/checkpoints/{cfg().task.training_version}.{vtset.value}"
        os.makedirs(os.path.dirname(path), exist_ok=True)
        path += ".ckpt"
        # the async writer snapshots the previous file to <path>.backup
        return path + ".backup" if backup else path

    def save_checkpoint(self, state: SRTrainState, epoch: int, itime: int,
                        tset: TSet, loss: float, interp_loss: float) -> str:
        if self._orbax is not None:      # orbax coordinates hosts natively
            host_state = jax.device_get(state)
            meta = dict(epoch=int(epoch), itime=int(itime),
                        loss=float(loss), interp_loss=float(interp_loss))
            path = self._orbax.save(serialization.to_state_dict(host_state),
                                    meta, tset)
            lgm().log(f" *** SAVE {tset.name} checkpoint (orbax), "
                      f"loss={loss:.5f} → {path}")
            return path
        if jax.process_index() != 0:     # one writer per multi-host job
            return self.checkpoint_path(tset)
        host_state = jax.device_get(state)
        payload = serialization.msgpack_serialize({
            "epoch": np.int64(epoch), "itime": np.int64(itime),
            "loss": np.float64(loss), "interp_loss": np.float64(interp_loss),
            "state": serialization.to_state_dict(host_state),
        })
        path = self.checkpoint_path(tset)
        if self.async_write:
            self._writer.submit(path, payload)
        else:
            if os.path.isfile(path):
                shutil.copyfile(path, self.checkpoint_path(tset, backup=True))
            with open(path, "wb") as f:
                f.write(payload)
        lgm().log(f" *** SAVE {tset.name} checkpoint, loss={loss:.5f} ({interp_loss:.5f}) → {path}")
        return path

    def load_checkpoint(self, state_template: SRTrainState, tset: TSet = TSet.Train,
                        update_model: bool = True, **_) -> Optional[Dict[str, Any]]:
        """Returns {'epoch','itime','loss','state'} (state restored into the
        template's pytree structure) or {} when no checkpoint exists."""
        self.flush()
        path = self.checkpoint_path(tset) if self._orbax is None else "orbax"
        if self._orbax is not None:
            blob = self._orbax.load(tset)
            path = self._orbax._dir(tset)
            if blob is None:
                lgm().log("No orbax checkpoint found: starting from scratch.")
                return {}
        else:
            if not os.path.exists(path):
                lgm().log(f"No checkpoint file found at '{path}': starting from scratch.")
                return {}
            blob = None
            for cand in (path, self.checkpoint_path(tset, backup=True)):
                if not os.path.exists(cand):
                    continue
                try:
                    with open(cand, "rb") as f:
                        blob = serialization.msgpack_restore(f.read())
                    if cand != path:
                        lgm().log(f"Primary checkpoint corrupt; restored from "
                                  f"backup {cand}", display=True)
                    break
                except Exception as e:
                    lgm().log(f"Unable to load checkpoint {cand}: {e}", display=True)
            if blob is None:
                return None
        out: Dict[str, Any] = {
            "epoch": int(blob["epoch"]), "itime": int(blob["itime"]),
            "loss": float(blob["loss"]), "interp_loss": float(blob.get("interp_loss", 0.0)),
        }
        if update_model:
            # from_state_dict does NOT reliably raise on an opt-state layout
            # mismatch (a flat optax.flatten subtree restored into a per-leaf
            # template comes back with dict leaves) — validate the restored
            # tree structure explicitly.
            try:
                restored = serialization.from_state_dict(state_template,
                                                         blob["state"])
            except (ValueError, KeyError, AttributeError, TypeError):
                restored = None
            if restored is not None and (
                    jax.tree_util.tree_structure(restored)
                    == jax.tree_util.tree_structure(state_template)):
                out["state"] = restored
            else:
                # a checkpoint written with the other pipeline.packed_opt
                # layout restores exactly (Adam moments preserved) via the
                # ravel/unravel conversion in trainer/opt_interop.py
                from sres_tpu.trainer.opt_interop import \
                    restore_converting_opt_layout
                converted = restore_converting_opt_layout(state_template,
                                                          blob["state"])
                if converted is not None:
                    lgm().log("Converted optimizer state across the "
                              "packed_opt layout boundary", display=True)
                    out["state"] = converted
                else:
                    # tail-tolerant partial restore: the reference allows
                    # reusing a trunk with a new upsampler head
                    # (FModule.load_state_dict, common/common.py:50-71) —
                    # mismatched tail/upsampler leaves keep their fresh
                    # init; any other mismatch is an error
                    out["state"] = _partial_restore(state_template, blob["state"])
        lgm().log(f"Loaded model checkpoint from {path}", display=True)
        return out

    def clear_checkpoints(self) -> None:
        self.flush()
        if self._orbax is not None:
            for tset in (TSet.Train, TSet.Validation):
                self._orbax.clear(tset)
            return
        for tset in (TSet.Train, TSet.Validation):
            for backup in (False, True):
                p = self.checkpoint_path(tset, backup)
                if os.path.exists(p):
                    os.remove(p)

    def flush(self) -> None:
        self._writer.flush()
        if self._orbax is not None:
            self._orbax.flush()
