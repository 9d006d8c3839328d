"""Diagnose the winograd-chain serving-export mismatch (export_tpu_check:
artifact vs live maxerr 2.6e-3, deterministic, while scan_groups and
window-attention export bitwise-exact).

Hypothesis under test: jax.export lowers Pallas in FORWARD-COMPATIBILITY
mode (exports must stay loadable for a month), which can select different
Mosaic lowering rules than the live jit — numerically close but not
bitwise. If so, exporting with jax_export_ignore_forward_compatibility=True
should match live exactly.

Prints:
  1. per-mode maxerr (artifact vs live jit) for default export and
     forward-compat-ignored export,
  2. whether the exported module's tpu_custom_call payloads differ from the
     live lowering's (hash comparison).
"""
from __future__ import annotations

import hashlib
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def _cc_hashes(mlir_text: str) -> list:
    """Hashes of tpu_custom_call backend payloads in an MLIR module."""
    out = []
    for m in re.finditer(r'stablehlo\.custom_call\s*@tpu_custom_call.*', mlir_text):
        out.append(hashlib.sha1(m.group(0).encode()).hexdigest()[:12])
    return out


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    from sres_tpu.models import build_model
    from sres_tpu.util.serving import build_serve_fn, export_serving, load_serving

    mcfg = dict(name="rcan", nfeatures=64, nlayers=1, nblocks=2,
                cbottleneck=2, kernel_size=3, downscale_factors=[2, 2],
                loss_fn="l2", lane_pack=2, winograd=2)
    size = 16
    m = build_model(dict(mcfg), 1, 1, precision="f32")
    x0 = jnp.zeros((2, size, size, 1), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x0, train=False)
    lr = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, size, size, 1)), jnp.float32)

    fn = jax.jit(build_serve_fn(m, v))
    want = np.asarray(fn(lr))
    live_text = fn.lower(lr).as_text()
    live_h = _cc_hashes(live_text)
    print(f"live: {len(live_h)} tpu_custom_calls", flush=True)

    for label, ignore_fwd in (("default-export", False),
                              ("fwdcompat-ignored", True)):
        try:
            jax.config.update("jax_export_ignore_forward_compatibility",
                              ignore_fwd)
        except Exception as e:
            print(f"{label}: config flag unavailable ({e})")
            if ignore_fwd:
                continue
        out = tempfile.mkdtemp(prefix=f"wino_diag_{label}_")
        export_serving(m, v, (size, size), 1, out, batch_sizes=[2])
        got = np.asarray(load_serving(out, batch=2)(lr))
        err = float(np.max(np.abs(got - want)))
        import jax.export as jexp
        with open(os.path.join(out, "serving_b2.jaxexp"), "rb") as f:
            exp = jexp.deserialize(f.read())
        exp_h = _cc_hashes(exp.mlir_module())
        same = exp_h == live_h
        print(f"{label}: maxerr={err:.3e} custom_calls={len(exp_h)} "
              f"payloads_match_live={same}", flush=True)
        if not same:
            print(f"  live hashes: {live_h}")
            print(f"  exp  hashes: {exp_h}")


if __name__ == "__main__":
    main()
