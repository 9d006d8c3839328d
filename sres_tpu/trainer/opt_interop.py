"""Optimizer-state layout conversion across ``pipeline.packed_opt``.

``optax.flatten`` runs the optimizer on ONE raveled parameter vector; its
state is the inner optimizer's state with every params-structured subtree
collapsed to a single flat ``(nparams,)`` array (ravel_pytree concatenates
leaves in tree_flatten order, the same order both layouts share). The two
layouts therefore have IDENTICAL outer structure — an Adam checkpoint can be
restored into a trainer running the other layout by raveling/unraveling the
param-shaped subtrees in place, preserving the optimizer moments exactly.

Without this, toggling packed_opt between runs silently discarded the Adam
moments on resume (CheckpointManager fell back to the params-only partial
restore). The reference has no analogous flag — torch Adam state is always
per-leaf (sres/controller/dual_trainer.py:126) — so cross-layout resume is a
TPU-runtime-only concern introduced by the compile-time lever.

Round-trip exactness is tested in tests/test_scan_trunk.py
(test_packed_opt_checkpoint_interchange).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import serialization
from jax.flatten_util import ravel_pytree

from sres_tpu.trainer.step import SRTrainState


def restore_converting_opt_layout(template: SRTrainState,
                                  saved_sd: Any) -> Optional[SRTrainState]:
    """Restore ``saved_sd`` (a ``to_state_dict`` of an SRTrainState whose
    opt_state is in the OTHER packed_opt layout) into ``template`` (a fresh
    state in the CURRENT layout). Returns None when the conversion does not
    apply (params mismatch, foreign state structure) so the caller can fall
    back to its existing partial-restore path."""
    if not isinstance(saved_sd, dict) or "opt_state" not in saved_sd:
        return None
    try:
        params = serialization.from_state_dict(template.params,
                                               saved_sd["params"])
        batch_stats = (serialization.from_state_dict(
            template.batch_stats, saved_sd["batch_stats"])
            if "batch_stats" in saved_sd else template.batch_stats)
        step = (serialization.from_state_dict(template.step, saved_sd["step"])
                if "step" in saved_sd else template.step)
    except (ValueError, KeyError):
        return None

    flat_params, unravel = ravel_pytree(params)
    n = int(flat_params.size)
    pstruct = jax.tree_util.tree_structure(params)

    def is_param_subtree(x) -> bool:
        try:
            return jax.tree_util.tree_structure(x) == pstruct
        except Exception:
            return False

    leaves_t, outer = jax.tree_util.tree_flatten(template.opt_state,
                                                 is_leaf=is_param_subtree)
    try:
        if any(is_param_subtree(l) for l in leaves_t):
            # current layout: per-leaf; saved: flat. Build a flat-layout
            # skeleton from the template, restore into it, unravel.
            skel = jax.tree_util.tree_unflatten(
                outer, [jnp.zeros((n,), flat_params.dtype)
                        if is_param_subtree(l) else l for l in leaves_t])
            flat_vals = serialization.from_state_dict(skel,
                                                      saved_sd["opt_state"])
            vals, outer2 = jax.tree_util.tree_flatten(flat_vals)
            if outer2 != outer:
                return None
            new = []
            for tl, v in zip(leaves_t, vals):
                if is_param_subtree(tl):
                    if getattr(v, "ndim", None) != 1 or int(v.size) != n:
                        return None
                    new.append(unravel(jnp.asarray(v)))
                else:
                    new.append(v)
        else:
            # current layout: flat; saved: per-leaf. Build a per-leaf
            # skeleton by unraveling the template's flat vectors, restore,
            # ravel back.
            def widen(v):
                return (unravel(jnp.asarray(v))
                        if getattr(v, "ndim", None) == 1 and int(v.size) == n
                        else v)
            skel = jax.tree_util.tree_unflatten(
                outer, [widen(v) for v in leaves_t])
            per_vals = serialization.from_state_dict(skel,
                                                     saved_sd["opt_state"])
            leaves_p, outer2 = jax.tree_util.tree_flatten(
                per_vals, is_leaf=is_param_subtree)
            if outer2 != outer:
                return None
            new = [ravel_pytree(l)[0] if is_param_subtree(l) else l
                   for l in leaves_p]
    except (ValueError, KeyError, TypeError, AttributeError):
        return None
    opt_state = jax.tree_util.tree_unflatten(outer, new)
    return template.replace(step=step, params=params,
                            batch_stats=batch_stats, opt_state=opt_state)
