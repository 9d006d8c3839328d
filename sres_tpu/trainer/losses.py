"""Loss math: masked RMSE / charbonnier with multiscale dispatch
(reference: sres/controller/stats.py:5-8, dual_trainer.py:196-234).

Padding-aware: ragged final tile batches are padded to the static batch size
with per-tile 0/1 weights; all reductions normalize by the weighted element
count so padded tiles contribute nothing — this is how the reference's
ragged-batch semantics survive XLA's static shapes (SURVEY.md §7 hard parts).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple, Union

import jax.numpy as jnp

EPS = 1e-6
Output = Union[jnp.ndarray, Sequence[jnp.ndarray]]


def conform_to_product(prd: jnp.ndarray, tar: jnp.ndarray) -> jnp.ndarray:
    """Crop target to the product's spatial shape (reference:
    dual_trainer.py:200-203 — sizes differ under fractional data_downsample)."""
    if tar.shape[1] > prd.shape[1] or tar.shape[2] > prd.shape[2]:
        tar = tar[:, : prd.shape[1], : prd.shape[2], :]
    return tar


def _weighted_mean(x: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """Mean over all elements with per-sample (leading-dim) 0/1 weights."""
    w = weight.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
    per_elem = x.shape[1] * x.shape[2] * x.shape[3] if x.ndim == 4 else x[0].size
    return jnp.sum(x * w) / (jnp.sum(weight) * per_elem + 1e-12)


def l2loss(prd: jnp.ndarray, tar: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    tar = conform_to_product(prd, tar)
    return jnp.sqrt(_weighted_mean((prd - tar) ** 2, weight))


def charbonnier(prd: jnp.ndarray, tar: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    tar = conform_to_product(prd, tar)
    return _weighted_mean(jnp.sqrt((prd - tar) ** 2 + EPS), weight)


def single_product_loss(prd: jnp.ndarray, tar: jnp.ndarray, weight: jnp.ndarray,
                        loss_fn: str) -> jnp.ndarray:
    if loss_fn == "l2":
        return l2loss(prd, tar, weight)
    if loss_fn == "charbonnier":
        return charbonnier(prd, tar, weight)
    raise ValueError(f"Unknown loss_fn {loss_fn}")


def psnr(rmse: Union[float, jnp.ndarray], data_range: Union[float, jnp.ndarray] = 1.0):
    """Peak signal-to-noise ratio from an RMSE (the north-star quality metric
    alongside the reference's loss ratio)."""
    return 20.0 * jnp.log10(data_range / jnp.maximum(rmse, 1e-12))


def sr_loss(products: Output, targets: Union[jnp.ndarray, List[jnp.ndarray]],
            weight: jnp.ndarray, loss_fn: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sloss, mloss): sloss is the final-scale scalar metric; mloss the
    training objective — for pyramid outputs, the sum of per-level losses
    against the per-level targets (reference: dual_trainer.py:221-234)."""
    if isinstance(products, jnp.ndarray):
        sloss = single_product_loss(products, targets, weight, loss_fn)
        return sloss, sloss
    level_targets = targets if isinstance(targets, (list, tuple)) else [targets]
    sloss = single_product_loss(products[-1], level_targets[-1], weight, loss_fn)
    mloss = None
    for out, tar in zip(products, level_targets):
        ll = single_product_loss(out, tar, weight, loss_fn)
        mloss = ll if mloss is None else mloss + ll
    return sloss, mloss
