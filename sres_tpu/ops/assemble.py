"""On-device tile-grid assembly for full-region inference.

The reference assembles region images on the host with np.block
(sres/controller/dual_trainer.py:449-480). For multi-chip tiled inference the
TPU-native path scatters the (padded, mesh-sharded) SR tile batch into the
region mosaic on device — NaN-filled for dropped (land) tiles — so only the
final image crosses to the host (BASELINE.json config #5).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp


def assemble_tiles(tiles: jnp.ndarray, tile_ids: jnp.ndarray,
                   grid_shape: Dict[str, int], weight: jnp.ndarray) -> jnp.ndarray:
    """(N, ty, tx) tiles + flat grid ids (+ 0/1 validity weights for padding)
    → (gy*ty, gx*tx) mosaic with NaN holes.

    Scatter semantics: invalid (weight==0) entries are routed to a trash slot
    so shapes stay static under jit.
    """
    gy, gx = int(grid_shape["y"]), int(grid_shape["x"])
    n, ty, tx = tiles.shape
    nslots = gy * gx
    slots = jnp.full((nslots + 1, ty, tx), jnp.nan, tiles.dtype)
    idx = jnp.where(weight > 0, tile_ids, nslots)  # trash slot for padding
    slots = slots.at[idx].set(tiles, mode="drop")
    grid = slots[:nslots].reshape(gy, gx, ty, tx)
    return grid.transpose(0, 2, 1, 3).reshape(gy * ty, gx * tx)
