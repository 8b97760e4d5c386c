"""BinsChamferLoss (AdaBins) — TPU-native.

Re-implements the reference's pytorch3d-backed bins chamfer loss
(src/loss/submodule/chamferloss.py:27-49) without pytorch3d: for 1-D point
sets (bin centers vs valid GT depths) the chamfer distance reduces to masked
nearest-neighbour squared distances, computed as one (B, P, T) pairwise
matrix — static shapes, no ragged sequences (invalid GT slots are masked
with +inf before the mins, replacing the reference's pad_sequence/y_lengths
machinery).
"""

from __future__ import annotations

import jax.numpy as jnp


def bins_chamfer_loss(
    bins: jnp.ndarray,
    target_depth: jnp.ndarray,
    loss_weight: float = 1.0,
    valid_threshold: float = 1e-3,
) -> jnp.ndarray:
    """bins: (B, P+1) bin edges; target_depth: (B, ...) depth maps.

    Returns pytorch3d-convention chamfer: mean over batch of
    (mean_x min_y d2 + mean_y min_x d2).
    """
    centers = 0.5 * (bins[:, 1:] + bins[:, :-1])  # (B, P)
    b = centers.shape[0]
    target = target_depth.reshape(b, -1).astype(jnp.float32)  # (B, T)
    valid = target >= valid_threshold

    d2 = jnp.square(centers[:, :, None] - target[:, None, :])  # (B, P, T)

    inf = jnp.float32(1e30)
    # centers -> nearest valid GT
    d2_x = jnp.where(valid[:, None, :], d2, inf)
    min_x = jnp.min(d2_x, axis=2)  # (B, P)
    any_valid = jnp.any(valid, axis=1)
    cham_x = jnp.mean(jnp.where(any_valid[:, None], min_x, 0.0), axis=1)

    # valid GT -> nearest center
    min_y = jnp.min(d2, axis=1)  # (B, T)
    n_valid = jnp.clip(jnp.sum(valid, axis=1), 1, None)
    cham_y = jnp.sum(jnp.where(valid, min_y, 0.0), axis=1) / n_valid

    return loss_weight * jnp.mean(cham_x + cham_y)
