"""Multi-chip sharding for splat video training (new vs. the reference).

The reference is strictly single-GPU (`cuda:0`, train_video_Represent.py:36)
with SLURM-job sweep parallelism only (SURVEY.md §2 parallelism table). This
module adds the TPU-native distributed layer (SURVEY.md §7.2 stage 7):

- **tile axis (SP — image-space parallelism)**: the image's tile rows are
  sharded across chips. Every chip holds the full (small) splat set,
  projects once, bins only its local tile rows against y-shifted centers,
  rasterizes its image shard, and computes the local loss term. Per-splat
  parameter gradients are `psum`'d over ICI — the collective equivalent of
  the reference backward's atomicAdd into shared per-gaussian slots.
- **frame axis (DP — GOP parallelism)**: K-frame chains are independent
  (SURVEY.md §5 long-context row), so frames/GOPs shard across chips or
  hosts with no collectives; each device runs its own warm-start chain.

Both axes compose in a 2D mesh ("frame", "tile"): grads psum over "tile"
only; "frame" stays embarrassingly parallel.

Built on jax.sharding.Mesh + shard_map; collectives ride ICI via XLA.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gsvc_tpu.config import FrameConfig
from gsvc_tpu.core import SplatParams
from gsvc_tpu.models.represent import _from_trainable, _trainable
from gsvc_tpu.ops.projection import project_gaussians_2d
from gsvc_tpu.ops.rasterize import rasterize_gaussians_sum
from gsvc_tpu.optim.adan import adan_init, adan_step


def shard_frames_mesh(
    n_frame: int, n_tile: int, devices=None
) -> Mesh:
    """2D device mesh: frame-parallel x tile-parallel."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(
        devices[: n_frame * n_tile].reshape(n_frame, n_tile),
        axis_names=("frame", "tile"),
    )


def _render_local_shard(
    params: SplatParams,
    alive: jax.Array,
    cfg: FrameConfig,
    rows_per_shard: int,
    row_offset: jax.Array,
) -> jax.Array:
    """Render tile rows [row_offset, row_offset + rows_per_shard) in GLOBAL
    coordinates via the rasterizer's tile_rows support.

    Projection + binning run on global coordinates (bit-identical tile
    membership to the unsharded render); only the per-pixel rasterization
    work is sharded. The binning sort is currently replicated per chip —
    acceptable because pixel evaluation dominates, and a sharded-sort
    upgrade can slot in behind the same interface.
    """
    colors = params.get_features
    xys, depths, radii, conics, nth = project_gaussians_2d(
        params.get_xyz, params.get_cholesky_elements, cfg.H, cfg.W,
        cfg.tile_bounds, cfg.block_w, cfg.block_h, alive=alive,
    )
    opacity = jnp.ones((params.capacity, 1), jnp.float32)
    img = rasterize_gaussians_sum(
        xys, depths, radii, conics, nth, colors, opacity,
        cfg.H, cfg.W, cfg.block_h, cfg.block_w,
        backend=cfg.backend, max_intersects=cfg.max_intersects,
        tile_rows=(row_offset, rows_per_shard),
    )
    return jnp.clip(img, 0.0, 1.0)


def make_tile_sharded_render(mesh: Mesh, cfg: FrameConfig):
    """Forward render with the image sharded over the 'tile' mesh axis.

    Returns a function (params, alive, gt_shard) -> (loss, img_shard)
    meant to run inside shard_map (gt sharded on rows, params replicated).
    """
    n_tile = mesh.shape["tile"]
    assert cfg.H % (cfg.block_h * n_tile) == 0, (
        "H must divide into whole tile rows per device"
    )
    rows_per_shard = cfg.H // (cfg.block_h * n_tile)

    def local_forward(params, alive, gt_shard):
        d = jax.lax.axis_index("tile")
        img = _render_local_shard(
            params, alive, cfg, rows_per_shard, d * rows_per_shard
        )
        local_sq = jnp.sum((img - gt_shard) ** 2)
        loss = jax.lax.psum(local_sq, "tile") / (cfg.H * cfg.W * 3)
        return loss, img

    return local_forward


def make_sharded_train_step(mesh: Mesh, cfg: FrameConfig, lr: float = 1e-3):
    """Full training step over a ("frame", "tile") mesh.

    Arguments (shardings):
      params/alive/opt: sharded over "frame" (one splat set per frame row),
        replicated over "tile".
      gt: [F, H, W, 3] sharded (frame, tile-rows).
    Per-splat gradients are psum'd over "tile"; the Adan update then runs
    replicated within each frame row.
    """
    local_forward = make_tile_sharded_render(mesh, cfg)

    def per_device(params_b, alive_b, opt_b, gt_b):
        # leading axis = local frame shard (size 1 per device row)
        def one_frame(params, alive, opt, gt_shard):
            def loss_fn(tr):
                loss, _ = local_forward(_from_trainable(tr), alive, gt_shard)
                return loss

            tr = _trainable(params)
            loss, grads = jax.value_and_grad(loss_fn)(tr)
            grads = jax.lax.psum(grads, "tile")
            new_tr, new_opt = adan_step(tr, grads, opt, lr)
            return _from_trainable(new_tr), new_opt, loss

        return jax.vmap(one_frame)(params_b, alive_b, opt_b, gt_b)

    step = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(
            P("frame"),  # params: frame-sharded, tile-replicated
            P("frame"),
            P("frame"),
            P("frame", "tile"),  # gt: [F, H, W, 3] rows sharded over tile
        ),
        out_specs=(P("frame"), P("frame"), P("frame")),
        check_vma=False,
    )
    return jax.jit(step)


def replicate_to_mesh(mesh: Mesh, tree, spec=P()):
    sharding = NamedSharding(mesh, spec)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
