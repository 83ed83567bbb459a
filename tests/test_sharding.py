"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsvc_tpu.config import FrameConfig
from gsvc_tpu.core import init_splats
from gsvc_tpu.models.represent import _trainable, render_frame
from gsvc_tpu.optim.adan import adan_init, adan_step
from gsvc_tpu.parallel.sharded import (
    make_sharded_train_step,
    shard_frames_mesh,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def _setup(n_frames, H, W, n_splats=64, seed=0):
    cfg = FrameConfig(
        H=H, W=W, num_points=n_splats, max_num_points=n_splats,
        iterations=1, backend="binned",
    )
    keys = jax.random.split(jax.random.key(seed), n_frames)
    ps, als = [], []
    for f in range(n_frames):
        p, a = init_splats(keys[f], n_splats)
        ps.append(p)
        als.append(a)
    params = jax.tree.map(lambda *x: jnp.stack(x), *ps)
    alive = jnp.stack(als)
    opt = jax.vmap(lambda p: adan_init(_trainable(p)))(params)
    gt = jnp.asarray(
        np.random.default_rng(seed).uniform(0, 1, (n_frames, H, W, 3)),
        jnp.float32,
    )
    return cfg, params, alive, opt, gt


def _single_device_step(cfg, params, alive, opt, gt, lr=1e-3):
    """Unsharded oracle: same math on one device, vmapped over frames."""

    def one(params, alive, opt, gt):
        from gsvc_tpu.models.represent import _from_trainable

        def loss_fn(tr):
            img = render_frame(_from_trainable(tr), alive, cfg)
            return jnp.mean((img - gt) ** 2)

        tr = _trainable(params)
        loss, grads = jax.value_and_grad(loss_fn)(tr)
        new_tr, new_opt = adan_step(tr, grads, opt, lr)
        return _from_trainable(new_tr), new_opt, loss

    return jax.jit(jax.vmap(one))(params, alive, opt, gt)


def test_sharded_step_matches_single_device():
    mesh = shard_frames_mesh(2, 4)
    H, W = 16 * 4 * 2, 48  # 2 tile rows per tile-device
    cfg, params, alive, opt, gt = _setup(4, H, W)
    step = make_sharded_train_step(mesh, cfg, lr=1e-3)
    p_sh, o_sh, loss_sh = step(params, alive, opt, gt)
    p_ref, o_ref, loss_ref = _single_device_step(cfg, params, alive, opt, gt)
    np.testing.assert_allclose(
        np.asarray(loss_sh), np.asarray(loss_ref), rtol=1e-4, atol=1e-5
    )
    # Adan normalizes by sqrt(EMA(grad^2)), so slots with near-zero grads
    # amplify the inherent f32 summation-order difference between the
    # sharded psum and the single-device reduction; compare with an
    # absolute tolerance well below any meaningful parameter change.
    for name in ("xyz", "cholesky", "features_dc", "rgb_w"):
        np.testing.assert_allclose(
            np.asarray(getattr(p_sh, name)),
            np.asarray(getattr(p_ref, name)),
            rtol=0, atol=2e-4, err_msg=name,
        )


def test_sharded_multi_step_training_descends():
    mesh = shard_frames_mesh(1, 8)
    H, W = 16 * 8, 48
    cfg, params, alive, opt, gt = _setup(1, H, W, seed=1)
    step = make_sharded_train_step(mesh, cfg, lr=5e-3)
    first = None
    for _ in range(30):
        params, opt, loss = step(params, alive, opt, gt)
        if first is None:
            first = float(loss[0])
    assert float(loss[0]) < first * 0.97


def test_sharded_step_matches_single_device_pallas():
    """Tile-sharded training with the PALLAS backend (interpret mode):
    regression test for the uninitialized-vdata bug — per-shard backward
    must mask lanes outside its tile-row span before the psum'd splat
    reduction (ops/rasterize_pallas._reduce_lane_grads)."""
    import gsvc_tpu.ops.rasterize_pallas as rp

    rp.INTERPRET = True
    try:
        cfg, params, alive, opt, gt = _setup(2, H=64, W=48)
        cfg = FrameConfig(**{**cfg.__dict__, "backend": "pallas"})
        mesh = shard_frames_mesh(2, 2, jax.devices()[:4])
        step = make_sharded_train_step(mesh, cfg, lr=1e-3)
        new_params, new_opt, loss = step(params, alive, opt, gt)
        ref_params, ref_opt, ref_loss = _single_device_step(
            cfg, params, alive, opt, gt
        )
        np.testing.assert_allclose(
            np.asarray(loss), np.asarray(ref_loss), rtol=1e-4
        )
        for a, b in zip(
            jax.tree.leaves(new_params), jax.tree.leaves(ref_params)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )
    finally:
        rp.INTERPRET = False
