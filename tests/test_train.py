"""Trainer tests on the virtual 8-device CPU mesh: loss decreases, sharding
works, shard-count invariance of the loss math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radae_tpu.config import RADAEConfig
from radae_tpu.models.radae import RADAE
from radae_tpu.parallel.mesh import make_mesh, shard_batch
from radae_tpu.parallel.trainstep import make_train_step, make_eval_step


@pytest.fixture(scope="module")
def setup():
    cfg = RADAEConfig(feature_dim=20, latent_dim=80, EbNodB=10.0,
                      range_EbNo=False)
    model = RADAE(cfg)
    params = model.init(jax.random.PRNGKey(0))
    return cfg, model, params


def synth_batch(cfg, model, B, T, seed=0):
    rng = np.random.default_rng(seed)
    feats = (rng.standard_normal((B, T, 20)) * 0.3).astype(np.float32)
    n_rs = cfg.num_timesteps_at_rate_Rs(T)
    H = model.default_H(B, n_rs)
    G = np.zeros((B, 1, 2), np.complex64)   # unused at rate Rs
    return feats, H, G


def test_single_device_loss_decreases(setup):
    cfg, model, params = setup
    init_state, step = make_train_step(model, lr=3e-3)
    state = init_state(params)
    feats, H, G = synth_batch(cfg, model, 8, 48)
    key = jax.random.PRNGKey(42)
    losses = []
    for i in range(12):
        state, metrics = step(state, feats, H, G, key)
        losses.append(float(metrics["loss"][0]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 12


def test_scanned_train_step_matches_sequential(setup):
    """scan_steps>1 with stacked per-step minibatches must reproduce the
    sequential single-step trajectory exactly (the key is folded with
    state.step inside, so step k sees the same randomness either way)."""
    cfg, model, params = setup
    key = jax.random.PRNGKey(7)
    f0, H, G = synth_batch(cfg, model, 4, 48, seed=1)
    f1, _, _ = synth_batch(cfg, model, 4, 48, seed=2)

    init_state, step1 = make_train_step(model, lr=3e-3)
    state = init_state(params)
    for f in (f0, f1):
        state, metrics_seq = step1(state, f, H, G, key)

    init_state2, step2 = make_train_step(model, lr=3e-3, scan_steps=2)
    stacked = np.stack([f0, f1])
    Hs = np.stack([H, H])
    Gs = np.stack([G, G])
    state2, metrics = step2(init_state2(params), stacked, Hs, Gs, key)

    assert int(state2.step) == 2
    np.testing.assert_allclose(metrics["loss"], metrics_seq["loss"],
                               rtol=1e-5, atol=1e-6)
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(state2.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-6)


def test_mesh_train_step(setup):
    cfg, model, params = setup
    mesh = make_mesh(8)
    init_state, step = make_train_step(model, lr=3e-3, mesh=mesh)
    state = init_state(params)
    feats, H, G = synth_batch(cfg, model, 16, 48)
    with mesh:
        batch = shard_batch(mesh, (feats, H, G))
        state, metrics = step(state, *batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"][0]))


def test_shard_count_invariance(setup):
    """Global loss mean must not depend on how the batch is sharded
    (preserving the reference's global mean, train.py:260-261)."""
    cfg, model, params = setup
    feats, H, G = synth_batch(cfg, model, 16, 48)
    key = jax.random.PRNGKey(7)

    results = []
    for n_dev in (1, 8):
        mesh = make_mesh(n_dev)
        init_state, step = make_train_step(model, lr=0.0, mesh=mesh)
        state = init_state(params)
        with mesh:
            batch = shard_batch(mesh, (feats, H, G))
            _, metrics = step(state, *batch, key)
        results.append(float(metrics["loss"][0]))
    assert abs(results[0] - results[1]) < 1e-4, results


def test_eval_step(setup):
    cfg, model, params = setup
    ev = make_eval_step(model)
    feats, H, G = synth_batch(cfg, model, 4, 48)
    loss, ebno, sigma = ev(params, feats, H, G, jax.random.PRNGKey(0))
    assert loss.shape == (4,)
    assert np.all(np.isfinite(np.asarray(loss)))


def test_lr_schedule():
    from radae_tpu.parallel.trainstep import make_optimizer
    opt = make_optimizer(3e-4, 2.5e-5)
    # after many steps the decay must follow 1/(1+decay*step)
    params = {"w": jnp.ones(4)}
    opt_state = opt.init(params)
    g = {"w": jnp.ones(4)}
    # first update magnitude ~ lr (adam normalises grad to ~1)
    up, _ = opt.update(g, opt_state, params)
    assert abs(float(jnp.abs(up["w"]).mean()) - 3e-4) / 3e-4 < 0.2
