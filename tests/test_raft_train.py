"""RAFT training: sequence loss, synthetic warps, train steps, dp sharding.

The reference ships no RAFT training (weights are downloaded,
cwm/models/raft/download_raft_checkpoints.sh); these tests pin the
objectives its checkpoints imply (training/raft.py).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from counterfactualworldmodels_tpu.models.raft.raft import RAFT
from counterfactualworldmodels_tpu.training import raft as R
from counterfactualworldmodels_tpu.training import train as T


HW = 64  # /8 features -> 8x8 grid, enough for the 4-level pyramid


def _model(**kw):
    return RAFT(small=True, iters=2, **kw)


def _state(model, lr=1e-4, hw=HW):
    opt = T.make_optimizer(learning_rate=lr, warmup_steps=1, total_steps=50)
    return opt, R.init_raft_train_state(model, opt, jax.random.PRNGKey(0),
                                        hw=hw)


def _images(b=2, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.rand(b, 3, HW, HW).astype(np.float32) * 255.0)


def test_sequence_loss_weighting():
    # two iterations with constant per-pixel errors 2 (L1=2) and 1 -> with
    # gamma g the loss is g*2 + 1 (weights g**(n-1-i), n=2)
    gt = jnp.zeros((1, 2, 4, 4))
    seq = jnp.stack([jnp.full((1, 2, 4, 4), 2.0),
                     jnp.full((1, 2, 4, 4), 1.0)])
    for gamma in (0.8, 0.5):
        loss = R.raft_sequence_loss(seq, gt, gamma=gamma)
        np.testing.assert_allclose(float(loss), gamma * 2.0 + 1.0,
                                   rtol=1e-6)


def test_sequence_loss_max_flow_exclusion():
    # all ground-truth magnitudes above max_flow -> every pixel excluded,
    # loss 0 (the masked mean divides by a clipped valid count)
    gt = jnp.full((1, 2, 4, 4), 1000.0)
    seq = jnp.ones((2, 1, 2, 4, 4))
    loss = R.raft_sequence_loss(seq, gt, max_flow=400.0)
    assert float(loss) == 0.0


def test_synthetic_translation_exact():
    img = _images(1, seed=1)
    im1, im2, flow, valid = R.synthetic_flow_batch(
        jax.random.PRNGKey(3), img, max_mag=4.0, translation_only=True)
    assert im1.shape == im2.shape == (1, 3, HW, HW)
    assert flow.shape == (1, 2, HW, HW)
    # constant field: flow is the same vector everywhere
    f = np.asarray(flow)[0]
    assert np.ptp(f[0]) == 0 and np.ptp(f[1]) == 0
    # backward warp consistency at valid integer offsets: sample im2 at
    # x + flow and recover im1 (up to bilinear interpolation error)
    fx, fy = float(f[0, 0, 0]), float(f[1, 0, 0])
    v = np.asarray(valid)[0]
    assert v.mean() > 0.8  # max_mag 4 on a 64px frame
    # interior crop well inside the invalid border
    m = 8
    i2 = np.asarray(im2)[0]
    i1 = np.asarray(im1)[0]
    # im2(y) = im1(y - f): pick integer-rounded translation for exactness
    dy, dx = int(round(fy)), int(round(fx))
    if abs(dy - fy) < 1e-6 and abs(dx - fx) < 1e-6:
        np.testing.assert_allclose(
            i2[:, m:-m, m:-m],
            i1[:, m - dy:HW - m - dy, m - dx:HW - m - dx], atol=1e-4)
    else:
        # fractional shift: check error is small vs nearest-pixel shift
        approx = np.roll(i1, (dy, dx), axis=(-2, -1))
        assert np.abs(i2[:, m:-m, m:-m] - approx[:, m:-m, m:-m]).mean() \
            < np.abs(i2[:, m:-m, m:-m] - i1[:, m:-m, m:-m]).mean() + 1e-6


def test_with_sequence_matches_final_flow():
    model = _model()
    params = R.init_raft_train_state(
        model, T.make_optimizer(), jax.random.PRNGKey(0), hw=HW).params
    im = _images(1)
    flow_lr, flow_up = model.apply({'params': params}, im, im, 2)
    flow_lr2, flow_up2, seq = model.apply({'params': params}, im, im, 2,
                                          True)
    assert seq.shape == (2, 1, 2, HW, HW)
    np.testing.assert_allclose(np.asarray(flow_up), np.asarray(flow_up2),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(seq[-1]), np.asarray(flow_up2),
                               atol=1e-6)


def test_flow_train_step_reduces_loss():
    model = _model()
    opt, state = _state(model, lr=5e-5)
    step = jax.jit(R.make_raft_train_step(model, opt, iters=2, remat=False))
    im1, im2, gt, valid = R.synthetic_flow_batch(
        jax.random.PRNGKey(5), _images(2), max_mag=3.0)
    losses = []
    for _ in range(8):
        state, metrics = step(state, im1, im2, gt, valid)
        losses.append(float(metrics['loss']))
        assert np.isfinite(losses[-1])
        assert np.isfinite(float(metrics['epe']))
    # grads are global-norm-clipped unit steps; compare settled vs start
    assert np.mean(losses[-3:]) < losses[0]
    assert int(state.step) == 8


def test_keypoint_distill_step_reduces_loss():
    model = _model(output_dim=1)
    opt, state = _state(model, lr=2e-4)
    step = jax.jit(R.make_keypoint_distill_step(model, opt, iters=2,
                                                remat=False))
    img = _images(2, seed=7)
    yy = jnp.arange(HW)[:, None] + jnp.zeros((1, HW))
    target = jnp.broadcast_to((yy > HW // 2).astype(jnp.float32),
                              (2, 1, HW, HW))
    losses = []
    for _ in range(5):
        state, metrics = step(state, img, target)
        losses.append(float(metrics['loss']))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


@pytest.mark.slow
def test_sharded_flow_step_matches_unsharded():
    from counterfactualworldmodels_tpu import parallel
    model = _model()
    opt, state = _state(model)
    im1, im2, gt, valid = R.synthetic_flow_batch(
        jax.random.PRNGKey(9), _images(4), max_mag=3.0)

    plain = jax.jit(R.make_raft_train_step(model, opt, iters=2,
                                           remat=False))
    s1, m1 = plain(state, im1, im2, gt, valid)

    mesh = parallel.make_mesh({'dp': 4})
    sharded, shard_state, data_sh = R.make_sharded_raft_train_step(
        model, opt, mesh, iters=2, remat=False)
    _, state2 = _state(model)
    state2 = shard_state(state2)
    put = lambda x: jax.device_put(x, data_sh)  # noqa: E731
    s2, m2 = sharded(state2, put(im1), put(im2), put(gt), put(valid))
    np.testing.assert_allclose(float(m1['loss']), float(m2['loss']),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1['epe']), float(m2['epe']),
                               rtol=1e-5)
    # one representative param leaf identical
    l1 = jax.tree_util.tree_leaves(s1.params)[0]
    l2 = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_accum_steps_matches_full_batch():
    """accum_steps=2 produces the same update as the full-batch step
    (mean losses over equal microbatches -> identical gradients up to
    float associativity)."""
    model = _model()
    opt, state = _state(model, lr=1e-4)
    im1, im2, gt, valid = R.synthetic_flow_batch(
        jax.random.PRNGKey(5), _images(4), max_mag=3.0)
    full = jax.jit(R.make_raft_train_step(model, opt, iters=2, remat=False))
    acc = jax.jit(R.make_raft_train_step(model, opt, iters=2, remat=False,
                                         accum_steps=2))
    s1, m1 = full(state, im1, im2, gt, valid)
    _, state2 = _state(model, lr=1e-4)
    s2, m2 = acc(state2, im1, im2, gt, valid)
    np.testing.assert_allclose(float(m1['loss']), float(m2['loss']),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1['epe']), float(m2['epe']),
                               rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_vmae_accum_steps_matches_full_batch():
    from counterfactualworldmodels_tpu.models import vmae as jvmae
    model = jvmae.PretrainVisionTransformer(
        img_size=(32, 32), patch_size=(8, 8), encoder_embed_dim=48,
        encoder_depth=2, encoder_num_heads=4, decoder_embed_dim=32,
        decoder_depth=1, decoder_num_heads=2, mlp_ratio=2.0, qkv_bias=True,
        num_frames=2, tubelet_size=1)
    opt = T.make_optimizer(learning_rate=1e-4, warmup_steps=1,
                           total_steps=50)
    mask, n_vis = T.make_batch_masks(jax.random.PRNGKey(1), model, 4, 0.5)
    x = jnp.asarray(np.random.RandomState(2).rand(4, 2, 3, 32, 32),
                    jnp.float32)
    full = jax.jit(T.make_train_step(model, opt, n_vis, remat=False))
    acc = jax.jit(T.make_train_step(model, opt, n_vis, remat=False,
                                    accum_steps=2))
    st1 = T.init_train_state(model, opt, jax.random.PRNGKey(0))
    st2 = T.init_train_state(model, opt, jax.random.PRNGKey(0))
    s1, m1 = full(st1, x, mask)
    s2, m2 = acc(st2, x, mask)
    np.testing.assert_allclose(float(m1['loss']), float(m2['loss']),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
