"""Golden + invariant tests for the counterfactual flow pipeline."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reference_shims import install as install_reference
install_reference()

import torch  # noqa: E402

from counterfactualworldmodels_tpu.models import vmae as jvmae  # noqa: E402
from counterfactualworldmodels_tpu.models.raft.raft import RAFT  # noqa: E402
from counterfactualworldmodels_tpu.pipelines import (  # noqa: E402
    FlowGenerator, MovabilityPredictor, compute_flow_corrs,
    flow_sample_filter)
from counterfactualworldmodels_tpu.utils.torch_convert import (  # noqa: E402
    convert_raft, convert_vmae)


def test_flow_sample_filter_matches_reference():
    from cwm.models.sampling import FlowSampleFilter as RefFilter
    rng = np.random.RandomState(0)
    b, h, w, s = 2, 16, 16, 6
    flows = (rng.randn(b, 2, h, w, s) * 4).astype(np.float32)
    # active patches over 2 frames of a 4x4 grid
    active = np.ones((b, 32, s), dtype=bool)
    for bi in range(b):
        for si in range(s):
            active[bi, 16 + rng.randint(16), si] = False

    ref_filter = RefFilter(flow_magnitude_threshold=2.0,
                           flow_area_threshold=0.5, num_corners_threshold=2)
    ref_flows, ref_mask = ref_filter(torch.tensor(flows.copy()),
                                     torch.tensor(active))
    mine, mask = flow_sample_filter(jnp.asarray(flows), jnp.asarray(active),
                                    flow_magnitude_threshold=2.0,
                                    flow_area_threshold=0.5,
                                    num_corners_threshold=2)
    np.testing.assert_array_equal(np.asarray(mask), ref_mask.numpy()[:, 0, 0, 0])
    np.testing.assert_allclose(np.asarray(mine), ref_flows.numpy(), atol=1e-5)


@pytest.mark.parametrize('use_covariance', [True, False])
def test_flow_corrs_matches_reference(use_covariance):
    from cwm.models.segmentation import FlowGenerator as RefFG
    rng = np.random.RandomState(1)
    flows = rng.randn(2, 2, 8, 8, 5).astype(np.float32)
    ref = RefFG.compute_flow_corrs(torch.tensor(flows), downsample=2,
                                   use_covariance=use_covariance).numpy()
    mine = np.asarray(compute_flow_corrs(jnp.asarray(flows), downsample=2,
                                         use_covariance=use_covariance))
    assert mine.shape == ref.shape
    np.testing.assert_allclose(mine, ref, atol=1e-4)


def _paired_generators(img_size=128, patch=8):
    """(reference FlowGenerator, my FlowGenerator) with identical weights."""
    from cwm.models.VideoMAE.vmae import PretrainVisionTransformer as TorchPVT
    from cwm.models.segmentation import FlowGenerator as RefFG
    from cwm.models.raft.raft_model import RAFT as TorchRAFT, get_args

    torch.manual_seed(0)
    tmodel = TorchPVT(
        img_size=img_size, patch_size=(patch, patch), encoder_embed_dim=48,
        encoder_depth=2, encoder_num_heads=4, encoder_num_classes=0,
        decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2,
        mlp_ratio=2, qkv_bias=True, num_frames=2, tubelet_size=1,
        decoder_num_classes=3 * patch * patch,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6)).eval()

    args = get_args('')
    args.multiframe = True
    args.scale_inputs = True
    args.small = False
    args.output_dim = None
    args.mixed_precision = False
    torch.manual_seed(1)
    traft = TorchRAFT(args).eval()

    ref = RefFG(predictor=tmodel, flow_model=traft, raft_iters=2,
                imagenet_normalize_inputs=True, temporal_dim=2, seed=0)

    jmodel = jvmae.PretrainVisionTransformer(
        img_size=(img_size, img_size), patch_size=(patch, patch),
        encoder_embed_dim=48, encoder_depth=2, encoder_num_heads=4,
        decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2,
        mlp_ratio=2.0, qkv_bias=True, num_frames=2, tubelet_size=1)
    jraft = RAFT(iters=2)
    mine = FlowGenerator(predictor=jmodel,
                         params=convert_vmae(tmodel.state_dict()),
                         flow_model=jraft,
                         flow_params=convert_raft(traft.state_dict()),
                         raft_iters=2, imagenet_normalize_inputs=True,
                         seed=0, engine='exact')
    return ref, mine


def test_create_motion_counterfactuals_matches_reference():
    ref, mine = _paired_generators()
    rng = np.random.RandomState(2)
    x = rng.rand(1, 2, 3, 128, 128).astype(np.float32)
    n = 2 * 16 * 16
    passive = np.ones((1, n), dtype=bool)
    passive[0, :n // 2] = False          # frame 0 visible
    passive[0, n // 2 + 37] = False      # one passive patch in frame 1
    active = np.ones((1, n), dtype=bool)
    active[0, :n // 2] = False
    active[0, n // 2 + 7 * 16 + 8] = False  # one active patch
    shifts = [(1, 1), (-1, 2)]

    ref.set_input(torch.tensor(x))
    x_ref, m_ref = ref.create_motion_counterfactuals(
        torch.tensor(x),
        masks=torch.tensor(passive)[..., None].expand(-1, -1, 2),
        active_patches=torch.tensor(active)[..., None].expand(-1, -1, 2),
        shifts=shifts, num_samples=2, fix_passive=True)

    mine.set_input(jnp.asarray(x))
    x_mine, m_mine = mine.create_motion_counterfactuals(
        jnp.asarray(x), masks=jnp.tile(jnp.asarray(passive)[..., None],
                                       (1, 1, 2)),
        active_patches=jnp.tile(jnp.asarray(active)[..., None], (1, 1, 2)),
        shifts=shifts, num_samples=2, fix_passive=True)
    np.testing.assert_allclose(np.asarray(x_mine), x_ref.numpy(), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(m_mine), m_ref.numpy())


def test_counterfactual_videos_and_flows_match_reference():
    """Full fused pipeline vs the reference chain (predictor + RAFT)."""
    ref, mine = _paired_generators()
    rng = np.random.RandomState(3)
    x = rng.rand(1, 2, 3, 128, 128).astype(np.float32)
    n = 2 * 16 * 16
    active = np.ones((1, n), dtype=bool)
    active[0, :n // 2] = False
    active[0, n // 2 + 5 * 16 + 5] = False
    shifts = [(2, 1), (1, -2)]

    with torch.no_grad():
        y_ref, f_ref = ref.predict_counterfactual_videos_and_flows(
            torch.tensor(x), active_patches=torch.tensor(active),
            shifts=shifts, num_samples=2, sample_batch_size=2)
    y, f = mine.predict_counterfactual_videos_and_flows(
        jnp.asarray(x), active_patches=jnp.asarray(active), shifts=shifts,
        num_samples=2, sample_batch_size=2)
    assert y.shape == tuple(y_ref.shape)
    assert f.shape == tuple(f_ref.shape)
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(f), f_ref.numpy(), atol=2e-2)


@pytest.mark.slow
def test_sample_counterfactual_motion_map_shapes():
    _, mine = _paired_generators()
    rng = np.random.RandomState(4)
    x = rng.rand(1, 2, 3, 128, 128).astype(np.float32)
    flows, active, passive = mine.sample_counterfactual_motion_map(
        jnp.asarray(x), num_active_patches=1, num_passive_patches=1,
        num_samples=3, sample_batch_size=3)
    assert flows.shape == (1, 2, 128, 128, 3)
    assert active.shape == (1, 512, 3)
    assert np.isfinite(np.asarray(flows)).all()
    motion = mine.compute_mean_motion_map(flows)
    assert motion.shape == (1, 1, 128, 128)
    assert float(motion.max()) <= 1.0 + 1e-5


def test_movability_predictor_runs():
    _, base = _paired_generators()
    m = MovabilityPredictor(
        predictor=base.predictor, params=base.params,
        flow_model=base.flow_model, flow_params=base.flow_params,
        raft_iters=2, imagenet_normalize_inputs=True, seed=0,
        initialize_from_keypoints=False, num_initial_samples=2,
        num_samples_per_iteration=2, num_iters=1, sample_batch_size=2)
    rng = np.random.RandomState(5)
    x = rng.rand(1, 2, 3, 128, 128).astype(np.float32)
    out = m(jnp.asarray(x))
    assert out.shape == (1, 1, 128, 128)
    assert np.isfinite(np.asarray(out)).all()
    assert len(m.flow_samples_per_iter) == 2
    total = m.get_total_movability()
    assert total.shape == (1, 1, 128, 128)
    mini = m.get_minimum_movability()
    assert mini.shape == (1, 1, 128, 128)


def test_iterative_patch_selector_grows_masks():
    from counterfactualworldmodels_tpu.pipelines import IterativePatchSelector
    _, mine = _paired_generators()
    rng = np.random.RandomState(6)
    x = rng.rand(1, 2, 3, 128, 128).astype(np.float32)

    n_per = 16 * 16
    init_active = np.zeros((1, 2 * n_per), dtype=bool)
    init_active[0, n_per:] = True
    init_active[0, n_per + 5 * 16 + 5] = False  # one seed active patch

    sel = IterativePatchSelector(mine, num_iters=2, samples_per_iter=2,
                                 sample_batch_size=2)
    fs, actives, passives = sel(jnp.asarray(x), init_actives=init_active)
    assert fs.shape == (1, 2, 128, 128, 4)
    assert actives.shape == (1, 2 * n_per, 3)
    assert passives.shape == (1, 2 * n_per, 3)
    a = np.asarray(actives)
    p = np.asarray(passives)
    for k in range(actives.shape[-1]):
        # each iteration adds exactly one active + one passive patch
        assert (~a[0, n_per:, k]).sum() == 1 + k
        assert (~p[0, n_per:, k]).sum() == k
        if k:
            # monotone growth: earlier selections stay selected
            assert ((~a[0, :, k - 1]) <= (~a[0, :, k])).all()
            assert ((~p[0, :, k - 1]) <= (~p[0, :, k])).all()
        # active and passive sets stay disjoint (frame-1 selections)
        assert not ((~a[0, n_per:, k]) & (~p[0, n_per:, k])).any()
    # the combined-mask view the interface uses (active in ANY iteration)
    assert (~a.min(-1)[0, n_per:]).sum() == actives.shape[-1]
    assert np.isfinite(np.asarray(fs)).all()


def test_generator_fast_engine_matches_exact():
    """FlowGenerator(engine='fast') routes the central API through the
    shared-prefix engine + PrefixCache LRU and stays close to the exact
    path; a repeat call on the same image hits the cache."""
    _, exact = _paired_generators()
    fast = FlowGenerator(predictor=exact.predictor, params=exact.params,
                         flow_model=exact.flow_model,
                         flow_params=exact.flow_params, raft_iters=2,
                         imagenet_normalize_inputs=True, seed=0,
                         engine='fast')
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(1, 3, 128, 128).astype(np.float32))
    n = exact.predictor.num_patches
    active = np.ones((1, n), dtype=bool)
    active[0, n // 2 + rng.randint(n // 2)] = False
    active = jnp.asarray(active)

    kw = dict(active_patches=active, shifts=[(0, 1), (1, 0)], num_samples=2,
              sample_batch_size=2)
    y_e, f_e = exact.predict_counterfactual_videos_and_flows(x, **kw)
    y_f, f_f = fast.predict_counterfactual_videos_and_flows(x, **kw)
    assert y_f.shape == y_e.shape and f_f.shape == f_e.shape
    assert fast._prefix_lru is not None and fast._prefix_lru.misses == 1
    corr = np.corrcoef(np.asarray(y_f).ravel(), np.asarray(y_e).ravel())[0, 1]
    assert corr > 0.99, corr

    # same image again -> prefix cache hit
    y_f2, _ = fast.predict_counterfactual_videos_and_flows(x, **kw)
    assert fast._prefix_lru.hits >= 1
    assert y_f2.shape == y_f.shape


def test_fast_engine_failure_degrades_to_exact(monkeypatch):
    """engine='fast' is the default: a fast-engine failure (e.g. a Pallas
    kernel that fails to compile on local hardware) must warn once, flip
    the generator to the exact path, and produce the exact path's output
    bit-for-bit (keys/shifts are drawn before the engine routing)."""
    import warnings
    from counterfactualworldmodels_tpu.models import vmae as jvmae
    from counterfactualworldmodels_tpu.models import fast_vmae
    from counterfactualworldmodels_tpu.models.raft.raft import (
        RAFT, init_raft_params)

    model = jvmae.PretrainVisionTransformer(
        img_size=(32, 32), patch_size=(4, 4), encoder_embed_dim=64,
        encoder_depth=2, encoder_num_heads=4, decoder_embed_dim=32,
        decoder_depth=1, decoder_num_heads=2, num_frames=2, qkv_bias=True)
    params = jvmae.init_params(model, jax.random.PRNGKey(0))
    raft = RAFT(iters=2)
    rparams = init_raft_params(raft, jax.random.PRNGKey(1), hw=32)

    def make(engine):
        return FlowGenerator(predictor=model, params=params,
                             flow_model=raft, flow_params=rparams,
                             raft_iters=2, imagenet_normalize_inputs=True,
                             seed=0, engine=engine)

    exact, broken = make('exact'), make('fast')
    monkeypatch.setattr(
        fast_vmae, 'stack_vmae_params',
        lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError('mosaic compile failed')))

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(1, 3, 32, 32).astype(np.float32))
    n = model.num_patches
    active = np.ones((1, n), dtype=bool)
    active[0, n // 2 + rng.randint(n // 2)] = False
    active = jnp.asarray(active)
    kw = dict(active_patches=active, shifts=[(0, 1), (1, 0)], num_samples=2,
              sample_batch_size=2)

    with pytest.warns(RuntimeWarning, match='falling back to the exact'):
        y_b, f_b = broken.predict_counterfactual_videos_and_flows(x, **kw)
    assert broken._fast_disabled
    y_e, f_e = exact.predict_counterfactual_videos_and_flows(x, **kw)
    np.testing.assert_allclose(np.asarray(y_b), np.asarray(y_e), atol=1e-6)
    np.testing.assert_allclose(np.asarray(f_b), np.asarray(f_e), atol=1e-5)

    # subsequent calls skip the fast route silently (no second warning)
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        broken.predict_counterfactual_videos_and_flows(x, **kw)


def test_fast_multi_scene_matches_per_scene_dispatches():
    """counterfactual_videos_and_flows_fast_multi: S=1 prompts on
    DIFFERENT scenes batched via stacked per-sample prefix caches == the
    per-scene fast dispatches run serially."""
    from counterfactualworldmodels_tpu.models import vmae as jvmae
    from counterfactualworldmodels_tpu.models import fast_vmae as fv
    from counterfactualworldmodels_tpu.models.raft.raft import (
        RAFT, init_raft_params)
    from counterfactualworldmodels_tpu.pipelines.segmentation import (
        counterfactual_videos_and_flows_fast,
        counterfactual_videos_and_flows_fast_multi)

    model = jvmae.PretrainVisionTransformer(
        img_size=(32, 32), patch_size=(4, 4), encoder_embed_dim=64,
        encoder_depth=2, encoder_num_heads=4, decoder_embed_dim=32,
        decoder_depth=1, decoder_num_heads=2, num_frames=2, qkv_bias=True)
    params = jvmae.init_params(model, jax.random.PRNGKey(0))
    fp = fv.stack_vmae_params(model, params, dtype=jnp.float32)
    raft = RAFT(iters=2)
    rparams = init_raft_params(raft, jax.random.PRNGKey(1), hw=32)

    rng = np.random.RandomState(7)
    n = model.num_patches
    n_vis = n // 2 + 1
    scenes, serial = [], []
    for i in range(3):
        x = jnp.asarray(rng.rand(1, 2, 3, 32, 32).astype(np.float32))
        active = np.ones((1, n, 1), dtype=bool)
        active[0, :n // 2, 0] = False
        active[0, n // 2 + rng.randint(n // 2), 0] = False
        passive = np.ones((1, n, 1), dtype=bool)
        passive[0, :n // 2, 0] = False
        shifts = jnp.asarray([[[1, i - 1]]], jnp.int32)
        keys = jax.random.PRNGKey(10 + i)[None, None]
        cache = fv.make_prefix_cache(model, fp, False, True, x[:, 0])
        y, f, m = counterfactual_videos_and_flows_fast(
            model, fp, raft, rparams, x, jnp.asarray(passive),
            jnp.asarray(active), shifts, keys,
            fv.sfx_bucket(n_vis - n // 2, n // 2), True, 2, True,
            False, False, prefix_cache=cache, n_vis=n_vis)
        serial.append((y, f, m))
        scenes.append((x, passive[..., 0], active[..., 0], shifts[0],
                       keys[0], cache))

    stacked = fv.stack_prefix_caches([s[-1] for s in scenes])
    y_m, f_m, m_m = counterfactual_videos_and_flows_fast_multi(
        model, fp, raft, rparams,
        jnp.concatenate([s[0] for s in scenes]),
        jnp.concatenate([jnp.asarray(s[1]) for s in scenes]),
        jnp.concatenate([jnp.asarray(s[2]) for s in scenes]),
        jnp.concatenate([s[3] for s in scenes]),
        fv.sfx_bucket(n_vis - n // 2, n // 2), True, 2, True,
        False, False,
        jnp.concatenate([s[4] for s in scenes]), stacked, n_vis=n_vis)

    np.testing.assert_array_equal(
        np.asarray(m_m), np.asarray(jnp.concatenate([m for _, _, m in serial])))
    np.testing.assert_allclose(
        np.asarray(y_m), np.asarray(jnp.concatenate([y for y, _, _ in serial])),
        atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(f_m), np.asarray(jnp.concatenate([f for _, f, _ in serial])),
        atol=1e-3)


def test_movability_predictor_fast_engine():
    """Movability's iterative sampling loop probes ONE scene repeatedly —
    with engine='fast' every round after the first hits the PrefixLru."""
    _, base = _paired_generators()
    m = MovabilityPredictor(
        predictor=base.predictor, params=base.params,
        flow_model=base.flow_model, flow_params=base.flow_params,
        raft_iters=2, imagenet_normalize_inputs=True, seed=0,
        initialize_from_keypoints=False, num_initial_samples=2,
        num_samples_per_iteration=2, num_iters=1, sample_batch_size=2,
        engine='fast')
    rng = np.random.RandomState(5)
    x = rng.rand(1, 2, 3, 128, 128).astype(np.float32)
    out = m(jnp.asarray(x))
    assert out.shape == (1, 1, 128, 128)
    assert np.isfinite(np.asarray(out)).all()
    assert m._prefix_lru is not None
    assert m._prefix_lru.misses == 1  # one scene -> one prefix build
    assert m._prefix_lru.hits >= 1    # later rounds reuse it


def test_fast_engine_falls_back_when_frame0_masked():
    """Masks touching frame 0 violate the prefix factorization; the fast
    engine must route those prompts through the exact path (code-review r2
    finding: the guard used to check only batch size and fix_passive)."""
    _, exact = _paired_generators()
    fast = FlowGenerator(predictor=exact.predictor, params=exact.params,
                         flow_model=exact.flow_model,
                         flow_params=exact.flow_params, raft_iters=2,
                         imagenet_normalize_inputs=True, seed=0,
                         engine='fast')
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.rand(1, 3, 128, 128).astype(np.float32))
    n = exact.predictor.num_patches
    active = np.ones((1, n), dtype=bool)
    active[0, n // 2 + rng.randint(n // 2)] = False
    passive = np.ones((1, n), dtype=bool)
    passive[0, rng.choice(n // 2, 2, replace=False)] = True  # frame-0 mask
    passive[0, n // 2 + 5] = False
    active, passive = jnp.asarray(active), jnp.asarray(passive)

    kw = dict(active_patches=active, passive_patches=passive,
              shifts=[(0, 1)], num_samples=1, sample_batch_size=1)
    y_e, f_e = exact.predict_counterfactual_videos_and_flows(x, **kw)
    y_f, f_f = fast.predict_counterfactual_videos_and_flows(x, **kw)
    # identical seeds + exact route on both sides -> bitwise-close results
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_e), atol=1e-5)
    assert fast._prefix_lru is None  # fast route never engaged


def test_predict_fast_engine_routes_and_falls_back():
    """FlowGenerator(engine='fast').predict — the interface's per-click
    path — routes through the shared-prefix engine when frame 0 is fully
    visible (PrefixLru reuse across clicks) and falls back to the exact
    forward otherwise."""
    _, exact = _paired_generators()
    fast = FlowGenerator(predictor=exact.predictor, params=exact.params,
                         flow_model=exact.flow_model,
                         flow_params=exact.flow_params, raft_iters=2,
                         imagenet_normalize_inputs=True, seed=0,
                         engine='fast')
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.rand(1, 2, 3, 128, 128).astype(np.float32))
    n = exact.predictor.num_patches
    n0 = n // 2
    mask = np.ones((1, n), dtype=bool)
    mask[0, :n0] = False
    mask[0, n0 + 3] = False          # one visible frame-1 patch

    y_e = exact.predict(x, jnp.asarray(mask), frame=None)
    y_f = fast.predict(x, jnp.asarray(mask), frame=None)
    assert fast._prefix_lru is not None and fast._prefix_lru.misses == 1
    assert y_f.shape == y_e.shape
    # frame 0 and visible patches pass through the input unchanged
    np.testing.assert_allclose(np.asarray(y_f[:, 0]), np.asarray(y_e[:, 0]),
                               atol=1e-6)
    corr = np.corrcoef(np.asarray(y_f[:, 1]).ravel(),
                       np.asarray(y_e[:, 1]).ravel())[0, 1]
    assert corr > 0.99, corr

    # repeat click on the same scene hits the cache; frame selection works
    y1 = fast.predict(x, jnp.asarray(mask), frame=1)
    assert fast._prefix_lru.hits >= 1 and y1.shape[1] == 1

    # frame-0-masking mask falls back to the exact path (bit-equal)
    mask0 = mask.copy()
    mask0[0, 5] = True
    y_fb = fast.predict(x, jnp.asarray(mask0), frame=None)
    y_eb = exact.predict(x, jnp.asarray(mask0), frame=None)
    np.testing.assert_allclose(np.asarray(y_fb), np.asarray(y_eb), atol=0)


def test_factual_predict_zero_visible_frame1_keeps_fast_engine():
    """Regression (r04 degrade-poisoning): a factual predict whose frame 1
    is FULLY masked — the reference's default predict workload
    (cwm/models/masking.py:478-545 at mask_ratio 1.0) — crashed the
    zero-width suffix attention, and the degrade chain then PERMANENTLY
    flipped the generator to the exact engine: one /predict silently cost
    every later counterfactual its fast path. The prompt must now run on
    the fast engine, and a following counterfactual must still use it."""
    _, exact = _paired_generators()
    fast = FlowGenerator(predictor=exact.predictor, params=exact.params,
                         flow_model=exact.flow_model,
                         flow_params=exact.flow_params, raft_iters=2,
                         imagenet_normalize_inputs=True, seed=0,
                         engine='fast')
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.rand(1, 2, 3, 128, 128).astype(np.float32))
    n = exact.predictor.num_patches
    n0 = n // 2
    mask = np.ones((1, n), dtype=bool)
    mask[0, :n0] = False                      # frame 1 fully masked

    y_f = fast.predict(x, jnp.asarray(mask), frame=None)
    assert not fast._fast_disabled
    assert fast._prefix_lru is not None and fast._prefix_lru.misses == 1
    y_e = exact.predict(x, jnp.asarray(mask), frame=None)
    corr = np.corrcoef(np.asarray(y_f[:, 1]).ravel(),
                       np.asarray(y_e[:, 1]).ravel())[0, 1]
    assert corr > 0.99, corr

    # the subsequent counterfactual still rides the fast engine (and hits
    # the prefix cache built by the factual predict)
    active = np.ones((1, n), dtype=bool)
    active[0, n0 + rng.randint(n0)] = False
    y_cf, f_cf = fast.predict_counterfactual_videos_and_flows(
        x[:, 0], active_patches=jnp.asarray(active), shifts=[(0, 1)],
        num_samples=1, sample_batch_size=1)
    assert not fast._fast_disabled
    assert fast._prefix_lru.hits >= 1
    assert np.isfinite(np.asarray(f_cf)).all()


def test_unsupported_prompt_valueerror_does_not_poison_fast_engine(
        monkeypatch):
    """A ValueError from inside the fast route (engine precondition miss)
    must fall back to the exact path for THAT call only — the engine stays
    enabled for later supported prompts. Non-ValueError failures (kernel
    broke) still disable permanently (covered by
    test_fast_engine_failure_degrades_to_exact)."""
    import warnings
    from counterfactualworldmodels_tpu.pipelines import segmentation as seg

    _, exact = _paired_generators()
    fast = FlowGenerator(predictor=exact.predictor, params=exact.params,
                         flow_model=exact.flow_model,
                         flow_params=exact.flow_params, raft_iters=2,
                         imagenet_normalize_inputs=True, seed=0,
                         engine='fast')
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.rand(1, 3, 128, 128).astype(np.float32))
    n = exact.predictor.num_patches
    active = np.ones((1, n), dtype=bool)
    active[0, n // 2 + rng.randint(n // 2)] = False
    kw = dict(active_patches=jnp.asarray(active), shifts=[(0, 1)],
              num_samples=1, sample_batch_size=1)

    calls = {'n': 0}
    real = seg.counterfactual_videos_and_flows_fast

    def flaky(*a, **k):
        calls['n'] += 1
        if calls['n'] == 1:
            raise ValueError('unsupported prompt shape for this engine')
        return real(*a, **k)

    monkeypatch.setattr(seg, 'counterfactual_videos_and_flows_fast', flaky)
    with pytest.warns(RuntimeWarning, match='for this call only'):
        y1, f1 = fast.predict_counterfactual_videos_and_flows(x, **kw)
    assert not fast._fast_disabled          # NOT permanently degraded
    assert np.isfinite(np.asarray(f1)).all()

    # next call retries the fast engine and succeeds on it
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        y2, f2 = fast.predict_counterfactual_videos_and_flows(x, **kw)
    assert calls['n'] == 2 and not fast._fast_disabled
    assert np.isfinite(np.asarray(f2)).all()


def test_set_flow_model_and_predict_flow_per_sample():
    """set_flow_model swap (reference segmentation.py:71-84) and
    predict_flow_per_sample (reference segmentation.py:199-208)."""
    _, mine = _paired_generators()
    rng = np.random.RandomState(21)
    x = rng.rand(1, 2, 3, 128, 128).astype(np.float32)
    n = 2 * 16 * 16
    masks = np.ones((1, n, 2), dtype=bool)
    masks[:, :n // 2] = False
    for j in range(2):
        masks[0, n // 2 + rng.choice(n // 2, 4, replace=False), j] = False

    flows = mine.predict_flow_per_sample(jnp.asarray(x), jnp.asarray(masks))
    assert flows.shape == (1, 1, 2, 128, 128, 2)  # [B, T-1, 2, H, W, S]
    # equivalence with the video+flow variant's flow output
    _, flows2 = mine.predict_video_and_flow_per_sample(jnp.asarray(x),
                                                       jnp.asarray(masks))
    np.testing.assert_allclose(np.asarray(flows), np.asarray(flows2),
                               atol=1e-5)

    # model swap: same weights through set_flow_model reproduces the probe;
    # params=None keeps the existing converted weights
    old_params = mine.flow_params
    mine.set_flow_model(flow_model=RAFT(iters=2))
    assert mine.flow_params is old_params
    flows3 = mine.predict_flow_per_sample(jnp.asarray(x), jnp.asarray(masks))
    np.testing.assert_allclose(np.asarray(flows3), np.asarray(flows),
                               atol=1e-5)


def test_movability_visualization_methods():
    """sample_and_visualize_keypoints / visualize_iterations
    (reference movability.py:89-126, 232-281)."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    _, base = _paired_generators()
    m = MovabilityPredictor(
        predictor=base.predictor, params=base.params,
        flow_model=base.flow_model, flow_params=base.flow_params,
        raft_iters=2, imagenet_normalize_inputs=True, seed=0,
        initialize_from_keypoints=False, num_initial_samples=2,
        num_samples_per_iteration=2, num_iters=1, sample_batch_size=2)
    rng = np.random.RandomState(22)
    x = rng.rand(1, 2, 3, 128, 128).astype(np.float32)
    m(jnp.asarray(x))

    kps, img = m.sample_and_visualize_keypoints(num_samples=3)
    assert kps.shape[-1] == 3
    assert img.shape == x.shape
    assert np.isfinite(np.asarray(img)).all()
    # red overlay: the keypoint patches moved toward red in channel 0
    union = np.asarray(jnp.min(kps, -1))
    assert (~union).any()

    m.visualize_iterations()
    assert m.fig is not None
    plt.close('all')
