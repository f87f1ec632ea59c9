"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from counterfactualworldmodels_tpu import parallel
from counterfactualworldmodels_tpu.models import vmae as jvmae
from counterfactualworldmodels_tpu.models.raft.raft import RAFT, init_raft_params
from counterfactualworldmodels_tpu.pipelines.segmentation import (
    FlowGenerator, counterfactual_videos_and_flows, compute_flow_corrs)
from counterfactualworldmodels_tpu.training import train as jtrain


def _tiny_model():
    return jvmae.PretrainVisionTransformer(
        img_size=(32, 32), patch_size=(8, 8), encoder_embed_dim=64,
        encoder_depth=2, encoder_num_heads=4, decoder_embed_dim=32,
        decoder_depth=1, decoder_num_heads=2, num_frames=2)


def test_mesh_and_partition_rules():
    mesh = parallel.make_mesh({'dp': 4, 'tp': 2})
    assert mesh.devices.shape == (4, 2)
    from jax.sharding import PartitionSpec as P
    assert parallel.partition_spec_for('encoder/blocks_0/attn/qkv_kernel') \
        == P(None, None, 'tp')
    assert parallel.partition_spec_for('encoder/blocks_0/mlp/fc2/kernel') \
        == P('tp', None)
    assert parallel.partition_spec_for('mask_token') == P()


def test_sharded_params_match_unsharded_forward():
    mesh = parallel.make_mesh({'dp': 4, 'tp': 2})
    model = _tiny_model()
    params = jvmae.init_params(model, jax.random.PRNGKey(0))
    sharded = parallel.shard_params(params, mesh)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 3, 2, 32, 32).astype(np.float32))
    n = model.num_patches
    mask = jnp.asarray(np.tile(np.arange(n) >= 12, (2, 1)))
    y_ref = jvmae.apply_vmae(model, params, x, mask, 12)
    y_sh = jvmae.apply_vmae(model, sharded, x, mask, 12)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               atol=1e-5)


@pytest.mark.slow
def test_sharded_counterfactuals_match_single_device():
    mesh = parallel.sample_parallel_mesh(8)
    model = _tiny_model()
    params = jvmae.init_params(model, jax.random.PRNGKey(0))
    raft = RAFT(iters=1)
    raft_params = init_raft_params(raft, jax.random.PRNGKey(1), hw=32)

    rng = np.random.RandomState(1)
    b, s = 1, 8
    x = jnp.asarray(rng.rand(b, 2, 3, 32, 32).astype(np.float32))
    n = model.num_patches
    passive = np.ones((b, n, s), dtype=bool)
    passive[:, :n // 2] = False
    active = passive.copy()
    for i in range(s):
        active[0, n // 2 + rng.randint(n // 2), i] = False
    passive, active = jnp.asarray(passive), jnp.asarray(active)
    shifts = jnp.asarray(rng.randint(-1, 2, size=(b, s, 2)), jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(2), b * s).reshape(b, s, 2)
    n_vis = n // 2 + 1

    args = (model, params, raft, raft_params, x, passive, active, shifts,
            keys, n_vis, True, 1, True)
    y_ref, f_ref, m_ref = counterfactual_videos_and_flows(*args)
    y_sh, f_sh, m_sh = parallel.sharded_counterfactuals(mesh, *args)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_sh), np.asarray(f_ref), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(m_sh), np.asarray(m_ref))


def test_remat_ladder_matches_full():
    """apply_remat: 'dots' (save MXU outputs, recompute elementwise) and
    False (no remat) give the SAME update as full remat — remat is pure
    recompute scheduling, numerics-neutral up to fp reassociation. Also
    exercises the bf16-first-moment optimizer (mu_dtype)."""
    model = _tiny_model()
    opt = jtrain.make_optimizer(learning_rate=1e-3, warmup_steps=1,
                                total_steps=10)
    state0 = jtrain.init_train_state(model, opt, jax.random.PRNGKey(0))
    mask, n_vis = jtrain.make_batch_masks(jax.random.PRNGKey(1), model,
                                          batch_size=2, mask_ratio=0.5)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 2, 3, 32, 32).astype(np.float32))

    def leaf0(state):
        return np.asarray(jax.tree_util.tree_leaves(state.params)[0],
                          np.float32)

    ref_state, ref_m = jtrain.make_train_step(model, opt, n_vis,
                                              remat=True)(state0, x, mask)
    for mode in ('dots', False):
        st, m = jtrain.make_train_step(model, opt, n_vis,
                                       remat=mode)(state0, x, mask)
        np.testing.assert_allclose(float(m['loss']),
                                   float(ref_m['loss']), rtol=1e-5)
        np.testing.assert_allclose(leaf0(st), leaf0(ref_state), atol=1e-5)
    with pytest.raises(ValueError, match='remat'):
        jtrain.make_train_step(model, opt, n_vis, remat='bogus')

    opt_b = jtrain.make_optimizer(learning_rate=1e-3, warmup_steps=1,
                                  total_steps=10, mu_dtype=jnp.bfloat16)
    st_b = jtrain.init_train_state(model, opt_b, jax.random.PRNGKey(0))
    st_b, m_b = jtrain.make_train_step(model, opt_b, n_vis)(st_b, x, mask)
    assert np.isfinite(float(m_b['loss']))
    mu = jax.tree_util.tree_leaves(st_b.opt_state)
    assert any(getattr(l, 'dtype', None) == jnp.bfloat16 for l in mu)


@pytest.mark.slow
def test_sharded_train_step_runs_and_matches():
    mesh = parallel.make_mesh({'dp': 2, 'tp': 2})
    model = _tiny_model()
    opt = jtrain.make_optimizer(learning_rate=1e-3, warmup_steps=1,
                                total_steps=10)
    state = jtrain.init_train_state(model, opt, jax.random.PRNGKey(0))

    mask, n_vis = jtrain.make_batch_masks(jax.random.PRNGKey(1), model,
                                          batch_size=4, mask_ratio=0.5)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(4, 2, 3, 32, 32).astype(np.float32))

    # single-device result
    step = jtrain.make_train_step(model, opt, n_vis)
    ref_state, ref_metrics = step(state, x, mask)

    # sharded result
    jitted, shard_state, data_sharding = jtrain.make_sharded_train_step(
        model, opt, mesh, n_vis)
    st = shard_state(state)
    xs = jax.device_put(x, data_sharding)
    ms = jax.device_put(mask, data_sharding)
    new_state, metrics = jitted(st, xs, ms)
    assert np.isfinite(float(metrics['loss']))
    np.testing.assert_allclose(float(metrics['loss']),
                               float(ref_metrics['loss']), rtol=1e-4)
    # params actually updated and match the single-device update
    ref_leaf = np.asarray(jax.tree_util.tree_leaves(ref_state.params)[0])
    sh_leaf = np.asarray(jax.tree_util.tree_leaves(new_state.params)[0])
    np.testing.assert_allclose(sh_leaf, ref_leaf, atol=1e-5)


def test_sharded_conjoined_train_step_runs_and_matches():
    """dp x tp training of the conjoined (IMU-conditioned) family matches
    the single-device step; cross-block values/MLPs really shard over tp."""
    from counterfactualworldmodels_tpu.models.conjoined import (
        ConjoinedVMAE, StreamSpec, init_conjoined_params)

    mesh = parallel.make_mesh({'dp': 2, 'tp': 2})
    mspec = StreamSpec(img_size=(32, 32), patch_size=(8, 8), in_chans=3,
                       num_frames=2, encoder_embed_dim=48, encoder_depth=2,
                       encoder_num_heads=4, decoder_embed_dim=32,
                       decoder_depth=1, decoder_num_heads=4, mlp_ratio=2.0)
    cspec = StreamSpec(is_imu=True, in_chans=6, sequence_length=32,
                       imu_tubelet=8, encoder_embed_dim=32, encoder_depth=2,
                       encoder_num_heads=4, decoder_embed_dim=24,
                       decoder_depth=1, decoder_num_heads=4,
                       decoder_num_classes=48, mlp_ratio=2.0,
                       concat_dummy_token=True)
    model = ConjoinedVMAE(main=mspec, context=cspec,
                          conjoin_encoder_layers=((0, 0), (1, 1)),
                          conjoin_decoder_layers=((0, 0),))
    opt = jtrain.make_optimizer(learning_rate=1e-3, warmup_steps=1,
                                total_steps=10)
    params = init_conjoined_params(model, jax.random.PRNGKey(0))
    state = jtrain.TrainState(jnp.zeros((), jnp.int32), params,
                              opt.init(params))

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(4, 3, 2, 32, 32).astype(np.float32))
    imu = jnp.asarray(rng.randn(4, 6, 32).astype(np.float32))[..., None, None]
    mask = np.ones((4, 32), bool)
    mask[:, :18] = False
    mask = jnp.asarray(mask)
    mask_c = jnp.zeros((4, 4), bool)
    n_vis, n_vis_c = 18, 4

    step = jtrain.make_conjoined_train_step(model, opt, n_vis, n_vis_c)
    ref_state, ref_metrics = step(state, x, mask, imu, mask_c)

    jitted, shard_state, data_sharding = \
        jtrain.make_sharded_conjoined_train_step(model, opt, mesh, n_vis,
                                                 n_vis_c)
    st = shard_state(state)
    # cross-block value kernel must actually split over tp (heads axis)
    vk = st.params['encoder_cross_blocks_0']['cross_attention']['v']['kernel']
    assert vk.sharding.shard_shape(vk.shape) == (48, 24), \
        vk.sharding.shard_shape(vk.shape)
    new_state, metrics = jitted(
        st, jax.device_put(x, data_sharding),
        jax.device_put(mask, data_sharding),
        jax.device_put(imu, data_sharding),
        jax.device_put(mask_c, data_sharding))
    assert np.isfinite(float(metrics['loss']))
    np.testing.assert_allclose(float(metrics['loss']),
                               float(ref_metrics['loss']), rtol=1e-4)
    ref_leaf = np.asarray(jax.tree_util.tree_leaves(ref_state.params)[0])
    sh_leaf = np.asarray(jax.tree_util.tree_leaves(new_state.params)[0])
    np.testing.assert_allclose(sh_leaf, ref_leaf, atol=1e-5)


def test_sharded_cmae_train_step_runs_and_matches():
    """dp x tp ChannelMae training matches the single-device step (the
    Block layout is shared with VMAE, so VMAE_PARTITION_RULES apply)."""
    from counterfactualworldmodels_tpu.models import cmae as jcmae

    mesh = parallel.make_mesh({'dp': 2, 'tp': 2})
    model = jcmae.ChannelMae(
        image_size=(32, 32), patch_size=(16, 16), in_channels=3,
        channel_partition=(3,), encoder_embed_dim=64, encoder_depth=2,
        encoder_num_heads=4, decoder_embed_dim=48, decoder_depth=1,
        decoder_num_heads=4, mlp_ratio=2.0)
    opt = jtrain.make_optimizer(learning_rate=1e-3, warmup_steps=1,
                                total_steps=10)
    mask, counts = jcmae.group_uniform_mask(jax.random.PRNGKey(1),
                                            model.mask_size, 0.5,
                                            batch_size=4)
    n_vis = mask.shape[1] - sum(counts)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(4, 3, 32, 32).astype(np.float32))
    state = jtrain.init_cmae_train_state(model, opt, jax.random.PRNGKey(0),
                                         x.shape, mask, n_vis, counts)

    step = jtrain.make_cmae_train_step(model, opt, n_vis, counts)
    ref_state, ref_metrics = step(state, x, mask)

    jitted, shard_state, data_sharding = \
        jtrain.make_sharded_cmae_train_step(model, opt, mesh, n_vis, counts)
    st = shard_state(state)
    # encoder qkv really shards over tp (head-aligned out axis)
    qkv = st.params['encoder']['blocks_0']['attn']['qkv_kernel']
    assert qkv.sharding.shard_shape(qkv.shape) == (64, 3, 32), \
        qkv.sharding.shard_shape(qkv.shape)
    new_state, metrics = jitted(st, jax.device_put(x, data_sharding),
                                jax.device_put(mask, data_sharding))
    assert np.isfinite(float(metrics['loss']))
    np.testing.assert_allclose(float(metrics['loss']),
                               float(ref_metrics['loss']), rtol=1e-4)
    ref_leaf = np.asarray(jax.tree_util.tree_leaves(ref_state.params)[0])
    sh_leaf = np.asarray(jax.tree_util.tree_leaves(new_state.params)[0])
    np.testing.assert_allclose(sh_leaf, ref_leaf, atol=1e-5)


@pytest.mark.slow
def test_train_loss_decreases():
    model = _tiny_model()
    opt = jtrain.make_optimizer(learning_rate=1e-3, warmup_steps=1,
                                total_steps=50)
    state = jtrain.init_train_state(model, opt, jax.random.PRNGKey(0))
    mask, n_vis = jtrain.make_batch_masks(jax.random.PRNGKey(1), model,
                                          batch_size=2, mask_ratio=0.5)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 2, 3, 32, 32).astype(np.float32))
    step = jax.jit(jtrain.make_train_step(model, opt, n_vis))
    losses = []
    for _ in range(8):
        state, m = step(state, x, mask)
        losses.append(float(m['loss']))
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_pipelined_blocks_match_sequential():
    """pp over 4 stages x microbatches == sequential block stack."""
    from counterfactualworldmodels_tpu.parallel.pipeline import (
        stack_block_params, unstack_block_params, make_pp_encoder_forward)
    from counterfactualworldmodels_tpu.parallel import make_mesh
    from counterfactualworldmodels_tpu.models import vmae as jvmae
    from counterfactualworldmodels_tpu.models.layers import Block

    model = jvmae.PretrainVisionTransformer(
        img_size=(32, 32), patch_size=(8, 8), encoder_embed_dim=48,
        encoder_depth=8, encoder_num_heads=4, decoder_embed_dim=32,
        decoder_depth=1, decoder_num_heads=2, mlp_ratio=2.0, qkv_bias=True,
        num_frames=2, tubelet_size=1)
    params = jvmae.init_params(model, jax.random.PRNGKey(0))
    enc = params['encoder']

    mesh = make_mesh({'pp': 4})
    fwd, shard_params = make_pp_encoder_forward(model, mesh,
                                                num_microbatches=2)
    stacked = shard_params(enc)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 17, 48).astype(np.float32))
    out = fwd(stacked, x)

    block = Block(dim=48, num_heads=4, mlp_ratio=2.0, qkv_bias=True,
                  qk_scale=None, init_values=0.0)
    ref = x
    for i in range(8):
        ref = block.apply({'params': enc[f'blocks_{i}']}, ref)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # stack/unstack round-trip
    rt = unstack_block_params(stack_block_params(enc, 8), 8)
    for i in range(8):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            rt[f'blocks_{i}'], enc[f'blocks_{i}'])

    # microbatch count that doesn't divide the fill exactly
    fwd3, _ = make_pp_encoder_forward(model, mesh, num_microbatches=4)
    out4 = fwd3(stacked, x)
    np.testing.assert_allclose(np.asarray(out4), np.asarray(ref), atol=1e-5)


def test_sequence_parallel_blocks_match_sequential():
    """sp over 4 devices == sequential block stack."""
    from counterfactualworldmodels_tpu.parallel import (
        make_mesh, make_sp_encoder_forward)
    from counterfactualworldmodels_tpu.models.layers import Block

    model = jvmae.PretrainVisionTransformer(
        img_size=(32, 32), patch_size=(8, 8), encoder_embed_dim=48,
        encoder_depth=3, encoder_num_heads=4, decoder_embed_dim=32,
        decoder_depth=1, decoder_num_heads=2, mlp_ratio=2.0, qkv_bias=True,
        num_frames=2, tubelet_size=1)
    params = jvmae.init_params(model, jax.random.PRNGKey(0))
    enc = params['encoder']

    mesh = make_mesh({'sp': 4})
    fwd, shard_params = make_sp_encoder_forward(model, mesh)
    stacked = shard_params(enc)

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 48).astype(np.float32))
    out = fwd(stacked, x)

    block = Block(dim=48, num_heads=4, mlp_ratio=2.0, qkv_bias=True,
                  qk_scale=None, init_values=0.0)
    ref = x
    for i in range(3):
        ref = block.apply({'params': enc[f'blocks_{i}']}, ref)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize('use_covariance', [True, False])
def test_sharded_flow_corrs_match(use_covariance):
    """Row-sharded covariance == single-device compute_flow_corrs."""
    from counterfactualworldmodels_tpu.parallel import (make_mesh,
                                                        sharded_flow_corrs)
    rng = np.random.RandomState(0)
    flows = jnp.asarray(rng.randn(2, 2, 8, 8, 5).astype(np.float32))
    ref = compute_flow_corrs(flows, downsample=2,
                             use_covariance=use_covariance)
    mesh = make_mesh({'rows': 8})
    mine = sharded_flow_corrs(mesh, flows, downsample=2,
                              use_covariance=use_covariance)
    np.testing.assert_allclose(np.asarray(mine), np.asarray(ref), atol=1e-4)


def test_opt_state_sharding_follows_params():
    """Adam moments must take the param shardings, not replicate
    (VERDICT r1 #3): on a real pod slice replicated ViT-L moments are the
    memory blowup tp exists to avoid."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = parallel.make_mesh({'dp': 2, 'tp': 2})
    model = jvmae.PretrainVisionTransformer(
        img_size=(32, 32), patch_size=(8, 8), encoder_embed_dim=64,
        encoder_depth=2, encoder_num_heads=4, decoder_embed_dim=32,
        decoder_depth=1, decoder_num_heads=2, num_frames=2, qkv_bias=True)
    opt = jtrain.make_optimizer(warmup_steps=1, total_steps=10)
    state = jtrain.init_train_state(model, opt, jax.random.PRNGKey(0))
    _, shard_state, _ = jtrain.make_sharded_train_step(model, opt, mesh,
                                                       n_vis=12)
    st = shard_state(state)

    p_sh = parallel.param_shardings(state.params, mesh)
    # at least one param must actually be tp-sharded in this model
    qkv_sh = p_sh['encoder']['blocks_0']['attn']['qkv_kernel']
    assert qkv_sh.spec == P(None, None, 'tp'), qkv_sh.spec

    # locate the adam moment trees inside the optax state and compare
    flat_params, pdef = jax.tree_util.tree_flatten(state.params)
    found_moments = 0
    for node in jax.tree_util.tree_leaves(
            st.opt_state, is_leaf=lambda x: isinstance(x, dict)):
        if isinstance(node, dict) and \
                jax.tree_util.tree_structure(node) == pdef:
            found_moments += 1
            shardings = jax.tree_util.tree_map(lambda a: a.sharding, node)
            jax.tree_util.tree_map(
                lambda s, p: (_ for _ in ()).throw(
                    AssertionError((s, p))) if s.spec != p.spec else None,
                shardings, p_sh)
    assert found_moments >= 2, found_moments  # mu and nu


@pytest.mark.slow
def test_tensor_parallel_blocks_match_sequential():
    """tp=4 head-parallel shard_map == sequential block stack."""
    from counterfactualworldmodels_tpu.parallel import (
        make_mesh, make_tp_encoder_forward)
    from counterfactualworldmodels_tpu.models.layers import Block

    model = jvmae.PretrainVisionTransformer(
        img_size=(32, 32), patch_size=(8, 8), encoder_embed_dim=64,
        encoder_depth=3, encoder_num_heads=4, decoder_embed_dim=32,
        decoder_depth=1, decoder_num_heads=2, mlp_ratio=2.0, qkv_bias=True,
        num_frames=2, tubelet_size=1)
    params = jvmae.init_params(model, jax.random.PRNGKey(0))
    enc = params['encoder']

    mesh = make_mesh({'tp': 4})
    fwd, shard_params = make_tp_encoder_forward(model, mesh)
    stacked = shard_params(enc)

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 16, 64).astype(np.float32))
    out = fwd(stacked, x)

    block = Block(dim=64, num_heads=4, mlp_ratio=2.0, qkv_bias=True,
                  qk_scale=None, init_values=0.0)
    ref = x
    for i in range(3):
        ref = block.apply({'params': enc[f'blocks_{i}']}, ref)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # head misalignment is a hard error, not a silent fallback
    from counterfactualworldmodels_tpu.parallel.tensor import (
        tensor_parallel_blocks)
    from counterfactualworldmodels_tpu.parallel.pipeline import (
        stack_block_params)
    with pytest.raises(ValueError):
        tensor_parallel_blocks(stack_block_params(enc, 3), x, mesh,
                               num_heads=6)


def test_tp_compiles_to_collectives():
    """The compiled HLO of the tp path must contain real collectives —
    proof the attention compute distributes (VERDICT r1 #4)."""
    from counterfactualworldmodels_tpu.parallel import (
        make_mesh, make_tp_encoder_forward)

    model = jvmae.PretrainVisionTransformer(
        img_size=(32, 32), patch_size=(8, 8), encoder_embed_dim=64,
        encoder_depth=2, encoder_num_heads=4, decoder_embed_dim=32,
        decoder_depth=1, decoder_num_heads=2, num_frames=2, qkv_bias=True)
    params = jvmae.init_params(model, jax.random.PRNGKey(0))
    mesh = make_mesh({'tp': 4})
    fwd, shard_params = make_tp_encoder_forward(model, mesh)
    stacked = shard_params(params['encoder'])
    x = jnp.zeros((1, 16, 64), jnp.float32)

    compiled = jax.jit(fwd).lower(stacked, x).compile()
    hlo = compiled.as_text()
    assert 'all-reduce' in hlo, 'expected psum -> all-reduce in tp HLO'

    # per-device attention shard: qkv kernel splits to 1 head per device
    qkv = stacked['attn']['qkv_kernel']
    shard_shape = qkv.sharding.shard_shape(qkv.shape)
    assert shard_shape == (2, 64, 3, 16), shard_shape


@pytest.mark.slow
def test_sharded_fast_counterfactuals_match_single_device():
    """Sample-sharded shared-prefix engine == single-device fast engine."""
    from counterfactualworldmodels_tpu.models.fast_vmae import (
        stack_vmae_params)
    from counterfactualworldmodels_tpu.pipelines.segmentation import (
        counterfactual_videos_and_flows_fast)
    mesh = parallel.sample_parallel_mesh(8)
    model = _tiny_model()
    params = jvmae.init_params(model, jax.random.PRNGKey(0))
    fp = stack_vmae_params(model, params, dtype=jnp.float32)
    raft = RAFT(iters=1)
    raft_params = init_raft_params(raft, jax.random.PRNGKey(1), hw=32)

    rng = np.random.RandomState(2)
    b, s = 1, 8
    x = jnp.asarray(rng.rand(b, 2, 3, 32, 32).astype(np.float32))
    n = model.num_patches
    passive = np.ones((b, n, s), dtype=bool)
    passive[:, :n // 2] = False
    active = passive.copy()
    for i in range(s):
        active[0, n // 2 + rng.randint(n // 2), i] = False
    passive, active = jnp.asarray(passive), jnp.asarray(active)
    shifts = jnp.asarray(rng.randint(-1, 2, size=(b, s, 2)), jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(3), b * s).reshape(b, s, 2)
    n_vis = n // 2 + 1

    from counterfactualworldmodels_tpu.models.fast_vmae import sfx_bucket
    y_ref, f_ref, m_ref = counterfactual_videos_and_flows_fast(
        model, fp, raft, raft_params, x, passive, active, shifts, keys,
        sfx_bucket(n_vis - n // 2, n // 2), True, 1, True, False,
        n_vis=n_vis)
    y_sh, f_sh, m_sh = parallel.sharded_counterfactuals_fast(
        mesh, model, fp, raft, raft_params, x, passive, active, shifts,
        keys, n_vis, True, 1, False)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_sh), np.asarray(f_ref),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(m_sh), np.asarray(m_ref))


def test_sharded_fast_multi_scene_matches_single_device():
    """Sample-sharded multi-scene engine (stacked per-sample caches
    sharded over 'samples') == the single-device multi-scene dispatch."""
    from counterfactualworldmodels_tpu.models import fast_vmae as fv
    from counterfactualworldmodels_tpu.pipelines.segmentation import (
        counterfactual_videos_and_flows_fast_multi)
    mesh = parallel.sample_parallel_mesh(4)
    model = _tiny_model()
    params = jvmae.init_params(model, jax.random.PRNGKey(0))
    fp = fv.stack_vmae_params(model, params, dtype=jnp.float32)
    raft = RAFT(iters=1)
    raft_params = init_raft_params(raft, jax.random.PRNGKey(1), hw=32)

    rng = np.random.RandomState(3)
    s = 4
    n = model.num_patches
    x = jnp.asarray(rng.rand(s, 2, 3, 32, 32).astype(np.float32))
    passive = np.ones((s, n), dtype=bool)
    passive[:, :n // 2] = False
    active = passive.copy()
    for i in range(s):
        active[i, n // 2 + rng.randint(n // 2)] = False
    passive, active = jnp.asarray(passive), jnp.asarray(active)
    shifts = jnp.asarray(rng.randint(-1, 2, size=(s, 2)), jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(4), s)
    n_vis = n // 2 + 1
    cache = fv.stack_prefix_caches(
        [fv.make_prefix_cache(model, fp, False, True, x[i:i + 1, 0])
         for i in range(s)])

    y_ref, f_ref, m_ref = counterfactual_videos_and_flows_fast_multi(
        model, fp, raft, raft_params, x, passive, active, shifts,
        fv.sfx_bucket(n_vis - n // 2, n // 2),
        True, 1, True, False, False, keys, cache, n_vis=n_vis)
    y_sh, f_sh, m_sh = parallel.sharded_counterfactuals_fast_multi(
        mesh, model, fp, raft, raft_params, x, passive, active, shifts,
        keys, n_vis, True, 1, False, False, prefix_cache=cache)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_sh), np.asarray(f_ref),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(m_sh), np.asarray(m_ref))


@pytest.mark.slow
def test_sharded_imu_counterfactuals_fast_match_single_device():
    """Sample-sharded conjoined (IMU) shared-prefix engine == single-device
    engine (models/fast_conjoined.py): scene/context/prefix replicated,
    suffix + per-sample context sharded over 'samples'."""
    from counterfactualworldmodels_tpu.models.conjoined import (
        ConjoinedVMAE, ConjoinedPredictorWrapper, StreamSpec,
        init_conjoined_params)
    from counterfactualworldmodels_tpu.pipelines.imu import (
        _imu_counterfactual_step_fast)

    mesh = parallel.sample_parallel_mesh(8)
    ctx = StreamSpec(is_imu=True, in_chans=6, sequence_length=32,
                     imu_tubelet=8, encoder_embed_dim=32, encoder_depth=2,
                     encoder_num_heads=4, decoder_embed_dim=24,
                     decoder_depth=1, decoder_num_heads=4,
                     decoder_num_classes=48, mlp_ratio=2.0,
                     concat_dummy_token=False, padded=True,
                     max_padding_tokens=4)
    main = StreamSpec(img_size=(32, 32), patch_size=(8, 8), in_chans=3,
                      num_frames=2, encoder_embed_dim=48, encoder_depth=2,
                      encoder_num_heads=4, decoder_embed_dim=32,
                      decoder_depth=1, decoder_num_heads=4, mlp_ratio=2.0,
                      padded=True, max_padding_tokens=8)
    model = ConjoinedVMAE(main=main, context=ctx,
                          conjoin_encoder_layers=((0, 0), (1, 1)),
                          conjoin_decoder_layers=((0, 0),))
    params = init_conjoined_params(model, jax.random.PRNGKey(0))
    w = ConjoinedPredictorWrapper(model, params=params, main_input='rgb01',
                                  context_input='imu')
    raft = RAFT(iters=1)
    raft_params = init_raft_params(raft, jax.random.PRNGKey(1), hw=32)

    rng = np.random.RandomState(4)
    b, s = 1, 8
    x = jnp.asarray(rng.rand(b, 2, 3, 32, 32).astype(np.float32))
    imu = jnp.asarray((rng.randn(1, 6, 32) * 0.1).astype(np.float32))
    mask_c = jnp.zeros((1, 4), bool)
    n = model.main.num_patches
    passive = np.ones((b, n, s), dtype=bool)
    passive[:, :n // 2] = False
    active = passive.copy()
    for i in range(s):
        active[0, n // 2 + rng.randint(n // 2), i] = False
    passive, active = jnp.asarray(passive), jnp.asarray(active)
    shifts = jnp.asarray(rng.randint(-1, 2, size=(b, s, 2)), jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(5), b * s).reshape(b, s, 2)
    n_vis = n // 2 + 1

    y_ref, f_ref, m_ref = _imu_counterfactual_step_fast(
        w, params, raft, raft_params, x, passive, active, shifts, keys,
        imu, mask_c, n_vis, True, 1, False, False)
    y_sh, f_sh, m_sh = parallel.sharded_imu_counterfactuals_fast(
        mesh, w, params, raft, raft_params, x, passive, active, shifts,
        keys, imu, mask_c, n_vis, True, 1, False)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_sh), np.asarray(f_ref),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(m_sh), np.asarray(m_ref))

    # the EXACT conjoined path, sample-sharded (per-sample tiled context)
    from counterfactualworldmodels_tpu.pipelines.imu import (
        _imu_counterfactual_step)
    n_vis_c = w._static_n_vis(np.asarray(mask_c), model.context)
    imu_s = jnp.repeat(imu, s, 0)
    mask_c_s = jnp.repeat(mask_c, s, 0)
    ye, fe, me = _imu_counterfactual_step(
        w, params, raft, raft_params, x, passive, active, shifts, keys,
        imu_s, mask_c_s, n_vis, n_vis_c, True, 1, True)
    ye_sh, fe_sh, me_sh = parallel.sharded_imu_counterfactuals(
        mesh, w, params, raft, raft_params, x, passive, active, shifts,
        keys, imu_s, mask_c_s, n_vis, n_vis_c, True, 1)
    np.testing.assert_allclose(np.asarray(ye_sh), np.asarray(ye),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(fe_sh), np.asarray(fe),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(me_sh), np.asarray(me))


@pytest.mark.slow
def test_tp_sp_blocks_layerscale_and_qk_scale():
    """tp and sp block stacks match the sequential Block for models WITH
    layerscale gammas (init_values > 0) and a custom qk_scale — both were
    previously silently ignored on one or both paths."""
    from counterfactualworldmodels_tpu.parallel import (
        make_mesh, make_tp_encoder_forward)
    from counterfactualworldmodels_tpu.parallel.sequence import (
        make_sp_encoder_forward)
    from counterfactualworldmodels_tpu.models.layers import Block

    model = jvmae.PretrainVisionTransformer(
        img_size=(32, 32), patch_size=(8, 8), encoder_embed_dim=64,
        encoder_depth=2, encoder_num_heads=4, decoder_embed_dim=32,
        decoder_depth=1, decoder_num_heads=2, num_frames=2,
        init_values=0.1, qk_scale=0.17)
    params = jvmae.init_params(model, jax.random.PRNGKey(0))
    enc = params['encoder']
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 64))
    block = Block(dim=64, num_heads=4, mlp_ratio=model.mlp_ratio,
                  qkv_bias=True, qk_scale=0.17, init_values=0.1)
    ref = x
    for i in range(2):
        ref = block.apply({'params': enc[f'blocks_{i}']}, ref)
    ref = np.asarray(ref)

    fwd, shard = make_tp_encoder_forward(model, make_mesh({'tp': 4}))
    np.testing.assert_allclose(np.asarray(fwd(shard(enc), x)), ref,
                               atol=2e-5)
    fwd2, shard2 = make_sp_encoder_forward(model, make_mesh({'sp': 4}))
    np.testing.assert_allclose(np.asarray(fwd2(shard2(enc), x)), ref,
                               atol=2e-5)
