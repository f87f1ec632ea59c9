"""Conjoined (IMU-conditioned) shared-prefix engine: equivalence + fidelity.

The engine (models/fast_conjoined.py) factorizes the reference movability
workload (cwm/models/segmentation.py:931-963 over
conjoined_vmae.py:1230-1243) into a per-scene prefix pass and per-sample
suffix passes, with the tiny context stream recomputed exactly per sample.

Tests check it against (a) the flax cross-attention modules directly,
(b) an independent full-sequence implementation of the SAME isolation
semantics (bias-masked attention with two context streams), and
(c) the exact conjoined path, quantifying the frozen-prefix deviation.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from counterfactualworldmodels_tpu.models.conjoined import (
    ConjoinedVMAE, ConjoinedPredictorWrapper, ImuEncoder, StreamSpec,
    init_conjoined_params)
from counterfactualworldmodels_tpu.models import fast_conjoined as fc
from counterfactualworldmodels_tpu.models.transformer import (
    CrossAttentionTransformerBlock)
from counterfactualworldmodels_tpu.ops.normalization import imagenet_normalize
from counterfactualworldmodels_tpu.ops.pos_embed import sinusoid_encoding_table
from counterfactualworldmodels_tpu.ops import patches as patch_ops

IMG, GRID = 64, 8
N = 2 * GRID * GRID
N0 = N // 2
IMU_LEN, IMU_TOK = 48, 6


def _tiny(enc_cross=((0, 0), (-1, -1)), dec_cross=((0, 0), (1, 1)),
          dummy=False):
    ctx = StreamSpec(is_imu=True, in_chans=6, sequence_length=IMU_LEN,
                     imu_tubelet=8, encoder_embed_dim=32, encoder_depth=2,
                     encoder_num_heads=4, decoder_embed_dim=24,
                     decoder_depth=2, decoder_num_heads=4,
                     decoder_num_classes=48, mlp_ratio=2.0,
                     concat_dummy_token=dummy, padded=not dummy,
                     max_padding_tokens=0 if dummy else IMU_TOK)
    main = StreamSpec(img_size=(IMG, IMG), patch_size=(8, 8), in_chans=3,
                      num_frames=2, encoder_embed_dim=48, encoder_depth=2,
                      encoder_num_heads=4, decoder_embed_dim=32,
                      decoder_depth=2, decoder_num_heads=4, mlp_ratio=2.0,
                      padded=True, max_padding_tokens=8)
    model = ConjoinedVMAE(main=main, context=ctx,
                          conjoin_encoder_layers=enc_cross,
                          conjoin_decoder_layers=dec_cross)
    params = init_conjoined_params(model, jax.random.PRNGKey(0))
    w = ConjoinedPredictorWrapper(model, params=params, main_input='rgb01',
                                  main_input_kwargs={'unnormalize': False},
                                  context_input='imu')
    return model, params, w


def _workload(rng, s=3, k=4):
    coarse = rng.rand(1, 3, 8, 8).astype(np.float32)
    img = np.asarray(jax.image.resize(jnp.asarray(coarse),
                                      (1, 3, IMG, IMG), 'bilinear'))
    x = np.stack([img, np.roll(img, 3, axis=-1)], axis=1)
    x_mocos = np.repeat(x, s, axis=0)
    x_mocos[1:, 1] += 0.05 * rng.randn(s - 1, 3, IMG, IMG).astype(np.float32)
    imu = (rng.randn(1, 6, IMU_LEN) * 0.1).astype(np.float32)
    mask = np.ones((s, N), bool)
    mask[:, :N0] = False
    vis1 = np.stack([np.sort(rng.choice(N - N0, k, replace=False))
                     for _ in range(s)])
    for i in range(s):
        mask[i, N0 + vis1[i]] = False
    return (jnp.asarray(x_mocos), jnp.asarray(mask), jnp.asarray(imu),
            jnp.asarray(vis1), N0 + k)


def test_cross_full_matches_flax_block():
    rng = np.random.RandomState(0)
    blk = CrossAttentionTransformerBlock(
        in_dim=48, in_dim_src=32, num_heads=4, mlp_ratio=2.0,
        with_self_attention=False, shared_similarity=False)
    x = jnp.asarray(rng.randn(2, 10, 48).astype(np.float32))
    src = jnp.asarray(rng.randn(2, 7, 32).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(0), x, src)['params']
    y_ref, s_ref = blk.apply({'params': params}, x, src)
    y_my, s_my, _ = fc._cross_full(params, x, src, 4)
    np.testing.assert_allclose(np.asarray(y_my), np.asarray(y_ref),
                               atol=3e-6)
    np.testing.assert_allclose(np.asarray(s_my), np.asarray(s_ref),
                               atol=3e-6)


def test_cross_suffix_full_keyset_matches_flax_block():
    """_cross_suffix over [cached prefix ; suffix] keys == the flax block
    on the full sequence (context direction is exact by construction)."""
    rng = np.random.RandomState(1)
    blk = CrossAttentionTransformerBlock(
        in_dim=48, in_dim_src=32, num_heads=4, mlp_ratio=2.0,
        with_self_attention=False, shared_similarity=False)
    x = jnp.asarray(rng.randn(1, 10, 48).astype(np.float32))
    src = jnp.asarray(rng.randn(1, 7, 32).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(0), x, src)['params']
    y_ref, s_ref = blk.apply({'params': params}, x, src)

    _, _, ckv = fc._cross_full(params, x[:, :6], src, 4)
    y_sfx, s_my = fc._cross_suffix(params, x[:, 6:], src, ckv, 4)
    np.testing.assert_allclose(np.asarray(y_sfx), np.asarray(y_ref[:, 6:]),
                               atol=3e-6)
    np.testing.assert_allclose(np.asarray(s_my), np.asarray(s_ref),
                               atol=3e-6)


@pytest.mark.parametrize('dummy', [False, True])
def test_ctx_tokens_match_imu_encoder(dummy):
    rng = np.random.RandomState(2)
    model, params, _ = _tiny(dummy=dummy)
    imu = jnp.asarray(rng.randn(1, 6, IMU_LEN).astype(np.float32))
    tok_my = fc._ctx_tokens(model, params, imu)

    enc = ImuEncoder(sequence_length=IMU_LEN, tubelet_size=8, in_chans=6,
                     embed_dim=32, depth=2, num_heads=4, mlp_ratio=2.0,
                     concat_dummy_token=dummy)

    def ref_tok(mod, imu5, mask):
        imu5, mask = mod.append_dummy(imu5, mask)
        return mod.tokenize(imu5)

    tok_ref = enc.apply({'params': params['context_encoder']},
                        imu[..., None, None],
                        jnp.zeros((1, IMU_TOK), bool), method=ref_tok)
    np.testing.assert_allclose(np.asarray(tok_my), np.asarray(tok_ref),
                               atol=1e-6)


# ---------------------------------------------------------------------------
# Independent bias-masked full-sequence reference
# ---------------------------------------------------------------------------

def _lnf(x, p, eps=1e-6):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p['scale'] + p['bias']


def _dense(p, x):
    return jnp.dot(x, p['kernel']) + p['bias']


def _block_bias(p, h, heads, bias):
    b, n, dim = h.shape
    d = dim // heads
    ln = _lnf(h, p['norm1'])
    qkv = jnp.einsum('bnd,dta->bnta', ln, p['attn']['qkv_kernel'])
    if 'q_bias' in p['attn']:
        qkv = qkv + jnp.stack([p['attn']['q_bias'],
                               jnp.zeros_like(p['attn']['q_bias']),
                               p['attn']['v_bias']])
    qkv = qkv.reshape(b, n, 3, heads, d)
    q = jnp.swapaxes(qkv[:, :, 0], 1, 2) * d ** -0.5
    k = jnp.swapaxes(qkv[:, :, 1], 1, 2)
    v = jnp.swapaxes(qkv[:, :, 2], 1, 2)
    att = jax.nn.softmax(jnp.einsum('bhnd,bhmd->bhnm', q, k) + bias, -1)
    o = jnp.swapaxes(jnp.einsum('bhnm,bhmd->bhnd', att, v),
                     1, 2).reshape(b, n, heads * d)
    h = h + _dense(p['attn']['proj'], o)
    return h + _dense(p['mlp']['fc2'],
                      jax.nn.gelu(_dense(p['mlp']['fc1'],
                                         _lnf(h, p['norm2'])),
                                  approximate=False))


def _gmlp(p, x):
    return _dense(p['layers_2'],
                  jax.nn.gelu(_dense(p['layers_0'], x), approximate=False))


def _cross_bias2(pc, x, ctx_a, ctx_b, heads, n_pre, bias_a):
    """Cross block with two context streams: ctx_a frozen (reads only
    prefix main keys, feeds main prefix rows), ctx_b per-sample (reads all
    main keys, feeds main suffix rows) — the engine's semantics."""
    ca = pc['cross_attention']
    inner = ca['qk']['kernel'].shape[1] // 2
    d = inner // heads
    scale = d ** -0.5
    b, n, _ = x.shape
    m = ctx_a.shape[1]
    lx = _lnf(x, pc['norm1_cross'])
    la = _lnf(ctx_a, pc['norm1_src_cross'])
    lb = _lnf(ctx_b, pc['norm1_src_cross'])

    def ph(z, kern, w):
        o = jnp.dot(z, kern)
        return jnp.swapaxes(o.reshape(z.shape[0], z.shape[1], heads, w), 1, 2)

    qk_x = ph(lx, ca['qk']['kernel'], 2 * d)
    qk_a = ph(la, ca['qk_src']['kernel'], 2 * d)
    qk_b = ph(lb, ca['qk_src']['kernel'], 2 * d)
    v_x = ph(lx, ca['v']['kernel'], d)
    v_a = ph(la, ca['v_src']['kernel'], d)
    v_b = ph(lb, ca['v_src']['kernel'], d)

    att_a = jax.nn.softmax(jnp.einsum('bhnd,bhmd->bhnm',
                                      qk_x[..., :d] * scale,
                                      qk_a[..., :d]), -1)
    y_a = jnp.einsum('bhnm,bhmd->bhnd', att_a, v_a)
    att_b = jax.nn.softmax(jnp.einsum('bhnd,bhmd->bhnm',
                                      qk_x[..., :d] * scale,
                                      qk_b[..., :d]), -1)
    y_b = jnp.einsum('bhnm,bhmd->bhnd', att_b, v_b)
    y = jnp.concatenate([y_a[:, :, :n_pre], y_b[:, :, n_pre:]], axis=2)
    y = _dense(ca['projection'], jnp.swapaxes(y, 1, 2).reshape(b, n, inner))

    att_sa = jax.nn.softmax(
        jnp.einsum('bhnd,bhmd->bhmn', qk_x[..., d:] * scale, qk_a[..., d:])
        + bias_a[None, None, None, :], -1)
    y_sa = _dense(ca['projection_src'], jnp.swapaxes(
        jnp.einsum('bhmn,bhnd->bhmd', att_sa, v_x), 1, 2).reshape(b, m,
                                                                  inner))
    att_sb = jax.nn.softmax(
        jnp.einsum('bhnd,bhmd->bhmn', qk_x[..., d:] * scale,
                   qk_b[..., d:]), -1)
    y_sb = _dense(ca['projection_src'], jnp.swapaxes(
        jnp.einsum('bhmn,bhnd->bhmd', att_sb, v_x), 1, 2).reshape(b, m,
                                                                  inner))

    x = x + y
    x = x + _gmlp(pc['mlp_trg'], _lnf(x, pc['norm2']))
    ctx_a = ctx_a + y_sa
    ctx_a = ctx_a + _gmlp(pc['mlp_src'], _lnf(ctx_a, pc['norm2_src']))
    ctx_b = ctx_b + y_sb
    ctx_b = ctx_b + _gmlp(pc['mlp_src'], _lnf(ctx_b, pc['norm2_src']))
    return x, ctx_a, ctx_b


def _bias_ref(model, params, x_m, x_c, vis1_idx):
    """Full-sequence forward with the engine's isolation as bias masks."""
    m, c = model.main, model.context
    s = x_m.shape[0]
    n0 = m.num_patches // m.num_frames
    n1 = m.num_patches - n0
    k = vis1_idx.shape[1]
    enc = params['main_encoder']

    p0 = patch_ops.patchify(x_m[:, :, 0][:, :, None], (1,) + m.patch_size,
                            temporal_dim=2, squeeze_channel_dim=True)
    p1 = patch_ops.patchify(x_m[:, :, 1][:, :, None], (1,) + m.patch_size,
                            temporal_dim=2, squeeze_channel_dim=True)
    pos_e = sinusoid_encoding_table(m.num_patches, m.encoder_embed_dim)[0]
    t0 = _dense(enc['patch_embed']['proj'], p0) + pos_e[:n0]
    p1v = jnp.take_along_axis(p1, vis1_idx[..., None], axis=1)
    t1 = _dense(enc['patch_embed']['proj'], p1v) + jnp.take(
        pos_e, n0 + vis1_idx, axis=0)
    h = jnp.concatenate([t0, t1], axis=1)

    ctx = fc._ctx_tokens(model, params, x_c)
    ctx_a = jnp.broadcast_to(ctx, (s,) + ctx.shape[1:])
    ctx_b = ctx_a

    def bias_main(n_pre, n_suf):
        bias = jnp.zeros((n_pre + n_suf, n_pre + n_suf))
        return bias.at[:n_pre, n_pre:].set(-1e30)[None, None]

    bias_ctx_e = jnp.concatenate([jnp.zeros((n0,)), jnp.full((k,), -1e30)])
    enc_pairs = model._norm_pairs(model.conjoin_encoder_layers,
                                  m.encoder_depth, c.encoder_depth)
    dec_pairs = model._norm_pairs(model.conjoin_decoder_layers,
                                  m.decoder_depth, c.decoder_depth)
    ce = params['context_encoder']
    be = bias_main(n0, k)
    i = j = 0
    for idx, (pi, pj) in enumerate(enc_pairs):
        while i < pi:
            h = _block_bias(enc[f'blocks_{i}'], h, m.encoder_num_heads, be)
            i += 1
        while j < pj:
            ctx_a = _block_bias(ce[f'blocks_{j}'], ctx_a,
                                c.encoder_num_heads, 0.0)
            ctx_b = _block_bias(ce[f'blocks_{j}'], ctx_b,
                                c.encoder_num_heads, 0.0)
            j += 1
        h, ctx_a, ctx_b = _cross_bias2(
            params[f'encoder_cross_blocks_{idx}'], h, ctx_a, ctx_b,
            model.cross_num_heads, n0, bias_ctx_e)
    for kk in range(i, m.encoder_depth):
        h = _block_bias(enc[f'blocks_{kk}'], h, m.encoder_num_heads, be)
    for kk in range(j, c.encoder_depth):
        ctx_a = _block_bias(ce[f'blocks_{kk}'], ctx_a, c.encoder_num_heads,
                            0.0)
        ctx_b = _block_bias(ce[f'blocks_{kk}'], ctx_b, c.encoder_num_heads,
                            0.0)
    h = _lnf(h, enc['norm'])
    ctx_a = _lnf(ctx_a, ce['norm'])
    ctx_b = _lnf(ctx_b, ce['norm'])

    z = jnp.dot(h, params['main_e2d']['kernel'])
    pos_d = sinusoid_encoding_table(m.num_patches, m.decoder_embed_dim)[0]
    z0 = z[:, :n0] + pos_d[:n0]
    mt = params['main_mask_token']
    base = jnp.broadcast_to(mt + pos_d[n0:], (s, n1, pos_d.shape[-1]))
    vals = z[:, n0:] + jnp.take(pos_d, n0 + vis1_idx, axis=0)
    z1 = jax.vmap(lambda b_, ii, v: b_.at[ii].set(v))(base, vis1_idx, vals)
    if m.padded and m.max_padding_tokens:
        nulls = mt + params['main_null_dec']
        z1 = jnp.concatenate(
            [z1, jnp.broadcast_to(nulls, (s, m.max_padding_tokens,
                                          z1.shape[-1]))], axis=1)
    zfull = jnp.concatenate([z0, z1], axis=1)
    n_suf_d = z1.shape[1]

    def mk_zc(ctx_):
        zc_ = jnp.dot(ctx_, params['context_e2d']['kernel'])
        zc_ = zc_ + sinusoid_encoding_table(c.total_tokens,
                                            c.decoder_embed_dim)[0]
        if c.padded and c.max_padding_tokens:
            nulls_c = (params['context_mask_token']
                       + params['context_null_dec'])
            zc_ = jnp.concatenate(
                [zc_, jnp.broadcast_to(nulls_c, (s, c.max_padding_tokens,
                                                 zc_.shape[-1]))], axis=1)
        return zc_

    zc_a, zc_b = mk_zc(ctx_a), mk_zc(ctx_b)
    bias_ctx_d = jnp.concatenate([jnp.zeros((n0,)),
                                  jnp.full((n_suf_d,), -1e30)])
    bd = bias_main(n0, n_suf_d)
    dec = params['main_decoder']
    cd = params['context_decoder']
    i = j = 0
    for idx, (pi, pj) in enumerate(dec_pairs):
        while i <= pi:
            zfull = _block_bias(dec[f'blocks_{i}'], zfull,
                                m.decoder_num_heads, bd)
            i += 1
        while j <= pj:
            zc_a = _block_bias(cd[f'blocks_{j}'], zc_a, c.decoder_num_heads,
                               0.0)
            zc_b = _block_bias(cd[f'blocks_{j}'], zc_b, c.decoder_num_heads,
                               0.0)
            j += 1
        zfull, zc_a, zc_b = _cross_bias2(
            params[f'decoder_cross_blocks_{idx}'], zfull, zc_a, zc_b,
            model.cross_num_heads, n0, bias_ctx_d)
    for kk in range(i, m.decoder_depth):
        zfull = _block_bias(dec[f'blocks_{kk}'], zfull, m.decoder_num_heads,
                            bd)
    y = _lnf(zfull[:, n0:n0 + n1], dec['norm'])
    return _dense(dec['head'], y)


@pytest.mark.parametrize('enc_cross,dec_cross', [
    (((0, 0), (-1, -1)), ((0, 0), (1, 1))),
    (((1, 0),), ((0, 1),)),   # asymmetric interleave points
    ((), ()),                 # no coupling: pure fast_vmae semantics
])
def test_engine_matches_bias_masked_reference(enc_cross, dec_cross):
    """The engine's KV-cache algebra == an independent full-sequence
    implementation of the same isolation semantics, to float tolerance."""
    rng = np.random.RandomState(3)
    model, params, _ = _tiny(enc_cross, dec_cross)
    x_mocos, mask, imu, vis1, n_vis = _workload(rng)
    xm = imagenet_normalize(x_mocos, temporal_dim=1)
    x_m = jnp.swapaxes(xm, 1, 2)

    y_ref = _bias_ref(model, params, x_m, imu, vis1)
    cache = fc.encode_conjoined_prefix(model, params, x_m[0:1, :, 0], imu,
                                       False)
    y_eng = fc.predict_frame1_conjoined(model, params, cache, x_m[:, :, 1],
                                        vis1, False, False)
    np.testing.assert_allclose(np.asarray(y_eng), np.asarray(y_ref),
                               atol=2e-4)


def test_fidelity_vs_exact_conjoined():
    """Frozen-prefix deviation vs the exact conjoined forward is small
    (the plain engine's corr-1.0 pattern, test_fast_vmae.py:181)."""
    from counterfactualworldmodels_tpu.pipelines.imu import (
        _conjoined_predict_video)
    rng = np.random.RandomState(4)
    model, params, w = _tiny()
    x_mocos, mask, imu, vis1, n_vis = _workload(rng)
    mask_c = jnp.zeros((1, IMU_TOK), bool)

    y_fast = fc.predict_videos_conjoined_prefix(
        w, params, x_mocos, mask, imu, mask_c, n_vis, True, False)

    s = x_mocos.shape[0]
    n_vis_c = w._static_n_vis(np.zeros((1, IMU_TOK), bool), model.context)
    y_exact = _conjoined_predict_video(
        w, params, x_mocos, mask, jnp.repeat(imu, s, 0),
        jnp.repeat(mask_c, s, 0), n_vis, n_vis_c, True)

    a = np.asarray(y_fast[:, 1]).ravel()
    b = np.asarray(y_exact[:, 1]).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.995, corr
    # visible patches pass through the input unchanged in both
    np.testing.assert_allclose(np.asarray(y_fast[:, 0]),
                               np.asarray(y_exact[:, 0]), atol=1e-6)


def test_conjoined_sfx_bucketing_matches_exact_width(monkeypatch):
    """Suffix-width bucketing in the conjoined engine (pad + sentinel
    masking in main self-attention AND the context<-main cross direction,
    scatter drop) is numerics-neutral: padded program == exact-width."""
    rng = np.random.RandomState(6)
    model, params, w = _tiny()
    x_mocos, mask, imu, vis1, n_vis = _workload(rng, k=5)  # bucket 8 > 5
    mask_c = jnp.zeros((1, IMU_TOK), bool)
    y_b = fc.predict_videos_conjoined_prefix(
        w, params, x_mocos, mask, imu, mask_c, n_vis, True, False)
    monkeypatch.setenv('CWM_SFX_BUCKET', '0')
    y_e = fc.predict_videos_conjoined_prefix(
        w, params, x_mocos, mask, imu, mask_c, n_vis, True, False)
    np.testing.assert_allclose(np.asarray(y_b), np.asarray(y_e), atol=1e-5)


def test_conjoined_sfx_bucketing_ragged_rows(monkeypatch):
    """Rows with DIFFERENT visible counts share one padded conjoined
    program; each row equals its own exact-width single-sample run —
    in particular the per-sample context stream (which attends the
    suffix keys) must not read any pad key."""
    rng = np.random.RandomState(7)
    model, params, w = _tiny()
    counts = [2, 3, 5]
    s = len(counts)
    x_mocos, mask, imu, _, _ = _workload(rng, s=s, k=5)
    mask = np.array(mask)   # writable copy
    mask[:, N0:] = True
    for i, c in enumerate(counts):
        mask[i, N0 + rng.choice(N - N0, c, replace=False)] = False
    mask = jnp.asarray(mask)
    mask_c = jnp.zeros((1, IMU_TOK), bool)

    y = np.asarray(fc.predict_videos_conjoined_prefix(
        w, params, x_mocos, mask, imu, mask_c, N0 + max(counts), True,
        False))
    monkeypatch.setenv('CWM_SFX_BUCKET', '0')
    for i, c in enumerate(counts):
        y_i = np.asarray(fc.predict_videos_conjoined_prefix(
            w, params, x_mocos[i:i + 1], mask[i:i + 1], imu, mask_c,
            N0 + c, True, False))
        np.testing.assert_allclose(y[i], y_i[0], atol=1e-5)


def test_conjoined_zero_suffix_factual():
    """A factual prompt with frame 1 fully masked (n_vis == n0, the
    reference's default predict workload) runs the suffix-free program
    without crashing — the r04 zero-suffix bug class, conjoined side."""
    rng = np.random.RandomState(8)
    model, params, w = _tiny()
    x_mocos, _, imu, _, _ = _workload(rng, s=2)
    mask = np.ones((2, N), bool)
    mask[:, :N0] = False
    mask_c = jnp.zeros((1, IMU_TOK), bool)
    y = fc.predict_videos_conjoined_prefix(
        w, params, x_mocos, jnp.asarray(mask), imu, mask_c, N0, True,
        False)
    y = np.asarray(y)
    assert np.isfinite(y).all()
    np.testing.assert_allclose(y[:, 0], np.asarray(x_mocos[:, 0]),
                               atol=1e-6)


def test_prefix_cache_injection_and_lru():
    rng = np.random.RandomState(5)
    model, params, w = _tiny()
    x_mocos, mask, imu, vis1, n_vis = _workload(rng)
    mask_c = jnp.zeros((1, IMU_TOK), bool)

    y_implicit = fc.predict_videos_conjoined_prefix(
        w, params, x_mocos, mask, imu, mask_c, n_vis, True, False)

    x_scene = x_mocos[0:1]  # [1, 2, C, H, W]
    lru = fc.ConjoinedPrefixLru(w, params, False, True, size=2)
    cache, hit = lru.get(x_scene, imu)
    assert not hit and lru.misses == 1
    y_injected = fc.predict_videos_conjoined_prefix(
        w, params, x_mocos, mask, imu, mask_c, n_vis, True, False,
        cache=cache)
    np.testing.assert_allclose(np.asarray(y_injected),
                               np.asarray(y_implicit), atol=1e-5)
    _, hit = lru.get(x_scene, imu)
    assert hit and lru.hits == 1
    # different IMU on the same frame -> different cache entry
    _, hit = lru.get(x_scene, imu + 1.0)
    assert not hit and lru.misses == 2


@pytest.mark.parametrize('use_flash,two_source', [(False, False),
                                                  (True, True)])
def test_multi_scene_stacked_conjoined_caches(use_flash, two_source):
    """stack_conjoined_prefix_caches: S=1 suffixes of DIFFERENT
    (scene, IMU) pairs batched into one dispatch == the per-scene serial
    calls (exercises _cross_suffix's per-sample prefix route and the
    s0=S two-source kernel path when two_source)."""
    model, params, w = _tiny()
    scenes, serial = [], []
    for seed in (11, 12, 13):
        rng = np.random.RandomState(seed)
        x_mocos, mask, imu, vis1, n_vis = _workload(rng, s=1)
        mask_c = jnp.zeros((1, IMU_TOK), bool)
        cache = fc.make_conjoined_prefix_cache(w, params, x_mocos[0:1],
                                               imu, True, use_flash)
        y = fc.predict_videos_conjoined_prefix(
            w, params, x_mocos, mask, imu, mask_c, n_vis, True, use_flash,
            cache=cache, two_source=two_source)
        serial.append(y)
        scenes.append((x_mocos, mask, imu, mask_c, cache))

    stacked = fc.stack_conjoined_prefix_caches([s[-1] for s in scenes])
    y_b = fc.predict_videos_conjoined_prefix(
        w, params,
        jnp.concatenate([s[0] for s in scenes]),
        jnp.concatenate([s[1] for s in scenes]),
        jnp.concatenate([s[2] for s in scenes]),
        jnp.concatenate([s[3] for s in scenes]),
        n_vis, True, use_flash, cache=stacked, two_source=two_source)
    np.testing.assert_allclose(np.asarray(y_b),
                               np.asarray(jnp.concatenate(serial)),
                               atol=2e-5)


def test_cast_params_dtypes():
    """cast_params maps every leaf to the requested dtype (the engine
    reads its compute dtype off the leaves)."""
    model, params, _ = _tiny()
    p16 = fc.cast_params(params, jnp.bfloat16)
    assert all(leaf.dtype == jnp.bfloat16
               for leaf in jax.tree_util.tree_leaves(p16))


@pytest.mark.skipif(jax.default_backend() != 'tpu',
                    reason='this CPU XLA lacks bf16xbf16->f32 dots; the '
                           'bf16 engine path is TPU-only')
def test_bf16_cast_params_path():
    """cast_params(bf16) drives the whole engine in bf16 (the TPU compute
    dtype) and stays close to the f32 result."""
    rng = np.random.RandomState(9)
    model, params, w = _tiny()
    x_mocos, mask, imu, vis1, n_vis = _workload(rng)
    mask_c = jnp.zeros((1, IMU_TOK), bool)

    y32 = fc.predict_videos_conjoined_prefix(
        w, params, x_mocos, mask, imu, mask_c, n_vis, True, False)
    p16 = fc.cast_params(params, jnp.bfloat16)
    assert jax.tree_util.tree_leaves(p16)[0].dtype == jnp.bfloat16
    y16 = fc.predict_videos_conjoined_prefix(
        w, p16, x_mocos, mask, imu, mask_c, n_vis, True, False)
    assert y16.dtype == y32.dtype  # reconstruction rides the input dtype
    corr = np.corrcoef(np.asarray(y16, np.float32).ravel(),
                       np.asarray(y32, np.float32).ravel())[0, 1]
    assert corr > 0.99, corr


def _generator(model, params, w, engine):
    from counterfactualworldmodels_tpu.models.raft.raft import (
        RAFT, init_raft_params)
    from counterfactualworldmodels_tpu.pipelines.imu import (
        ImuConditionedFlowGenerator)
    raft = RAFT(iters=2)
    rp = init_raft_params(raft, jax.random.PRNGKey(7), hw=IMG)
    return ImuConditionedFlowGenerator(
        predictor=w, head_motion_predictor=w, flow_model=raft,
        flow_params=rp, raft_iters=2, imagenet_normalize_inputs=True,
        seed=0, engine=engine)


@pytest.mark.slow
def test_generator_fast_engine_vs_exact():
    """ImuConditionedFlowGenerator(engine='fast') routes the central API
    through the conjoined shared-prefix engine + ConjoinedPrefixLru, and
    matches the exact engine closely; prompts masking frame 0 fall back."""
    rng = np.random.RandomState(6)
    model, params, w = _tiny()
    x = np.asarray(_workload(rng)[0][0:1])  # [1, 2, C, H, W]
    head = (rng.randn(1, IMU_TOK, 8 * 6) * 0.1).astype(np.float32)

    active = np.ones((1, N), bool)
    active[0, :N0] = False
    active[0, N0 + 3 * GRID + 3] = False
    shifts = [(1, 0), (0, 1)]

    outs = {}
    for engine in ('exact', 'fast'):
        g = _generator(model, params, w, engine)
        y, f = g.predict_counterfactual_videos_and_flows(
            jnp.asarray(x), active_patches=jnp.asarray(active),
            shifts=shifts, num_samples=2, sample_batch_size=2,
            head_motion=jnp.asarray(head))
        outs[engine] = (np.asarray(y), np.asarray(f))
        if engine == 'fast':
            assert g._conj_prefix_lru is not None
            assert g._conj_prefix_lru.misses == 1
            # second call on the same scene+context hits the LRU
            g.predict_counterfactual_videos_and_flows(
                jnp.asarray(x), active_patches=jnp.asarray(active),
                shifts=shifts, num_samples=2, sample_batch_size=2,
                head_motion=jnp.asarray(head))
            assert g._conj_prefix_lru.hits >= 1
    ye, fe = outs['exact']
    yf, ff = outs['fast']
    assert yf.shape == ye.shape and ff.shape == fe.shape
    corr = np.corrcoef(yf.ravel(), ye.ravel())[0, 1]
    assert corr > 0.995, corr

    # frame-0-masking prompt: the fast generator must fall back to exact
    g = _generator(model, params, w, 'fast')
    act0 = active.copy()
    act0[0, 5] = True  # mask a frame-0 patch in the active prompt set
    pas0 = np.ones((1, N), bool)
    pas0[0, :N0] = False
    pas0[0, 5] = True
    y_fb, _ = g.predict_counterfactual_videos_and_flows(
        jnp.asarray(x), active_patches=jnp.asarray(act0),
        passive_patches=jnp.asarray(pas0), shifts=shifts, num_samples=2,
        sample_batch_size=2, head_motion=jnp.asarray(head))
    assert g._conj_prefix_lru is None  # fast path never engaged
    assert np.isfinite(y_fb).all()


@pytest.mark.slow
def test_generator_fast_engine_failure_degrades(monkeypatch):
    """A conjoined fast-engine failure (e.g. a kernel that fails to
    compile) warns once, permanently degrades the generator to the exact
    path, and yields the exact path's output bit-for-bit (keys/shifts are
    drawn before the engine routing)."""
    import warnings
    rng = np.random.RandomState(6)
    model, params, w = _tiny()
    x = np.asarray(_workload(rng)[0][0:1])
    head = (rng.randn(1, IMU_TOK, 8 * 6) * 0.1).astype(np.float32)
    active = np.ones((1, N), bool)
    active[0, :N0] = False
    active[0, N0 + 3 * GRID + 3] = False
    kw = dict(active_patches=jnp.asarray(active), shifts=[(1, 0), (0, 1)],
              num_samples=2, sample_batch_size=2,
              head_motion=jnp.asarray(head))

    exact = _generator(model, params, w, 'exact')
    y_e, f_e = exact.predict_counterfactual_videos_and_flows(
        jnp.asarray(x), **kw)

    def boom(*a, **k):
        raise RuntimeError('simulated mosaic compile failure')
    monkeypatch.setattr(fc, 'ConjoinedPrefixLru', boom)
    broken = _generator(model, params, w, 'fast')
    with pytest.warns(RuntimeWarning, match='falling back to the exact'):
        y_b, f_b = broken.predict_counterfactual_videos_and_flows(
            jnp.asarray(x), **kw)
    assert broken._fast_disabled
    np.testing.assert_allclose(np.asarray(y_b), np.asarray(y_e), atol=1e-6)
    np.testing.assert_allclose(np.asarray(f_b), np.asarray(f_e), atol=1e-5)

    # subsequent calls skip the fast route silently
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        broken.predict_counterfactual_videos_and_flows(jnp.asarray(x), **kw)


@pytest.mark.slow
def test_imu_predict_fast_route():
    """ImuConditionedFlowGenerator.predict with engine='fast' routes the
    single factual prediction through the conjoined engine (per-click
    path) and matches the exact route closely; frame-0-masked masks fall
    back bit-equal."""
    rng = np.random.RandomState(12)
    model, params, w = _tiny()
    ge = _generator(model, params, w, 'exact')
    gf = _generator(model, params, w, 'fast')
    x = np.asarray(_workload(rng)[0][0:1])
    head = (rng.randn(1, IMU_TOK, 8 * 6) * 0.1).astype(np.float32)
    mask = np.ones((1, N), bool)
    mask[0, :N0] = False
    mask[0, N0 + 7] = False

    kw = dict(x_context=jnp.asarray(ge.reshape_output(jnp.asarray(head))),
              frame=None)
    y_e = ge.predict(jnp.asarray(x), jnp.asarray(mask), **kw)
    y_f = gf.predict(jnp.asarray(x), jnp.asarray(mask), **kw)
    assert gf._conj_prefix_lru is not None
    assert gf._conj_prefix_lru.misses == 1
    corr = np.corrcoef(np.asarray(y_f).ravel(), np.asarray(y_e).ravel())[0, 1]
    assert corr > 0.995, corr
    gf.predict(jnp.asarray(x), jnp.asarray(mask), **kw)
    assert gf._conj_prefix_lru.hits >= 1

    mask0 = mask.copy()
    mask0[0, 3] = True  # frame-0 patch masked -> exact fallback
    y_fb = gf.predict(jnp.asarray(x), jnp.asarray(mask0), **kw)
    y_eb = ge.predict(jnp.asarray(x), jnp.asarray(mask0), **kw)
    np.testing.assert_allclose(np.asarray(y_fb), np.asarray(y_eb), atol=0)


def test_imu_predict_zero_visible_frame1_keeps_fast_engine():
    """Conjoined-engine cousin of the r04 plain-VMAE regression: a factual
    predict whose frame 1 is FULLY masked must run on the conjoined fast
    engine (not crash, not permanently degrade) and stay close to the
    exact route."""
    rng = np.random.RandomState(14)
    model, params, w = _tiny()
    ge = _generator(model, params, w, 'exact')
    gf = _generator(model, params, w, 'fast')
    x = np.asarray(_workload(rng)[0][0:1])
    head = (rng.randn(1, IMU_TOK, 8 * 6) * 0.1).astype(np.float32)
    mask = np.ones((1, N), bool)
    mask[0, :N0] = False                     # frame 1 fully masked

    kw = dict(x_context=jnp.asarray(ge.reshape_output(jnp.asarray(head))),
              frame=None)
    y_e = ge.predict(jnp.asarray(x), jnp.asarray(mask), **kw)
    y_f = gf.predict(jnp.asarray(x), jnp.asarray(mask), **kw)
    assert not gf._fast_disabled
    assert gf._conj_prefix_lru is not None
    assert gf._conj_prefix_lru.misses == 1
    corr = np.corrcoef(np.asarray(y_f).ravel(), np.asarray(y_e).ravel())[0, 1]
    assert corr > 0.99, corr


@pytest.mark.slow
def test_interface_on_imu_generator_fast_engine():
    """The interactive interface drives the IMU-conditioned generator with
    engine='fast' (the flagship interactive workload: repeat events on one
    image hit the ConjoinedPrefixLru)."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    from counterfactualworldmodels_tpu.interface import (
        CounterfactualPredictionInterface)

    rng = np.random.RandomState(11)
    model, params, w = _tiny()
    _, _, w_hm = _tiny(dummy=True)  # flow2imu-shaped head-motion model
    from counterfactualworldmodels_tpu.pipelines.imu import (
        ImuConditionedFlowGenerator)
    from counterfactualworldmodels_tpu.models.raft.raft import (
        RAFT, init_raft_params)
    raft = RAFT(iters=1)
    rp = init_raft_params(raft, jax.random.PRNGKey(7), hw=IMG)
    g = ImuConditionedFlowGenerator(
        predictor=w, head_motion_predictor=w_hm, flow_model=raft,
        flow_params=rp, raft_iters=1, imagenet_normalize_inputs=True,
        seed=0, engine='fast')

    x = np.asarray(_workload(rng)[0][0, 0])[None]  # [1, C, H, W]
    fig, axes = plt.subplots(2, 2)
    ui = CounterfactualPredictionInterface(
        axes, g, x=x, size=(IMG, IMG), max_shift=2, sample_batch_size=2,
        show_ticks=False)

    class Event:
        def __init__(self, ex, ey, key=None, button=1):
            self.xdata, self.ydata = ex, ey
            self.key = key
            self.button = button
            self.dblclick = False

    ui(Event(20, 20))          # select an active patch
    ui(Event(20, 20, key='f'))  # one counterfactual
    assert len(ui.flow_samples_list) == 1
    ui(Event(20, 20, key='b'))  # batch -> routes through the fast engine
    assert len(ui.flow_samples_list) == 3
    assert g._conj_prefix_lru is not None
    assert g._conj_prefix_lru.misses == 1
    ui(Event(20, 20, key='b'))  # repeat batch reuses the cached prefix
    assert g._conj_prefix_lru.hits >= 1
    plt.close(fig)


@pytest.mark.slow
def test_imu_movability_fast_engine():
    """The IMU-conditioned movability predictor (the reference flagship
    demo composition) engages the conjoined fast engine via engine='fast'
    through the MovabilityPredictor -> ImuConditionedFlowGenerator MRO."""
    from counterfactualworldmodels_tpu.models.raft.raft import (
        RAFT, init_raft_params)
    from counterfactualworldmodels_tpu.pipelines.movability import (
        make_imu_conditioned_movability_predictor)
    rng = np.random.RandomState(8)
    model, params, w = _tiny()
    raft = RAFT(iters=2)
    rp = init_raft_params(raft, jax.random.PRNGKey(9), hw=IMG)
    # head-motion model mirrors the reference flow2imu shape: non-padded
    # context with a dummy token, so its raw context output is one row per
    # real IMU token (a padded context would emit padding rows here)
    _, _, w_hm = _tiny(dummy=True)
    cls = make_imu_conditioned_movability_predictor()
    m = cls(predictor=w, head_motion_predictor=w_hm, flow_model=raft,
            flow_params=rp, raft_iters=2, imagenet_normalize_inputs=True,
            seed=0, engine='fast', initialize_from_keypoints=False,
            num_initial_samples=2, num_samples_per_iteration=2, num_iters=1,
            sample_batch_size=2)
    x = np.asarray(_workload(rng)[0][0:1])
    out = m(jnp.asarray(x), static_head_motion=True)
    assert out.shape == (1, 1, IMG, IMG)
    assert np.isfinite(np.asarray(out)).all()
    assert m._conj_prefix_lru is not None and m._conj_prefix_lru.misses >= 1


@pytest.mark.slow
def test_fidelity_vs_exact_conjoined_trained_weights():
    """Frozen-prefix fidelity holds for TRAINED conjoined weights, not just
    random init (the r02 advisor's caveat; vmae analog in
    test_fast_vmae.py). Train the conjoined predictor until the loss
    halves, then re-measure the fast-vs-exact deviation."""
    from counterfactualworldmodels_tpu.pipelines.imu import (
        _conjoined_predict_video)
    from counterfactualworldmodels_tpu.training import train as T
    rng = np.random.RandomState(11)
    model, params, w = _tiny()
    opt = T.make_optimizer(learning_rate=2e-3, warmup_steps=5,
                           total_steps=200)
    state = T.TrainState(jnp.zeros((), jnp.int32), params,
                         opt.init(params))
    n_vis_t = N0 + 8
    n_vis_c = model.context.num_patches
    tmask = np.ones((2, N), bool)
    tmask[:, :n_vis_t] = False
    tmask = jnp.asarray(tmask)
    mc_t = jnp.zeros((2, n_vis_c), bool)
    step = jax.jit(T.make_conjoined_train_step(model, opt, n_vis_t,
                                               n_vis_c, remat=False))
    base = rng.rand(2, 3, 1, IMG, IMG).astype(np.float32)
    losses = []
    for i in range(100):
        shift = rng.randint(-6, 7, 2)
        f1 = np.roll(base, tuple(shift), axis=(-2, -1))
        x = jnp.asarray(np.concatenate([base, f1], 2))  # [B, C, T, H, W]
        imu_t = jnp.asarray(rng.randn(2, 6, IMU_LEN, 1, 1), jnp.float32)
        state, m = step(state, x, tmask, imu_t, mc_t)
        losses.append(float(m['loss']))
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])

    trained = jax.device_get(state.params)
    w.params = trained
    x_mocos, mask, imu, vis1, n_vis = _workload(rng)
    mask_c = jnp.zeros((1, IMU_TOK), bool)
    y_fast = fc.predict_videos_conjoined_prefix(
        w, trained, x_mocos, mask, imu, mask_c, n_vis, True, False)
    s = x_mocos.shape[0]
    nvc = w._static_n_vis(np.zeros((1, IMU_TOK), bool), model.context)
    y_exact = _conjoined_predict_video(
        w, trained, x_mocos, mask, jnp.repeat(imu, s, 0),
        jnp.repeat(mask_c, s, 0), n_vis, nvc, True)
    a = np.asarray(y_fast[:, 1]).ravel()
    b = np.asarray(y_exact[:, 1]).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    rel = np.abs(a - b).mean() / np.abs(b).mean()
    print(f'trained conjoined fidelity: loss {losses[0]:.3f}->'
          f'{losses[-1]:.3f} rel-dev {rel:.4f} corr {corr:.4f}')
    assert corr > 0.99, (corr, rel)
