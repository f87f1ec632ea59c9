"""Conjoined (two-stream) VMAE: RGB + context (flow / IMU) with
cross-attention coupling.

Re-design of reference cwm/models/VideoMAE/conjoined_vmae.py:212-1243:

* Streams are ordinary VMAE encoders/decoders; cross-attention blocks are
  interleaved at chosen layer pairs (cross BEFORE self-attn in the encoder,
  AFTER in the decoder — reference conjoined_vmae.py:509-527, 644-662).
* The reference's PaddedVisionTransformer null-token machinery
  (conjoined_vmae.py:24-210) becomes a static-shape padding scheme: each
  stream is padded with learnable null tokens to a static visible count
  n_vis; padded outputs are zeroed (matching x * ~null_mask at
  conjoined_vmae.py:207-208).
* IMU is encoded as a (1 x 1 x L) pseudo-video with tubelet patching and an
  optional learnable dummy token (reference ImuEncoder,
  conjoined_vmae.py:1013-1147).

The flax module consumes already-preprocessed stream inputs; the
ConjoinedPredictorWrapper below runs the stream preprocessors
(models/preprocessor.py) and computes static visible counts, mirroring the
reference forward() (conjoined_vmae.py:852-887).
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.pos_embed import sinusoid_encoding_table
from .layers import Block
from .transformer import CrossAttentionTransformerBlock
from .vmae import VMAEDecoder, VMAEEncoder, mask_order, take_tokens

Dtype = jnp.dtype


class ImuEncoder(nn.Module):
    """IMU stream encoder: [B, C=6, L, 1, 1] pseudo-video, tubelet patches
    (reference conjoined_vmae.py:1013-1147)."""
    sequence_length: int = 400
    tubelet_size: int = 16
    in_chans: int = 6
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    concat_dummy_token: bool = True
    dtype: Dtype = jnp.float32
    attn_impl: str = 'dense'

    @property
    def num_tokens(self):
        return self.sequence_length // self.tubelet_size

    @property
    def num_patches(self):
        return self.num_tokens

    @property
    def total_tokens(self):
        return self.num_tokens + int(self.concat_dummy_token)

    def setup(self):
        d = self.in_chans * self.tubelet_size
        self.proj = nn.Dense(self.embed_dim, dtype=self.dtype)
        if self.concat_dummy_token:
            self.dummy_token = self.param(
                'dummy_token', nn.initializers.normal(0.02),
                (1, self.in_chans, self.tubelet_size, 1, 1), jnp.float32)
        self.blocks = [
            Block(self.embed_dim, self.num_heads, self.mlp_ratio,
                  self.qkv_bias, dtype=self.dtype, attn_impl=self.attn_impl)
            for _ in range(self.depth)]
        self.norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)

    def append_dummy(self, imu, mask):
        """Concat the learnable dummy token (always visible) to inputs.

        imu: [B, C, L, 1, 1] or None (missing IMU -> zeros, fully masked
        except the dummy; reference conjoined_vmae.py:1110-1125).
        """
        b = mask.shape[0]
        if imu is None:
            imu = jnp.zeros((b, self.in_chans, self.sequence_length, 1, 1),
                            jnp.float32)
            mask = jnp.ones((b, self.num_tokens), dtype=bool)
        if self.concat_dummy_token:
            dummy = jnp.broadcast_to(
                self.dummy_token.astype(imu.dtype),
                (b, self.in_chans, self.tubelet_size, 1, 1))
            imu = jnp.concatenate([imu, dummy], axis=2)
            mask = jnp.concatenate(
                [mask, jnp.zeros((b, 1), dtype=bool)], axis=-1)
        return imu, mask

    def tokenize(self, imu):
        """[B, C, L(+pt), 1, 1] -> [B, L/pt(+1), E] with sincos positions."""
        b, c, l = imu.shape[:3]
        t = l // self.tubelet_size
        patches = imu.reshape(b, c, t, self.tubelet_size)
        patches = jnp.moveaxis(patches, 1, -1).reshape(b, t, -1)
        # intra-patch layout (pt, c) flattened, matching the Conv3d kernel
        tokens = self.proj(patches)
        pos = sinusoid_encoding_table(t, self.embed_dim).astype(tokens.dtype)
        return tokens + pos

    def __call__(self, imu, mask, n_vis: int):
        tokens = self.tokenize(imu)
        order = mask_order(mask)
        x_vis = take_tokens(tokens, order[:, :n_vis])
        for blk in self.blocks:
            x_vis = blk(x_vis)
        return self.norm(x_vis)


def pad_tokens_and_mask(tokens, mask, null_token, n_vis: int,
                        max_padding: int):
    """Static-shape equivalent of the reference null-token padding
    (conjoined_vmae.py:49-134).

    Appends ``max_padding`` null tokens; per row, the first
    (n_vis - row_visible) of them are marked visible so every row has
    exactly ``n_vis`` visible entries. Returns (tokens_padded, full_mask).
    """
    b, n, c = tokens.shape
    nulls = jnp.broadcast_to(null_token.astype(tokens.dtype),
                             (b, max_padding, c))
    tokens_p = jnp.concatenate([tokens, nulls], axis=1)
    vis_counts = (~mask).sum(-1, keepdims=True)
    pad_needed = n_vis - vis_counts  # >= 0 given a correct static n_vis
    k = jnp.arange(max_padding)[None]
    padding_mask = k >= pad_needed   # True = masked
    return tokens_p, jnp.concatenate([mask, padding_mask], axis=-1)


class StreamSpec:
    """Static per-stream configuration shared by encoder/decoder builders."""

    def __init__(self, *, is_imu=False, img_size=(224, 224), patch_size=(8, 8),
                 in_chans=3, num_frames=2, tubelet_size=1,
                 encoder_embed_dim=768, encoder_depth=12, encoder_num_heads=12,
                 decoder_embed_dim=384, decoder_depth=4, decoder_num_heads=6,
                 decoder_num_classes=None, mlp_ratio=4.0, qkv_bias=True,
                 sequence_length=400, imu_tubelet=16, concat_dummy_token=True,
                 padded=False, max_padding_tokens=0, min_padding_tokens=0):
        self.is_imu = is_imu
        self.img_size = img_size
        self.patch_size = tuple(patch_size)
        self.in_chans = in_chans
        self.num_frames = num_frames
        self.tubelet_size = tubelet_size
        self.encoder_embed_dim = encoder_embed_dim
        self.encoder_depth = encoder_depth
        self.encoder_num_heads = encoder_num_heads
        self.decoder_embed_dim = decoder_embed_dim
        self.decoder_depth = decoder_depth
        self.decoder_num_heads = decoder_num_heads
        self.mlp_ratio = mlp_ratio
        self.qkv_bias = qkv_bias
        self.sequence_length = sequence_length
        self.imu_tubelet = imu_tubelet
        self.concat_dummy_token = concat_dummy_token
        self.padded = padded
        self.max_padding_tokens = max_padding_tokens
        self.min_padding_tokens = min_padding_tokens
        if decoder_num_classes is None:
            if is_imu:
                decoder_num_classes = in_chans * imu_tubelet
            else:
                decoder_num_classes = (in_chans * tubelet_size *
                                       patch_size[0] * patch_size[1])
        self.decoder_num_classes = decoder_num_classes

    @property
    def num_patches(self):
        if self.is_imu:
            return self.sequence_length // self.imu_tubelet
        h, w = self.img_size
        return ((h // self.patch_size[0]) * (w // self.patch_size[1]) *
                (self.num_frames // self.tubelet_size))

    @property
    def total_tokens(self):
        return self.num_patches + (int(self.concat_dummy_token)
                                   if self.is_imu else 0)

    # hashable/static for flax dataclass fields
    def key(self):
        return tuple(sorted((k, str(v)) for k, v in self.__dict__.items()))

    def __hash__(self):
        return hash(self.key())

    def __eq__(self, other):
        return isinstance(other, StreamSpec) and self.key() == other.key()


class ConjoinedVMAE(nn.Module):
    """Two coupled masked predictors (reference
    ConjoinedPretrainVisionTransformer / ConjoinedPaddedVisionTransformer)."""
    main: StreamSpec
    context: StreamSpec
    conjoin_encoder_layers: Tuple[Tuple[int, int], ...] = ((0, 0), (-1, -1))
    conjoin_decoder_layers: Tuple[Tuple[int, int], ...] = ((0, 0),)
    cross_num_heads: int = 4
    cross_mlp_ratio: float = 2.0
    shared_similarity: bool = False
    with_self_attention: bool = False
    dtype: Dtype = jnp.float32
    attn_impl: str = 'dense'

    def _norm_pairs(self, pairs, n_main, n_ctx):
        out = []
        for p in pairs:
            if not hasattr(p, '__len__'):
                p = (p, p)
            out.append((p[0] % n_main, p[1] % n_ctx))
        return tuple(out)

    def setup(self):
        m, c = self.main, self.context
        self.main_encoder = VMAEEncoder(
            img_size=m.img_size, patch_size=m.patch_size, in_chans=m.in_chans,
            embed_dim=m.encoder_embed_dim, depth=m.encoder_depth,
            num_heads=m.encoder_num_heads, mlp_ratio=m.mlp_ratio,
            qkv_bias=m.qkv_bias, tubelet_size=m.tubelet_size,
            num_frames=m.num_frames, dtype=self.dtype,
            attn_impl=self.attn_impl)
        if c.is_imu:
            self.context_encoder = ImuEncoder(
                sequence_length=c.sequence_length, tubelet_size=c.imu_tubelet,
                in_chans=c.in_chans, embed_dim=c.encoder_embed_dim,
                depth=c.encoder_depth, num_heads=c.encoder_num_heads,
                mlp_ratio=c.mlp_ratio, qkv_bias=c.qkv_bias,
                concat_dummy_token=c.concat_dummy_token, dtype=self.dtype,
                attn_impl=self.attn_impl)
        else:
            self.context_encoder = VMAEEncoder(
                img_size=c.img_size, patch_size=c.patch_size,
                in_chans=c.in_chans, embed_dim=c.encoder_embed_dim,
                depth=c.encoder_depth, num_heads=c.encoder_num_heads,
                mlp_ratio=c.mlp_ratio, qkv_bias=c.qkv_bias,
                tubelet_size=c.tubelet_size, num_frames=c.num_frames,
                dtype=self.dtype, attn_impl=self.attn_impl)

        self.main_decoder = VMAEDecoder(
            embed_dim=m.decoder_embed_dim, depth=m.decoder_depth,
            num_heads=m.decoder_num_heads, num_classes=m.decoder_num_classes,
            mlp_ratio=m.mlp_ratio, qkv_bias=m.qkv_bias, dtype=self.dtype,
            attn_impl=self.attn_impl)
        self.context_decoder = VMAEDecoder(
            embed_dim=c.decoder_embed_dim, depth=c.decoder_depth,
            num_heads=c.decoder_num_heads, num_classes=c.decoder_num_classes,
            mlp_ratio=c.mlp_ratio, qkv_bias=c.qkv_bias, dtype=self.dtype,
            attn_impl=self.attn_impl)

        self.main_e2d = nn.Dense(m.decoder_embed_dim, use_bias=False,
                                 dtype=self.dtype)
        self.context_e2d = nn.Dense(c.decoder_embed_dim, use_bias=False,
                                    dtype=self.dtype)
        self.main_mask_token = self.param(
            'main_mask_token', nn.initializers.normal(0.02),
            (1, 1, m.decoder_embed_dim), jnp.float32)
        self.context_mask_token = self.param(
            'context_mask_token', nn.initializers.normal(0.02),
            (1, 1, c.decoder_embed_dim), jnp.float32)

        if m.padded:
            self.main_null_enc = self.param(
                'main_null_enc', nn.initializers.normal(0.02),
                (1, 1, m.encoder_embed_dim), jnp.float32)
            self.main_null_dec = self.param(
                'main_null_dec', nn.initializers.normal(0.02),
                (1, 1, m.decoder_embed_dim), jnp.float32)
        if c.padded:
            self.context_null_enc = self.param(
                'context_null_enc', nn.initializers.normal(0.02),
                (1, 1, c.encoder_embed_dim), jnp.float32)
            self.context_null_dec = self.param(
                'context_null_dec', nn.initializers.normal(0.02),
                (1, 1, c.decoder_embed_dim), jnp.float32)

        enc_pairs = self._norm_pairs(self.conjoin_encoder_layers,
                                     m.encoder_depth, c.encoder_depth)
        dec_pairs = self._norm_pairs(self.conjoin_decoder_layers,
                                     m.decoder_depth, c.decoder_depth)
        # the interleave below (and the reference's, conjoined_vmae.py:
        # 509-541) only advances the layer counters forward, so resolved
        # pairs must be non-decreasing in EACH component (lexicographic
        # order alone would let e.g. ((0,5),(1,2)) silently cross at the
        # wrong context depth) and unique (the reference's ModuleDict
        # would silently collapse duplicates). This also makes
        # declaration order == sorted order, the invariant the checkpoint
        # converter/exporter key their cross-block indices by.
        for pairs, nm in ((enc_pairs, 'encoder'), (dec_pairs, 'decoder')):
            componentwise = all(
                b[0] >= a[0] and b[1] >= a[1]
                for a, b in zip(pairs, pairs[1:]))
            if not componentwise or len(set(pairs)) != len(pairs):
                raise ValueError(
                    f'conjoin_{nm}_layers must resolve to unique pairs '
                    f'with BOTH layer indices non-decreasing; got {pairs}')
        self._enc_pairs = enc_pairs
        self._dec_pairs = dec_pairs

        def cross(in_dim, in_dim_src, name_unused):
            return CrossAttentionTransformerBlock(
                in_dim=in_dim, in_dim_src=in_dim_src,
                num_heads=self.cross_num_heads,
                mlp_ratio=self.cross_mlp_ratio,
                shared_similarity=self.shared_similarity,
                with_self_attention=self.with_self_attention,
                dtype=self.dtype)

        self.encoder_cross_blocks = [
            cross(m.encoder_embed_dim, c.encoder_embed_dim, f'enc_{i}_{j}')
            for (i, j) in enc_pairs]
        self.decoder_cross_blocks = [
            cross(m.decoder_embed_dim, c.decoder_embed_dim, f'dec_{i}_{j}')
            for (i, j) in dec_pairs]

    # ------------------------------------------------------------------
    def _tokenize_main(self, x, mask, n_vis):
        tokens = self.main_encoder.tokenize(x)
        if self.main.padded:
            tokens, mask = pad_tokens_and_mask(
                tokens, mask, self.main_null_enc, n_vis,
                self.main.max_padding_tokens)
        order = mask_order(mask)
        return take_tokens(tokens, order[:, :n_vis]), mask, order

    def _tokenize_context(self, x_c, mask_c, n_vis_c):
        if self.context.is_imu:
            x_c, mask_c = self.context_encoder.append_dummy(x_c, mask_c)
            tokens = self.context_encoder.tokenize(x_c)
        else:
            tokens = self.context_encoder.tokenize(x_c)
        if self.context.padded:
            tokens, mask_c = pad_tokens_and_mask(
                tokens, mask_c, self.context_null_enc, n_vis_c,
                self.context.max_padding_tokens)
        order = mask_order(mask_c)
        return take_tokens(tokens, order[:, :n_vis_c]), mask_c, order

    def _encode(self, x_vis, x_vis_c):
        """Interleave encoder blocks with cross blocks (cross BEFORE the
        paired self-attn layer; reference conjoined_vmae.py:509-541)."""
        i = j = 0
        for (pi, pj), cross_blk in zip(self._enc_pairs,
                                       self.encoder_cross_blocks):
            while i < pi:
                x_vis = self.main_encoder.blocks[i](x_vis)
                i += 1
            while j < pj:
                x_vis_c = self.context_encoder.blocks[j](x_vis_c)
                j += 1
            x_vis, x_vis_c = cross_blk(x_vis, x_vis_c)
        for k in range(i, self.main.encoder_depth):
            x_vis = self.main_encoder.blocks[k](x_vis)
        for k in range(j, self.context.encoder_depth):
            x_vis_c = self.context_encoder.blocks[k](x_vis_c)
        return (self.main_encoder.norm(x_vis),
                self.context_encoder.norm(x_vis_c))

    def _decode(self, x, x_c, n_mask_m, n_mask_c, output_main, output_context):
        """Interleave decoder blocks (cross AFTER the paired layer;
        reference conjoined_vmae.py:644-686)."""
        i = j = 0
        for (pi, pj), cross_blk in zip(self._dec_pairs,
                                       self.decoder_cross_blocks):
            while i <= pi:
                x = self.main_decoder.blocks[i](x)
                i += 1
            while j <= pj:
                x_c = self.context_decoder.blocks[j](x_c)
                j += 1
            x, x_c = cross_blk(x, x_c)
        for k in range(i, self.main.decoder_depth):
            x = self.main_decoder.blocks[k](x)
        for k in range(j, self.context.decoder_depth):
            x_c = self.context_decoder.blocks[k](x_c)
        if output_main:
            x = self.main_decoder.get_last_tokens(x, n_mask_m)
        if output_context:
            x_c = self.context_decoder.get_last_tokens(x_c, n_mask_c)
        return x, x_c

    def _dec_pos(self, spec, order, n_vis, n_total, null_dec=None):
        dim = spec.decoder_embed_dim
        pos = sinusoid_encoding_table(spec.total_tokens, dim)
        b = order.shape[0]
        pos = jnp.broadcast_to(pos, (b, spec.total_tokens, dim))
        if spec.padded:
            nulls = jnp.broadcast_to(null_dec, (b, spec.max_padding_tokens,
                                                dim))
            pos = jnp.concatenate([pos, nulls], axis=1)
        # the position table must cover the (padded) mask the order was
        # computed from, or take_tokens clamps to repeated entries
        assert pos.shape[1] == n_total, (pos.shape, n_total)
        pos = pos.astype(self.dtype)
        pos_vis = take_tokens(pos, order[:, :n_vis])
        pos_mask = take_tokens(pos, order[:, n_vis:])
        return pos_vis, pos_mask

    def __call__(self, x, mask, x_context, mask_context, n_vis: int,
                 n_vis_context: int, output_main: bool = True,
                 output_context: bool = False):
        """Preprocessed stream inputs -> masked-token predictions.

        x [B,C,T,H,W]; mask bool [B,N_main]; x_context: image stream
        [B,Cc,Tc,H,W] or IMU [B,6,L,1,1] or None (missing IMU);
        mask_context bool [B, N_ctx (pre-dummy)].
        """
        x_vis, full_mask_m, order_m = self._tokenize_main(x, mask, n_vis)
        x_vis_c, full_mask_c, order_c = self._tokenize_context(
            x_context, mask_context, n_vis_context)

        x_vis, x_vis_c = self._encode(x_vis, x_vis_c)
        x_vis = self.main_e2d(x_vis)
        x_vis_c = self.context_e2d(x_vis_c)

        pos_vis_m, pos_mask_m = self._dec_pos(
            self.main, order_m, n_vis, full_mask_m.shape[-1],
            getattr(self, 'main_null_dec', None))
        pos_vis_c, pos_mask_c = self._dec_pos(
            self.context, order_c, n_vis_context, full_mask_c.shape[-1],
            getattr(self, 'context_null_dec', None))

        mt_m = self.main_mask_token.astype(x_vis.dtype)
        mt_c = self.context_mask_token.astype(x_vis_c.dtype)
        x_full = jnp.concatenate([x_vis + pos_vis_m, mt_m + pos_mask_m], 1)
        x_full_c = jnp.concatenate([x_vis_c + pos_vis_c, mt_c + pos_mask_c], 1)

        n_mask_m = pos_mask_m.shape[1]
        n_mask_c = pos_mask_c.shape[1]
        y, y_c = self._decode(x_full, x_full_c, n_mask_m, n_mask_c,
                              output_main, output_context)

        # zero outputs at null (padding) positions (reference :207-208, :998-1002)
        if self.main.padded and output_main:
            is_null = order_m[:, n_vis:] >= self.main.total_tokens
            y = y * (~is_null)[..., None].astype(y.dtype)
        if self.context.padded and output_context:
            is_null_c = order_c[:, n_vis_context:] >= self.context.total_tokens
            y_c = y_c * (~is_null_c)[..., None].astype(y_c.dtype)

        if output_main and output_context:
            return y, y_c
        if output_main:
            return y
        if output_context:
            return y_c
        return y, y_c


# ---------------------------------------------------------------------------
# Factories mirroring reference conjoined_vmae.py:1151-1243
# ---------------------------------------------------------------------------

def imu400_base_4x4patch_2frames_1tube(dtype=jnp.float32, attn_impl='dense'):
    """IMU-conditioned ViT-B 4x4 predictor (checkpoint
    cwm_IMUcond_conjVMAE_224px_4x4patches_2frames.pth). Both streams padded
    with null tokens (reference conjoined_vmae.py:1230-1243)."""
    main = StreamSpec(
        img_size=(224, 224), patch_size=(4, 4), in_chans=3, num_frames=2,
        encoder_embed_dim=768, encoder_depth=12, encoder_num_heads=12,
        decoder_embed_dim=384, decoder_depth=4, decoder_num_heads=6,
        padded=True, max_padding_tokens=64)
    context = StreamSpec(
        is_imu=True, in_chans=6, sequence_length=400, imu_tubelet=16,
        encoder_embed_dim=384, encoder_depth=12, encoder_num_heads=12,
        decoder_embed_dim=192, decoder_depth=4, decoder_num_heads=6,
        decoder_num_classes=96, concat_dummy_token=False,
        padded=True, max_padding_tokens=25)
    return ConjoinedVMAE(
        main=main, context=context,
        conjoin_encoder_layers=tuple((i, i) for i in range(0, 12, 3)),
        conjoin_decoder_layers=tuple((i, i) for i in range(4)),
        dtype=dtype, attn_impl=attn_impl)


def imu400_8x8patch_2frames_1tube_flowbackrgb01(dtype=jnp.float32,
                                                attn_impl='dense'):
    """flow2imu model: main stream consumes fwd+bwd RAFT flow + RGB
    (7 channels, 1 frame), context stream is IMU; used to predict IMU from
    video (checkpoint flow2imu_conjVMAE_224px.pth; reference
    conjoined_vmae.py:1218-1228)."""
    main = StreamSpec(
        img_size=(224, 224), patch_size=(8, 8), in_chans=7, num_frames=1,
        encoder_embed_dim=768, encoder_depth=12, encoder_num_heads=12,
        decoder_embed_dim=384, decoder_depth=4, decoder_num_heads=6,
        decoder_num_classes=448)
    context = StreamSpec(
        is_imu=True, in_chans=6, sequence_length=400, imu_tubelet=16,
        encoder_embed_dim=384, encoder_depth=12, encoder_num_heads=12,
        decoder_embed_dim=192, decoder_depth=4, decoder_num_heads=6,
        decoder_num_classes=96, concat_dummy_token=True)
    return ConjoinedVMAE(
        main=main, context=context,
        conjoin_encoder_layers=((0, 0), (-1, -1)),
        conjoin_decoder_layers=tuple((i, i) for i in range(4)),
        dtype=dtype, attn_impl=attn_impl)


def init_conjoined_params(model: ConjoinedVMAE, key=None):
    key = key if key is not None else jax.random.PRNGKey(0)
    m, c = model.main, model.context
    h, w = m.img_size
    x = jnp.zeros((1, m.in_chans, m.num_frames, h, w), jnp.float32)
    mask = jnp.asarray(np.arange(m.num_patches)[None] >= m.num_patches // 2)
    if c.is_imu:
        x_c = jnp.zeros((1, c.in_chans, c.sequence_length, 1, 1), jnp.float32)
        mask_c = jnp.zeros((1, c.num_patches), dtype=bool)
        n_vis_c = c.total_tokens + (c.min_padding_tokens if c.padded else 0)
    else:
        ch, cw = c.img_size
        x_c = jnp.zeros((1, c.in_chans, c.num_frames, ch, cw), jnp.float32)
        mask_c = jnp.zeros((1, c.num_patches), dtype=bool)
        n_vis_c = c.num_patches
    n_vis = m.num_patches // 2 + (m.min_padding_tokens if m.padded else 0)
    return model.init(key, x, mask, x_c, mask_c, n_vis, n_vis_c,
                      output_main=True, output_context=True)['params']


class ConjoinedPredictorWrapper:
    """Runs the stream preprocessors and computes static visible counts,
    then applies the ConjoinedVMAE module — the functional equivalent of
    reference ConjoinedPretrainVisionTransformer.forward
    (conjoined_vmae.py:852-887).
    """

    def __init__(self, model: ConjoinedVMAE, params=None, load_path=None,
                 main_input='rgb01', main_input_kwargs=None,
                 context_input='imu', context_input_kwargs=None,
                 num_frames=2):
        from .preprocessor import get_preprocessor
        self.model = model
        if params is None and load_path is not None:
            from ..utils.torch_convert import load_conjoined_checkpoint
            params = load_conjoined_checkpoint(
                load_path, context_is_imu=model.context.is_imu)
        self.params = params
        main_input_kwargs = dict(main_input_kwargs or {})
        context_input_kwargs = dict(context_input_kwargs or {})
        self.get_main_input = (
            get_preprocessor(main_input, **main_input_kwargs)
            if isinstance(main_input, str) else main_input)
        self.get_context_input = (
            get_preprocessor(context_input, **context_input_kwargs)
            if isinstance(context_input, str) else context_input)
        self.num_frames = num_frames

    # --- properties mirroring the reference wrapper surface -------------
    @property
    def main(self):
        return self.model.main

    @property
    def context(self):
        return self.model.context

    @property
    def patch_size(self):
        m = self.model.main
        return (m.tubelet_size,) + m.patch_size

    # alias matching the plain-VMAE module surface
    full_patch_size = patch_size

    @property
    def img_size(self):
        return self.model.main.img_size

    image_size = img_size

    @property
    def mask_size(self):
        m = self.model.main
        return (self.num_frames // m.tubelet_size,
                m.img_size[0] // m.patch_size[0],
                m.img_size[1] // m.patch_size[1])

    @property
    def num_patches(self):
        return int(np.prod(self.mask_size))

    @property
    def num_head_tokens(self):
        return self.model.context.num_patches

    def get_stream_inputs(self, x, mask, x_context=None, mask_context=None):
        """Frame/mask selection per stream (reference
        conjoined_vmae.py:430-485).

        For an IMU context stream, omitting x_context engages the
        missing-IMU regime (zeroed stream, fully masked — reference
        conjoined_vmae.py:1013-1147 null path); the RGB video is never a
        valid IMU default, and an IMU mask can never be derived from the
        RGB mask, so mask_context is required whenever x_context is given.
        """
        b = x.shape[0]
        t = self.num_frames
        ctx = self.model.context
        if ctx.is_imu:
            if x_context is None:
                x_context = jnp.zeros(
                    (b, ctx.in_chans, ctx.sequence_length), jnp.float32)
                if mask_context is None:
                    mask_context = jnp.ones((b, ctx.num_patches), bool)
            elif mask_context is None:
                raise ValueError(
                    'mask_context is required with an IMU x_context: the '
                    f'{ctx.num_patches}-token IMU mask cannot be derived '
                    'from the RGB mask (the clamped gather would silently '
                    'repeat tokens)')
        x_m = self.get_main_input(x)
        x_c = self.get_context_input(
            x_context if x_context is not None else x)

        mask = jnp.asarray(mask)
        m3 = mask.reshape(b, t, -1)
        mask_m = self.get_main_input.get_output_frames(
            m3, temporal_dim=1).reshape(b, -1)
        if mask_context is None:
            mask_c = self.get_context_input.get_output_frames(
                m3, temporal_dim=1).reshape(b, -1)
        else:
            mask_c = jnp.asarray(mask_context)
            nf_c = self.get_context_input.get_num_frames()
            if nf_c not in (0, None):
                mc3 = mask_c.reshape(b, t, -1)
                mask_c = self.get_context_input.get_output_frames(
                    mc3, temporal_dim=1).reshape(b, -1)
        return (x_m, mask_m), (x_c, mask_c)

    def _static_n_vis(self, mask, spec):
        vis_rows = np.asarray((~jnp.asarray(mask)).sum(-1))
        vis = int(vis_rows.max())
        if spec.padded:
            # an all-masked padded stream still exposes one null token
            # (reference conjoined_vmae.py:69-82). Rows pad with
            # (n_vis - row_visible) nulls; refuse spreads the null budget
            # cannot cover — under-padding would silently count masked
            # content tokens as visible (a ground-truth leak)
            spread = vis - int(vis_rows.min())
            if spread + spec.min_padding_tokens > spec.max_padding_tokens:
                raise ValueError(
                    f'per-row visible-count spread {spread} + '
                    f'min_padding_tokens {spec.min_padding_tokens} exceeds '
                    f'max_padding_tokens {spec.max_padding_tokens}; '
                    'rectangularize the masks or raise max_padding_tokens')
            return max(vis + spec.min_padding_tokens, 1)
        if int(vis_rows.min()) != vis:
            raise ValueError(
                'non-padded stream requires equal per-row visible counts, '
                f'got {sorted(set(vis_rows.tolist()))}; rectangularize the '
                'masks or use a padded StreamSpec')
        return vis

    def strip_padding(self, y):
        """Drop the trailing padded outputs (reference prediction.py:424-432)."""
        m = self.model.main
        if not m.padded:
            return y
        num_pad = m.max_padding_tokens - m.min_padding_tokens
        if num_pad == 0:
            return y     # y[:, :-0] would discard EVERY prediction
        return y[:, :-num_pad]

    def __call__(self, x, mask, timestamps=None, x_context=None,
                 mask_context=None, output_main=True, output_context=False,
                 **kwargs):
        if timestamps is not None:
            raise NotImplementedError(
                'timestamp-conditioned position embeddings are not '
                'implemented; outputs would silently differ from the '
                'reference for non-default timestamps')
        (x_m, mask_m), (x_c, mask_c) = self.get_stream_inputs(
            x, mask, x_context, mask_context)
        n_vis = self._static_n_vis(mask_m, self.model.main)
        n_vis_c = self._static_n_vis(mask_c, self.model.context)
        if self.model.context.is_imu and self.model.context.concat_dummy_token:
            n_vis_c += 1
        return _apply_conjoined(self.model, self.params, x_m, mask_m, x_c,
                                mask_c, n_vis, n_vis_c, bool(output_main),
                                bool(output_context))


@functools.partial(jax.jit, static_argnums=(0, 6, 7, 8, 9))
def _apply_conjoined(model, params, x_m, mask_m, x_c, mask_c, n_vis: int,
                     n_vis_c: int, output_main: bool, output_context: bool):
    return model.apply({'params': params}, x_m, mask_m, x_c, mask_c, n_vis,
                       n_vis_c, output_main=output_main,
                       output_context=output_context)
