"""ChannelMAE: masked autoencoding over channel groups of a single image.

Re-design of reference cwm/models/VideoMAE/cmae.py (and its near-duplicate
cwm/models/ChannelMAE/cmae.py): each channel group is patch-embedded
separately and treated as a 'frame'; group-specific heads decode each
group's masked patches. The Soft variant replaces the hard token drop with a
differentiable mask-token interpolation over all tokens
(cmae.py:663-1002) — no gather at all, which is also the natural TPU form.

Used for the paper's structure-extraction experiments; no demo exercises it
(SURVEY.md §2 item 12), so the API surface here is the model itself plus
label/loss/predict_image helpers.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.patches import patchify, unpatchify
from ..ops.pos_embed import sinusoid_encoding_table
from .layers import Block, interpolate_with_mask_token
from .vmae import mask_order, take_tokens

Dtype = jnp.dtype


class ChannelMaeDecoder(nn.Module):
    """Transformer stack with an optional last-N head
    (reference cmae.py:30-116)."""
    embed_dim: int = 384
    num_classes: int = 0
    depth: int = 4
    num_heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    init_values: Optional[float] = None
    dtype: Dtype = jnp.float32
    attn_impl: str = 'dense'

    def setup(self):
        self.blocks = [
            Block(self.embed_dim, self.num_heads, self.mlp_ratio,
                  self.qkv_bias, init_values=self.init_values,
                  dtype=self.dtype, attn_impl=self.attn_impl)
            for _ in range(self.depth)]
        self.norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)
        if self.num_classes > 0:
            self.head = nn.Dense(self.num_classes, dtype=self.dtype)
        else:
            self.head = lambda x: x

    def get_last_tokens(self, x, return_token_num: int):
        if return_token_num > 0:
            x = x[:, -return_token_num:]
        elif return_token_num == 0:
            x = x[:, :0]
        return self.head(self.norm(x))

    def __call__(self, x, return_token_num: int = -1):
        for blk in self.blocks:
            x = blk(x)
        return self.get_last_tokens(x, return_token_num)


class ChannelMaeEncoder(nn.Module):
    """Per-channel-group patch embedding + ViT over visible tokens
    (reference cmae.py:118-294)."""
    image_size: Tuple[int, int] = (224, 224)
    patch_size: Tuple[int, int] = (32, 32)
    in_channels: int = 3
    channel_partition: Optional[Tuple[int, ...]] = None
    concat_base_channels: Tuple[int, ...] = ()
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    init_values: Optional[float] = None
    dtype: Dtype = jnp.float32
    attn_impl: str = 'dense'

    @property
    def partition(self):
        if self.channel_partition is None:
            return (1,) * self.in_channels
        return tuple(self.channel_partition)

    @property
    def num_channel_groups(self):
        return len(self.partition)

    @property
    def patches_per_group(self):
        return ((self.image_size[0] // self.patch_size[0]) *
                (self.image_size[1] // self.patch_size[1]))

    @property
    def num_patches(self):
        return self.patches_per_group * self.num_channel_groups

    @property
    def mask_size(self):
        return (self.num_channel_groups,
                self.image_size[0] // self.patch_size[0],
                self.image_size[1] // self.patch_size[1])

    def setup(self):
        # (nn.Dense infers the per-group input width, incl. any
        # concatenated base channels — see tokenize)
        self.patch_embeds = [
            nn.Dense(self.embed_dim, dtype=self.dtype)
            for _ in self.partition]
        self.blocks = [
            Block(self.embed_dim, self.num_heads, self.mlp_ratio,
                  self.qkv_bias, init_values=self.init_values,
                  dtype=self.dtype, attn_impl=self.attn_impl)
            for _ in range(self.depth)]
        self.norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)

    def tokenize(self, x):
        """x [B, C, H, W] -> [B, N, E]: each channel group patch-embedded
        separately, tokens concatenated group-major."""
        if x.ndim == 5:
            x = x[:, :, 0]
        splits = np.cumsum(self.partition)[:-1]
        xs = jnp.split(x, splits, axis=1)
        if self.concat_base_channels:
            base = jnp.take(x, jnp.asarray(self.concat_base_channels), axis=1)
            xs = [jnp.concatenate([g, base], axis=1) for g in xs]
        tokens = []
        for group, embed in zip(xs, self.patch_embeds):
            p = patchify(group[:, :, None], (1,) + tuple(self.patch_size),
                         temporal_dim=2)
            tokens.append(embed(p))
        tokens = jnp.concatenate(tokens, axis=1)
        pos = sinusoid_encoding_table(tokens.shape[1],
                                      self.embed_dim).astype(tokens.dtype)
        return tokens + pos

    def __call__(self, x, mask, n_vis: int):
        tokens = self.tokenize(x)
        order = mask_order(mask)
        x_vis = take_tokens(tokens, order[:, :n_vis])
        for blk in self.blocks:
            x_vis = blk(x_vis)
        return self.norm(x_vis)


class ChannelMae(nn.Module):
    """Encoder + decoder + per-group channel heads
    (reference cmae.py:296-660)."""
    image_size: Tuple[int, int] = (224, 224)
    patch_size: Tuple[int, int] = (32, 32)
    in_channels: int = 3
    channel_partition: Optional[Tuple[int, ...]] = None
    concat_base_channels: Tuple[int, ...] = ()
    encoder_embed_dim: int = 768
    encoder_depth: int = 12
    encoder_num_heads: int = 12
    decoder_embed_dim: int = 384
    decoder_depth: int = 4
    decoder_num_heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32
    attn_impl: str = 'dense'

    @property
    def partition(self):
        if self.channel_partition is None:
            return (1,) * self.in_channels
        return tuple(self.channel_partition)

    @property
    def num_channel_groups(self):
        return len(self.partition)

    @property
    def patch_dim(self):
        return self.patch_size[0] * self.patch_size[1]

    @property
    def patches_per_group(self):
        return ((self.image_size[0] // self.patch_size[0]) *
                (self.image_size[1] // self.patch_size[1]))

    @property
    def num_patches(self):
        return self.patches_per_group * self.num_channel_groups

    @property
    def mask_size(self):
        return (self.num_channel_groups,
                self.image_size[0] // self.patch_size[0],
                self.image_size[1] // self.patch_size[1])

    @property
    def channel_group_start_inds(self):
        return [0] + list(np.cumsum(self.partition))

    def setup(self):
        self.encoder = ChannelMaeEncoder(
            image_size=self.image_size, patch_size=self.patch_size,
            in_channels=self.in_channels,
            channel_partition=self.channel_partition,
            concat_base_channels=self.concat_base_channels,
            embed_dim=self.encoder_embed_dim, depth=self.encoder_depth,
            num_heads=self.encoder_num_heads, mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias, dtype=self.dtype,
            attn_impl=self.attn_impl)
        self.decoder = ChannelMaeDecoder(
            embed_dim=self.decoder_embed_dim, depth=self.decoder_depth,
            num_heads=self.decoder_num_heads, mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias, dtype=self.dtype,
            attn_impl=self.attn_impl)
        self.encoder_to_decoder = nn.Dense(self.decoder_embed_dim,
                                           use_bias=False, dtype=self.dtype)
        self.mask_token = self.param('mask_token',
                                     nn.initializers.normal(0.02),
                                     (1, 1, self.decoder_embed_dim),
                                     jnp.float32)
        # linear channel heads (reference default head_params=None)
        self.channel_heads = [
            nn.Dense(self.patch_dim * g, dtype=self.dtype)
            for g in self.partition]

    def __call__(self, x, mask, n_vis: int,
                 group_masked_counts: Tuple[int, ...]):
        return self.forward_groups(x, mask, n_vis, group_masked_counts)

    def forward_groups(self, x, mask, n_vis: int,
                       group_masked_counts: Tuple[int, ...]):
        """x [B, C, H, W]; mask [B, N] group-major with the same per-group
        popcounts in every row (static group_masked_counts). Returns a list
        of per-group predicted masked patches [B, n_masked_g,
        patch_dim * c_g]. Masked tokens appear in token order (group-major),
        so group g's outputs are a contiguous slice — matching the
        reference's grouped boolean splits (cmae.py:415-462).
        """
        b = x.shape[0]
        x_vis = self.encoder(x, mask, n_vis)
        x_vis = self.encoder_to_decoder(x_vis)
        c = x_vis.shape[-1]
        pos = sinusoid_encoding_table(self.num_patches, self.decoder_embed_dim)
        pos = jnp.broadcast_to(pos, (b, self.num_patches, c)).astype(
            x_vis.dtype)
        order = mask_order(mask)
        pos_vis = take_tokens(pos, order[:, :n_vis])
        pos_mask = take_tokens(pos, order[:, n_vis:])
        x_full = jnp.concatenate(
            [x_vis + pos_vis,
             self.mask_token.astype(x_vis.dtype) + pos_mask], axis=1)
        y = self.decoder(x_full, return_token_num=-1)

        y_masked = y[:, n_vis:]
        outs = []
        start = 0
        for g, head in enumerate(self.channel_heads):
            cnt = group_masked_counts[g]
            outs.append(head(y_masked[:, start:start + cnt]))
            start += cnt
        return outs

    # ------------------------------------------------------------------
    def compute_labels(self, x, mask, group_masked_counts):
        """Masked ground-truth patches per group (reference cmae.py:499-524)."""
        outs = []
        inds = self.channel_group_start_inds
        n_per = self.patches_per_group
        order = mask_order(mask)
        n_vis = self.num_patches - sum(group_masked_counts)
        masked_idx = order[:, n_vis:]
        start = 0
        for g, cg in enumerate(self.partition):
            group = x[:, inds[g]:inds[g + 1]]
            p = patchify(group[:, :, None], (1,) + tuple(self.patch_size),
                         temporal_dim=2)  # [B, n_per, pd*cg]
            cnt = group_masked_counts[g]
            idx = masked_idx[:, start:start + cnt] - g * n_per
            outs.append(jnp.take_along_axis(p, idx[..., None], axis=1))
            start += cnt
        return outs


def group_uniform_mask(key, mask_size, mask_ratio: float, batch_size: int = 1):
    """Group-major [B, N] mask with the same per-group popcount in every
    row (the reference's ChannelGroupMaskingGenerator semantics,
    cwm/models/ChannelMAE/channel_masking.py:32-120)."""
    g, h, w = mask_size
    n_per = h * w
    num_masked = int(mask_ratio * n_per)
    keys = jax.random.split(key, batch_size * g).reshape(batch_size, g, 2)

    def frame(k):
        scores = jax.random.uniform(k, (n_per,))
        order = jnp.argsort(scores)
        return jnp.zeros((n_per,), bool).at[order[:num_masked]].set(True)

    m = jax.vmap(jax.vmap(frame))(keys)
    return m.reshape(batch_size, g * n_per), (num_masked,) * g


def apply_channel_mae(model: ChannelMae, params, x, mask, n_vis: int,
                      group_masked_counts: Tuple[int, ...]):
    return model.apply({'params': params}, x, mask, n_vis,
                       group_masked_counts, method=model.forward_groups)


def channel_mae_train_loss(model: ChannelMae, params, x, mask, n_vis,
                           group_masked_counts):
    """MSE over masked patches, summed over groups (reference cmae.py:526-547)."""
    preds = apply_channel_mae(model, params, x, mask, n_vis,
                              group_masked_counts)
    labels = model.apply({'params': params}, x, mask, group_masked_counts,
                         method=model.compute_labels)
    loss = 0.0
    for p, l in zip(preds, labels):
        if p.shape[1] > 0:
            loss = loss + jnp.mean((p - l) ** 2)
    return loss


def channel_mae_predict_image(model: ChannelMae, params, x, mask, n_vis,
                              group_masked_counts):
    """Recombine per-group predictions into a full image; visible patches
    come from the input (reference cmae.py:568-598)."""
    preds = apply_channel_mae(model, params, x, mask, n_vis,
                              group_masked_counts)
    inds = model.channel_group_start_inds
    n_per = model.patches_per_group
    order = mask_order(mask)
    masked_idx = order[:, n_vis:]
    out_groups = []
    start = 0
    for g, cg in enumerate(model.partition):
        group = x[:, inds[g]:inds[g + 1]]
        p = patchify(group[:, :, None], (1,) + tuple(model.patch_size),
                     temporal_dim=2)
        cnt = group_masked_counts[g]
        idx = masked_idx[:, start:start + cnt] - g * n_per
        p = jax.vmap(lambda pp, ii, vv: pp.at[ii].set(vv))(
            p, idx, preds[g].astype(p.dtype))
        out_groups.append(unpatchify(
            p, (1,) + tuple(model.patch_size),
            (x.shape[0], cg, *model.image_size)))
        start += cnt
    return jnp.concatenate(out_groups, axis=1)


class SoftChannelMae(nn.Module):
    """Differentiable masking: instead of dropping tokens, every token is a
    lerp between its embedding and the mask token weighted by a soft mask in
    [0, 1] (reference SoftChannelMae, cmae.py:663-1002). No gathers at all —
    the natural TPU formulation.
    """
    image_size: Tuple[int, int] = (224, 224)
    patch_size: Tuple[int, int] = (32, 32)
    in_channels: int = 3
    channel_partition: Optional[Tuple[int, ...]] = None
    concat_base_channels: Tuple[int, ...] = ()
    encoder_embed_dim: int = 768
    encoder_depth: int = 12
    encoder_num_heads: int = 12
    decoder_embed_dim: int = 384
    decoder_depth: int = 4
    decoder_num_heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32
    attn_impl: str = 'dense'

    @property
    def partition(self):
        if self.channel_partition is None:
            return (1,) * self.in_channels
        return tuple(self.channel_partition)

    @property
    def patch_dim(self):
        return self.patch_size[0] * self.patch_size[1]

    @property
    def patches_per_group(self):
        return ((self.image_size[0] // self.patch_size[0]) *
                (self.image_size[1] // self.patch_size[1]))

    @property
    def num_patches(self):
        return self.patches_per_group * len(self.partition)

    @property
    def mask_size(self):
        return (len(self.partition),
                self.image_size[0] // self.patch_size[0],
                self.image_size[1] // self.patch_size[1])

    def setup(self):
        self.encoder = ChannelMaeEncoder(
            image_size=self.image_size, patch_size=self.patch_size,
            in_channels=self.in_channels,
            channel_partition=self.channel_partition,
            concat_base_channels=self.concat_base_channels,
            embed_dim=self.encoder_embed_dim, depth=self.encoder_depth,
            num_heads=self.encoder_num_heads, mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias, dtype=self.dtype,
            attn_impl=self.attn_impl)
        self.decoder = ChannelMaeDecoder(
            embed_dim=self.decoder_embed_dim, depth=self.decoder_depth,
            num_heads=self.decoder_num_heads, mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias, dtype=self.dtype,
            attn_impl=self.attn_impl)
        self.encoder_to_decoder = nn.Dense(self.decoder_embed_dim,
                                           use_bias=False, dtype=self.dtype)
        # one soft mask token at encoder dim (reference cmae.py:740-743)
        self.mask_token = self.param('mask_token',
                                     nn.initializers.normal(0.02),
                                     (1, 1, self.encoder_embed_dim),
                                     jnp.float32)
        self.channel_heads = [
            nn.Dense(self.patch_dim * g, dtype=self.dtype)
            for g in self.partition]

    def _encode(self, x, soft_mask):
        """Soft-masked encode (reference cmae.py:828-848, decode_mask-free
        path: the demo/training path with num_decode_tokens=None)."""
        tokens = self.encoder.tokenize(x)
        tokens = interpolate_with_mask_token(
            tokens, soft_mask, self.mask_token.astype(tokens.dtype),
            invert=True)
        for blk in self.encoder.blocks:
            tokens = blk(tokens)
        return self.encoder.norm(tokens)

    def _decode(self, z, soft_mask):
        """Add decoder-dim positions and decode all tokens. The reference's
        SoftChannelMae._decode (cmae.py:850-859) raises NameError on an
        undefined `mask` kwarg; this is that method with the bug removed
        (the kwarg was unused: filter_to_masked=False)."""
        pos = sinusoid_encoding_table(self.num_patches,
                                      self.decoder_embed_dim)
        z = z + jnp.asarray(pos, z.dtype)
        return self.decoder(z, return_token_num=-1)

    def __call__(self, x, soft_mask):
        """x [B, C, H, W]; soft_mask float [B, N] in [0, 1]
        (1 = fully masked). Returns per-group predictions over ALL tokens
        [B, n_per_group, patch_dim * c_g], differentiable in soft_mask
        (reference forward, cmae.py:862-891, num_decode_tokens=None)."""
        tokens = self._encode(x, soft_mask)
        z = self.encoder_to_decoder(tokens)
        y = self._decode(z, soft_mask)
        outs = []
        n_per = self.patches_per_group
        for g, head in enumerate(self.channel_heads):
            outs.append(head(y[:, g * n_per:(g + 1) * n_per]))
        return outs

    def compute_labels(self, x):
        """Ground-truth patches for every token per group
        (reference cmae.py:905-937, decode_mask=None)."""
        inds = [0] + list(np.cumsum(self.partition))
        outs = []
        for g, cg in enumerate(self.partition):
            group = x[:, inds[g]:inds[g + 1]]
            outs.append(patchify(group[:, :, None],
                                 (1,) + tuple(self.patch_size),
                                 temporal_dim=2))
        return outs


class SoftInputChannelMae(SoftChannelMae):
    """Soft tokens route the inputs differentiably, but the decoded tokens
    are a fresh set of hard mask tokens appended to the sequence — the
    decoder reads off predictions for every position from them (reference
    SoftInputChannelMae, cmae.py:1004-1059)."""

    def setup(self):
        super().setup()
        self.decoder_mask_token = self.param('decoder_mask_token',
                                             nn.initializers.normal(0.02),
                                             (1, 1, self.decoder_embed_dim),
                                             jnp.float32)

    def _decode(self, z, soft_mask):
        """Concat decoder mask tokens w/ positions, decode, return the last
        N (the mask tokens' outputs) — reference cmae.py:1033-1051."""
        b = z.shape[0]
        pos = jnp.asarray(sinusoid_encoding_table(
            self.num_patches, self.decoder_embed_dim), z.dtype)
        mask_tok = self.decoder_mask_token.astype(z.dtype) + pos
        z = z + pos
        z = jnp.concatenate(
            [z, jnp.broadcast_to(mask_tok, (b,) + mask_tok.shape[1:])], 1)
        return self.decoder(z, return_token_num=self.num_patches)


def soft_channel_mae_recombine(model: SoftChannelMae, ys):
    """Stack per-group head outputs back into [B, n_per, patch_dim, C]
    (reference _recombine_channel_head_outputs, cmae.py:763-780)."""
    b = ys[0].shape[0]
    n_per = model.patches_per_group
    pd = model.patch_dim
    ys = [y.reshape(b, n_per, pd, cg)
          for y, cg in zip(ys, model.partition)]
    return jnp.concatenate(ys, -1)


def soft_channel_mae_predict_image(model: SoftChannelMae, params, x,
                                   soft_mask,
                                   replace_visible_patches_with_input=True):
    """Recombine per-group soft predictions into a full image; each patch
    lerps between prediction and input by its soft mask value (reference
    SoftChannelMae.predict_image, cmae.py:986-1003). The reference
    reshapes its group-major mask as if it were group-minor
    (``mask.reshape(B, -1, 1, G)``, cmae.py:999) and so mis-weights
    multi-group models; here the group-major layout its own loss uses
    (cmae.py:944) is applied consistently. Works for SoftInputChannelMae
    too (same forward interface)."""
    preds = model.apply({'params': params}, x, soft_mask)
    n_per = model.patches_per_group
    inds = [0] + list(np.cumsum(model.partition))
    out_groups = []
    for g, cg in enumerate(model.partition):
        p = preds[g]
        if replace_visible_patches_with_input:
            group = x[:, inds[g]:inds[g + 1]]
            xp = patchify(group[:, :, None], (1,) + tuple(model.patch_size),
                          temporal_dim=2).astype(p.dtype)
            m = soft_mask[:, g * n_per:(g + 1) * n_per].astype(
                p.dtype)[..., None]
            p = p * m + xp * (1 - m)
        out_groups.append(unpatchify(
            p, (1,) + tuple(model.patch_size),
            (x.shape[0], cg, *model.image_size)))
    return jnp.concatenate(out_groups, axis=1)


def soft_channel_mae_train_loss(model: SoftChannelMae, params, x, soft_mask):
    """Mask-weighted per-group MSE (reference compute_train_loss,
    cmae.py:960-984): fully revealed patches contribute no loss."""
    preds = model.apply({'params': params}, x, soft_mask)
    labels = model.apply({'params': params}, x,
                         method=SoftChannelMae.compute_labels)
    n_per = model.patches_per_group
    loss = 0.0
    for g, (p, l) in enumerate(zip(preds, labels)):
        m = soft_mask[:, g * n_per:(g + 1) * n_per].astype(p.dtype)
        per_tok = ((p - l) ** 2).mean(-1) * m
        num_masked = jnp.clip(m.sum(1, keepdims=True), min=1.0)
        loss = loss + (per_tok.sum(1, keepdims=True) / num_masked).mean()
    return loss
