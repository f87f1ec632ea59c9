"""Invariant + golden tests for mask generators and mask ops."""
import numpy as np
import jax
import jax.numpy as jnp

from counterfactualworldmodels_tpu import masking
from counterfactualworldmodels_tpu.masking import generators as gen

from reference_shims import install as install_reference
install_reference()


def popcounts(m):
    return np.asarray(m).sum(-1)


def test_rotated_table_uniform_popcount_and_layout():
    key = jax.random.PRNGKey(0)
    t, h, w = 2, 28, 28
    ratio = 0.99
    m = gen.rotated_table_uniform_mask(key, (t, h, w), ratio, batch_size=4)
    m = np.asarray(m)
    assert m.shape == (4, t * h * w)
    # frame 0 fully visible
    assert not m[:, :h * w].any()
    # frame 1 exact popcount
    expected = int(ratio * h * w)
    assert (m[:, h * w:].sum(-1) == expected).all()


def test_rotated_table_uniform_clumping():
    key = jax.random.PRNGKey(1)
    t, h, w = 2, 56, 56
    m = gen.rotated_table_uniform_mask(key, (t, h, w), 0.99, clumping_factor=2,
                                       batch_size=2)
    m = np.asarray(m)
    f1 = m[:, h * w:].reshape(2, h, w)
    # clump invariance: every 2x2 block uniform
    blocks = f1.reshape(2, h // 2, 2, w // 2, 2)
    assert (blocks.min((2, 4)) == blocks.max((2, 4))).all()
    expected = int(0.99 * (h // 2) * (w // 2)) * 4
    assert (f1.sum((-2, -1)) == expected).all()


def test_mask_bitwise_stable_under_seed():
    g1 = gen.RotatedTableUniformMaskingGenerator((2, 28, 28), 0.99, seed=42)
    g2 = gen.RotatedTableUniformMaskingGenerator((2, 28, 28), 0.99, seed=42)
    x = jnp.zeros((3, 2, 3, 224, 224))
    m1, m2 = g1(x), g2(x)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    # and different on the next call
    m3 = g1(x)
    assert not np.array_equal(np.asarray(m1), np.asarray(m3))


def test_tube_and_rotated_table_generators():
    key = jax.random.PRNGKey(2)
    m = gen.tube_mask(key, (3, 8, 8), 0.5, batch_size=2)
    m = np.asarray(m).reshape(2, 3, 64)
    assert (m[:, 0] == m[:, 1]).all() and (m[:, 1] == m[:, 2]).all()
    m2 = np.asarray(gen.rotated_table_mask(key, (3, 8, 8), 0.5, batch_size=2))
    m2 = m2.reshape(2, 3, 64)
    assert not m2[:, 0].any()
    assert (m2[:, 1] == m2[:, 2]).all()


def test_upsample_masks_matches_reference():
    import torch
    from cwm.models.masking import upsample_masks as ref_upsample
    rng = np.random.RandomState(0)
    m = rng.rand(2, 3, 7, 7) > 0.5
    ref = ref_upsample(torch.tensor(m), (28, 28)).numpy()
    mine = np.asarray(masking.upsample_masks(jnp.asarray(m), (28, 28)))
    np.testing.assert_array_equal(mine, ref)
    # downsample
    ref2 = ref_upsample(torch.tensor(ref), (7, 7)).numpy()
    mine2 = np.asarray(masking.upsample_masks(jnp.asarray(mine), (7, 7)))
    np.testing.assert_array_equal(mine2, ref2)


def test_patch_distance_transform_matches_reference():
    import torch
    from cwm.models.masking import patch_distance_transform as ref_pdt
    rng = np.random.RandomState(1)
    m = rng.rand(2, 2, 9, 9) > 0.2
    ref = ref_pdt(torch.tensor(m)).numpy()
    mine = np.asarray(masking.patch_distance_transform(jnp.asarray(m)))
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_patches_adjacent_to_visible_matches_reference():
    import torch
    from cwm.models.masking import patches_adjacent_to_visible as ref_adj
    rng = np.random.RandomState(2)
    m = rng.rand(2, 1, 9, 9) > 0.1
    for radius in [1, 2]:
        ref = ref_adj(torch.tensor(m), radius=radius).numpy()
        mine = np.asarray(masking.patches_adjacent_to_visible(
            jnp.asarray(m), radius=radius))
        np.testing.assert_array_equal(mine, ref)


def test_rectangularize_exact_counts():
    rng = np.random.RandomState(3)
    m = jnp.asarray(rng.rand(4, 100) > rng.rand(4, 1))
    # reference semantics (masking.py:112-115): modes act on MASKED
    # counts — 'min' equalizes to the least-masked row (most visible)
    out = masking.rectangularize(jax.random.PRNGKey(0), m, mode='min')
    vis = (~np.asarray(out)).sum(-1)
    target = (~np.asarray(m)).sum(-1).max()
    assert (vis == target).all()
    out_mx = masking.rectangularize(jax.random.PRNGKey(0), m, mode='max')
    assert ((~np.asarray(out_mx)).sum(-1)
            == (~np.asarray(m)).sum(-1).min()).all()
    # rows that already had the target visible count keep their visible set
    keep = (~np.asarray(m)).sum(-1) == target
    if keep.any():
        np.testing.assert_array_equal(np.asarray(out)[keep], np.asarray(m)[keep])
    # explicit target
    out2 = masking.rectangularize(jax.random.PRNGKey(1), m, num_visible=7)
    assert ((~np.asarray(out2)).sum(-1) == 7).all()
    # deficits only add, surpluses only remove
    grew = np.asarray(out2) & ~np.asarray(m)   # newly masked
    shrunk = ~np.asarray(out2) & np.asarray(m)  # newly visible
    for b in range(4):
        nv = (~np.asarray(m)[b]).sum()
        if nv > 7:
            assert shrunk[b].sum() == 0
        elif nv < 7:
            assert grew[b].sum() == 0


def test_partition_masks_disjoint_cover():
    rng = np.random.RandomState(4)
    m = jnp.asarray(rng.rand(3, 50) > 0.4)
    parts = masking.partition_masks(jax.random.PRNGKey(0), m, num_samples=3)
    vis_parts = [~np.asarray(p) for p in parts]
    total = sum(v.astype(int) for v in vis_parts)
    # disjoint
    assert (total <= 1).all()
    # cover exactly the visible set
    np.testing.assert_array_equal(total.astype(bool), ~np.asarray(m))


def test_energy_mask_concentrates_on_energy():
    energy = np.full((1, 1, 28, 28), 1e-6, dtype=np.float32)
    energy[0, 0, 10:14, 20:24] = 10.0
    m = gen.rotated_table_energy_mask(
        jax.random.PRNGKey(0), jnp.asarray(energy), (2, 28, 28), num_visible=4)
    m = np.asarray(m)
    assert m.shape == (1, 2 * 28 * 28)
    assert not m[:, :28 * 28].any()  # frame 0 visible
    f1 = ~m[:, 28 * 28:].reshape(28, 28)
    ys, xs = np.nonzero(f1)
    assert len(ys) >= 1 and len(ys) <= 4  # draws with replacement may collide
    assert (ys >= 10).all() and (ys < 14).all()
    assert (xs >= 20).all() and (xs < 24).all()


def test_energy_generator_class_api():
    g = gen.RotatedTableEnergyMaskingGenerator(
        input_size=(2, 28, 28), mask_ratio=0, seed=0, always_batch=True)
    g.num_visible = 2
    energy = jnp.ones((2, 1, 224, 224))
    m = g(energy)
    m = np.asarray(m)
    assert m.shape == (2, 2 * 28 * 28)
    assert (~m[:, 28 * 28:]).sum(-1).max() <= 2


def test_full_mask_generator_per_sample():
    g = gen.FullMaskGenerator(full_mask_prob=1.0, full_vis_prob=0.0,
                              input_size=(2, 8, 8), mask_ratio=0.5, seed=0)
    x = jnp.zeros((2, 2, 3, 64, 64))
    m = np.asarray(g(x))
    assert m.all()


def test_missing_data_imu_generator():
    g = gen.MissingDataImuMaskGenerator(input_size=25, mask_ratio=0.0,
                                        full_mask_prob=0.0,
                                        truncation_mode='none', seed=0)
    missing = np.zeros((2, 25), dtype=bool)
    missing[0, :5] = True
    m = np.asarray(g(jnp.asarray(missing)))
    assert m[0, :5].all()
    assert not m[1].any()
