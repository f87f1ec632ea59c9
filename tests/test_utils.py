"""Checkpointing, profiling, and interface smoke tests."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import matplotlib

matplotlib.use('Agg')

from counterfactualworldmodels_tpu.models import vmae as jvmae
from counterfactualworldmodels_tpu.models.raft.raft import RAFT, init_raft_params
from counterfactualworldmodels_tpu.pipelines import FlowGenerator
from counterfactualworldmodels_tpu.training import train as jtrain
from counterfactualworldmodels_tpu.utils import checkpoint as ckpt
from counterfactualworldmodels_tpu.utils.profiling import (StageTimer,
                                                           MetricsLogger)


def _tiny_model():
    return jvmae.PretrainVisionTransformer(
        img_size=(32, 32), patch_size=(8, 8), encoder_embed_dim=64,
        encoder_depth=2, encoder_num_heads=4, decoder_embed_dim=32,
        decoder_depth=1, decoder_num_heads=2, num_frames=2)


def test_checkpoint_roundtrip(tmp_path):
    model = _tiny_model()
    params = jvmae.init_params(model, jax.random.PRNGKey(0))
    path = str(tmp_path / 'params')
    ckpt.save_params(path, params)
    restored = ckpt.load_params(path)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_checkpoint_manager_resume(tmp_path):
    model = _tiny_model()
    opt = jtrain.make_optimizer(learning_rate=1e-3, warmup_steps=1,
                                total_steps=10)
    state = jtrain.init_train_state(model, opt, jax.random.PRNGKey(0))
    mask, n_vis = jtrain.make_batch_masks(jax.random.PRNGKey(1), model,
                                          batch_size=1, mask_ratio=0.5)
    x = jnp.zeros((1, 2, 3, 32, 32))
    step = jax.jit(jtrain.make_train_step(model, opt, n_vis))
    mgr = ckpt.CheckpointManager(str(tmp_path / 'run'), max_to_keep=2)
    for i in range(3):
        state, _ = step(state, x, mask)
        mgr.save(int(state.step), state)
    assert mgr.all_steps() == [2, 3]  # rolled to max_to_keep
    template = jtrain.init_train_state(model, opt, jax.random.PRNGKey(0))
    restored = mgr.restore_latest(template)
    assert int(restored.step) == 3
    # resumed state continues training identically
    s1, m1 = step(state, x, mask)
    s2, m2 = step(restored, x, mask)
    np.testing.assert_allclose(float(m1['loss']), float(m2['loss']),
                               rtol=1e-6)


def test_stage_timer_and_metrics(tmp_path):
    t = StageTimer()
    with t.stage('a'):
        jnp.zeros((8, 8)).sum()
    with t.stage('a'):
        pass
    assert t.summary()['a']['count'] == 2
    assert 'a' in t.report()
    log = MetricsLogger(str(tmp_path / 'm.jsonl'))
    log.log(1, loss=0.5)
    log.log(2, loss=0.25)
    assert len(open(log.path).readlines()) == 2


@pytest.mark.slow
@pytest.mark.parametrize('engine', ['exact', 'fast'])
def test_interface_events_end_to_end(engine):
    """Drive the matplotlib interface with synthetic events (both
    generator engines; 'fast' exercises the PrefixLru on the repeated
    same-image batch events)."""
    import matplotlib.pyplot as plt
    from counterfactualworldmodels_tpu.interface import (
        CounterfactualPredictionInterface)

    model = _tiny_model()
    params = jvmae.init_params(model, jax.random.PRNGKey(0))
    raft = RAFT(iters=1)
    raft_params = init_raft_params(raft, jax.random.PRNGKey(1), hw=32)
    G = FlowGenerator(predictor=model, params=params, flow_model=raft,
                      flow_params=raft_params, raft_iters=1,
                      imagenet_normalize_inputs=True, seed=0, engine=engine)

    rng = np.random.RandomState(0)
    x = rng.rand(1, 3, 32, 32).astype(np.float32)
    fig, axes = plt.subplots(2, 2)
    ui = CounterfactualPredictionInterface(
        axes, G, x=x, size=(32, 32), max_shift=2, sample_batch_size=2,
        show_ticks=False)

    class Event:
        def __init__(self, x, y, key=None, button=1):
            self.xdata, self.ydata = x, y
            self.key = key
            self.button = button
            self.dblclick = False

    # click an active patch, then a passive patch
    n_per = 16  # 4x4 patch grid per frame
    ui(Event(12, 12))
    assert int((~np.asarray(ui.active_patches))[:, n_per:].sum()) == 1
    ui(Event(20, 20, key='meta'))
    assert int((~np.asarray(ui.passive_patches))[:, n_per:].sum()) == 1
    # run a single counterfactual ('f')
    ui(Event(12, 12, key='f'))
    assert len(ui.flow_samples_list) == 1
    assert ui.flow.shape[-2:] == (32, 32)
    # run a batch ('b')
    ui(Event(12, 12, key='b'))
    assert len(ui.flow_samples_list) == 3
    # covariance probe ('x')
    ui(Event(12, 12, key='x'))
    assert ui._flow_corrs is not None
    # error maps ('e')
    ui(Event(12, 12, key='e'))
    # reset ('shift')
    ui(Event(12, 12, key='shift'))
    assert int((~np.asarray(ui.active_patches))[:, n_per:].sum()) == 0
    assert len(ui.flow_samples_list) == 0
    # restore ('alt')
    ui(Event(12, 12, key='alt'))
    # patch selector ('T'): unconfigured -> no-op, then the real selector
    ui(Event(12, 12, key='T'))
    from counterfactualworldmodels_tpu.pipelines import IterativePatchSelector
    ui.patch_selector = IterativePatchSelector(
        G, num_iters=1, samples_per_iter=2, sample_batch_size=2)
    ui(Event(12, 12))  # seed an active patch
    n_flows = len(ui.flow_samples_list)
    ui(Event(12, 12, key='T'))
    assert len(ui.flow_samples_list) == n_flows + 2
    assert int((~np.asarray(ui.patch_selector.filter_masks)).sum()) >= 0
    if engine == 'fast':
        # every batch event probed the same loaded image -> one prefix
        # build, later events hit the LRU
        assert G._prefix_lru is not None
        assert G._prefix_lru.misses == 1 and G._prefix_lru.hits >= 1
    plt.close(fig)


def test_micro_batcher_merges_and_propagates():
    """utils/batching.MicroBatcher: same-key requests within the window
    merge into one dispatch; results map back per item; errors propagate
    to every member; max_items closes a batch early."""
    import threading
    import time
    from counterfactualworldmodels_tpu.utils.batching import (
        MicroBatcher, pad_to_bucket)

    calls = []

    def dispatch(key, items):
        calls.append((key, list(items)))
        return [x * 10 for x in items]

    mb = MicroBatcher(dispatch, window_s=0.25, max_items=8)
    results = {}

    def worker(i, key):
        results[i] = mb.run(key, i)

    ts = [threading.Thread(target=worker, args=(i, 'k')) for i in range(4)]
    for t in ts:
        t.start()
        time.sleep(0.01)  # all within the leader's window
    for t in ts:
        t.join()
    assert results == {i: i * 10 for i in range(4)}
    assert len(calls) == 1 and sorted(calls[0][1]) == [0, 1, 2, 3]
    assert mb.batches == 1 and mb.batched_items == 4

    # distinct keys never merge
    calls.clear()
    ts = [threading.Thread(target=worker, args=(i, f'k{i}'))
          for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(calls) == 2

    # a dispatch error reaches followers and the leader
    def boom(key, items):
        raise RuntimeError('nope')

    mb2 = MicroBatcher(boom, window_s=0.2)
    errs = []

    def worker2():
        try:
            mb2.run('k', 1)
        except RuntimeError as e:
            errs.append(str(e))

    ts = [threading.Thread(target=worker2) for _ in range(3)]
    for t in ts:
        t.start()
        time.sleep(0.01)
    for t in ts:
        t.join()
    assert errs == ['nope'] * 3

    # max_items closes the batch before the window elapses
    mb3 = MicroBatcher(dispatch, window_s=5.0, max_items=2)
    calls.clear()
    t0 = time.monotonic()
    ts = [threading.Thread(target=lambda i=i: mb3.run('k', i))
          for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert time.monotonic() - t0 < 4.0
    assert len(calls) == 1 and len(calls[0][1]) == 2

    assert pad_to_bucket(3, (1, 2, 4, 8)) == 4
    assert pad_to_bucket(4, (1, 2, 4, 8)) == 4
    assert pad_to_bucket(9, (1, 2, 4, 8)) == 8  # capped at the largest

def test_micro_batcher_weight():
    """With a weight function, max_items caps total WEIGHT per batch
    (serving passes per-request sample counts): an item that would push
    a batch over the cap closes it and leads a fresh one, so no dispatch
    ever exceeds the cap."""
    import threading
    import time
    from counterfactualworldmodels_tpu.utils.batching import MicroBatcher

    calls = []

    def dispatch(key, items):
        calls.append(list(items))
        return list(items)

    # items are (id, weight); cap 4
    mb = MicroBatcher(dispatch, window_s=0.4, max_items=4,
                      weight=lambda it: it[1])
    out = {}

    def worker(i, w):
        out[i] = mb.run('k', (i, w))

    # 3 + 3 > 4: the second request must NOT join the first batch
    ts = [threading.Thread(target=worker, args=(0, 3)),
          threading.Thread(target=worker, args=(1, 3))]
    for t in ts:
        t.start()
        time.sleep(0.05)
    for t in ts:
        t.join()
    assert len(calls) == 2 and all(len(c) == 1 for c in calls)
    assert out == {0: (0, 3), 1: (1, 3)}

    # 2 + 2 == 4 merges and closes exactly at the cap (early, pre-window)
    calls.clear()
    t0 = time.monotonic()
    ts = [threading.Thread(target=worker, args=(2, 2)),
          threading.Thread(target=worker, args=(3, 2))]
    for t in ts:
        t.start()
        time.sleep(0.05)
    for t in ts:
        t.join()
    assert len(calls) == 1 and sorted(calls[0]) == [(2, 2), (3, 2)]
    assert time.monotonic() - t0 < 0.39

def test_train_step_in_program_masks():
    """A step built with mask_fn (mask sampled INSIDE the jitted program
    from a PRNG key) produces bit-identical updates to the external-mask
    step fed the same key's mask — for the plain VMAE and the cmae/
    conjoined variants' keyed signatures."""
    model = _tiny_model()
    opt = jtrain.make_optimizer(learning_rate=1e-3, warmup_steps=1,
                                total_steps=10)
    state = jtrain.init_train_state(model, opt, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 2, 3, 32, 32))
    mk = jax.random.PRNGKey(3)
    mask, n_vis = jtrain.make_batch_masks(mk, model, batch_size=2,
                                          mask_ratio=0.5)

    step_ext = jax.jit(jtrain.make_train_step(model, opt, n_vis,
                                              remat=False))
    step_key = jax.jit(jtrain.make_train_step(
        model, opt, n_vis, remat=False,
        mask_fn=lambda k, b: jtrain.make_batch_masks(k, model, b, 0.5)[0]))
    s1, m1 = step_ext(state, x, mask)
    s2, m2 = step_key(state, x, mk)
    np.testing.assert_array_equal(np.asarray(m1['loss']),
                                  np.asarray(m2['loss']))
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
