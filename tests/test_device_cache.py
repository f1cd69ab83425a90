"""HBM-resident dataset cache (data/device_cache.py; loader.device_cache).

Contract under test, on the 8-virtual-device mesh:
* one epoch visits every shard-resident sample exactly once (per-shard
  permutation without replacement — DDP sampler contract, reference
  train.py:61 via DALI's shards);
* gathered images are the resident images (cache fidelity through the
  normalize augment);
* the steady-state program contains ZERO collectives (the gather is
  shard-LOCAL by construction);
* epoch streams are deterministic given the epoch counter (restart == rerun).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sota_imagenet_tpu.utils.hlo import collective_counts as _counts
from sota_imagenet_tpu.data.device_cache import DeviceCacheFeed
from sota_imagenet_tpu.ops.augment import build_val_augment

N, BS, SZ, NDEV = 64, 16, 8, 8
PER_SHARD = N // NDEV


class IndexLoader:
    """Host loader stub: every pixel of sample i has value i; label = i."""

    def __init__(self, n=N, bs=BS, size=SZ):
        self.batch_size = bs
        self.n = n
        self.size = size

    def __len__(self):
        return self.n // self.batch_size

    def __iter__(self):
        for b in range(len(self)):
            idx = np.arange(b * self.batch_size, (b + 1) * self.batch_size)
            imgs = np.broadcast_to(
                idx[:, None, None, None], (len(idx), self.size, self.size, 3)
            ).astype(np.uint8).copy()
            yield imgs, idx.astype(np.int32)


@pytest.fixture(scope="module")
def feed(mesh8_module):
    aug = build_val_augment(num_classes=N, out_dtype=jnp.float32)
    return DeviceCacheFeed(IndexLoader(), mesh8_module, aug)


@pytest.fixture(scope="module")
def mesh8_module():
    from sota_imagenet_tpu.parallel.mesh import create_mesh

    return create_mesh()


def _epoch_labels_per_shard(feed):
    """labels drawn this epoch, grouped by the data shard they came from."""
    per_shard = [[] for _ in range(NDEV)]
    for batch in feed:
        labs = np.argmax(np.asarray(batch["label"]), axis=-1)
        bs_local = len(labs) // NDEV
        for d in range(NDEV):
            per_shard[d].extend(labs[d * bs_local : (d + 1) * bs_local])
    return per_shard


def test_epoch_covers_every_resident_sample_once(feed):
    assert len(feed) == PER_SHARD // (BS // NDEV)
    per_shard = _epoch_labels_per_shard(feed)
    for d in range(NDEV):
        # interleaved routing contract: stream row i lives on shard i % NDEV
        # (device_cache.py fill machinery — lets the chunked fill route each
        # chunk without knowing the final per-shard count)
        resident = set(range(d, NDEV * PER_SHARD, NDEV))
        assert sorted(per_shard[d]) == sorted(resident), f"shard {d}"


def test_gathered_images_match_resident_samples(feed):
    from sota_imagenet_tpu.ops.augment import DATA_MEAN, DATA_STD

    for batch in feed:
        labs = np.argmax(np.asarray(batch["label"]), axis=-1)
        # invert the val normalize: pixel value == sample index == label
        px = np.asarray(batch["image"])[:, 0, 0, 0] * DATA_STD + DATA_MEAN
        np.testing.assert_allclose(px, labs, atol=0.01)


def test_fill_is_lazy(mesh8_module):
    """Stage-skip on resume / evaluate-only must not pay the HBM stream: the
    fill runs at first __len__/__iter__, not at construction."""
    aug = build_val_augment(num_classes=N, out_dtype=jnp.float32)
    f = DeviceCacheFeed(IndexLoader(), mesh8_module, aug)
    assert f.images is None and f._host is not None
    assert len(f) == PER_SHARD // (BS // NDEV)
    assert f.images is not None and f._host is None


def test_steady_state_program_has_zero_collectives(feed):
    len(feed)  # ensure the lazy fill ran even under selective test runs
    idx = np.zeros((BS,), np.int32)
    key = np.zeros((2,), np.uint32)
    g_idx = jax.make_array_from_process_local_data(feed._idx_sh, idx)
    text = feed._feed.lower(key, feed.images, feed.labels, g_idx).compile().as_text()
    c = _counts(text)
    assert all(v == 0 for v in c.values()), c


def test_epoch_streams_deterministic(mesh8_module):
    aug = build_val_augment(num_classes=N, out_dtype=jnp.float32)
    f1 = DeviceCacheFeed(IndexLoader(), mesh8_module, aug)
    f2 = DeviceCacheFeed(IndexLoader(), mesh8_module, aug)
    b1 = [np.asarray(b["label"]) for b in f1]
    b2 = [np.asarray(b["label"]) for b in f2]
    for a, b in zip(b1, b2):
        np.testing.assert_array_equal(a, b)
    # and epoch 2 differs from epoch 1 (the permutation is epoch-seeded)
    b1e2 = [np.asarray(b["label"]) for b in f1]
    assert any((a != b).any() for a, b in zip(b1, b1e2))


def test_set_epoch_resume_consistency(mesh8_module):
    """DDP set_epoch contract: a resumed feed fast-forwarded to epoch k
    replays exactly the sample order a continuous run draws at epoch k."""
    aug = build_val_augment(num_classes=N, out_dtype=jnp.float32)
    cont = DeviceCacheFeed(IndexLoader(), mesh8_module, aug)
    for _ in range(3):  # advance a continuous run to its 4th epoch
        list(cont)
    resumed = DeviceCacheFeed(IndexLoader(), mesh8_module, aug)
    resumed.set_epoch(3)
    for a, b in zip(cont, resumed):
        np.testing.assert_array_equal(np.asarray(a["label"]), np.asarray(b["label"]))


def test_composes_with_spatial_mesh():
    """dp4 x sp2 mesh: cache shards over 'data' only; the gathered batch is
    replicated over 'spatial' (the step reshards H internally), and the
    gather program still has zero collectives."""
    from sota_imagenet_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(data=4, spatial=2)
    aug = build_val_augment(num_classes=N, out_dtype=jnp.float32)
    feed = DeviceCacheFeed(IndexLoader(), mesh, aug)
    assert len(feed) == (N // 4) // (BS // 4)  # triggers the lazy fill
    assert feed._n_per_shard == N // 4
    seen = []
    for batch in feed:
        assert batch["image"].shape == (BS, SZ, SZ, 3)
        seen.extend(np.argmax(np.asarray(batch["label"]), axis=-1))
    assert sorted(seen) == list(range(N))
    idx = np.zeros((BS,), np.int32)
    key = np.zeros((2,), np.uint32)
    g_idx = jax.make_array_from_process_local_data(feed._idx_sh, idx)
    text = feed._feed.lower(key, feed.images, feed.labels, g_idx).compile().as_text()
    assert all(v == 0 for v in _counts(text).values()), _counts(text)


def test_fused_step_bit_identical_to_two_dispatch(mesh8_module):
    """fused_step (gather+augment+train step, ONE program) must replay the
    two-dispatch path bit-for-bit — same keys, same permutations, same
    stochastic augment draws."""
    from sota_imagenet_tpu.losses import CrossEntropyLoss
    from sota_imagenet_tpu.models.cmodel import CModel
    from sota_imagenet_tpu.ops.augment import build_train_augment
    from sota_imagenet_tpu.optim import build_optimizer
    from sota_imagenet_tpu.parallel.mesh import replicate
    from sota_imagenet_tpu.train import steps as steps_lib

    model = CModel(
        layer_config=[
            {"module": "conv3x3", "args": [3, 8], "kwargs": {"stride": 2}},
            {"module": "ReLU"},
            {"module": "FastGlobalAvgPool2d", "kwargs": {"flatten": True}},
            {"module": "Linear", "args": [8, N]},
        ]
    )
    crit = CrossEntropyLoss(smoothing=0.1)
    sched = lambda s: jnp.asarray(0.1, jnp.float32)
    tx = build_optimizer({"_target_": "sgd", "momentum": 0.9}, sched)
    inner = steps_lib.build_train_step(model, crit, tx, sched, input_dtype=jnp.float32)
    # stochastic augment: proves the key threading matches, not just the data
    aug = build_train_augment(num_classes=N, out_dtype=jnp.float32, re_prob=0.5, color_twist_prob=0.5)
    rng = jax.random.PRNGKey(1)

    def init():
        s = steps_lib.init_state(model, tx, (BS, SZ, SZ, 3), jax.random.PRNGKey(0), input_dtype=jnp.float32)
        return jax.device_put(s, replicate(mesh8_module))

    step2 = jax.jit(inner)
    sA = init()
    feedA = DeviceCacheFeed(IndexLoader(), mesh8_module, aug)
    for batch in feedA:
        sA, mA = step2(sA, batch, rng)

    feedB = DeviceCacheFeed(IndexLoader(), mesh8_module, aug)
    fused = feedB.fused_step(inner)
    sB = init()
    for key, idx in feedB.iter_stubs():
        sB, mB = fused(sB, key, idx, feedB.images, feedB.labels, rng)

    for a, b in zip(jax.tree_util.tree_leaves(sA.params), jax.tree_util.tree_leaves(sB.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(mA["loss"]), np.asarray(mB["loss"]))


def test_input_cost_fraction(mesh8_module):
    """Fused-mode input attribution (cost model, not host wait): the
    gather+augment share of the one compiled program must be a proper
    fraction — positive (the input is not free) and well below the model's
    own cost for any real trunk."""
    from sota_imagenet_tpu.losses import CrossEntropyLoss
    from sota_imagenet_tpu.models.cmodel import CModel
    from sota_imagenet_tpu.ops.augment import build_train_augment
    from sota_imagenet_tpu.optim import build_optimizer
    from sota_imagenet_tpu.parallel.mesh import replicate
    from sota_imagenet_tpu.train import steps as steps_lib

    model = CModel(
        layer_config=[
            {"module": "conv3x3", "args": [3, 32]},
            {"module": "conv3x3", "args": [32, 32]},
            {"module": "FastGlobalAvgPool2d", "kwargs": {"flatten": True}},
            {"module": "Linear", "args": [32, N]},
        ]
    )
    crit = CrossEntropyLoss(smoothing=0.1)
    sched = lambda s: jnp.asarray(0.1, jnp.float32)
    tx = build_optimizer({"_target_": "sgd", "momentum": 0.9}, sched)
    inner = steps_lib.build_train_step(model, crit, tx, sched, input_dtype=jnp.float32)
    aug = build_train_augment(num_classes=N, out_dtype=jnp.float32)
    feed = DeviceCacheFeed(IndexLoader(), mesh8_module, aug)
    state = jax.device_put(
        steps_lib.init_state(model, tx, (BS, SZ, SZ, 3), jax.random.PRNGKey(0), input_dtype=jnp.float32),
        replicate(mesh8_module),
    )
    frac = feed.input_cost_fraction(inner, state, jax.random.PRNGKey(1))
    assert 0.0 < frac["bytes"] < 0.5, frac
    assert 0.0 < frac["flops"] < 0.5, frac


class IndexValLoader:
    """Masked streaming-val stub: 52 real samples, padded final batch
    (3-tuple convention of the masked loaders, pipeline.py/packed.py)."""

    def __init__(self, n=52, bs=16, size=SZ):
        self.batch_size = bs
        self.n = n
        self.size = size

    def __len__(self):
        return -(-self.n // self.batch_size)

    def __iter__(self):
        for b in range(len(self)):
            lo = b * self.batch_size
            real = min(self.batch_size, self.n - lo)
            idx = np.concatenate([np.arange(lo, lo + real), np.full(self.batch_size - real, lo + real - 1)])
            imgs = np.broadcast_to(idx[:, None, None, None], (self.batch_size, self.size, self.size, 3)).astype(np.uint8).copy()
            labs = np.where(np.arange(self.batch_size) < real, idx, -1).astype(np.int32)
            mask = (np.arange(self.batch_size) < real).astype(np.float32)
            yield imgs, labs, mask


def test_val_cache_exact_coverage_with_ragged_tail(mesh8_module):
    """Exact-val contract: 52 real samples over 8 shards (not divisible) —
    every real sample evaluated exactly once (mask 1), pads masked out,
    every epoch identical."""
    aug = build_val_augment(num_classes=64, out_dtype=jnp.float32)
    feed = DeviceCacheFeed(IndexValLoader(), mesh8_module, aug, is_train=False)
    for _ in range(2):  # val sweeps are identical epoch to epoch
        seen = []
        mask_total = 0.0
        for batch in feed:
            labs = np.argmax(np.asarray(batch["label"]), axis=-1)
            mask = np.asarray(batch["mask"])
            mask_total += mask.sum()
            seen.extend(labs[mask > 0.5])
            # padded rows carry label -1 -> one-hot all zeros -> argmax 0;
            # they must never leak through the mask
            assert set(labs[mask < 0.5]) <= {0}, labs[mask < 0.5]
        assert mask_total == 52.0
        assert sorted(seen) == list(range(52))


def test_train_cache_drops_masked_pad_rows(mesh8_module):
    """A masked 3-tuple host loader feeding a TRAIN cache: the pad rows
    (validity 0, label -1) must be dropped at fill, not cached and trained
    on as all-zero one-hots."""
    aug = build_val_augment(num_classes=64, out_dtype=jnp.float32)
    feed = DeviceCacheFeed(IndexValLoader(), mesh8_module, aug, is_train=True)
    seen = []
    for batch in feed:
        seen.extend(np.argmax(np.asarray(batch["label"]), axis=-1))
    # 52 valid rows // 8 shards = 6/shard -> 48 resident, all REAL samples
    assert len(seen) == 48
    assert set(seen) <= set(range(52))


def _epoch_batches(feed):
    return [{k: np.asarray(v) for k, v in b.items()} for b in feed]


@pytest.mark.parametrize("chunk_kb", [1, 4])  # 1 KB -> many write rounds; 4 KB -> few
def test_chunked_fill_equals_monolithic_train(mesh8_module, chunk_kb):
    """round-4 VERDICT #5: the streamed fill (bounded host RSS, preallocated
    sharded buffer + dynamic_update_slice rounds) must yield batch streams
    IDENTICAL to the monolithic single-transfer fill."""
    aug = build_val_augment(num_classes=N, out_dtype=jnp.float32)
    mono = DeviceCacheFeed(IndexLoader(), mesh8_module, aug, fill_chunk_mb=0)
    # sub-MB chunks against the 24 KB dataset: forces several write rounds
    chunk = DeviceCacheFeed(IndexLoader(), mesh8_module, aug, fill_chunk_mb=chunk_kb / 1024.0)
    assert len(mono) == len(chunk)
    assert mono._n_per_shard == chunk._n_per_shard
    for ep in range(2):
        for a, b in zip(_epoch_batches(mono), _epoch_batches(chunk)):
            np.testing.assert_array_equal(a["image"], b["image"])
            np.testing.assert_array_equal(a["label"], b["label"])


def test_chunked_fill_equals_monolithic_val(mesh8_module):
    """Masked-val equality incl. the ragged tail: same masks, same real rows
    (pads are zero-image/-1-label in both paths)."""
    aug = build_val_augment(num_classes=64, out_dtype=jnp.float32)
    mono = DeviceCacheFeed(IndexValLoader(), mesh8_module, aug, is_train=False, fill_chunk_mb=0)
    # ~1 KB chunks: several rounds + a carried remainder across rounds
    chunk = DeviceCacheFeed(IndexValLoader(), mesh8_module, aug, is_train=False, fill_chunk_mb=1 / 1024.0)
    assert len(mono) == len(chunk)
    for a, b in zip(_epoch_batches(mono), _epoch_batches(chunk)):
        np.testing.assert_array_equal(a["mask"], b["mask"])
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["label"], b["label"])


def test_chunked_fill_drops_masked_pad_rows_train(mesh8_module):
    """The chunked path must apply the same fill-time pad-row filter as the
    monolithic one (52 valid of 64 streamed -> 48 resident)."""
    aug = build_val_augment(num_classes=64, out_dtype=jnp.float32)
    feed = DeviceCacheFeed(IndexValLoader(), mesh8_module, aug, is_train=True, fill_chunk_mb=1 / 1024.0)
    seen = []
    for batch in feed:
        seen.extend(np.argmax(np.asarray(batch["label"]), axis=-1))
    assert len(seen) == 48
    assert set(seen) <= set(range(52))


def test_build_loader_dispatches_to_cache(mesh8_module, tmp_path):
    from sota_imagenet_tpu.config import load
    from sota_imagenet_tpu.data.pipeline import build_loader

    cfg = load(strict_env=False)
    cfg.loader.batch_size = 16
    cfg.loader.image_size = 8
    cfg.loader.num_classes = 10
    cfg.loader.backend = "synthetic"
    cfg.loader.device_cache = True
    feed = build_loader(cfg.loader, mesh8_module, is_train=True, out_dtype=jnp.float32)
    assert isinstance(feed, DeviceCacheFeed)
    batch = next(iter(feed))
    assert batch["image"].shape == (16, 8, 8, 3)
    assert batch["label"].shape == (16, 10)


def test_rectangular_val_cache_rejected(mesh8_module):
    # RectValLoader yields 3 static shapes; a fixed-shape HBM cache can't
    # hold them — the combination must fail loudly at build time, not with a
    # numpy concatenate error mid-fill
    from sota_imagenet_tpu.config import load
    from sota_imagenet_tpu.data.pipeline import build_loader

    cfg = load(strict_env=False)
    cfg.val_loader.backend = "synthetic"
    cfg.val_loader.device_cache = True
    cfg.val_loader.rectangular = True
    with pytest.raises(ValueError, match="rectangular"):
        build_loader(cfg.val_loader, mesh8_module, is_train=False, out_dtype=jnp.float32)


def test_runner_fit_uses_fused_path_identically(mesh8_module):
    """Runner.fit over a train DeviceCacheFeed auto-selects the fused
    one-dispatch program; final params must equal the two-dispatch loop
    bit-for-bit (same epoch seeds, same permutations, same augment draws)."""
    from sota_imagenet_tpu.losses import CrossEntropyLoss
    from sota_imagenet_tpu.models.cmodel import CModel
    from sota_imagenet_tpu.ops.augment import build_train_augment
    from sota_imagenet_tpu.optim import build_optimizer
    from sota_imagenet_tpu.train.loop import Runner

    def make_runner():
        model = CModel(
            layer_config=[
                {"module": "conv3x3", "args": [3, 8], "kwargs": {"stride": 2}},
                {"module": "ReLU"},
                {"module": "FastGlobalAvgPool2d", "kwargs": {"flatten": True}},
                {"module": "Linear", "args": [8, N]},
            ]
        )
        r = Runner(
            model,
            CrossEntropyLoss(smoothing=0.1),
            lambda sched: build_optimizer({"_target_": "sgd", "momentum": 0.9}, sched),
            lr_phases=[{"ep": (0, 1), "lr": (0.1, 0.1), "mode": "linear"}],
            input_dtype=jnp.float32,
            rng=jax.random.PRNGKey(7),
        )
        r.init_state((BS, SZ, SZ, 3), jax.random.PRNGKey(0))
        return r

    def make_feed():
        aug = build_train_augment(num_classes=N, out_dtype=jnp.float32, re_prob=0.5)
        return DeviceCacheFeed(IndexLoader(), mesh8_module, aug)

    class HideFused:
        """Proxy that hides fused_step -> Runner takes the two-dispatch path."""

        def __init__(self, feed):
            self._feed = feed

        def __getattr__(self, k):
            if k == "fused_step":
                raise AttributeError(k)
            return getattr(self._feed, k)

        def __iter__(self):
            return iter(self._feed)

        def __len__(self):
            return len(self._feed)

    rA = make_runner()
    rA.fit(make_feed(), epochs=1)  # fused
    rB = make_runner()
    rB.fit(HideFused(make_feed()), epochs=1)  # two-dispatch
    for a, b in zip(jax.tree_util.tree_leaves(rA.state.params), jax.tree_util.tree_leaves(rB.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert rA.train_metrics["loss"] == rB.train_metrics["loss"]
