"""True multi-process data-parallel smoke: two JAX processes rendezvous via
jax.distributed (the reference's NCCL env:// init, train.py:58-61), build one
global mesh over 2x4 virtual CPU devices, and run sharded train steps. Each
process feeds only its local half of the global batch
(make_array_from_process_local_data), like per-rank DALI shards."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow  # heavy tier: excluded from `make test-fast`

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=sys.argv[1], num_processes=2, process_id=int(sys.argv[2])
    )
    import jax.numpy as jnp
    import numpy as np
    from sota_imagenet_tpu.losses import CrossEntropyLoss
    from sota_imagenet_tpu.models.cmodel import CModel
    from sota_imagenet_tpu.optim import build_optimizer
    from sota_imagenet_tpu.parallel.mesh import batch_sharding, create_mesh, replicate
    from sota_imagenet_tpu.train import steps as steps_lib

    assert jax.device_count() == 8 and jax.local_device_count() == 4
    mesh = create_mesh()
    model = CModel(layer_config=[
        {"module": "conv3x3", "args": [3, 8], "kwargs": {"stride": 2}},
        {"module": "BatchNorm2d", "args": [8]},
        {"module": "ReLU"},
        {"module": "FastGlobalAvgPool2d", "kwargs": {"flatten": True}},
        {"module": "Linear", "args": [8, 10]},
    ])
    crit = CrossEntropyLoss(smoothing=0.1)
    sched = lambda s: jnp.asarray(0.1, jnp.float32)
    tx = build_optimizer({"_target_": "sgd", "momentum": 0.9}, sched)
    rng = jax.random.PRNGKey(0)
    state = steps_lib.init_state(model, tx, (2, 16, 16, 3), rng, input_dtype=jnp.float32)
    state = jax.device_put(state, replicate(mesh))
    step = jax.jit(steps_lib.build_train_step(model, crit, tx, sched, input_dtype=jnp.float32),
                   donate_argnums=(0,))

    pid = jax.process_index()
    # global batch 16: each process holds its local half (8 samples)
    local = np.random.default_rng(100 + pid).normal(size=(8, 16, 16, 3)).astype(np.float32)
    local_labels = np.eye(10, dtype=np.float32)[np.arange(8) % 10]
    sh = batch_sharding(mesh)
    batch = {
        "image": jax.make_array_from_process_local_data(sh, local),
        "label": jax.make_array_from_process_local_data(sh, local_labels),
    }
    with mesh:
        for _ in range(3):
            state, m = step(state, batch, rng)
    loss = float(jax.device_get(m["loss"]))
    acc = float(jax.device_get(m["Acc@1"]))
    print(f"RESULT pid={pid} loss={loss:.6f} acc={acc:.4f}", flush=True)
    """
)


CKPT_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=sys.argv[1], num_processes=2, process_id=int(sys.argv[2])
    )
    ckpt_dir = sys.argv[3]
    import jax.numpy as jnp
    import numpy as np
    from sota_imagenet_tpu.losses import CrossEntropyLoss
    from sota_imagenet_tpu.models.cmodel import CModel
    from sota_imagenet_tpu.optim import build_optimizer
    from sota_imagenet_tpu.parallel.mesh import batch_sharding, create_mesh, replicate
    from sota_imagenet_tpu.train import steps as steps_lib
    from sota_imagenet_tpu.train.checkpoint import finalize_checkpoints, load_checkpoint, save_checkpoint

    mesh = create_mesh()
    model = CModel(layer_config=[
        {"module": "conv3x3", "args": [3, 8], "kwargs": {"stride": 2}},
        {"module": "BatchNorm2d", "args": [8]},
        {"module": "ReLU"},
        {"module": "FastGlobalAvgPool2d", "kwargs": {"flatten": True}},
        {"module": "Linear", "args": [8, 10]},
    ])
    crit = CrossEntropyLoss(smoothing=0.1)
    sched = lambda s: jnp.asarray(0.1, jnp.float32)
    tx = build_optimizer({"_target_": "sgd", "momentum": 0.9}, sched)
    rng = jax.random.PRNGKey(0)
    state = steps_lib.init_state(model, tx, (2, 16, 16, 3), rng, input_dtype=jnp.float32)
    state = jax.device_put(state, replicate(mesh))
    step = jax.jit(steps_lib.build_train_step(model, crit, tx, sched, input_dtype=jnp.float32))

    pid = jax.process_index()
    local = np.random.default_rng(100 + pid).normal(size=(8, 16, 16, 3)).astype(np.float32)
    local_labels = np.eye(10, dtype=np.float32)[np.arange(8) % 10]
    sh = batch_sharding(mesh)
    batch = {
        "image": jax.make_array_from_process_local_data(sh, local),
        "label": jax.make_array_from_process_local_data(sh, local_labels),
    }
    with mesh:
        for _ in range(2):
            state, m = step(state, batch, rng)
    # EVERY process calls save (collective); async + deferred-commit, then a
    # second save exercises the finalize-before-next-save path
    save_checkpoint(ckpt_dir, state, epoch=1, name="model.ckpt")
    with mesh:
        state, m = step(state, batch, rng)
    save_checkpoint(ckpt_dir, state, epoch=2, name="model.ckpt")
    finalize_checkpoints()
    assert os.path.isdir(os.path.join(ckpt_dir, "model.ckpt")), os.listdir(ckpt_dir)
    leftovers = [f for f in os.listdir(ckpt_dir) if ".new-" in f or f.endswith(".stale")]
    assert not leftovers, leftovers
    # resume into a FRESH replicated template on both processes
    fresh = steps_lib.init_state(model, tx, (2, 16, 16, 3), jax.random.PRNGKey(9), input_dtype=jnp.float32)
    fresh = jax.device_put(fresh, replicate(mesh))
    restored, epoch = load_checkpoint(os.path.join(ckpt_dir, "model.ckpt"), fresh)
    assert epoch == 2, epoch
    for a, b in zip(jax.tree_util.tree_leaves(restored.params), jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(jax.device_get(b)), rtol=1e-6)
    print(f"CKPT_OK pid={pid} step={int(jax.device_get(restored.step))}", flush=True)
    """
)


RECT_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=sys.argv[1], num_processes=2, process_id=int(sys.argv[2])
    )
    data_root = sys.argv[3]
    import jax.numpy as jnp
    import numpy as np
    from sota_imagenet_tpu.data.pipeline import DeviceFeed, RectValLoader
    from sota_imagenet_tpu.losses import CrossEntropyLoss
    from sota_imagenet_tpu.models.cmodel import CModel
    from sota_imagenet_tpu.ops.augment import build_val_augment
    from sota_imagenet_tpu.parallel.mesh import create_mesh, replicate
    from sota_imagenet_tpu.optim import build_optimizer
    from sota_imagenet_tpu.train import steps as steps_lib

    mesh = create_mesh()
    model = CModel(layer_config=[
        {"module": "conv3x3", "args": [3, 8], "kwargs": {"stride": 2}},
        {"module": "FastGlobalAvgPool2d", "kwargs": {"flatten": True}},
        {"module": "Linear", "args": [8, 2]},
    ])
    crit = CrossEntropyLoss(smoothing=0.1)
    tx = build_optimizer({"_target_": "sgd"}, lambda s: jnp.asarray(0.1, jnp.float32))
    state = steps_lib.init_state(model, tx, (2, 32, 32, 3), jax.random.PRNGKey(0), input_dtype=jnp.float32)
    state = jax.device_put(state, replicate(mesh))
    eval_step = jax.jit(steps_lib.build_eval_step(model, crit, input_dtype=jnp.float32))

    # per-process batch 4 -> global 8 over the 2x4-device mesh; buckets and
    # batch counts must be identical across processes or the collective
    # assembly hangs/mismatches (the multi-host rect-val invariant)
    host = RectValLoader(data_root, batch_size=4, image_size=32, workers=2)
    feed = DeviceFeed(host, mesh, build_val_augment(num_classes=2, out_dtype=jnp.float32))
    total_w = 0.0
    acc_w = 0.0
    with mesh:
        for batch in feed:
            m = eval_step(state, batch)
            w = float(jax.device_get(m["_weight"]))
            total_w += w
            acc_w += float(jax.device_get(m["Acc@1"])) * w
    acc = acc_w / max(total_w, 1.0)
    print(f"RECT_OK pid={jax.process_index()} total={total_w:.0f} acc={acc:.6f}", flush=True)
    """
)


CACHE_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=sys.argv[1], num_processes=2, process_id=int(sys.argv[2])
    )
    import jax.numpy as jnp
    import numpy as np
    from sota_imagenet_tpu.data.device_cache import DeviceCacheFeed
    from sota_imagenet_tpu.ops.augment import build_val_augment
    from sota_imagenet_tpu.parallel.mesh import create_mesh

    pid = jax.process_index()
    mesh = create_mesh()  # data=8 over 2 procs x 4 devices

    class LocalLoader:  # this process's 32 samples: labels pid*32..pid*32+31
        batch_size = 8
        def __iter__(self):
            for b in range(4):
                lab = pid * 32 + np.arange(b * 8, (b + 1) * 8)
                img = np.broadcast_to(lab[:, None, None, None] * 4, (8, 8, 8, 3)).astype(np.uint8).copy()
                yield img, lab.astype(np.int32)
        def __len__(self):
            return 4

    feed = DeviceCacheFeed(LocalLoader(), mesh, build_val_augment(num_classes=64, out_dtype=jnp.float32))
    assert feed.batch_size == 16 and len(feed) == 4 and feed._n_per_shard == 8, (
        feed.batch_size, feed._n_per_shard, len(feed))
    # one epoch: every label this process's 4 global shards hold, exactly once
    per_shard = {}
    with mesh:
        for batch in feed:
            for shard in batch["label"].addressable_shards:
                d = shard.index[0].start // 2  # global device position (bs_local=2)
                per_shard.setdefault(d, []).extend(np.argmax(np.asarray(shard.data), -1))
    first = pid * 4
    seen = []
    for d in sorted(per_shard):
        # round-5 fill layout (chunked == monolithic): local stream row i
        # lives on local shard i % shards_here at position i // shards_here
        # (device_cache.py "Shard routing"), so shard j holds rows j, j+4, ...
        resident = [pid * 32 + i for i in range(d - first, 32, 4)]
        assert sorted(per_shard[d]) == resident, (d, sorted(per_shard[d]), resident)
        seen.extend(per_shard[d])
    # and the epoch covers this process's whole half exactly once
    assert sorted(seen) == list(range(pid * 32, pid * 32 + 32)), sorted(seen)
    print(f"CACHE_OK pid={pid} shards={sorted(per_shard)}", flush=True)
    """
)


CACHE_UNEVEN_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=sys.argv[1], num_processes=2, process_id=int(sys.argv[2])
    )
    import jax.numpy as jnp
    import numpy as np
    from sota_imagenet_tpu.data.device_cache import DeviceCacheFeed
    from sota_imagenet_tpu.ops.augment import build_val_augment
    from sota_imagenet_tpu.parallel.mesh import create_mesh

    pid = jax.process_index()
    mesh = create_mesh()  # data=8 over 2 procs x 4 devices

    # ---- val with UNEVEN real counts (20 vs 13): pad to global max ----
    class ValLoader:  # masked streaming-val convention (3-tuples)
        batch_size = 8
        n = 20 if pid == 0 else 13
        base = pid * 30
        def __len__(self):
            return -(-self.n // self.batch_size)
        def __iter__(self):
            for b in range(len(self)):
                lo = b * 8
                real = min(8, self.n - lo)
                lab = np.where(np.arange(8) < real, self.base + lo + np.arange(8), -1).astype(np.int32)
                img = np.broadcast_to(np.maximum(lab, 0)[:, None, None, None] * 2, (8, 8, 8, 3)).astype(np.uint8).copy()
                yield img, lab, (np.arange(8) < real).astype(np.float32)

    feed = DeviceCacheFeed(ValLoader(), mesh, build_val_augment(num_classes=64, out_dtype=jnp.float32), is_train=False)
    # pid0 quota: ceil(ceil(20/4)/2)*2 = 6; pid1: 4 -> harmonized max = 6
    assert len(feed) == 3 and feed._n_per_shard == 6, (feed._n_per_shard, len(feed))
    seen, mask_total = [], 0.0
    with mesh:
        for batch in feed:
            for lab_sh, m_sh in zip(batch["label"].addressable_shards, batch["mask"].addressable_shards):
                lab = np.argmax(np.asarray(lab_sh.data), -1)
                m = np.asarray(m_sh.data)
                mask_total += m.sum()
                seen.extend(lab[m > 0.5])
    expect = list(range(pid * 30, pid * 30 + (20 if pid == 0 else 13)))
    assert sorted(seen) == expect, (sorted(seen), expect)
    n_here = 20 if pid == 0 else 13
    assert mask_total == float(n_here), mask_total

    # ---- train with UNEVEN local counts (36 vs 32): trim to global min ----
    class TrainLoader:
        batch_size = 8
        n = 36 if pid == 0 else 32
        def __iter__(self):
            lab = pid * 64 + np.arange(self.n)
            for lo in range(0, self.n, 8):
                l = lab[lo : lo + 8]
                img = np.broadcast_to(l[:, None, None, None], (len(l), 8, 8, 3)).astype(np.uint8).copy()
                yield img, l.astype(np.int32)
        def __len__(self):
            return -(-self.n // 8)

    tfeed = DeviceCacheFeed(TrainLoader(), mesh, build_val_augment(num_classes=128, out_dtype=jnp.float32), is_train=True)
    assert len(tfeed) == 4 and tfeed._n_per_shard == 8, (tfeed._n_per_shard, len(tfeed))
    tseen = []
    with mesh:
        for batch in tfeed:
            for lab_sh in batch["label"].addressable_shards:
                tseen.extend(np.argmax(np.asarray(lab_sh.data), -1))
    # pid0's 36 rows trimmed to the first 32; every resident exactly once
    assert sorted(tseen) == list(range(pid * 64, pid * 64 + 32)), sorted(tseen)

    # ---- val where one process holds ZERO real samples (its host loader
    # yields only fully-masked pad batches): pads must zero-fill, local
    # shapes must still harmonize, coverage = the other process's samples ----
    class EmptyValLoader:
        batch_size = 8
        def __len__(self):
            return 1
        def __iter__(self):
            yield (np.zeros((8, 8, 8, 3), np.uint8), np.full(8, -1, np.int32), np.zeros(8, np.float32))

    zfeed = DeviceCacheFeed(
        ValLoader() if pid == 0 else EmptyValLoader(),
        mesh, build_val_augment(num_classes=64, out_dtype=jnp.float32), is_train=False,
    )
    assert len(zfeed) == 3 and zfeed._n_per_shard == 6, (zfeed._n_per_shard, len(zfeed))
    zseen, zmask = [], 0.0
    with mesh:
        for batch in zfeed:
            for lab_sh, m_sh in zip(batch["label"].addressable_shards, batch["mask"].addressable_shards):
                lab = np.argmax(np.asarray(lab_sh.data), -1)
                m = np.asarray(m_sh.data)
                zmask += m.sum()
                zseen.extend(lab[m > 0.5])
    if pid == 0:
        assert sorted(zseen) == list(range(0, 20)) and zmask == 20.0, (sorted(zseen), zmask)
    else:
        assert zseen == [] and zmask == 0.0, (zseen, zmask)
    print(f"UNEVEN_OK pid={pid}", flush=True)
    """
)


def _run_two_procs(tmp_path, worker_src, extra_args=()):
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{s.getsockname()[1]}"
    s.close()
    script = tmp_path / "worker.py"
    script.write_text(worker_src)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if not k.startswith("XLA_")}
    env["PYTHONPATH"] = repo
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(pid), *extra_args],
            env=env, cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=560)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    return outs


def test_two_process_data_parallel(tmp_path):
    outs = _run_two_procs(tmp_path, WORKER)
    results = [l for o in outs for l in o.splitlines() if l.startswith("RESULT")]
    assert len(results) == 2, outs
    # both processes observe the SAME global loss (grad all-reduce worked)
    losses = sorted(float(r.split("loss=")[1].split()[0]) for r in results)
    assert abs(losses[0] - losses[1]) < 1e-6, results


def test_two_process_device_cache(tmp_path):
    """Each process fills the HBM cache with ITS local dataset half; one
    epoch covers every globally-sharded resident sample exactly once (the
    per-shard permutation is seeded by GLOBAL shard id, so it is
    process-layout independent)."""
    outs = _run_two_procs(tmp_path, CACHE_WORKER)
    oks = [l for o in outs for l in o.splitlines() if l.startswith("CACHE_OK")]
    assert len(oks) == 2, outs


def test_two_process_device_cache_uneven_counts(tmp_path):
    """Per-process sample counts that disagree (the norm for val, possible
    for folder train splits) must harmonize, not hang or fail: train trims
    to the global min (drop-last analog), val pads to the global max with
    masked pads (exactness preserved)."""
    outs = _run_two_procs(tmp_path, CACHE_UNEVEN_WORKER)
    oks = [l for o in outs for l in o.splitlines() if l.startswith("UNEVEN_OK")]
    assert len(oks) == 2, outs


def test_two_process_rect_validation(tmp_path):
    """Rectangular validation across 2 processes: globally-consistent bucket
    batch counts (no hang), every image counted exactly once in the global
    weighted metrics, and both processes agree on the result."""
    import numpy as np
    from PIL import Image

    root = tmp_path / "rect_val"
    rng = np.random.default_rng(0)
    shapes = [(60, 100), (100, 60), (64, 64), (90, 70), (50, 120), (80, 80), (120, 50)] * 3
    for c in range(2):
        os.makedirs(root / f"class_{c}", exist_ok=True)
    for i, (h, w) in enumerate(shapes):
        arr = rng.integers(0, 256, (h, w, 3), np.uint8)
        Image.fromarray(arr).save(root / f"class_{i % 2}" / f"{i:03d}.jpg", quality=95)

    outs = _run_two_procs(tmp_path, RECT_WORKER, extra_args=(str(root),))
    oks = [l for o in outs for l in o.splitlines() if l.startswith("RECT_OK")]
    assert len(oks) == 2, outs
    totals = [float(l.split("total=")[1].split()[0]) for l in oks]
    accs = [float(l.split("acc=")[1]) for l in oks]
    # metrics are global under jit: both processes see every image once
    assert totals[0] == totals[1] == len(shapes), oks
    assert abs(accs[0] - accs[1]) < 1e-6, oks


def test_two_process_checkpoint_resume(tmp_path):
    """Collective orbax save from 2 processes + committed layout + restore
    (VERDICT r1 #7: multi-host checkpoint correctness)."""
    ckpt_dir = tmp_path / "ckpts"
    ckpt_dir.mkdir()
    outs = _run_two_procs(tmp_path, CKPT_WORKER, extra_args=(str(ckpt_dir),))
    oks = [l for o in outs for l in o.splitlines() if l.startswith("CKPT_OK")]
    assert len(oks) == 2, outs
    assert all("step=3" in l for l in oks), oks
