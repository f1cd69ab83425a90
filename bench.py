"""Benchmark: ResNet-50 train step throughput (images/sec/chip).

Matches the reference's headline metric (BASELINE.json: "ResNet-50 train
images/sec/chip"). Runs the full jitted train step (fwd+bwd+SGD+BN stats,
bf16, label smoothing) on synthetic device-resident data so it measures the
compute path, not host decode. Prints ONE JSON line.

Baseline for vs_baseline: the reference's 4xV100 run (1.r50_baseline.yaml:5-6)
did 90 epochs * 1.28M images in 10h41.7m => ~2993 img/s total => ~748
img/s/GPU (V100, fp16, bs 256/GPU).

Measurement robustness (round-5 hardening, after BENCH_r04's 45% transient):
the axon tunnel/backend occasionally serves a slow window (PERF.md round-4
postmortem), and a single ~1 s window made that window the round's number of
record. Now: >=3 windows of >=10 s (or >=200 iters) each, report the MEDIAN
with a spread field; if spread > 10% the run warns on stderr and takes up to
3 extra windows (median over all — a transient slow window can no longer
define the result).

Self-describing efficiency fields (PERF.md roofline model, rounds 2-3):
  mfu                    = achieved conv FLOP/s / chip peak bf16 FLOP/s
                           (conv-only FLOPs: 4.09 GFLOP/img fwd x3 passes —
                           conservative, ignores BN/elementwise FLOPs)
  hbm_roofline_fraction  = bandwidth-bound floor time / measured step time
                           (traffic model ~11x conv-activation bytes +
                           optimizer/param traffic ~ 30.4 GB/step @ bs128/224)
The step is HBM-bound: expect mfu ~ 0.16 and hbm_roofline_fraction ~ 0.8 at
the ~2,6xx img/s/chip operating point measured in rounds 1-3.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp

REFERENCE_IMG_PER_SEC_PER_CHIP = 90 * 1_281_167 / (10 * 3600 + 41.7 * 60) / 4  # ≈ 748.6

# roofline model constants (PERF.md "Compute roofline" / "Bandwidth roofline")
CONV_GFLOP_PER_IMG_FWD = 4.09  # r50 @224, fwd only
PEAK_BF16_TFLOPS = 197.0  # this chip class's bf16 MXU peak
HBM_PEAK_GBPS = 819.0  # this chip class's HBM peak
ACT_BYTES_BS128_224 = 2.71e9  # A: conv-output activations, bf16, bs128 @224
ACT_PASSES = 11.0  # fwd ~4A + bwd ~7A passes over activation-sized tensors
PARAM_TRAFFIC_BYTES = 0.6e9  # optimizer/param traffic per step


def median_spread(rates):
    """Median rate and relative spread ((max-min)/median) of a window list."""
    med = statistics.median(rates)
    return (max(rates) - min(rates)) / med, med


def measure(window, imgs_per_iter, *, target_s=10.5, min_iters=20, max_iters=200,
            n_windows=3, max_windows=6, spread_limit=0.10):
    """Multi-window throughput measurement (round-5 hardening, pure logic).

    ``window(iters)`` runs `iters` timed iterations and returns elapsed
    seconds (device-synced). Calibrates the window to >= ``target_s`` (or
    ``max_iters``), takes ``n_windows`` windows, and while the relative
    spread exceeds ``spread_limit`` takes extras up to ``max_windows`` so a
    transient slow window (BENCH_r04's failure mode) cannot define the
    median. Returns ``(median_rate, spread, rates, iters)``.

    Unit-tested with synthetic window functions (tests/test_bench_measure.py)
    — the driver's artifact generator must not be the one untested path.
    """
    est = window(min_iters) / min_iters
    iters = min(max_iters, max(min_iters, int(target_s / est) + 1))
    rates = [imgs_per_iter * iters / window(iters) for _ in range(n_windows)]
    spread, med = median_spread(rates)
    while spread > spread_limit and len(rates) < max_windows:
        print(
            f"bench: window spread {spread:.1%} > {spread_limit:.0%} "
            f"({[round(r, 1) for r in rates]} img/s) — transient tunnel/backend "
            "window suspected, taking another",
            file=sys.stderr,
        )
        rates.append(imgs_per_iter * iters / window(iters))
        spread, med = median_spread(rates)
    return med, spread, rates, iters


def _wait_for_backend(max_wait_s: float = 900.0) -> None:
    """The axon TPU tunnel occasionally reports UNAVAILABLE for minutes at a
    time (observed round 3); retry initialization instead of failing the
    driver's round-end gate on a transient."""
    deadline = time.monotonic() + max_wait_s
    while True:
        try:
            jax.devices()
            return
        except RuntimeError as e:
            if "UNAVAILABLE" not in str(e) or time.monotonic() > deadline:
                raise
            time.sleep(60)
            try:  # jax memoizes the init failure; drop it before retrying
                from jax._src.xla_bridge import _clear_backends

                _clear_backends()
            except Exception:
                pass


def main():
    from sota_imagenet_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    _wait_for_backend()
    from sota_imagenet_tpu.losses import CrossEntropyLoss
    from sota_imagenet_tpu.models import resnet50
    from sota_imagenet_tpu.optim import build_optimizer
    from sota_imagenet_tpu.parallel.mesh import batch_sharding, create_mesh, replicate
    from sota_imagenet_tpu.train import steps as steps_lib
    from sota_imagenet_tpu.train.schedule import make_lr_schedule

    n_chips = jax.device_count()
    mesh = create_mesh()
    per_chip_bs = 128
    bs = per_chip_bs * n_chips
    size = 224

    model = resnet50(dtype=jnp.bfloat16)
    criterion = CrossEntropyLoss(smoothing=0.1)
    sched = make_lr_schedule([dict(ep=(0, 90), lr=(1.0, 0.0), mode="cos")], steps_per_epoch=100)
    tx = build_optimizer({"_target_": "sgd", "momentum": 0.9, "weight_decay": 3e-5}, sched)
    train_step = jax.jit(
        steps_lib.build_train_step(model, criterion, tx, sched, input_dtype=jnp.bfloat16),
        donate_argnums=(0,),
    )

    rng = jax.random.PRNGKey(0)
    state = steps_lib.init_state(model, tx, (bs, size, size, 3), rng, input_dtype=jnp.bfloat16)
    state = jax.device_put(state, replicate(mesh))
    sh = batch_sharding(mesh)
    images = jax.device_put(jax.random.normal(rng, (bs, size, size, 3), jnp.bfloat16), sh)
    labels = jax.device_put(jax.nn.one_hot(jnp.arange(bs) % 1000, 1000, dtype=jnp.float32), sh)
    batch = {"image": images, "label": labels}

    # warmup/compile; device_get forces a real device->host sync (the axon
    # tunnel's block_until_ready can return before execution finishes)
    for _ in range(3):
        state, metrics = train_step(state, batch, rng)
    jax.device_get(metrics["loss"])

    def window(iters):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = train_step(state, batch, rng)
        jax.device_get(metrics["loss"])  # full drain (tunnel-safe sync)
        return time.perf_counter() - t0

    # calibrate to >=10 s (or >=200 iter) windows; median over >=3 windows,
    # extras while spread > 10% (pure logic in measure(), unit-tested)
    med, spread, windows, iters = measure(window, bs)

    img_per_sec_per_chip = med / n_chips
    step_s = per_chip_bs / img_per_sec_per_chip
    mfu = (img_per_sec_per_chip * CONV_GFLOP_PER_IMG_FWD * 3 * 1e9) / (PEAK_BF16_TFLOPS * 1e12)
    act_bytes = ACT_BYTES_BS128_224 * (per_chip_bs / 128) * (size / 224) ** 2
    hbm_floor_s = (ACT_PASSES * act_bytes + PARAM_TRAFFIC_BYTES) / (HBM_PEAK_GBPS * 1e9)
    print(
        json.dumps(
            {
                "metric": "resnet50_train_images_per_sec_per_chip",
                "value": round(img_per_sec_per_chip, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(img_per_sec_per_chip / REFERENCE_IMG_PER_SEC_PER_CHIP, 3),
                "spread": round(spread, 4),
                "windows_img_per_sec_per_chip": [round(w / n_chips, 1) for w in windows],
                "iters_per_window": iters,
                "mfu": round(mfu, 4),
                "hbm_roofline_fraction": round(hbm_floor_s / step_s, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
