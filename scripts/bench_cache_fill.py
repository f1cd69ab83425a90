"""Device-cache fill benchmark: peak host RSS + throughput, chunked vs
monolithic (round-4 VERDICT #5).

The monolithic fill holds 2-3x the process's whole data shard in host RAM
(batch list + concatenate + interleave copies) and ships it as ONE opaque
transfer; the chunked default streams bounded slices into a preallocated
sharded buffer, so transient host overhead is ~one chunk. This script
measures both at a multi-GB fill on the 8-virtual-device CPU mesh, where
"device" memory IS process RAM — so peak RSS cleanly decomposes into
baseline + resident cache + fill overhead, and the overhead is the number
under test (expect ~data-size-x2+ for monolithic, ~chunk-size for chunked).

The dataset is generated procedurally per batch (no host-side dataset copy)
at 224x224x3 uint8, the ImageNet-scale row size.

Usage: python scripts/bench_cache_fill.py [--gb 2.0] [--chunk-mb 256]
Prints one JSON line per mode plus a summary line.
Equality chunked==monolithic is covered by tests/test_device_cache.py; this
script only measures cost.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ROW = (224, 224, 3)
ROW_BYTES = 224 * 224 * 3
BS = 256


class SyntheticLoader:
    """Procedural uint8 batches — near-zero host RSS for the source data."""

    def __init__(self, n_rows: int):
        self.batch_size = BS
        self.n = n_rows // BS * BS

    def __len__(self):
        return self.n // BS

    def __iter__(self):
        import numpy as np

        for b in range(len(self)):
            idx = np.arange(b * BS, (b + 1) * BS, dtype=np.int64)
            imgs = np.empty((BS,) + ROW, np.uint8)
            imgs[:] = (idx % 251)[:, None, None, None].astype(np.uint8)
            yield imgs, idx.astype(np.int32)


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def child(mode: str, gb: float, chunk_mb: int) -> None:
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")  # axon plugin ignores the env var
    import jax.numpy as jnp

    from sota_imagenet_tpu.data.device_cache import DeviceCacheFeed
    from sota_imagenet_tpu.ops.augment import build_val_augment
    from sota_imagenet_tpu.parallel.mesh import create_mesh

    n_rows = int(gb * 1e9 / ROW_BYTES)
    mesh = create_mesh()
    aug = build_val_augment(num_classes=1000, out_dtype=jnp.bfloat16)
    feed = DeviceCacheFeed(
        SyntheticLoader(n_rows),
        mesh,
        aug,
        fill_chunk_mb=(chunk_mb if mode == "chunked" else 0),
    )
    # warm jax/mesh before the baseline reading so it isn't billed as overhead
    jax.block_until_ready(jnp.zeros((8, 128)))
    baseline = _rss_mb()
    t0 = time.perf_counter()
    steps = len(feed)  # triggers the fill
    fill_s = time.perf_counter() - t0
    cache_mb = feed.images.nbytes / 1e6
    peak = _rss_mb()
    print(
        json.dumps(
            {
                "mode": mode,
                "fill_gb": round(n_rows * ROW_BYTES / 1e9, 2),
                "rows": feed._n_per_shard * mesh.shape["data"],
                "steps_per_epoch": steps,
                "baseline_rss_mb": round(baseline, 1),
                "peak_rss_mb": round(peak, 1),
                "cache_mb": round(cache_mb, 1),
                "fill_overhead_mb": round(peak - baseline - cache_mb, 1),
                "fill_s": round(fill_s, 1),
                "mb_per_s": round(n_rows * ROW_BYTES / 1e6 / fill_s, 1),
            }
        ),
        flush=True,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gb", type=float, default=2.0)
    ap.add_argument("--chunk-mb", type=int, default=256)
    ap.add_argument("--mode", choices=("chunked", "monolithic"), default=None, help="internal: child mode")
    ap.add_argument("--skip-monolithic", action="store_true", help="chunked only (low-RAM hosts)")
    args = ap.parse_args()
    if args.mode:
        child(args.mode, args.gb, args.chunk_mb)
        return
    results = {}
    modes = ["chunked"] + ([] if args.skip_monolithic else ["monolithic"])
    for mode in modes:  # one subprocess each: ru_maxrss is a process high-water mark
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--mode", mode, f"--gb={args.gb}", f"--chunk-mb={args.chunk_mb}"],
            capture_output=True,
            text=True,
            cwd=ROOT,
            timeout=3600,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if out.returncode or not line:
            print(out.stdout[-2000:] + out.stderr[-2000:], file=sys.stderr)
            sys.exit(1)
        print(line[-1], flush=True)
        results[mode] = json.loads(line[-1])
    if len(results) == 2:
        c, m = results["chunked"], results["monolithic"]
        print(
            json.dumps(
                {
                    "summary": "fill_overhead_mb chunked vs monolithic",
                    "chunked_overhead_mb": c["fill_overhead_mb"],
                    "monolithic_overhead_mb": m["fill_overhead_mb"],
                    "overhead_ratio": round(m["fill_overhead_mb"] / max(c["fill_overhead_mb"], 1.0), 1),
                    "chunk_mb": args.chunk_mb,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
