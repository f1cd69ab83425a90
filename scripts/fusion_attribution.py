#!/usr/bin/env python
"""Per-fusion HBM attribution for the ResNet-50 train step (round-2 VERDICT
#6): closes the gap between the PERF.md traffic model (37.2 ms) and the
measured step by TABLING each compiled fusion's achieved bandwidth.

Method: capture a jax.profiler trace of N steps; the device plane's "XLA Ops"
line carries one event per HLO instruction whose metadata name is the full
HLO line — output AND operand shapes included — so memory traffic per op is
parsed straight from the event name (output bytes + operand bytes), and
achieved GB/s = traffic / measured duration.

    python scripts/fusion_attribution.py [--steps 8] [--top 25]
    python scripts/fusion_attribution.py --logdir /tmp/trace --parse-only
"""

import argparse
import glob
import os
import re
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_PEAK_GBPS = 819.0  # this chip class (PERF.md)

DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

_SHAPE_RE = re.compile(r"\b(pred|s8|u8|s16|u16|bf16|f16|s32|u32|f32|s64|u64|f64)\[([\d,]*)\]")


def hlo_line_bytes(hlo_line: str) -> int:
    """Sum of every shape mentioned in one HLO instruction line = output
    bytes + operand bytes (fused computations' internals never touch HBM).
    S(1) scratch annotations ride inside layout braces and aren't counted."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(hlo_line):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def parse_xplane(logdir: str, steps: int):
    """[(total_ms_per_step, name, category, bytes, source)] from the device
    plane's XLA Ops line, aggregated over identical ops across steps."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {logdir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())
    rows = {}
    durations = defaultdict(int)
    for plane in space.planes:
        if not plane.name.startswith("/device:"):
            continue
        stat_names = {sid: s.name for sid, s in plane.stat_metadata.items()}
        metas = {mid: m for mid, m in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                m = metas[ev.metadata_id]
                durations[m.id] += ev.duration_ps
                if m.id not in rows:
                    cat = src = ""
                    for s in m.stats:
                        nm = stat_names.get(s.metadata_id)
                        if nm == "hlo_category":
                            cat = s.str_value
                        elif nm == "source":
                            src = s.str_value
                    rows[m.id] = (m.display_name or m.name.split(" = ")[0].lstrip("%"), cat, hlo_line_bytes(m.name), src)
    out = []
    for mid, ps in durations.items():
        name, cat, nbytes, src = rows[mid]
        out.append((ps / 1e9 / steps, name, cat, nbytes, src))
    out.sort(reverse=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--model", default="resnet50")
    ap.add_argument("--logdir", default=None)
    ap.add_argument("--parse-only", action="store_true", help="parse an existing --logdir trace, no TPU run")
    ap.add_argument("--hlo-out", default=None, help="also dump the optimized HLO text here")
    args = ap.parse_args()

    logdir = args.logdir or tempfile.mkdtemp(prefix="fusion_attr_")
    if not args.parse_only:
        import jax
        import jax.numpy as jnp

        from sota_imagenet_tpu.utils.misc import enable_compilation_cache

        enable_compilation_cache()
        from sota_imagenet_tpu.config import instantiate
        from sota_imagenet_tpu.losses import CrossEntropyLoss
        from sota_imagenet_tpu.optim import build_optimizer
        from sota_imagenet_tpu.train import steps as steps_lib

        model = instantiate({"_target_": args.model, "dtype": jnp.bfloat16})
        crit = CrossEntropyLoss(smoothing=0.1)
        sched = lambda s: jnp.asarray(0.1, jnp.float32)
        tx = build_optimizer({"_target_": "sgd", "momentum": 0.9, "weight_decay": 3e-5}, sched)
        step = jax.jit(
            steps_lib.build_train_step(model, crit, tx, sched, input_dtype=jnp.bfloat16), donate_argnums=(0,)
        )
        rng = jax.random.PRNGKey(0)
        state = steps_lib.init_state(model, tx, (args.bs, args.size, args.size, 3), rng, input_dtype=jnp.bfloat16)
        batch = {
            "image": jax.random.normal(rng, (args.bs, args.size, args.size, 3), jnp.bfloat16),
            "label": jax.nn.one_hot(jnp.arange(args.bs) % 1000, 1000, dtype=jnp.float32),
        }
        if args.hlo_out:
            with open(args.hlo_out, "w") as f:
                f.write(step.lower(state, batch, rng).compile().as_text())
        for _ in range(3):
            state, m = step(state, batch, rng)
        jax.device_get(m["loss"])
        with jax.profiler.trace(logdir):
            for _ in range(args.steps):
                state, m = step(state, batch, rng)
            jax.device_get(m["loss"])

    rows = parse_xplane(logdir, args.steps)
    step_ms = sum(r[0] for r in rows)
    by_cat = defaultdict(lambda: [0.0, 0.0])
    for ms, _n, cat, nbytes, _s in rows:
        by_cat[cat][0] += ms
        by_cat[cat][1] += nbytes / 1e9

    print(f"\ndevice busy total: {step_ms:.2f} ms/step (sum of XLA op durations over {args.steps} steps)")
    print("\n-- by category --")
    for cat, (ms, gb) in sorted(by_cat.items(), key=lambda kv: -kv[1][0]):
        gbps = gb / (ms / 1e3) if ms else 0.0
        print(f"{cat or '?':<28} {ms:8.2f} ms {gb:8.2f} GB {gbps:6.0f} GB/s ({100*gbps/HBM_PEAK_GBPS:3.0f}% peak) {100*ms/step_ms:5.1f}%")

    print(f"\n-- top {args.top} ops --")
    print(f"{'op':<34} {'category':<18} {'ms/step':>8} {'MB':>8} {'GB/s':>6} {'%peak':>6}  source")
    for ms, name, cat, nbytes, src in rows[: args.top]:
        gbps = nbytes / 1e9 / (ms / 1e3) if ms > 0 else 0.0
        src_short = src.split("/")[-1] if src else ""
        print(
            f"{name[:32]:<34} {cat[:17]:<18} {ms:8.3f} {nbytes/1e6:8.1f} {gbps:6.0f} {100*gbps/HBM_PEAK_GBPS:5.0f}%  {src_short}"
        )
    shown = rows[: args.top]
    sms = sum(r[0] for r in shown)
    sgb = sum(r[3] for r in shown) / 1e9
    print(
        f"\ntop {args.top}: {sms:.2f} ms, {sgb:.2f} GB -> {sgb/(sms/1e3):.0f} GB/s "
        f"({100*sgb/(sms/1e3)/HBM_PEAK_GBPS:.0f}% of peak); "
        f"all ops: {sum(r[3] for r in rows)/1e9:.2f} GB / {step_ms:.2f} ms = "
        f"{sum(r[3] for r in rows)/1e9/(step_ms/1e3):.0f} GB/s"
    )


if __name__ == "__main__":
    main()
