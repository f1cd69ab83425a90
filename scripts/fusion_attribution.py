#!/usr/bin/env python
"""Per-fusion HBM attribution for the ResNet-50 train step (round-2 VERDICT
#6): closes the gap between the PERF.md traffic model (37.2 ms) and the
measured step by TABLING each compiled fusion's achieved bandwidth.

Method:
  1. compile the step for TPU and keep the optimized HLO text;
  2. capture a jax.profiler trace of N steps and parse the device plane of
     the .xplane.pb directly (tensorflow.tsl xplane proto) — total duration
     per HLO instruction name;
  3. from the HLO text, compute each instruction's memory traffic = output
     bytes + operand bytes (parameter shapes resolved by name);
  4. emit the top-K fusions with ms/step, GB moved, achieved GB/s, and % of
     HBM peak.

    python scripts/fusion_attribution.py [--steps 8] [--top 25]
"""

import argparse
import glob
import gzip
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

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(type_str: str) -> int:
    """Bytes of one HLO type string, incl. tuples: '(bf16[8,4]{...}, f32[4])'."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(type_str):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def parse_hlo(hlo_text: str):
    """name -> (output_bytes, [operand names], one-line def). Only the entry
    computation's instructions matter for fusion-level attribution; fused
    computations' internals never touch HBM."""
    insts = {}
    for line in hlo_text.splitlines():
        line = line.strip()
        m = re.match(r"(?:ROOT )?%?([\w.\-]+) = ((?:\([^)]*\)|[\w\[\]{},:#\d\sETSD()]+?)) (\w+)\((.*)", line)
        if not m:
            continue
        name, type_str, op, rest = m.groups()
        # operand names: %foo or bare identifiers before the first ')', skipping literals
        args = rest.split(")")[0]
        operands = re.findall(r"%?([\w.\-]+)", args)
        insts[name] = (shape_bytes(type_str), op, operands, line[:160])
    return insts


def traffic_of(name: str, insts) -> int:
    if name not in insts:
        return 0
    out_bytes, _op, operands, _ = insts[name]
    total = out_bytes
    for o in operands:
        if o in insts:
            total += insts[o][0]
    return total


def parse_xplane(logdir: str):
    """instruction name -> total device duration in ps, from every TPU/device
    plane of the newest xplane.pb under logdir."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {logdir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())
    durations = defaultdict(int)
    for plane in space.planes:
        pname = plane.name.lower()
        if not ("tpu" in pname or "device" in pname or "accelerator" in pname):
            continue
        if "step" in pname or "host" in pname:
            continue
        metas = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            for ev in line.events:
                nm = metas.get(ev.metadata_id, "")
                if nm:
                    durations[nm] += ev.duration_ps
    return durations, [p.name for p in space.planes]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--model", default="resnet50")
    ap.add_argument("--logdir", default=None)
    ap.add_argument("--hlo-out", default=None, help="also dump the optimized HLO text here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sota_imagenet_tpu.config import instantiate
    from sota_imagenet_tpu.losses import CrossEntropyLoss
    from sota_imagenet_tpu.optim import build_optimizer
    from sota_imagenet_tpu.train import steps as steps_lib

    model = instantiate({"_target_": args.model, "dtype": jnp.bfloat16})
    crit = CrossEntropyLoss(smoothing=0.1)
    sched = lambda s: jnp.asarray(0.1, jnp.float32)
    tx = build_optimizer({"_target_": "sgd", "momentum": 0.9, "weight_decay": 3e-5}, sched)
    step = jax.jit(steps_lib.build_train_step(model, crit, tx, sched, input_dtype=jnp.bfloat16), donate_argnums=(0,))
    rng = jax.random.PRNGKey(0)
    state = steps_lib.init_state(model, tx, (args.bs, args.size, args.size, 3), rng, input_dtype=jnp.bfloat16)
    batch = {
        "image": jax.random.normal(rng, (args.bs, args.size, args.size, 3), jnp.bfloat16),
        "label": jax.nn.one_hot(jnp.arange(args.bs) % 1000, 1000, dtype=jnp.float32),
    }

    lowered = step.lower(state, batch, rng)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    if args.hlo_out:
        with open(args.hlo_out, "w") as f:
            f.write(hlo)
    insts = parse_hlo(hlo)
    print(f"parsed {len(insts)} HLO instructions", file=sys.stderr)

    for _ in range(3):
        state, m = step(state, batch, rng)
    jax.device_get(m["loss"])
    logdir = args.logdir or tempfile.mkdtemp(prefix="fusion_attr_")
    with jax.profiler.trace(logdir):
        for _ in range(args.steps):
            state, m = step(state, batch, rng)
        jax.device_get(m["loss"])

    durations, plane_names = parse_xplane(logdir)
    if not durations:
        print(f"no device events found; planes = {plane_names}", file=sys.stderr)
        sys.exit(2)

    rows = []
    total_ps = 0
    for nm, ps in durations.items():
        base = nm.split("%")[-1].strip()
        ms_per_step = ps / 1e9 / args.steps
        total_ps += ps
        gb = traffic_of(base, insts) / 1e9
        rows.append((ms_per_step, base, gb))
    rows.sort(reverse=True)

    step_ms = total_ps / 1e9 / args.steps
    print(f"\ndevice total: {step_ms:.2f} ms/step over {args.steps} steps  (planes: {plane_names})")
    print(f"{'fusion':<44} {'ms/step':>8} {'GB':>7} {'GB/s':>7} {'%peak':>6} {'%step':>6}")
    shown_ms = shown_gb = 0.0
    for ms, nm, gb in rows[: args.top]:
        gbps = gb / (ms / 1e3) if ms > 0 else 0.0
        op = insts.get(nm, (0, "?", [], ""))[1]
        print(f"{nm[:42]:<44} {ms:8.3f} {gb:7.3f} {gbps:7.0f} {100*gbps/HBM_PEAK_GBPS:5.0f}% {100*ms/step_ms:5.1f}%  [{op}]")
        shown_ms += ms
        shown_gb += gb
    rest_ms = step_ms - shown_ms
    print(f"{'(remaining ops)':<44} {rest_ms:8.3f}")
    print(f"\nshown: {shown_ms:.2f} ms, {shown_gb:.2f} GB -> avg {shown_gb/(shown_ms/1e3):.0f} GB/s "
          f"({100*shown_gb/(shown_ms/1e3)/HBM_PEAK_GBPS:.0f}% of peak) across the top {args.top}")


if __name__ == "__main__":
    main()
