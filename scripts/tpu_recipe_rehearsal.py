"""Compressed full-recipe accuracy rehearsal on the REAL chip.

Round-3 VERDICT next-step #3: nothing had validated the 90-epoch r50
recipe's schedule/EMA/aug interplay at epoch scale — trajectory parity is 9
steps, and the learning proofs (scripts/tpu_accuracy_proof.py) use 20-class
corpora with short ad-hoc schedules. This runs the EXACT r50_baseline recipe
shape (reference configs/hydra_exp/1.r50_baseline.yaml:33-41 — warmup
0.001->1.0 over 8/90 of training then cosine to 0, SGD m=0.9 wd=3e-5, label
smoothing 0.1, bf16, no EMA: the baseline leaves arg_parser.py:88's
ema_decay=0 default untouched) end-to-end through the real data path (host
libjpeg decode -> DeviceFeed -> Pallas augment -> r50 train step) at a scale
this one-core host can feed: 100 classes x 200 images at 128px, 30 epochs.

Corpus: class = texture family x hue (5 x 20 = 100). Both factors are
invariant to the recipe's augmentations (RandomResizedCrop rescales
frequency but preserves orientation/structure; mirror maps the stripe
orientations to themselves; there is no color twist in the baseline recipe,
and the 18-degree hue spacing already survived it in the round-2 proofs).

Round-4 extension: --recipe selects the recipe FAMILY to rehearse —
r50_baseline (above), nfnet (15.eca_nfnet_l0.yaml: AdamW + heavy aug +
CutmixMixup + compression-scaled EMA eval + accumulate 2), or nf_lamb
(41.nf_conv-act_lamb.yaml: the CModel-compiled NF trunk + LAMB +
ortho callbacks). Same corpus, same pass criterion.

Usage: python scripts/tpu_recipe_rehearsal.py [--recipe r50_baseline]
       [--epochs N] [--keep] [--data DIR]
Prints one JSON line with the full val curve; exits 0 iff the curve rises
to a plateau >= --threshold with no late regression and no crater.
"""

from __future__ import annotations

import argparse
import colorsys
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import zlib

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_HUES = 20
N_TEX = 5
N_CLASSES = N_HUES * N_TEX
TRAIN_PER_CLASS = 200
VAL_PER_CLASS = 25
SRC_SIZE = 160


def _make_image(rng: np.random.Generator, cls: int) -> np.ndarray:
    """Class = (texture, hue). Same invariance argument as the 20-class
    texture corpus (tpu_accuracy_proof.py), widened to 20 hues x 5 textures."""
    tex, hue_i = cls % N_TEX, cls // N_TEX
    r, g, b = colorsys.hsv_to_rgb(hue_i / N_HUES, 0.85, 0.8)
    base = np.array([r, g, b]) * 255.0
    f = 2 * np.pi * rng.uniform(5, 8)  # cycles vary; frequency is NOT a label
    ph1, ph2 = rng.uniform(0, 2 * np.pi, 2)
    t = np.linspace(0, 1, SRC_SIZE)
    yy, xx = t[:, None], t[None, :]
    if tex == 0:  # horizontal stripes
        field = np.sin(f * yy + ph1) * np.ones_like(xx)
    elif tex == 1:  # vertical stripes
        field = np.sin(f * xx + ph1) * np.ones_like(yy)
    elif tex == 2:  # checkerboard (product grating)
        field = np.sin(f * yy + ph1) * np.sin(f * xx + ph2)
    elif tex == 3:  # isotropic blobs: block-upsampled low-pass noise
        k = 10
        up = (SRC_SIZE + k - 1) // k
        coarse = rng.normal(0, 1, (k, k))
        field = np.kron(coarse, np.ones((up, up)))[:SRC_SIZE, :SRC_SIZE]
        field = field / (np.abs(field).max() + 1e-6)
    else:  # flat (no texture)
        field = np.zeros((SRC_SIZE, SRC_SIZE))
    img = base[None, None, :] * (0.65 + 0.35 * field)[..., None]
    img = img + rng.normal(0, 10, (SRC_SIZE, SRC_SIZE, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def generate_corpus(root: str) -> None:
    from multiprocessing import Pool

    tasks = []
    for split, n in (("train", TRAIN_PER_CLASS), ("val", VAL_PER_CLASS)):
        for cls in range(N_CLASSES):
            d = os.path.join(root, split, f"class_{cls:03d}")
            os.makedirs(d, exist_ok=True)
            # zlib.crc32 NOT hash(): hash is PYTHONHASHSEED-randomized per
            # interpreter, which would make every regeneration a new corpus
            tasks.append((d, cls, n, zlib.crc32(f"{split}/{cls}".encode())))
    with Pool(4) as pool:
        pool.map(_gen_class_dir, tasks)


def _gen_class_dir(task) -> None:
    from PIL import Image

    d, cls, n, seed = task
    rng = np.random.default_rng(seed)
    for i in range(n):
        Image.fromarray(_make_image(rng, cls)).save(os.path.join(d, f"{i}.jpg"), "JPEG", quality=92)


def check_curve(accs, threshold: float, tol: float = 2.0, collapse: float = 15.0):
    """Rises to a plateau and STAYS there. Fail conditions:
    * the final quarter's mean misses `threshold`, or
    * any tail epoch regresses more than `tol` points below the running
      best (late regression = real recipe failure), or
    * any epoch craters more than `collapse` points below the running best
      (divergence/NaN symptom).
    Mid-training transients above that are recorded in `dips` but do NOT
    fail the run: with the cosine LR still high, a few-point dip off a
    99%+ running best is ordinary SGD noise — the reference's own
    published curves (e.g. 1.r50_baseline.yaml golden numbers across
    restarts) move by more than 2 points mid-schedule."""
    best = 0.0
    dips = []
    collapsed = False
    late_ok = True
    tail_start = len(accs) - max(len(accs) // 4, 1)
    for i, a in enumerate(accs):
        if a < best - tol:
            # compared against the RUNNING best so a curve still rising into
            # the final quarter is not punished for its own later epochs
            dips.append((i, a, best))
            if i >= tail_start:
                late_ok = False
        if a < best - collapse:
            collapsed = True
        best = max(best, a)
    tail = accs[tail_start:]
    plateau = float(np.mean(tail))
    return bool(tail) and plateau >= threshold and late_ok and not collapsed, plateau, dips


# Recipe SHAPES. Each entry: config file, warmup fraction of total epochs
# (0 = pure cosine), warmup lr endpoints, cosine lr endpoints, default
# epoch count, and the provenance string recorded in the JSON line.
RECIPES = {
    "r50_baseline": dict(
        config="tpu_rehearsal.yaml",
        warm_frac=8 / 90,
        warm_lr=(0.001, 1.0),
        cos_lr=(1.0, 0.0),
        epochs=30,
        desc=(
            "r50_baseline shape (warmup 8/90 -> cosine, sgd m0.9 wd3e-5, "
            "smooth 0.1, bf16, no EMA — faithful to 1.r50_baseline.yaml)"
        ),
    ),
    "nfnet": dict(
        config="tpu_rehearsal_nfnet.yaml",
        warm_frac=5 / 360,
        # Peak lr is BATCH-SCALED 0.01 -> 0.0025: the reference ran this
        # recipe at effective batch 1024 (256/rank x 2 GPUs x accumulate 2,
        # 15.eca_nfnet_l0.yaml:30-31 comments) vs 256 here (128 global x
        # accumulate 2); at the unscaled 0.01 the run diverges mid-warmup
        # (measured stability edge ~0.005 at this scale — PERF.md round 4,
        # per-step probe: gnorm 1e-1 -> inf between lr 0.004 and 0.009).
        # Same class of compression correction as the EMA decay below.
        warm_lr=(0.0, 0.0025),
        cos_lr=(0.0025, 0.0),
        epochs=36,
        desc=(
            "eca_nfnet_l0 shape (warmup 5/360 -> cosine, adamw wd1e-3, "
            "smooth 0.1, heavy aug + random interp, CutmixMixup p1, "
            "EMA eval w/ compression-scaled decay, accumulate 2, peak lr "
            "batch-scaled 1024->256 — faithful to 15.eca_nfnet_l0.yaml)"
        ),
    ),
    "nf_lamb": dict(
        config="tpu_rehearsal_nf_lamb.yaml",
        warm_frac=0.0,
        warm_lr=None,
        # the reference uses 0.001 ("lower lr for lamb experiments" /
        # "previous run was unsuccessful probably due to too large step",
        # 41.nf_conv-act_lamb.yaml:3,100-101); LAMB's trust ratio makes lr
        # the per-layer relative step size, so it is NOT batch-rescaled
        cos_lr=(0.001, 0.0),
        epochs=30,
        desc=(
            "nf_conv-act CModel + LAMB shape (pure cosine 0.001->0, badam "
            "lamb wd5e-3, smooth 0.1, heavy aug, CutmixMixup p1 + "
            "OrthoInit/OrthoLoss — faithful to 41.nf_conv-act_lamb.yaml)"
        ),
    ),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--recipe", choices=sorted(RECIPES), default="r50_baseline")
    ap.add_argument("--epochs", type=int, default=None, help="default: per-recipe")
    ap.add_argument("--threshold", type=float, default=95.0)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--data", default=None, help="reuse an existing corpus dir")
    ap.add_argument(
        "--override",
        action="append",
        default=[],
        help="extra train.py dotted overrides (e.g. loader.device_cache=true) — "
        "used by the decode-free-tier accuracy A/B (round-4 VERDICT #4)",
    )
    args = ap.parse_args()
    recipe = RECIPES[args.recipe]
    if args.epochs is None:
        args.epochs = recipe["epochs"]

    work = tempfile.mkdtemp(prefix="tpu_rehearsal_")
    if args.data:
        data = args.data
    else:
        data = os.path.join(work, "data")
        print(f"generating {N_CLASSES}x{TRAIN_PER_CLASS}+{VAL_PER_CLASS} corpus -> {data}", flush=True)
        generate_corpus(data)

    if recipe["warm_frac"] > 0:
        warm = max(1, round(args.epochs * recipe["warm_frac"]))
        w0, w1 = recipe["warm_lr"]
        c0, c1 = recipe["cos_lr"]
        stages = (
            f"[{{start: 0, end: {warm}, lr: [{w0}, {w1}]}}, "
            f"{{start: {warm}, end: {args.epochs}, lr: [{c0}, {c1}], lr_mode: cos}}]"
        )
    else:
        c0, c1 = recipe["cos_lr"]
        stages = f"[{{start: 0, end: {args.epochs}, lr: [{c0}, {c1}], lr_mode: cos}}]"
    env = dict(os.environ, IMAGENET_DIR=data)
    cmd = [
        sys.executable,
        os.path.join(ROOT, "train.py"),
        "-c",
        os.path.join(ROOT, "configs", recipe["config"]),
        f"log.dir={work}/logs",
        f"run.stages={stages}",
    ] + args.override
    print(" ".join(cmd), flush=True)
    out = subprocess.run(cmd, env=env, cwd=ROOT, capture_output=True, text=True, timeout=4 * 3600)
    accs = [float(a) for a in re.findall(r"Val\s+Acc@1:\s*([0-9.]+)", out.stdout)]
    ok_curve, plateau, dips = check_curve(accs, args.threshold) if accs else (False, 0.0, [])
    ok = out.returncode == 0 and ok_curve
    print(
        json.dumps(
            {
                "recipe": recipe["desc"],
                "overrides": args.override,
                "classes": N_CLASSES,
                "epochs": args.epochs,
                "image_size": 128,
                "val_curve": accs,
                "plateau_acc1": plateau,
                "best_acc1": max(accs, default=0.0),
                "dips": dips,
                "ok": ok,
            }
        ),
        flush=True,
    )
    if not ok:
        print(out.stdout[-4000:] + out.stderr[-3000:], file=sys.stderr)
        print(f"work dir kept: {work}", file=sys.stderr)
    elif not args.keep:
        shutil.rmtree(work, ignore_errors=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
