"""Learning-dynamics proof on the REAL chip through the REAL data path.

Generates a 20-class procedurally-labeled JPEG corpus (class = hue x stripe
frequency; survives RandomResizedCrop/flip/color-jitter), then runs the
actual training CLI — host libjpeg decode → DeviceFeed → Pallas augment →
ResNet-50 bf16 train step with EMA + cosine schedule — and asserts the val
accuracy. This is the hardware-scale version of
tests/test_e2e.py::test_loop_learns_separable_task: it catches sign errors,
schedule bugs, EMA/eval wiring and input-pipeline corruption that no shape
test can, on the chip itself.

Usage: python scripts/tpu_accuracy_proof.py [--epochs 15] [--keep]
Prints one JSON line: {"final_acc1": ..., "ema_used": ..., "ok": ...}
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

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_CLASSES = 20
TRAIN_PER_CLASS = 100
VAL_PER_CLASS = 20
SRC_SIZE = 180


def _make_image(rng: np.random.Generator, cls: int) -> np.ndarray:
    """Class = one of 20 distinct hues (18 degrees apart), rendered as a
    striped texture with random phase. Hue is invariant to RandomResizedCrop,
    mirror, and resampling (a FREQUENCY factor is NOT: crop area rescales
    visible cycles — measured round 2, top-1 plateaued at 56% with Acc@5 at
    100% before this was removed)."""
    hue = cls / N_CLASSES
    r, g, b = colorsys.hsv_to_rgb(hue, 0.85, 0.8)
    base = np.array([r, g, b]) * 255.0
    yy = np.linspace(0, 2 * np.pi * 6, SRC_SIZE)[:, None]
    stripes = 0.65 + 0.35 * np.sin(yy + rng.uniform(0, 2 * np.pi))  # phase-random
    img = base[None, None, :] * stripes[..., None]
    img = img + rng.normal(0, 15, (SRC_SIZE, SRC_SIZE, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def _make_texture_image(rng: np.random.Generator, cls: int) -> np.ndarray:
    """Stretch corpus (round-2 VERDICT #8): class = texture family x hue
    (5 x 4 = 20), so COLOR ALONE resolves only 1/5 of the label — the net
    must read spatial structure. Every factor is invariant to the train
    augmentations: RandomResizedCrop rescales frequency but preserves
    orientation/structure (so stripe ORIENTATION is a factor, frequency is
    not); mirror maps horizontal/vertical stripes to themselves; the four
    hues are 90 degrees apart, far outside the +-20-degree color twist."""
    tex, hue_i = cls % 5, cls // 5
    r, g, b = colorsys.hsv_to_rgb(hue_i / 4.0, 0.8, 0.8)
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
    elif tex == 3:  # isotropic blobs: low-pass 2D noise, scale-free-ish
        k, up = 16, (SRC_SIZE + 15) // 16
        coarse = rng.normal(0, 1, (k, k))
        field = np.kron(coarse, np.ones((up, up)))[:SRC_SIZE, :SRC_SIZE]
        from scipy import ndimage as _ndi

        field = _ndi.gaussian_filter(field, SRC_SIZE / 32)
        field = field / (np.abs(field).max() + 1e-6)
    else:  # flat (no texture)
        field = np.zeros((SRC_SIZE, SRC_SIZE))
    img = base[None, None, :] * (0.65 + 0.35 * field)[..., None]
    img = img + rng.normal(0, 10, (SRC_SIZE, SRC_SIZE, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def generate_corpus(root: str, corpus: str = "hue") -> None:
    from PIL import Image

    make = _make_texture_image if corpus == "texture" else _make_image
    rng = np.random.default_rng(0)
    for split, n in (("train", TRAIN_PER_CLASS), ("val", VAL_PER_CLASS)):
        for cls in range(N_CLASSES):
            d = os.path.join(root, split, f"class_{cls:03d}")
            os.makedirs(d, exist_ok=True)
            for i in range(n):
                Image.fromarray(make(rng, cls)).save(os.path.join(d, f"{i}.jpg"), "JPEG", quality=92)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)  # 15 tops out ~73%; 30 reaches 100%
    ap.add_argument("--keep", action="store_true", help="keep the corpus/run dir")
    ap.add_argument("--threshold", type=float, default=90.0)
    ap.add_argument("--corpus", choices=("hue", "texture"), default="hue")
    ap.add_argument(
        "--config",
        default="tpu_accuracy.yaml",
        help="config under configs/ (tpu_accuracy_bresnet.yaml = bresnet50 + EMA + CutmixMixup + device_resample)",
    )
    args = ap.parse_args()

    work = tempfile.mkdtemp(prefix="tpu_acc_")
    data = os.path.join(work, "data")
    generate_corpus(data, corpus=args.corpus)

    env = dict(os.environ, IMAGENET_DIR=data)
    cmd = [
        sys.executable,
        os.path.join(ROOT, "train.py"),
        "-c",
        os.path.join(ROOT, "configs", args.config),
        f"log.dir={work}/logs",
        "run.stages=[{start: 0, end: 2, lr: [0.01, 0.2]}, "
        f"{{start: 2, end: {args.epochs}, lr: [0.2, 0.0], lr_mode: cos}}]",
    ]
    out = subprocess.run(cmd, env=env, cwd=ROOT, capture_output=True, text=True, timeout=5400)
    tail = out.stdout[-4000:] + out.stderr[-2000:]
    accs = re.findall(r"Val\s+Acc@1:\s*([0-9.]+)", out.stdout)
    final = float(accs[-1]) if accs else float("nan")
    best = max((float(a) for a in accs), default=float("nan"))
    ok = out.returncode == 0 and best >= args.threshold

    # --- serving closure: export the trained checkpoint and verify the
    # ARTIFACT reproduces the training-time val accuracy on hardware ---
    artifact_acc = float("nan")
    if ok:
        import glob as _glob

        ckpts = sorted(_glob.glob(os.path.join(work, "logs", "*", "*", "model_last.ckpt")))
        serve_dir = os.path.join(work, "serve")
        # export = trace + lower only, no device needed: run it on the CPU
        # backend (the TPU path can sit in the remote compile queue for >20
        # min just for the template init). The artifact still targets
        # platforms ("tpu","cpu").
        exp_env = dict(env, JAX_PLATFORMS="cpu")
        exp = subprocess.run(
            [
                sys.executable,
                os.path.join(ROOT, "scripts", "export_model.py"),
                "-c",
                os.path.join(ROOT, "configs", args.config),
                "--ckpt",
                ckpts[-1],
                "--out",
                serve_dir,
                # the training-time Val Acc@1 is computed with the EMA weights
                # (tpu_accuracy.yaml sets ema_decay=0.99; loop.py evaluates EMA
                # whenever present), so the artifact must serve the SAME
                # weights for the like-for-like comparison below
                "--ema",
            ],
            env=exp_env,
            cwd=ROOT,
            capture_output=True,
            text=True,
            timeout=1800,
        )
        if exp.returncode != 0:
            print(exp.stdout[-1000:] + exp.stderr[-1000:], file=sys.stderr)
            ok = False
        else:
            import jax.numpy as jnp

            from sota_imagenet_tpu.data.decode import decode_val
            from sota_imagenet_tpu.data.pipeline import scan_image_folder
            from sota_imagenet_tpu.utils.export import load_exported

            serve, meta = load_exported(serve_dir)
            files, labels, _ = scan_image_folder(os.path.join(data, "val"))
            correct = 0
            for i in range(0, len(files), 100):
                chunk = files[i : i + 100]
                imgs = np.stack([decode_val(f, meta["image_size"]) for f in chunk])
                pred = np.argmax(np.asarray(serve(jnp.asarray(imgs))), axis=-1)
                correct += int((pred == np.asarray(labels[i : i + 100])).sum())
            artifact_acc = 100.0 * correct / len(files)
            # the artifact must match the training-time val number (same
            # weights, same preprocessing) — a drift here means the export
            # path serves something other than what was trained
            ok = ok and abs(artifact_acc - final) <= 2.0

    print(
        json.dumps(
            {
                "final_acc1": final,
                "best_acc1": best,
                "artifact_acc1": artifact_acc,
                "epochs": args.epochs,
                "corpus": args.corpus,
                "config": args.config,
                "ok": ok,
            }
        )
    )
    if not ok:
        print(tail, file=sys.stderr)
        print(f"work dir kept for debugging: {work}", file=sys.stderr)
    elif not args.keep:
        shutil.rmtree(work, ignore_errors=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
