#!/usr/bin/env python3
"""Port the reference's legacy flat-schema configs (`configs/_old_configs/*`)
into the repo's StrictConfig schema under `configs/old_exp/`.

The legacy schema is the pre-hydra trainer's flat YAML (reference
_old_configs/..., e.g. exp91.BNet_afocal_ctmx.yaml): `name/arch/model_params/
criterion(+_params)/optim(+_params)/weight_decay/smooth/ctwist/blur/cutmix/
ema_decay/lookahead/sigmoid_trick/classes_divisor/phases[...]`. This script
TRANSLATES each into the repo schema (it does not copy config text):

  name              -> log.exp_name
  arch+model_params -> model {_target_, **params}
  criterion(+params)-> criterion dict (legacy alias names are registered)
  optim(+params)+wd -> optim dict (momentum from the phases' `mom`)
  smooth            -> criterion.smoothing = 0.1 (the old --smooth flag)
  ctwist/blur       -> loader.color_twist_prob 0.4 / blur_prob 0.2 (the fixed
                       probabilities of the old trainer, preserved by the
                       hydra-era configs: 83/102 use exactly these values)
  cutmix            -> run.extra_callbacks CutmixMixup(cutmix_alpha=x, prob=1)
  phases            -> loader sizes + run.stages (lr_ep when a data change
                       cuts an lr phase; per-phase cutmix-off -> stop_epoch)
  crop_method: full -> val_loader.full_crop
  resize_method     -> loader.interpolation
  hard_pct          -> criterion wrapped in hard_negative
  sigmoid: true     -> criterion sigmoid (one-off key, resnet34_sigm.yaml)

Fully-commented reference files (abandoned experiments) are ported as
fully-commented files too, with a header note.

Golden-number comment lines (accuracies/timings) are carried over verbatim as
comments — they are experimental RESULTS, the whole value of the graveyard.
"""

from __future__ import annotations

import os
import re
import sys

import yaml

REF = "/root/reference/configs/_old_configs"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs", "old_exp")

SUBDIRS = {
    "_exp1-85_configs": "exp1-85",
    "_exp85-114_configs": "exp85-114",
    "_first_attempts": "first_attempts",
}

# criteria that accept a `smoothing` kwarg (see losses/)
SMOOTHABLE = {
    "cross_entropy", "a-softmax", "normalized_ce", "sigmoid", "kld",
    "a-focal", "binary_focal", "focal",
}
# the old --smooth flag's value (reference arg default; hydra configs use 0.1)
SMOOTH_VALUE = 0.1

# optimizers that take `momentum`
MOMENTUM_OPTIMS = {"sgd", "fused_sgd", "sgdp", "rmsprop", "fused_rmsprop"}


def load_legacy(path: str):
    txt = open(path).read()
    cfg = yaml.safe_load(txt)
    return (cfg if isinstance(cfg, dict) else None), txt


def golden_comments(txt: str):
    """Comment lines worth preserving: accuracies, timings, lr math, design
    notes at the top of the file."""
    keep = []
    for line in txt.splitlines():
        ls = line.strip()
        if not ls.startswith("#"):
            continue
        body = ls.lstrip("#").strip()
        if not body:
            continue
        if re.search(r"Acc@|acc@|loss|Loss|Total time|lr |LR|epoch|Epoch|ema|better|worse|improve|close to|paper|GPU|gpu|because|instead|TF|batch", body):
            keep.append(body)
    return keep


def split_phases(phases):
    data, lr = [], []
    for ph in phases or []:
        if not isinstance(ph, dict):
            continue
        if "lr" in ph:
            lr.append(dict(ph))
        else:
            data.append(ph)
    data.sort(key=lambda d: d["ep"])

    # Normalize scalar step phases ({"ep": 5, "lr": 0.2} = constant lr from
    # epoch 5 until the NEXT lr event — the old fastai-style step schedule,
    # see _first_attempts/legacy_phases.py "default Imagenet settings") into
    # [a, b] spans with lr [l, l].
    end = 0
    for ph in lr + data:
        ep = ph["ep"]
        end = max(end, int(ep[1]) if isinstance(ep, (list, tuple)) else int(ep))
    norm = []
    for i, ph in enumerate(lr):
        ep, lrv = ph["ep"], ph["lr"]
        if not isinstance(ep, (list, tuple)):
            nxt = end
            if i + 1 < len(lr):
                ne = lr[i + 1]["ep"]
                nxt = int(ne[0]) if isinstance(ne, (list, tuple)) else int(ne)
            ep = [int(ph["ep"]), nxt]
        if not isinstance(lrv, (list, tuple)):
            lrv = [float(lrv), float(lrv)]
        mom = ph.get("mom")
        if isinstance(mom, (list, tuple)):
            mom = mom[0]
        p2 = dict(ph, ep=[int(ep[0]), int(ep[1])], lr=[float(lrv[0]), float(lrv[1])])
        if mom is not None:
            p2["mom"] = float(mom)
        if p2["ep"][0] < p2["ep"][1]:  # zero-length = pure end marker
            norm.append(p2)
    return data, norm


def translate_data_args(ph, base=None):
    """Legacy per-phase data keys -> repo loader keys (absolute values)."""
    out = {}
    if "sz" in ph:
        out["image_size"] = int(ph["sz"])
    if "bs" in ph:
        out["batch_size"] = int(ph["bs"])
    if "min_area" in ph:
        out["min_area"] = float(ph["min_area"])
    if "ctwist" in ph:
        out["color_twist_prob"] = 0.4 if ph["ctwist"] else 0.0
    return out


def port_one(cfg: dict, src_rel: str, txt: str) -> dict:
    name = str(cfg["name"])
    out = {"defaults": ["/base"], "log": {"exp_name": name.replace("/", "_")}}

    # ----- model -----
    arch = cfg["arch"]
    mp = dict(cfg.get("model_params") or cfg.get("model_param") or {})
    model = {"_target_": arch, **mp}
    out["model"] = model

    # ----- phases -> loader + stages + callbacks -----
    data_ph, lr_ph = split_phases(cfg.get("phases"))
    loader = {}
    val_loader = {}
    if data_ph:
        first = data_ph[0]
        loader.update(translate_data_args(first))
        if "val_sz" in first:
            val_loader["image_size"] = int(first["val_sz"])
            # the legacy runner honored an explicit val size; without this the
            # DataManager would overwrite it with the train stage size
            val_loader["follow_train_size"] = False
    total_end = 0
    for ph in lr_ph:
        total_end = max(total_end, int(ph["ep"][1]))
    for ph in data_ph:
        total_end = max(total_end, int(ph["ep"]))

    # stage boundaries: every data-change epoch + every lr-phase edge
    cuts = sorted(
        {int(p["ep"]) for p in data_ph}
        | {int(p["ep"][0]) for p in lr_ph}
        | {int(p["ep"][1]) for p in lr_ph}
        | {0, total_end}
    )
    cuts = [c for c in cuts if c < total_end] + [total_end]

    cutmix_stop = None
    stages = []
    base_args = translate_data_args(data_ph[0]) if data_ph else {}
    prev_args = dict(base_args)
    for s, e in zip(cuts[:-1], cuts[1:]):
        # folded data args at epoch s
        folded = {}
        for ph in data_ph:
            if int(ph["ep"]) <= s:
                folded.update(translate_data_args(ph))
                if ph.get("cutmix", None) == 0.0 and cutmix_stop is None:
                    cutmix_stop = int(ph["ep"])
        # covering lr phase
        phase = None
        for ph in lr_ph:
            a, b = int(ph["ep"][0]), int(ph["ep"][1])
            if a <= s < b:
                phase = ph
                break
        stage = {"start": s, "end": e}
        if phase is not None:
            a, b = int(phase["ep"][0]), int(phase["ep"][1])
            stage["lr"] = [float(phase["lr"][0]), float(phase["lr"][1])]
            mode = phase.get("mode", "linear")
            if mode != "linear":
                stage["lr_mode"] = mode
            if (a, b) != (s, e):
                stage["lr_ep"] = [a, b]
        if folded != prev_args:
            delta = {k: v for k, v in folded.items() if base_args.get(k) != v}
            if not delta:
                # the stage reverts every loader key exactly to the base
                # values: extra_args vs base is empty, but DataManager's
                # "no extra_args -> keep current loader" fast path would then
                # keep the PREVIOUS stage's loader. Emit the reverted keys
                # explicitly (at their base values) to force the rebuild.
                delta = {
                    k: base_args[k] for k in prev_args if k in base_args and prev_args[k] != base_args[k]
                }
            if delta:
                stage["extra_args"] = delta
        prev_args = dict(folded) if folded else dict(base_args)
        stages.append(stage)

    # merge consecutive stages that differ only in [start,end] and carry the
    # same lr phase (same lr_ep) and no extra_args change
    merged = []
    for st in stages:
        if merged:
            p = merged[-1]
            same_lr = (
                p.get("lr") == st.get("lr")
                and p.get("lr_mode") == st.get("lr_mode")
                and p.get("lr_ep") == st.get("lr_ep")
                and p.get("lr_ep") is not None
            )
            if same_lr and "extra_args" not in st and p["end"] == st["start"]:
                p["end"] = st["end"]
                continue
        merged.append(st)
    stages = merged

    # ----- loader extras -----
    if cfg.get("ctwist"):
        loader["color_twist_prob"] = 0.4
    if cfg.get("blur"):
        loader["blur_prob"] = 0.2
    if cfg.get("random_interpolation"):
        loader["random_interpolation"] = True
    if cfg.get("resize_method") == "cubic":
        loader["interpolation"] = "cubic"
    if cfg.get("classes_divisor", 1) and int(cfg.get("classes_divisor", 1)) > 1:
        loader["classes_divisor"] = int(cfg["classes_divisor"])
    if cfg.get("crop_method") == "full":
        val_loader["full_crop"] = True
    if cfg.get("rect_validation"):
        val_loader["rectangular"] = True
    if loader:
        out["loader"] = loader
    if val_loader:
        out["val_loader"] = val_loader

    # ----- optimizer -----
    optim_name = cfg.get("optim", "sgd")
    optim = {"_target_": str(optim_name)}
    optim.update(dict(cfg.get("optim_params") or cfg.get("optim_param") or {}))
    if "weight_decay" in cfg:
        optim.setdefault("weight_decay", float(cfg["weight_decay"]))
    moms = [ph.get("mom") for ph in lr_ph if ph.get("mom") is not None]
    if str(optim_name) in MOMENTUM_OPTIMS and moms:
        optim.setdefault("momentum", float(moms[0]))
    if cfg.get("lookahead"):
        optim["lookahead"] = True
    out["optim"] = optim

    # ----- criterion -----
    crit_name = cfg.get("criterion")
    if crit_name is None and cfg.get("sigmoid"):
        crit_name = "sigmoid"  # resnet34_sigm.yaml's one-off flag
    if crit_name is None:
        crit_name = "cross_entropy"
    crit_params = {k: v for k, v in dict(cfg.get("criterion_params") or {}).items() if v is not None}
    # (None-valued params are rotted/disabled keys, e.g. exp96 `cos_intra: null`)
    if str(crit_name) == "focal":
        # the old trainer's 'focal' was pytorch-tools FocalLoss in its default
        # BINARY (sigmoid) mode (exp68-72: alpha -1, combine_thr). Its
        # `reduction: sum` meant sum over the CLASS axis (the per-sample
        # binary-focal formulation) — our BinaryFocalLoss class-sums per
        # sample unconditionally, so the key is dropped; keeping a full
        # batch-sum would scale the loss ~1e4x and no lr in these phases
        # could have trained that.
        crit_name = "binary_focal"
        crit_params.pop("reduction", None)
    crit = {"_target_": str(crit_name)}
    crit.update(crit_params)
    if cfg.get("smooth") and str(crit_name) in SMOOTHABLE and "smoothing" not in crit:
        crit["smoothing"] = SMOOTH_VALUE
    if cfg.get("hard_pct"):
        inner = dict(crit)
        inner["reduction"] = "none"
        crit = {"_target_": "hard_negative", "hard_pct": float(cfg["hard_pct"]), "loss": inner}
    out["criterion"] = crit

    # ----- run -----
    run = {"stages": stages}
    if cfg.get("ema_decay"):
        run["ema_decay"] = float(cfg["ema_decay"])
    if cfg.get("accumulate_steps", 1) and int(cfg.get("accumulate_steps", 1)) > 1:
        run["accumulate_steps"] = int(cfg["accumulate_steps"])
    callbacks = []
    if cfg.get("cutmix"):
        cb = {"_target_": "CutmixMixup", "cutmix_alpha": float(cfg["cutmix"]), "mixup_alpha": 0.0, "prob": 1.0}
        if cutmix_stop is not None:
            cb["stop_epoch"] = cutmix_stop
        callbacks.append(cb)
    if callbacks:
        run["extra_callbacks"] = callbacks
    out["run"] = run

    # ----- top-level flags -----
    if cfg.get("weight_standardization"):
        out["weight_standardization"] = True
    if cfg.get("sigmoid_trick"):
        out["sigmoid_trick"] = True
    if cfg.get("no_bn_wd"):
        out["filter_from_wd"] = ["bn", "scale", "bias"]
    return out


class _FlowStage(dict):
    pass


def _repr_flow(dumper, data):
    return dumper.represent_mapping("tag:yaml.org,2002:map", data, flow_style=True)


yaml.SafeDumper.add_representer(_FlowStage, _repr_flow)


def emit(out: dict, src_rel: str, golds, commented=False) -> str:
    # compact flow style for stages/callbacks (repo config idiom)
    o = dict(out)
    run = dict(o.get("run", {}))
    if "stages" in run:
        run["stages"] = [_FlowStage(s) for s in run["stages"]]
    if "extra_callbacks" in run:
        run["extra_callbacks"] = [_FlowStage(c) for c in run["extra_callbacks"]]
    o["run"] = run
    for k in ("log", "loader", "val_loader", "optim"):
        if k in o and isinstance(o[k], dict):
            o[k] = _FlowStage(o[k])
    if "criterion" in o and isinstance(o["criterion"], dict) and "loss" not in o["criterion"]:
        o["criterion"] = _FlowStage(o["criterion"])

    header = [
        f"# Ported from reference configs/_old_configs/{src_rel} (legacy flat",
        "# schema -> StrictConfig; see scripts/port_legacy_configs.py for the key map).",
    ]
    if commented:
        header.append("# NOTE: the reference file is fully commented out (abandoned experiment);")
        header.append("# kept in the same state here for the record.")
    for g in golds[:14]:
        header.append(f"# {g}")
    body = yaml.dump(o, Dumper=yaml.SafeDumper, sort_keys=False, width=110, default_flow_style=False)
    if commented:
        body = "\n".join("# " + ln if ln.strip() else ln for ln in body.splitlines()) + "\n"
    return "\n".join(header) + "\n" + body


def main():
    n_ok = n_commented = 0
    fails = []
    skip = {"legacy_phases.py"}
    # already ported as first-class repo configs (configs/exp/)
    for sub, outsub in SUBDIRS.items():
        os.makedirs(os.path.join(OUT, outsub), exist_ok=True)
        for fn in sorted(os.listdir(os.path.join(REF, sub))):
            if not fn.endswith((".yaml", ".yml")) or fn in skip:
                continue
            src = os.path.join(REF, sub, fn)
            src_rel = f"{sub}/{fn}"
            cfg, txt = load_legacy(src)
            golds = golden_comments(txt)
            commented = False
            if cfg is None:
                # fully-commented file: uncomment, parse, port, re-comment.
                # Keep only YAML-shaped lines — prose notes ("Postpone this
                # experiment...") at one '#' depth would break the parse.
                lines = []
                for ln in txt.splitlines():
                    if not ln.strip().startswith("#"):
                        continue
                    u = re.sub(r"^#\s?", "", ln)
                    if re.match(r"^\s|^[A-Za-z_'\"][\w'\" ]*\s*:|^[\[\]{}-]|^#|^\]|^$", u):
                        lines.append(u)
                uncommented = "\n".join(lines)
                try:
                    cfg = yaml.safe_load(uncommented)
                except Exception:
                    cfg = None
                if not isinstance(cfg, dict) or "arch" not in cfg:
                    fails.append((src_rel, "unparseable"))
                    continue
                commented = True
            try:
                out = port_one(cfg, src_rel, txt)
            except Exception as e:
                fails.append((src_rel, repr(e)))
                continue
            dst = os.path.join(OUT, SUBDIRS[sub], os.path.splitext(fn)[0] + ".yaml")
            with open(dst, "w") as f:
                f.write(emit(out, src_rel, golds, commented=commented))
            n_ok += 1
            n_commented += commented
    print(f"ported {n_ok} ({n_commented} kept commented), {len(fails)} failures")
    for f in fails:
        print("FAIL", f)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
