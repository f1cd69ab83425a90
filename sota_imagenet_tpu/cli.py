"""Console entry points (`sota-train`, `sota-export`, `sota-records`).

Train CLI (reference train.py equivalent).

Usage:
    sota-train --config configs/r50_baseline.yaml [key=value ...]
    sota-train --config configs/eval_config.yaml run.resume=logs/.../model.ckpt

Mirrors the reference main() flow (reference train.py:22-185): config →
run-dir + git snapshot → model/criterion/optimizer build → resume → callbacks
→ stage loop over the DataManager → final eval + save. Distributed setup is
JAX-native: one process per host, mesh over all chips (no torch.distributed
launcher; SURVEY.md §5.8).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import time

import jax
import jax.numpy as jnp


def find_auto_resume(log_dir: str, exp_name: str):
    """Newest checkpoint for this experiment, for preemption recovery.

    Also matches staged (.new-*) and displaced (.stale) checkpoints: a crash
    between orbax's commit and the rename swap leaves the newest COMPLETE
    checkpoint under one of those names (train/checkpoint.py); interrupted
    (uncommitted) orbax tmp dirs are excluded."""
    import glob as _glob

    pat = os.path.join(log_dir, f"*_{exp_name}", "*", "model*.ckpt")
    cands = sorted(
        (
            p
            for p in _glob.glob(pat) + _glob.glob(pat + ".new-*") + _glob.glob(pat + ".stale")
            if "orbax-checkpoint-tmp" not in p
        ),
        key=os.path.getmtime,
    )
    return cands[-1] if cands else None


def main(argv=None):
    parser = argparse.ArgumentParser(description="sota_imagenet_tpu trainer")
    parser.add_argument("--config", "-c", default=None, help="experiment YAML")
    parser.add_argument("overrides", nargs="*", help="dotted overrides key=value")
    args = parser.parse_args(argv)

    # the axon TPU plugin ignores the JAX_PLATFORMS env var; honor it here so
    # CPU smoke runs (JAX_PLATFORMS=cpu) work as documented
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        if "cpu" in os.environ["JAX_PLATFORMS"]:
            # the XLA CPU runtime hard-aborts a collective whose participants
            # don't all arrive within 40s — on a 1-core host running an
            # 8-device mesh, a concurrent eager-op compile can starve a device
            # thread past that and kill an otherwise-healthy run (observed
            # with spatially-partitioned steps at 128px). Only meaningful on
            # the virtual-CPU mesh; jax reads XLA_FLAGS at client creation,
            # so appending here (before any jax.devices()) is effective.
            flags = os.environ.get("XLA_FLAGS", "")
            if "collective_call_terminate_timeout" not in flags:
                os.environ["XLA_FLAGS"] = (
                    f"{flags} --xla_cpu_collective_call_terminate_timeout_seconds=600".strip()
                )

    # multi-host init (no-op single-host); reference used NCCL env:// (train.py:61)
    if "JAX_COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()

    from sota_imagenet_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()

    from sota_imagenet_tpu import config as C
    from sota_imagenet_tpu.config import instantiate, parse_stages
    from sota_imagenet_tpu.data.pipeline import DataManager
    from sota_imagenet_tpu.optim import build_optimizer
    from sota_imagenet_tpu.parallel.mesh import create_mesh
    from sota_imagenet_tpu.train.callbacks import (
        Callback,
        CheckpointSaver,
        ConsoleLogger,
        TensorBoard,
        Timer,
        WeightDistributionTB,
    )
    from sota_imagenet_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from sota_imagenet_tpu.train.loop import Runner
    from sota_imagenet_tpu.train.schedule import phases_from_stages
    from sota_imagenet_tpu.utils.logging import setup_logger
    from sota_imagenet_tpu.utils.misc import count_parameters, filter_from_weight_decay, host_prng_key, set_random_seed

    start_time = time.time()
    cfg = C.load(args.config, overrides=args.overrides, strict_env=False)
    is_master = jax.process_index() == 0

    # run dir: logs/<date>_<exp>/<time> (reference configs/base.yaml:13-15)
    run_dir = os.path.join(
        cfg.log.dir, time.strftime("%Y-%m-%d") + "_" + cfg.log.exp_name, time.strftime("%H-%M-%S")
    )
    if is_master:
        os.makedirs(run_dir, exist_ok=True)
        # reproducibility artifacts (reference train.py:32-36)
        for fname, cmd in (("commit_hash.txt", ["git", "rev-parse", "--short", "HEAD"]), ("diff.txt", ["git", "diff"])):
            try:
                out = subprocess.run(cmd, capture_output=True, text=True).stdout
                with open(os.path.join(run_dir, fname), "w") as f:
                    f.write(out)
            except Exception:
                pass
        with open(os.path.join(run_dir, "config.yaml"), "w") as f:
            f.write(C.to_yaml(cfg))
    log = setup_logger(os.path.join(run_dir, "logs.txt") if is_master else None, is_master)
    log.info(C.to_yaml(cfg))
    log.info(f"JAX {jax.__version__} | devices: {jax.device_count()} ({jax.devices()[0].platform})")

    if cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if cfg.random_seed is not None:
        set_random_seed(cfg.random_seed)
    # host-resident (numpy) master key: uncommitted, so it composes with any
    # jit sharding, and deriving the data key from it never reads back from
    # the device (D2H serializes dispatch; ~30 ms RTT tunneled — PERF.md r4)
    rng = host_prng_key(cfg.random_seed or 0)

    mesh = create_mesh(data=cfg.mesh.data, model=cfg.mesh.model, spatial=cfg.mesh.spatial)
    input_dtype = jnp.bfloat16 if cfg.run.bf16 else jnp.float32
    from sota_imagenet_tpu.parallel.mesh import image_sharding as _image_sharding

    img_sharding = _image_sharding(mesh)  # None unless mesh.spatial > 1
    if img_sharding is not None:
        # every stage's image size must keep >= 2 deepest-feature rows per
        # spatial shard (XLA SPMD wgrad miscompilation below the conv halo —
        # parallel/mesh.validate_spatial_extent)
        from sota_imagenet_tpu.parallel.mesh import validate_spatial_extent

        validate_spatial_extent(mesh, cfg.loader.image_size)
        log.info(f"Spatial partitioning: image H sharded over {mesh.shape['spatial']} devices")

    # BN statistics view (global sync-BN / per-shard local / grouped) — a
    # process-wide trace-time setting, applied before model build
    from sota_imagenet_tpu.models.norms import resolve_bn_stats, set_bn_stats_groups

    bn_groups = resolve_bn_stats(cfg.run.bn_stats, mesh.shape["data"])
    set_bn_stats_groups(bn_groups)
    if bn_groups > 1:
        log.info(f"BatchNorm statistics: {bn_groups} groups (run.bn_stats={cfg.run.bn_stats})")

    log.info("Loading model")
    model_cfg = dict(cfg.model)
    divisor = max(int(cfg.loader.get("classes_divisor", 1) or 1), 1)
    if divisor > 1 and "num_classes" not in model_cfg:
        # legacy classes_divisor: the classifier width follows the merged
        # label space (ceil(C/divisor)); explicit model num_classes wins
        eff = -(-int(cfg.loader.num_classes) // divisor)
        try:
            instantiate({**model_cfg, "num_classes": eff})
            model_cfg["num_classes"] = eff
            log.info(f"classes_divisor={divisor}: model num_classes -> {eff}")
        except TypeError:
            # models that don't take the kwarg (CModel heads are explicit in
            # layer_config) must size their classifier in the config itself
            log.warning(f"classes_divisor={divisor}: model does not take num_classes; size the head in the config")
    if cfg.bn_momentum != 0.1 and "bn_momentum" not in model_cfg:
        # patch_bn_mom equivalent (reference train.py:76); models that don't
        # take the kwarg (CModel etc. set norm kwargs directly) fall through
        try:
            model = instantiate({**model_cfg, "bn_momentum": cfg.bn_momentum})
        except TypeError:
            model = instantiate(model_cfg)
    else:
        model = instantiate(model_cfg)
    if cfg.weight_standardization:
        # conv_to_ws_conv equivalent (reference train.py:66-67): forward WS
        # parametrization over every conv kernel
        from sota_imagenet_tpu.models.parametrize import ParametrizedModel, weight_standardization_fn

        model = ParametrizedModel(model, weight_standardization_fn(cfg.init_gamma))
    if cfg.log.print_model:  # reference train.py:78-79
        log.info(str(model))
    criterion = instantiate(cfg.criterion)

    stages = parse_stages(cfg.run.stages)
    if img_sharding is not None:
        # progressive-resize stages must also satisfy the spatial-shard floor
        for st in stages:
            sz = (st.extra_args or {}).get("image_size")
            if sz:
                validate_spatial_extent(mesh, sz)
    lr_phases = phases_from_stages(stages)
    log.info(f"Learning rate stages: {lr_phases}")

    def wd_mask_fn(params):
        if cfg.filter_from_wd is not None:
            return filter_from_weight_decay(params, cfg.filter_from_wd)
        return None

    callbacks = [
        Timer(),
        ConsoleLogger(),
        CheckpointSaver(run_dir, save_name="model.ckpt", include_optimizer=cfg.log.save_optim),
    ]
    if cfg.log.tensorboard and is_master:
        callbacks.append(TensorBoard(run_dir, log_every=50))
    if cfg.log.histogram:
        callbacks.append(WeightDistributionTB())
    for clb_cfg in cfg.run.extra_callbacks or []:
        callbacks.append(instantiate(clb_cfg))

    # build a throwaway state to derive the wd mask (params structure).
    # MUST mirror the real runner's ema_decay/criterion so the state tree has
    # the ema/loss_state fields the train step expects
    probe = Runner(
        model, criterion, lambda sched: build_optimizer(dict(cfg.optim), sched), lr_phases=lr_phases,
        ema_decay=cfg.run.ema_decay, input_dtype=input_dtype, rng=rng,
    )
    init_shape = (2, cfg.loader.image_size, cfg.loader.image_size, 3)
    probe_state = probe.init_state(init_shape, rng)
    if cfg.get("sigmoid_trick", False):
        # focal-prior classifier-bias init (legacy sigmoid_trick; utils.misc)
        from sota_imagenet_tpu.utils.misc import apply_sigmoid_trick

        new_params = apply_sigmoid_trick(
            probe_state.params, num_classes=-(-int(cfg.loader.num_classes) // divisor)
        )
        probe_state = probe_state.replace(
            params=new_params,
            ema_params=jax.tree_util.tree_map(jnp.copy, new_params) if probe_state.ema_params is not None else None,
        )
        log.info("sigmoid_trick: classifier bias initialized to -log(C-1)")
    mask = wd_mask_fn(probe_state.params)

    def tx_factory(sched):
        tx = build_optimizer(dict(cfg.optim), sched, wd_mask=mask)
        if cfg.run.skip_nonfinite:
            # AMP-skip parity (reference callbacks.py:308-309): drop
            # non-finite updates instead of NaN-ing the params for good
            import optax

            tx = optax.apply_if_finite(tx, max_consecutive_errors=int(cfg.run.skip_nonfinite))
        return tx

    runner = Runner(
        model,
        criterion,
        tx_factory,
        lr_phases=lr_phases,
        callbacks=callbacks,
        accumulate_steps=cfg.run.accumulate_steps,
        ema_decay=cfg.run.ema_decay,
        remat=cfg.run.remat,
        input_dtype=input_dtype,
        rng=rng,
        image_sharding=img_sharding,
        # rendezvous-collective modes deadlock pipelined dispatch on the
        # virtual-CPU mesh (see Runner docstring); pure DP has no rendezvous
        serialize_dispatch=jax.default_backend() == "cpu"
        and (img_sharding is not None or mesh.shape["model"] > 1 or cfg.mesh.zero1),
    )
    runner.state = probe_state.replace(opt_state=runner.tx.init(probe_state.params))
    log.info(f"Model params: {count_parameters(runner.state.params) / 1e6:.2f}M")

    start_epoch = cfg.run.start_epoch
    if cfg.run.auto_resume and not cfg.run.resume:
        found = find_auto_resume(cfg.log.dir, cfg.log.exp_name)
        if found:
            cfg.run.resume = found
            log.info(f"auto_resume: found {cfg.run.resume}")
    if cfg.run.resume:
        runner.state, ckpt_epoch = load_checkpoint(cfg.run.resume, runner.state)
        # restored arrays are committed to one device; re-replicate over the mesh
        from sota_imagenet_tpu.parallel.mesh import replicate

        runner.state = jax.device_put(runner.state, replicate(mesh))
        log.info(f"Loaded checkpoint from {cfg.run.resume}")
        if cfg.run.load_start_epoch:
            start_epoch = ckpt_epoch

    if cfg.mesh.zero1:
        # ZeRO-1: optimizer state sharded over the data axis (parallel/mesh.py)
        from sota_imagenet_tpu.parallel.mesh import apply_zero1

        runner.state = apply_zero1(runner.state, mesh)
        log.info(f"ZeRO-1: optimizer state sharded over {mesh.shape['data']} data-parallel devices")

    if mesh.shape["model"] > 1:
        # head TP: class-partitioned logits/loss over the 'model' axis
        from sota_imagenet_tpu.parallel.mesh import apply_head_tp

        runner.state = apply_head_tp(runner.state, mesh, cfg.mesh.tp_params)
        log.info(f"Head TP: matching params class-sharded over {mesh.shape['model']} devices")

    data_manager = DataManager(cfg, mesh, rng=host_prng_key(cfg.random_seed or 0, 777), out_dtype=input_dtype)

    if cfg.run.evaluate:
        data_manager.set_stage(0)
        metrics = runner.evaluate(data_manager.val_loader)
        log.info(f"Eval: {metrics}")
        runner.close()
        return metrics

    for idx in range(len(data_manager)):
        data_manager.set_stage(idx)
        if data_manager.end_epoch <= start_epoch:
            continue
        runner.fit(
            data_manager.loader,
            data_manager.val_loader,
            epochs=data_manager.end_epoch,
            start_epoch=max(data_manager.start_epoch, start_epoch),
            steps_per_epoch=10 if cfg.debug else None,
            val_steps=20 if cfg.debug else None,
        )

    log.info(f"Model params: {count_parameters(runner.state.params) / 1e6:.2f}M")
    vm = runner.val_metrics
    if vm:
        log.info(f"Acc@1 {vm.get('Acc@1', 0):.3f} Acc@5 {vm.get('Acc@5', 0):.3f}")
    m = (time.time() - start_time) / 60
    log.info(f"Total time: {int(m / 60)}h {m % 60:.1f}m")
    # NOT master-gated: orbax saves are collective in multiprocess runs (each
    # shard written once by its owner; process 0 does the renames) — gating
    # would deadlock a pod. The reference's master-only torch.save
    # (train.py:183-184) doesn't translate.
    save_checkpoint(run_dir, runner.state, data_manager.tot_epochs, name="model_last.ckpt", block=True)
    runner.close()
    return vm



def export_main(argv=None):
    """`sota-export`: trained checkpoint -> serving artifact (StableHLO +
    params). Body shared with scripts/export_model.py (which remains for
    repo-checkout use); see utils/export.py for the artifact format."""
    parser = argparse.ArgumentParser(description="sota_imagenet_tpu exporter")
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--ema", action="store_true", help="export the EMA weights")
    parser.add_argument("--batch", default="poly", help="fixed batch size or 'poly' (symbolic)")
    parser.add_argument("--image-size", type=int, default=None)
    parser.add_argument(
        "--quantize",
        choices=["int8"],
        default=None,
        help="per-output-channel int8 weight quantization (~3-4x smaller artifact vs fp32)",
    )
    args = parser.parse_args(argv)

    if os.environ.get("JAX_PLATFORMS"):
        # the axon TPU plugin ignores the env var (CLAUDE.md); force it
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from sota_imagenet_tpu import config as C
    from sota_imagenet_tpu.config import instantiate
    from sota_imagenet_tpu.models.parametrize import ParametrizedModel, weight_standardization_fn
    from sota_imagenet_tpu.optim import build_optimizer
    from sota_imagenet_tpu.train import steps as steps_lib
    from sota_imagenet_tpu.train.checkpoint import load_checkpoint
    from sota_imagenet_tpu.utils.export import export_inference, resolve_final_image_size

    cfg = C.load(args.config, strict_env=False)
    model = instantiate(cfg.model)
    # the EFFECTIVE model: forward parametrizations are part of the trained
    # function (weights on disk are the RAW kernels), so the export must wrap
    # exactly like the trainer does — otherwise WS/spectral checkpoints would
    # serve un-normalized kernels
    if cfg.weight_standardization:
        model = ParametrizedModel(model, weight_standardization_fn(cfg.init_gamma))
    for clb_cfg in cfg.run.extra_callbacks or []:
        clb = instantiate(clb_cfg)
        fn = (clb.step_options() if hasattr(clb, "step_options") else {}).get("parametrization")
        if fn is not None:
            model = ParametrizedModel(model, fn)
    # val size follows the FINAL stage's train size (DataManager convention,
    # reference dali_dataloader.py:227-228)
    size = args.image_size or resolve_final_image_size(cfg)
    input_dtype = jnp.bfloat16 if cfg.run.bf16 else jnp.float32

    tx = build_optimizer(dict(cfg.optim), 0.1)
    state = steps_lib.init_state(
        model, tx, (2, size, size, 3), jax.random.PRNGKey(0),
        ema_decay=cfg.run.ema_decay, input_dtype=input_dtype,
        criterion=instantiate(cfg.criterion),
    )
    state, epoch = load_checkpoint(args.ckpt, state)
    params = state.ema_params if (args.ema and state.ema_params is not None) else state.params
    bstats = state.ema_batch_stats if (args.ema and state.ema_batch_stats is not None) else state.batch_stats
    variables = {"params": params}
    if bstats:
        variables["batch_stats"] = bstats

    bs = None if args.batch == "poly" else int(args.batch)
    out = export_inference(
        model, variables, args.out, image_size=size, batch_size=bs, input_dtype=input_dtype, quantize=args.quantize
    )
    print(
        f"exported epoch-{epoch} weights -> {out} (batch={'symbolic' if bs is None else bs}, size={size}"
        + (f", quantize={args.quantize}" if args.quantize else "")
        + ")"
    )
    return out


def records_main(argv=None):
    """`sota-records`: dataset-prep tool (reference create_records.py +
    resize_imagenet.py as one CLI). Subcommands:

      sota-records tfrecord <data_dir> [--out DIR] [--workers N]
      sota-records packed   <data_dir> [--out DIR] [--size 224] [--workers N]
                            [--crops-per-image K] [--val-full-crop]
      sota-records resize   <data_dir> [--size 512] [--workers N]
    """
    parser = argparse.ArgumentParser(description="sota_imagenet_tpu dataset prep")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("tfrecord", help="ImageFolder tree -> sharded TFRecords (+DALI-style .idx)")
    p.add_argument("data_dir")
    p.add_argument("--out", default=None)
    p.add_argument("--workers", type=int, default=os.cpu_count())

    p = sub.add_parser("packed", help="ImageFolder tree -> decode-free packed uint8 records")
    p.add_argument("data_dir")
    p.add_argument("--out", default=None)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--workers", type=int, default=os.cpu_count())
    p.add_argument("--crops-per-image", type=int, default=1)
    p.add_argument("--val-full-crop", action="store_true")

    p = sub.add_parser("resize", help="pre-resize an ImageFolder tree (reference resize_imagenet.py)")
    p.add_argument("data_dir")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--workers", type=int, default=os.cpu_count())

    args = parser.parse_args(argv)
    if args.cmd == "tfrecord":
        from sota_imagenet_tpu.data.records import create_records

        create_records(args.data_dir, out_dir=args.out, workers=args.workers)
    elif args.cmd == "packed":
        from sota_imagenet_tpu.data.packed import create_packed_records

        create_packed_records(
            args.data_dir,
            out_dir=args.out,
            image_size=args.size,
            workers=args.workers,
            crops_per_image=args.crops_per_image,
            full_crop=args.val_full_crop,
        )
    else:
        from sota_imagenet_tpu.data.resize_tool import main as resize_tool_main

        resize_tool_main([args.data_dir, "--size", str(args.size), "--workers", str(args.workers)])
