"""The reference's legacy graveyard (`configs/_old_configs/*`, 130 flat-schema
files) ported into the StrictConfig schema under `configs/old_exp/` by
scripts/port_legacy_configs.py. Unlike the reference — where these rotted into
an unrunnable state — every ported file must load, validate, and build.

Reference: /root/reference/configs/_old_configs/{_exp1-85_configs,
_exp85-114_configs,_first_attempts}/.
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sota_imagenet_tpu import config as C
from sota_imagenet_tpu.config import instantiate, parse_stages
from sota_imagenet_tpu.optim import build_optimizer
from sota_imagenet_tpu.train.schedule import phases_from_stages

pytestmark = pytest.mark.slow  # heavy tier: excluded from `make test-fast`

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs", "old_exp")
ALL = sorted(glob.glob(os.path.join(CONFIG_DIR, "*", "*.yaml")))


def _is_commented(path: str) -> bool:
    """Abandoned experiments are kept fully commented, like the reference."""
    with open(path) as f:
        return all(not ln.strip() or ln.strip().startswith("#") for ln in f)


ACTIVE = [p for p in ALL if not _is_commented(p)]
COMMENTED = [p for p in ALL if _is_commented(p)]


def test_inventory_complete():
    """Every legacy reference YAML (minus legacy_phases.py) must have a ported
    counterpart under the same basename."""
    ref_root = "/root/reference/configs/_old_configs"
    if not os.path.isdir(ref_root):
        pytest.skip("reference tree not available")
    ref = set()
    for sub in ("_exp1-85_configs", "_exp85-114_configs", "_first_attempts"):
        for f in os.listdir(os.path.join(ref_root, sub)):
            if f.endswith((".yaml", ".yml")):
                ref.add(os.path.splitext(f)[0])
    ours = {os.path.splitext(os.path.basename(p))[0] for p in ALL}
    missing = sorted(ref - ours)
    assert not missing, f"unported legacy configs: {missing}"
    assert len(ALL) >= 125


@pytest.mark.parametrize(
    "path", ACTIVE, ids=[os.path.basename(os.path.dirname(p)) + "/" + os.path.basename(p) for p in ACTIVE]
)
def test_old_config_loads_and_builds(path):
    cfg = C.load(path, strict_env=False)
    stages = parse_stages(cfg.run.stages)
    phases_from_stages(stages)
    # classifier width follows the merged label space (train.py:124-137)
    model_cfg = dict(cfg.model)
    divisor = max(int(cfg.loader.get("classes_divisor", 1) or 1), 1)
    n_cls = -(-int(cfg.loader.num_classes) // divisor)
    if divisor > 1 and "num_classes" not in model_cfg:
        model_cfg["num_classes"] = n_cls
    model = instantiate(model_cfg)
    instantiate(cfg.criterion)
    build_optimizer(dict(cfg.optim), 0.1)
    for clb in cfg.run.extra_callbacks or []:
        instantiate(clb)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape[0] == 1 and out.shape[-1] == n_cls
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_commented_files_stay_commented():
    """Reference keeps 2 abandoned experiments fully commented; so do we."""
    assert len(COMMENTED) >= 2


# --------------------------------------------------------------------------- #
# one REAL jitted train step per legacy family (the graveyard's own regression
# harness — the reference never had one, which is why these configs rotted)
# --------------------------------------------------------------------------- #

TRAIN_STEP_CONFIGS = [
    # binary focal + cutmix + sigmoid_trick (this combination exposed the
    # Beta(0,0) NaN in cutmix_mixup during the port)
    "exp1-85/exp68.BNet_no_dim_red_focal.yaml",
    "exp1-85/exp53.GEnet_wider_mlp2.yaml",  # per-layer mlp_2 head
    "exp1-85/exp46.GENet_preact_Btl_last_fixed.yaml",  # grouped Btl stage
    "exp85-114/exp96.BNet_d-softmax.yaml",  # my_loss_1 (sphere head)
    "exp85-114/exp88.BNet_norm_temp.yaml",  # normalized+tempered CE
    "first_attempts/densenet121_baseline.yaml",  # step-schedule port
]


@pytest.mark.parametrize("name", TRAIN_STEP_CONFIGS)
def test_legacy_config_trains_one_step(name):
    from sota_imagenet_tpu.data.pipeline import DeviceFeed, SyntheticLoader
    from sota_imagenet_tpu.ops.augment import build_train_augment
    from sota_imagenet_tpu.parallel.mesh import create_mesh
    from sota_imagenet_tpu.train.loop import Runner
    from sota_imagenet_tpu.train.schedule import phases_from_stages
    from sota_imagenet_tpu.utils.misc import apply_sigmoid_trick

    cfg = C.load(os.path.join(CONFIG_DIR, name), strict_env=False)
    model = instantiate(cfg.model)
    criterion = instantiate(cfg.criterion)
    callbacks = [instantiate(c) for c in (cfg.run.extra_callbacks or [])]
    stages = parse_stages([dict(start=0, end=1, lr=[0.01, 0.01])])
    runner = Runner(
        model,
        criterion,
        lambda sched: build_optimizer(dict(cfg.optim), sched),
        lr_phases=phases_from_stages(stages),
        input_dtype=jnp.float32,
        callbacks=[c for c in callbacks if hasattr(c, "step_options")],
    )
    runner.init_state((4, 32, 32, 3))
    if cfg.get("sigmoid_trick"):
        runner.state = runner.state.replace(params=apply_sigmoid_trick(runner.state.params))
    mesh = create_mesh()
    host = SyntheticLoader(batch_size=8, image_size=32, num_classes=cfg.loader.num_classes, length=2)
    feed = DeviceFeed(host, mesh, build_train_augment(num_classes=cfg.loader.num_classes, out_dtype=jnp.float32))
    train_m, _ = runner.fit(feed, None, epochs=1, start_epoch=0)
    assert np.isfinite(train_m["loss"]), train_m
    assert np.isfinite(train_m["grad_norm"]), train_m
