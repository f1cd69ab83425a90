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
