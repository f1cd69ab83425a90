"""SAM perturbation math oracle (reference callbacks.py:279-419)."""

import jax
import jax.numpy as jnp
import numpy as np

from sota_imagenet_tpu.losses.base import FnLoss
from sota_imagenet_tpu.models.cmodel import CModel
from sota_imagenet_tpu.optim import build_optimizer
from sota_imagenet_tpu.train import steps as steps_lib


def _linear_setup():
    """y = W·mean(x): quadratic loss gives analytically known grads."""
    model = CModel(
        layer_config=[
            {"module": "FastGlobalAvgPool2d", "kwargs": {"flatten": True}},
            {"module": "Linear", "args": [3, 4]},
        ]
    )
    crit = FnLoss(lambda logits, labels: jnp.mean((logits - labels) ** 2))
    sched = lambda s: jnp.asarray(1.0, jnp.float32)
    tx = build_optimizer({"_target_": "sgd"}, sched)
    rng = jax.random.PRNGKey(0)
    state = steps_lib.init_state(model, tx, (2, 4, 4, 3), rng)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 4, 3))
    y = jax.random.normal(jax.random.PRNGKey(2), (8, 4))
    return model, crit, tx, sched, state, {"image": x, "label": y}, rng


def _numpy_grads(params, batch):
    """closed-form grads of mean((W·m + b - y)^2) wrt W (in,out) and b."""
    m = np.asarray(batch["image"]).mean(axis=(1, 2))  # (B, 3)
    W = np.asarray(params["Linear_0"]["Dense_0"]["kernel"])  # (3, 4)
    b = np.asarray(params["Linear_0"]["Dense_0"]["bias"])
    y = np.asarray(batch["label"])
    r = m @ W + b - y  # (B, 4)
    n = r.size
    gW = 2.0 * m.T @ r / n
    gb = 2.0 * r.sum(0) / n
    return gW, gb


def test_asam_unitwise_perturbation():
    """eps = rho * clip(unitwise||p||,1e-3) / clip(unitwise||g||,1e-5) * g,
    grads taken at p+eps (reference callbacks.py:385-404)."""
    model, crit, tx, sched, state, batch, rng = _linear_setup()
    rho = 0.05
    step = steps_lib.build_train_step(
        model, crit, tx, sched, input_dtype=jnp.float32, sam={"kind": "asam_unitwise", "rho": rho}
    )
    new_state, _ = step(state, batch, rng)

    p = {k: np.asarray(v) for k, v in state.params["Linear_0"]["Dense_0"].items()}
    gW, gb = _numpy_grads(state.params, batch)
    # unitwise norms: for (in,out) kernels our convention norms over all axes
    # except the last (output) axis -> per-output-column norms
    pW_norm = np.maximum(np.linalg.norm(p["kernel"], axis=0, keepdims=True), 1e-3)
    gW_norm = np.maximum(np.linalg.norm(gW, axis=0, keepdims=True), 1e-5)
    epsW = rho * pW_norm / gW_norm * gW
    pb_norm = np.maximum(np.linalg.norm(p["bias"]), 1e-3)
    gb_norm = np.maximum(np.linalg.norm(gb), 1e-5)
    epsb = rho * pb_norm / gb_norm * gb

    # second grads at the perturbed point, then SGD with lr=1
    pert = dict(state.params)
    pert = {"Linear_0": {"Dense_0": {"kernel": jnp.asarray(p["kernel"] + epsW), "bias": jnp.asarray(p["bias"] + epsb)}}}
    gW2, gb2 = _numpy_grads(pert, batch)
    np.testing.assert_allclose(
        np.asarray(new_state.params["Linear_0"]["Dense_0"]["kernel"]), p["kernel"] - 1.0 * gW2, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_state.params["Linear_0"]["Dense_0"]["bias"]), p["bias"] - 1.0 * gb2, rtol=1e-4, atol=1e-5
    )


def test_sam_original_scale():
    """SAMOriginal: global scale rho/||g_w||, eps = clamp(p^2,eta)·g·scale for
    ndim>1 else g·scale (reference callbacks.py:297-306,326-337)."""
    model, crit, tx, sched, state, batch, rng = _linear_setup()
    rho, eta = 0.5, 0.01
    step = steps_lib.build_train_step(
        model, crit, tx, sched, input_dtype=jnp.float32, sam={"kind": "sam_original", "rho": rho, "eta": eta}
    )
    new_state, _ = step(state, batch, rng)

    p = {k: np.asarray(v) for k, v in state.params["Linear_0"]["Dense_0"].items()}
    gW, gb = _numpy_grads(state.params, batch)
    tw_W = gW * np.maximum(np.abs(p["kernel"]), eta)  # ndim>1 weighting
    gnorm = np.sqrt((tw_W**2).sum() + (gb**2).sum())
    scale = rho / max(gnorm, 2e-5)
    epsW = np.maximum(p["kernel"] ** 2, eta) * gW * scale
    epsb = gb * scale
    pert = {"Linear_0": {"Dense_0": {"kernel": jnp.asarray(p["kernel"] + epsW), "bias": jnp.asarray(p["bias"] + epsb)}}}
    gW2, gb2 = _numpy_grads(pert, batch)
    np.testing.assert_allclose(
        np.asarray(new_state.params["Linear_0"]["Dense_0"]["kernel"]), p["kernel"] - gW2, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(new_state.params["Linear_0"]["Dense_0"]["bias"]), p["bias"] - gb2, rtol=1e-4, atol=1e-5)
