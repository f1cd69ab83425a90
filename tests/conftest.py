"""Test config: 8 virtual CPU devices so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md §4 implication)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = flags + " --xla_force_host_platform_device_count=8"
if "collective_call_terminate_timeout" not in flags:
    # the CPU runtime hard-aborts collectives whose participants don't all
    # arrive within 40s; on this 1-core host a concurrent compile can starve
    # a device thread past that (see train.py main for the full note)
    flags = flags + " --xla_cpu_collective_call_terminate_timeout_seconds=600"
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

# the axon TPU plugin ignores the JAX_PLATFORMS env var; force via config
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from sota_imagenet_tpu.parallel.mesh import create_mesh

    return create_mesh()


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)
