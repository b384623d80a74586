"""Test harness configuration.

Multi-chip semantics are tested on a virtual 8-device CPU mesh — the
single-controller analogue of the reference's oversubscribed
``mpiexec -n 2/4`` runs (reference: tests/runtests.sh:14-37).
Must run before the first jax import; the environment may pin a TPU
platform via JAX_PLATFORMS, so the jax.config override is applied too.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
