"""Test harness config: CPU backend with 8 virtual devices.

The CI/test story (SURVEY.md §4): pure-JAX unit tests run on the CPU backend
(the "fake backend" — no TPU needed), and multi-chip logic is exercised on a
forced 8-device host mesh. The real TPU is only touched by bench.py.

NOTE: this environment ships an experimental 'axon' TPU platform plugin that
ignores the JAX_PLATFORMS *environment variable*; `jax.config.update` does
work, so we force CPU here before any test imports jax arrays.
"""

import os

_FLAG = "--xla_force_host_platform_device_count=8"
if _FLAG not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " " + _FLAG
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
