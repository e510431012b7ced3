"""Test harness config: CPU backend with 8 virtual devices, float64.

Sharding tests run on a simulated 8-device mesh
(``--xla_force_host_platform_device_count=8``) as SURVEY.md §4(d)
prescribes; the oracle-parity tests need f64.

NOTE: this environment's TPU plugin overrides JAX_PLATFORMS at interpreter
start (sitecustomize calls ``jax.config.update("jax_platforms", ...)``),
so the env var alone is not enough — we re-update the config after import.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
