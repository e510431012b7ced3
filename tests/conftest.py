"""Test harness config: CPU backend with 8 virtual devices, float64.

Sharding tests run on a simulated 8-device mesh
(``--xla_force_host_platform_device_count=8``) as SURVEY.md §4(d)
prescribes; the oracle-parity tests need f64.

Set ``SOS_RT_TPU_TESTS=1`` to keep the real (TPU) backend instead — the
mode for the compiled-kernel gates (tests/test_mega_tpu.py); most CPU
tests still pass there but the suite is not tuned for it, so the normal
invocations are:

    python -m pytest tests/ -x -q                       # CPU suite
    SOS_RT_TPU_TESTS=1 python -m pytest tests/test_mega_tpu.py -q   # TPU gate

NOTE: this environment's TPU plugin overrides JAX_PLATFORMS at interpreter
start (sitecustomize calls ``jax.config.update("jax_platforms", ...)``),
so the env var alone is not enough — we re-update the config after import.
"""
import os

TPU_MODE = os.environ.get("SOS_RT_TPU_TESTS", "") == "1"

if not TPU_MODE:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

if TPU_MODE:
    # persistent compile cache: Mosaic compiles are minutes-scale cold
    # on the relay (see BASELINE.md); x64 stays OFF (TPU is f32-native)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), os.pardir,
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
else:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
