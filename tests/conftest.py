import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (SURVEY.md §4).
#
# NOTE: this image's sitecustomize imports jax (TPU tunnel registration) in
# every python process, so env vars alone are too late — use config updates,
# which take effect as long as no backend has been initialized yet.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# XLA CPU's default matmul precision is bf16-like; numerical parity tests
# need exact f32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")
