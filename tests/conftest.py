import os

# Tests run on a virtual 8-device CPU mesh with native float64 so that
# physics regression comparisons are meaningful; TPU benchmarking is
# exercised separately via bench.py.
# force CPU even when the harness presets JAX_PLATFORMS (e.g. axon/TPU):
# physics regression comparisons need native float64
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# something in the environment preloads jax_platforms="axon,cpu"; force CPU
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persist CPU test executables across runs (keyed by backend + program,
# so TPU entries coexist); big win on this 1-core host
from aither_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

REF_CASES = "/root/reference/testCases"
