"""Test harness: force an 8-device virtual CPU mesh.

SURVEY §4 "Implication for the new framework": multi-device behavior is
exercised on CPU via ``xla_force_host_platform_device_count`` — the TPU
analogue of a fake backend. Must run before jax initialises its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_timeout" not in flags:
    # XLA:CPU aborts the process when a virtual device's thread arrives
    # >40 s late at a collective rendezvous; on a 2-core box running an
    # 8-device mesh a straggling round is routine, not a deadlock
    flags = (flags + " --xla_cpu_collective_timeout_seconds=600").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; force CPU via the config too
# (must happen before any backend is initialised).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# NOTE: do NOT enable jax_compilation_cache_dir here — the XLA:CPU AOT
# loader rejects its own cache entries on this host (machine-feature
# mismatch spam, SIGILL risk) and the suite is execution-bound anyway.
