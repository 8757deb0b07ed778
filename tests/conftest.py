"""Test configuration: force a virtual 8-device CPU platform (SURVEY.md §4
"Distributed" test plan).

The container's sitecustomize pre-imports jax and registers the TPU backend
in every Python process, overriding JAX_PLATFORMS from the environment.
Backends initialize lazily, so flipping the config here — before any test
touches a device — reliably lands every test on 8 virtual CPU devices.
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(__file__))

# Persistent XLA compile cache: the suite is compile-dominated (~190 jitted
# programs); caching compiles across runs cuts repeat wall time several-fold.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
