import os

# Tests run on a virtual 8-device CPU mesh: sharding logic is validated
# without TPU hardware; bench.py (not tests) runs on the real chip.
#
# NOTE: jax is already imported at interpreter startup in this image (a
# site hook), so env vars alone are too late; jax.config.update works as
# long as no backend has been initialized yet. The axon TPU plugin also
# ignores JAX_PLATFORMS — only jax_platform_name reliably forces CPU.
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platform_name", "cpu")
# CPU compiles dominate the suite's ~40 min runtime; the persistent cache
# makes warm re-runs much faster (same cache dir as bench.py)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/waldo_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
