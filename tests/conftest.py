"""Test configuration: run everything on a virtual 8-device CPU mesh.

The axon TPU plugin registers itself regardless of JAX_PLATFORMS, so merely
setting the env var is not enough — we also pin jax's default device to CPU
after import. (The reference's analogue is compiling the same sources twice
for the C and ASM backends, test/Makefile:43-64 — here one backend runs on
CPU for CI and the identical code runs on TPU in production/bench.)"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Restrict backend discovery to CPU BEFORE any device query: merely pinning
# jax_default_device still initializes the axon TPU plugin, whose tunnel
# handshake costs ~60 s per pytest worker process (measured). The
# jax_platforms *config* (unlike the JAX_PLATFORMS env var, which the
# plugin ignores) prevents that backend from being brought up at all.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_device", jax.devices("cpu")[0])
jax.config.update("jax_platform_name", "cpu")

# Persistent compilation cache: the suite's cost is dominated by XLA compiles
# of the scan-heavy ladder/sign/verify graphs; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_curve25519")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# NOTE (round 4): compiling two of the monster graphs (pallas-interpret
# whole-protocol kernels, the 8-device shard_map pipeline) CONCURRENTLY on
# this 2-core host segfaults XLA:CPU nondeterministically (cold caches,
# observed at backend_compile_and_load in slow-tier tests; solo runs always
# pass). `make test-all` therefore runs the slow tier serially after the
# parallel fast pass — keep big-compile tests marked @pytest.mark.slow.
