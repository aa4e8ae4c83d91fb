import os

# Virtual multi-device CPU mesh for sharding tests; must be set before the
# backend initializes.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

# The environment pins JAX_PLATFORMS=axon (one real TPU via tunnel); tests run
# on CPU in float64 for golden-accuracy comparisons.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
