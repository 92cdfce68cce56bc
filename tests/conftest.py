import os
import sys

# Tests run on a virtual 8-device CPU mesh with float64 enabled so golden
# numbers from the reference (10-digit norms) are reproducible; TPU runs use
# float32/bf16 via Config.dtype.
# Hard override: the container environment pins JAX_PLATFORMS to the TPU
# plugin; golden-parity tests must run on CPU in float64.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
