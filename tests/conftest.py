import os
import sys

# Tests run on a virtual 8-device CPU mesh with float64 enabled so golden
# numbers from the reference (10-digit norms) are reproducible; TPU runs use
# float32/bf16 via Config.dtype.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)
os.environ.setdefault("JAX_ENABLE_X64", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
