"""Platform/dtype helpers.

The deployment container pins ``JAX_PLATFORMS`` to the TPU plugin via
sitecustomize; golden-parity runs need CPU + float64, benchmarks need the
TPU + float32.  These helpers must be called before the first JAX
computation (backend init is sticky).
"""

from __future__ import annotations

import os


def use_cpu(x64: bool = True, virtual_devices: int = 0) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    if virtual_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={virtual_devices}"
        )
    import jax
    jax.config.update("jax_platforms", "cpu")
    if x64:
        jax.config.update("jax_enable_x64", True)


def use_tpu() -> None:
    import jax
    # container default: the axon TPU plugin; nothing to do beyond ensuring
    # x64 stays off (TPUs have no native float64)
    jax.config.update("jax_enable_x64", False)


def enable_compile_cache(path: str = None) -> None:
    """Enable JAX's persistent compilation cache (verified to work with
    the axon remote-compile TPU plugin: the FE-error device loop costs
    ~46 s to compile per process, ~0 from cache).  Safe to call multiple
    times; respects an explicit JAX_COMPILATION_CACHE_DIR."""
    import jax
    if path is None:
        path = os.environ.get(
            "CGMG_JAX_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "coulomb_gmg_jax"))
    try:
        if not jax.config.jax_compilation_cache_dir:
            jax.config.update("jax_compilation_cache_dir", path)
        # 0, NOT the default 1.0: the axon plugin's client-side compile()
        # returns almost instantly (the expensive AOT compile happens in
        # the REMOTE service), so a min-compile-time threshold filters out
        # exactly the kernels that are expensive to rebuild (measured:
        # _tile_call never persisted at 2.0 while its remote compile cost
        # 40-78 s per process).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass     # older jaxlib without the knobs: compile-cache is advisory


def default_dtype():
    import jax.numpy as jnp
    import jax
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def init_distributed(coordinator: str = None, num_processes: int = None,
                     process_id: int = None) -> None:
    """Initialize ``jax.distributed`` for multi-host device meshes.

    The TPU-native analogue of the reference's ``MPI_InitFinalize``
    (src/main.cc:8): after this, ``jax.devices()`` spans every host's chips
    and the sharded solvers' collectives (parallel/sharded*.py) ride
    ICI/DCN across the whole slice.  Arguments default to the JAX
    environment conventions (COORDINATOR_ADDRESS etc. / TPU metadata);
    call before any other JAX computation.  No-op if already initialized.
    """
    import jax
    try:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        if "already initialized" not in str(e).lower():
            raise
