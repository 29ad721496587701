"""Global configuration: enable float64, choose default device behavior."""

import os

_initialized = False


def initialize() -> None:
    """Idempotent global JAX configuration.

    The whole framework computes in float64: the correctness gate is 1e-5 eV
    agreement on excitation energies, which requires f64 SCF and response
    algebra (the reference runs numpy/scipy f64 throughout).
    """
    global _initialized
    if _initialized:
        return
    import jax

    jax.config.update("jax_enable_x64", True)
    # The hosting image force-registers a TPU ("axon") backend via
    # sitecustomize and pins JAX_PLATFORMS; XTDDFT_PLATFORM provides a
    # reliable escape hatch (tests run on a virtual CPU mesh).
    platform = os.environ.get("XTDDFT_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    elif os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon sitecustomize programmatically pins the TPU backend,
        # overriding the env var; restore the caller's explicit CPU choice
        # (the driver's multi-chip dryrun runs on a virtual CPU mesh)
        jax.config.update("jax_platforms", "cpu")
    _initialized = True


def host_device_count() -> int:
    """Number of local JAX devices (virtual CPU devices under test config)."""
    import jax

    return len(jax.devices())


def is_tpu() -> bool:
    import jax

    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover - no devices at all
        return False
