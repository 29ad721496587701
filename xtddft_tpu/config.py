"""Global configuration: enable float64, choose default device behavior."""

import os

_initialized = False


def _host_fingerprint() -> str:
    """Short hash of the host CPU identity.  XLA:CPU caches AOT
    executables specialized to the compile machine's ISA extensions AND
    its LLVM tuning features (e.g. ``prefer-no-scatter``, derived from
    the CPU *model*, not from the cpuinfo flag list); the hosting VM can
    be re-provisioned between sessions onto a CPU with the same flags but
    a different model, and loading a stale cache then spams
    machine-feature-mismatch errors and risks SIGILL (seen in the r2
    multichip dryrun tail).

    /proc/cpuinfo alone is NOT a sufficient key on this hosting stack:
    the VM genericizes the model name ("Intel(R) Xeon(R) Processor @
    2.10GHz") and the flag list, while LLVM inside XLA queries CPUID
    directly — two differently-featured hosts (one AMX-capable, one not:
    the exact mismatch pair in the BENCH_r04 error tail) can present
    identical cpuinfo.  numpy performs the same runtime CPUID feature
    detection LLVM does, so its ``__cpu_features__`` dict (AVX512_SPR,
    AVX512_SKX, ... baseline groups resolve the real microarchitecture)
    is hashed in alongside cpuinfo + the jaxlib version."""
    import hashlib

    ident = []
    try:
        import jaxlib

        ident.append(getattr(jaxlib, "__version__", "?"))
    except Exception:
        pass
    try:
        # runtime CPUID detection (sees through the VM's genericized
        # cpuinfo; numpy._core is the non-deprecated alias of the same
        # module)
        from numpy._core._multiarray_umath import __cpu_features__

        ident.append("cpuid=" + ",".join(
            sorted(k for k, v in __cpu_features__.items() if v)))
    except Exception:
        pass
    try:
        seen = set()
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                key = line.split(":", 1)[0].strip()
                if key in ("model name", "cpu family", "model", "stepping",
                           "flags") and key not in seen:
                    seen.add(key)
                    val = line.split(":", 1)[1]
                    if key == "flags":
                        val = " ".join(sorted(val.split()))
                    ident.append(f"{key}={val.strip()}")
    except OSError:
        pass
    if not ident:
        return "generic"
    return hashlib.sha1("|".join(ident).encode()).hexdigest()[:10]


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
    # persistent compilation cache: the block-jitted differentiable
    # integral path compiles ~100s of small executables (once per
    # class-pair signature) — cache them on disk so FD harnesses, test
    # reruns, and future sessions skip recompilation entirely
    cache_dir = os.environ.get(
        "XTDDFT_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "xtddft_tpu_xla_" + _host_fingerprint()),
    )
    if cache_dir and cache_dir != "0":
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        except Exception:
            pass  # older jaxlib without the persistent cache: skip
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
