"""interpret_quality_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
interpreting representation quality of DNNs for 3D point-cloud processing.

Re-designed from scratch for TPU with the same capabilities as the reference
PyTorch pipeline (ada-shen/Interpret_quality, NeurIPS 2021):

  * train 6 point-cloud classifiers (PointNet, PointNet++ MSG, PointConv,
    DGCNN, GCNN, adv-GCNN) on ModelNet10 / 10-class ShapeNet-Part,
  * partition clouds into 32 FPS regions,
  * estimate region Shapley values via masked coalitions,
  * enumerate rigid-body / scale / smoothness perturbations,
  * estimate multi-order pairwise interactions,
  * aggregate sensitivity / correlation / smoothness tables and plots.

Design stance (TPU-first, not a port):
  * All attribution hot loops are expressed as tensor algebra (keep-matrix
    gathers + `where`) batched over a coalition axis and run through a single
    jitted forward — no per-order host syncs.
  * Geometry ops (FPS / kNN / ball-query / density) are pure jittable
    functions whose inner products map onto the MXU.
  * Multi-chip scaling shards the coalition axis over a `jax.sharding.Mesh`
    (the reference's `nn.DataParallel` has no analog here: attribution was
    strictly single-GPU upstream; on TPU the coalition axis is the
    parallelism axis).
"""

__version__ = "0.1.0"


def _enable_compile_cache():
    """Persistent XLA/Mosaic compilation cache.

    Coalition-batch programs take minutes to compile on the first run (the
    Mosaic kernels are AOT-compiled through the TPU tunnel); the persistent
    cache makes every later process start instant.  Verified to work through
    the axon remote-compile path.
    """
    import os

    try:
        import jax

        cache_dir = os.environ.get(
            "IQTPU_COMPILE_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"))
        if cache_dir and cache_dir != "0":
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
    except Exception:         # never block import on cache plumbing
        pass


def _select_platform():
    """``IQTPU_PLATFORM=cpu[:N]`` forces the JAX backend (and an optional
    virtual device count) from the environment.

    This environment's site hook force-registers the TPU tunnel backend and
    ignores ``JAX_PLATFORMS``/``XLA_FLAGS`` env vars, so scripts that must
    run CPU-only (tests, data prep, fallback runs while the tunnel is down)
    need an in-process override before the backend initialises — importing
    this package early enough does it.
    """
    import os

    spec = os.environ.get("IQTPU_PLATFORM")
    if not spec:
        return
    import warnings

    try:
        import jax

        platform, _, n = spec.partition(":")
        jax.config.update("jax_platforms", platform)
        if n:
            jax.config.update("jax_num_cpu_devices", int(n))
    except Exception as e:   # a half-applied override must not be silent
        warnings.warn(f"IQTPU_PLATFORM={spec!r} not applied: {e!r}")


_enable_compile_cache()
_select_platform()
