"""Test configuration: run everything on a virtual 8-device CPU mesh so that
multi-chip sharding paths are exercised without TPU hardware.

This environment's site hook (axon PJRT plugin) force-registers the TPU
tunnel backend and overrides jax_platforms to "axon,cpu" in every
interpreter, so neither JAX_PLATFORMS nor XLA_FLAGS env vars are honoured —
the config must be overridden after `import jax`, before any backend
initialises.  The tunnel admits a single client; tests must never touch it.
"""
import faulthandler
import os
import sys

faulthandler.dump_traceback_later(900, repeat=True)

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)

# Keep the CPU test cache separate from .jax_cache: TPU runs go through the
# axon tunnel, whose remote host writes CPU AOT entries compiled for a
# *different* machine type into the shared dir — loading those locally is
# pathologically slow (machine-feature mismatch forces deserialise+reject).
os.environ.setdefault("IQTPU_COMPILE_CACHE",
                      os.path.join(_repo, ".jax_cache_cpu"))

# XLA:CPU in-process collectives abort the whole process ("Termination
# timeout ... exceeded. Exiting to ensure a consistent program state") when
# the 8 per-device threads miss the default rendezvous deadline — which
# happens spuriously on small/contended CI hosts (this box has 1 core).
# Raise the deadlines; a genuinely deadlocked test is still caught by the
# faulthandler dump + pytest timeout above.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
    + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
    + " --xla_cpu_collective_timeout_seconds=3600")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
assert len(jax.devices()) == 8 and jax.devices()[0].platform == "cpu"


# ---------------------------------------------------------------------------
# Reference-oracle helpers (shared by the test_parity_* modules)
# ---------------------------------------------------------------------------
REF_ROOT = "/root/reference"
HAS_REFERENCE = os.path.isdir(os.path.join(REF_ROOT, "tools"))


def ref_module(name):
    """Import a module from the read-only reference tree by package path."""
    import importlib
    sys.path.insert(0, REF_ROOT)
    try:
        return importlib.import_module(name)
    finally:
        sys.path.remove(REF_ROOT)


import contextlib  # noqa: E402


@contextlib.contextmanager
def fp32_matmuls_ctx():
    """fp32-exact matmuls for parity vs torch fp32 (wrap in a module-scoped
    autouse fixture inside each parity module that needs it)."""
    prev = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        yield
    finally:
        jax.config.update("jax_default_matmul_precision",
                          prev if prev is not None else "default")
