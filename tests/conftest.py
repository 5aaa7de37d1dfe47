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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
assert len(jax.devices()) == 8 and jax.devices()[0].platform == "cpu"
