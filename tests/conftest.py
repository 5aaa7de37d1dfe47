"""Test configuration: run everything on a virtual 8-device CPU mesh so that
multi-chip sharding paths are exercised without TPU hardware."""
import faulthandler
import os
import sys

# Force CPU: the ambient environment pins JAX_PLATFORMS to the single-client
# TPU tunnel ('axon'); tests must run on the virtual 8-device CPU mesh and
# must never contend for the tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"

# dump all thread stacks if anything wedges
faulthandler.dump_traceback_later(600, repeat=True)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
