"""Re-derive bench.py's GFLOP_PER_FORWARD table.

Counts XLA cost-analysis FLOPs of each model's *unfused* eval forward
(the same math the reference's torch modules execute) at N=1024 and prints
GFLOP per single-cloud forward.  Run on CPU so the numbers are
hardware-independent:

    python scripts/model_flops.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from interpret_quality_tpu.models import build_model, init_model  # noqa: E402

B, N = 33, 1024

if __name__ == "__main__":
    for name in ["pointnet", "pointnet2", "pointconv", "dgcnn", "gcnn"]:
        model = build_model(name, num_classes=10)
        v = init_model(model, jax.random.PRNGKey(0), num_points=N)
        kw = {} if name == "pointnet" else {"fused": False}

        def f(v, x, model=model, kw=kw):
            out = model.apply(v, x, train=False, **kw)
            return out[0] if isinstance(out, tuple) else out

        x = jnp.zeros((B, N, 3), jnp.float32)
        compiled = jax.jit(f).lower(v, x).compile()
        flops = compiled.cost_analysis()["flops"]
        print(f'    "{name}": {flops / B / 1e9:.3f},')
