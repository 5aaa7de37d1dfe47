"""The fused (matmul-hoisted) eval-mode edge convolution must equal the
naive materialised form, including negative BN scales (the min-branch)."""
import jax
import jax.numpy as jnp
import numpy as np

from interpret_quality_tpu.models.common import BN_EPS
from interpret_quality_tpu.models.dgcnn import EdgeConv, graph_feature
from interpret_quality_tpu.ops.geometry import knn


def naive_edge_conv(x, idx, kernel, scale, bias, mean, var):
    e = graph_feature(x, idx)                    # (B, N, k, 2C)
    y = e @ kernel                               # (B, N, k, F)
    y = (y - mean) * jax.lax.rsqrt(var + BN_EPS) * scale + bias
    y = jnp.where(y >= 0, y, 0.2 * y)            # leaky relu 0.2
    return jnp.max(y, axis=2)


def test_fused_edge_conv_matches_naive():
    rng = np.random.RandomState(0)
    B, N, C, F, k = 2, 40, 5, 8, 6
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = knn(x[..., :3], k)

    kernel = rng.randn(2 * C, F).astype(np.float32)
    scale = rng.randn(F).astype(np.float32)      # mixed signs!
    scale[0] = -abs(scale[0])                    # force at least one negative
    bias = rng.randn(F).astype(np.float32)
    mean = rng.randn(F).astype(np.float32)
    var = (rng.rand(F) + 0.5).astype(np.float32)

    layer = EdgeConv(F)
    variables = {
        "params": {"kernel": jnp.asarray(kernel),
                   "bn_scale": jnp.asarray(scale),
                   "bn_bias": jnp.asarray(bias)},
        "batch_stats": {"bn_mean": jnp.asarray(mean),
                        "bn_var": jnp.asarray(var)},
    }
    fused = layer.apply(variables, x, idx, train=False)
    naive = naive_edge_conv(x, idx, jnp.asarray(kernel), jnp.asarray(scale),
                            jnp.asarray(bias), jnp.asarray(mean),
                            jnp.asarray(var))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(naive),
                               rtol=1e-4, atol=1e-5)


def test_edge_conv_train_mode_runs_and_updates_stats():
    rng = np.random.RandomState(1)
    B, N, C, F, k = 2, 20, 4, 6, 5
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = knn(x[..., :3], k)
    layer = EdgeConv(F)
    variables = layer.init(jax.random.PRNGKey(0), x, idx, train=False)
    out, mutated = layer.apply(variables, x, idx, train=True,
                               mutable=["batch_stats"])
    assert out.shape == (B, N, F)
    assert not np.allclose(np.asarray(mutated["batch_stats"]["bn_mean"]), 0)
