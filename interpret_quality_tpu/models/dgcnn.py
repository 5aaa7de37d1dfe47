"""DGCNN and GCNN classifiers.

DGCNN recomputes the kNN graph in *feature space* before every edge-conv
(reference models/dgcnn.py:51-120); GCNN reuses the *input-space* kNN graph
for all four layers (dgcnn.py:123-194) — structurally identical otherwise.

TPU-first edge convolution
--------------------------
The reference materialises edge features ``[x_j - x_i, x_i]`` of shape
(B, 2C, N, k) and convolves them (dgcnn.py:21-47) — the model family's peak
activation and its FLOP hot spot.  Because the 1x1 conv is linear, the matmul
hoists *above* the neighbour gather:

    [x_j - x_i, x_i] @ [W1; W2] = x_j @ W1 + x_i @ (W2 - W1)

so we precompute A = x @ W1 and B = x @ (W2 - W1) once per layer — two
(N, C) x (C, F) matmuls instead of an (N*k, 2C) x (2C, F) one, a ~k x FLOP
reduction — and the max over neighbours needs only gathered rows of A:

    max_k act(bn(edge))[n]  =  act(alpha * M + beta),
    M[n] = B[n] + (max_k A[idx[n, k]]   if alpha > 0
                   min_k A[idx[n, k]]   otherwise)

valid in eval mode because BatchNorm with running stats is a per-channel
affine map and LeakyReLU is monotone increasing.  The (B, N, k, C) tensor is
never materialised: the gather+max streams over k with an (B, N, F) running
extremum.  Training uses the naive path (batch statistics need the pre-max
activations) — attribution, the hot workload, is always eval-mode.
"""
from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import gather_value_parts
from ..ops.geometry import knn
from ..ops.pallas import gather_extrema, knn_gather_extrema, knn_pallas
from .common import BN_EPS, BN_MOMENTUM, ConvBN, leaky_relu02, on_tpu

_on_tpu = on_tpu


def graph_feature(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Edge features [x_j - x_i, x_i] for given neighbour indices.

    Args:
      x: (B, N, C);  idx: (B, N, k).
    Returns:
      (B, N, k, 2C).
    """
    neigh = jax.vmap(lambda f, i: f[i])(x, idx)          # (B, N, k, C)
    centre = jnp.broadcast_to(x[:, :, None, :], neigh.shape)
    return jnp.concatenate([neigh - centre, centre], axis=-1)


def _gather_rows(a: jnp.ndarray, idx_k: jnp.ndarray) -> jnp.ndarray:
    """a: (B, N, F), idx_k: (B, N) -> (B, N, F)."""
    return jax.vmap(lambda t, i: t[i])(a, idx_k)


class EdgeConv(nn.Module):
    """Edge convolution: graph feature -> 1x1 conv (no bias) + BN +
    LeakyReLU(0.2) -> max over the k neighbours.

    Parameters (converter-visible paths): kernel (2C, F), bn_scale, bn_bias;
    batch_stats: bn_mean, bn_var.
    """
    features: int
    k: int = 20

    @nn.compact
    def __call__(self, x, idx=None, graph_feat=None, train: bool = False,
                 fused: bool = False):
        """Eval path selects by arguments:

          * ``idx`` + ``fused=False`` — XLA hoisted-matmul gather loop;
          * ``idx`` + ``fused=True``  — Pallas one-hot-matmul gather
            (fixed graph / GCNN);
          * ``graph_feat`` + ``fused=True`` — fully fused Pallas
            kNN-selection + gather (dynamic graph / DGCNN); the distance
            matrix never leaves VMEM.

        The fused Pallas paths are not differentiable — the BIM attack and
        training use the XLA path.
        """
        B, N, C = x.shape
        k = idx.shape[-1] if idx is not None else self.k
        F = self.features
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2 * C, F))
        scale = self.param("bn_scale", nn.initializers.ones, (F,))
        bias = self.param("bn_bias", nn.initializers.zeros, (F,))
        ra_mean = self.variable("batch_stats", "bn_mean",
                                lambda: jnp.zeros((F,)))
        ra_var = self.variable("batch_stats", "bn_var",
                               lambda: jnp.ones((F,)))

        if train:
            e = graph_feature(x, idx)                    # (B, N, k, 2C)
            y = e @ kernel                               # (B, N, k, F)
            m = jnp.mean(y, axis=(0, 1, 2))
            v = jnp.var(y, axis=(0, 1, 2))
            n = B * N * k
            if not self.is_initializing():
                ra_mean.value = (BN_MOMENTUM * ra_mean.value
                                 + (1 - BN_MOMENTUM) * m)
                ra_var.value = (BN_MOMENTUM * ra_var.value
                                + (1 - BN_MOMENTUM) * v * n / max(n - 1, 1))
            y = (y - m) * jax.lax.rsqrt(v + BN_EPS)
            y = y * scale + bias
            return jnp.max(leaky_relu02(y), axis=2)

        # ---- eval path: matmul hoisted above the gather ----
        w1 = kernel[:C]
        w2 = kernel[C:]
        a = x @ w1                                       # (B, N, F)
        b = x @ (w2 - w1)                                # (B, N, F)
        if fused and graph_feat is not None:
            amax, amin = knn_gather_extrema(graph_feat, a, k,
                                            parts=gather_value_parts())
        elif fused:
            amax, amin = gather_extrema(idx, a, parts=gather_value_parts())
        else:
            amax = jnp.full_like(a, -jnp.inf)
            amin = jnp.full_like(a, jnp.inf)
            for j in range(k):
                g = _gather_rows(a, idx[..., j])
                amax = jnp.maximum(amax, g)
                amin = jnp.minimum(amin, g)
        alpha = scale * jax.lax.rsqrt(ra_var.value + BN_EPS)
        beta = bias - alpha * ra_mean.value
        m_ext = b + jnp.where(alpha > 0, amax, amin)
        return leaky_relu02(alpha * m_ext + beta)


class _DGCNNBase(nn.Module):
    num_classes: int = 10
    k: int = 20
    dynamic_graph: bool = True   # True: DGCNN, False: GCNN (fixed input graph)

    @nn.compact
    def __call__(self, x, train: bool = False, fused=None, plan=None):
        # x: (B, N, 3).  fused=None auto-selects the Pallas neighbour
        # kernels on TPU eval (they are not differentiable; the BIM attack
        # passes fused=False explicitly).  plan: precomputed input-space kNN
        # indices (B, N, k) from models.plans.dgcnn_plan — the layer-1 graph
        # for DGCNN, the shared fixed graph for GCNN; pose-invariant, so
        # perturbation enumeration builds it once and reuses it per pose.
        if fused is None:
            fused = (not train) and _on_tpu()
        convs = [EdgeConv(f, k=self.k, name=n) for f, n in
                 [(64, "conv1"), (64, "conv2"), (128, "conv3"),
                  (256, "conv4")]]
        if fused and self.dynamic_graph:
            # graph recomputed in feature space before each layer; the
            # distance matrix + selection + gather all stay in VMEM.
            if plan is not None:
                x1 = convs[0](x, idx=plan, fused=True)
            else:
                x1 = convs[0](x, graph_feat=x, fused=True)
            x2 = convs[1](x1, graph_feat=x1, fused=True)
            x3 = convs[2](x2, graph_feat=x2, fused=True)
            x4 = convs[3](x3, graph_feat=x3, fused=True)
        elif fused:
            fix_idx = plan if plan is not None else knn_pallas(x, x, self.k)
            x1 = convs[0](x, fix_idx, fused=True)
            x2 = convs[1](x1, fix_idx, fused=True)
            x3 = convs[2](x2, fix_idx, fused=True)
            x4 = convs[3](x3, fix_idx, fused=True)
        else:
            fix_idx = plan if plan is not None else knn(x, self.k)
            x1 = convs[0](x, fix_idx, train=train)
            idx2 = knn(x1, self.k) if self.dynamic_graph else fix_idx
            x2 = convs[1](x1, idx2, train=train)
            idx3 = knn(x2, self.k) if self.dynamic_graph else fix_idx
            x3 = convs[2](x2, idx3, train=train)
            idx4 = knn(x3, self.k) if self.dynamic_graph else fix_idx
            x4 = convs[3](x3, idx4, train=train)

        x = jnp.concatenate([x1, x2, x3, x4], axis=-1)   # (B, N, 512)
        x = ConvBN(1024, use_bias=False, act=leaky_relu02,
                   name="conv5")(x, train=train)          # (B, N, 1024)
        xmax = jnp.max(x, axis=1)
        xavg = jnp.mean(x, axis=1)
        x = jnp.concatenate([xmax, xavg], axis=-1)       # (B, 2048)

        x = nn.Dense(512, use_bias=False, name="linear1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, name="bn6")(x)
        x = leaky_relu02(x)
        x = nn.Dropout(0.5, deterministic=not train, name="dp1")(x)
        x = nn.Dense(256, name="linear2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, name="bn7")(x)
        x = leaky_relu02(x)
        x = nn.Dropout(0.5, deterministic=not train, name="dp2")(x)
        return nn.Dense(self.num_classes, name="linear3")(x)


class DGCNNCls(_DGCNNBase):
    dynamic_graph: bool = True


class GCNNCls(_DGCNNBase):
    dynamic_graph: bool = False
