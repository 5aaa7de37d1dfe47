"""Pallas FPS kernel vs the XLA reference implementation (interpret mode on
CPU; the same kernel compiles with Mosaic on TPU)."""
import jax.numpy as jnp
import numpy as np

from interpret_quality_tpu.ops.geometry import farthest_point_sample
from interpret_quality_tpu.ops.pallas import fps_pallas


def test_fps_pallas_matches_xla():
    rng = np.random.RandomState(0)
    xyz = rng.randn(3, 128, 3).astype(np.float32)
    want = np.asarray(farthest_point_sample(jnp.asarray(xyz), 16))
    got = np.asarray(fps_pallas(jnp.asarray(xyz), 16, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_fps_pallas_first_point_zero():
    rng = np.random.RandomState(1)
    xyz = rng.rand(2, 64, 3).astype(np.float32)
    got = np.asarray(fps_pallas(jnp.asarray(xyz), 8, interpret=True))
    assert (got[:, 0] == 0).all()
