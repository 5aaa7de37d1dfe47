"""Visualization helpers (reference tools/visulization.py): colormaps,
region scatter, FPS-centre viewer — smoke-render to files."""
import os

import numpy as np

from interpret_quality_tpu.results.visualization import (red_gray_blue_cmp,
                                                         scatter_regions,
                                                         turbo_cmp,
                                                         visualize_fps_center)


def test_colormaps():
    # endpoints of the reference's red-gray-blue ramp
    lo = np.array(red_gray_blue_cmp(0.0))
    hi = np.array(red_gray_blue_cmp(1.0))
    assert lo[0] > lo[2], "low end is red"
    assert hi[2] > hi[0], "high end is blue"
    assert turbo_cmp.N >= 256


def test_scatter_regions(tmp_path):
    rng = np.random.RandomState(0)
    data = rng.randn(200, 3).astype(np.float32)
    region_id = rng.randint(0, 8, 200)
    values = rng.randn(8)
    out = scatter_regions(data, values, region_id,
                          str(tmp_path / "regions.png"),
                          title="t", region_bold=3)
    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_visualize_fps_center(tmp_path):
    rng = np.random.RandomState(1)
    data = rng.randn(200, 3).astype(np.float32)
    fps_index = np.arange(16)
    out = visualize_fps_center(data, fps_index, str(tmp_path / "fps.png"))
    assert os.path.exists(str(tmp_path / "fps.png"))
