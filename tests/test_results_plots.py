"""Results visualisation and interaction-plot helpers (reference
tools/visulization.py, plot_interaction.py) on synthetic artifacts."""
import os

import numpy as np
import pytest

from interpret_quality_tpu.config import ExperimentConfig

N, R = 64, 8


def test_scatter_regions_and_fps_viewer(tmp_path):
    from interpret_quality_tpu.results.visualization import (
        red_gray_blue_cmp, scatter_regions, turbo_cmp, visualize_fps_center)

    rng = np.random.RandomState(0)
    data = rng.randn(N, 3).astype(np.float32)
    region_id = rng.randint(0, R, N)
    values = rng.randn(R).astype(np.float32)
    out = str(tmp_path / "regions.png")
    scatter_regions(data, values, region_id, out, title="t",
                    cmap=red_gray_blue_cmp, region_bold=2)
    assert os.path.getsize(out) > 0
    out2 = str(tmp_path / "fps.png")
    visualize_fps_center(data, np.arange(R), out2)
    assert os.path.getsize(out2) > 0
    assert turbo_cmp(0.5) is not None


@pytest.fixture()
def interaction_artifacts(tmp_path):
    """Write the ratio<r>_{gt|pred}_interaction.npy artifact tree that
    plot_interaction consumes (reference plot_interaction.py:24-56)."""
    from interpret_quality_tpu.attrib.interactions import RATIOS

    cfg = ExperimentConfig(model="pointnet", dataset="modelnet10", seed=1,
                           checkpoints_root=str(tmp_path / "ckpt"))
    rng = np.random.RandomState(1)
    names = [f"synthetic_{i:02d}" for i in range(30)]
    from interpret_quality_tpu.config import MODELNET_INTER_SELECTED_SAMPLE
    for i in MODELNET_INTER_SELECTED_SAMPLE:
        base = cfg.exp_folder + f"{names[i]}/interaction_seed{cfg.seed}/"
        for sub in ("normal", "rotate_adv",
                    "rotate_adv_single_region/rangeRank_01_region_03/normal"):
            os.makedirs(base + sub, exist_ok=True)
            for ratio in RATIOS:
                for t in ("gt", "pred"):
                    np.save(base + sub + "/ratio%d_%s_interaction.npy"
                            % (int(ratio * 100), t),
                            rng.randn(5, 7).astype(np.float32))
    return cfg, names


def test_interaction_plot_helpers(interaction_artifacts, tmp_path):
    from interpret_quality_tpu.results.plots import (
        get_interaction_normal_adv_pose, plot_normal_vs_adv,
        plot_single_region_vs_normal_avg)

    cfg, names = interaction_artifacts
    mean_n, abs_n, mean_a, abs_a = get_interaction_normal_adv_pose(
        cfg, "rotate", names)
    assert mean_n.shape == abs_n.shape == mean_a.shape == abs_a.shape
    assert mean_n.shape[0] == 10 and np.isfinite(mean_n).all()

    fig_root = str(tmp_path / "figs")
    plot_normal_vs_adv(cfg, "rotate", names, fig_root=fig_root)
    plot_single_region_vs_normal_avg(cfg, "rotate", names, fig_root=fig_root)
    figs = [os.path.join(dp, f) for dp, _, fs in os.walk(fig_root) for f in fs]
    assert figs, "no figures written"

