"""Results-aggregator details: Knife-category skip and interaction-sample
selection (reference final_result.py:200, tools/final_util.py:26-27)."""
import numpy as np
import pytest

from interpret_quality_tpu.config import ExperimentConfig


def _write_sample(exp_folder, name, rng, R=8, N=64, P=4):
    base = exp_folder / name
    (base / "trans_all").mkdir(parents=True)
    np.save(base / "region_id.npy", np.arange(N) % R)
    np.save(base / "trans_all" / "region_shapley_value.npy",
            rng.randn(P, R))
    return rng.rand(N, 3).astype(np.float32)


def test_smoothness_metric_skips_knife(tmp_path):
    from interpret_quality_tpu.results import cal_shapley_smoothness_metric

    cfg = ExperimentConfig(model="pointnet", dataset="shapenet",
                           num_points=64, num_regions=8,
                           checkpoints_root=str(tmp_path))
    rng = np.random.RandomState(0)
    exp = tmp_path / cfg.exp_folder.rstrip("/").split("/")[-1]
    names = ["Bag_aaa", "Knife_bbb", "Cap_ccc"]
    clouds = [_write_sample(exp, n, rng) for n in names]
    dataset = [(c, 0) for c in clouds]

    mean, std = cal_shapley_smoothness_metric(cfg, "trans", dataset, names)
    assert np.isfinite(mean)

    # removing the Knife sample must not change the metric (it was skipped)
    names2 = [names[0], names[2]]
    dataset2 = [dataset[0], dataset[2]]
    mean2, std2 = cal_shapley_smoothness_metric(cfg, "trans", dataset2,
                                                names2)
    assert mean == pytest.approx(mean2)
    assert std == pytest.approx(std2)


def test_selected_sample_indices_match_reference():
    from interpret_quality_tpu.attrib.interactions import \
        selected_sample_indices

    assert selected_sample_indices("modelnet10") == \
        [0, 3, 6, 9, 12, 15, 18, 21, 24, 27]
    assert selected_sample_indices("shapenet") == \
        [0, 3, 6, 9, 12, 15, 19, 21, 24, 27]


def test_region_ball_neighbors_empty_region_guard():
    """Empty regions (possible at toy scales) get no neighbours and are
    excluded from the smoothness metric instead of NaN-poisoning it."""
    import numpy as np

    from interpret_quality_tpu.results.tables import \
        cal_shapley_smoothness_metric_single_pc
    from interpret_quality_tpu.utils.region_geom import region_ball_neighbors

    rng = np.random.RandomState(0)
    N, R = 60, 8
    data = rng.randn(N, 3)
    region_id = rng.randint(0, R - 1, N)     # region R-1 left empty
    nb = region_ball_neighbors(data, region_id, R, coef=0.25)
    assert not nb[R - 1].any() and not nb[:, R - 1].any()
    assert nb[:R - 1].any(axis=1).all()      # non-empty regions self-match

    sv = rng.randn(5, R)
    metric, per_pose, denom = cal_shapley_smoothness_metric_single_pc(
        data, sv, region_id, num_regions=R)
    assert np.isfinite(metric) and np.isfinite(per_pose).all()

    # all-zero attributions: denominator guard keeps the metric finite
    metric0, per0, _ = cal_shapley_smoothness_metric_single_pc(
        data, np.zeros((5, R)), region_id, num_regions=R)
    assert metric0 == 0.0 and np.isfinite(per0).all()
