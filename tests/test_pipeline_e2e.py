"""End-to-end pipeline test: FPS partition -> Shapley init -> perturbation
enumeration -> pair/context generation -> interaction logits -> interaction
scores -> results tables, all on the synthetic eval set with a random-init
PointNet at reduced sizes.  Exercises the full artifact chain the reference
CLIs produce/consume (SURVEY.md §1 schema).
"""
import os

import numpy as np
import pytest

from interpret_quality_tpu.config import ExperimentConfig


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    cwd = os.getcwd()
    os.chdir(d)
    yield str(d)
    os.chdir(cwd)


@pytest.fixture(scope="module")
def cfg(workdir):
    return ExperimentConfig(
        model="pointnet", dataset="modelnet10", seed=1,
        num_points=128, num_samples_save=20, num_samples=10,
        shapley_batch_size=10, interaction_batch_size=8,
        checkpoints_root=workdir + "/checkpoints")


SAMPLES = [0, 1]


def test_full_pipeline(cfg, workdir):
    from interpret_quality_tpu.attrib.interactions import (
        run_cal_interactions, run_gen_pair, run_interaction_logits)
    from interpret_quality_tpu.attrib.stages import (run_enum,
                                                     run_shapley_init,
                                                     save_fps)
    from interpret_quality_tpu.pipeline import resolve_dataset
    from interpret_quality_tpu.results import (
        cal_correlation_coef, cal_sensitivity_all_pc,
        cal_shapley_smoothness_metric_single_pc)

    R = cfg.num_regions
    S = cfg.num_samples_save

    # ---- stage 1: FPS + Shapley init
    fps = save_fps(cfg, synthetic=True)
    assert fps.shape == (30, R)
    assert (fps[:, 0] == 0).all()

    run_shapley_init(cfg, synthetic=True, allow_random_init=True,
                     sample_indices=SAMPLES)
    _, names = resolve_dataset(cfg, synthetic=True)
    base = cfg.exp_folder + f"{names[0]}/"
    region_id = np.load(base + "region_id.npy")
    assert region_id.shape == (cfg.num_points,)
    orders = np.load(base + "all_orders.npy")
    assert orders.shape == (S, R)
    sv_all = np.load(base + "region_sv_all.npy")
    assert sv_all.shape == (S, R)
    nf = float(np.load(base + "norm_factor.npy"))
    # efficiency: every single-order estimate sums to v(N) - v(empty)
    np.testing.assert_allclose(sv_all.sum(axis=1), nf, atol=5e-3)
    # snapshots saved
    assert os.path.exists(base + "region_shapley/0_20.npy") or \
        os.path.exists(base + "shapley/0_20.npy")

    # ---- stage 2: enumeration (trans + rotate truncated to 4 poses)
    for mode in ("trans", "rotate"):
        run_enum(cfg, mode, synthetic=True, allow_random_init=True,
                 pose_chunk=2, sample_indices=SAMPLES, max_poses=4)
        sv = np.load(base + f"{mode}_all/region_shapley_value.npy")
        assert sv.shape == (4, R)
        assert np.isfinite(sv).all()
        # all_logits.pt row count: poses x orders x (R+1)
        from interpret_quality_tpu.utils.io import load_torch_tensor
        logits = load_torch_tensor(base + f"{mode}_all/all_logits.pt")
        assert logits.shape[:2] == (4, cfg.num_samples * (R + 1))

    # identity pose: trans grid pose 0 is a pure translation, Shapley values
    # of a translation-invariant model would match orig; PointNet is not
    # invariant so just check orig_shapley exists
    assert os.path.exists(base + "trans_all/orig_shapley_value.npy")

    # ---- stage 3: interactions (all 13 ratios so the plot CLIs can run
    # verbatim downstream; pairs/contexts kept tiny)
    from interpret_quality_tpu.attrib.interactions import RATIOS
    run_gen_pair(cfg, "rotate", synthetic=True, allow_random_init=True,
                 ratios=RATIOS, num_pairs_random=5,
                 num_save_context_max=4, sample_indices=SAMPLES)
    inter = base + f"interaction_seed{cfg.seed}/"
    pairs = np.load(inter + "region_pair_list.npy")
    assert pairs.shape == (5, 2)
    ctx = np.load(inter + "ratio10_context_list.npy")
    assert ctx.shape[0] == 5 and ctx.shape[1] == 4
    assert os.path.exists(inter + "rotate_adv/transform_params.npy")
    assert os.path.exists(inter + "rotate_adv/pred_labels.npy")

    run_interaction_logits(cfg, "rotate", synthetic=True,
                           allow_random_init=True, ratios=RATIOS,
                           sample_indices=SAMPLES)
    lg = __import__("interpret_quality_tpu.utils.io",
                    fromlist=["load_torch_tensor"]).load_torch_tensor(
        inter + "normal/ratio10_all_logits.pt")
    assert lg.shape == (5, 16, 10)          # pairs x 4*contexts x classes

    # --resume skips (pose, ratio) outputs that already exist: a second
    # invocation must leave every saved logits file untouched
    mtime_before = os.path.getmtime(inter + "normal/ratio10_all_logits.pt")
    run_interaction_logits(cfg, "rotate", synthetic=True,
                           allow_random_init=True, ratios=RATIOS,
                           sample_indices=SAMPLES, resume=True)
    assert os.path.getmtime(
        inter + "normal/ratio10_all_logits.pt") == mtime_before

    run_cal_interactions(cfg, "rotate", synthetic=True, output_type="pred",
                         ratios=RATIOS, sample_indices=SAMPLES)
    inter_scores = np.load(inter + "normal/ratio10_pred_interaction.npy")
    assert inter_scores.shape == (5, 4)
    assert np.isfinite(inter_scores).all()

    # --gen_pair_seed selects the artifact tree independently of --seed
    # (reference final_cal_interactions.py:71,112): score from a config with
    # a different run seed, pointing gen_pair_seed at the tree above
    import dataclasses
    cfg_other = dataclasses.replace(cfg, seed=cfg.seed + 41)
    run_cal_interactions(cfg_other, "rotate", synthetic=True,
                         output_type="gt", ratios=RATIOS,
                         sample_indices=SAMPLES, gen_pair_seed=cfg.seed)
    assert os.path.exists(inter + "normal/ratio10_gt_interaction.npy")
    assert not os.path.exists(
        base + f"interaction_seed{cfg_other.seed}/")

    # ---- stage 4: results tables over the 2 processed samples
    sel_names = [names[i] for i in SAMPLES]
    sens = cal_sensitivity_all_pc(cfg, "trans", sel_names)
    assert sens.shape == (2, R)
    assert np.isfinite(sens).all()
    mean_r, std_r = cal_correlation_coef(cfg, "rotate", sel_names)
    assert -1 <= mean_r <= 1

    from interpret_quality_tpu.pipeline import resolve_dataset as rd
    dataset, _ = rd(cfg, synthetic=True)
    data, _ = dataset[0]
    sv = np.load(base + "trans_all/region_shapley_value.npy")
    metric, per_pose, denom = cal_shapley_smoothness_metric_single_pc(
        np.asarray(data), sv, region_id, R)
    assert np.isfinite(metric) and per_pose.shape == (4,)


def test_scale_enum_sharded_end_to_end(cfg):
    """run_enum with coalition sharding over the 8-device mesh, through the
    artifact-writing loop, must reproduce the single-device artifacts."""
    import shutil

    from interpret_quality_tpu.attrib.stages import run_enum
    from interpret_quality_tpu.parallel import coalition_sharding, make_mesh
    from interpret_quality_tpu.pipeline import resolve_dataset

    _, names = resolve_dataset(cfg, synthetic=True)
    base = cfg.exp_folder + f"{names[0]}/"
    mesh = make_mesh(8)
    run_enum(cfg, "scale", synthetic=True, allow_random_init=True,
             pose_chunk=2, sample_indices=[0], max_poses=4,
             coalition_sharding=coalition_sharding(mesh))
    sv_sharded = np.load(base + "scale_all/region_shapley_value.npy")
    assert sv_sharded.shape == (4, cfg.num_regions)
    assert np.isfinite(sv_sharded).all()

    shutil.move(base + "scale_all", base + "scale_all_sharded")
    run_enum(cfg, "scale", synthetic=True, allow_random_init=True,
             pose_chunk=2, sample_indices=[0], max_poses=4)
    sv1 = np.load(base + "scale_all/region_shapley_value.npy")
    np.testing.assert_allclose(sv_sharded, sv1, rtol=1e-4, atol=1e-5)
    shutil.rmtree(base + "scale_all_sharded")


def test_smoothness_stage(cfg):
    """Short smoothness enumeration (one mode, 2 epochs) writes the
    reference artifact schema and finite Shapley values."""
    from interpret_quality_tpu.attrib.smoothness import run_smoothness
    from interpret_quality_tpu.pipeline import resolve_dataset

    run_smoothness(cfg, modes=["linearity"], synthetic=True,
                   allow_random_init=True, sample_indices=[0], max_epochs=2)
    _, names = resolve_dataset(cfg, synthetic=True)
    base = cfg.exp_folder + f"{names[0]}/linearity_all/"
    for objective in ("inc", "dec"):
        d = base + f"allregion_{objective}/"
        sv = np.load(d + "region_shapley_value.npy")
        assert sv.shape[1] == cfg.num_regions and sv.shape[0] <= 2
        assert np.isfinite(sv).all()
        smooth = np.load(d + "linearity.npy")
        assert smooth.shape == (sv.shape[0], cfg.num_regions)
        assert os.path.exists(d + "data_smoothness.npy")


def _cli_args(cfg, *extra):
    return ["prog", "--model", cfg.model, "--dataset", cfg.dataset,
            "--synthetic", "--checkpoints_root", cfg.checkpoints_root,
            "--num_points", str(cfg.num_points),
            "--num_samples_save", str(cfg.num_samples_save),
            "--num_samples", str(cfg.num_samples), *extra]


def test_result_cli_paths(cfg, capsys, monkeypatch):
    """cli.result over the artifacts the pipeline test wrote, all three
    result modes (reference final_result.py:216-255)."""
    import sys

    from interpret_quality_tpu.cli import result

    for mode, needle in (("sensitivity", "mean normalized range"),
                         ("correlation", "mean Pearson r"),
                         ("smoothness", "smoothness metric")):
        monkeypatch.setattr(sys, "argv",
                            _cli_args(cfg, "--result_mode", mode,
                                      "--samples", "0,1"))
        result.main()
        out = capsys.readouterr().out
        assert needle in out, (mode, out)


def test_plot_interaction_cli(cfg, workdir, monkeypatch):
    """cli.plot_interaction normal-vs-adv over the 13-ratio artifacts."""
    import sys

    from interpret_quality_tpu.cli import plot_interaction

    fig_root = workdir + "/figures"
    monkeypatch.setattr(sys, "argv", _cli_args(
        cfg, "--plot_mode", "normal_vs_adv", "--mode", "rotate",
        "--samples", "0,1", "--fig_root", fig_root))
    plot_interaction.main()
    figs = [f for root, _, files in os.walk(fig_root) for f in files]
    assert figs, "plot CLI produced no figure files"


def _run_script(name, argv, monkeypatch):
    import runpy
    import sys
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "scripts", name)
    monkeypatch.setattr(sys, "argv", [name, *argv])
    runpy.run_path(path, run_name="__main__")


def test_make_results_md_script(cfg, workdir, monkeypatch):
    """scripts/make_results_md.py (the chip-queue's per-model RESULTS.md
    append step) over the e2e artifact tree: every table section renders."""
    out = workdir + "/RESULTS_test.md"
    _run_script("make_results_md.py", [
        "--model", cfg.model, "--synthetic",
        "--checkpoints_root", cfg.checkpoints_root,
        "--num_points", str(cfg.num_points),
        "--num_samples", str(cfg.num_samples),
        "--samples", "0,1", "--label", "pytest fixture", "--out", out,
    ], monkeypatch)
    text = open(out).read()
    for needle in ("Table 2", "Table 3", "Table 4",
                   "| trans |", "| rotate |", "Interactions",
                   # nested smoothness StageTimer logs must reach the
                   # stage-throughput table (parse_stage_timers descends
                   # into <mode>_all/allregion_<obj>/)
                   "| smoothness:linearity_all |"):
        assert needle in text, needle
    # --append adds a second section instead of clobbering
    _run_script("make_results_md.py", [
        "--model", cfg.model, "--synthetic",
        "--checkpoints_root", cfg.checkpoints_root,
        "--num_points", str(cfg.num_points),
        "--num_samples", str(cfg.num_samples),
        "--samples", "0,1", "--append", "--out", out,
    ], monkeypatch)
    assert open(out).read().count("# RESULTS") == 2


def test_make_compare_md_script(cfg, workdir, monkeypatch):
    """scripts/make_compare_md.py (the chip-queue's final cross-model
    append) over the e2e tree, incl. the model=samples selector syntax."""
    out = workdir + "/COMPARE_test.md"
    open(out, "w").write("existing\n")
    _run_script("make_compare_md.py", [
        "--synthetic", "--checkpoints_root", cfg.checkpoints_root,
        "--models", f"{cfg.model},dgcnn",          # dgcnn has no artifacts
        "--num_points", str(cfg.num_points),
        "--num_samples", str(cfg.num_samples),
        "--samples", f"{cfg.model}=0,1", "--out", out,
    ], monkeypatch)
    text = open(out).read()
    assert text.startswith("existing")             # appends, never clobbers
    assert f"| {cfg.model} |" in text
    assert "| dgcnn |" not in text                 # missing tree skipped
    for needle in ("Table 2", "Table 3", "Table 4"):
        assert needle in text, needle


def test_result_cli_all_models(cfg, capsys, monkeypatch):
    """--all_models sweeps every family, skipping families without
    artifact trees (reference final_result.py model='all' view)."""
    import sys

    from interpret_quality_tpu.cli import result

    monkeypatch.setattr(sys, "argv",
                        _cli_args(cfg, "--result_mode", "sensitivity",
                                  "--samples", "0,1", "--all_models"))
    result.main()
    out = capsys.readouterr().out
    assert "model: pointnet, exp: trans" in out
    assert "model: dgcnn" not in out        # no dgcnn artifacts in this tree


def test_plot_interaction_cli_composite(cfg, workdir, monkeypatch):
    """plot_mode=single_region_vs_normal_avg writes the per-model aggregate
    .npy files, then plot_mode=all builds the composite with the present
    panel and skips the missing ones."""
    import sys

    from interpret_quality_tpu.cli import plot_interaction

    fig_root = workdir + "/figures_all"
    monkeypatch.setattr(sys, "argv", _cli_args(
        cfg, "--plot_mode", "single_region_vs_normal_avg", "--mode",
        "rotate", "--samples", "0,1", "--fig_root", fig_root))
    plot_interaction.main()
    agg = (fig_root + f"/interaction_final_{cfg.dataset}/"
           f"{cfg.model}_{cfg.dataset}_mean_inter_normal.npy")
    assert os.path.exists(agg)

    monkeypatch.setattr(sys, "argv", _cli_args(
        cfg, "--plot_mode", "all", "--fig_root", fig_root))
    plot_interaction.main()
    # plot_all_models writes the composite to <fig_root>_show/
    assert os.path.exists(
        fig_root + "_show/interaction_all/interaction_all.pdf")


def test_collect_evidence_script(cfg, workdir, monkeypatch):
    """scripts/collect_evidence.py (the chip-queue's per-stage evidence
    commit) over the e2e tree: stage rates, table numbers, the dataset
    distribution stamp, and honest interaction labels (num_samples /
    pairs_per_cloud, not the round-4 'num_pairs' mislabel)."""
    import json as _json
    out = workdir + "/results_test/pointnet_synthetic.json"
    _run_script("collect_evidence.py", [
        "--model", cfg.model, "--synthetic",
        "--checkpoints_root", cfg.checkpoints_root,
        "--num_points", str(cfg.num_points),
        "--num_samples", str(cfg.num_samples),
        "--samples", "0,1", "--label", "pytest fixture", "--out", out,
    ], monkeypatch)
    ev = _json.load(open(out))
    assert ev["model"] == cfg.model and ev["dataset"] == "modelnet10"
    assert ev["dataset_version"]["synthetic_morph_alpha_max"] > 0
    assert "trans" in ev["table2_sensitivity"]
    assert "rotate" in ev["table3_correlation"]
    assert ev["stage_rates_by_stage"].get("enum", 0) > 0
    # the e2e tree has interactions only for samples 0,1, not the selected-10
    # list, so the block must degrade to an explicit incomplete marker —
    # and when complete it must use the new keys, never "num_pairs"
    inter = ev["interactions"]
    assert ("incomplete" in inter) or (
        "num_samples" in inter and "pairs_per_cloud" in inter
        and "num_pairs" not in inter)
