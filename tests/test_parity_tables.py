"""Tables 2-4 math parity against the reference final_result.py.

The reference table functions take artifact folders / arrays, so they can
be driven directly on synthetic artifacts: write random
region_shapley_value.npy trees, run the reference's cal_sensitivity /
pearson pipeline / cal_shapley_smoothness_metric_single_pc (imported
read-only from /root/reference; matplotlib agg) and ours on the same
bytes, and require identical numbers.  Skips when the reference tree is
absent.
"""
import os

import numpy as np
import pytest

import conftest

pytestmark = pytest.mark.skipif(
    not conftest.HAS_REFERENCE,
    reason="reference tree not available for parity oracle")
_ref_module = conftest.ref_module

R = 32



@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    """Two fake samples with trans/rotate + linearity inc/dec artifacts,
    laid out at the canonical exp_folder path so config-driven callers
    resolve them too."""
    import pathlib

    from interpret_quality_tpu.config import ExperimentConfig

    tmp = tmp_path_factory.mktemp("tables")
    cfg = ExperimentConfig(model="pointnet", dataset="modelnet10",
                           checkpoints_root=str(tmp))
    root = pathlib.Path(cfg.exp_folder)
    rng = np.random.RandomState(5)
    names = ["s0", "s1"]
    for name in names:
        base = root / name
        for mode, poses in (("trans", 216), ("rotate", 216)):
            d = base / f"{mode}_all"
            d.mkdir(parents=True)
            np.save(d / "region_shapley_value.npy",
                    rng.randn(poses, R) * 0.01)
        for obj, poses in (("inc", 7), ("dec", 5)):
            d = base / "linearity_all" / f"allregion_{obj}"
            d.mkdir(parents=True)
            np.save(d / "region_shapley_value.npy",
                    rng.randn(poses, R) * 0.01)
    return str(root) + "/", names, cfg


def test_sensitivity_matches_reference(tree):
    ref = _ref_module("final_result")
    from interpret_quality_tpu.results.tables import cal_sensitivity

    root, names, _ = tree
    for name in names:
        base = root + name + "/"
        for mode in ("trans", "rotate", "linearity"):
            np.testing.assert_allclose(cal_sensitivity(base, mode),
                                       ref.cal_sensitivity(base, mode),
                                       rtol=1e-12, err_msg=(name, mode))


def test_correlation_matches_reference(tree):
    """Our cal_correlation_coef vs the reference recipe (per-sample
    Pearson r of sensitivity vs mean |phi| intensity) on the same tree."""
    from scipy.stats import pearsonr

    ref = _ref_module("final_result")
    from interpret_quality_tpu.results.tables import cal_correlation_coef

    root, names, cfg = tree
    rs = []
    for name in names:
        base = root + name + "/"
        sens = ref.cal_sensitivity(base, "trans")
        sv = np.load(base + "trans_all/region_shapley_value.npy")
        intensity = np.mean(np.abs(sv), axis=0)
        rs.append(pearsonr(sens, intensity)[0])
    mean, std = cal_correlation_coef(cfg, "trans", names)
    np.testing.assert_allclose(mean, np.mean(rs), rtol=1e-12)
    np.testing.assert_allclose(std, np.std(rs, ddof=1), rtol=1e-12)


def test_smoothness_single_pc_matches_reference():
    ref = _ref_module("final_result")
    ref.num_regions = R            # module global the reference sets in main

    from interpret_quality_tpu.results.tables import \
        cal_shapley_smoothness_metric_single_pc

    rng = np.random.RandomState(9)
    data = rng.randn(256, 3).astype(np.float32)
    region_id = rng.randint(0, R, 256)
    region_id[:R] = np.arange(R)   # every region non-empty
    sv = rng.randn(5, R) * 0.01

    got = cal_shapley_smoothness_metric_single_pc(data, sv, region_id, R)
    want = ref.cal_shapley_smoothness_metric_single_pc(data, sv, region_id)
    for g, w, label in zip(got, want, ("metric", "per_pose", "denominator")):
        np.testing.assert_allclose(g, w, rtol=1e-6, err_msg=label)


def test_folder_name_lists_match_reference():
    """Eval-sample naming contract (final_util.py:265-283): identical
    30-name lists for both datasets from the same misc/ files."""
    import types

    fu = _ref_module("tools.final_util")
    from interpret_quality_tpu.data.datasets import get_folder_name_list

    cwd = os.getcwd()
    os.chdir(conftest.REF_ROOT)          # reference reads './misc' relative paths
    try:
        for ds in ("modelnet10", "shapenet"):
            ref = fu.get_folder_name_list(types.SimpleNamespace(dataset=ds))
            got = get_folder_name_list(ds)   # package misc/ (shipped as data)
            assert got == ref and len(got) == 30, ds
    finally:
        os.chdir(cwd)


def test_gen_pair_sampling_matches_reference_under_shared_seed(tmp_path):
    """Pair sampling, context sampling (incl. the enumerate-vs-sample
    switch) and single-region pair construction reproduce the reference's
    np.random draw order bit-for-bit (final_gen_pair.py:18-43,127-144,
    288-300), so seeded artifact files are identical."""
    import types

    gp = _ref_module("final_gen_pair")
    from interpret_quality_tpu.attrib.interactions import (
        gen_context, gen_pair_random, gen_pair_single_region)

    args = types.SimpleNamespace(num_regions=R, num_pairs_random=12,
                                 num_save_context_max=6,
                                 ratio=[0.0, 0.1, 0.5, 1.0])

    np.random.seed(21)
    ref_pairs = gp.gen_pair_random(args)
    np.random.seed(21)
    pairs = gen_pair_random(R, 12)
    np.testing.assert_array_equal(pairs, ref_pairs)

    ref_dir = str(tmp_path / "ref") + "/"
    our_dir = str(tmp_path / "ours") + "/"
    os.makedirs(ref_dir), os.makedirs(our_dir)
    np.random.seed(22)
    gp.gen_context(ref_pairs, ref_dir, args)
    np.random.seed(22)
    gen_context(pairs, our_dir, R, ratios=args.ratio,
                num_save_context_max=args.num_save_context_max)
    for ratio in args.ratio:
        f = "ratio%d_context_list.npy" % int(ratio * 100)
        np.testing.assert_array_equal(np.load(our_dir + f),
                                      np.load(ref_dir + f), err_msg=f)

    neighbor = np.zeros((R, R), bool)
    neighbor[3, [1, 3, 7, 20]] = True
    ref_sr = gp.gen_pair_single_region(3, neighbor, args)
    got_sr = gen_pair_single_region(3, neighbor, R)
    np.testing.assert_array_equal(got_sr, ref_sr)
