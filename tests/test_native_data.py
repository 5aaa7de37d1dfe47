"""Native host-library binding + ShapeNet data-path tests.

Covers reference final_data_shapley.py:95-179 (ShapeNet eval loader:
centre + unit-sphere normalise + numpy-FPS resample) and
final_data_train.py:181-274 (ShapeNet train loader) through the ctypes
binding in interpret_quality_tpu/data/native.py, with parity checks of
the native kernels against their pure-numpy fallbacks.
"""
import json
import os
import subprocess

import numpy as np
import pytest

from interpret_quality_tpu.data import native
from interpret_quality_tpu.data.datasets import (
    ShapeNetShapleyEval, ShapeNetTrain, farthest_point_sample_np,
    get_folder_name_list)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def built_native():
    """Build libiqtpu_host.so if absent so the native path is exercised."""
    if not native.available():
        subprocess.run(["bash", os.path.join(_REPO, "scripts",
                                             "build_native.sh")], check=True)
        native._lib = None
    assert native.available(), "native library must build in this image"


@pytest.fixture()
def numpy_fallback(monkeypatch):
    """Force the pure-numpy fallback path."""
    monkeypatch.setenv("IQTPU_NO_NATIVE", "1")
    native._lib = None
    yield
    native._lib = None


# ---------------------------------------------------------------------------
# Kernel parity: native vs numpy fallback vs reference numpy semantics
# ---------------------------------------------------------------------------
def test_parse_pts_matches_loadtxt(tmp_path):
    rng = np.random.RandomState(3)
    pts = rng.randn(517, 3).astype(np.float32)
    path = tmp_path / "cloud.pts"
    with open(path, "w") as f:
        for p in pts:
            f.write(f"{p[0]:.7g} {p[1]:.7g} {p[2]:.7g}\n")
    ref = np.loadtxt(path).astype(np.float32)
    got = native.parse_pts(str(path))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_parse_pts_fallback_parity(tmp_path, numpy_fallback):
    path = tmp_path / "c.pts"
    path.write_text("1.5 -2 3e-1\n4 5 6\n")
    got = native.parse_pts(str(path))
    np.testing.assert_allclose(got, [[1.5, -2.0, 0.3], [4.0, 5.0, 6.0]])


def test_fps_native_matches_reference_numpy():
    rng = np.random.RandomState(0)
    pts = rng.randn(800, 3).astype(np.float32)
    idx = native.fps(pts, 64)
    ref = farthest_point_sample_np(pts, 64)
    assert (idx == ref).all()
    assert idx[0] == 0  # first point fixed (final_data_shapley.py:83-84)


def test_fps_batch_matches_single():
    rng = np.random.RandomState(1)
    pts = rng.randn(4, 300, 3).astype(np.float32)
    batched = native.fps_batch(pts, 32)
    for i in range(4):
        assert (batched[i] == native.fps(pts[i], 32)).all()


def test_region_assign_native_vs_fallback(monkeypatch):
    rng = np.random.RandomState(2)
    pts = rng.randn(1024, 3).astype(np.float32)
    ctr = pts[native.fps(pts, 32)]
    got_native = native.region_assign(pts, ctr)
    monkeypatch.setenv("IQTPU_NO_NATIVE", "1")
    native._lib = None
    got_np = native.region_assign(pts, ctr)
    native._lib = None
    assert (got_native == got_np).all()
    assert got_native.min() >= 0 and got_native.max() < 32


# ---------------------------------------------------------------------------
# ShapeNet loaders over a fixture .pts tree
# ---------------------------------------------------------------------------
CAT_A, CAT_B = "02773838", "03624134"  # Bag, Knife
UUIDS = {CAT_A: ["aaaa0001", "aaaa0002"], CAT_B: ["bbbb0001"]}


@pytest.fixture()
def shapenet_tree(tmp_path):
    """Tiny on-disk ShapeNet-Part layout + matching misc dir."""
    root = tmp_path / "data"
    base = root / "shapenetcore_partanno_segmentation_benchmark_v0"
    rng = np.random.RandomState(7)
    rel = []
    for cat, uuids in UUIDS.items():
        pdir = base / cat / "points"
        pdir.mkdir(parents=True)
        for uuid in uuids:
            pts = (rng.randn(1500, 3) * [1.0, 0.5, 2.0]).astype(np.float32)
            with open(pdir / f"{uuid}.pts", "w") as f:
                for p in pts:
                    f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
            rel.append(f"shape_data/{cat}/{uuid}")
    split_dir = base / "train_test_split"
    split_dir.mkdir()
    (split_dir / "shuffled_train_file_list.json").write_text(json.dumps(rel))
    misc = tmp_path / "misc"
    misc.mkdir()
    (misc / "shapenet_train_selected.json").write_text(json.dumps(rel))
    (misc / "modelnet10_train_final30.txt").write_text("chair_0001\n")
    return str(root), str(misc)


def test_shapenet_eval_loader(shapenet_tree):
    root, misc = shapenet_tree
    ds = ShapeNetShapleyEval(data_root=root, num_points=256, misc_dir=misc)
    assert len(ds) == 3
    pc, label = ds[0]
    assert pc.shape == (256, 3) and pc.dtype == np.float32
    assert label in (0, 1)
    # Reference semantics: centre, unit-sphere normalise, FPS-resample
    # (final_data_shapley.py:149-176) computed independently in numpy.
    path = os.path.join(root,
                        "shapenetcore_partanno_segmentation_benchmark_v0",
                        CAT_A, "points", UUIDS[CAT_A][0] + ".pts")
    raw = np.loadtxt(path).astype(np.float32)
    raw = raw - raw.mean(axis=0, keepdims=True)
    raw = raw / np.max(np.sqrt((raw ** 2).sum(1)))
    choice = farthest_point_sample_np(raw, 256)
    np.testing.assert_allclose(pc, raw[choice, :], atol=1e-6)
    assert np.max(np.sqrt((pc ** 2).sum(1))) <= 1.0 + 1e-5


def test_shapenet_eval_loader_fallback(shapenet_tree, numpy_fallback):
    root, misc = shapenet_tree
    ds = ShapeNetShapleyEval(data_root=root, num_points=128, misc_dir=misc)
    pc, _ = ds[1]
    assert pc.shape == (128, 3)


def test_shapenet_train_loader(shapenet_tree):
    root, misc = shapenet_tree
    ds = ShapeNetTrain(data_root=root, num_points=128, split="train",
                       class_choice=("Bag", "Knife"))
    assert len(ds) == 3
    np.random.seed(0)
    pc, label = ds[0]
    assert pc.shape == (128, 3) and pc.dtype == np.float32
    batches = list(ds.batches(2, shuffle=False))
    assert batches[0][0].shape == (2, 128, 3)
    assert batches[-1][2] == 1  # ragged tail padded, 1 valid row


def test_folder_name_list(shapenet_tree):
    _, misc = shapenet_tree
    names = get_folder_name_list("shapenet", misc_dir=misc)
    assert names[0] == "Bag_aaaa0001" and len(names) == 3


def test_shapenet_eval_loader_matches_reference_dataset(shapenet_tree,
                                                        monkeypatch):
    """Oracle: the reference's ShapeNetDataset_Shapley_test
    (final_data_shapley.py:95-179, torch-CPU, imported read-only from
    /root/reference) over the same fixture tree yields byte-identical
    clouds, labels and sample ordering."""
    import importlib
    import sys

    ref_root = "/root/reference"
    if not os.path.isdir(os.path.join(ref_root, "tools")):
        pytest.skip("reference tree not available")

    root, misc = shapenet_tree
    base = os.path.join(root,
                        "shapenetcore_partanno_segmentation_benchmark_v0")
    # the reference also needs the catfile and a CWD-relative misc/
    with open(os.path.join(base, "synsetoffset2category.txt"), "w") as f:
        f.write("Bag\t02773838\nKnife\t03624134\n")
    workdir = os.path.dirname(root)      # tmp_path: already contains misc/

    sys.path.insert(0, ref_root)
    try:
        ref_mod = importlib.import_module("final_data_shapley")
    finally:
        sys.path.remove(ref_root)

    monkeypatch.chdir(workdir)
    ref_ds = ref_mod.ShapeNetDataset_Shapley_test(
        None, root=base, npoints=256, classification=True,
        class_choice=("Bag", "Knife"), split="train")
    ours = ShapeNetShapleyEval(data_root=root, num_points=256,
                               misc_dir=misc, class_choice=("Bag", "Knife"))
    assert len(ref_ds) == len(ours) == 3
    for i in range(3):
        ref_pc, ref_cls = ref_ds[i]
        pc, cls = ours[i]
        assert int(ref_cls) == cls, i
        np.testing.assert_array_equal(pc, ref_pc.numpy(), err_msg=str(i))


def test_modelnet_train_loader_matches_reference_dataset(tmp_path,
                                                         monkeypatch):
    """Oracle: the reference's ModelNet_Loader (final_data_train.py:10-46,
    143-180) over a fixture modelnet10_numpy tree yields bit-identical
    sampled+augmented clouds and labels under a shared np.random seed."""
    import importlib
    import sys
    import types

    ref_root = "/root/reference"
    if not os.path.isdir(os.path.join(ref_root, "tools")):
        pytest.skip("reference tree not available")

    from interpret_quality_tpu.data.datasets import (MODELNET10_SHAPES,
                                                     ModelNetTrain)

    # fixture tree in the reference's on-disk layout
    ddir = tmp_path / "data" / "modelnet10_numpy"
    rng = np.random.RandomState(2)
    names = ["chair_0001", "toilet_0003"]
    (ddir).mkdir(parents=True)
    (ddir / "modelnet10_shape_names.txt").write_text(
        "\n".join(MODELNET10_SHAPES) + "\n")
    (ddir / "modelnet10_train.txt").write_text("\n".join(names) + "\n")
    for name in names:
        folder = name[:-5]
        (ddir / folder).mkdir(exist_ok=True)
        np.save(ddir / folder / f"{name}.npy",
                rng.randn(2000, 6).astype(np.float32))

    sys.path.insert(0, ref_root)
    try:
        fd = importlib.import_module("final_data_train")
    finally:
        sys.path.remove(ref_root)

    # the reference hardcodes BASE_DIR = dirname(__file__); point it at the
    # fixture for the duration of the dataset construction
    real_dirname = os.path.dirname
    monkeypatch.setattr(fd.os.path, "dirname",
                        lambda p: (str(tmp_path) if p == fd.__file__
                                   else real_dirname(p)))
    opt = types.SimpleNamespace(drop_point=True, train_rot_y_perturbation=True,
                                train_rot_all_perturbation=True)
    ref_ds = fd.ModelNet_Loader(opt, num_points=128, partition="train")
    monkeypatch.undo()

    ours = ModelNetTrain(data_root=str(tmp_path / "data"), num_points=128,
                         partition="train", drop_point=True, rot_y=True,
                         rot_all=True)
    assert len(ref_ds) == len(ours) == 2
    for i in range(2):
        np.random.seed(17 + i)
        ref_pc, ref_lbl = ref_ds[i]
        np.random.seed(17 + i)
        pc, lbl = ours[i]
        assert lbl == ref_lbl, i
        np.testing.assert_array_equal(np.asarray(pc, np.float64),
                                      np.asarray(ref_pc, np.float64),
                                      err_msg=str(i))
