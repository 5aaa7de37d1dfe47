"""Regression tests for bench.py's evidence fallback (ADVICE r4): the
committed-evidence rate lookup must filter on the evidence's own
model/dataset fields (not the filename prefix, which let gcnn_adv_*.json
shadow gcnn's rates) and merge stage rates per-key keeping the newest value
per stage (not pick one newest file wholesale, which dropped pointnet's
interaction rate when a newer ShapeNet file landed)."""
import importlib.util
import json
import os
import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent


def _load_bench():
    os.environ["_IQ_BENCH_REEXEC"] = "1"   # skip the re-exec guard
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write(tmp, name, model, dataset, gen, stages):
    (tmp / "results").mkdir(exist_ok=True)
    (tmp / "results" / name).write_text(json.dumps({
        "model": model, "dataset": dataset, "generated_unix": gen,
        "stage_rates_by_stage": stages}))


def test_prefix_shadowing_filtered_by_model_field(tmp_path, monkeypatch):
    bench = _load_bench()
    _write(tmp_path, "gcnn_synthetic.json", "gcnn", "modelnet10", 100,
           {"enum": 5187.0, "smoothness": 3336.9})
    _write(tmp_path, "gcnn_adv_synthetic.json", "gcnn_adv", "modelnet10", 200,
           {"shapley_init": 4768.0})
    monkeypatch.chdir(tmp_path)
    rates = bench.stage_rates_from_logs("gcnn",
                                        checkpoints_root=str(tmp_path / "no"))
    assert rates == {"enum": 5187.0, "smoothness": 3336.9}
    adv = bench.stage_rates_from_logs("gcnn_adv",
                                      checkpoints_root=str(tmp_path / "no"))
    assert adv == {"shapley_init": 4768.0}


def test_per_stage_merge_and_dataset_filter(tmp_path, monkeypatch):
    bench = _load_bench()
    # older modelnet evidence has the interaction rate; newer modelnet
    # evidence refreshes enum only; a still-newer shapenet file must be
    # ignored for the modelnet lookup entirely.
    _write(tmp_path, "pointnet_synthetic.json", "pointnet", "modelnet10", 100,
           {"enum": 80000.0, "interaction": 42835.6})
    _write(tmp_path, "pointnet_synthetic2.json", "pointnet", "modelnet10",
           200, {"enum": 85942.9})
    _write(tmp_path, "pointnet_shapenet.json", "pointnet", "shapenet", 300,
           {"enum": 70000.0, "smoothness": 4000.0})
    monkeypatch.chdir(tmp_path)
    rates = bench.stage_rates_from_logs("pointnet",
                                        checkpoints_root=str(tmp_path / "no"))
    assert rates == {"enum": 85942.9, "interaction": 42835.6}


def test_basis_labels():
    bench = _load_bench()
    proj = bench.suite_projection(1000.0, {"enum": 2000.0}, "pointnet",
                                  "enum_probe")
    assert proj["basis"] == "enum_probe"
    proj = bench.suite_projection(1000.0, {"enum": 2000.0}, "pointnet",
                                  "stage_logs")
    assert proj["basis"] == "stage_logs_partial"
    proj = bench.suite_projection(
        1000.0, {"enum": 2000.0, "interaction": 3000.0}, "pointnet",
        "stage_logs")
    assert proj["basis"] == "stage_logs"
    proj = bench.suite_projection(1000.0, {}, "pointnet", None)
    assert proj["basis"] == "engine_rate_fallback"
