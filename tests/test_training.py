"""Training-subsystem tests: losses vs oracles, optimizer step sanity,
BIM attacks change the input within bounds, one fit epoch runs."""
import jax
import jax.numpy as jnp
import numpy as np

from interpret_quality_tpu.train import (bim_rotation_attack,
                                         bim_translation_attack, cal_loss)
from interpret_quality_tpu.train.losses import (cross_entropy,
                                                smooth_cross_entropy)


def test_cross_entropy_matches_oracle():
    rng = np.random.RandomState(0)
    logits = rng.randn(5, 10).astype(np.float32)
    labels = rng.randint(0, 10, 5)
    got = float(cross_entropy(jnp.array(logits), jnp.array(labels)))
    p = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    want = -np.log(p[np.arange(5), labels]).mean()
    assert abs(got - want) < 1e-4


def test_smooth_ce_matches_oracle():
    rng = np.random.RandomState(1)
    logits = rng.randn(4, 6).astype(np.float32)
    labels = rng.randint(0, 6, 4)
    got = float(smooth_cross_entropy(jnp.array(logits), jnp.array(labels)))
    eps, C = 0.2, 6
    onehot = np.eye(C)[labels] * (1 - eps) + (1 - np.eye(C)[labels]) * eps / (C - 1)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    want = -(onehot * logp).sum(-1).mean()
    assert abs(got - want) < 1e-4
    # cal_loss dispatches
    assert abs(float(cal_loss(jnp.array(logits), jnp.array(labels), True)) - want) < 1e-4


def _toy_loss_of_cloud(target_dir):
    """Loss decreases when points align with target_dir — gives the attacks
    a meaningful gradient."""
    t = jnp.asarray(target_dir)

    def loss(clouds, labels):
        score = jnp.mean(clouds @ t, axis=(1,))
        return jnp.mean((score - 1.0) ** 2)
    return loss


def test_bim_rotation_attack_rotates_within_threshold():
    rng = np.random.RandomState(2)
    data = jnp.asarray(rng.randn(2, 32, 3).astype(np.float32))
    labels = jnp.zeros((2,), jnp.int32)
    loss = _toy_loss_of_cloud(np.array([1.0, 0.0, 0.0], np.float32))
    adv = bim_rotation_attack(loss, data, labels, iterations=3)
    assert adv.shape == data.shape
    # rotation preserves norms per point
    n0 = np.linalg.norm(np.asarray(data), axis=-1)
    n1 = np.linalg.norm(np.asarray(adv), axis=-1)
    np.testing.assert_allclose(n0, n1, rtol=1e-4, atol=1e-5)
    assert not np.allclose(np.asarray(adv), np.asarray(data))


def test_bim_translation_attack_within_ball():
    rng = np.random.RandomState(3)
    data = jnp.asarray(rng.randn(2, 32, 3).astype(np.float32))
    labels = jnp.zeros((2,), jnp.int32)
    loss = _toy_loss_of_cloud(np.array([0.0, 1.0, 0.0], np.float32))
    adv = bim_translation_attack(loss, data, labels)
    shift = np.asarray(adv - data)
    # one shared translation per cloud
    assert np.abs(shift - shift[:, :1]).max() < 1e-5
    from interpret_quality_tpu.train.adversarial import TRANS_ADV_THRESHOLD
    assert (np.linalg.norm(shift[:, 0], axis=-1)
            <= TRANS_ADV_THRESHOLD + 1e-5).all()


def test_bim_schedule_is_reference_recipe():
    """Always-on pin of the attack constants (main_cls_adv.py:312-317
    argparse defaults) — the reference-gated parity module also asserts
    these, but must not be the only guard."""
    from interpret_quality_tpu.train import adversarial as adv

    assert adv.ROT_ADV_ITER == 7 and adv.TRANS_ADV_ITER == 3
    np.testing.assert_allclose(adv.ROT_ADV_STEP, np.pi / 10)
    np.testing.assert_allclose(adv.ROT_ADV_THRESHOLD, np.pi / 2)
    np.testing.assert_allclose([adv.TRANS_ADV_STEP, adv.TRANS_ADV_THRESHOLD],
                               [0.4, 1.0])


def test_fit_one_epoch_synthetic():
    from interpret_quality_tpu.data.datasets import SyntheticClouds
    from interpret_quality_tpu.models import build_model, init_model
    from interpret_quality_tpu.train.trainer import fit
    from interpret_quality_tpu.utils.io import IOStream
    import tempfile

    train_ds = SyntheticClouds(num_samples=12, num_points=64, num_classes=3,
                               seed=0, train=True)
    test_ds = SyntheticClouds(num_samples=6, num_points=64, num_classes=3,
                              seed=1)
    model = build_model("pointnet", num_classes=3)
    variables = init_model(model, jax.random.PRNGKey(0), num_points=64)
    d = tempfile.mkdtemp()
    state, best = fit(model, variables, "pointnet", train_ds, test_ds,
                      batch_size=6, test_batch_size=6, epochs=1,
                      exp_dir=d, seed=0)
    assert np.isfinite(float(best)) or best == 0.80
    assert int(state.step) == 2


def test_fit_adversarial_one_epoch():
    """Adversarial fine-tuning loop (reference main_cls_adv.py:35-290):
    one epoch on tiny synthetic gcnn, both BIM variants per batch."""
    import tempfile

    from interpret_quality_tpu.data.datasets import SyntheticClouds
    from interpret_quality_tpu.models import build_model, init_model
    from interpret_quality_tpu.train.adversarial import fit_adversarial

    train_ds = SyntheticClouds(num_samples=8, num_points=48, num_classes=3,
                               seed=0, train=True)
    test_ds = SyntheticClouds(num_samples=4, num_points=48, num_classes=3,
                              seed=1)
    model = build_model("gcnn", num_classes=3, k=4)
    variables = init_model(model, jax.random.PRNGKey(0), num_points=48)
    d = tempfile.mkdtemp()
    state, best = fit_adversarial(model, variables, "gcnn_adv", train_ds,
                                  test_ds, batch_size=4, test_batch_size=4,
                                  epochs=1, exp_dir=d, seed=0)
    assert int(state.step) == 2
    assert np.all(np.isfinite(
        np.asarray(jax.tree_util.tree_leaves(state.params)[0])))


def test_train_adv_cli_resume(tmp_path, monkeypatch):
    """cli.train_adv end-to-end: resumes from a saved GCNN checkpoint
    (reference main_cls_adv.py:66,328-329) and writes its own artifacts,
    including the source .backup provenance snapshots."""
    import os
    import sys

    from interpret_quality_tpu.cli import train_adv
    from interpret_quality_tpu.models import build_model, init_model
    from interpret_quality_tpu.models.checkpoint import save_variables

    model = build_model("gcnn", num_classes=10, k=20)
    variables = init_model(model, jax.random.PRNGKey(0), num_points=32)
    resume = tmp_path / "model_99.msgpack"
    save_variables(str(resume), variables)

    monkeypatch.setattr(sys, "argv", [
        "train_adv", "--synthetic", "--num_points", "32",
        "--epochs", "1", "--batch_size", "32", "--test_batch_size", "16",
        "--checkpoints_root", str(tmp_path / "ckpt"),
        "--resume_path", str(resume), "--train_rot_all_perturbation"])
    train_adv.main()
    exp = (tmp_path / "ckpt" /
           "exp_MODEL_gcnn_adv_DATA_modelnet10_POINTNUM_32_clean_with_all_rot_da")
    assert os.path.exists(exp / "run.log")
    assert any(f.endswith(".backup") for f in os.listdir(exp))


def test_prefetch_producer_exits_when_consumer_abandons():
    """Abandoning the prefetch generator mid-epoch (train_step raising)
    must release the producer thread instead of leaving it blocked on the
    bounded queue forever."""
    import threading
    import time

    from interpret_quality_tpu.train.trainer import prefetch

    before = threading.active_count()
    gen = prefetch(iter(range(1000)), depth=2)
    assert next(gen) == 0
    gen.close()                      # consumer dies / raises
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.1)
    assert threading.active_count() == before

    # normal exhaustion still yields everything in order
    assert list(prefetch(iter(range(7)), depth=2)) == list(range(7))
