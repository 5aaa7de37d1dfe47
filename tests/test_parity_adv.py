"""BIM adversarial-attack parity vs reference main_cls_adv.py:109-192.

Two layers of oracle:
  * the attack-loss gradient chain (label-smoothing CE ∘ model ∘ axis-angle
    rotation) matches torch autograd through the reference's own
    rot_angle_axis VJP and cal_loss on converted weights, and
  * our `lax.fori_loop` attacks reproduce an explicit step-by-step replica
    of the reference's update equations (sign step on alpha, (theta,phi)
    normalised step, alpha clamp; translation L2-ball projection) exactly.
Skips when the reference tree is absent.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import conftest

pytestmark = pytest.mark.skipif(
    not conftest.HAS_REFERENCE,
    reason="reference tree not available for parity oracle")
_ref_module = conftest.ref_module



@pytest.fixture(scope="module", autouse=True)
def fp32_matmuls():
    with conftest.fp32_matmuls_ctx():
        yield


def test_attack_loss_grads_match_torch():
    """d cal_loss(model(rot_angle_axis(x)))/d(alpha,theta,phi) — torch via
    the reference's manual VJP vs jax.grad through ours, converted
    PointNet weights."""
    import torch

    from test_parity_torch import _build_torch_model

    from interpret_quality_tpu.models import build_model
    from interpret_quality_tpu.models.torch_convert import convert_state_dict
    from interpret_quality_tpu.ops.transforms import rot_angle_axis
    from interpret_quality_tpu.train.losses import cal_loss

    fu = _ref_module("tools.final_util")

    B, N = 2, 256
    rng = np.random.RandomState(4)
    x = rng.randn(B, N, 3).astype(np.float32)
    labels = rng.randint(0, 10, B)
    alphas = rng.uniform(-0.5, 0.5, B).astype(np.float32)
    thetas = rng.uniform(0.3, 2.8, B).astype(np.float32)
    phis = rng.uniform(-3, 3, B).astype(np.float32)

    tm = _build_torch_model("pointnet")
    ta = torch.tensor(alphas, requires_grad=True)
    tt = torch.tensor(thetas, requires_grad=True)
    tp = torch.tensor(phis, requires_grad=True)
    rot = fu.rot_angle_axis.apply(torch.from_numpy(x), ta, tt, tp)
    logits = tm(rot.permute(0, 2, 1))[0]
    fu.cal_loss(logits, torch.from_numpy(labels), smoothing=True).backward()

    variables = convert_state_dict("pointnet", tm.state_dict())
    model = build_model("pointnet", num_classes=10, k=20)

    def loss(a, t, p):
        clouds = rot_angle_axis(jnp.asarray(x), a, t, p)
        out = model.apply(variables, clouds, train=False)
        lg = out[0] if isinstance(out, tuple) else out
        return cal_loss(lg, jnp.asarray(labels), smoothing=True)

    g_a, g_t, g_p = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(alphas), jnp.asarray(thetas), jnp.asarray(phis))
    for got, ref, name in zip((g_a, g_t, g_p), (ta.grad, tt.grad, tp.grad),
                              ("alpha", "theta", "phi")):
        np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                                   rtol=2e-3, atol=1e-5, err_msg=name)


def test_bim_loops_match_reference_update_equations():
    """bim_rotation_attack / bim_translation_attack vs a literal replica of
    the reference per-iteration updates (main_cls_adv.py:118-162) driven by
    the same jax gradients — pins step order, sign/clip/normalise
    semantics, and the zero-grad guard."""
    from interpret_quality_tpu.models import build_model, init_model
    from interpret_quality_tpu.ops.transforms import rot_angle_axis
    from interpret_quality_tpu.train.adversarial import (
        ROT_ADV_ITER, ROT_ADV_STEP, ROT_ADV_THRESHOLD, TRANS_ADV_ITER,
        TRANS_ADV_STEP, TRANS_ADV_THRESHOLD, bim_rotation_attack,
        bim_translation_attack)
    from interpret_quality_tpu.train.losses import cal_loss

    # reference CLI defaults used by its train script
    assert ROT_ADV_ITER == 7 and TRANS_ADV_ITER == 3
    np.testing.assert_allclose(ROT_ADV_STEP, np.pi / 10)
    np.testing.assert_allclose(ROT_ADV_THRESHOLD, np.pi / 2)
    np.testing.assert_allclose([TRANS_ADV_STEP, TRANS_ADV_THRESHOLD],
                               [0.4, 1.0])

    B, N = 2, 128
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 10, B))
    model = build_model("pointnet", num_classes=10, k=20)
    variables = init_model(model, jax.random.PRNGKey(0), num_points=N)

    def loss_of_cloud(clouds, lbls):
        out = model.apply(variables, clouds, train=False)
        lg = out[0] if isinstance(out, tuple) else out
        return cal_loss(lg, lbls, smoothing=True)

    it_r, step_r, thr_r = 3, np.pi / 10, np.pi / 2

    # --- reference rotation loop, replicated step by step --------------
    def rot_loss(a, t, p):
        return loss_of_cloud(rot_angle_axis(x, a, t, p), labels)

    a = np.zeros(B, np.float32)
    t = np.zeros(B, np.float32)
    p = np.zeros(B, np.float32)
    g = jax.jit(jax.grad(rot_loss, argnums=(0, 1, 2)))
    for _ in range(it_r):
        g_a, g_t, g_p = map(np.asarray, g(jnp.asarray(a), jnp.asarray(t),
                                          jnp.asarray(p)))
        norm = np.sqrt(g_t ** 2 + g_p ** 2)
        norm[norm == 0] = 1.0
        a = np.clip(a + step_r * np.sign(g_a), -thr_r, thr_r)
        t = t + step_r * g_t / norm
        p = p + step_r * g_p / norm
    want_rot = np.asarray(rot_angle_axis(x, jnp.asarray(a), jnp.asarray(t),
                                         jnp.asarray(p)))

    got_rot = np.asarray(bim_rotation_attack(
        loss_of_cloud, x, labels, iterations=it_r, step=step_r,
        threshold=thr_r))
    np.testing.assert_allclose(got_rot, want_rot, rtol=1e-5, atol=1e-5)

    # --- reference translation loop -------------------------------------
    it_t, step_t, thr_t = 2, 0.4, 1.0

    def tr_loss(tr):
        return loss_of_cloud(jnp.asarray(got_rot) + tr, labels)

    tr = np.zeros((B, 1, 3), np.float32)
    gt = jax.jit(jax.grad(tr_loss))
    for _ in range(it_t):
        gv = np.asarray(gt(jnp.asarray(tr)))
        tr = tr + step_t * gv / np.linalg.norm(gv, axis=2, keepdims=True)
        clip = np.maximum(np.linalg.norm(tr, axis=2, keepdims=True), thr_t)
        tr = thr_t * tr / clip
    want_tr = got_rot + tr

    got_tr = np.asarray(bim_translation_attack(
        loss_of_cloud, jnp.asarray(got_rot), labels, iterations=it_t,
        step=step_t, threshold=thr_t))
    np.testing.assert_allclose(got_tr, want_tr, rtol=1e-5, atol=1e-5)


def test_lr_schedules_match_reference_torch_schedulers():
    """Per-family LR policy vs the reference's torch schedulers
    (main_cls_seed.py:80-96): Adam+StepLR(20,0.7), SGD lr*10+StepLR(30,0.7),
    SGD lr*100+CosineAnnealingLR(eta_min=1e-3), at every epoch boundary."""
    import torch

    from interpret_quality_tpu.train.trainer import lr_schedule_for

    E = 250
    ref_policies = {
        "pointnet": ("step", 1e-3, dict(step_size=20, gamma=0.7)),
        "pointnet2": ("step", 1e-3, dict(step_size=20, gamma=0.7)),
        "pointconv": ("step", 1e-2, dict(step_size=30, gamma=0.7)),
        "dgcnn": ("cos", 1e-1, dict(T_max=E, eta_min=1e-3)),
        "gcnn": ("cos", 1e-1, dict(T_max=E, eta_min=1e-3)),
    }
    for name, (kind, lr0, kw) in ref_policies.items():
        param = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([param], lr=lr0)
        if kind == "step":
            sched = torch.optim.lr_scheduler.StepLR(opt, **kw)
        else:
            sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, **kw)
        ref_lrs = []
        for _ in range(E):
            ref_lrs.append(opt.param_groups[0]["lr"])
            opt.step()
            sched.step()

        ours = lr_schedule_for(name, steps_per_epoch=1, epochs=E)
        got = [float(ours(e)) for e in range(E)]
        np.testing.assert_allclose(got, ref_lrs, rtol=1e-5, atol=1e-9,
                                   err_msg=name)
