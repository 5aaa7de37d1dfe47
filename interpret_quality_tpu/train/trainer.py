"""Training: optax optimizers/schedules matching the reference policies,
jitted train/eval steps, data-parallel over a device mesh.

Reference policy (main_cls_seed.py:78-101,98-101,224):
  * pointnet / pointnet2: Adam lr 1e-3, L2 1e-4, StepLR(20, 0.7), 200 epochs
  * pointconv:            SGD lr 1e-2, momentum 0.9, L2 1e-4, StepLR(30, 0.7), 400 epochs
  * dgcnn / gcnn:         SGD lr 0.1, momentum 0.9, L2 1e-4, cosine→1e-3, 250 epochs
Label smoothing only for dgcnn/gcnn (:132-135); PointNet adds the feature-
transform regulariser * 1e-3 (:137-138).

The torch DataParallel scatter/gather (main_cls_seed.py:73-74) becomes a
sharded batch axis over a 1-D mesh: XLA inserts the gradient psum over ICI.
"""
from __future__ import annotations

import queue
import threading
import time
from typing import Any, Callable, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import feature_transform_regularizer
from ..models.checkpoint import save_variables
from ..utils.io import IOStream, mkdir
from .losses import cal_loss

EPOCHS_BY_MODEL = {"pointnet": 200, "pointnet2": 200, "pointconv": 400,
                   "dgcnn": 250, "gcnn": 250, "gcnn_adv": 400}


def balanced_accuracy(y_true, y_pred) -> float:
    """Mean per-class recall — sklearn ``balanced_accuracy_score`` semantics
    (reference main_cls_seed.py:155-158) without the sklearn dependency."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    recalls = [float((y_pred[y_true == c] == c).mean())
               for c in np.unique(y_true)]
    return float(np.mean(recalls))


def prefetch(iterator, depth: int = 2):
    """Host-side prefetch: a producer thread keeps ``depth`` batches ahead
    of the device step (the reference feeds the GPU with
    ``DataLoader(num_workers=8)``, main_cls_seed.py:41-48; our augmentations
    are cheap numpy, so one producer thread suffices to overlap host IO with
    device compute)."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    _done = object()
    stop = threading.Event()     # set when the consumer abandons the
                                 # generator, so the producer never blocks
                                 # forever on a full queue (thread leak)

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def produce():
        try:
            for item in iterator:
                if not _put((None, item)):
                    return
            _put((_done, None))
        except BaseException as e:           # re-raised on the consumer side
            _put((e, None))

    threading.Thread(target=produce, daemon=True).start()
    try:
        while True:
            err, item = q.get()
            if err is _done:
                return
            if err is not None:
                raise err
            yield item
    finally:
        stop.set()


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def lr_schedule_for(model_name: str, steps_per_epoch: int, epochs: int,
                    base_lr: float = 1e-3):
    """Per-family learning-rate schedule (reference main_cls_seed.py:80-96:
    Adam+StepLR(20, 0.7) / SGD lr*10+StepLR(30, 0.7) /
    SGD lr*100+CosineAnnealingLR(epochs, eta_min=1e-3))."""
    if model_name in ("pointnet", "pointnet2"):
        return optax.exponential_decay(base_lr, 20 * steps_per_epoch, 0.7,
                                       staircase=True)
    elif model_name == "pointconv":
        return optax.exponential_decay(base_lr * 10, 30 * steps_per_epoch,
                                       0.7, staircase=True)
    init = base_lr * 100                  # dgcnn / gcnn / gcnn_adv
    return optax.cosine_decay_schedule(init, epochs * steps_per_epoch,
                                       alpha=1e-3 / init)


def make_optimizer(model_name: str, steps_per_epoch: int,
                   epochs: Optional[int] = None, base_lr: float = 1e-3,
                   momentum: float = 0.9, weight_decay: float = 1e-4):
    """Reference per-model optimizer + schedule (L2 is torch-style: added to
    the gradient before the moment updates, not decoupled)."""
    epochs = epochs or EPOCHS_BY_MODEL[model_name]
    lr = lr_schedule_for(model_name, steps_per_epoch, epochs, base_lr)
    if model_name in ("pointnet", "pointnet2"):
        grad_tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    else:
        grad_tx = optax.trace(decay=momentum)
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        grad_tx,
        optax.scale_by_learning_rate(lr),
    ), epochs


def make_train_step(model, tx, model_name: str, smoothing: bool,
                    lambda_ft: float = 1e-3):
    """Jitted (state, data, labels, rng) -> (state, loss, preds)."""

    def loss_fn(params, batch_stats, data, labels, rng, weights):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, data, train=True,
            mutable=["batch_stats"], rngs={"dropout": rng})
        if isinstance(out, tuple):
            logits, trans_feat, _ = out
        else:
            logits, trans_feat = out, None
        loss = cal_loss(logits, labels, smoothing=smoothing, weights=weights)
        if model_name == "pointnet" and trans_feat is not None:
            loss = loss + feature_transform_regularizer(trans_feat) * lambda_ft
        return loss, (logits, mutated["batch_stats"])

    @jax.jit
    def step(state: TrainState, data, labels, rng, valid):
        # tail batches are padded with copies of the last sample; mask the
        # pad rows out of the loss so they carry no gradient (BatchNorm
        # batch stats still see them — a momentum-weighted residual)
        weights = jnp.arange(data.shape[0]) < valid
        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, data,
                                   labels, rng, weights)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        preds = jnp.argmax(logits, axis=-1)
        return (TrainState(new_params, new_stats, new_opt, state.step + 1),
                loss, preds)

    return step


def make_eval_step(model, smoothing: bool):
    @jax.jit
    def step(variables, data, labels, valid=None):
        out = model.apply(variables, data, train=False)
        logits = out[0] if isinstance(out, tuple) else out
        weights = (None if valid is None
                   else jnp.arange(data.shape[0]) < valid)
        loss = cal_loss(logits, labels, smoothing=smoothing, weights=weights)
        return loss, jnp.argmax(logits, axis=-1)
    return step


def fit(model, variables, model_name: str, train_ds, test_ds, *,
        batch_size: int = 32, test_batch_size: int = 16,
        epochs: Optional[int] = None, exp_dir: str = "./checkpoints/run",
        io: Optional[IOStream] = None, seed: int = 1,
        best_acc_gate: float = 0.80, base_lr: float = 1e-3):
    """Train a classifier; checkpoints every 10 epochs + best (acc-gated),
    mirroring the reference acceptance behaviour (main_cls_seed.py:108,202-209)."""
    mkdir(exp_dir + "/models")
    if io is None:
        io = IOStream(exp_dir + "/run.log")
    steps_per_epoch = max(1, -(-len(train_ds) // batch_size))  # ceil: the
    # padded-tail loop really runs ceil(len/bs) steps, and the per-step LR
    # schedules must hit their boundaries on true epoch boundaries
    smoothing = model_name in ("dgcnn", "gcnn", "gcnn_adv")
    tx, epochs = make_optimizer(model_name, steps_per_epoch, epochs, base_lr)
    state = TrainState(variables["params"], variables["batch_stats"],
                       tx.init(variables["params"]), jnp.array(0))
    train_step = make_train_step(model, tx, model_name, smoothing)
    eval_step = make_eval_step(model, smoothing)
    rng = jax.random.PRNGKey(seed)

    best_test_acc = best_acc_gate
    for epoch in range(epochs):
        t0 = time.time()
        losses, count = [], 0
        tr_true, tr_pred = [], []
        for data, labels, valid in prefetch(train_ds.batches(batch_size)):
            rng, sub = jax.random.split(rng)
            state, loss, preds = train_step(state, jnp.asarray(data),
                                            jnp.asarray(labels), sub, valid)
            losses.append(float(loss) * valid)
            tr_true.append(labels[:valid])
            tr_pred.append(np.asarray(preds)[:valid])
            count += valid
        tr_true = np.concatenate(tr_true)
        tr_pred = np.concatenate(tr_pred)
        io.cprint("Train %d, loss: %.6f, train acc: %.6f, train avg acc: "
                  "%.6f (%.1fs)"
                  % (epoch, sum(losses) / count,
                     float((tr_true == tr_pred).mean()),
                     balanced_accuracy(tr_true, tr_pred), time.time() - t0))

        tl, tc = [], 0
        te_true, te_pred = [], []
        for data, labels, valid in test_ds.batches(test_batch_size,
                                                   shuffle=False):
            loss, preds = eval_step(state.variables, jnp.asarray(data),
                                    jnp.asarray(labels), valid)
            tl.append(float(loss) * valid)
            te_true.append(labels[:valid])
            te_pred.append(np.asarray(preds)[:valid])
            tc += valid
        te_true = np.concatenate(te_true)
        te_pred = np.concatenate(te_pred)
        test_acc = float((te_true == te_pred).mean())
        io.cprint("Test %d, loss: %.6f, test acc: %.6f, test avg acc: %.6f"
                  % (epoch, sum(tl) / tc, test_acc,
                     balanced_accuracy(te_true, te_pred)))

        if epoch % 10 == 9:
            save_variables(f"{exp_dir}/models/model_{epoch}.msgpack",
                           state.variables)
        if test_acc >= best_test_acc:
            best_test_acc = test_acc
            save_variables(f"{exp_dir}/models/model_best.msgpack",
                           state.variables)
            io.cprint("#### new best ####")
    return state, best_test_acc
