"""U4/U6/U7/A8 — training-math semantics vs brute-force oracles.

Reference: /root/reference/src/transformer_ner/model_utils.py:11-340,
task.py:215-356,448-464.  No Spark session needed — pure numpy.
"""

import math

import numpy as np
import pytest

from kgce.training import (
    FGM,
    PGD,
    AdamW,
    BestScoreTracker,
    Param,
    WarmupLinearSchedule,
    focal_loss,
    group_parameters,
    linear_warmup_lambda,
    train_epochs,
)

rng = np.random.default_rng(7)


# ---------------------------------------------------------------------------
# focal loss
# ---------------------------------------------------------------------------


def _brute_focal(logits, targets, gamma, weight):
    """Per-sample scalar recomputation, no vectorization."""
    out = []
    ws = []
    for row, t in zip(logits, targets):
        z = row - max(row)
        p = [math.exp(v) for v in z]
        s = sum(p)
        probs = [v / s for v in p]
        pt = probs[t]
        w = 1.0 if weight is None else weight[t]
        out.append(-w * ((1 - pt) ** gamma) * math.log(pt))
        ws.append(w)
    return out, ws


def test_focal_loss_matches_brute_force_all_reductions():
    logits = rng.normal(size=(40, 5))
    targets = rng.integers(0, 5, size=40)
    per, ws = _brute_focal(logits, targets, 2.0, None)
    assert focal_loss(logits, targets, reduction="sum") == pytest.approx(sum(per))
    assert focal_loss(logits, targets, reduction="mean") == pytest.approx(
        sum(per) / sum(ws)
    )
    np.testing.assert_allclose(
        focal_loss(logits, targets, reduction="none"), per, rtol=1e-12
    )


def test_focal_loss_weighted_mean_divides_by_weight_sum():
    # torch nll_loss 'mean' divides by sum of selected class weights.
    logits = rng.normal(size=(25, 4))
    targets = rng.integers(0, 4, size=25)
    weight = np.array([0.5, 2.0, 1.0, 3.0])
    per, ws = _brute_focal(logits, targets, 2.0, weight)
    assert focal_loss(logits, targets, weight=weight) == pytest.approx(
        sum(per) / sum(ws)
    )


def test_focal_loss_attention_mask_drops_positions_before_loss():
    # _calculate_loss flattens (batch, seq) and keeps mask==1 only.
    logits = rng.normal(size=(3, 6, 4))
    targets = rng.integers(0, 4, size=(3, 6))
    mask = rng.integers(0, 2, size=(3, 6))
    keep = mask.reshape(-1) == 1
    expect = focal_loss(
        logits.reshape(-1, 4)[keep], targets.reshape(-1)[keep], reduction="sum"
    )
    got = focal_loss(logits, targets, attention_mask=mask, reduction="sum")
    assert got == pytest.approx(expect)


def test_focal_loss_gamma_zero_is_plain_cross_entropy():
    logits = rng.normal(size=(30, 6))
    targets = rng.integers(0, 6, size=30)
    z = logits - logits.max(axis=1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(axis=1, keepdims=True))
    ce = -logp[np.arange(30), targets]
    assert focal_loss(logits, targets, gamma=0.0, reduction="mean") == pytest.approx(
        ce.mean()
    )


# ---------------------------------------------------------------------------
# scheduler
# ---------------------------------------------------------------------------


def test_linear_warmup_lambda_exact_boundaries():
    # model_utils.py:13-18 verbatim semantics.
    w, t = 10, 100
    assert linear_warmup_lambda(0, w, t) == 0.0
    assert linear_warmup_lambda(5, w, t) == 0.5
    assert linear_warmup_lambda(10, w, t) == 1.0  # first post-warmup step
    assert linear_warmup_lambda(55, w, t) == pytest.approx(45 / 90)
    # min_lr floors the MULTIPLIER (the reference quirk), not the lr
    assert linear_warmup_lambda(100, w, t, min_lr=1e-6) == 1e-6
    assert linear_warmup_lambda(10**9, w, t, min_lr=1e-6) == 1e-6
    # zero warmup: max(1, ...) guard
    assert linear_warmup_lambda(0, 0, t) == 1.0


def test_warmup_schedule_drives_optimizer_lr():
    p = {"w": Param([1.0], grad=[0.1])}
    opt = AdamW(p, lr=4e-5)
    sched = WarmupLinearSchedule(opt, num_warmup_steps=4, num_training_steps=8)
    seen = [opt.param_groups[0]["lr"]]
    for _ in range(8):
        sched.step()
        seen.append(opt.param_groups[0]["lr"])
    expect = [4e-5 * linear_warmup_lambda(s, 4, 8) for s in range(9)]
    np.testing.assert_allclose(seen, expect, rtol=1e-12)


# ---------------------------------------------------------------------------
# optimizer
# ---------------------------------------------------------------------------


def test_group_parameters_no_decay_names():
    params = {
        "encoder.layer.0.attention.self.query.weight": Param([1.0]),
        "encoder.layer.0.attention.self.query.bias": Param([1.0]),
        "encoder.layer.0.LayerNorm.weight": Param([1.0]),
        "encoder.layer.0.LayerNorm.bias": Param([1.0]),
    }
    groups = group_parameters(params, weight_decay=0.01)
    assert set(groups[0]["params"]) == {"encoder.layer.0.attention.self.query.weight"}
    assert groups[0]["weight_decay"] == 0.01
    assert groups[1]["weight_decay"] == 0.0
    assert len(groups[1]["params"]) == 3


def test_adamw_two_steps_scalar_closed_form():
    # Hand-computed decoupled AdamW on a scalar with constant grad.
    lr, wd, g = 0.1, 0.5, 2.0
    b1, b2, eps = 0.9, 0.999, 1e-8
    p = {"layer.weight": Param([1.0], grad=[g])}
    opt = AdamW(group_parameters(p, weight_decay=wd), lr=lr, eps=eps)

    x = 1.0
    m = v = 0.0
    for t in (1, 2):
        x *= 1 - lr * wd
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh = m / (1 - b1**t)
        vh = v / (1 - b2**t)
        x -= lr * mh / (math.sqrt(vh) + eps)
        opt.step()
        assert p["layer.weight"].data[0] == pytest.approx(x, rel=1e-12)


def test_adamw_bias_param_gets_no_decay():
    lr, wd = 0.1, 0.5
    pw = {"l.weight": Param([1.0], grad=[0.0]), "l.bias": Param([1.0], grad=[0.0])}
    opt = AdamW(group_parameters(pw, weight_decay=wd), lr=lr)
    opt.step()
    # zero grad => only decay moves the weight; bias must be untouched
    assert pw["l.weight"].data[0] == pytest.approx(1 - lr * wd)
    assert pw["l.bias"].data[0] == 1.0


# ---------------------------------------------------------------------------
# FGM / PGD
# ---------------------------------------------------------------------------


def _mk_params():
    return {
        "bert.embeddings.word_embeddings.weight": Param(
            rng.normal(size=(4, 3)), grad=rng.normal(size=(4, 3))
        ),
        "classifier.weight": Param(rng.normal(size=(2, 3)), grad=rng.normal(size=(2, 3))),
    }


def test_fgm_perturbs_only_embeddings_by_normalized_grad():
    params = _mk_params()
    emb = params["bert.embeddings.word_embeddings.weight"]
    cls = params["classifier.weight"]
    orig_emb, orig_cls = emb.data.copy(), cls.data.copy()
    fgm = FGM(params)
    fgm.attack(epsilon=0.7)
    np.testing.assert_allclose(
        emb.data, orig_emb + 0.7 * emb.grad / np.linalg.norm(emb.grad)
    )
    np.testing.assert_array_equal(cls.data, orig_cls)
    fgm.restore()
    np.testing.assert_array_equal(emb.data, orig_emb)
    assert fgm.backup == {}


def test_fgm_zero_grad_is_noop_but_still_backed_up():
    params = {"embeddings.w": Param([1.0, 2.0], grad=[0.0, 0.0])}
    fgm = FGM(params)
    fgm.attack()
    np.testing.assert_array_equal(params["embeddings.w"].data, [1.0, 2.0])
    fgm.restore()  # backup was taken despite zero norm (reference order)


def test_pgd_projection_stays_on_epsilon_ball():
    params = _mk_params()
    emb = params["bert.embeddings.word_embeddings.weight"]
    orig = emb.data.copy()
    pgd = PGD(params)
    eps = 0.5
    for k in range(3):
        pgd.attack(epsilon=eps, alpha=0.3, is_first_attack=(k == 0))
        r = emb.data - orig
        assert np.linalg.norm(r) <= eps + 1e-9
    pgd.restore()
    np.testing.assert_array_equal(emb.data, orig)


def test_pgd_grad_backup_roundtrip():
    params = _mk_params()
    pgd = PGD(params)
    g0 = {n: p.grad.copy() for n, p in params.items()}
    pgd.backup_grad()
    for p in params.values():
        p.grad = p.grad * 0 + 99.0
    pgd.restore_grad()
    for n, p in params.items():
        np.testing.assert_array_equal(p.grad, g0[n])


# ---------------------------------------------------------------------------
# best-score / early stop
# ---------------------------------------------------------------------------


def test_tracker_improvement_needs_more_than_tol():
    tr = BestScoreTracker()
    assert tr.update(0.5) is True
    assert tr.update(0.5 + 5e-6) is False  # within 1e-5 => not an improvement
    assert tr.update(0.5 + 2e-5) is True


def test_early_stop_fires_after_n_flat_epochs():
    # early_stop=2: epochs with no new best increment the flag.
    tr = BestScoreTracker(early_stop=2)
    tr.update(0.6)
    assert tr.end_epoch() is False  # epoch 0: improved, flag=0
    tr.update(0.55)
    assert tr.end_epoch() is False  # epoch 1: flat, flag=1
    tr.update(0.59)
    assert tr.end_epoch() is True  # epoch 2: flat, flag=2 -> stop


def test_early_stop_disabled_when_nonpositive():
    tr = BestScoreTracker(early_stop=-1)
    for _ in range(10):
        tr.update(0.1)
        assert tr.end_epoch() is False


def test_train_epochs_reports_best_and_stops_early():
    saved = []
    out = train_epochs(
        [[0.3, 0.5], [0.4], [0.45], [0.44], [0.99]],
        early_stop=2,
        on_improve=saved.append,
    )
    # epochs 1 and 2 never beat 0.5 -> flag hits 2 at end of epoch 2,
    # so epochs 3-4 (including the 0.99) never run
    assert out == {
        "best_score": 0.5,
        "best_epoch": 0,
        "epochs_run": 3,
        "early_stopped": True,
    }
    assert saved == [0.3, 0.5]
