"""Training-side math of the reference, torch-free (U4/U6/U7/A8).

The distributed training LOOP stays a non-goal (SURVEY §7: this engine
is the batch-inference / KG-construction side), but the loop's
ingredients are exact reference semantics a user tunes against, so they
ship as plain numpy over ``{name: Param}`` dicts:

* :func:`focal_loss` — FocalLoss.forward + the active-mask selection of
  ``_calculate_loss`` (/root/reference/src/transformer_ner/model_utils.py:211-237).
* :func:`linear_warmup_lambda` / :class:`WarmupLinearSchedule` — the
  reference's patched ``get_linear_schedule_with_warmup``
  (model_utils.py:11-20).  Quirk reproduced exactly: ``min_lr`` is used
  as a floor on the lr *multiplier* (not on the lr itself) because the
  reference compares it against the decay ratio directly.
* :func:`group_parameters` / :class:`AdamW` — the two weight-decay
  groups (task.py:220-226: any name containing ``bias`` or
  ``LayerNorm.weight`` gets decay 0) and the decoupled-weight-decay
  update of ``torch.optim.AdamW`` with default betas.
* :class:`FGM` / :class:`PGD` — adversarial embedding perturbation
  (model_utils.py:245-340): r = eps * g / ||g|| added to every
  parameter whose name contains ``emb_name``; PGD additionally projects
  the accumulated perturbation back onto the eps-ball.
* :class:`BestScoreTracker` — the evaluate/early-stop contract
  (task.py:270-354, 448-464): a score improves iff it beats the best by
  > 1e-5; the early-stop counter advances once per EPOCH without an
  epoch-level improvement and fires when ``0 < early_stop <= flag``.

Everything here is driver-side or per-worker math on small arrays —
nothing shuffles, nothing touches the DataFrame plane.
"""

from __future__ import annotations

from typing import Callable, Iterable, Mapping

import numpy as np

__all__ = [
    "focal_loss",
    "linear_warmup_lambda",
    "WarmupLinearSchedule",
    "group_parameters",
    "AdamW",
    "Param",
    "FGM",
    "PGD",
    "BestScoreTracker",
]


# ---------------------------------------------------------------------------
# U4 — focal loss
# ---------------------------------------------------------------------------


def _log_softmax(logits: np.ndarray) -> np.ndarray:
    m = logits.max(axis=-1, keepdims=True)
    s = logits - m
    return s - np.log(np.exp(s).sum(axis=-1, keepdims=True))


def focal_loss(
    logits: np.ndarray,
    targets: np.ndarray,
    gamma: float = 2.0,
    weight: np.ndarray | None = None,
    reduction: str = "mean",
    attention_mask: np.ndarray | None = None,
):
    """FocalLoss.forward (model_utils.py:211-226) composed with the
    active-position selection of ``_calculate_loss`` (ibid. :228-237).

    ``logits``: (..., num_labels) float array; ``targets``: (...) int
    array; ``attention_mask``: optional (...) 0/1 array — positions with
    mask 0 are dropped BEFORE the loss, exactly as the reference
    flattens and filters on ``attention_mask == 1``.

    Matches ``nll_loss(((1-p)**gamma) * log_p, t, weight, reduction)``:
    per-sample loss = -w[t] * (1-p_t)**gamma * log p_t, and the 'mean'
    reduction divides by the SUM OF WEIGHTS of the selected targets
    (torch semantics), not the sample count.
    """
    num_labels = logits.shape[-1]
    flat_logits = np.asarray(logits, dtype=np.float64).reshape(-1, num_labels)
    flat_targets = np.asarray(targets).reshape(-1)
    if attention_mask is not None:
        active = np.asarray(attention_mask).reshape(-1) == 1
        flat_logits = flat_logits[active]
        flat_targets = flat_targets[active]

    log_prob = _log_softmax(flat_logits)
    prob = np.exp(log_prob)
    focal = ((1.0 - prob) ** gamma) * log_prob
    picked = focal[np.arange(flat_targets.shape[0]), flat_targets]
    if weight is not None:
        w = np.asarray(weight, dtype=np.float64)[flat_targets]
    else:
        w = np.ones_like(picked)
    losses = -w * picked
    if reduction == "none":
        return losses
    if reduction == "sum":
        return float(losses.sum())
    if reduction == "mean":
        return float(losses.sum() / w.sum())
    raise ValueError(f"unknown reduction {reduction!r}")


# ---------------------------------------------------------------------------
# U7 — scheduler + optimizer
# ---------------------------------------------------------------------------


def linear_warmup_lambda(
    current_step: int,
    num_warmup_steps: int,
    num_training_steps: int,
    min_lr: float = 1e-6,
) -> float:
    """The exact ``lr_lambda`` of model_utils.py:11-20 — linear ramp
    0→1 over warmup, then linear decay to ``min_lr`` (a multiplier
    floor, the reference's documented deviation from HF's 0 floor)."""
    if current_step < num_warmup_steps:
        return float(current_step) / float(max(1, num_warmup_steps))
    return max(
        min_lr,
        float(num_training_steps - current_step)
        / float(max(1, num_training_steps - num_warmup_steps)),
    )


class WarmupLinearSchedule:
    """LambdaLR twin: multiplies each group's base lr by the lambda at
    the CURRENT step, starting from step 0 before any ``step()`` call
    (LambdaLR applies the lambda at construction too)."""

    def __init__(self, optimizer: "AdamW", num_warmup_steps: int, num_training_steps: int, min_lr: float = 1e-6):
        self.optimizer = optimizer
        self.num_warmup_steps = int(num_warmup_steps)
        self.num_training_steps = int(num_training_steps)
        self.min_lr = min_lr
        self._step = 0
        self._base_lrs = [g["lr"] for g in optimizer.param_groups]
        self._apply()

    def _apply(self) -> None:
        lam = linear_warmup_lambda(
            self._step, self.num_warmup_steps, self.num_training_steps, self.min_lr
        )
        for g, base in zip(self.optimizer.param_groups, self._base_lrs):
            g["lr"] = base * lam

    def step(self) -> None:
        self._step += 1
        self._apply()

    def get_last_lr(self) -> list[float]:
        return [g["lr"] for g in self.optimizer.param_groups]


class Param:
    """A named tensor with gradient — the unit FGM/PGD/AdamW operate on."""

    __slots__ = ("data", "grad", "requires_grad")

    def __init__(self, data, grad=None, requires_grad: bool = True):
        self.data = np.asarray(data, dtype=np.float64)
        self.grad = None if grad is None else np.asarray(grad, dtype=np.float64)
        self.requires_grad = requires_grad


_NO_DECAY = ("bias", "LayerNorm.weight")


def group_parameters(
    named_params: Mapping[str, Param], weight_decay: float
) -> list[dict]:
    """task.py:220-226 — two groups: names containing 'bias' or
    'LayerNorm.weight' get weight_decay 0.0, the rest ``weight_decay``."""
    decay = {n: p for n, p in named_params.items() if not any(nd in n for nd in _NO_DECAY)}
    no_decay = {n: p for n, p in named_params.items() if any(nd in n for nd in _NO_DECAY)}
    return [
        {"params": decay, "weight_decay": weight_decay},
        {"params": no_decay, "weight_decay": 0.0},
    ]


class AdamW:
    """Decoupled-weight-decay Adam (torch.optim.AdamW defaults:
    betas=(0.9, 0.999)), as constructed at task.py:226.

    Update per step t (torch order): m/v moment update → bias-corrected
    step; weight decay applied as ``p -= lr * wd * p`` BEFORE the Adam
    step (decoupled, multiplicative on the pre-step value)."""

    def __init__(
        self,
        param_groups: list[dict] | Mapping[str, Param],
        lr: float = 1e-5,
        betas: tuple[float, float] = (0.9, 0.999),
        eps: float = 1e-8,
    ):
        if isinstance(param_groups, Mapping):
            param_groups = [{"params": dict(param_groups), "weight_decay": 0.0}]
        self.param_groups = [
            {"params": g["params"], "weight_decay": g.get("weight_decay", 0.0), "lr": lr}
            for g in param_groups
        ]
        self.betas = betas
        self.eps = eps
        self._state: dict[int, dict] = {}
        self._t = 0

    def zero_grad(self) -> None:
        for g in self.param_groups:
            for p in g["params"].values():
                p.grad = None

    def step(self) -> None:
        b1, b2 = self.betas
        self._t += 1
        t = self._t
        for g in self.param_groups:
            lr, wd = g["lr"], g["weight_decay"]
            for name, p in g["params"].items():
                if p.grad is None or not p.requires_grad:
                    continue
                st = self._state.setdefault(
                    id(p), {"m": np.zeros_like(p.data), "v": np.zeros_like(p.data)}
                )
                if wd:
                    p.data = p.data * (1.0 - lr * wd)
                st["m"] = b1 * st["m"] + (1 - b1) * p.grad
                st["v"] = b2 * st["v"] + (1 - b2) * p.grad**2
                m_hat = st["m"] / (1 - b1**t)
                v_hat = st["v"] / (1 - b2**t)
                p.data = p.data - lr * m_hat / (np.sqrt(v_hat) + self.eps)


# ---------------------------------------------------------------------------
# U6 — adversarial training (FGM / PGD)
# ---------------------------------------------------------------------------


class FGM:
    """Fast Gradient Method (model_utils.py:245-281): one-shot
    perturbation of every embedding parameter by eps * grad/||grad||,
    restored after the adversarial backward."""

    def __init__(self, named_params: Mapping[str, Param]):
        self.params = named_params
        self.backup: dict[str, np.ndarray] = {}

    def attack(self, epsilon: float = 1.0, emb_name: str = "embeddings.") -> None:
        for name, p in self.params.items():
            if p.requires_grad and emb_name in name and p.grad is not None:
                self.backup[name] = p.data.copy()
                norm = float(np.linalg.norm(p.grad))
                if norm != 0 and not np.isnan(norm):
                    p.data = p.data + epsilon * p.grad / norm

    def restore(self, emb_name: str = "embeddings.") -> None:
        for name, p in self.params.items():
            if p.requires_grad and emb_name in name:
                assert name in self.backup
                p.data = self.backup[name]
        self.backup = {}


class PGD:
    """Projected Gradient Descent (model_utils.py:284-340): K small
    steps of alpha * grad/||grad||, each projected back onto the
    eps-ball around the ORIGINAL embedding, with grad backup/restore
    around the inner loop."""

    def __init__(self, named_params: Mapping[str, Param]):
        self.params = named_params
        self.emb_backup: dict[str, np.ndarray] = {}
        self.grad_backup: dict[str, np.ndarray] = {}

    def attack(
        self,
        epsilon: float = 1.0,
        alpha: float = 0.3,
        emb_name: str = "embeddings.",
        is_first_attack: bool = False,
    ) -> None:
        for name, p in self.params.items():
            if p.requires_grad and emb_name in name and p.grad is not None:
                if is_first_attack:
                    self.emb_backup[name] = p.data.copy()
                norm = float(np.linalg.norm(p.grad))
                if norm != 0 and not np.isnan(norm):
                    p.data = p.data + alpha * p.grad / norm
                    p.data = self._project(name, p.data, epsilon)

    def _project(self, name: str, data: np.ndarray, epsilon: float) -> np.ndarray:
        r = data - self.emb_backup[name]
        norm = float(np.linalg.norm(r))
        if norm > epsilon:
            r = epsilon * r / norm
        return self.emb_backup[name] + r

    def restore(self, emb_name: str = "embeddings.") -> None:
        for name, p in self.params.items():
            if p.requires_grad and emb_name in name:
                assert name in self.emb_backup
                p.data = self.emb_backup[name]
        self.emb_backup = {}

    def backup_grad(self) -> None:
        for name, p in self.params.items():
            if p.requires_grad and p.grad is not None:
                self.grad_backup[name] = p.grad.copy()

    def restore_grad(self) -> None:
        for name, p in self.params.items():
            if p.requires_grad and name in self.grad_backup:
                p.grad = self.grad_backup[name]


# ---------------------------------------------------------------------------
# A8 — best-score tracking + early stop
# ---------------------------------------------------------------------------


class BestScoreTracker:
    """The reference's evaluate/early-stop contract.

    * ``update(score)`` (task.py:448-457): improvement iff
      ``score - best > 1e-5``; returns True and advances ``best`` (the
      caller saves the checkpoint on True).
    * ``end_epoch()`` (task.py:348-356): if the best improved during
      the epoch the counter resets, else it increments; returns True
      ("stop now") when ``0 < early_stop <= counter``.
    """

    def __init__(self, early_stop: int = -1, tol: float = 1e-5):
        self.best = 0.0
        self.epoch_best = 0.0
        self.early_stop = early_stop
        self.tol = tol
        self.flag = 0
        self.history: list[float] = []

    def update(self, score: float) -> bool:
        self.history.append(score)
        if score - self.best > self.tol:
            self.best = score
            return True
        return False

    def end_epoch(self) -> bool:
        if self.epoch_best < self.best:
            self.epoch_best = self.best
            self.flag = 0
        else:
            self.flag += 1
        return 0 < self.early_stop <= self.flag


def train_epochs(
    epoch_scores: Iterable[Iterable[float]],
    early_stop: int = -1,
    on_improve: Callable[[float], None] | None = None,
) -> dict:
    """Driver-side skeleton of the reference training loop's control
    flow (task.py:268-356) — evaluates a stream of per-epoch dev scores
    and reports the best score, the epoch it occurred in, and how many
    epochs actually ran before early stop fired.

    This is the A8 semantics stripped of torch: the real loop's only
    non-tensor state is exactly (best_score, epoch_best_score,
    early_stop_flag)."""
    tracker = BestScoreTracker(early_stop=early_stop)
    best_epoch = -1
    epochs_run = 0
    for ei, scores in enumerate(epoch_scores):
        epochs_run = ei + 1
        for s in scores:
            if tracker.update(s):
                best_epoch = ei
                if on_improve is not None:
                    on_improve(s)
        if tracker.end_epoch():
            break
    return {
        "best_score": tracker.best,
        "best_epoch": best_epoch,
        "epochs_run": epochs_run,
        "early_stopped": 0 < early_stop <= tracker.flag,
    }
