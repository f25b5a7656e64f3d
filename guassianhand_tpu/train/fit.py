"""One-shot avatar fitting loop.

Counterpart of the reference's Lightning fit (infer_one_shot.py:314-524):
- Adam with lr from config (0.01 one-shot / 0.001 edit, config/one_shot.json)
  and a MultiStepLR schedule (milestones [2,5,10,20,35,50,75] epochs, gamma 0.5,
  infer_one_shot.py:345-349)
- only the per-identity parameters train; the big model is frozen
  (infer_one_shot.py:340-343) — expressed here as an optax mask
- loss = L1 + VGG + mask MSE + identity regularizers
  (compute_error + infer_one_shot.py:514-519)
- "training" = re-fitting the single reference frame for
  epochs * steps_per_epoch steps (dataset_one_shot.py:435-439: 50-step epochs)
"""
from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from guassianhand_tpu.train.losses import (LossWeights, compute_error,
                                           identity_regularizers)

TRAINABLE_KEYS = ("map_bias", "color_w", "color_b", "opacity_b",
                  "identity_code")  # infer_one_shot.py:341


@dataclasses.dataclass(frozen=True)
class FitConfig:
    lr: float = 0.01
    epochs: int = 1
    steps_per_epoch: int = 50
    milestones: Tuple[int, ...] = (2, 5, 10, 20, 35, 50, 75)
    gamma: float = 0.5
    weights: LossWeights = LossWeights()
    # Trainer(accumulate_grad_batches=...) equivalent (infer_one_shot.py:636):
    # average grads over this many micro-batches before each optimizer update.
    accumulate_grad_batches: int = 1
    # stop_gradient the frozen base before the forward (the reference's
    # requires_grad=False semantics, infer_one_shot.py:340-343) so XLA drops
    # the frozen weight-gradient matmuls from the backward entirely instead
    # of computing-then-zeroing them. Updates are bit-identical either way.
    freeze_base_gradients: bool = True
    # Precompute the fit-constant frozen prefix of the feature pipeline
    # (frame embeddings + the whole shade branch) ONCE per fit instead of
    # per step. One-shot fitting re-fits a single constant frame
    # (dataset_one_shot.py:435-439) and no per-identity learnable sits
    # upstream of that prefix, so the cached step matches the recomputing
    # one to fp32 reassociation noise
    # (tests/test_model.py::test_static_feature_cache_exact)
    # while skipping ~a third of the per-step forward FLOPs. TPU-first
    # redesign: the torch reference recomputes it every step.
    static_prefix_cache: bool = True


def lr_schedule(cfg: FitConfig) -> optax.Schedule:
    boundaries = {m * cfg.steps_per_epoch: cfg.gamma for m in cfg.milestones}
    return optax.piecewise_constant_schedule(cfg.lr, boundaries)


def trainable_mask(params) -> Any:
    """True for per-identity leaves (matched by path name)."""

    def mask_fn(path, _leaf):
        names = "/".join(str(getattr(p, "key", getattr(p, "name", p)))
                         for p in path)
        return any(k in names for k in TRAINABLE_KEYS)

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def stop_frozen(params) -> Any:
    """stop_gradient on every frozen-base leaf — the jit counterpart of the
    reference's ``requires_grad=False`` (infer_one_shot.py:340-343), which
    SKIPS those weight-gradient computations rather than zeroing them after
    the fact. Activation gradients still flow through the frozen modules to
    the per-identity leaves; XLA dead-code-eliminates only the dW matmuls
    and the Adam branches that optax.set_to_zero already made no-ops.
    Forward values are identical (stop_gradient is the identity)."""

    def fn(path, leaf):
        names = "/".join(str(getattr(p, "key", getattr(p, "name", p)))
                         for p in path)
        if any(k in names for k in TRAINABLE_KEYS):
            return leaf
        return jax.lax.stop_gradient(leaf)

    return jax.tree_util.tree_map_with_path(fn, params)


def make_optimizer(params, cfg: FitConfig) -> optax.GradientTransformation:
    # adam on the per-identity leaves, hard zero elsewhere (the reference sets
    # requires_grad=False on everything else, infer_one_shot.py:340-343)
    mask = trainable_mask(params)
    labels = jax.tree_util.tree_map(
        lambda m: "train" if m else "freeze", mask)
    tx = optax.multi_transform(
        {"train": optax.adam(lr_schedule(cfg)), "freeze": optax.set_to_zero()},
        labels)
    if cfg.accumulate_grad_batches > 1:
        # Trainer(accumulate_grad_batches=...) equivalent
        # (infer_one_shot.py:636): updates apply every k-th micro-batch.
        tx = optax.MultiSteps(tx, cfg.accumulate_grad_batches)
    return tx


def attach_static_features(model, params, batch: Dict) -> Dict:
    """Return a copy of ``batch`` carrying the precomputed fit-constant
    frozen prefix (``OneShotAvatarModel.static_features``) under
    ``batch["static_feats"]``. Every model forward that sees the key skips
    recomputing the frame embeddings and the shade branch; the prefix is
    deterministic and upstream of every per-identity learnable, so results
    match the recomputing path to fp32 reassociation noise. Valid for the
    whole fit: only per-identity leaves train, so the frozen weights the
    prefix depends on never change."""
    fn = jax.jit(lambda p, b: model.apply(p, b, method="static_features"))
    out = dict(batch)
    out["static_feats"] = fn(params, batch)
    return out


def make_fit_step(model_apply: Callable, vgg_loss_fn: Optional[Callable],
                  optimizer: optax.GradientTransformation,
                  cfg: FitConfig = FitConfig()):
    """Build the jitted fit step.

    model_apply(params, batch) must return a dict with comp_rgb (B,V,H,W,3)
    and comp_mask (B,V,H,W); the batch supplies target_rgb (B,H,W,3) and
    target_mask (B,H,W) for the input view (V=1 during fitting).

    The returned step DONATES params and opt_state (in-place HBM update of
    the model + Adam moments): rebind them from the step's outputs each
    iteration (as fit() does) — reusing the old references raises
    "Array has been deleted".
    """

    def loss_fn(params, batch):
        if cfg.freeze_base_gradients:
            params = stop_frozen(params)
        out = model_apply(params, batch)
        pred_rgb = out["comp_rgb"][:, 0]
        pred_mask = out["comp_mask"][:, 0]
        total, err = compute_error(
            pred_rgb, batch["target_rgb"], pred_mask, batch["target_mask"],
            vgg_loss_fn, cfg.weights)
        flat = params["params"] if "params" in params else params
        reg = identity_regularizers(
            {"color_b": flat["color_b"], "opacity_b": flat["opacity_b"],
             "map_bias": flat["map_bias"]}, cfg.weights)
        err["reg"] = reg
        if "overflow" in out:
            # static-capacity honesty: pairs dropped by the binning budgets
            # (must stay 0; a nonzero count means the caps are undersized
            # for this scene — raise max_tiles_per_gaussian /
            # pairs_per_gaussian instead of silently truncating)
            err["overflow"] = jnp.sum(out["overflow"]).astype(jnp.float32)
        if "interaction_overflow" in out:
            # same honesty rule for the interaction-attention budget
            # (OneShotConfig.interaction_cap): nonzero means interacting
            # points fell back to pass-through — raise the cap
            err["interaction_overflow"] = jnp.sum(
                out["interaction_overflow"]).astype(jnp.float32)
        return total + reg, err

    # donate params/opt_state: they are consumed and returned updated each
    # step, so XLA can update them in place instead of double-buffering the
    # full model + Adam moments in HBM.
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch):
        (loss, err), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, err

    return step


def fit(model_apply: Callable, params, batch_fn: Callable[[int], Dict],
        vgg_loss_fn: Optional[Callable] = None,
        cfg: FitConfig = FitConfig(), log_every: int = 10,
        log_fn: Callable[[str], None] = print, model=None):
    """Run the fitting loop. batch_fn(step) -> batch dict (device arrays).

    When ``cfg.static_prefix_cache`` is set, pass ``model`` (the
    ``OneShotAvatarModel`` instance) so the fit-constant frozen prefix is
    computed once here via :func:`attach_static_features` — the same path
    the CLIs take. Without ``model``, callers must pre-attach
    ``static_feats`` to every batch themselves; a batch arriving without
    the key falls back (correctly but slower) to full recompute.
    """
    if cfg.static_prefix_cache and model is not None:
        first = batch_fn(0)
        if "static_feats" not in first:
            static = attach_static_features(model, params,
                                            first)["static_feats"]
            inner_fn = batch_fn

            def batch_fn(i, _inner=inner_fn, _static=static):
                b = dict(_inner(i))
                b.setdefault("static_feats", _static)
                return b

    optimizer = make_optimizer(params, cfg)
    opt_state = optimizer.init(params)
    step_fn = make_fit_step(model_apply, vgg_loss_fn, optimizer, cfg)

    n_steps = cfg.epochs * cfg.steps_per_epoch
    history = []
    t0 = time.time()
    for i in range(n_steps):
        batch = batch_fn(i)
        params, opt_state, loss, err = step_fn(params, opt_state, batch)
        if i % log_every == 0 or i == n_steps - 1:
            loss_v = float(loss)
            history.append(loss_v)
            log_fn(f"fit step {i}/{n_steps} loss={loss_v:.5f} "
                   f"({time.time() - t0:.1f}s)")
    return params, history
