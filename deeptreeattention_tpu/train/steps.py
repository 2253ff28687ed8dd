"""jit-compiled train/eval/predict steps shared by all training modules.

One weighted-CE step factory serves TreeModel, MultiStage levels, the
metadata model and AliveDead — the per-module differences are just the model
apply function and input unpacking. Padded batch rows are excluded through
the mask (static batch shapes keep one compiled program per level).
"""

import jax
import jax.numpy as jnp
import optax


def weighted_cross_entropy(logits, labels, class_weights=None, mask=None):
    """torch F.cross_entropy semantics: weighted mean with weight-sum denom."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if class_weights is not None:
        w = class_weights[labels]
    else:
        w = jnp.ones_like(nll)
    if mask is not None:
        w = w * mask.astype(w.dtype)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)


def make_train_step(apply_fn, optimizer, has_batch_stats=True, donate=False,
                    remat=False):
    """Returns jit step: (params, batch_stats, opt_state, images, labels,
    mask, class_weights) -> (params, batch_stats, opt_state, loss).

    donate=True donates params/batch_stats/opt_state buffers to XLA so the
    update happens in place — halves the optimizer-state HBM footprint and
    lets the compiler fuse the apply-updates writes. Callers must not reuse
    the passed-in state afterwards (the training loops reassign it).

    remat=True wraps the forward in jax.checkpoint (rematerialization):
    activations are recomputed in the backward pass instead of stored,
    trading ~1 extra forward of FLOPs for peak-HBM headroom — the standard
    lever for raising batch size on memory-bound training
    (config["remat"])."""

    def step(params, batch_stats, opt_state, images, labels, mask, class_weights):
        def forward(p, stats, x):
            variables = {"params": p}
            if has_batch_stats:
                variables["batch_stats"] = stats
                logits, mutated = apply_fn(
                    variables, x, train=True, mutable=["batch_stats"]
                )
                new_stats = mutated["batch_stats"]
            else:
                logits = apply_fn(variables, x, train=True)
                new_stats = stats
            if isinstance(logits, (list, tuple)):
                logits = logits[-1]
            return logits, new_stats

        fwd = jax.checkpoint(forward) if remat else forward

        def loss_fn(p):
            logits, new_stats = fwd(p, batch_stats, images)
            loss = weighted_cross_entropy(logits, labels, class_weights, mask)
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_stats, new_opt_state, loss

    if donate:
        return jax.jit(step, donate_argnums=(0, 1, 2))
    return jax.jit(step)


def make_eval_step(apply_fn, has_batch_stats=True):
    """Returns jit step: (params, batch_stats, images) -> softmax probs."""

    @jax.jit
    def step(params, batch_stats, images):
        variables = {"params": params}
        if has_batch_stats:
            variables["batch_stats"] = batch_stats
        logits = apply_fn(variables, images, train=False)
        if isinstance(logits, (list, tuple)):
            logits = logits[-1]
        return jax.nn.softmax(logits, axis=-1)

    return step


def make_loss_eval_step(apply_fn, has_batch_stats=True):
    """Returns jit step computing (loss, probs) without updating state."""

    @jax.jit
    def step(params, batch_stats, images, labels, mask, class_weights):
        variables = {"params": params}
        if has_batch_stats:
            variables["batch_stats"] = batch_stats
        logits = apply_fn(variables, images, train=False)
        if isinstance(logits, (list, tuple)):
            logits = logits[-1]
        loss = weighted_cross_entropy(logits, labels, class_weights, mask)
        return loss, jax.nn.softmax(logits, axis=-1)

    return step


def compute_loss_weights(labels, classes, min_loss_weight=None):
    """Inverse-frequency class weights, normalized by the max, with the
    reference's floor quirk preserved (reference src/models/multi_stage.py:67-77:
    weights BELOW min_loss_weight are raised TO min_loss_weight)."""
    import numpy as np

    labels = np.asarray(labels)
    counts = np.array([(labels == c).sum() for c in range(classes)], float)
    with np.errstate(divide="ignore"):
        w = np.where(counts > 0, 1.0 / np.maximum(counts, 1), 1.0)
    w = w / w.max() if w.max() > 0 else w
    if min_loss_weight is not None:
        w[w < min_loss_weight] = min_loss_weight
    return jnp.asarray(w, jnp.float32)
