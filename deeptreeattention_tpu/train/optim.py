"""Optimizers: Adam with a reduce-on-plateau schedule.

Equivalent capability to the reference's torch Adam +
ReduceLROnPlateau(factor=0.75, patience=8, threshold=1e-4 rel, cooldown=0,
eps=1e-8) per level (reference src/models/multi_stage.py:258-275,
src/main.py:135-149). JAX split: the optimizer update is pure optax driven by
an injected learning-rate hyperparameter; the plateau logic is a small
host-side state machine fed by the epoch's validation loss (it is inherently
sequential control logic, not device math).
"""
import optax


def adam_with_plateau(lr):
    """optax chain whose learning rate is mutable via opt_state.hyperparams."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr)


class ReduceLROnPlateau:
    """torch-semantics plateau scheduler over a monitored quantity (min mode)."""

    def __init__(self, lr, factor=0.75, patience=8, threshold=1e-4,
                 threshold_mode="rel", cooldown=0, min_lr=0.0, eps=1e-8):
        self.lr = float(lr)
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.threshold_mode = threshold_mode
        self.cooldown = cooldown
        self.min_lr = min_lr
        self.eps = eps
        self.best = float("inf")
        self.num_bad_epochs = 0
        self.cooldown_counter = 0

    def _is_better(self, value):
        if self.threshold_mode == "rel":
            return value < self.best * (1.0 - self.threshold)
        return value < self.best - self.threshold

    def step(self, value):
        """Feed the monitored value; returns the (possibly reduced) lr."""
        value = float(value)
        if self._is_better(value):
            self.best = value
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1

        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0

        if self.num_bad_epochs > self.patience:
            new_lr = max(self.lr * self.factor, self.min_lr)
            if self.lr - new_lr > self.eps:
                self.lr = new_lr
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return self.lr

    def state_dict(self):
        return {
            "lr": self.lr, "best": self.best,
            "num_bad_epochs": self.num_bad_epochs,
            "cooldown_counter": self.cooldown_counter,
        }

    def load_state_dict(self, state):
        for k, v in state.items():
            setattr(self, k, v)


def set_learning_rate(opt_state, lr):
    """Write the injected hyperparameter in an inject_hyperparams state.

    Stored as a strong-typed f32 array: a Python float would change the jit
    signature of every step consuming the state (weak-typed scalar) and
    silently recompile after the first scheduler update."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    cur = opt_state.hyperparams.get("learning_rate")
    new = jnp.asarray(lr, jnp.float32)
    if isinstance(cur, jax.Array) and not cur.is_fully_addressable:
        # pod-mesh state: keep the global replicated sharding — a locally
        # committed scalar cannot re-enter the multi-process train step
        new = jax.make_array_from_process_local_data(
            cur.sharding, np.asarray(new, np.float32)
        )
    opt_state.hyperparams["learning_rate"] = new
    return opt_state
