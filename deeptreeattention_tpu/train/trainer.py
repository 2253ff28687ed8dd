"""Trainer facade: Lightning-shaped orchestration over the training modules.

The reference drives everything through pytorch_lightning.Trainer
(reference train.py:89-110, src/predict.py:144-161). Modules here own their
compiled step functions; Trainer carries run-level policy (epochs,
fast_dev_run, logger, profiling, checkpoint dir) so reference-style call
sites — Trainer(...).fit(m); trainer.predict(m, dataloaders=...) — work
unchanged.
"""
import os
import time

from deeptreeattention_tpu.utils.logging import get_logger

log = get_logger(__name__)


class Trainer:
    def __init__(self, max_epochs=None, fast_dev_run=False, logger=None,
                 enable_checkpointing=True, default_root_dir="snapshots",
                 profiler=None, gpus=None, accelerator=None, num_sanity_val_steps=0,
                 callbacks=None):
        self.max_epochs = max_epochs
        self.fast_dev_run = fast_dev_run
        self.logger = logger
        self.enable_checkpointing = enable_checkpointing
        self.default_root_dir = default_root_dir
        self.profiler = profiler
        self.callbacks = callbacks or []
        self.module = None
        self.history = None

    def fit(self, module, **kwargs):
        self.module = module
        t0 = time.time()
        if self.callbacks:
            log.warning(
                "Trainer callbacks are not executed here (%d given) — use "
                "module.fit(checkpoint_dir=...) or enable_checkpointing",
                len(self.callbacks),
            )
        experiment = getattr(self.logger, "experiment", self.logger)
        self.history = module.fit(
            epochs=self.max_epochs, experiment=experiment,
            fast_dev_run=self.fast_dev_run, **kwargs,
        )
        if self.profiler:
            log.info("fit wall-clock: %.1fs", time.time() - t0)
        # Lightning semantics: enable_checkpointing writes a checkpoint of
        # the fitted module under default_root_dir
        if self.enable_checkpointing and hasattr(module, "save_checkpoint"):
            try:
                path = os.path.join(self.default_root_dir, "last")
                os.makedirs(self.default_root_dir, exist_ok=True)
                module.save_checkpoint(path)
                log.info("checkpoint written to %s", path)
            except Exception as e:  # checkpointing must not kill the run
                log.warning("post-fit checkpoint failed: %s", e)
        return self.history

    def validate(self, module=None, *args, **kwargs):
        module = module or self.module
        return module.validate(*args, **kwargs)

    def predict(self, module=None, dataloaders=None):
        module = module or self.module
        return module.predict(dataloaders)

    def save_checkpoint(self, path, module=None):
        module = module or self.module
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        return module.save_checkpoint(path)
