"""Framework callbacks with the reference's training-control semantics
(notebook cell 5): best-val_Jaccard checkpointing, LR-on-plateau halving,
early stopping.  All are host-side epoch-boundary logic; the device step
never sees them except through the scalar ``lr_scale``.
"""

from __future__ import annotations

import numpy as np


class Callback:
    def set_trainer(self, trainer):
        self.trainer = trainer

    def on_epoch_end(self, epoch: int, logs: dict):
        pass

    # monitoring callbacks carry best/wait across a preemption resume
    # (saved into the train-state checkpoint by Trainer.fit)
    def get_state(self) -> dict:
        return {}

    def set_state(self, state: dict):
        pass


class _MonitorCallback(Callback):
    """Shared monitor/best/wait bookkeeping for the three training-control
    callbacks (one place for the improved-comparison and resume state)."""

    def __init__(self, monitor: str, mode: str):
        self.monitor = monitor
        self.mode = mode
        self.best = -np.inf if mode == "max" else np.inf
        self.wait = 0

    def _improved(self, value: float) -> bool:
        return value > self.best if self.mode == "max" else value < self.best

    def get_state(self) -> dict:
        return {"best": float(self.best), "wait": int(self.wait)}

    def set_state(self, state: dict):
        self.best = float(state.get("best", self.best))
        self.wait = int(state.get("wait", self.wait))


class ModelCheckpoint(_MonitorCallback):
    """notebook cell 5: save_best_only weights-only checkpoint on
    monitor='val_Jaccard', mode='max'.  Writes the Keras h5 format so the
    reference can load our checkpoints and vice versa."""

    def __init__(self, filepath: str, monitor: str = "val_Jaccard",
                 mode: str = "max", save_best_only: bool = True,
                 verbose: int = 0):
        super().__init__(monitor, mode)
        self.filepath = filepath
        self.save_best_only = save_best_only
        self.verbose = verbose

    def _save(self, epoch, value):
        # multi-host: every process runs the same monitor logic (replicated
        # metrics keep decisions consistent) but only process 0 writes
        from deeplab_tpu.parallel.mesh import is_coordinator
        if not is_coordinator():
            return
        from deeplab_tpu.params import save_keras_h5
        save_keras_h5(self.filepath, self.trainer.params,
                      self.trainer.state)
        if self.verbose:
            tag = "" if value is None else f" ({self.monitor}={value:.4f})"
            print(f"epoch {epoch}: saved {self.filepath}{tag}")

    def on_epoch_end(self, epoch: int, logs: dict):
        value = logs.get(self.monitor)
        if not self.save_best_only:
            # Keras semantics: unconditional per-epoch save, monitor or not
            self._save(epoch, value)
            return
        if value is None:
            print(f"warning: can save best model only with {self.monitor} "
                  f"available, skipping (have: {sorted(logs)})")
            return
        if self._improved(value):
            self.best = value
            self._save(epoch, value)


class ReduceLROnPlateau(_MonitorCallback):
    """notebook cell 5: factor=0.5, patience=5, min_lr=1e-6 on val_Jaccard."""

    def __init__(self, monitor: str = "val_Jaccard", factor: float = 0.5,
                 patience: int = 5, min_lr: float = 1e-6, mode: str = "max",
                 verbose: int = 0):
        super().__init__(monitor, mode)
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.verbose = verbose

    def on_epoch_end(self, epoch: int, logs: dict):
        value = logs.get(self.monitor)
        if value is None:
            return
        if self._improved(value):
            self.best = value
            self.wait = 0
            return
        self.wait += 1
        if self.wait >= self.patience:
            old = self.trainer.current_lr()
            if old > self.min_lr:
                new_scale = max(self.trainer.lr_scale * self.factor,
                                self.min_lr / self.trainer.base_lr)
                self.trainer.lr_scale = new_scale
                if self.verbose:
                    print(f"epoch {epoch}: reducing lr to "
                          f"{self.trainer.current_lr():.2e}")
            self.wait = 0


class JSONLLogger(Callback):
    """Append one JSON object per epoch to a logfile (the framework's
    observability channel; reference used TensorBoard, notebook cell 5)."""

    def __init__(self, path: str):
        self.path = path

    def on_epoch_end(self, epoch: int, logs: dict):
        # multi-host: one JSONL writer per job (process 0)
        from deeplab_tpu.parallel.mesh import is_coordinator
        if not is_coordinator():
            return
        import json
        import os
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "a") as f:
            f.write(json.dumps({"epoch": epoch,
                                "lr": self.trainer.current_lr(), **logs})
                    + "\n")


class TensorBoard(Callback):
    """Optional TensorBoard scalars via tf.summary (reference notebook
    cell 5: TensorBoard(log_dir='./logs/'+net)).  No-op if TF is absent."""

    def __init__(self, log_dir: str = "./logs"):
        self.log_dir = log_dir
        self._writer = None

    def _get_writer(self):
        if self._writer is None:
            import tensorflow as tf
            self._writer = tf.summary.create_file_writer(self.log_dir)
        return self._writer

    def on_epoch_end(self, epoch: int, logs: dict):
        from deeplab_tpu.parallel.mesh import is_coordinator
        if not is_coordinator():
            return   # one event-file writer per job (process 0)
        try:
            import tensorflow as tf
        except ImportError:
            return
        with self._get_writer().as_default():
            for k, v in logs.items():
                tf.summary.scalar(k, float(v), step=epoch)
            tf.summary.scalar("lr", self.trainer.current_lr(), step=epoch)


class EarlyStopping(_MonitorCallback):
    """notebook cell 5: patience=100 on val_Jaccard (mode max)."""

    def __init__(self, monitor: str = "val_Jaccard", patience: int = 100,
                 mode: str = "max", verbose: int = 0):
        super().__init__(monitor, mode)
        self.patience = patience
        self.verbose = verbose

    def on_epoch_end(self, epoch: int, logs: dict):
        value = logs.get(self.monitor)
        if value is None:
            return
        if self._improved(value):
            self.best = value
            self.wait = 0
            return
        self.wait += 1
        if self.wait >= self.patience:
            self.trainer.stop_training = True
            if self.verbose:
                print(f"epoch {epoch}: early stopping")
