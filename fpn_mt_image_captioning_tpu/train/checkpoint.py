"""Checkpointing: Orbax-backed manager + CIDEr-gated smart saver / early stop.

Replaces the reference's ``tf.train.Checkpoint`` / ``CheckpointManager`` pair
(``/root/reference/utils/pipeline.py:38-48``) with Orbax (``max_to_keep=100``
kept), and ports ``SmartCheckpointSaver``'s exact state machine
(``/root/reference/utils/utils.py:120-154``):

  * save only when validation accuracy (CIDEr) improves;
  * while ``epoch <= min_epoch_to_break`` a non-improving epoch *resets* the
    baseline instead of counting against it;
  * signal early stop (-1) once
    ``min(epochs, max(min_epoch_to_break, 2·best_epoch), best_epoch + gap)``
    ≤ current epoch.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager", "SmartCheckpointSaver"]


class CheckpointManager:
    """Thin Orbax wrapper storing the full train state pytree."""

    def __init__(self, directory: str, max_to_keep: int = 100):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    @property
    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def restore(self, state_template: Any, step: int | None = None) -> Any:
        step = self.latest_step if step is None else step
        if step is None:
            return None
        try:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(state_template)
            )
        except ValueError as exact_err:
            # Forward-compat shim: an optimizer swap changes the opt_state
            # pytree (e.g. the r3→r4 optax-AMSGrad → KerasAdamState move) and
            # the exact restore above fails on structure mismatch. Model
            # weights are still perfectly usable — restore params /
            # batch_stats / step field-wise and REINITIALIZE opt_state from
            # the live template, loudly. Any mismatch outside opt_state is a
            # real incompatibility and re-raises.
            if not (hasattr(state_template, "_fields")
                    and "opt_state" in state_template._fields):
                raise
            # raw nested dicts, no template. This also materializes the
            # obsolete opt_state we are about to discard (~2× params of dead
            # I/O) — acceptable on this migrate-once path; a field-subset
            # Orbax restore could trim it if migration ever becomes routine.
            raw = self._mgr.restore(step)
            ts = jax.tree_util.tree_structure
            restored = {}
            for f in state_template._fields:
                tmpl_field = getattr(state_template, f)
                if f == "opt_state":
                    continue
                if f not in raw or ts(raw[f]) != ts(tmpl_field):
                    raise ValueError(
                        f"checkpoint step {step}: field {f!r} structure does "
                        f"not match the live model — not a plain optimizer-"
                        f"format drift, refusing partial restore"
                    ) from exact_err
                def _mismatch(a, b):
                    if np.shape(a) != np.shape(b):
                        return True
                    # dtype too (when both carry one): a same-shape
                    # different-dtype leaf would otherwise restore silently
                    # and surface as drifted numerics far from here
                    da = getattr(a, "dtype", None)
                    db = getattr(b, "dtype", None)
                    return da is not None and db is not None and da != db

                bad = [
                    (getattr(a, "shape", None), getattr(b, "shape", None),
                     str(getattr(a, "dtype", "?")),
                     str(getattr(b, "dtype", "?")))
                    for a, b in zip(jax.tree_util.tree_leaves(raw[f]),
                                    jax.tree_util.tree_leaves(tmpl_field))
                    if _mismatch(a, b)
                ]
                if bad:
                    raise ValueError(
                        f"checkpoint step {step}: field {f!r} leaf "
                        f"shapes/dtypes differ from the live model: {bad[:3]}"
                    ) from exact_err
                restored[f] = raw[f]
            print(
                f"WARNING: checkpoint step {step} stores an optimizer state "
                f"from an older optimizer format; restored params/batch_stats"
                f"/step and REINITIALIZED opt_state (momenta reset — expect a "
                f"brief warmup transient)."
            )
            restored["opt_state"] = state_template.opt_state
            return type(state_template)(**restored)

    def all_steps(self):
        return self._mgr.all_steps()

    def close(self):
        self._mgr.close()


class SmartCheckpointSaver:
    """CIDEr-gated checkpoint/early-stop state machine (reference parity)."""

    def __init__(self, ckpt_manager, epochs: int = 100,
                 min_epoch_to_break: int | None = None, gap_of_dead_epoch: int = 25):
        self.ckpt_manager = ckpt_manager
        self.epochs = epochs
        # None → epochs // 2: the same rule Config.min_epoch_to_break
        # defaults to (config.py) — keep the two in lockstep
        self.min_epoch_to_break = (
            epochs // 2 if min_epoch_to_break is None else min_epoch_to_break
        )
        self.gap_of_dead_epoch = gap_of_dead_epoch
        self.max_val_acc = -np.inf
        self.max_acc_epoch = 0
        # the step holding the best metric among checkpoints ACTUALLY saved —
        # distinct from max_acc_epoch, which the reference state machine also
        # moves on its early-epoch baseline *resets* (no save), so a
        # post-reset save can sit at a higher step with a worse metric;
        # restoring "latest" there exports the worse weights (train.py uses
        # this to restore the true best)
        self.best_saved_step: int | None = None
        self.best_saved_acc = -np.inf

    def __call__(self, curr_epoch: int, curr_val_acc: float, state: Any = None) -> int:
        """Returns 1 = checkpoint saved, 0 = nothing, -1 = early-stop signal."""
        if self.max_acc_epoch == 0:
            self.max_val_acc = curr_val_acc
            self.max_acc_epoch = curr_epoch

        if curr_val_acc > self.max_val_acc:
            if state is not None:
                self.ckpt_manager.save(curr_epoch, state)
                print(f"Saving checkpoint for epoch {curr_epoch} at {self.ckpt_manager.directory}")
                if curr_val_acc > self.best_saved_acc:
                    self.best_saved_acc = curr_val_acc
                    self.best_saved_step = curr_epoch
            self.max_val_acc = curr_val_acc
            self.max_acc_epoch = curr_epoch
            return 1
        elif curr_epoch <= self.min_epoch_to_break:
            # early epochs: reset the baseline rather than counting toward death
            self.max_val_acc = curr_val_acc
            self.max_acc_epoch = curr_epoch
        else:
            epoch_min = min(
                self.epochs,
                max(self.min_epoch_to_break, int(self.max_acc_epoch * 2.0)),
                int(self.max_acc_epoch + self.gap_of_dead_epoch),
            )
            if epoch_min <= curr_epoch:
                return -1
        return 0
