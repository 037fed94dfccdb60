"""Checkpoint save/restore with best-state promotion.

Reference schema: one torch mega-dict holding args, vocab, module kwargs,
loss history, current AND best states for G + 3 D's + 4 optimizers, and
counters (train.py:132-162, trainer.py:152-203; best keyed on val inception
mean, trainer.py:188-197). Here: Orbax pytree checkpoints for the TrainState
under ``last/`` and ``best/`` + a JSON sidecar for config/vocab/history.
Orbax writes are atomic, giving preemption-safe auto-resume (SURVEY.md §5
"failure detection").
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from scene_generation_tpu.config import Config

META_NAME = "meta.json"


class CheckpointManager:
    def __init__(self, output_dir: str, checkpoint_name: str = "checkpoint",
                 use_async: bool = True):
        self.root = os.path.abspath(os.path.join(output_dir, checkpoint_name))
        os.makedirs(self.root, exist_ok=True)
        # Async serialization: training continues while the (multi-GB at
        # default config) state streams out; waits are only taken before a
        # conflicting save/restore or at shutdown.
        if use_async:
            self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        else:
            self._ckptr = ocp.PyTreeCheckpointer()
        self._async = use_async
        # Multi-host: the train state is replicated (every process holds a
        # complete copy), so process 0 is the single writer of record —
        # concurrent writers on a shared filesystem would race on the same
        # paths. Every process still restores.
        self._primary = jax.process_index() == 0

    # --- metadata sidecar (args/vocab/history, train.py:132-147) ---
    @property
    def meta_path(self) -> str:
        return os.path.join(self.root, META_NAME)

    def load_meta(self) -> Optional[Dict[str, Any]]:
        if not os.path.exists(self.meta_path):
            return None
        with open(self.meta_path) as f:
            return json.load(f)

    def save_meta(self, meta: Dict[str, Any]) -> None:
        if not self._primary:
            return
        tmp = self.meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self.meta_path)

    @staticmethod
    def new_meta(cfg: Config, vocab: Dict) -> Dict[str, Any]:
        return {
            "config": json.loads(cfg.to_json()),
            "vocab": vocab,
            "losses_ts": [],
            "losses": {},
            "d_losses": {},
            "checkpoint_ts": [],
            # Reference quirk preserved + renamed truthfully: its "train"
            # check_model row is a use_gt=True sweep of the VAL loader
            # (reference train.py:224-226), so the history is val_gt_*.
            "val_gt_inception": [],
            "val_inception": [],
            "best_t": [],
            "counters": {"t": 0, "epoch": 0},
        }

    # --- state ---
    def wait(self) -> None:
        if self._async:
            self._ckptr.wait_until_finished()

    def save(self, state, best: bool = False) -> None:
        if not self._primary:
            return
        path = os.path.join(self.root, "best" if best else "last")
        self.wait()  # serialize with any in-flight save of the same dirs
        self._ckptr.save(path, jax.device_get(state), force=True)

    def restore(self, template, best: bool = False):
        self.wait()
        path = os.path.join(self.root, "best" if best else "last")
        if not os.path.exists(path):
            return None
        return self._ckptr.restore(path, item=jax.device_get(template))

    def has_checkpoint(self) -> bool:
        return os.path.exists(os.path.join(self.root, "last"))

    # --- best-promotion rule (trainer.py:188-197) ---
    # NOTE: the reference appends val_inception BEFORE comparing with
    # max(...) < val, so its condition can never fire after the first
    # checkpoint (latent bug). We implement the evident intent: compare
    # against the PRIOR history, then append.
    def maybe_promote_best(self, meta: Dict[str, Any], state,
                           val_inception_mean: float) -> bool:
        history = meta["val_inception"]
        is_best = (len(meta["best_t"]) == 0 or not history
                   or max(history) < val_inception_mean)
        if is_best:
            meta["best_t"].append(meta["counters"]["t"])
            self.save(state, best=True)
        history.append(val_inception_mean)
        return is_best
