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

import concurrent.futures
import json
import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

from scene_generation_tpu.config import Config

META_NAME = "meta.json"


class CheckpointManager:
    def __init__(self, output_dir: str, checkpoint_name: str = "checkpoint",
                 use_async: bool = True):
        self.root = os.path.abspath(os.path.join(output_dir, checkpoint_name))
        os.makedirs(self.root, exist_ok=True)
        # Multi-host: the train state is replicated (every process holds a
        # complete copy), so process 0 is the single writer of record —
        # concurrent writers on a shared filesystem would race on the same
        # paths. Every process still restores.
        self._primary = jax.process_index() == 0
        multi = jax.process_count() > 1
        # save() is gated to process 0, but Orbax's checkpointers run
        # process barriers inside save — with the other processes never
        # entering the call, process 0 would block in
        # sync_global_processes until the Gloo timeout (caught by
        # tests/test_multihost.py::test_two_process_train_cli). The SAVE
        # checkpointer is therefore scoped to active_processes={0} and
        # built ONLY on process 0 (Orbax refuses to construct a barrier
        # set excluding the current process). RESTORE is different: every
        # process restores (it must, to rebuild its replicated state), so
        # the restore checkpointer keeps the default all-process barrier.
        save_opts = ocp.options.MultiprocessingOptions(
            primary_host=0, active_processes={0} if multi else None)
        # Async serialization: training continues while the (multi-GB at
        # default config) state streams out; waits are only taken before a
        # conflicting save/restore or at shutdown.
        if multi and not self._primary:
            self._ckptr = None  # this process never writes state
        elif use_async:
            self._ckptr = ocp.AsyncCheckpointer(
                ocp.PyTreeCheckpointHandler(),
                multiprocessing_options=save_opts)
        else:
            self._ckptr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler(),
                                           multiprocessing_options=save_opts)
        self._restorer = (
            self._ckptr if not multi
            else ocp.Checkpointer(ocp.PyTreeCheckpointHandler()))
        self._async = use_async
        # Single-host async saves run on ONE background worker thread: the
        # device->host fetch (the dominant cost — ~0.5 GB, minutes over a
        # remote tunnel) plus the Orbax write and the meta.json write all
        # execute there IN SUBMISSION ORDER, so the §27 crash invariant
        # (meta lands only after the state commit) holds without the main
        # thread ever blocking. Multi-host keeps everything synchronous: a
        # device fetch of globally-sharded state issued off-thread by the
        # writer alone could deadlock a collective launch.
        self._exec: Optional[concurrent.futures.ThreadPoolExecutor] = (
            concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="ckpt")
            if use_async and not multi and self._primary else None)
        self._pending: List[concurrent.futures.Future] = []
        self._snapshot_fn = None

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
        # Serialize NOW (the caller keeps mutating the meta dict between
        # checkpoints), write LATER: meta.json carries the resume counters,
        # and landing it before the state commits would — under a hard
        # kill in the window — leave counters ahead of the weights (resume
        # would silently skip the gap). On the async path, ordering comes
        # from the serial executor (this write queues behind the state
        # commit submitted by save()); synchronously, from wait().
        payload = json.dumps(meta)

        def _write():
            tmp = self.meta_path + ".tmp"
            with open(tmp, "w") as f:
                f.write(payload)
            os.replace(tmp, self.meta_path)

        if self._exec is not None:
            self._submit(_write)
        else:
            self.wait()
            _write()

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
    def _submit(self, fn) -> None:
        # Surface any error from an ALREADY-finished background task at
        # the next enqueue instead of silently training past a broken
        # checkpoint stream; prune landed futures so the list stays small.
        done = [f for f in self._pending if f.done()]
        self._pending = [f for f in self._pending if not f.done()]
        for f in done:
            f.result()  # raises if the task failed
        self._pending.append(self._exec.submit(fn))

    def wait(self) -> None:
        """Drain every queued save/meta task (raising the first failure),
        then any in-flight Orbax async serialization."""
        pending, self._pending = self._pending, []
        for f in pending:
            f.result()
        if self._async and self._ckptr is not None:
            self._ckptr.wait_until_finished()

    def save(self, state, best: bool = False) -> None:
        """Persist ``state``. Single-host async saves return after ONE
        on-device snapshot copy (~0 stall): the device->host fetch and the
        Orbax write run on the serial background worker. The snapshot is
        dispatched on the device stream BEFORE any later (donating) train
        step touches the buffers, so the background fetch reads stable
        memory while training proceeds; it costs one transient state-sized
        HBM allocation. The task ends with wait_until_finished, so a meta
        write queued behind it lands strictly after the state commit.

        Multi-host keeps the synchronous fetch: the replicated state may
        be sharded over a global mesh, and a device fetch issued by the
        writer alone off-thread could deadlock the collective launch.
        """
        if not self._primary:
            return
        path = os.path.join(self.root, "best" if best else "last")
        if self._exec is not None:
            if self._snapshot_fn is None:
                self._snapshot_fn = jax.jit(
                    lambda s: jax.tree.map(jnp.copy, s))
            snap = self._snapshot_fn(state)

            def _fetch_write_commit():
                self._ckptr.save(path, jax.device_get(snap), force=True)
                self._ckptr.wait_until_finished()

            self._submit(_fetch_write_commit)
        else:
            self.wait()  # serialize with any in-flight save of same dirs
            self._ckptr.save(path, jax.device_get(state), force=True)

    def restore(self, template, best: bool = False):
        self.wait()
        path = os.path.join(self.root, "best" if best else "last")
        if not os.path.exists(path):
            return None
        restored = self._restorer.restore(path, item=jax.device_get(template))
        return self._align_dtypes(template, restored)

    @staticmethod
    def _align_dtypes(template, restored):
        """Cast restored leaves to the template's dtypes, warning once.

        A checkpoint written under a different optimizer precision
        (--adam_mu_dtype flipped between runs) restores with its SAVED
        dtypes; silently training on them would change optimizer-state
        precision mid-run after one extra recompile. The template carries
        the CONFIGURED precision, so align to it explicitly and say so.
        """
        mismatched = []

        def _align(path, t, r):
            t_dtype = getattr(t, "dtype", None)
            if t_dtype is None or getattr(r, "dtype", t_dtype) == t_dtype:
                return r
            mismatched.append(
                f"{jax.tree_util.keystr(path)}: {r.dtype}->{t_dtype}")
            return jnp.asarray(r, t_dtype)

        out = jax.tree_util.tree_map_with_path(_align, template, restored)
        if mismatched:
            print(f"[scene_generation_tpu] WARNING: checkpoint dtypes "
                  f"differ from the configured state on "
                  f"{len(mismatched)} leaves (e.g. {mismatched[0]}); "
                  "cast to the configured dtypes (--adam_mu_dtype flip "
                  "between save and resume is the usual cause)")
        return out

    def has_checkpoint(self) -> bool:
        local = os.path.exists(os.path.join(self.root, "last"))
        if jax.process_count() == 1:
            return local
        # Multi-host: the restore decision must be GLOBAL. If processes
        # disagreed (per-host local disks; only the writer has files), a
        # naive per-process check would send process 0 into restore's
        # all-process barrier alone (hang), or worse, desynchronize the
        # replicated state. Multi-host resume requires output_dir on a
        # shared filesystem; a mixed answer is a configuration error.
        import numpy as np
        from jax.experimental import multihost_utils
        flags = multihost_utils.process_allgather(
            np.asarray([local], dtype=np.int32))
        if flags.any() and not flags.all():
            raise RuntimeError(
                f"checkpoint at {self.root} visible to only "
                f"{int(flags.sum())}/{jax.process_count()} processes; "
                "multi-host resume requires output_dir on a filesystem "
                "shared by all hosts")
        return bool(flags.all())

    # --- best-promotion rule (trainer.py:188-197) ---
    # NOTE: the reference appends val_inception BEFORE comparing with
    # max(...) < val, so its condition can never fire after the first
    # checkpoint (latent bug). We implement the evident intent: compare
    # against the PRIOR history, then append.
    def maybe_promote_best(self, meta: Dict[str, Any], state,
                           score: float,
                           metric: str = "val_inception") -> bool:
        """Promote ``state`` to best/ when ``score`` beats the history.

        ``metric`` names the history list in meta. The reference keys on
        val inception (trainer.py:188-197); without real Inception weights
        that score is degenerate (documented in models/inception.py), so
        train.py keys on val-sg IoU instead — measured and meaningful in
        every environment. Switching metrics mid-run restarts the history
        (different units are not comparable), recorded via
        meta['best_metric'].
        """
        if meta.get("best_metric") != metric:
            meta["best_metric"] = metric
            meta[metric] = []
        history = meta.setdefault(metric, [])
        is_best = (len(meta["best_t"]) == 0 or not history
                   or max(history) < score)
        if is_best:
            meta["best_t"].append(meta["counters"]["t"])
            self.save(state, best=True)
        history.append(score)
        return is_best
