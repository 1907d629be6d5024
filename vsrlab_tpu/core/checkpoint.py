"""Checkpoint save/restore via orbax.

Reference semantics (src/core/utils.py:69-135): one checkpoint =
{epoch, model params, optimizer state} (+ config snapshot saved next to
it, reloaded at test time); resume modes:

* ``restore`` + ``restore_opt=True`` — params + opt state + epoch
  (continue training);
* ``restore`` + ``finetune=True`` — params only, epoch 0;
* plain ``restore`` — params only (reference keeps epoch 0 unless
  restore_opt).

Unlike the reference (which overwrites a single checkpoint.tar every
eval), saves are versioned per epoch with optional max-to-keep.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp
import yaml


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(
        self,
        epoch: int,
        params: Any,
        opt_state: Any = None,
        extra: Optional[dict] = None,
        config: Optional[dict] = None,
        meta: Optional[dict] = None,
    ):
        """Save a checkpoint (process 0 only does real IO under orbax).

        ``meta`` (small JSON-serialisable dict) is written as a sidecar
        ``meta_<key>.json`` — used by step-granular resume to record
        ``{"epoch": e, "batch_in_epoch": k}`` without entangling the
        orbax payload structure (sharded template restores stay simple).
        """
        payload = {"params": params}
        if opt_state is not None:
            payload["opt_state"] = opt_state
        if extra:
            payload["extra"] = extra
        self._mgr.save(epoch, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()
        if meta is not None:
            with open(self.directory / f"meta_{epoch}.json", "w") as f:
                json.dump(meta, f)
        else:
            # a meta-less save must not inherit a stale sidecar for a
            # reused key (e.g. legacy epoch-keyed run in an old step-keyed
            # directory would silently mis-drive resume)
            (self.directory / f"meta_{epoch}.json").unlink(missing_ok=True)
        # prune sidecars orphaned by orbax's max_to_keep rotation
        live = set(self._mgr.all_steps())
        for p in self.directory.glob("meta_*.json"):
            try:
                key = int(p.stem.split("_", 1)[1])
            except ValueError:
                continue
            if key not in live:
                p.unlink(missing_ok=True)
        if config is not None:
            # config snapshot for test-time reload (reference
            # src/core/utils.py:54-67, src/test.py:80-82)
            with open(self.directory / "config.yaml", "w") as f:
                yaml.safe_dump(config, f)

    def load_meta(self, key: int) -> Optional[dict]:
        """Read the ``meta_<key>.json`` sidecar for a checkpoint key, or
        None if that save carried no meta (legacy epoch-keyed saves)."""
        path = self.directory / f"meta_{key}.json"
        if not path.exists():
            return None
        with open(path) as f:
            return json.load(f)

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_keys(self) -> list:
        """All stored checkpoint keys (epochs or global steps)."""
        return sorted(self._mgr.all_steps())

    def restore(
        self, epoch: Optional[int] = None, template: Any = None
    ) -> Tuple[int, dict]:
        """Restore (epoch, payload). ``template`` is a pytree of like-shaped
        arrays used to interpret the stored structure (sharded restores)."""
        step = epoch if epoch is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        if template is not None:
            payload = self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        else:
            payload = self._mgr.restore(step)
        return step, payload

    def close(self):
        self._mgr.close()


def load_config_snapshot(directory: str) -> dict:
    with open(Path(directory) / "config.yaml") as f:
        return yaml.safe_load(f)
