"""Experiment loggers with the reference's WandbLogger surface.

Reference: src/core/loggers.py:8-71 — ``init``, ``log_dict`` (key/stage),
``log_images`` (lr/lq/sr/hr grids), ``log_flow``, ``save`` (artifact),
``close``. Two backends:

* :class:`WandbLogger` — used when the ``wandb`` package is importable;
* :class:`JsonlLogger` — always-available local backend: scalars go to
  ``metrics.jsonl``, image grids to PNGs under ``media/`` (via cv2).

``build_logger(cfg)`` picks wandb when available unless
``backend: jsonl`` is forced. Only process 0 should construct a logger
(reference gates on rank 0, src/train.py:60-61).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np

try:
    import wandb as _wandb

    _HAS_WANDB = True
except ImportError:  # pragma: no cover
    _HAS_WANDB = False


def flow_to_image(flow: np.ndarray) -> np.ndarray:
    """Visualise a (H, W, 2) flow as an RGB image (HSV wheel encoding,
    torchvision ``flow_to_image`` semantics)."""
    dx, dy = flow[..., 0], flow[..., 1]
    mag = np.sqrt(dx * dx + dy * dy)
    ang = (np.arctan2(dy, dx) + np.pi) / (2 * np.pi)  # [0,1]
    maxmag = max(float(mag.max()), 1e-6)
    hsv = np.stack(
        [ang * 179.0, np.full_like(ang, 255.0), np.clip(mag / maxmag, 0, 1) * 255.0],
        axis=-1,
    ).astype(np.uint8)
    try:
        import cv2

        return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
    except ImportError:  # pragma: no cover
        return np.repeat(hsv[..., 2:3], 3, axis=-1)


def _make_grid(frames: np.ndarray, nrow: int = 8, pad: int = 2) -> np.ndarray:
    """(N, H, W, C) float [0,1] -> one (gh, gw, C) uint8 grid image."""
    n, h, w, c = frames.shape
    if n == 0:
        return np.zeros((pad * 2, pad * 2, c), np.uint8)
    ncol = min(nrow, n)
    nrows = (n + ncol - 1) // ncol
    grid = np.zeros(
        (nrows * (h + pad) + pad, ncol * (w + pad) + pad, c), np.float32
    )
    for i in range(n):
        r, col = divmod(i, ncol)
        y, x = pad + r * (h + pad), pad + col * (w + pad)
        grid[y : y + h, x : x + w] = frames[i]
    return np.clip(np.rint(grid * 255.0), 0, 255).astype(np.uint8)


class JsonlLogger:
    """Local logger: scalars to metrics.jsonl, images to media/*.png."""

    def __init__(
        self,
        save_dir: str = "./logs",
        project: str = "vsrlab_tpu",
        id: Optional[str] = None,
        name: Optional[str] = None,
        tags=None,
        **_,
    ):
        self.dir = Path(save_dir) / project / (id or "run")
        self.dir.mkdir(parents=True, exist_ok=True)
        (self.dir / "media").mkdir(exist_ok=True)
        self._f = open(self.dir / "metrics.jsonl", "a")
        self.name = name
        self._meta = {"project": project, "id": id, "name": name, "tags": tags}
        self._log_raw({"event": "init", **self._meta})

    def _log_raw(self, record: dict):
        record.setdefault("ts", time.time())
        self._f.write(json.dumps(record) + "\n")
        self._f.flush()

    def log_dict(self, metrics: Dict[str, float], epoch: int, stage: str = "Train"):
        record = {f"{k}/{stage}": float(v) for k, v in metrics.items()}
        record["epoch"] = epoch
        self._log_raw(record)

    def _save_image(self, name: str, img: np.ndarray, epoch: int):
        try:
            import cv2

            path = self.dir / "media" / f"{name}_{epoch}.png"
            cv2.imwrite(str(path), img[..., ::-1])
        except ImportError:  # pragma: no cover
            pass

    def log_images(self, epoch: int, stage: str = "Val", **clips):
        """clips: name -> (B, T, H, W, C) or (N, H, W, C) float arrays
        (reference logs lr/lq/sr/hr grids, loggers.py:36-57)."""
        for key, clip in clips.items():
            if clip is None:
                continue
            arr = np.asarray(clip, np.float32)
            if arr.ndim == 5:
                arr = arr.reshape((-1,) + arr.shape[2:])
            self._save_image(f"{key}_{stage}", _make_grid(arr), epoch)

    def log_flow(self, epoch: int, stage: str = "Train", **flows):
        for key, flow in flows.items():
            if flow is None:
                continue
            arr = np.asarray(flow, np.float32)
            if arr.ndim == 5:
                arr = arr.reshape((-1,) + arr.shape[2:])
            imgs = np.stack([flow_to_image(f) for f in arr]).astype(np.float32) / 255.0
            self._save_image(f"{key}_{stage}", _make_grid(imgs), epoch)

    def save(self, path: str):
        """Record a checkpoint artifact (wandb uploads; locally we note it)."""
        self._log_raw({"event": "artifact", "path": str(path)})

    def close(self):
        self._log_raw({"event": "close"})
        self._f.close()


class WandbLogger(JsonlLogger):
    """wandb backend with the same surface (reference loggers.py:8-71)."""

    def __init__(self, save_dir="./logs", project="vsrlab_tpu", id=None,
                 name=None, tags=None, resume="allow", **kw):
        if not _HAS_WANDB:
            raise ImportError(
                "logger backend 'wandb' requested but the wandb package "
                "is not installed; use backend: jsonl (or auto)"
            )
        super().__init__(save_dir, project, id, name, tags)
        self.run = _wandb.init(
            project=project, dir=save_dir, id=id, name=name, tags=tags,
            resume=resume,
        )

    def log_dict(self, metrics, epoch, stage="Train"):
        super().log_dict(metrics, epoch, stage)
        self.run.log(
            {f"{k}/{stage}": float(v) for k, v in metrics.items()}, step=epoch
        )

    def log_images(self, epoch, stage="Val", **clips):
        """Forward image grids to the run (reference log_images,
        src/core/loggers.py:36-46) in addition to the local PNGs."""
        super().log_images(epoch, stage, **clips)
        for key, clip in clips.items():
            if clip is None:
                continue
            arr = np.asarray(clip, np.float32)
            if arr.ndim == 5:
                arr = arr.reshape((-1,) + arr.shape[2:])
            self.run.log(
                {f"Prediction {stage}/{key}": _wandb.Image(_make_grid(arr))},
                step=epoch,
            )

    def log_flow(self, epoch, stage="Train", **flows):
        """Forward flow visualisations (reference log_flow,
        src/core/loggers.py:48-57)."""
        super().log_flow(epoch, stage, **flows)
        for key, flow in flows.items():
            if flow is None:
                continue
            arr = np.asarray(flow, np.float32)
            if arr.ndim == 5:
                arr = arr.reshape((-1,) + arr.shape[2:])
            imgs = (
                np.stack([flow_to_image(f) for f in arr]).astype(np.float32)
                / 255.0
            )
            self.run.log(
                {f"Flow {stage}/{key}": _wandb.Image(_make_grid(imgs))},
                step=epoch,
            )

    def save(self, path):
        super().save(path)
        artifact = _wandb.Artifact("checkpoint", type="model")
        artifact.add_dir(str(path))
        self.run.log_artifact(artifact)

    def close(self):
        self.run.finish()
        super().close()


def build_logger(cfg: Optional[dict]) -> Optional[JsonlLogger]:
    """Instantiate the configured logger (reference build_logger,
    src/core/utils.py:183-186)."""
    if cfg is None:
        return None
    kw = {k: v for k, v in dict(cfg).items() if not k.startswith("_")}
    backend = kw.pop("backend", "auto")
    if backend == "wandb" or (backend == "auto" and _HAS_WANDB):
        return WandbLogger(**kw)
    return JsonlLogger(**kw)
