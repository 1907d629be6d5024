"""Spatially-tiled video SR inference with overlap blending.

The official VRT test protocol processes large inputs as overlapping
spatial tiles and averages the overlap regions (the reference family's
``--tile``/``tile_overlap`` evaluation mode; vsrlab itself chunks long
videos in time the same way — reference src/test.py:124-135). This is
the production path for inputs whose single-pass activation footprint
exceeds one chip's HBM — e.g. full-config VRT at 16×256×256, whose
unchunked attention logits alone are 10 GB (docs/tpu_kernel_notes.md).

``tiled_forward`` jits the per-tile forward once (all tiles share one
shape) and mean-blends overlaps with a uniform weight map, matching the
official VRT stitching.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, donate_argnums=0)
def _accumulate(acc: jnp.ndarray, sr: jnp.ndarray, oy, ox) -> jnp.ndarray:
    """Add ``sr`` into ``acc`` at spatial offset ``(oy, ox)`` in place.

    ``oy``/``ox`` are traced scalars so one compiled program serves every
    tile position; ``acc`` is donated so the 4x-upscaled accumulator
    (hundreds of MB at full scale) never round-trips through the host.
    """
    start = (0, 0, oy, ox, 0)
    cur = jax.lax.dynamic_slice(acc, start, sr.shape)
    return jax.lax.dynamic_update_slice(acc, cur + sr.astype(acc.dtype), start)


def _tile_starts(size: int, tile: int, stride: int) -> Sequence[int]:
    """Official VRT tiling grid: stride steps plus a final border-snapped
    tile so the whole extent is covered."""
    if tile >= size:
        return [0]
    starts = list(range(0, size - tile, stride))
    starts.append(size - tile)
    return starts


def tiled_forward(
    apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
    lr: jnp.ndarray,
    tile: Tuple[int, int],
    overlap: int = 16,
    scale: Optional[int] = None,
    jit: bool = True,
) -> jnp.ndarray:
    """Run ``apply_fn`` over overlapping spatial tiles and blend.

    Args:
      apply_fn: jittable clip forward ``(B, T, th, tw, C) -> (B, T,
        s*th, s*tw, C)`` (e.g. ``lambda x: model.apply(vars, x)[0]``).
      lr: ``(B, T, H, W, C)`` input clip.
      tile: spatial tile size ``(th, tw)`` (clipped to the input size).
      overlap: tile overlap in input pixels; overlapping output regions
        are averaged (uniform weights, official-VRT stitching).
      scale: output upscale factor; ``None`` infers it from the first
        tile's output shape.
      jit: wrap ``apply_fn`` in ``jax.jit`` here. Pass ``False`` when the
        caller already jitted it (a fresh ``jax.jit`` wrapper per call
        would re-trace the model on every video).

    Returns:
      ``(B, T, scale*H, scale*W, C)`` output clip.
    """
    b, t, h, w, c = lr.shape
    th = min(tile[0], h)
    tw = min(tile[1], w)
    if (th < h and th <= overlap) or (tw < w and tw <= overlap):
        raise ValueError(
            f"tile {th}x{tw} must exceed overlap {overlap} when smaller "
            "than the input (stride would degenerate to 1 px)"
        )
    stride_h = max(th - overlap, 1)
    stride_w = max(tw - overlap, 1)

    jit_apply = jax.jit(apply_fn) if jit else apply_fn
    if scale is None:
        probe = jax.eval_shape(
            jit_apply, jax.ShapeDtypeStruct((b, t, th, tw, c), lr.dtype)
        )
        scale = probe.shape[2] // th

    # The overlap-count weight map is static per tiling grid: build it
    # once on the host (it is tiny work), divide once on device.
    weight = np.zeros((h * scale, w * scale), np.float32)
    for ys in _tile_starts(h, th, stride_h):
        for xs in _tile_starts(w, tw, stride_w):
            oy, ox = ys * scale, xs * scale
            weight[oy : oy + th * scale, ox : ox + tw * scale] += 1.0

    # Accumulate on device: the per-tile forward and the dynamic-slice
    # add are queued asynchronously, so tile k+1's compute overlaps tile
    # k's stitch and nothing crosses the host link until the caller
    # reads the final clip (at full-scale VRT this removes ~450 MB of
    # synchronous per-tile readbacks).
    acc = jnp.zeros((b, t, h * scale, w * scale, c), jnp.float32)
    for ys in _tile_starts(h, th, stride_h):
        for xs in _tile_starts(w, tw, stride_w):
            patch = jax.lax.slice(
                lr, (0, 0, ys, xs, 0), (b, t, ys + th, xs + tw, c)
            )
            sr = jit_apply(patch)
            acc = _accumulate(acc, sr, ys * scale, xs * scale)
    return acc / jnp.asarray(weight)[None, None, :, :, None]
