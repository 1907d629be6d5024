"""Ahead-of-time model export for serving (capability beyond the
reference, which has no deployment story beyond a torch checkpoint).

``export_model`` lowers the jitted SR forward at a FIXED window shape and
serializes it (jax.export / StableHLO) with the trained weights baked in
as constants — one self-contained artifact that any later process can
deserialize and call without the model code, the config system, or a
re-trace. Baked weights were also measured ~10% faster than
params-as-arguments for full-scale VRT (docs/tpu_kernel_notes.md perf
pass IV: 12.8 vs 14.2 s/clip) — a legitimate frozen-weights serving mode.

The artifact records its lowering platform(s): export on the platform you
serve on (default: the current backend), or pass several
(``platforms=("cpu", "tpu")``) for a portable artifact.

Usage::

    python -m vsrlab_tpu.evaluation.export --cfg-dir <run-dir> \
        --output model.jaxexp --window-size 10 --height 180 --width 320

    # later, in any process:
    from vsrlab_tpu.evaluation.export import load_exported
    forward = load_exported("model.jaxexp")
    sr = forward(clip)   # (1, 10, 180, 320, 3) -> (1, 10, 720, 1280, 3)
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def export_model(
    cfg_dir: str,
    out_path: str,
    window_size: int = 10,
    height: int = 180,
    width: int = 320,
    batch: int = 1,
    align_chunks: int = 0,
    use_ema: bool = True,
    platforms: Optional[Sequence[str]] = None,
) -> int:
    """Export the run's model at a fixed input shape. Returns the
    serialized artifact size in bytes."""
    from jax import export as jax_export

    from vsrlab_tpu.evaluation.harness import (
        _tpu_compile_opts,
        load_test_model,
    )

    model, params, _cfg = load_test_model(cfg_dir, use_ema=use_ema)
    if align_chunks and hasattr(model, "align_chunks"):
        model = model.clone(align_chunks=align_chunks)

    # weights baked as constants -> self-contained artifact
    def forward(clip):
        out = model.apply({"params": params}, clip)
        return out[0] if isinstance(out, tuple) else out

    spec = jax.ShapeDtypeStruct(
        (batch, window_size, height, width, 3), jnp.float32
    )
    jitted = jax.jit(forward, compiler_options=_tpu_compile_opts())
    exported = jax_export.export(
        jitted,
        platforms=list(platforms) if platforms else None,
    )(spec)
    blob = exported.serialize()
    out = Path(out_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_bytes(blob)
    return len(blob)


def load_exported_forward(path: str):
    """Deserialize an exported artifact into ``(forward, input_aval)``.

    ``input_aval`` is the fixed input spec the graph was lowered at
    (shape ``(batch, window, H, W, 3)`` + dtype) — callers use it to
    validate/window their input. Calls go through ``exported.call``
    (re-jitted internally, so repeated calls reuse the compiled
    executable)."""
    from jax import export as jax_export

    exported = jax_export.deserialize(Path(path).read_bytes())
    return jax.jit(exported.call), exported.in_avals[0]


def load_exported(path: str):
    """Deserialize an exported artifact into ``forward(clip) -> sr``
    (input shape fixed at export time)."""
    return load_exported_forward(path)[0]


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="AOT-export a trained model")
    ap.add_argument("--cfg-dir", required=True, help="trained run directory")
    ap.add_argument("--output", required=True, help="artifact path")
    ap.add_argument("--window-size", type=int, default=10)
    ap.add_argument("--height", type=int, default=180)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--align-chunks", type=int, default=0)
    ap.add_argument(
        "--raw-weights", action="store_true",
        help="export the raw (non-EMA) weights",
    )
    ap.add_argument(
        "--platforms", nargs="*", default=None,
        help="lowering platforms (default: current backend), e.g. cpu tpu",
    )
    args = ap.parse_args(argv)
    n = export_model(
        args.cfg_dir, args.output, args.window_size, args.height,
        args.width, args.batch, args.align_chunks,
        use_ema=not args.raw_weights, platforms=args.platforms,
    )
    print(
        f"wrote {args.output}: {n / 1e6:.1f} MB "
        f"({args.batch}x{args.window_size}x{args.height}x{args.width}x3)"
    )


if __name__ == "__main__":
    main()
