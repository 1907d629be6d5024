"""Fixed DCT patch tokeniser / detokeniser.

Capability parity with the reference's experimental DCT codec
(reference src/core/modules/dct_transforms.py:8-72): a type-II 2-D DCT
basis applied per ``ps×ps`` patch, per colour channel, producing tokens
``(B, T, P, 3*ps*ps)``; the decoder inverts it.

TPU-first: instead of a grouped conv with frozen weights, the forward is
one einsum against a precomputed orthonormal basis — a single MXU matmul
per frame — and the inverse reuses the transposed basis (the DCT matrix is
orthogonal, so IDCT = DCTᵀ).
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=8)
def _dct_basis(ps: int) -> np.ndarray:
    """(ps*ps, ps, ps) type-II orthonormal 2-D DCT basis (reference
    dct_transforms.py:23-39)."""

    def filt(pos, freq, n):
        r = math.cos(math.pi * freq * (pos + 0.5) / n) / math.sqrt(n)
        return r * math.sqrt(2) if freq else r

    m = np.zeros((ps, ps, ps, ps), dtype=np.float64)
    for u in range(ps):
        for v in range(ps):
            for i in range(ps):
                for j in range(ps):
                    m[u, v, i, j] = filt(i, u, ps) * filt(j, v, ps)
    return m.reshape(ps * ps, ps, ps).astype(np.float32)


class EncoderDCT:
    """Clip (B, T, H, W, 3) -> DCT tokens (B, T, (H/ps)*(W/ps), 3*ps*ps)."""

    def __init__(self, ps: int = 4):
        self.ps = ps
        self.basis = jnp.asarray(_dct_basis(ps))  # (ps*ps, ps, ps)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, h, w, c = x.shape
        ps = self.ps
        hp, wp = h // ps, w // ps
        # extract patches: (B, T, hp, ps, wp, ps, C) -> (B,T,hp,wp,C,ps,ps)
        x = x.reshape(b, t, hp, ps, wp, ps, c).transpose(0, 1, 2, 4, 6, 3, 5)
        # DCT per patch: contract (ps, ps) with basis
        tok = jnp.einsum("bthwcij,kij->bthwck", x, self.basis)
        # channel layout matches reference grouped conv: (C * ps*ps)
        tok = tok.reshape(b, t, hp * wp, c * ps * ps)
        return tok


class DecoderIDCT:
    """Inverse of :class:`EncoderDCT` back to (B, T, H, W, 3)."""

    def __init__(self, ps: int, h: int, w: int):
        self.ps = ps
        self.hp = h // ps
        self.wp = w // ps
        self.basis = jnp.asarray(_dct_basis(ps))

    def __call__(self, tok: jnp.ndarray) -> jnp.ndarray:
        b, t, p, ck = tok.shape
        ps = self.ps
        c = ck // (ps * ps)
        tok = tok.reshape(b, t, self.hp, self.wp, c, ps * ps)
        x = jnp.einsum("bthwck,kij->bthwcij", tok, self.basis)
        x = x.transpose(0, 1, 2, 5, 3, 6, 4)  # (B,T,hp,ps,wp,ps,C)
        return x.reshape(b, t, self.hp * ps, self.wp * ps, c)
