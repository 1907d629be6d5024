"""Phase-timing probe for the bench vrt_full leg: where do the ~110-150 s go?"""
import time, sys

T0 = time.monotonic()
def log(m):
    print(f"[+{time.monotonic()-T0:6.1f}s] {m}", file=sys.stderr, flush=True)

import jax
import jax.numpy as jnp
import numpy as np
from vsrlab_tpu.utils import enable_compilation_cache

enable_compilation_cache()
log("imports done")

# tunnel warmup
float(jax.jit(jnp.sum)(jnp.ones((8, 8), jnp.float32)))
log("tunnel warm")

from vsrlab_tpu.models import VRT

rng = np.random.default_rng(2)
t, s = 16, 256
full = VRT(upscale=4, img_size=(t, s, s), align_chunks=30, dtype=jnp.bfloat16)
clip = jnp.asarray(rng.random((1, t, s, s, 3)), jnp.float32)
log("model built")

fv = jax.jit(full.init)(jax.random.PRNGKey(0), clip)
jax.block_until_ready(fv)
log("init done (traced+compiled+ran init)")

def full_fwd(v, z):
    sr, _ = full.apply(v, z)
    return jnp.sum(sr)

lowered = jax.jit(full_fwd).lower(fv, clip)
log("TRACE (lower) done")
compiled = lowered.compile()
log("COMPILE (cache-served) done")
acc = compiled(fv, clip)
float(acc)
log("first call done")
for i in range(2):
    acc = compiled(fv, clip)
    float(acc)
    log(f"call {i+2} done")

# --- export path: serialize (weights baked), then measure deserialize+compile ---
from jax import export as jax_export

def fwd_baked(z):
    sr, _ = full.apply(fv, z)
    return jnp.sum(sr)

spec = jax.ShapeDtypeStruct((1, t, s, s, 3), jnp.float32)
exported = jax_export.export(jax.jit(fwd_baked))(spec)
log("export TRACE done")
blob = exported.serialize()
log(f"export serialize done ({len(blob)/1e6:.1f} MB), platforms={exported.platforms}")
import pathlib
pathlib.Path("/tmp/vrt_full_probe.jaxexp").write_bytes(blob)

exported2 = jax_export.deserialize(blob)
log("deserialize done")
call = jax.jit(exported2.call)
acc = call(clip)
float(acc)
log("exported first call (compile+run) done")
acc = call(clip)
float(acc)
log("exported second call done")
