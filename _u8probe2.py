import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# two's-complement nibble dequant, no shifts:
def kern(p_ref, lo_ref, hi_ref):
    p = p_ref[...]
    lo = pltpu.bitcast((p & jnp.uint8(0x0F)) ^ jnp.uint8(0x08), jnp.int8)
    lo_ref[...] = lo.astype(jnp.bfloat16) - jnp.bfloat16(8)
    hi = pltpu.bitcast(p & jnp.uint8(0xF0), jnp.int8)
    hi_ref[...] = hi.astype(jnp.bfloat16) * jnp.bfloat16(1 / 16)

qlo = np.arange(-8, 8, dtype=np.int8)
qhi = np.arange(-8, 8, dtype=np.int8)[::-1].copy()
packed = ((qlo.astype(np.uint8) & 0xF) | ((qhi.astype(np.uint8) & 0xF) << 4))
x = jnp.asarray(np.tile(packed, (8, 16)), jnp.uint8)  # [8, 256]
try:
    lo, hi = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct(x.shape, jnp.bfloat16),
                   jax.ShapeDtypeStruct(x.shape, jnp.bfloat16)))(x)
    lo = np.asarray(lo).astype(np.float32)[0, :16]
    hi = np.asarray(hi).astype(np.float32)[0, :16]
    print("lo ok:", np.array_equal(lo, qlo.astype(np.float32)), lo[:6], flush=True)
    print("hi ok:", np.array_equal(hi, qhi.astype(np.float32)), hi[:6], flush=True)
except Exception as e:
    print("FAIL:", str(e)[:300], flush=True)
