import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kern(p_ref, o_ref):
    p = p_ref[...]
    lo8 = pltpu.bitcast(p & jnp.uint8(0x0F), jnp.int8)
    o_ref[...] = lo8.astype(jnp.bfloat16) - jnp.bfloat16(8)

x = jnp.full((256, 256), 200, jnp.uint8)
try:
    y = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.bfloat16))(x)
    print("u8 mask + int8->bf16 OK", np.asarray(y)[0, 0], flush=True)
except Exception as e:
    print("FAIL1:", str(e)[:400], flush=True)

def kern2(p_ref, o_ref):
    p = p_ref[...]
    o_ref[...] = (p >> jnp.uint8(4)).astype(jnp.int32).astype(jnp.bfloat16)

try:
    y = pl.pallas_call(kern2, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.bfloat16))(x)
    print("u8 shift OK", np.asarray(y)[0, 0], flush=True)
except Exception as e:
    print("FAIL2:", str(e)[:400], flush=True)

def kern3(p_ref, o_ref):
    # int8 -> bf16 cast alone
    p = pltpu.bitcast(p_ref[...], jnp.int8)
    o_ref[...] = p.astype(jnp.bfloat16)

try:
    y = pl.pallas_call(kern3, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.bfloat16))(x)
    print("int8->bf16 OK", np.asarray(y)[0, 0], flush=True)
except Exception as e:
    print("FAIL3:", str(e)[:400], flush=True)
