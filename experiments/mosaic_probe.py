"""Probe which dequant-relevant ops Mosaic accepts/lowers on this chip.

Each probe compiles+runs a tiny pallas kernel; prints ok/fail per feature.
(int4 arrays cannot be device_put through the axon relay — RecursionError —
so int4 probes construct the array on device inside jit.)
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
import numpy as np


def probe(name, fn):
    try:
        out = jax.block_until_ready(fn())
        print(f"ok   {name}: {np.asarray(out).ravel()[:4]}")
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")


def run_kernel(kernel, out_shape, *args):
    return pl.pallas_call(kernel, out_shape=out_shape)(*args)


u8 = jnp.arange(8 * 128, dtype=jnp.uint8).reshape(8, 128)
i8 = jnp.arange(-64, 64, dtype=jnp.int8)
i8 = jnp.tile(i8, 8).reshape(8, 128)
f32s = jax.ShapeDtypeStruct((8, 128), jnp.float32)
bf16s = jax.ShapeDtypeStruct((8, 128), jnp.bfloat16)

probe("i8->f32 convert", lambda: run_kernel(
    lambda x_ref, o_ref: o_ref.__setitem__(..., x_ref[...].astype(jnp.float32)),
    f32s, i8))
probe("u8->i16->f32", lambda: run_kernel(
    lambda x_ref, o_ref: o_ref.__setitem__(
        ..., (x_ref[...].astype(jnp.int16) & 0xF).astype(jnp.float32)),
    f32s, u8))
probe("u8 &0xF in u8, ->i32->f32", lambda: run_kernel(
    lambda x_ref, o_ref: o_ref.__setitem__(
        ..., (x_ref[...] & 0xF).astype(jnp.int32).astype(jnp.float32)),
    f32s, u8))

# int4 on-device: astype inside jit, then pallas consumes it
def _i4_kernel_input():
    @jax.jit
    def f(x):
        x4 = x.astype(jnp.int4)
        return pl.pallas_call(
            lambda x_ref, o_ref: o_ref.__setitem__(
                ..., x_ref[...].astype(jnp.float32)),
            out_shape=f32s)(x4)
    lo = jnp.tile(jnp.arange(-8, 8, dtype=jnp.int8), 64).reshape(8, 128)
    return f(lo)
probe("int4 ref ->f32 (on-device int4)", _i4_kernel_input)

def _i4_bitcast_in_kernel():
    def k(x_ref, o_ref):
        x4 = jax.lax.bitcast_convert_type(x_ref[...], jnp.int4)  # [8,128,2]
        o_ref[...] = x4[..., 0].astype(jnp.float32)
    return run_kernel(k, f32s, u8)
probe("in-kernel u8 bitcast->int4", _i4_bitcast_in_kernel)

i32o = jax.ShapeDtypeStruct((128, 128), jnp.int32)
i8sq = jnp.ones((128, 128), jnp.int8)
probe("int8 MXU dot", lambda: run_kernel(
    lambda a_ref, b_ref, o_ref: o_ref.__setitem__(
        ..., jax.lax.dot_general(a_ref[...], b_ref[...],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)),
    i32o, i8sq, i8sq))

# f32 x f32 fma fusion sanity (perf question, but check it lowers)
s = jnp.full((1, 128), 2.0, jnp.float32)
probe("fma pattern v*s+m", lambda: run_kernel(
    lambda x_ref, s_ref, o_ref: o_ref.__setitem__(
        ..., x_ref[...].astype(jnp.int32).astype(jnp.float32)
        * s_ref[...] + 1.0),
    f32s, u8, s))
