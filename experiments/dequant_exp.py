"""Compare q4 dequant arithmetic variants on hardware (steady-state)."""
import functools, time, jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K, N, B = 4096, 11008, 8
NW = 8
k0 = jax.random.PRNGKey(0)
x = jax.random.normal(k0, (B, K), jnp.bfloat16)
packed = [jnp.full((K//2, N), 37 + i, jnp.uint8) for i in range(NW)]
scales = [jnp.full((K//64, N), 0.01, jnp.bfloat16) for _ in range(NW)]

def make_kernel(variant):
    def kern(x_lo_ref, x_hi_ref, qs_ref, s_lo_ref, s_hi_ref, o_ref, acc_ref, *, n_k):
        k = pl.program_id(2)
        @pl.when(k == 0)
        def _(): acc_ref[...] = jnp.zeros_like(acc_ref)
        if variant == "int32":
            p32 = qs_ref[...].astype(jnp.int32)
            lo = ((p32 & 0x0F) - 8).astype(jnp.float32)
            hi = ((p32 >> 4) - 8).astype(jnp.float32)
        elif variant == "u8int8":
            p = qs_ref[...]
            lo8 = pltpu.bitcast(p & jnp.uint8(0x0F), jnp.int8)
            hi8 = pltpu.bitcast(p >> jnp.uint8(4), jnp.int8)
            lo = lo8.astype(jnp.bfloat16) - jnp.bfloat16(8)
            hi = hi8.astype(jnp.bfloat16) - jnp.bfloat16(8)
        elif variant == "biasdot":
            # skip the -8: fold bias via extra term outside (approx here: ignore)
            p32 = qs_ref[...].astype(jnp.int32)
            lo = (p32 & 0x0F).astype(jnp.bfloat16)
            hi = (p32 >> 4).astype(jnp.bfloat16)
        G = 32
        sl = jnp.repeat(s_lo_ref[...].astype(jnp.float32), G, axis=0)
        sh = jnp.repeat(s_hi_ref[...].astype(jnp.float32), G, axis=0)
        lo = (lo.astype(jnp.float32) * sl).astype(jnp.bfloat16)
        hi = (hi.astype(jnp.float32) * sh).astype(jnp.bfloat16)
        acc_ref[...] += jnp.dot(x_lo_ref[...], lo, preferred_element_type=jnp.float32)
        acc_ref[...] += jnp.dot(x_hi_ref[...], hi, preferred_element_type=jnp.float32)
        @pl.when(k == n_k - 1)
        def _(): o_ref[...] = acc_ref[...].astype(o_ref.dtype)
    return kern

def build(variant, bn=256, bkp=512):
    KP = K // 2
    n_k = KP // bkp
    sg = bkp // 32
    kern = functools.partial(make_kernel(variant), n_k=n_k)
    def f(x, qs, s):
        return pl.pallas_call(
            kern, grid=(1, N // bn, n_k),
            in_specs=[
                pl.BlockSpec((B, bkp), lambda i, j, k: (0, k)),
                pl.BlockSpec((B, bkp), lambda i, j, k, _n=n_k: (0, k + _n)),
                pl.BlockSpec((bkp, bn), lambda i, j, k: (k, j)),
                pl.BlockSpec((sg, bn), lambda i, j, k: (k, j)),
                pl.BlockSpec((sg, bn), lambda i, j, k: (k, j)),
            ],
            out_specs=pl.BlockSpec((B, bn), lambda i, j, k: (0, j)),
            out_shape=jax.ShapeDtypeStruct((B, N), x.dtype),
            scratch_shapes=[pltpu.VMEM((B, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(x, x, qs, s, s)
    return f

for variant in ["int32", "u8int8", "biasdot"]:
    try:
        f = build(variant)
        @jax.jit
        def loop(x, qs_l, s_l):
            y = x
            def body(y, _):
                out = y
                for qs, s in zip(qs_l, s_l):
                    out = (f(out[:, :K].astype(jnp.bfloat16), qs, s)[:, :K] * 1e-3)
                return out.astype(jnp.bfloat16), ()
            y, _ = jax.lax.scan(body, y, None, length=3)
            return y
        r = loop(x, packed, scales); np.asarray(jnp.sum(r.astype(jnp.float32)))  # compile+throwaway
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = loop(x, packed, scales); np.asarray(jnp.sum(r.astype(jnp.float32)))
            times.append(time.perf_counter() - t0)
        t = sorted(times)[1] / (3 * NW)
        bpi = K//2*N + K//32*N*2
        print(f"{variant}: {t*1e6:.0f} us/mm -> {bpi/t/1e9:.0f} GB/s", flush=True)
    except Exception as e:
        print(f"{variant}: FAILED {str(e)[:160]}", flush=True)
