import time, functools, jax, jax.numpy as jnp, numpy as np
from tokenhawk_tpu.ops.pallas.qmatmul import q8_matmul, q4_matmul

k = jax.random.PRNGKey(0)
K, N = 4096, 11008
B = 8
ITER = 64

def bench(fn, args, label, bytes_per_iter):
    r = fn(*args); r.block_until_ready()
    t0 = time.perf_counter(); r = fn(*args); r.block_until_ready()
    dt = (time.perf_counter() - t0) / ITER
    print(f'{label}: {dt*1e6:.0f} us/matmul  -> {bytes_per_iter/dt/1e9:.0f} GB/s')

# correctness spot-check on-device first
x = jax.random.normal(k, (B, K), jnp.bfloat16)
qs8 = jax.random.randint(k, (K, N), -127, 127, jnp.int8)
s8 = jnp.abs(jax.random.normal(k, (K//32, N), jnp.float32)) * 0.01
y = q8_matmul(x, qs8, s8)
# reference
w = (qs8.astype(jnp.float32).reshape(K//32,32,N) * s8[:,None,:]).reshape(K,N)
yref = x.astype(jnp.float32) @ w
err = jnp.max(jnp.abs(y.astype(jnp.float32)-yref)) / jnp.max(jnp.abs(yref))
print('q8 rel err:', float(err))

qs4 = jax.random.randint(k, (K//2, N), 0, 255, jnp.uint8)
s4 = s8
y4 = q4_matmul(x, qs4, s4)
lo = (qs4 & 15).astype(jnp.int8) - 8; hi = (qs4 >> 4).astype(jnp.int8) - 8
qfull = jnp.concatenate([lo, hi], 0)
w4 = (qfull.astype(jnp.float32).reshape(K//32,32,N) * s4[:,None,:]).reshape(K,N)
y4ref = x.astype(jnp.float32) @ w4
err4 = jnp.max(jnp.abs(y4.astype(jnp.float32)-y4ref)) / jnp.max(jnp.abs(y4ref))
print('q4 rel err:', float(err4))

@jax.jit
def loop8(x, qs, s):
    def body(x, _):
        y = q8_matmul(x, qs, s)
        return y[:, :K].astype(jnp.bfloat16)*1e-2, ()
    x, _ = jax.lax.scan(body, x, None, length=ITER)
    return x

@jax.jit
def loop4(x, qs, s):
    def body(x, _):
        y = q4_matmul(x, qs, s)
        return y[:, :K].astype(jnp.bfloat16)*1e-2, ()
    x, _ = jax.lax.scan(body, x, None, length=ITER)
    return x

bench(loop8, (x, qs8, s8), 'q8 4096x11008', K*N + K//32*N*4)
bench(loop4, (x, qs4, s4), 'q4 4096x11008', K//2*N + K//32*N*4)

# bf16 dense comparison
wd = jax.random.normal(k, (K, N), jnp.bfloat16)
@jax.jit
def loopd(x, w):
    def body(x, _):
        y = x @ w
        return y[:, :K].astype(jnp.bfloat16)*1e-2, ()
    x, _ = jax.lax.scan(body, x, None, length=ITER)
    return x
bench(loopd, (x, wd), 'bf16 dense', 2*K*N)
