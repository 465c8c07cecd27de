import time, jax, jax.numpy as jnp, numpy as np
k = jax.random.PRNGKey(0)

def timeit(f, args, iters_in_graph, label, bytes_per_iter, trials=3):
    r = f(*args); jax.block_until_ready(r)
    best = 1e9
    for _ in range(trials):
        t0=time.perf_counter(); r = f(*args); jax.block_until_ready(r)
        best = min(best, (time.perf_counter()-t0)/iters_in_graph)
    print(f'{label}: {best*1e6:.0f} us/iter -> {bytes_per_iter/best/1e9:.0f} GB/s', flush=True)

# 1) elementwise read+write bandwidth, 256MB array
W = jax.random.normal(k, (128, 1024, 1024), jnp.bfloat16)  # 256MB
@jax.jit
def ew(w):
    def body(c, _):
        c = c + jnp.sum(w * 1.000001, axis=(0,1))[None,None,:]*0  + c
        return c, ()
    c0 = jnp.zeros((1,1,1024), jnp.bfloat16)
    c, _ = jax.lax.scan(body, c0, None, length=8)
    return c
timeit(ew, (W,), 8, 'reduce-read 256MB', W.nbytes)

# 2) single big matmul [512, 16384] x [16384, 16384] bf16 = 512MB weights
W2 = jax.random.normal(k, (16384, 16384), jnp.bfloat16)
x2 = jax.random.normal(k, (512, 16384), jnp.bfloat16)
@jax.jit
def mm(x, w):
    return x @ w
timeit(mm, (x2, W2), 1, 'big matmul 512MB w', W2.nbytes)

# 3) GEMV B=8 on same 512MB weight
x3 = jax.random.normal(k, (8, 16384), jnp.bfloat16)
@jax.jit
def mv(x, w):
    def body(x, _):
        y = x @ w
        return y[:, :16384]*1e-3, ()
    x, _ = jax.lax.scan(body, x, None, length=8)
    return x
timeit(mv, (x3, W2), 8, 'gemv B=8 512MB w', W2.nbytes)
