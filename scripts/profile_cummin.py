"""Cost of chunk_count_pairs' reverse cummin at e2e shapes (VERDICT r5
item 7): is a lean Pallas backward pass worth it?"""
import os, sys, time
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(_repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

N = 62_500_000 - (62_500_000 % (8192 * 7680 // 8192))
N = 62_500_000 // 7680 * 7680   # ~the e2e per-device chunk width
I32 = jnp.int32

def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:8])

def rate(f, args, iters=10, label=""):
    fetch(f(*args)); fetch(f(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = f(*args)
    fetch(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt*1000:.1f} ms")
    return dt

mark = (np.random.default_rng(0).random(N) < 0.02)
mark_d = jax.device_put(jnp.asarray(mark))

@jax.jit
def cummin_rev(mark):
    idx = jax.lax.broadcasted_iota(I32, (N,), 0)
    bound = jnp.where(mark, idx, N)
    nxt = jnp.concatenate([bound[1:], jnp.full((1,), N, dtype=I32)])
    return jax.lax.cummin(nxt, reverse=True)

rate(cummin_rev, (mark_d,), label="1D reverse cummin @62.5M")

# two-level: (R, C) row-wise reverse cummin + row-carry combine
R, C = N // 7680, 7680
assert R * C == N
@jax.jit
def cummin_2l(mark):
    idx = jax.lax.broadcasted_iota(I32, (N,), 0)
    bound = jnp.where(mark, idx, N).reshape(R, C)
    nxt = jnp.concatenate([bound.ravel()[1:],
                           jnp.full((1,), N, dtype=I32)]).reshape(R, C)
    rowmin = jax.lax.cummin(nxt, axis=1, reverse=True)
    carry = jnp.concatenate([
        jax.lax.cummin(rowmin[1:, 0], reverse=True),
        jnp.full((1,), N, dtype=I32)])
    return jnp.minimum(rowmin, carry[:, None]).ravel()

rate(cummin_2l, (mark_d,), label="2-level (8138x7680) cummin")

# parity
a = np.asarray(cummin_rev(mark_d))
b = np.asarray(cummin_2l(mark_d))
print("parity:", np.array_equal(a, b))

# also: what does the FULL chunk_count_pairs tail cost (sort excluded)?
@jax.jit
def full_tail(mark):
    idx = jax.lax.broadcasted_iota(I32, (N,), 0)
    bound = jnp.where(mark, idx, N)
    nxt = jnp.concatenate([bound[1:], jnp.full((1,), N, dtype=I32)])
    nxt = jax.lax.cummin(nxt, reverse=True)
    cnt = jnp.where(mark, (nxt - idx).astype(jnp.uint32), jnp.uint32(0))
    return cnt
rate(full_tail, (mark_d,), label="cummin + cnt")
