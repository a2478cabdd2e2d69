"""Microbench: XLA sort cost on this chip: sizes x operand counts.
Also: random-gather cost per size, for the record."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import metacherchant_tpu  # noqa: F401
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def probe(x):
    cpu = jax.devices("cpu")[0]
    return np.asarray(jax.device_put(x, cpu))


@jax.jit
def sort1(x):
    s = jnp.sort(x)
    return s[0] ^ s[-1] ^ s[x.shape[0] // 2]


@jax.jit
def sort2(x, w):
    s, v = jax.lax.sort((x, w), num_keys=1)
    return s[0] ^ s[-1] ^ v[x.shape[0] // 2]


@jax.jit
def gath(x, idx):
    g = x[idx]
    n = (g.shape[0] // 128) * 128
    return g[:n].reshape(-1, 128).sum(0)[0] + g[n:].sum()


def chain(name, fn, make_args, reps=8):
    args = [make_args(i) for i in range(reps + 1)]
    t0 = time.perf_counter()
    r = fn(*args[0])
    probe(r)
    log(f"  {name} compile+1: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    acc = None
    for i in range(1, reps + 1):
        acc = fn(*args[i])
    probe(acc)
    dt = (time.perf_counter() - t0) / reps
    log(f"{name}: {dt * 1000:.1f} ms")


def main():
    rng = np.random.default_rng(0)
    log(f"device={jax.devices()[0].platform}")
    for log2 in (20, 22, 24):
        n = 1 << log2
        mk = lambda i: (jnp.asarray(
            rng.integers(0, 1 << 62, size=n).astype(np.int64)),)
        chain(f"sort1 2^{log2}", sort1, mk)
        mk2 = lambda i: (jnp.asarray(
            rng.integers(0, 1 << 62, size=n).astype(np.int64)),
            jnp.asarray(rng.integers(0, 1 << 30, size=n).astype(np.int64)))
        chain(f"sort2 2^{log2}", sort2, mk2)
    # random gather 1M from 2^24
    src = jnp.asarray(rng.integers(0, 1 << 62, size=1 << 24).astype(np.int64))
    mkg = lambda i: (src, jnp.asarray(
        rng.integers(0, 1 << 24, size=1 << 20).astype(np.int32)))
    chain("gather 1M<-16M", gath, mkg)


if __name__ == "__main__":
    main()
