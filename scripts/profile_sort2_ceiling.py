"""Pin down THE sort2 lane ceiling on this rig, per dtype combination.

Round 3 left three contradictory claims (VERDICT r3 "What's weak" #2):
  - ops/sortcount.py: sort2 2^21 compiles / 2^22 never
  - bench.py GEOMETRY: (int64,int32) sort2 compiles at 2^22, 2^23 never
  - BENCH_NOTES r3: bare 2^23-lane sort2 compiles (~5 min) and runs at 29 ms

This script measures ONE (variant, log2 lanes) combination per invocation so
a hung compile is killable without losing the rest. Run it under `timeout`:

    timeout 580 python scripts/profile_sort2_ceiling.py i64i64 22
    timeout 580 python scripts/profile_sort2_ceiling.py i64i32 22
    timeout 580 python scripts/profile_sort2_ceiling.py i64 23      # 1-operand

Results are appended to scripts/sort2_ceiling_results.txt by the caller; the
reconciled ceiling lives in ops/sortcount.py::SORT2_LANE_CEILING.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "MC_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np
import metacherchant_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


def probe(x) -> int:
    cpu = jax.devices("cpu")[0]
    return int(np.asarray(jax.device_put(
        x.ravel()[123].astype(jnp.int32), cpu)))


def main():
    variant = sys.argv[1]
    lg = int(sys.argv[2])
    n = 1 << lg
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 1 << 62, size=n).astype(np.int64))

    if variant == "i64":
        f = jax.jit(jax.lax.sort)
        args = (keys,)
    elif variant == "i64i32":
        w = jnp.asarray(rng.integers(1, 100, size=n).astype(np.int32))
        f = jax.jit(lambda k, c: jax.lax.sort((k, c), num_keys=1))
        args = (keys, w)
    elif variant == "i64i64":
        w = jnp.asarray(rng.integers(1, 100, size=n).astype(np.int64))
        f = jax.jit(lambda k, c: jax.lax.sort((k, c), num_keys=1))
        args = (keys, w)
    else:
        raise SystemExit(f"unknown variant {variant}")

    t0 = time.perf_counter()
    out = f(*args)
    v = probe(out[0] if isinstance(out, tuple) else out)
    t_cold = time.perf_counter() - t0
    log(f"{variant}@2^{lg} cold+first-run: {t_cold:.1f}s (probe={v})")

    def chain(m):
        t0 = time.perf_counter()
        k = args[0]
        for i in range(m):
            o = f(*((k,) + args[1:]))
            k = o[0] if isinstance(o, tuple) else o
        probe(k)
        return time.perf_counter() - t0

    chain(2)
    ts, tb = chain(6), chain(18)
    per = (tb - ts) / 12
    # marker line on stdout for the orchestrating shell
    print(f"RESULT {variant} lg={lg} cold={t_cold:.1f}s "
          f"warm={per * 1000:.2f}ms rate={n / per / 1e6:.0f}Mlanes/s",
          flush=True)


if __name__ == "__main__":
    log(f"devices: {jax.devices()}")
    main()
