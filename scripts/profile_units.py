"""Per-unit cost probes for the consolidation redesign (split-merge engine).

Measures, on the real chip with the persistent cache:
  1. per-dispatch overhead: trivial elementwise kernel @2^22, chain difference
  2. sort2 (int64, int32) warm cost at 2^20 / 2^21
  3. rle_mark (associative scan) compile + warm at 2^21 / 2^22
  4. bitonic half-clean stages, grouped G per jit, at 2^22: compile + warm

Usage: python scripts/profile_units.py [unit] [log2_lanes] [group]
Units: dispatch | sort2 | rle | halfclean
Each invocation probes ONE unit so a hung compile can be killed without
losing the others (run under `timeout`).
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

from metacherchant_tpu.ops.sortcount import (
    _sort2_kernel, _rle_mark_kernel, fast_scalar)


def log(m):
    print(m, file=sys.stderr, flush=True)


def probe(x) -> int:
    return fast_scalar(x.ravel()[123].astype(jnp.int32))


def diff_chain(f, args_fn, m_small=8, m_big=24):
    """Warm f, then difference-method per-call time."""
    out = f(*args_fn())
    probe(out[0] if isinstance(out, tuple) else out)

    def chain(m):
        a = args_fn()
        t0 = time.perf_counter()
        for _ in range(m):
            r = f(*a)
            a = r if isinstance(r, tuple) and len(r) == len(a) else a
        probe(r[0] if isinstance(r, tuple) else r)
        return time.perf_counter() - t0

    chain(2)
    ts, tb = chain(m_small), chain(m_big)
    return (tb - ts) / (m_big - m_small)


def main():
    unit = sys.argv[1]
    lg = int(sys.argv[2]) if len(sys.argv) > 2 else 22
    n = 1 << lg
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 1 << 62, size=n).astype(np.int64))
    cnts = jnp.asarray(rng.integers(1, 100, size=n).astype(np.int32))

    def fresh():
        # donating kernels consume their inputs: make fresh device arrays
        return (jnp.asarray(np.asarray(keys)), jnp.asarray(np.asarray(cnts)))

    if unit == "dispatch":
        f = jax.jit(lambda k, c: (k + c.astype(jnp.int64), c ^ 1))
        per = diff_chain(f, lambda: (keys, cnts), 16, 48)
        log(f"dispatch+trivial@2^{lg}: {per * 1000:.2f} ms/call")
    elif unit == "sort2":
        t0 = time.perf_counter()
        out = _sort2_kernel(*fresh())
        probe(out[0])
        log(f"sort2@2^{lg} cold: {time.perf_counter() - t0:.1f}s")
        per = diff_chain(_sort2_kernel, fresh, 40, 200)
        log(f"sort2@2^{lg}: {per * 1000:.2f} ms/op "
            f"({n / per / 1e6:.0f} M lanes/s)")
    elif unit == "rle":
        sk_host = np.sort(np.asarray(keys))

        def fresh_rle():
            return (jnp.asarray(sk_host), jnp.asarray(np.asarray(cnts)))

        t0 = time.perf_counter()
        out = _rle_mark_kernel(*fresh_rle())
        probe(out[0])
        log(f"rle_mark@2^{lg} cold: {time.perf_counter() - t0:.1f}s")
        per = diff_chain(_rle_mark_kernel, fresh_rle, 40, 200)
        log(f"rle_mark@2^{lg}: {per * 1000:.2f} ms/op")
    elif unit == "halfclean":
        g = int(sys.argv[3]) if len(sys.argv) > 3 else 4
        from metacherchant_tpu.ops.bitonic import _half_clean

        @jax.jit
        def stage_group(k, c):
            s = k.shape[0] // 2
            for _ in range(g):
                k, (c,) = _half_clean(k, [c], s)
                s = max(s // 2, 1)
            return k, c

        t0 = time.perf_counter()
        out = stage_group(keys, cnts)
        probe(out[0])
        log(f"halfclean x{g}@2^{lg} cold: {time.perf_counter() - t0:.1f}s")
        per = diff_chain(stage_group, lambda: (keys, cnts), 40, 200)
        log(f"halfclean x{g}@2^{lg}: {per * 1000:.2f} ms/group "
            f"({per / g * 1000:.2f} ms/stage)")
    else:
        raise SystemExit(f"unknown unit {unit}")


if __name__ == "__main__":
    log(f"devices: {jax.devices()}")
    main()
# appended probes: cumsum variants (see merge-split consolidation design)
