"""Pallas TPU kernel: rolling canonical k-mer extraction.

The hottest loop of the framework (SURVEY §3.1: ShortKmer.shiftRight +
addAndBound per base) as a hand-written TPU kernel. The XLA path
(ops/kmers.exact_canonical_kmers) lowers to a lax.scan whose per-step state
round-trips through HBM layouts; this kernel keeps the rolling fw/rc
registers resident in VMEM as native (8, 128) tiles (8 sublanes x 128 lanes =
1024 reads per block) and emits the canonical key per position in one pass
over the read length.

64-bit keys are carried as (hi, lo) int32 pairs holding the unsigned bit
patterns: this Mosaic build's int32<->uint32 element-type conversion rule
recurses infinitely, so the kernel works entirely in int32, using
shift_right_logical for unsigned shifts and the sign-flip trick for the one
unsigned comparison. The caller recombines hi/lo into int64 outside the
kernel (one cheap XLA op).

Update rules (itmo:dna/kmers/ShortKmer.java:68-71) in split form, k <= 31:
  fw = ((fw << 2) | c) & mask(2k)
  rc = (rc >> 2) | ((3 - c) << (2k - 2))
Canonical key = min(fw, rc); both values fit 62 bits so unsigned and signed
(Java long) comparisons agree.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kmers import SENTINEL, _valid_window_mask

SUBLANES = 8
LANES = 128
BLOCK_READS = SUBLANES * LANES  # 1024 reads per kernel instance


def _srl(x, n: int):
    return jax.lax.shift_right_logical(x, jnp.int32(n))


def _extract_kernel(codes_ref, hi_ref, lo_ref, fw_hi_s, fw_lo_s, rc_hi_s,
                    rc_lo_s, *, k: int, L: int):
    total_bits = 2 * k
    if total_bits >= 32:
        lo_mask = jnp.int32(-1)                      # all 32 bits
        hi_mask = jnp.int32((1 << (total_bits - 32)) - 1)
    else:
        lo_mask = jnp.int32((1 << total_bits) - 1)
        hi_mask = jnp.int32(0)
    shift_hi = total_bits - 2
    sign = jnp.int32(-2147483648)

    def body(j, _):
        fw_hi, fw_lo = fw_hi_s[:], fw_lo_s[:]
        rc_hi, rc_lo = rc_hi_s[:], rc_lo_s[:]
        c = codes_ref[0, j]                          # (8, 128) int32
        cc = jnp.where(c >= 0, c, 0)
        # fw = ((fw << 2) | c) & mask
        nfw_hi = ((fw_hi << 2) | _srl(fw_lo, 30)) & hi_mask
        nfw_lo = ((fw_lo << 2) | cc) & lo_mask
        # rc = (rc >> 2) | ((3 - c) << shift_hi)
        comp = jnp.int32(3) - cc
        nrc_lo = _srl(rc_lo, 2) | ((rc_hi & jnp.int32(3)) << 30)
        nrc_hi = _srl(rc_hi, 2)
        if shift_hi >= 32:
            nrc_hi = nrc_hi | (comp << (shift_hi - 32))
        else:
            nrc_lo = nrc_lo | (comp << shift_hi)
        # canonical min: unsigned lexicographic on (hi, lo); hi < 2^30 so
        # signed compare is fine there, lo needs the sign-flip trick
        lo_rc_lt = (nrc_lo ^ sign) < (nfw_lo ^ sign)
        take_rc = (nrc_hi < nfw_hi) | ((nrc_hi == nfw_hi) & lo_rc_lt)
        hi_ref[0, j] = jnp.where(take_rc, nrc_hi, nfw_hi)
        lo_ref[0, j] = jnp.where(take_rc, nrc_lo, nfw_lo)
        fw_hi_s[:], fw_lo_s[:] = nfw_hi, nfw_lo
        rc_hi_s[:], rc_lo_s[:] = nrc_hi, nrc_lo
        return 0

    zeros = jnp.zeros((SUBLANES, LANES), jnp.int32)
    fw_hi_s[:] = zeros
    fw_lo_s[:] = zeros
    rc_hi_s[:] = zeros
    rc_lo_s[:] = zeros
    jax.lax.fori_loop(0, L, body, 0)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def exact_canonical_kmers_pallas(codes: jax.Array, k: int,
                                 interpret: bool = False):
    """(B, L) int32 codes -> ((B, L) int64 canonical keys, (B, L) validity).

    Drop-in replacement for ops.kmers.exact_canonical_kmers (k <= 31).
    B must be a multiple of 1024 (the caller's standard batch sizes are).
    """
    B, L = codes.shape
    assert B % BLOCK_READS == 0, "batch must be a multiple of 1024"
    G = B // BLOCK_READS
    # layout (G, L, 8, 128): the position axis is a major dim (dynamically
    # indexed per loop step), the read axes land on the native sublane/lane
    # tiling
    tiled = codes.reshape(G, SUBLANES, LANES, L).transpose(0, 3, 1, 2)
    kern = functools.partial(_extract_kernel, k=k, L=L)
    spec = pl.BlockSpec((1, L, SUBLANES, LANES), lambda i: (i, 0, 0, 0))
    # trace the kernel without x64: the session enables jax_enable_x64 for
    # 64-bit keys, but that widens loop/iota scalars to i64 inside the kernel
    # and this Mosaic build's i64 convert_element_type rule recurses forever
    with jax.enable_x64(False):
        hi, lo = pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct((G, L, SUBLANES, LANES), jnp.int32),
                jax.ShapeDtypeStruct((G, L, SUBLANES, LANES), jnp.int32),
            ),
            grid=(G,),
            in_specs=[spec],
            out_specs=(spec, spec),
            scratch_shapes=[pltpu.VMEM((SUBLANES, LANES), jnp.int32)
                            for _ in range(4)],
            interpret=interpret,
        )(tiled)
    hi = hi.transpose(0, 2, 3, 1).reshape(B, L)
    lo = lo.transpose(0, 2, 3, 1).reshape(B, L)
    keys = (hi.astype(jnp.int64) << 32) | (lo.astype(jnp.int64)
                                           & jnp.int64(0xFFFFFFFF))
    ok = _valid_window_mask(codes, k)
    return jnp.where(ok, keys, SENTINEL), ok
