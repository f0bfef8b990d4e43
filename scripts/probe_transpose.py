"""Probe: in-kernel transpose strategies for the K1<->K2 marshal kill.

The round-3 redesign moves the inter-kernel lane transposes INTO the
Pallas kernels. Candidates per 128-pixel block:

  A. MXU dot against a constant identity / expansion matrix:
     transpose(X (a, b)) = dot_general(I_b, X, contract dim1 x dim1)
     and the fused tri-expansion
     expand(X (P, dtri)) = dot_general(E (729, dtri), X, dim1 x dim1).
     Exactness requirement: with precision=HIGHEST the bf16x3 passes
     reconstruct v * 1.0 EXACTLY for permutation-style matrices (each
     output is a sum with exactly one nonzero term, and the fp32 value
     splits exactly into three bf16 parts).
  B. Native jnp.swapaxes / lax.transpose lowering (if Mosaic supports it).

Prints timing for 18 blocks (= tile 48) of each and checks bit-exactness.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bcd_tpu.ops.fused_pallas import tri_geometry  # noqa: E402

D = 27
_, TRI_EXPAND, DTRI = tri_geometry(D)
P = 2304  # tile=48 core pixels
LANES = 128

HI = jax.lax.Precision.HIGHEST


def _iota_eye(n):
    """Identity built IN-KERNEL (Mosaic rejects captured array constants)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r == c).astype(jnp.float32)


def _t(x):
    """transpose(X (a, b)) = dot_general(I_b, X, dim1 x dim1) -> (b, a)."""
    return jax.lax.dot_general(
        _iota_eye(x.shape[1]), x, (((1,), (1,)), ((), ())), precision=HI,
        preferred_element_type=jnp.float32)


def _kernel_mxu(expand_ref, m2_ref, out_ref, small_ref):
    # in: (128, dtri) pixel-major; out: (729, 128) = expanded lane-major
    blk = m2_ref[:]
    exp = jax.lax.dot_general(
        expand_ref[:], blk, (((1,), (1,)), ((), ())), precision=HI,
        preferred_element_type=jnp.float32)  # (729, 128)
    out_ref[:] = exp
    # small transpose back: (729, 128) -> (128, 729) via I_128 trick
    small_ref[:] = _t(exp)


def _kernel_swap(expand_ref, m2_ref, out_ref, small_ref):
    # native swapaxes transpose; expand via MXU dot on the transposed
    # value so the comparison isolates the transpose lowering
    blk = m2_ref[:]
    t = jnp.swapaxes(blk, 0, 1)  # (dtri, 128)
    exp = jax.lax.dot_general(
        expand_ref[:], jnp.swapaxes(t, 0, 1),
        (((1,), (1,)), ((), ())), precision=HI,
        preferred_element_type=jnp.float32)
    out_ref[:] = exp
    small_ref[:] = jnp.swapaxes(exp, 0, 1)


def run(kernel_fn, name):
    expand = np.zeros((D * D, DTRI), np.float32)
    expand[np.arange(D * D), TRI_EXPAND] = 1.0
    expand_j = jnp.asarray(expand)

    @jax.jit
    def go(m2_pm):
        return pl.pallas_call(
            kernel_fn,
            grid=(P // LANES,),
            in_specs=[pl.BlockSpec((D * D, DTRI), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((LANES, DTRI), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((D * D, LANES), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((LANES, D * D), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((D * D, P), jnp.float32),
                jax.ShapeDtypeStruct((P, D * D), jnp.float32),
            ],
        )(expand_j, m2_pm)

    rng = np.random.default_rng(0)
    m2_pm = jnp.asarray(rng.standard_normal((P, DTRI)), jnp.float32)
    try:
        out, small = go(m2_pm)
        out = np.asarray(out)
        small = np.asarray(small)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
        return
    want = np.asarray(m2_pm)[:, TRI_EXPAND].T  # (729, P)
    exact = np.array_equal(out, want)
    exact2 = np.array_equal(small, want.T)
    # timing: 30 reps in a scan
    @jax.jit
    def timed(m2_pm):
        def body(c, _):
            o, s = go(m2_pm + c * 0)
            return jnp.sum(o) * 1e-30 + jnp.sum(s) * 1e-30, None
        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=30)
        return s

    float(timed(m2_pm))
    t0 = time.perf_counter()
    float(timed(m2_pm))
    dt = (time.perf_counter() - t0) / 30
    print(f"{name}: exact_fwd={exact} exact_back={exact2} "
          f"{dt*1e6:.0f} us per tile-equivalent")





def _kernel_noop(expand_ref, m2_ref, out_ref, small_ref):
    # same I/O footprint, no transpose work: isolates the pallas_call
    # harness (HBM read/write) cost from the dot cost
    blk = m2_ref[:]
    s = jnp.sum(blk, axis=1, keepdims=True)  # keep input live
    out_ref[:] = jnp.zeros(out_ref.shape, jnp.float32) + s[0, 0]
    small_ref[:] = jnp.zeros(small_ref.shape, jnp.float32)


def _kernel_fwd_only(expand_ref, m2_ref, out_ref, small_ref):
    # expand-dot only; back-transpose replaced by zeros
    blk = m2_ref[:]
    exp = jax.lax.dot_general(
        expand_ref[:], blk, (((1,), (1,)), ((), ())), precision=HI,
        preferred_element_type=jnp.float32)
    out_ref[:] = exp
    small_ref[:] = jnp.zeros(small_ref.shape, jnp.float32)


if __name__ == "__main__":
    run(_kernel_mxu, "A mxu-dot transpose+expand")
    run(_kernel_swap, "B swapaxes+gather")
    run(_kernel_noop, "C noop (pure I/O)")
    run(_kernel_fwd_only, "D fwd dot only")
