"""Probe: banded-correlation-as-MXU-dot inside a Pallas kernel.

K4's accumulate is WA[z] = sum_dx w[z-o]*A2T[z-o] — per image row a
(tp x tp) band matrix times the source row block. This probe checks, on
hardware:
  [1] batched dot_general (Y, tp, tp) @ (Y, tp, C) at HIGHEST inside a
      kernel: supported? correct vs XLA? how fast?
  [2] the same as an unrolled per-row loop of plain dots (fallback)
  [3] exactness: 0/1 band matrix selection-sums vs a VPU where-accumulate

Run: python scripts/probe_banded_dot.py [Y tp C]
"""

import functools
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from bcd_tpu.cache import configure_compile_cache

configure_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Y = int(sys.argv[1]) if len(sys.argv) > 1 else 60
TP = int(sys.argv[2]) if len(sys.argv) > 2 else 64
C = int(sys.argv[3]) if len(sys.argv) > 3 else 768
REPS = 50
HI = jax.lax.Precision.HIGHEST


def _kernel_batched(b_ref, s_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        b_ref[:], s_ref[:], (((2,), (1,)), ((0,), (0,))),
        precision=HI, preferred_element_type=jnp.float32)


def _kernel_loop(b_ref, s_ref, o_ref):
    for y in range(Y):
        o_ref[y] = jax.lax.dot_general(
            b_ref[y], s_ref[y], (((1,), (0,)), ((), ())),
            precision=HI, preferred_element_type=jnp.float32)


def run_case(name, kernel):
    f = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec((Y, TP, TP), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Y, TP, C), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Y, TP, C), lambda: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Y, TP, C), jnp.float32),
    )

    rng = np.random.default_rng(0)
    # 0/1 band matrices, bandwidth 13 around the diagonal
    ri, ci = np.meshgrid(np.arange(TP), np.arange(TP), indexing="ij")
    band = (np.abs(ri - ci) <= 6)
    bm = (rng.random((Y, TP, TP)) < 0.5) & band
    b = jnp.asarray(bm.astype(np.float32))
    s = jnp.asarray(rng.random((Y, TP, C)), jnp.float32)

    try:
        out = jax.jit(f)(b, s)
        ref = jnp.einsum("yik,ykc->yic", b, s, precision=HI)
        err = float(jnp.abs(out - ref).max())
        # exact selection-sum check vs float64
        ref64 = np.einsum("yik,ykc->yic", np.asarray(b, np.float64),
                          np.asarray(s, np.float64))
        err64 = float(np.abs(np.asarray(out, np.float64) - ref64).max())

        @jax.jit
        def timed(b, s):
            def body(carry, _):
                o = f(b + carry * 0, s)
                return jnp.sum(o) * 1e-30, None
            r, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
            return r

        float(timed(b, s))
        t0 = time.perf_counter()
        float(timed(b, s))
        dt = (time.perf_counter() - t0) / REPS
        print(f"[{name}] Y={Y} tp={TP} C={C}: {dt*1e3:.3f} ms/call, "
              f"max-err vs XLA {err:.2e}, vs f64 {err64:.2e}")
    except Exception as e:
        print(f"[{name}] FAILED: {type(e).__name__}: {str(e)[:300]}")


print("backend:", jax.devices()[0].platform)
run_case("batched", _kernel_batched)
run_case("loop", _kernel_loop)
