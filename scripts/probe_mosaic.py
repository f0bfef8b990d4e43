"""Minimal Mosaic probes for the fused-kernel load patterns.

Probe A: dynamic sublane-offset load where the offset is constructed as
8*q (provably aligned), followed by a static value sub-slice.
Probe B: same but offset = raw r0 + shift (not provably aligned) —
expected to FAIL with the alignment error (sanity check of the theory).
"""

import functools
import os
import sys

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

ROWS, NPIX, C = 2896, 2208, 729
R0 = 344


def _kernel_aligned(shift_ref, g_ref, out_ref, acc_s):
    o = pl.program_id(0)

    @pl.when(o == 0)
    def _():
        acc_s[:] = jnp.zeros((NPIX, C), jnp.float32)

    dy = shift_ref[o, 0]  # row shift, arbitrary sign
    # aligned dynamic base: 8 * q is provably a multiple of 8
    q = (R0 - 8) // 8 + dy * (48 // 8)
    big = g_ref[pl.ds(8 * q, NPIX + 16), :]  # dynamic ALIGNED sublane load
    for dx in (-3, 0, 5):  # static sub-slices of the loaded value
        sl = big[8 + dx : 8 + dx + NPIX, :]
        acc_s[:] += sl * (1.0 + dx * 0.1)

    @pl.when(o == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_s[:]


def _kernel_unaligned(shift_ref, g_ref, out_ref, acc_s):
    o = pl.program_id(0)

    @pl.when(o == 0)
    def _():
        acc_s[:] = jnp.zeros((NPIX, C), jnp.float32)

    s = shift_ref[o, 0]
    acc_s[:] += g_ref[pl.ds(R0 + s, NPIX), :]

    @pl.when(o == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_s[:]


def run(kernel, shifts):
    f = pl.pallas_call(
        kernel,
        grid=(shifts.shape[0],),
        in_specs=[
            pl.BlockSpec((shifts.shape[0], 1), lambda o: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWS, C), lambda o: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NPIX, C), lambda o: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NPIX, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((NPIX, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    g = jnp.asarray(np.random.default_rng(0).random((ROWS, C)), jnp.float32)
    out = f(jnp.asarray(shifts, jnp.int32).reshape(-1, 1), g)
    return float(np.asarray(out).sum())


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "aligned"
    shifts = np.arange(-6, 7)
    if which == "aligned":
        print("aligned:", run(_kernel_aligned, shifts))
    else:
        print("unaligned:", run(_kernel_unaligned, shifts * 48 + 3))
