"""Attribute the ingest cost: chunk-sums compute vs finalize vs download.

Sync protocol: scalar readback (block_until_ready returns early on the
tunneled axon platform — same caveat as scripts/bisect_e2e.py). Download
timings bust jax's host-copy cache by adding a fresh epsilon per
iteration (the add itself is ~0.1 ms of device work).
"""
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "scripts"))

from bcd_tpu.cache import configure_compile_cache

configure_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bcd_tpu.ops import accumulator as A  # noqa: E402
from bcd_tpu.params import HistogramParameters  # noqa: E402
from make_test_scene import render_clean, sample_noisy  # noqa: E402

H, W, SPP = 512, 1024, 16
clean = render_clean(H, W)
samples = jnp.asarray(sample_noisy(clean, SPP, 0))
weights = jnp.ones(samples.shape[:3], jnp.float32)
float(samples[0, 0, 0, 0])
p = HistogramParameters()


def timeit(name, fn, iters=3):
    fn(0)  # warm/compile
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        fn(i + 1)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"{name}: {t*1e3:8.1f} ms  (spread {max(ts)/t:.2f}x)", flush=True)
    return t


@jax.jit
def chunk_sums_eps(samples, weights, eps):
    out = A._chunk_sums(samples, weights, p.nb_of_bins,
                        jnp.float32(p.gamma), jnp.float32(p.max_value))
    return tuple(x + eps for x in out)


def run_sums(i):
    out = chunk_sums_eps(samples, weights, jnp.float32(i) * 1e-12)
    float(out[4][0, 0, 0, 0])  # scalar readback sync


timeit("chunk_sums (new bin-loop splat)", run_sums)

sums = A._chunk_sums(samples, weights, p.nb_of_bins,
                     jnp.float32(p.gamma), jnp.float32(p.max_value))
state = A.AccumulatorState(*sums)
fin = A._finalize(state)
float(fin[0][0, 0, 0])


def run_fin(i):
    out = A._finalize(A.AccumulatorState(
        state.nb + jnp.float32(i) * 1e-12, state.w2, state.wc,
        state.cov, state.histo))
    float(out[0][0, 0, 0])


timeit("finalize (on device)", run_fin)


def run_dl(i):
    f = tuple(x + jnp.float32(i) * 1e-9 for x in fin)
    for x in f:
        np.asarray(x)


timeit("download stats (146 MB, cache-busted)", run_dl, iters=2)


def run_init(i):
    s = A.init_state(H, W, p.nb_of_bins)
    float(s.histo[0, 0, 0, 0])


timeit("init_state", run_init)

t = timeit("full run_ingest protocol (construct+add+extract)", lambda i: (
    lambda acc: (acc.add_samples(samples),
                 float(np.asarray(acc.extract_samples_statistics()[0])[0, 0]))
)(A.SamplesAccumulator(H, W, p)))
print(f"=> ingest {H}x{W}@{SPP}spp: {H * W * SPP / 1e6 / t:.1f} MSamples/s",
      flush=True)
