"""Time the SamplesAccumulator ingest path (BASELINE.json config 5)
standalone: MSamples/s for a (512, 1024, 16, 3) device-resident chunk.

Usage: python scripts/time_ingest.py [H W SPP]
"""

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "scripts"))

from bcd_tpu.cache import configure_compile_cache

configure_compile_cache()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bcd_tpu.ops.accumulator import SamplesAccumulator  # noqa: E402
from bcd_tpu.params import HistogramParameters  # noqa: E402
from make_test_scene import render_clean, sample_noisy  # noqa: E402

H = int(sys.argv[1]) if len(sys.argv) > 1 else 512
W = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
SPP = int(sys.argv[3]) if len(sys.argv) > 3 else 16

clean = render_clean(H, W)
samples = jnp.asarray(sample_noisy(clean, SPP, 0))
float(samples[0, 0, 0, 0])


def run():
    acc = SamplesAccumulator(H, W, HistogramParameters())
    acc.add_samples(samples)
    nb_img, _, _, _ = acc.extract_samples_statistics()
    float(nb_img[0, 0, 0])  # scalar readback syncs the device computation


run()  # compile + warm
times = []
for _ in range(3):
    t0 = time.perf_counter()
    run()
    times.append(time.perf_counter() - t0)
t = min(times)
print(f"ingest {H}x{W}@{SPP}spp: {H * W * SPP / 1e6 / t:.1f} MSamples/s "
      f"(best of 3: {t * 1e3:.1f} ms, spread "
      f"{max(times) / t:.2f}x)")
