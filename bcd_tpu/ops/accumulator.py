"""Vectorized on-device sample statistics (reference SamplesAccumulator).

The reference streams one path sample at a time through ``addSample``
(SamplesAccumulator.cpp:44-107) and its "thread-safe" variant does not
actually lock (SamplesAccumulator.cpp:156-165). Here the accumulation is a
deterministic batched device reduction: a whole (H, W, S, 3) sample tensor —
or a stream of row-block chunks — is binned with one fused jit step. The
two-bin histogram splat, gamma companding, saturation handling, and the
bias-corrected finalize reproduce the reference exactly.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from bcd_tpu.params import HistogramParameters

SATURE_LEVEL_GAMMA = 2.0  # reference SamplesAccumulator.cpp:52


@jax.tree_util.register_pytree_node_class
@dataclass
class AccumulatorState:
    """Running sums; image-shaped leaves so chunks can be added in any order.

    nb:    (H, W)      sum of weights           (nbOfSamplesImage)
    w2:    (H, W)      sum of squared weights   (squaredWeightSumsImage)
    wc:    (H, W, 3)   weighted color sum       (meanImage before finalize)
    cov:   (H, W, 6)   weighted second moments  (covarImage before finalize)
    histo: (H, W, 3, nbins) histogram weights   (histoImage)
    """

    nb: jnp.ndarray
    w2: jnp.ndarray
    wc: jnp.ndarray
    cov: jnp.ndarray
    histo: jnp.ndarray

    def tree_flatten(self):
        return (self.nb, self.w2, self.wc, self.cov, self.histo), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


def init_state(height: int, width: int, nb_of_bins: int = 20) -> AccumulatorState:
    f = jnp.zeros
    return AccumulatorState(
        nb=f((height, width), jnp.float32),
        w2=f((height, width), jnp.float32),
        wc=f((height, width, 3), jnp.float32),
        cov=f((height, width, 6), jnp.float32),
        histo=f((height, width, 3, nb_of_bins), jnp.float32),
    )


@partial(jax.jit, static_argnames=("nb_of_bins",))
def _chunk_sums(samples, weights, nb_of_bins, gamma, max_value):
    """Reduce a (H, W, S, 3) chunk to image-shaped partial sums."""
    samples = samples.astype(jnp.float32)
    w = weights.astype(jnp.float32)

    nb = jnp.sum(w, axis=2)
    w2 = jnp.sum(w * w, axis=2)
    wc = jnp.sum(w[..., None] * samples, axis=2)

    r, g, b = samples[..., 0], samples[..., 1], samples[..., 2]
    cov = jnp.stack(
        [
            jnp.sum(w * r * r, 2), jnp.sum(w * g * g, 2), jnp.sum(w * b * b, 2),
            jnp.sum(w * g * b, 2), jnp.sum(w * r * b, 2), jnp.sum(w * r * g, 2),
        ],
        axis=-1,
    )

    # two-bin histogram splat (reference SamplesAccumulator.cpp:77-105)
    v = jnp.maximum(samples, 0.0)
    v = jnp.where(gamma > 1.0, v ** (1.0 / gamma), v)
    v = jnp.where(max_value > 0.0, v / max_value, v)
    v = jnp.minimum(v, SATURE_LEVEL_GAMMA)
    bin_float = v * (nb_of_bins - 2)
    floor_bin = jnp.floor(bin_float).astype(jnp.int32)
    in_bounds = floor_bin < nb_of_bins - 2
    floor_bin = jnp.where(in_bounds, floor_bin, nb_of_bins - 2)
    ceil_w = jnp.where(
        in_bounds, bin_float - floor_bin, (v - 1.0) / (SATURE_LEVEL_GAMMA - 1.0)
    )
    floor_w = 1.0 - ceil_w

    # Histogram splat as nbins independent masked reductions over the
    # sample axis: histo[..., b] = sum_s (w*floor_w)[fb == b]
    #                            + sum_s (w*ceil_w)[fb == b-1].
    # Each output column is ONE fused select+reduce pass over the
    # (H, W, S, 3) chunk — no (H, W, S, 3, nbins) one-hot tensor (the
    # round-3 design, 2 GB live) and no sequential lax.scan over samples
    # (the first round-5 fix, which serialized 2*S full-image passes over
    # the (H, W, 3, nbins) carry). nbins is a small static constant (20),
    # so the unrolled loop stays one compiled XLA fusion group.
    wf = w[..., None] * floor_w  # (H, W, S, 3)
    wcl = w[..., None] * ceil_w
    zero = jnp.zeros((), jnp.float32)
    cols = []
    for b in range(nb_of_bins):
        contrib = jnp.where(floor_bin == b, wf, zero)
        if b >= 1:
            # ceil weight lands one bin above its floor bin
            contrib = contrib + jnp.where(floor_bin == b - 1, wcl, zero)
        cols.append(jnp.sum(contrib, axis=2))  # (H, W, 3)
    histo = jnp.stack(cols, axis=-1)  # (H, W, 3, nbins)
    return nb, w2, wc, cov, histo


@jax.jit
def _add_state(state: AccumulatorState, sums) -> AccumulatorState:
    nb, w2, wc, cov, histo = sums
    return AccumulatorState(
        nb=state.nb + nb,
        w2=state.w2 + w2,
        wc=state.wc + wc,
        cov=state.cov + cov,
        histo=state.histo + histo,
    )


@jax.jit
def _finalize(state: AccumulatorState):
    """Normalize and bias-correct (computeSampleStatistics,
    reference SamplesAccumulator.cpp:110-141)."""
    inv = 1.0 / state.nb
    mean = state.wc * inv[..., None]
    cov = state.cov * inv[..., None]
    m0, m1, m2 = mean[..., 0], mean[..., 1], mean[..., 2]
    cov = cov - jnp.stack(
        [m0 * m0, m1 * m1, m2 * m2, m1 * m2, m0 * m2, m0 * m1], axis=-1
    )
    bias = 1.0 / (1.0 - state.w2 / (state.nb * state.nb))
    cov = cov * bias[..., None]
    h, w = state.histo.shape[:2]
    histo = state.histo.reshape(h, w, -1)  # (H, W, 3*nbins), channel-major
    return state.nb[..., None], mean, cov, histo


class SamplesAccumulator:
    """Streaming renderer-facing accumulator (reference SamplesAccumulator.h).

    Usage::

        acc = SamplesAccumulator(height, width, HistogramParameters())
        acc.add_samples(samples_chunk, row0=0)   # (rows, W, S, 3[;4]) chunks
        nb, mean, cov, histo = acc.extract_samples_statistics()

    ``add_samples`` replaces per-sample ``addSample`` calls; a chunk may
    cover any row range and chunks may repeat rows (sums commute). Unlike
    the reference's stub ``SamplesAccumulatorThreadSafe``, device-side
    summation is deterministic with no locking.
    """

    def __init__(self, height: int, width: int,
                 histogram_params: Optional[HistogramParameters] = None):
        self.height = height
        self.width = width
        self.params = histogram_params or HistogramParameters()
        self._state = init_state(height, width, self.params.nb_of_bins)
        self._valid = True

    def add_samples(self, samples, row0: int = 0, weights=None) -> None:
        """Accumulate a chunk of samples shaped (rows, W, S, C>=3); a 4th
        (alpha) channel is ignored like the reference raw converter
        (raw_converter/main.cpp:159-169)."""
        assert self._valid, "accumulator was extracted (move semantics)"
        # slice on whatever side the data already lives on: np.asarray of a
        # device array would download + re-upload the whole chunk (100 MB
        # per 512x1024x16 chunk through a slow host link)
        samples = jnp.asarray(samples)[..., :3]
        rows = samples.shape[0]
        if weights is None:
            weights = jnp.ones(samples.shape[:3], jnp.float32)
        else:
            weights = jnp.asarray(weights)
        sums = _chunk_sums(
            samples, weights, self.params.nb_of_bins,
            jnp.float32(self.params.gamma), jnp.float32(self.params.max_value),
        )
        if rows == self.height and row0 == 0:
            self._state = _add_state(self._state, sums)
        else:
            padded = tuple(
                jnp.zeros((self.height,) + s.shape[1:], s.dtype)
                .at[row0 : row0 + rows].set(s)
                for s in sums
            )
            self._state = _add_state(self._state, padded)

    def get_samples_statistics(self):
        """Copy semantics (reference getSamplesStatistics).

        Returns DEVICE arrays: the production consumer (the denoiser) runs
        on the same device, so forcing a host copy here would serialize a
        ~146 MB download (for 512x1024, 20 bins) into every ingest. The
        reference returns host memory only because its accelerator IS the
        host (SamplesAccumulator.cpp:144-154). Callers that need host
        copies (file writers) call ``np.asarray`` at the IO edge; jax
        arrays duck-type as numpy everywhere else.
        """
        return _finalize(self._state)

    def extract_samples_statistics(self):
        """Move semantics: invalidates the accumulator (reference
        extractSamplesStatistics, SamplesAccumulator.cpp:150-154)."""
        stats = self.get_samples_statistics()
        self._state = None
        self._valid = False
        return stats


def accumulate_samples(samples, histogram_params: Optional[HistogramParameters] = None,
                       weights=None):
    """One-shot accumulation of a full (H, W, S, C) tensor. Returns
    (nb_of_samples (H,W,1), mean (H,W,3), cov (H,W,6), histo (H,W,3*bins))."""
    params = histogram_params or HistogramParameters()
    samples = jnp.asarray(samples)[..., :3]
    if weights is None:
        weights = jnp.ones(samples.shape[:3], jnp.float32)
    sums = _chunk_sums(
        samples, jnp.asarray(weights), params.nb_of_bins,
        jnp.float32(params.gamma), jnp.float32(params.max_value),
    )
    state = AccumulatorState(*sums)
    return _finalize(state)  # device arrays; np.asarray at the IO edge
