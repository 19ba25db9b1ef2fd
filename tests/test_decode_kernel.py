"""Fused CCA-decode kernel vs its XLA reference and the bench decode.

Kernel runs in interpreter mode on CPU; the compiled path is measured
on real TPU hardware by bench.py.
"""

import numpy as np
import pytest

from telluride_decoding_tpu.ops.decode_kernel import (
    fused_cca_decode,
    fused_cca_decode_reference,
)

import jax.numpy as jnp


def _params(rng, f1=256, f2=31, d=10):
    return {
        'mean1': jnp.asarray(rng.randn(1, f1), jnp.float32),
        'mean2': jnp.asarray(rng.randn(1, f2), jnp.float32),
        'rot1': jnp.asarray(rng.randn(f1, d) * 0.02, jnp.float32),
        'rot2': jnp.asarray(rng.randn(f2, d) * 0.2, jnp.float32),
        'corr_mean_x': jnp.asarray(rng.randn(d) * 0.1, jnp.float32),
        'corr_mean_y': jnp.asarray(rng.randn(d) * 0.1, jnp.float32),
        'corr_power': jnp.asarray(1.0 + rng.rand(d), jnp.float32),
        'lda_w': jnp.asarray(rng.randn(d, 2), jnp.float32),
        'lda_slope': jnp.float32(1.3),
        'lda_intercept': jnp.float32(-0.25),
    }


class TestReferenceSemantics:

    def test_matches_bench_decode(self, rng):
        """The folded-params reference equals the unfolded bench math."""
        import os
        import sys
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from bench import _decode_windows
        params = _params(rng)
        x1 = jnp.asarray(rng.randn(4, 50, 256), jnp.float32)
        x2 = jnp.asarray(rng.randn(4, 50, 31), jnp.float32)
        want = np.asarray(_decode_windows(params, x1, x2))
        got = np.asarray(fused_cca_decode_reference(params, x1, x2))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestPallasKernel:

    @pytest.mark.parametrize('w,t,f1,block', [(8, 50, 256, 8),
                                              (16, 100, 384, 4),
                                              (16, 25, 128, 8)])
    def test_matches_reference(self, rng, w, t, f1, block):
        params = _params(rng, f1=f1)
        x1 = jnp.asarray(rng.randn(w, t, f1), jnp.float32)
        x2 = jnp.asarray(rng.randn(w, t, 31), jnp.float32)
        want = np.asarray(fused_cca_decode_reference(params, x1, x2))
        got = np.asarray(fused_cca_decode(params, x1, x2,
                                          window_block=block,
                                          interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_bfloat16_windows(self, rng):
        params = _params(rng)
        x1 = jnp.asarray(rng.randn(8, 50, 256),
                         jnp.float32).astype(jnp.bfloat16)
        x2 = jnp.asarray(rng.randn(8, 50, 31),
                         jnp.float32).astype(jnp.bfloat16)
        want = np.asarray(fused_cca_decode_reference(params, x1, x2))
        got = np.asarray(fused_cca_decode(params, x1, x2,
                                          interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

    def test_bad_block_raises(self, rng):
        params = _params(rng)
        x1 = jnp.zeros((6, 10, 256), jnp.float32)
        x2 = jnp.zeros((6, 10, 31), jnp.float32)
        with pytest.raises(ValueError):
            fused_cca_decode(params, x1, x2, window_block=4,
                             interpret=True)
