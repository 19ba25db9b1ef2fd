"""Exactness tests for lag-window context stacking, using the linearly
increasing integer pattern from the reference data-pipeline tests
(test/brain_data_test.py:96-176): every element of every window is
checkable by value."""

import numpy as np
import pytest

from telluride_decoding_tpu.ops import (
    lag_stack,
    lag_stack_reference,
    stacked_width,
)


def _integer_signal(n=20, c=3):
    # x[t, ch] = 10*t + ch so both time and channel are readable by value.
    t = np.arange(n)[:, None] * 10.0
    ch = np.arange(c)[None, :]
    return (t + ch).astype(np.float32)


def _numpy_golden(x, pre, post):
    n, c = x.shape
    padded = np.concatenate(
        [np.zeros((pre, c), x.dtype), x, np.zeros((post, c), x.dtype)],
        axis=0)
    out = np.zeros((n, (pre + 1 + post) * c), x.dtype)
    for i in range(n):
        out[i] = padded[i:i + pre + 1 + post].reshape(-1)
    return out


@pytest.mark.parametrize("pre,post", [(0, 0), (2, 0), (0, 3), (2, 3),
                                      (5, 5), (7, 1)])
def test_lag_stack_matches_golden(pre, post):
    x = _integer_signal()
    got = np.asarray(lag_stack_reference(x, pre, post))
    want = _numpy_golden(x, pre, post)
    np.testing.assert_array_equal(got, want)
    assert got.shape[1] == stacked_width(x.shape[1], pre, post)


def test_lag_stack_current_frame_position():
    """The current frame must sit at block index `pre`."""
    x = _integer_signal()
    pre, post = 3, 2
    out = np.asarray(lag_stack_reference(x, pre, post))
    c = x.shape[1]
    np.testing.assert_array_equal(out[:, pre * c:(pre + 1) * c], x)


def test_lag_stack_zero_edges():
    x = _integer_signal(n=10, c=2) + 1  # ensure nonzero everywhere
    pre, post = 4, 4
    out = np.asarray(lag_stack_reference(x, pre, post))
    c = x.shape[1]
    # First row: all pre-context blocks must be zero.
    np.testing.assert_array_equal(out[0, :pre * c], np.zeros(pre * c))
    # Last row: all post-context blocks must be zero.
    np.testing.assert_array_equal(out[-1, -(post * c):],
                                  np.zeros(post * c))


@pytest.mark.parametrize("pre,post", [(2, 3), (0, 5), (37, 0)])
def test_pallas_lag_stack_matches_reference(pre, post):
    """The Pallas kernel must agree bit-for-bit with the XLA reference.

    Runs in interpret mode on CPU (compiled on real TPU).
    """
    import jax
    from jax.experimental.pallas import tpu as pltpu
    x = np.random.RandomState(0).randn(700, 4).astype(np.float32)
    want = np.asarray(lag_stack_reference(x, pre, post))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(lag_stack(x, pre, post, use_pallas=True))
    np.testing.assert_array_equal(got, want)
