"""Sweep checkpoint/resume tests."""

import numpy as np
import pytest

from telluride_decoding_tpu.sweep.checkpoint import (
    SweepCheckpoint,
    run_sweep_with_checkpoints,
)


def test_tiles_roundtrip(tmp_path):
    ckpt = SweepCheckpoint(str(tmp_path), [0.1, 1.0], ['a', 'b', 'c'])
    assert not ckpt.has_tile('l0-2')
    tile = np.arange(6, dtype=np.float64).reshape(2, 3)
    ckpt.save_tile('l0-2', tile, slice(0, 2), slice(0, 3))
    assert ckpt.has_tile('l0-2')
    np.testing.assert_array_equal(ckpt.load_tile('l0-2'), tile)
    np.testing.assert_array_equal(ckpt.assemble(), tile)


def test_resume_skips_completed_tiles(tmp_path):
    calls = []

    def sweep_fn(lambdas, file_slice):
        calls.append(tuple(lambdas))
        return np.full((len(lambdas), 3), sum(lambdas))

    lambdas = [0.1, 1.0, 10.0, 100.0]
    files = ['a', 'b', 'c']
    result1 = run_sweep_with_checkpoints(
        sweep_fn, lambdas, files, str(tmp_path), lambda_block=2)
    assert len(calls) == 2                     # Two tiles computed.
    # Resume: nothing recomputed.
    result2 = run_sweep_with_checkpoints(
        sweep_fn, lambdas, files, str(tmp_path), lambda_block=2)
    assert len(calls) == 2
    np.testing.assert_array_equal(result1, result2)
    np.testing.assert_allclose(result1[0], 1.1)
    np.testing.assert_allclose(result1[2], 110.0)


def test_partial_failure_resumes_midway(tmp_path):
    state = {'fail_after': 1, 'calls': 0}

    def flaky(lambdas, file_slice):
        state['calls'] += 1
        if state['calls'] > state['fail_after']:
            raise RuntimeError('preempted')
        return np.ones((len(lambdas), 2))

    with pytest.raises(RuntimeError):
        run_sweep_with_checkpoints(flaky, [1., 2., 3., 4.], ['a', 'b'],
                                   str(tmp_path), lambda_block=2)
    # First tile persisted; a fixed sweep finishes without redoing it.
    state['fail_after'] = 100
    calls_before = state['calls']
    result = run_sweep_with_checkpoints(
        lambda l, s: 2 * np.ones((len(l), 2)),
        [1., 2., 3., 4.], ['a', 'b'], str(tmp_path), lambda_block=2)
    np.testing.assert_array_equal(result[:2], 1.0)   # From checkpoint.
    np.testing.assert_array_equal(result[2:], 2.0)   # Fresh compute.
    # The resumed run must not have re-invoked the ORIGINAL (flaky)
    # sweep at all: tile 1 loads from the checkpoint.
    assert state['calls'] == calls_before


def test_config_change_invalidates(tmp_path):
    def sweep_a(lambdas, file_slice):
        return np.ones((len(lambdas), 2))

    run_sweep_with_checkpoints(sweep_a, [1., 2.], ['a', 'b'],
                               str(tmp_path))
    # Different lambda grid -> different key -> recompute.
    result = run_sweep_with_checkpoints(
        lambda l, s: 3 * np.ones((len(l), 2)), [5., 6.], ['a', 'b'],
        str(tmp_path))
    np.testing.assert_array_equal(result, 3.0)
