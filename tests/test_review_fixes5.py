"""Regression tests for round-4 review findings (ADVICE r3 + new)."""

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(11)


class TestPearsonSecond1D:

    def test_1d_input_raises_not_clamps(self, rng):
        """ADVICE r3: a 1-D x expands to [N, 1] inside
        pearson_correlation, and the old ndim >= 2 precondition let the
        [1] index clamp to dimension 0 — silently returning the
        FIRST-dim correlation. The reference errors; so must we."""
        from telluride_decoding_tpu.ops.pearson import (
            pearson_correlation_second)
        with pytest.raises(ValueError, match='2 output dimensions'):
            pearson_correlation_second(rng.randn(50),
                                       rng.randn(50))

    def test_2d_still_works(self, rng):
        from telluride_decoding_tpu.ops.pearson import (
            pearson_correlation, pearson_correlation_second)
        x = rng.randn(80, 3).astype(np.float32)
        y = rng.randn(80, 3).astype(np.float32)
        expected = np.asarray(pearson_correlation(x, y))[1]
        assert float(pearson_correlation_second(x, y)) == expected


class TestServePipelining:
    """VERDICT r3 item 7: the replay serve loop double-buffers —
    chunk k+1 dispatches before chunk k's readback. Decisions must be
    value-identical to the synchronous path, with flush() harvesting
    the in-flight tail."""

    def _build(self, rng, pipeline):
        import os
        import tempfile
        from telluride_decoding_tpu.cli.serve import (
            StreamingAttentionServer)
        from telluride_decoding_tpu.data.brain_data import TestBrainData
        from telluride_decoding_tpu.decode import infer_decoder
        from telluride_decoding_tpu.models.brain_model import (
            BrainModelLinearRegression)
        n = 2000
        a1 = np.abs(rng.randn(n, 1)).astype(np.float32)
        a2 = np.abs(rng.randn(n, 1)).astype(np.float32)
        eeg = (a1 * 2.0 - 1.0 +
               0.05 * rng.randn(n, 1)).astype(np.float32)
        model = BrainModelLinearRegression(
            input_width=1, output_width=1, regularization_lambda=1e-4)
        bd = TestBrainData('input_1', 'output', 100.0)
        bd.preserve_test_data(eeg, a1)
        model.fit(bd.create_dataset('train'))
        model.add_metadata({'pre_context': 1, 'post_context': 1,
                            'input2_pre_context': 0,
                            'input2_post_context': 0,
                            'dnn_regressor': 'linear'})
        tmp = tempfile.mkdtemp()
        # Context model needs the stacked width.
        model3 = BrainModelLinearRegression(
            input_width=3, output_width=1, regularization_lambda=1e-4)
        from telluride_decoding_tpu.ops.lagstack import lag_stack_np
        stacked = lag_stack_np(eeg, 1, 1)
        bd3 = TestBrainData('input_1', 'output', 100.0)
        bd3.preserve_test_data(stacked, a1)
        model3.fit(bd3.create_dataset('train'))
        model3.add_metadata({'pre_context': 1, 'post_context': 1,
                             'input2_pre_context': 0,
                             'input2_post_context': 0,
                             'dnn_regressor': 'linear'})
        model3.save(tmp)
        dec = infer_decoder.create_decoder(tmp, reduction='first')
        dec.load_decoding_model(tmp)
        dec.add_data_correlator(a1, a1)
        dec.save_parameters(os.path.join(tmp, 'decoder_model.json'))
        server = StreamingAttentionServer(
            dec, eeg_channels=1, window_width=50, window_step=50,
            decision='wta', pipeline=pipeline)
        return server, eeg, a1, a2

    def test_pipelined_equals_synchronous(self):
        rng = np.random.RandomState(3)
        results = {}
        for pipeline in (False, True):
            server, eeg, a1, a2 = self._build(
                np.random.RandomState(3), pipeline)
            decisions = []
            for start in range(0, eeg.shape[0], 64):
                sl = slice(start, start + 64)
                decisions += server.push(eeg[sl], a1[sl], a2[sl])
            decisions += server.flush()
            results[pipeline] = decisions
        assert len(results[True]) == len(results[False]) > 10
        for a, b in zip(results[True], results[False]):
            assert a['window'] == b['window']
            assert a['score1'] == b['score1']
            assert a['score2'] == b['score2']
            assert a['attend_speaker1'] == b['attend_speaker1']

    def test_flush_without_pushes_is_empty(self):
        server, eeg, a1, a2 = self._build(np.random.RandomState(3),
                                          True)
        assert server.flush() == []
