"""Pins the round-5 deep-review fixes over the core compute packages.

Covers: refit invalidation of the decoder's cached jitted pipelines
(stale-weights bug), test_by_window termination at window_size=1 (the
reference's own ``window_size//2 == 0`` step loops forever there),
per_file_stats x/y frame-count validation, the moments-path rejection
of the Ledoit-Wolf -1 sentinel it cannot honor, fit_two_classes'
ValueError on mixed dims (was IndexError), and export_decoder's
refusal to bake untrained correlation statistics into a permanent
artifact.
"""
import numpy as np
import pytest

from telluride_decoding_tpu.decode import infer_decoder
from telluride_decoding_tpu.sweep import engine


@pytest.fixture()
def rng():
    return np.random.RandomState(0)


def _fit_linear(rng, scale=1.0, offset=0.0, dx=6):
    from telluride_decoding_tpu.data import brain_data
    from telluride_decoding_tpu.models import BrainModelLinearRegression
    x = rng.randn(600, dx).astype(np.float32)
    w = rng.randn(dx, 1).astype(np.float32)
    y = (x @ (scale * w) + offset).astype(np.float32)
    bd = brain_data.TestBrainData('input', 'output', 100.0,
                                  final_batch_size=200,
                                  shuffle_buffer_size=0)
    bd.preserve_test_data(x, y)
    return bd, x, y


class TestRefitInvalidation:

    def _model_and_decoder(self, rng):
        from telluride_decoding_tpu.models import (
            BrainModelLinearRegression)
        bd, x, y = _fit_linear(rng, scale=1.0)
        model = BrainModelLinearRegression(bd.create_dataset('train'),
                                           regularization_lambda=1e-4)
        model.fit(bd.create_dataset('train'))
        dec = infer_decoder.LinearRegressionDecoder(model,
                                                    reduction='first')
        return model, dec, x, y

    def test_refit_reaches_cached_shapes(self, rng):
        # Refitting the underlying model must invalidate the cached
        # jitted pipelines: previously a compiled window shape kept
        # the OLD params (trace-time constants) while a new shape
        # retraced onto the new ones.
        model, dec, x, y = self._model_and_decoder(rng)
        win = {'input_1': x[:50], 'input_2': y[:50]}
        before = dec.infer_one(win, y[:50])
        bd2, _, _ = _fit_linear(rng, scale=-3.0, offset=7.0)
        model.fit(bd2.create_dataset('train'))
        after = dec.infer_one(win, y[:50])  # SAME window shape
        assert not np.allclose(before, after), (
            'cached pipeline served stale weights after refit')

    def test_two_shapes_agree_after_refit(self, rng):
        # The stale-weights symptom: after a refit, an already-cached
        # shape and a fresh shape scored with DIFFERENT weights. With
        # invalidation both shapes must reflect the refit model
        # consistently (prefix scores equal).
        model, dec, x, y = self._model_and_decoder(rng)
        dec.infer_one({'input_1': x[:60], 'input_2': y[:60]}, y[:60])
        bd2, _, _ = _fit_linear(rng, scale=2.5, offset=-1.0)
        model.fit(bd2.create_dataset('train'))
        s_cached = dec.infer_one(
            {'input_1': x[:60], 'input_2': y[:60]}, y[:60])
        s_fresh = dec.infer_one(
            {'input_1': x[:30], 'input_2': y[:30]}, y[:30])
        np.testing.assert_allclose(np.asarray(s_cached)[:30],
                                   np.asarray(s_fresh), rtol=1e-4)


class TestWindowSizeOne:

    def test_test_by_window_terminates(self, rng):
        from telluride_decoding_tpu.data.brain_data import TestBrainData
        bd = TestBrainData('input_1', 'output', 100.0,
                           final_batch_size=32)
        bd.preserve_test_data(rng.randn(100, 2).astype(np.float32),
                              rng.randn(100, 1).astype(np.float32))
        ds = bd.create_dataset('program_test')
        dec = infer_decoder.LinearRegressionDecoder(
            lambda d: d['input_1'][:, :1], reduction='first')
        windows = list(dec.test_by_window(ds, 1))
        assert 0 < len(windows) <= 100
        # And it agrees with the batched twin at the same argument.
        ws, wl = dec.test_by_window_means(ds, 1)
        assert len(windows) == len(ws)


class TestPerFileStatsValidation:

    def test_xy_frame_mismatch_raises(self, rng):
        xs = [rng.randn(100, 4).astype(np.float32),
              rng.randn(80, 4).astype(np.float32)]
        ys = [rng.randn(80, 1).astype(np.float32),
              rng.randn(100, 1).astype(np.float32)]
        with pytest.raises(ValueError, match='file 0 has 100 x frames'):
            engine.per_file_stats(xs, ys, want_syy=True)

    def test_streaming_regime_also_validates(self, rng):
        xs = [rng.randn(50, 4).astype(np.float32)]
        ys = [rng.randn(40, 1).astype(np.float32)]
        with pytest.raises(ValueError, match='must align'):
            engine.per_file_stats(xs, ys, want_syy=False,
                                  batch_bytes=1)  # force streaming

    def test_aligned_files_still_work(self, rng):
        xs = [rng.randn(60, 4).astype(np.float32),
              rng.randn(50, 4).astype(np.float32)]
        ys = [rng.randn(60, 1).astype(np.float32),
              rng.randn(50, 1).astype(np.float32)]
        st = engine.per_file_stats(xs, ys, want_syy=True)
        assert int(np.asarray(st.count).sum()) == 110


class TestShrinkageSentinel:

    def test_minus_one_rejected_in_moments_sweep(self, rng):
        xs = [rng.randn(60, 4).astype(np.float32) for _ in range(3)]
        ys = [x[:, :1] * 0.5 for x in xs]
        with pytest.raises(ValueError, match='auto-shrinkage sentinel'):
            engine.ridge_jackknife_sweep(xs, ys, [-1.0, 0.1],
                                         use_ridge=False)

    def test_valid_shrinkage_sweep_unaffected(self, rng):
        xs = [rng.randn(60, 4).astype(np.float32) for _ in range(3)]
        ys = [x[:, :1] * 0.5 for x in xs]
        res = engine.ridge_jackknife_sweep(xs, ys, [0.0, 0.3],
                                           use_ridge=False)
        assert res.correlations.shape == (2, 3)

    def test_ridge_sweep_still_accepts_negatives_never(self, rng):
        # The RIDGE family (use_ridge=True) never used -1 as a
        # sentinel; it remains a plain (if odd) lambda value there and
        # must not be rejected.
        xs = [rng.randn(60, 4).astype(np.float32) for _ in range(3)]
        ys = [x[:, :1] * 0.5 for x in xs]
        res = engine.ridge_jackknife_sweep(xs, ys, [1e-3, 1.0],
                                           use_ridge=True)
        assert np.isfinite(res.correlations).all()


class TestLdaMixedDims:

    def test_mixed_dims_value_error(self, rng):
        from telluride_decoding_tpu.solvers import lda
        with pytest.raises(ValueError, match='same number of'):
            lda.ScaledLinearDiscriminantAnalysis().fit_two_classes(
                rng.randn(10), rng.randn(8, 1))

    def test_width_mismatch_value_error(self, rng):
        from telluride_decoding_tpu.solvers import lda
        with pytest.raises(ValueError, match='same number of'):
            lda.ScaledLinearDiscriminantAnalysis().fit_two_classes(
                rng.randn(10, 2), rng.randn(8, 3))

    def test_both_one_dim_ok(self, rng):
        from telluride_decoding_tpu.solvers import lda
        sl = lda.ScaledLinearDiscriminantAnalysis()
        sl.fit_two_classes(rng.randn(200) - 5, rng.randn(200) + 5)
        assert abs(np.mean(sl.transform(rng.randn(200) + 5)) - 1) < 0.2


class TestAotUntrainedStats:

    def test_export_refuses_untrained_statistics(self, rng, tmp_path):
        from telluride_decoding_tpu.data import brain_data
        from telluride_decoding_tpu.decode import aot
        from telluride_decoding_tpu.models import (
            BrainModelLinearRegression)
        bd, x, y = _fit_linear(rng)
        model = BrainModelLinearRegression(bd.create_dataset('train'),
                                           regularization_lambda=1e-4)
        model.fit(bd.create_dataset('train'))
        dec = infer_decoder.LinearRegressionDecoder(
            model, reduction='mean-squared')  # never trained/restored
        with pytest.raises(ValueError, match='count == 0'):
            aot.export_decoder(dec, str(tmp_path / 'artifact'),
                               platforms='cpu', input_widths=(6, 1),
                               output_width=1)
