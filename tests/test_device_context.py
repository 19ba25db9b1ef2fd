"""On-device lag expansion (engine.ContextSpec): the fused
stack+moments program must be value-identical to host-side
lag_stack_np + truncation (reference brain_data.py:425-483 windowing),
so the sweep path can ship RAW channels over the link instead of the
(pre+1+post)x stacked matrices."""

import numpy as np
import pytest

from telluride_decoding_tpu.ops.lagstack import lag_stack_np
from telluride_decoding_tpu.sweep.engine import (ContextSpec,
                                                 cca_jackknife_sweep,
                                                 multi_subject_sweep,
                                                 per_file_stats,
                                                 ridge_jackknife_sweep)

LAMBDAS = [1e-3, 1e-1, 1.0]


def _raw_files(rng, ns, dx=4, dy=2, ctx=ContextSpec(2, 3, 1, 2),
               extra_x_rows=7):
    """Raw-layout (x: n+x_post rows, y: n+y_post rows) files plus the
    equivalent host-stacked pairs. x keeps real rows past n (the
    stack-then-truncate case); y zero-pads up (stream ends at n)."""
    xs_raw, ys_raw, xs_host, ys_host = [], [], [], []
    for n in ns:
        x_full = rng.randn(n + extra_x_rows, dx).astype(np.float32)
        x_raw = x_full[:n + ctx.x_post]
        if x_raw.shape[0] < n + ctx.x_post:
            x_raw = np.pad(x_full, ((0, n + ctx.x_post - x_full.shape[0]),
                                    (0, 0)))
        y_raw = np.zeros((n + ctx.y_post, dy), np.float32)
        y_raw[:n] = rng.randn(n, dy).astype(np.float32)
        xs_raw.append(x_raw)
        ys_raw.append(y_raw)
        xs_host.append(lag_stack_np(x_raw, ctx.x_pre, ctx.x_post)[:n])
        ys_host.append(lag_stack_np(y_raw, ctx.y_pre, ctx.y_post)[:n])
    return xs_raw, ys_raw, xs_host, ys_host


class TestContextMoments:

    def test_stats_match_host_stacking_exactly(self, rng):
        ctx = ContextSpec(2, 3, 1, 2)
        xs_raw, ys_raw, xs_host, ys_host = _raw_files(
            rng, [50, 37, 61], ctx=ctx)
        s_dev = per_file_stats(xs_raw, ys_raw, want_syy=True,
                               context=ctx, pad_files_to=5)
        s_host = per_file_stats(xs_host, ys_host, want_syy=True,
                                pad_files_to=5)
        for name, a, b in zip(s_dev._fields, s_dev, s_host):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, err_msg=name)

    def test_x_only_context(self, rng):
        ctx = ContextSpec(0, 10, 0, 0)
        xs_raw, ys_raw, xs_host, ys_host = _raw_files(
            rng, [40, 55], ctx=ctx)
        s_dev = per_file_stats(xs_raw, ys_raw, want_syy=True,
                               context=ctx)
        s_host = per_file_stats(xs_host, ys_host, want_syy=True)
        for name, a, b in zip(s_dev._fields, s_dev, s_host):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, err_msg=name)

    def test_zero_context_is_passthrough(self, rng):
        xs = [rng.randn(30, 3).astype(np.float32)]
        ys = [rng.randn(30, 1).astype(np.float32)]
        a = per_file_stats(xs, ys, want_syy=True,
                           context=ContextSpec(0, 0, 0, 0))
        b = per_file_stats(xs, ys, want_syy=True)
        for name, l1, l2 in zip(a._fields, a, b):
            np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2),
                                          err_msg=name)

    def test_bounded_memory_regime_falls_back_to_host(self, rng):
        ctx = ContextSpec(1, 2, 0, 1)
        xs_raw, ys_raw, xs_host, ys_host = _raw_files(
            rng, [48, 33], ctx=ctx)
        tiny = per_file_stats(xs_raw, ys_raw, want_syy=True,
                              context=ctx, batch_bytes=64)
        big = per_file_stats(xs_host, ys_host, want_syy=True)
        for name, a, b in zip(tiny._fields, tiny, big):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, err_msg=name)

    def test_layout_violation_raises(self, rng):
        ctx = ContextSpec(0, 3, 0, 0)
        x = rng.randn(53, 4).astype(np.float32)   # n = 50
        y = rng.randn(49, 1).astype(np.float32)   # should be 50 rows
        with pytest.raises(ValueError, match='context layout'):
            per_file_stats([x], [y], want_syy=True, context=ctx)


class TestContextSweeps:

    def test_ridge_sweep_parity(self, rng):
        ctx = ContextSpec(2, 3, 0, 0)
        xs_raw, ys_raw, xs_host, ys_host = _raw_files(
            rng, [60, 45, 71], dy=1, ctx=ctx)
        dev = ridge_jackknife_sweep(xs_raw, ys_raw, LAMBDAS, context=ctx)
        host = ridge_jackknife_sweep(xs_host, ys_host, LAMBDAS)
        np.testing.assert_allclose(dev.correlations, host.correlations,
                                   atol=1e-4)

    def test_cca_sweep_parity(self, rng):
        ctx = ContextSpec(1, 2, 2, 1)
        xs_raw, ys_raw, xs_host, ys_host = _raw_files(
            rng, [60, 45, 71], ctx=ctx)
        dev = cca_jackknife_sweep(xs_raw, ys_raw, LAMBDAS, context=ctx)
        host = cca_jackknife_sweep(xs_host, ys_host, LAMBDAS)
        np.testing.assert_allclose(dev.correlations, host.correlations,
                                   atol=1e-4)

    @pytest.mark.parametrize('subject_parallel', [False, True])
    def test_multi_subject_parity(self, rng, subject_parallel):
        from telluride_decoding_tpu.sweep.engine import default_mesh
        ctx = ContextSpec(0, 4, 0, 0)
        cohort_raw, cohort_host = {}, {}
        for i, ns in enumerate([[40, 50, 45], [55, 38], [47, 47, 52]]):
            xs_raw, ys_raw, xs_host, ys_host = _raw_files(
                rng, ns, dy=1, ctx=ctx)
            cohort_raw['s%d' % i] = (xs_raw, ys_raw)
            cohort_host['s%d' % i] = (xs_host, ys_host)
        mesh = default_mesh('subject') if subject_parallel else None
        dev = multi_subject_sweep(cohort_raw, LAMBDAS, mesh=mesh,
                                  subject_parallel=subject_parallel,
                                  context=ctx)
        host = multi_subject_sweep(cohort_host, LAMBDAS, mesh=mesh,
                                   subject_parallel=subject_parallel)
        assert dev.keys() == host.keys()
        for name in dev:
            np.testing.assert_allclose(dev[name].correlations,
                                       host[name].correlations,
                                       atol=1e-4, err_msg=name)


class TestPerFileRawSemantics:

    def test_negative_offset_with_short_in1_matches_add_context(
            self, rng, monkeypatch):
        """_add_context does NOT slice the attended stream for
        negative input_offset; _per_file_raw must mirror that. With
        in1 strictly shorter than in2/out (attended following in1's
        length), slicing attended would shrink the zip-truncated n by
        |offset| and silently drop frames (review finding)."""
        from telluride_decoding_tpu.cli import decoding as dec
        from telluride_decoding_tpu.cli import regression as reg
        from telluride_decoding_tpu.data.brain_data import TestBrainData
        from telluride_decoding_tpu.sweep.engine import per_file_stats

        in1 = rng.randn(90, 3).astype(np.float32)
        in2 = rng.randn(97, 2).astype(np.float32)
        out = rng.randn(97, 1).astype(np.float32)
        att = rng.randn(90, 1).astype(np.float32)
        bd = TestBrainData('in1', 'out', 100.0, pre_context=1,
                           post_context=4, in2_fields='in2',
                           input_offset=-3)
        monkeypatch.setattr(bd, 'file_arrays',
                            lambda filename, cache=True:
                            (in1, in2, out, att))
        my_flags = dec.DecodingOptions().set_from_dict(dict(
            dnn_regressor='linear', input_field='in1',
            output_field='out', pre_context=1, post_context=4,
            input_offset=-3))
        helper = reg.RegressionLinear(my_flags)
        xs, ys, ctx = helper._per_file_raw(bd, ['f1'])
        # Host reference: _add_context's stack-then-truncate.
        h_in1, h_in2, h_out, h_att = bd._add_context(in1, in2, out, att)
        assert xs[0].shape[0] - ctx.x_post == h_in1.shape[0]
        s_dev = per_file_stats(xs, ys, want_syy=True, context=ctx)
        s_host = per_file_stats([h_in1], [h_out], want_syy=True)
        for name, a, b in zip(s_dev._fields, s_dev, s_host):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, err_msg=name)


class TestCliDeviceContext:

    def _write_corpus(self, rng, d, with_in2=False):
        from telluride_decoding_tpu.data import records
        w = rng.randn(3 * 11, 1).astype(np.float32)
        for name in ['t01', 't02', 't03']:
            eeg = rng.randn(300, 3).astype(np.float32)
            stacked = lag_stack_np(eeg, 0, 10)
            intensity = (stacked @ w +
                         0.1 * rng.randn(300, 1).astype(np.float32))
            data = {'eeg': eeg, 'intensity': intensity}
            records.convert_data_to_tfrecords(
                data, str(d / (name + '.tfrecords')))

    @pytest.mark.parametrize('input_offset', [0, 2, -3])
    def test_jackknife_identical_with_and_without(self, rng, tmp_path,
                                                  monkeypatch,
                                                  input_offset):
        """The CLI fast path must produce the SAME jackknife numbers
        whether the lag expansion runs on device (default) or on host
        (TDT_DEVICE_CONTEXT=0) — including nonzero input_offset, whose
        negative sign makes in1 longer than the zip-truncated n (the
        stack-then-truncate subtlety)."""
        from telluride_decoding_tpu.cli import decoding as dec
        from telluride_decoding_tpu.cli import regression as reg
        d = tmp_path / 'records'
        d.mkdir()
        self._write_corpus(rng, d)
        my_flags = dec.DecodingOptions().set_from_dict(dict(
            tfexample_dir=str(d), pre_context=2, post_context=10,
            input_offset=input_offset,
            dnn_regressor='linear', input_field='eeg',
            output_field='intensity',
            test_metric='pearson_correlation_first'))
        out = {}
        for env, label in [('1', 'device'), ('0', 'host')]:
            monkeypatch.setenv('TDT_DEVICE_CONTEXT', env)
            obj = reg.RegressionLinear(my_flags)
            out[label] = obj.jackknife_over_regularizations(
                my_flags, [1e-4, 1e-1],
                summary_base_dir=str(tmp_path / ('s_%s_%d'
                                                 % (label, input_offset))))
        for lamb in out['device']:
            np.testing.assert_allclose(out['device'][lamb],
                                       out['host'][lamb], atol=1e-4)
        mean_low, _ = out['device'][1e-4]
        if input_offset == 0:
            assert mean_low > 0.9   # Planted model recovered.

    def test_cca_cli_parity(self, rng, tmp_path, monkeypatch):
        from telluride_decoding_tpu.cli import decoding as dec
        from telluride_decoding_tpu.cli import regression as reg
        d = tmp_path / 'records'
        d.mkdir()
        self._write_corpus(rng, d)
        my_flags = dec.DecodingOptions().set_from_dict(dict(
            tfexample_dir=str(d), pre_context=1, post_context=6,
            input2_field='intensity', input2_pre_context=2,
            input2_post_context=1,
            dnn_regressor='cca', input_field='eeg',
            output_field='intensity',
            test_metric='cca_pearson_correlation_first'))
        out = {}
        for env, label in [('1', 'device'), ('0', 'host')]:
            monkeypatch.setenv('TDT_DEVICE_CONTEXT', env)
            obj = reg.RegressionCCA(my_flags)
            out[label] = obj.jackknife_over_regularizations(
                my_flags, [1e-2, 1.0],
                summary_base_dir=str(tmp_path / ('c_' + label)))
        for lamb in out['device']:
            np.testing.assert_allclose(out['device'][lamb],
                                       out['host'][lamb], atol=1e-4)
