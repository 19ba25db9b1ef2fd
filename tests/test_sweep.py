"""Sweep-engine tests: algebraic jackknife equals explicit retraining,
and the sharded multi-device path equals single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from telluride_decoding_tpu.ops.covariance import moments_from_arrays
from telluride_decoding_tpu.ops.pearson import pearson_correlation_first
from telluride_decoding_tpu.solvers.ridge import solve_ridge_from_moments
from telluride_decoding_tpu.sweep import (cca_jackknife_sweep,
                                          default_mesh,
                                          ridge_jackknife_sweep)


def _files(rng, num_files=4, n=500, dx=6, noise=0.3):
    w = rng.randn(dx, 1).astype(np.float32)
    xs, ys = [], []
    for i in range(num_files):
        x = rng.randn(n + i * 7, dx).astype(np.float32)  # Varying lengths.
        y = x @ w + noise * rng.randn(x.shape[0], 1).astype(np.float32)
        xs.append(x)
        ys.append(y)
    return xs, ys


class TestRidgeSweep:

    def test_matches_explicit_leave_one_out(self, rng):
        xs, ys = _files(rng)
        lambdas = [1e-3, 1e-1, 10.0]
        result = ridge_jackknife_sweep(xs, ys, lambdas)
        assert result.correlations.shape == (3, 4)
        # Explicit check: retrain without file f, evaluate on f.
        for li, lamb in enumerate(lambdas):
            for f in range(4):
                train_x = np.concatenate([x for i, x in enumerate(xs)
                                          if i != f])
                train_y = np.concatenate([y for i, y in enumerate(ys)
                                          if i != f])
                stats = moments_from_arrays(jnp.asarray(train_x),
                                            jnp.asarray(train_y))
                sol = solve_ridge_from_moments(stats, lamb)
                pred = xs[f] @ np.asarray(sol.w) + np.asarray(sol.b)
                want = float(pearson_correlation_first(ys[f], pred))
                assert result.correlations[li, f] == pytest.approx(
                    want, abs=2e-3)

    def test_correlations_high_for_planted_model(self, rng):
        xs, ys = _files(rng, noise=0.05)
        result = ridge_jackknife_sweep(xs, ys, [1e-4])
        assert np.all(result.correlations > 0.97)

    def test_eig_reuse_path_matches_direct_solves(self, rng):
        """Grids >= 24 lambdas take the eigendecomposition-reuse path
        (the crossover measured on v5e); it must agree with the
        direct-solve path exactly."""
        xs, ys = _files(rng)
        lambdas = list(np.logspace(-6, 2, 25))
        eig = ridge_jackknife_sweep(xs, ys, lambdas)            # >= 24.
        direct = np.stack([
            ridge_jackknife_sweep(xs, ys, [l]).correlations[0]
            for l in lambdas])
        np.testing.assert_allclose(eig.correlations, direct, atol=2e-3)

    def test_sharded_matches_single_device(self, rng):
        xs, ys = _files(rng, num_files=8, n=200)
        lambdas = [1e-3, 1.0]
        single = ridge_jackknife_sweep(xs, ys, lambdas, mesh=None)
        mesh = default_mesh()
        assert mesh is not None, 'conftest provides 8 virtual devices'
        sharded = ridge_jackknife_sweep(xs, ys, lambdas, mesh=mesh)
        np.testing.assert_allclose(sharded.correlations,
                                   single.correlations, atol=1e-4)


class TestMomentsOnlyEval:
    """The held-out Pearson r computed from MomentStats alone must
    equal the dense raw-frames evaluation (VERDICT r3 item 3)."""

    def test_linear_r_from_stats_matches_dense(self, rng):
        import jax.numpy as jnp
        from telluride_decoding_tpu.ops.covariance import (
            moments_from_arrays)
        from telluride_decoding_tpu.sweep.engine import (
            _linear_r_from_stats, _masked_pearson_first)
        xs, ys = _files(rng, num_files=1)
        x, y = xs[0], ys[0]
        w = rng.randn(x.shape[1], 1).astype(np.float32)
        b = rng.randn(1).astype(np.float32)
        stats = moments_from_arrays(jnp.asarray(x), jnp.asarray(y),
                                    want_syy=True)
        r_stats = float(_linear_r_from_stats(stats, jnp.asarray(w),
                                             jnp.asarray(b)))
        pred = x @ w + b
        mask = jnp.ones((x.shape[0],), jnp.float32)
        r_dense = float(_masked_pearson_first(jnp.asarray(y),
                                              jnp.asarray(pred), mask))
        np.testing.assert_allclose(r_stats, r_dense, rtol=1e-5)

    def test_cca_r_from_stats_matches_dense(self, rng):
        import jax.numpy as jnp
        from telluride_decoding_tpu.ops.covariance import (
            moments_from_arrays)
        from telluride_decoding_tpu.sweep.engine import (
            _cca_r_from_stats, _masked_pearson_first)
        n = 400
        x = rng.randn(n, 6).astype(np.float32)
        y = rng.randn(n, 3).astype(np.float32)
        u = rng.randn(6).astype(np.float32)
        v = rng.randn(3).astype(np.float32)
        mean_x = rng.randn(6).astype(np.float32)   # Arbitrary centering
        mean_y = rng.randn(3).astype(np.float32)   # must drop out.
        stats = moments_from_arrays(jnp.asarray(x), jnp.asarray(y),
                                    want_syy=True)
        r_stats = float(_cca_r_from_stats(stats, jnp.asarray(u),
                                          jnp.asarray(v)))
        r1 = (x - mean_x) @ u[:, None]
        r2 = (y - mean_y) @ v[:, None]
        mask = jnp.ones((n,), jnp.float32)
        r_dense = float(_masked_pearson_first(
            jnp.asarray(r1), jnp.asarray(r2), mask))
        np.testing.assert_allclose(r_stats, r_dense, rtol=1e-5)

    def test_streaming_moments_equal_batched(self, rng):
        """per_file_stats' bounded-memory per-file regime
        (batch_bytes=0) must match the single-dispatch batched regime
        exactly, dummy padding included."""
        import jax
        from telluride_decoding_tpu.sweep.engine import per_file_stats
        xs, ys = _files(rng)
        batched = per_file_stats(xs, ys, want_syy=True, pad_files_to=6)
        streamed = per_file_stats(xs, ys, want_syy=True,
                                  pad_files_to=6, batch_bytes=0)
        for a, b in zip(jax.tree.leaves(batched),
                        jax.tree.leaves(streamed)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-4)

    def test_sweep_has_no_frame_axis(self, rng):
        """The compiled ridge program's inputs are O(F D^2) stats —
        raw [F, N, D] frames never enter it."""
        from telluride_decoding_tpu.sweep.engine import (
            ridge_jackknife_sweep)
        xs, ys = _files(rng)
        res = ridge_jackknife_sweep(xs, ys, [1e-3, 1.0])
        assert res.correlations.shape == (2, len(xs))
        assert np.isfinite(res.correlations).all()


class TestCcaSweep:

    def test_finds_shared_structure(self, rng):
        latent_w = rng.randn(2, 2).astype(np.float32)
        xs, ys = [], []
        for i in range(3):
            n = 600 + 11 * i
            latent = rng.randn(n, 2).astype(np.float32)
            x = np.concatenate([latent + 0.2 * rng.randn(n, 2),
                                rng.randn(n, 3)], axis=1).astype(np.float32)
            y = np.concatenate([latent @ latent_w +
                                0.2 * rng.randn(n, 2),
                                rng.randn(n, 1)], axis=1).astype(np.float32)
            xs.append(x)
            ys.append(y)
        result = cca_jackknife_sweep(xs, ys, [1e-2, 1.0], dims=2)
        assert result.correlations.shape == (2, 3)
        assert np.all(result.correlations[0] > 0.8)

    def test_ridge_chol_matches_direct_lu_solves(self, rng):
        """The hoisted-Cholesky grid must equal per-(lambda, file) LU
        solves through solve_ridge_from_moments."""
        import jax
        import jax.numpy as jnp
        from telluride_decoding_tpu.sweep.engine import (
            _masked_pearson_first, _ridge_sweep_program,
            _stacked_moments, _total_minus, pad_and_stack)
        xs, ys = _files(rng)
        xsp, masks = pad_and_stack(xs)
        ysp, _ = pad_and_stack([np.asarray(y) for y in ys])
        stacked = _stacked_moments(xsp, ysp, masks, want_syy=True)
        total = jax.tree.map(lambda s: jnp.sum(s, axis=0), stacked)
        lambdas = jnp.asarray([1e-4, 0.1, 10.0], jnp.float32)
        # The program evaluates from MomentStats alone; the reference
        # loop below evaluates from raw predictions + masked pearson —
        # so this also pins moments-eval == dense-eval.
        ch = np.asarray(_ridge_sweep_program(stacked, total, lambdas))
        lu = np.zeros_like(ch)
        for li, lamb in enumerate(np.asarray(lambdas)):
            for f in range(len(xs)):
                ts = _total_minus(stacked, total, jnp.asarray(f))
                sol = solve_ridge_from_moments(ts, float(lamb))
                pred = xsp[f] @ sol.w + sol.b
                lu[li, f] = float(_masked_pearson_first(
                    ysp[f], pred, masks[f]))
        np.testing.assert_allclose(ch, lu, atol=2e-3)

    def test_uniform_fused_moments_match_masked_path(self, rng):
        """per_file_stats routes uniform-length file sets through the
        fused single-dispatch stack+moments program (no padding); its
        stats must equal the ragged masked path element-for-element
        (forced here by perturbing one file's length)."""
        from telluride_decoding_tpu.sweep.engine import per_file_stats
        uniform = [rng.randn(50, 4).astype(np.float32)
                   for _ in range(3)]
        ys = [x[:, :2] * 2.0 + 1.0 for x in uniform]
        fused = per_file_stats(uniform, ys, want_syy=True)
        # Same data through the masked path: pad_frames_to > N with a
        # ragged length set is impossible with identical values, so
        # instead compare against _stacked_moments directly.
        import jax
        import jax.numpy as jnp
        from telluride_decoding_tpu.sweep.engine import (
            _stacked_moments, pad_and_stack)
        xsp, masks = pad_and_stack(uniform, pad_frames_to=64)
        ysp, _ = pad_and_stack(ys, pad_frames_to=64)
        masked = _stacked_moments(xsp, ysp, masks, want_syy=True)
        for got, want in zip(jax.tree.leaves(fused),
                             jax.tree.leaves(masked)):
            np.testing.assert_allclose(np.asarray(got),
                                       np.asarray(want), atol=1e-4)
        # A ragged set takes the masked path end-to-end and agrees on
        # the shared prefix statistics.
        ragged = uniform[:2] + [rng.randn(47, 4).astype(np.float32)]
        ys_r = [x[:, :2] * 2.0 + 1.0 for x in ragged]
        stats_r = per_file_stats(ragged, ys_r, want_syy=True)
        np.testing.assert_allclose(np.asarray(stats_r.sxx[0]),
                                   np.asarray(fused.sxx[0]), atol=1e-4)
        assert float(stats_r.count[2]) == 47.0

    def test_moments_eval_tolerates_dc_offset(self, rng):
        """Moments-only Pearson uses uncentered float32 second moments;
        the documented boundary is mu/sigma ~ 100. Pin that a planted
        model is still recovered accurately with a DC offset of 100
        standard deviations on BOTH x and y (beyond anything the
        z-scoring ingest produces)."""
        n, dx = 4000, 6
        w = rng.randn(dx, 1).astype(np.float32)
        xs, ys = [], []
        for _ in range(3):
            x = rng.randn(n, dx).astype(np.float32)
            y = x @ w + 0.05 * rng.randn(n, 1).astype(np.float32)
            xs.append(x + 100.0)               # mu/sigma = 100.
            ys.append(y + 100.0 * float(np.std(y)))
        res = ridge_jackknife_sweep(xs, ys, [1e-4, 1e-2])
        assert np.isfinite(res.correlations).all()
        assert np.all(res.correlations > 0.95), res.correlations

    def test_ridge_singular_lambda0_falls_back_to_eig(self, rng):
        """lamb=0 on an exactly singular covariance has no unique
        solution (Cholesky and LU both NaN); the sweep retries with the
        eig program, whose zeroed degenerate directions give the
        pseudoinverse answer — finite AND predictive (the planted
        model lives in the covariance's row space)."""
        n = 300
        xs, ys = [], []
        w = rng.randn(4, 1).astype(np.float32)     # One shared model.
        for _ in range(3):
            base = rng.randn(n, 3).astype(np.float32)
            x = np.concatenate([base, base[:, :1]], axis=1)  # Singular.
            xs.append(x.astype(np.float32))
            ys.append((x @ w + 0.05 * rng.randn(n, 1)).astype(
                np.float32))
        result = ridge_jackknife_sweep(xs, ys, [0.0, 1e-3])
        assert np.isfinite(result.correlations).all()
        assert np.all(result.correlations > 0.9)

    def test_chol_whitening_matches_eig_whitening(self, rng):
        """Canonical correlations are whitening-invariant: the fast
        Cholesky program must equal the eig program."""
        import jax
        import jax.numpy as jnp
        from telluride_decoding_tpu.sweep.engine import (
            _cca_sweep_program, _cca_sweep_program_chol,
            _stacked_moments, pad_and_stack)
        xs, ys = _files(rng, num_files=3, dx=6)
        ys = [np.concatenate([y, rng.randn(y.shape[0], 2).astype(
            np.float32)], axis=1) for y in ys]
        xsp, masks = pad_and_stack(xs)
        ysp, _ = pad_and_stack(ys)
        stacked = _stacked_moments(xsp, ysp, masks, want_syy=True)
        total = jax.tree.map(lambda s: jnp.sum(s, axis=0), stacked)
        lambdas = jnp.asarray([1e-3, 0.1, 10.0], jnp.float32)
        eig = np.asarray(_cca_sweep_program(stacked, total, lambdas))
        chol = np.asarray(_cca_sweep_program_chol(
            stacked, total, lambdas))
        np.testing.assert_allclose(chol, eig, atol=2e-3)

    def test_chol_nan_falls_back_to_eig(self, rng):
        """Rank-deficient covariance + lambda=0 breaks Cholesky; the
        sweep must detect it and return the eig program's finite
        answer."""
        n = 300
        latent = rng.randn(n, 2).astype(np.float32)
        xs, ys = [], []
        for _ in range(3):
            base = rng.randn(n, 3).astype(np.float32)
            # Duplicated column -> exactly singular covariance.
            x = np.concatenate([base, base[:, :1]], axis=1)
            xs.append(x.astype(np.float32))
            ys.append((x[:, :2] + 0.1 * rng.randn(n, 2)).astype(
                np.float32))
        result = cca_jackknife_sweep(xs, ys, [0.0, 0.1], dims=1)
        assert np.isfinite(result.correlations).all()
        assert np.all(result.correlations > 0.8)

    def test_lambda_grid_shape_and_names(self, rng):
        xs, ys = _files(rng, num_files=2, dx=4)
        ys2 = [np.concatenate([y, rng.randn(y.shape[0], 2).astype(
            np.float32)], axis=1) for y in ys]
        result = cca_jackknife_sweep(xs, ys2, [0.1], dims=2,
                                     file_names=['a', 'b'])
        assert result.test_files == ['a', 'b']
        assert result.correlations.shape == (1, 2)


class TestRegressionCli:

    def test_jackknife_over_regularizations_linear(self, rng, tmp_path):
        # End-to-end through the CLI layer on synthetic TFRecords.
        from telluride_decoding_tpu.cli import decoding as dec
        from telluride_decoding_tpu.cli import regression as reg
        from telluride_decoding_tpu.data import records
        d = tmp_path / 'records'
        d.mkdir()
        w = rng.randn(3 * 11, 1).astype(np.float32)  # 3ch x 11 lags
        from telluride_decoding_tpu.ops.lagstack import lag_stack_np
        for name in ['t01', 't02', 't03']:
            eeg = rng.randn(400, 3).astype(np.float32)
            stacked = lag_stack_np(eeg, 0, 10)
            intensity = (stacked @ w +
                         0.1 * rng.randn(400, 1).astype(np.float32))
            records.convert_data_to_tfrecords(
                {'eeg': eeg, 'intensity': intensity}, str(d / (name +
                                                               '.tfrecords')))
        my_flags = dec.DecodingOptions().set_from_dict(dict(
            tfexample_dir=str(d), post_context=10,
            dnn_regressor='linear', input_field='eeg',
            output_field='intensity',
            test_metric='pearson_correlation_first'))
        obj = reg.RegressionLinear(my_flags)
        results = obj.jackknife_over_regularizations(
            my_flags, [1e-4, 1e-1], summary_base_dir=str(tmp_path / 's'))
        assert len(results) == 2
        mean_low, _ = results[1e-4]
        assert mean_low > 0.9
        # Summary files written per config.
        import os
        assert any('reglambda' in p
                   for p in os.listdir(str(tmp_path / 's')))

    def test_jackknife_protocol_reference_routing(self, rng, tmp_path):
        """--protocol reference must (a) reach the data layer
        (reference_protocol stream) and (b) bypass the one-program
        sweep engine, whose whole-file metrics are a different
        evaluation protocol — the per-cell train_and_test path
        reproduces the reference's drop-remainder per-batch means
        (live parity ~2e-8: tests/test_reference_ab.py ragged tier)."""
        from telluride_decoding_tpu.cli import decoding as dec
        from telluride_decoding_tpu.cli import regression as reg
        from telluride_decoding_tpu.data import records
        from telluride_decoding_tpu.ops.lagstack import lag_stack_np
        d = tmp_path / 'records'
        d.mkdir()
        w = rng.randn(3 * 5, 1).astype(np.float32)
        # Ragged lengths, none a batch_size multiple.
        for name, n in [('t01', 300), ('t02', 420), ('t03', 350)]:
            eeg = rng.randn(n, 3).astype(np.float32)
            intensity = (lag_stack_np(eeg, 0, 4) @ w +
                         0.3 * rng.randn(n, 1).astype(np.float32))
            records.convert_data_to_tfrecords(
                {'eeg': eeg, 'intensity': intensity},
                str(d / (name + '.tfrecords')))

        def run(protocol):
            my_flags = dec.DecodingOptions().set_from_dict(dict(
                tfexample_dir=str(d), post_context=4,
                dnn_regressor='linear', input_field='eeg',
                output_field='intensity', batch_size=128,
                shuffle_buffer_size=0, protocol=protocol,
                test_metric='pearson_correlation_first'))
            obj = reg.Regression(my_flags)
            return obj.jackknife_over_regularizations(
                my_flags, [1e-2],
                summary_base_dir=str(tmp_path / ('s_' + protocol)))

        whole = run('whole_split')[1e-2]
        refp = run('reference')[1e-2]
        assert whole[0] > 0.8 and refp[0] > 0.8
        # The protocols genuinely diverge on a ragged corpus: equality
        # would mean the flag silently fell through to the engine.
        assert abs(float(whole[0]) - float(refp[0])) > 1e-6

    def test_new_corpus_presets(self, rng, tmp_path):
        """jens_impaired/kuleuven presets (beyond the reference's four)
        select correct fields and run a jackknife end to end."""
        from telluride_decoding_tpu.cli import decoding as dec
        from telluride_decoding_tpu.cli import regression as reg
        from telluride_decoding_tpu.data import records
        from telluride_decoding_tpu.ops.lagstack import lag_stack_np
        for name, cls in [('jens_impaired_linear',
                           reg.JensImpairedLinear),
                          ('kuleuven_linear', reg.KULeuvenLinear),
                          ('kuleuven_cca', reg.KULeuvenCCA)]:
            obj = reg.select_regression_object(name,
                                               dec.DecodingOptions())
            assert isinstance(obj, cls)
        # End to end on impaired-style records (attended_intensity).
        d = tmp_path / 'records'
        d.mkdir()
        w = rng.randn(3 * 21, 1).astype(np.float32)
        for name in ['t01', 't02', 't03']:
            eeg = rng.randn(400, 3).astype(np.float32)
            att = (lag_stack_np(eeg, 0, 20) @ w +
                   0.1 * rng.randn(400, 1).astype(np.float32))
            records.convert_data_to_tfrecords(
                {'eeg': eeg,
                 'attended_intensity': att.astype(np.float32),
                 'unattended_intensity': rng.randn(400, 1).astype(
                     np.float32)},
                str(d / (name + '.tfrecords')))
        my_flags = dec.DecodingOptions().set_from_dict(dict(
            tfexample_dir=str(d)))
        obj = reg.JensImpairedLinear(my_flags)
        obj.preset_flags()
        assert my_flags.output_field == 'attended_intensity'
        assert my_flags.frame_rate == 64.0
        results = obj.jackknife_over_regularizations(
            my_flags, [1e-4], summary_base_dir=str(tmp_path / 's'))
        mean_low, _ = results[1e-4]
        assert mean_low > 0.9

    def test_parse_regularization_values(self):
        from telluride_decoding_tpu.cli import regression as reg
        normal = reg.parse_regularization_values('normal')
        assert len(normal) == 7
        assert normal[0] == pytest.approx(1e-6)
        custom = reg.parse_regularization_values('0.1,1,10')
        np.testing.assert_allclose(custom, [0.1, 1, 10])
        assert reg.parse_regularization_values(0.5) == [0.5]
        with pytest.raises(ValueError):
            reg.parse_regularization_values('abc,def')


class TestMultiSubject:

    def test_cohort_sweep_and_summary(self, rng):
        from telluride_decoding_tpu.sweep import (cohort_summary,
                                                  multi_subject_sweep)
        subjects = {}
        for s in range(3):
            w = rng.randn(5, 1).astype(np.float32)
            xs = [rng.randn(200, 5).astype(np.float32) for _ in range(4)]
            ys = [x @ w + 0.1 * rng.randn(200, 1).astype(np.float32)
                  for x in xs]
            subjects['subject_%02d' % s] = (xs, ys)
        results = multi_subject_sweep(subjects, [1e-4, 1e-1])
        assert set(results) == set(subjects)
        for res in results.values():
            assert res.correlations.shape == (2, 4)
            assert np.all(res.correlations[0] > 0.9)
        mean, std = cohort_summary(results)
        assert mean.shape == (2,)
        assert mean[0] > 0.9
        assert np.all(std >= 0)

    def _ragged_cohort(self, rng, model='ridge'):
        subjects = {}
        for s, (num_files, frames) in enumerate(
                [(4, 200), (3, 150), (5, 230)]):
            w = rng.randn(5, 2).astype(np.float32)
            xs = [rng.randn(frames + 7 * i, 5).astype(np.float32)
                  for i in range(num_files)]
            ys = [x @ w + 0.1 * rng.randn(x.shape[0], 2).astype(np.float32)
                  for x in xs]
            subjects['subject_%02d' % s] = (xs, ys)
        return subjects

    def test_ragged_cohort_single_compilation(self, rng):
        """Ragged trial counts/lengths pad to the cohort max so the
        sweep program compiles ONCE (VERDICT r1 weak item 6)."""
        from telluride_decoding_tpu.sweep import multi_subject_sweep
        from telluride_decoding_tpu.sweep.engine import (
            _ridge_sweep_program)
        subjects = self._ragged_cohort(rng)
        before = _ridge_sweep_program._cache_size()
        results = multi_subject_sweep(subjects, [1e-4, 1e-1])
        assert _ridge_sweep_program._cache_size() == before + 1
        # Padding is sliced away: per-subject shapes are the TRUE ones.
        assert results['subject_00'].correlations.shape == (2, 4)
        assert results['subject_01'].correlations.shape == (2, 3)
        assert results['subject_02'].correlations.shape == (2, 5)
        # And values match the unpadded per-subject sweeps.
        unpadded = multi_subject_sweep(subjects, [1e-4, 1e-1],
                                       shared_shapes=False)
        for name in subjects:
            np.testing.assert_allclose(
                results[name].correlations,
                unpadded[name].correlations, atol=2e-4)

    def test_ragged_cohort_1d_targets_and_x(self, rng):
        """1-D per-file arrays (single channel, no lag context) work
        with file padding. (Regression: _pad_files read .shape[1]
        before _ensure_2d and crashed with IndexError.)"""
        from telluride_decoding_tpu.sweep.engine import (
            ridge_jackknife_sweep)
        xs = [rng.randn(100).astype(np.float32) for _ in range(3)]
        ys = [2.0 * x + 0.01 * rng.randn(100).astype(np.float32)
              for x in xs]
        res = ridge_jackknife_sweep(xs, ys, [1e-4], pad_files_to=5)
        assert res.correlations.shape == (1, 3)
        assert np.all(res.correlations > 0.99)

    def test_ragged_cohort_cca(self, rng):
        from telluride_decoding_tpu.sweep import multi_subject_sweep
        subjects = self._ragged_cohort(rng)
        padded = multi_subject_sweep(subjects, [1e-2, 1.0], model='cca',
                                     dims=2)
        unpadded = multi_subject_sweep(subjects, [1e-2, 1.0],
                                       model='cca', dims=2,
                                       shared_shapes=False)
        for name in subjects:
            assert padded[name].correlations.shape == \
                unpadded[name].correlations.shape
            np.testing.assert_allclose(padded[name].correlations,
                                       unpadded[name].correlations,
                                       atol=2e-4)


class TestSgdJackknife:
    """The NON-fast sweep path: SGD models (fullyconnected) jackknife
    through per-(lambda, file) train_and_test instead of the
    deterministic engine (regression.py general path — previously
    untested)."""

    def test_dnn_jackknife_over_regularizations(self, rng, tmp_path):
        from telluride_decoding_tpu.cli import decoding, regression
        from telluride_decoding_tpu.data import records
        d = tmp_path / 'records'
        d.mkdir()
        w = rng.randn(4, 1).astype(np.float32)
        for t in range(2):
            x = rng.randn(400, 4).astype(np.float32)
            records.convert_data_to_tfrecords(
                {'eeg': x, 'intensity': x @ w},
                str(d / ('t%02d.tfrecords' % t)))
        flags_ = decoding.DecodingOptions().set_from_dict(dict(
            tfexample_dir=str(d), data='tfrecords',
            input_field='eeg', output_field='intensity',
            attended_field='', dnn_regressor='fullyconnected',
            hidden_units='', epoch_count=120, learning_rate=0.05,
            batch_size=200, shuffle_buffer_size=0,
            test_metric='pearson_correlation_first',
            train_file_pattern='allbut'))
        obj = regression.Regression(flags_)
        obj.test_name = 'dnn_test'
        results = obj.jackknife_over_regularizations(
            flags_, [1e-4, 1e-2],
            summary_base_dir=str(tmp_path / 'sweeps'))
        assert len(results) == 2
        for lamb, (mean, std) in results.items():
            assert np.isfinite(mean) and np.isfinite(std)
            assert mean > 0.9, (lamb, mean)   # Linear problem, no hidden.


class TestSweepReviewFixesR4B:
    """Second round-4 review pass over the older engine/multihost
    code."""

    def test_budget_counts_padded_files(self, rng, monkeypatch):
        """The batched-regime budget must scale with pad_files_to: a
        2-file subject padded to a 40-file cohort stages a 20x larger
        stack than the real files alone (the old num_real budget
        admitted it)."""
        from telluride_decoding_tpu.sweep import engine
        xs = [rng.randn(100, 4).astype(np.float32) for _ in range(2)]
        ys = [rng.randn(100, 1).astype(np.float32) for _ in range(2)]
        calls = {}
        orig = engine._stacked_moments

        def spy(*a, **k):
            calls['batched'] = True
            return orig(*a, **k)

        monkeypatch.setattr(engine, '_stacked_moments', spy)
        # Real files: 2*100*5*4 = 4000 B; padded: 8*100*5*4 = 16000 B.
        # A 10 kB budget must now route to the streaming regime.
        res = engine.per_file_stats(xs, ys, want_syy=True,
                                    pad_files_to=8, batch_bytes=10000)
        assert 'batched' not in calls
        # Cross-regime parity: the reference values come from the
        # BATCHED regime (a budget the padded stack fits), so the
        # comparison pins streaming-vs-batched value identity rather
        # than comparing the streaming path against itself.
        want = engine.per_file_stats(xs, ys, want_syy=True,
                                     pad_files_to=8, batch_bytes=1 << 30)
        assert calls.get('batched')
        import jax
        for a, b in zip(jax.tree.leaves(res), jax.tree.leaves(want)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-4)

    def test_mismatched_file_lists_raise(self, rng):
        """10 x files vs 9 y files must fail loudly, not zero-fill the
        surplus file's statistics under padding."""
        from telluride_decoding_tpu.sweep.engine import per_file_stats
        xs = [rng.randn(50, 3).astype(np.float32) for _ in range(3)]
        ys = [rng.randn(50, 1).astype(np.float32) for _ in range(2)]
        with pytest.raises(ValueError, match='3 x files but 2 y'):
            per_file_stats(xs, ys, want_syy=True, pad_files_to=6)

    def test_lam_chunk_env_accepts_float_styles(self, monkeypatch):
        """'4.0'/'1e1' must parse like the byte knobs; garbage warns
        and falls back instead of being silently ignored."""
        from telluride_decoding_tpu.sweep.engine import _lam_chunk_units
        monkeypatch.setenv('TDT_SWEEP_LAM_CHUNK', '4.0')
        assert _lam_chunk_units(10, 100, 9) == 4
        monkeypatch.setenv('TDT_SWEEP_LAM_CHUNK', '1e1')
        assert _lam_chunk_units(10, 100, 9) == 9   # Clamped to num_l.
        monkeypatch.setenv('TDT_SWEEP_LAM_CHUNK', 'banana')
        assert _lam_chunk_units(10, 100, 9) >= 1   # Heuristic fallback.
        # float('inf') parses but int(inf) raises OverflowError — must
        # fall back like any other garbage, not crash the sweep.
        monkeypatch.setenv('TDT_SWEEP_LAM_CHUNK', 'inf')
        assert _lam_chunk_units(10, 100, 9) >= 1
        monkeypatch.setenv('TDT_SWEEP_LAM_CHUNK', '4')
        monkeypatch.setenv('TDT_SWEEP_LAM_CHUNK_BYTES', 'inf')
        assert _lam_chunk_units(10, 100, 9) == 4
        monkeypatch.delenv('TDT_SWEEP_LAM_CHUNK')
        assert _lam_chunk_units(10, 100, 9) >= 1   # Byte knob fallback.
