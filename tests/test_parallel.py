"""Mesh-parallel tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from telluride_decoding_tpu.ops.covariance import moments_from_arrays
from telluride_decoding_tpu.ops.lagstack import lag_stack_np
from telluride_decoding_tpu.parallel import (create_mesh, shard_frames,
                                             sharded_moments,
                                             time_sharded_lag_stack)


@pytest.fixture
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip('needs multiple devices')
    return create_mesh(('data',))


class TestShardedMoments:

    def test_matches_single_device(self, rng, mesh):
        n = 8 * 37  # Not a multiple of anything special.
        x = rng.randn(n, 6).astype(np.float32)
        y = rng.randn(n, 2).astype(np.float32)
        want = moments_from_arrays(jnp.asarray(x), jnp.asarray(y),
                                   want_syy=True)
        xs = shard_frames(x, mesh)
        ys = shard_frames(y, mesh)
        got = sharded_moments(xs, ys, mesh, want_syy=True, count=n)
        for name in ('count', 'sum_x', 'sum_y', 'sxx', 'syy', 'sxy'):
            np.testing.assert_allclose(np.asarray(getattr(got, name)),
                                       np.asarray(getattr(want, name)),
                                       rtol=1e-5, atol=1e-3)

    def test_padding_is_harmless(self, rng, mesh):
        n = 101  # Forces zero padding to a multiple of 8.
        x = rng.randn(n, 3).astype(np.float32)
        y = rng.randn(n, 1).astype(np.float32)
        got = sharded_moments(shard_frames(x, mesh), shard_frames(y, mesh),
                              mesh, count=n)
        want = moments_from_arrays(jnp.asarray(x), jnp.asarray(y))
        np.testing.assert_allclose(np.asarray(got.sxx),
                                   np.asarray(want.sxx), rtol=1e-5,
                                   atol=1e-3)
        assert float(got.count) == n

    def test_ridge_solve_from_sharded_stats(self, rng, mesh):
        from telluride_decoding_tpu.solvers.ridge import (
            solve_ridge_from_moments)
        n = 8 * 100
        w = rng.randn(4, 1).astype(np.float32)
        x = rng.randn(n, 4).astype(np.float32)
        y = x @ w
        stats = sharded_moments(shard_frames(x, mesh),
                                shard_frames(y, mesh), mesh, count=n)
        sol = solve_ridge_from_moments(stats, 1e-6)
        np.testing.assert_allclose(np.asarray(sol.w), w, atol=1e-3)


class TestTimeShardedLagStack:

    @pytest.mark.parametrize('pre,post', [(2, 1), (3, 0), (0, 2), (5, 5)])
    def test_matches_single_device(self, rng, mesh, pre, post):
        n = 8 * 16
        x = rng.randn(n, 3).astype(np.float32)
        want = lag_stack_np(x, pre, post)
        xs = shard_frames(x, mesh)
        got = np.asarray(time_sharded_lag_stack(xs, pre, post, mesh))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_shard_boundaries_have_real_context(self, rng, mesh):
        # Row at a shard boundary must see the neighbor's frames, not
        # zeros: this is the halo exchange working.
        n = 8 * 8
        x = np.arange(n, dtype=np.float32)[:, None]
        got = np.asarray(time_sharded_lag_stack(shard_frames(x, mesh),
                                                2, 2, mesh))
        want = lag_stack_np(x, 2, 2)
        boundary_row = n // 8  # First row of shard 1.
        np.testing.assert_array_equal(got[boundary_row],
                                      want[boundary_row])
        # And it genuinely contains the previous shard's values.
        assert want[boundary_row][0] == boundary_row - 2

    def test_context_wider_than_shard_raises(self, rng, mesh):
        """A single-hop halo can only reach the adjacent neighbor;
        context spanning two shards must raise, not silently clamp."""
        x = rng.randn(8 * 2, 3).astype(np.float32)  # 2 frames/shard.
        with pytest.raises(ValueError, match='per-shard frame count'):
            time_sharded_lag_stack(shard_frames(x, mesh), 3, 0, mesh)

    def test_context_equal_to_shard_is_exact(self, rng, mesh):
        """Context exactly one shard wide is reachable (the whole
        neighbor IS the halo) and must stay bit-exact, not raise."""
        x = rng.randn(8 * 3, 2).astype(np.float32)  # 3 frames/shard.
        got = np.asarray(time_sharded_lag_stack(shard_frames(x, mesh),
                                                3, 3, mesh))
        np.testing.assert_allclose(got, lag_stack_np(x, 3, 3),
                                   atol=1e-6)


class TestNonDivisibleFileSharding:
    """22 files on 8 devices must PAD to 24 and shard — not silently
    fall back to one device (round-2 review finding)."""

    def test_pad_target_rounds_up_to_mesh_multiple(self, mesh):
        from telluride_decoding_tpu.sweep.engine import _mesh_file_padding
        assert _mesh_file_padding(22, None, mesh) == 24
        assert _mesh_file_padding(16, None, mesh) is None  # Divisible.
        assert _mesh_file_padding(22, 30, mesh) == 32      # Respects floor.
        assert _mesh_file_padding(22, None, None) is None  # No mesh.

    def test_stats_carry_named_sharding_over_file_axis(self, rng, mesh):
        """The moments-only sweep shards the [F, ...] MomentStats
        leaves (not raw frames — those never reach the program)."""
        import jax
        from jax.sharding import NamedSharding
        from telluride_decoding_tpu.sweep.engine import (
            _mesh_file_padding, _shard_stats_over_mesh, per_file_stats)
        from telluride_decoding_tpu.parallel import create_mesh
        file_mesh = create_mesh(('file',))
        xs = [rng.randn(40, 3).astype(np.float32) for _ in range(22)]
        ys = [x @ rng.randn(3, 1).astype(np.float32) for x in xs]
        pad_to = _mesh_file_padding(len(xs), None, file_mesh)
        stats = per_file_stats(xs, ys, want_syy=True,
                               pad_files_to=pad_to)
        stats = _shard_stats_over_mesh(stats, file_mesh)
        for leaf in jax.tree.leaves(stats):
            assert leaf.shape[0] == 24
            assert isinstance(leaf.sharding, NamedSharding)
            assert leaf.sharding.spec[0] == 'file'

    def test_22_files_sharded_equals_unsharded(self, rng, mesh):
        import warnings
        from telluride_decoding_tpu.parallel import create_mesh
        from telluride_decoding_tpu.sweep.engine import (
            ridge_jackknife_sweep)
        file_mesh = create_mesh(('file',))
        w = rng.randn(4, 1).astype(np.float32)
        xs = [rng.randn(60 + 3 * i, 4).astype(np.float32)
              for i in range(22)]
        ys = [x @ w + 0.1 * rng.randn(x.shape[0], 1).astype(np.float32)
              for x in xs]
        single = ridge_jackknife_sweep(xs, ys, [1e-4, 1.0], mesh=None)
        with warnings.catch_warnings():
            # The unsharded-fallback warning firing here would mean the
            # padding did NOT make the file axis divisible.
            warnings.simplefilter('error')
            sharded = ridge_jackknife_sweep(xs, ys, [1e-4, 1.0],
                                            mesh=file_mesh)
        assert sharded.correlations.shape == (2, 22)
        np.testing.assert_allclose(sharded.correlations,
                                   single.correlations, atol=1e-4)


class TestSubjectParallelCohort:
    """The cohort's subject axis sharded over the mesh (zero
    collectives; each device runs its local subjects' full grid)."""

    def _cohort(self, rng, num_subjects):
        subjects = {}
        for s in range(num_subjects):
            w = rng.randn(4, 1).astype(np.float32)
            xs = [rng.randn(50 + 5 * (s % 3), 4).astype(np.float32)
                  for _ in range(3 + s % 2)]   # Ragged files too.
            ys = [x @ w + 0.1 * rng.randn(x.shape[0], 1)
                  .astype(np.float32) for x in xs]
            subjects['subj%02d' % s] = (xs, ys)
        return subjects

    @pytest.mark.parametrize('num_subjects', [8, 11])
    def test_matches_serial(self, rng, num_subjects):
        from telluride_decoding_tpu.parallel import create_mesh
        from telluride_decoding_tpu.sweep.engine import multi_subject_sweep
        subj_mesh = create_mesh(('subject',))
        subjects = self._cohort(rng, num_subjects)
        serial = multi_subject_sweep(subjects, [1e-4, 1e-1])
        par = multi_subject_sweep(subjects, [1e-4, 1e-1],
                                  mesh=subj_mesh, subject_parallel=True)
        assert set(par) == set(serial)
        for name in subjects:
            assert par[name].correlations.shape == \
                serial[name].correlations.shape
            np.testing.assert_allclose(par[name].correlations,
                                       serial[name].correlations,
                                       atol=2e-4)

    def test_cca_matches_serial(self, rng):
        from telluride_decoding_tpu.parallel import create_mesh
        from telluride_decoding_tpu.sweep.engine import multi_subject_sweep
        subj_mesh = create_mesh(('subject',))
        subjects = {}
        latent_w = rng.randn(2, 2).astype(np.float32)
        for s in range(5):
            xs, ys = [], []
            for i in range(3):
                n = 200 + 11 * i + 7 * s
                latent = rng.randn(n, 2).astype(np.float32)
                x = np.concatenate(
                    [latent + 0.2 * rng.randn(n, 2), rng.randn(n, 3)],
                    axis=1).astype(np.float32)
                y = np.concatenate(
                    [latent @ latent_w + 0.2 * rng.randn(n, 2),
                     rng.randn(n, 1)], axis=1).astype(np.float32)
                xs.append(x)
                ys.append(y)
            subjects['subj%d' % s] = (xs, ys)
        serial = multi_subject_sweep(subjects, [1e-2, 1.0], model='cca',
                                     dims=2)
        par = multi_subject_sweep(subjects, [1e-2, 1.0], model='cca',
                                  dims=2, mesh=subj_mesh,
                                  subject_parallel=True)
        for name in subjects:
            np.testing.assert_allclose(par[name].correlations,
                                       serial[name].correlations,
                                       atol=2e-4)

    def test_rank_deficient_subject_retries_alone(self, rng):
        """Lambda 0 on ONE collinear subject: that subject falls back
        to the eig path per-subject; healthy groupmates keep their
        Cholesky results (review fix: the retry used to rerun the
        whole group)."""
        from telluride_decoding_tpu.parallel import create_mesh
        from telluride_decoding_tpu.sweep.engine import multi_subject_sweep
        subj_mesh = create_mesh(('subject',))
        subjects = self._cohort(rng, 4)
        # Make subject 2 rank-deficient: duplicate a column.
        xs2, ys2 = subjects['subj02']
        xs2 = [np.concatenate([x[:, :3], x[:, 2:3]], axis=1)
               for x in xs2]
        subjects['subj02'] = (xs2, ys2)
        lambdas = [0.0, 1e-2]
        serial = multi_subject_sweep(subjects, lambdas)
        par = multi_subject_sweep(subjects, lambdas, mesh=subj_mesh,
                                  subject_parallel=True)
        for name in subjects:
            assert np.isfinite(par[name].correlations).all(), name
            np.testing.assert_allclose(par[name].correlations,
                                       serial[name].correlations,
                                       atol=5e-3)
