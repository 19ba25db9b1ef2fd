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
