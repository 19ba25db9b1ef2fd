"""Device meshes and the framework's collective patterns.

The reference has no distributed runtime — "distribution" is shell
fan-out of independent processes (doc/DecodingCodelab.md:353-389).
This module supplies the honest TPU equivalents (SURVEY.md §2
parallelism table):

  * DP: frame-sharded covariance accumulation. X^T X over a sharded
    frame axis is a per-shard matmul + psum over ICI — implemented with
    shard_map so the collective is explicit.
  * SP: the workload's only sequence parallelism is temporal lag
    windowing; for very long recordings the time axis shards across
    devices with a halo exchange of pre/post context frames
    (ppermute with neighbors), after which lag stacking is local.
  * Sweep: handled in sweep.engine (vmapped lambda grids, file-sharded
    evaluation).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from telluride_decoding_tpu.ops.covariance import (MomentStats,
                                                   moments_from_arrays)


def create_mesh(axis_names: Sequence[str] = ('data',),
                shape: Optional[Sequence[int]] = None,
                devices=None) -> Mesh:
    """Creates a device mesh; defaults to 1-D over all local devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = [len(devices)] + [1] * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), tuple(axis_names))


def shard_frames(x: np.ndarray, mesh: Mesh, axis: str = 'data'
                 ) -> jax.Array:
    """Puts an [N, D] array with frames sharded over a mesh axis.

    N is padded with zero frames to a multiple of the axis size. Zero
    frames contribute nothing to moment SUMS, but they do occupy rows:
    pass the true frame count to sharded_moments (count=N) or the
    padded count will bias means/covariances.
    """
    num = int(mesh.shape[axis])
    n = x.shape[0]
    pad = (-n) % num
    if pad:
        x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
    return jax.device_put(x, NamedSharding(mesh, P(axis, None)))


@functools.lru_cache(maxsize=32)
def _sharded_moments_fn(mesh: Mesh, axis: str, want_syy: bool):
    """Jitted shard_map moments, cached per (mesh, axis, want_syy) so
    repeated calls hit the jit cache instead of retracing."""
    from jax import shard_map

    def local_moments(x_shard, y_shard):
        stats = moments_from_arrays(x_shard, y_shard, want_syy=want_syy)
        return jax.tree.map(lambda s: jax.lax.psum(s, axis), stats)

    return jax.jit(shard_map(local_moments, mesh=mesh,
                             in_specs=(P(axis, None), P(axis, None)),
                             out_specs=P()))


def sharded_moments(x: jax.Array, y: jax.Array, mesh: Mesh,
                    axis: str = 'data', want_syy: bool = False,
                    count: Optional[float] = None) -> MomentStats:
    """MomentStats over frame-sharded data: local matmuls + one psum.

    Each device computes moments of its local frame shard on the MXU;
    a single psum over the ICI ring reduces them. ``count`` MUST be the
    true (pre-padding) frame count whenever shard_frames padded the
    input — the padded rows are zeros (sums unaffected) but would
    inflate the count and bias every derived mean/covariance.
    """
    stats = _sharded_moments_fn(mesh, axis, want_syy)(x, y)
    if count is not None:
        stats = stats._replace(count=jnp.asarray(count, jnp.float32))
    return stats


def time_sharded_lag_stack(x: jax.Array, pre: int, post: int, mesh: Mesh,
                           axis: str = 'data') -> jax.Array:
    return _time_sharded_lag_stack_fn(mesh, axis, pre, post)(x)


@functools.lru_cache(maxsize=32)
def _time_sharded_lag_stack_fn(mesh: Mesh, axis: str, pre: int,
                               post: int):
    """Lag stacking with the time axis sharded across devices.

    Each device holds a contiguous [N/d, C] time slice. Before local
    windowing it needs ``pre`` trailing frames from its left neighbor
    and ``post`` leading frames from its right neighbor — one ppermute
    halo exchange each way over the ICI ring. Edges of the whole
    recording are zero-padded, matching the single-device lag_stack
    semantics exactly.
    """
    from jax import shard_map

    num_shards = mesh.shape[axis]

    def local(x_shard):
        idx = jax.lax.axis_index(axis)
        c = x_shard.shape[1]
        if pre > x_shard.shape[0] or post > x_shard.shape[0]:
            # Context wider than one FULL neighbor shard would need
            # frames from two hops away — a single-hop halo exchange
            # cannot provide them, and the clamped slices below would
            # silently repeat frames instead. (Context exactly equal
            # to the shard size is fine: the whole neighbor IS the
            # halo.)
            raise ValueError(
                'pre/post context (%d/%d) cannot exceed the per-shard '
                'frame count (%d); use fewer shards or shorter '
                'context.' % (pre, post, x_shard.shape[0]))
        # Halo from the left neighbor (its last `pre` frames).
        if pre:
            tail = x_shard[-pre:, :]
            left_halo = jax.lax.ppermute(
                tail, axis,
                [(i, (i + 1) % num_shards) for i in range(num_shards)])
            left_halo = jnp.where(idx == 0,
                                  jnp.zeros_like(left_halo), left_halo)
        else:
            left_halo = jnp.zeros((0, c), x_shard.dtype)
        # Halo from the right neighbor (its first `post` frames).
        if post:
            head = x_shard[:post, :]
            right_halo = jax.lax.ppermute(
                head, axis,
                [(i, (i - 1) % num_shards) for i in range(num_shards)])
            right_halo = jnp.where(idx == num_shards - 1,
                                   jnp.zeros_like(right_halo), right_halo)
        else:
            right_halo = jnp.zeros((0, c), x_shard.dtype)

        padded = jnp.concatenate([left_halo, x_shard, right_halo], axis=0)
        n_local = x_shard.shape[0]
        total = pre + 1 + post
        cols = [jax.lax.dynamic_slice_in_dim(padded, k, n_local, axis=0)
                for k in range(total)]
        return jnp.concatenate(cols, axis=1)

    fn = shard_map(local, mesh=mesh, in_specs=P(axis, None),
                   out_specs=P(axis, None))
    return jax.jit(fn)
