"""CCA brain models: deterministic linear CCA and deep CCA (DCCA).

Parity with the reference BrainCcaLayer/BrainModelCCA (cca.py:84-369)
plus the DCCA capability implied by its cca_loss (cca.py:372-443): two
nonlinear towers trained to maximize the sum of canonical correlations
(Andrew et al. 2013). The reference ships cca_loss but never wires it to
a model; here BrainModelDCCA is a first-class model.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from telluride_decoding_tpu.models.brain_model import (
    BrainModel,
    _SgdModel,
    _apply_mlp,
    _dataset_arrays,
    _init_mlp,
    register_model,
)
from telluride_decoding_tpu.solvers import cca as cca_solver


@register_model
class BrainModelCCA(BrainModel):
    """Deterministic CCA: rotate both inputs to maximal correlation.

    ``apply`` concatenates the two rotated streams (the reference
    BrainCcaLayer.call contract, cca.py:150-161), so downstream
    reductions split the output in half.
    """

    loss_name = 'cca_pearson_correlation_first'
    metric_names = ('cca_pearson_correlation_first',)

    def __init__(self, input_dataset=None, cca_dims: int = 5,
                 regularization_lambda: float = 0.0,
                 tensorboard_dir: Optional[str] = None,
                 input1_width: Optional[int] = None,
                 input2_width: Optional[int] = None):
        super().__init__(tensorboard_dir)
        if input_dataset is not None:
            spec_in, _ = input_dataset.element_spec
            input1_width = spec_in['input_1'][-1]
            input2_width = spec_in['input_2'][-1]
        if input1_width is not None and input1_width <= 1:
            raise ValueError('Input 1 feature width (%d) should not be <= 1.'
                             % input1_width)
        if input2_width is not None and input2_width <= 1:
            raise ValueError('Input 2 feature width (%d) should not be <= 1.'
                             % input2_width)
        self._input1_width = input1_width
        self._input2_width = input2_width
        self._cca_dims = cca_dims
        self._regularization_lambda = regularization_lambda

    def config(self):
        return {'cca_dims': self._cca_dims,
                'regularization_lambda': self._regularization_lambda,
                'input1_width': self._input1_width,
                'input2_width': self._input2_width}

    @classmethod
    def _from_config(cls, config):
        return cls(**config)

    def _real_dims(self):
        return min(self._input1_width, self._input2_width, self._cca_dims)

    def _params_template(self):
        dims = self._real_dims()
        return {'mean1': jnp.zeros((1, self._input1_width)),
                'mean2': jnp.zeros((1, self._input2_width)),
                'rot1': jnp.zeros((self._input1_width, dims)),
                'rot2': jnp.zeros((self._input2_width, dims))}

    def apply(self, params, input_dict):
        # Bias-folded rotations: (x - m) @ R = x @ R - m @ R keeps the
        # (large) input streaming through the MXU in its storage dtype
        # instead of materializing a centered copy. "Storage dtype"
        # means a FLOAT storage dtype (bf16/f32); integer inputs (raw
        # int16 EDF samples) must promote — casting the rotation to an
        # int dtype would truncate its coefficients to zero.
        def prep(x):
            x = jnp.asarray(x)
            return x if jnp.issubdtype(x.dtype, jnp.floating) else \
                x.astype(jnp.float32)
        x1 = prep(input_dict['input_1'])
        x2 = prep(input_dict['input_2'])
        r1 = jnp.dot(x1, params['rot1'].astype(x1.dtype),
                     preferred_element_type=jnp.float32) - \
            jnp.dot(params['mean1'], params['rot1'])
        r2 = jnp.dot(x2, params['rot2'].astype(x2.dtype),
                     preferred_element_type=jnp.float32) - \
            jnp.dot(params['mean2'], params['rot2'])
        return jnp.concatenate([r1, r2], axis=1)

    def fit(self, dataset, epochs: int = 1, **kwargs):
        del epochs  # Deterministic: one covariance pass + SVD.
        in1, in2, _, _ = _dataset_arrays(dataset)
        solution = cca_solver.calculate_cca_parameters(
            in1, in2, dim=self._real_dims(),
            regularization=self._regularization_lambda)
        self._set_solution(solution)
        return {}

    def fit_streaming(self, brain_data, mode: str = 'train',
                      epochs: int = 1, **kwargs):
        """Bounded-memory fit: per-file streamed covariance of the
        (input_1, input_2) pair, then the same whitening + SVD solve.
        Value-identical to fit() on the concatenated arrays."""
        del epochs, kwargs  # Deterministic: one covariance pass + SVD.
        stats = brain_data.streaming_moments(mode, y_source='input_2',
                                             want_syy=True)
        solution = cca_solver.solve_cca_from_moments(
            stats, dim=self._real_dims(),
            regularization=self._regularization_lambda)
        self._set_solution(solution)
        return {}

    def _set_solution(self, solution):
        self.params = {'mean1': solution.mean_x, 'mean2': solution.mean_y,
                       'rot1': solution.rot_x, 'rot2': solution.rot_y}
        self.eigenvalues = np.asarray(solution.eigenvalues)
        self.rot_x = np.asarray(solution.rot_x)
        self.rot_y = np.asarray(solution.rot_y)
        self.mean_x = np.asarray(solution.mean_x)
        self.mean_y = np.asarray(solution.mean_y)


@register_model
class BrainModelDCCA(_SgdModel):
    """Deep CCA: two MLP towers trained with the cca_loss objective.

    New capability built on the reference's cca_loss (cca.py:372-443).
    After SGD training of the towers, a final linear CCA is solved on the
    tower outputs so ``apply`` returns concatenated *canonical* signals,
    exactly like BrainModelCCA (making DCCA a drop-in for downstream
    LDA/decoding).
    """

    loss_name = 'cca_pearson_correlation_first'
    metric_names = ('cca_pearson_correlation_first',)

    def __init__(self, input_dataset=None, cca_dims: int = 5,
                 hidden_units: Optional[List[int]] = None,
                 regularization_lambda: float = 1e-4,
                 tensorboard_dir: Optional[str] = None,
                 input1_width: Optional[int] = None,
                 input2_width: Optional[int] = None):
        super().__init__(tensorboard_dir)
        if hidden_units is None:
            hidden_units = [128, 64]
        if input_dataset is not None:
            spec_in, _ = input_dataset.element_spec
            input1_width = spec_in['input_1'][-1]
            input2_width = spec_in['input_2'][-1]
        self._input1_width = input1_width
        self._input2_width = input2_width
        self._cca_dims = cca_dims
        self._hidden = list(hidden_units)
        self._reg = regularization_lambda

    def config(self):
        return {'cca_dims': self._cca_dims, 'hidden_units': self._hidden,
                'regularization_lambda': self._reg,
                'input1_width': self._input1_width,
                'input2_width': self._input2_width}

    @classmethod
    def _from_config(cls, config):
        return cls(**config)

    def _tower_widths(self, input_width):
        return [input_width] + self._hidden + [self._cca_dims]

    def _init_params(self, key):
        k1, k2 = jax.random.split(key)
        dims = self._cca_dims
        return {
            'tower1': _init_mlp(k1, self._tower_widths(self._input1_width)),
            'tower2': _init_mlp(k2, self._tower_widths(self._input2_width)),
            # Final linear CCA on tower outputs (identity until fit).
            'mean1': jnp.zeros((1, dims)), 'mean2': jnp.zeros((1, dims)),
            'rot1': jnp.eye(dims), 'rot2': jnp.eye(dims),
        }

    def _params_template(self):
        return self._init_params(jax.random.PRNGKey(0))

    def _towers(self, params, input_dict):
        h1 = _apply_mlp(params['tower1'], input_dict['input_1'])
        h2 = _apply_mlp(params['tower2'], input_dict['input_2'])
        return h1, h2

    def apply(self, params, input_dict):
        h1, h2 = self._towers(params, input_dict)
        r1 = jnp.dot(h1 - params['mean1'], params['rot1'],
                     preferred_element_type=jnp.float32)
        r2 = jnp.dot(h2 - params['mean2'], params['rot2'],
                     preferred_element_type=jnp.float32)
        return jnp.concatenate([r1, r2], axis=1)

    def _loss_fn(self, params, inputs, y_true, rng=None):
        del y_true, rng  # Unsupervised: maximize canonical correlation.
        h1, h2 = self._towers(params, inputs)
        return -cca_solver.cca_loss(h1, h2, self._cca_dims,
                                    rcov1=self._reg, rcov2=self._reg)

    def fit(self, dataset, epochs: int = 20, batch_size: int = 1024,
            seed: int = 0, **kwargs):
        history = super().fit(dataset, epochs=epochs, batch_size=batch_size,
                              seed=seed, _keep_arrays=True, **kwargs)
        # Solve the closed-form CCA on the trained tower outputs so the
        # model emits canonical (whitened, ordered) dimensions — on the
        # SAME assembled arrays the towers trained on. try/finally: a
        # raise in the tower pass must not leave the corpus pinned on
        # the instance.
        try:
            in1, in2, _ = self._fit_arrays
            h1, h2 = jax.jit(self._towers)(
                self.params, {'input_1': jnp.asarray(in1),
                              'input_2': jnp.asarray(in2)})
        finally:
            self._fit_arrays = None
        solution = cca_solver.calculate_cca_parameters(
            h1, h2, dim=self._cca_dims, regularization=self._reg)
        self.params = dict(self.params,
                           mean1=solution.mean_x, mean2=solution.mean_y,
                           rot1=solution.rot_x, rot2=solution.rot_y)
        self.eigenvalues = np.asarray(solution.eigenvalues)
        return history

    def fit_streaming(self, brain_data, mode: str = 'train',
                      epochs: int = 20, batch_size: int = 1024,
                      seed: int = 0, **kwargs):
        """Bounded-memory DCCA: streaming SGD for the towers, then the
        final closed-form CCA solved from STREAMED MomentStats of the
        tower outputs (cca_dims-wide, so the stats are tiny) — the
        corpus is never concatenated."""
        history = super().fit_streaming(brain_data, mode, epochs=epochs,
                                        batch_size=batch_size,
                                        seed=seed, **kwargs)
        from telluride_decoding_tpu.ops import covariance
        from telluride_decoding_tpu.ops.covariance import (
            moments_from_arrays)
        if not hasattr(self, '_tower_moments_jit'):
            @jax.jit
            def _tower_moments(params, x1, x2, valid):
                h1, h2 = self._towers(
                    params, {'input_1': x1, 'input_2': x2})
                m = valid[:, None]
                stats = moments_from_arrays(h1 * m, h2 * m,
                                            want_syy=True)
                return stats._replace(count=jnp.sum(valid))
            self._tower_moments_jit = _tower_moments
        bucket = 4096
        total = None
        for _, (in1, in2, _, _) in brain_data.iter_file_arrays(mode):
            n = min(in1.shape[0], in2.shape[0])
            (x1, x2), valid = covariance.pad_to_bucket(
                [in1, in2], n, bucket)
            stats = self._tower_moments_jit(
                self.params, jnp.asarray(x1), jnp.asarray(x2),
                jnp.asarray(valid))
            total = stats if total is None else total + stats
        solution = cca_solver.solve_cca_from_moments(
            total, dim=self._cca_dims, regularization=self._reg)
        self.params = dict(self.params,
                           mean1=solution.mean_x, mean2=solution.mean_y,
                           rot1=solution.rot_x, rot2=solution.rot_y)
        self.eigenvalues = np.asarray(solution.eigenvalues)
        return history
