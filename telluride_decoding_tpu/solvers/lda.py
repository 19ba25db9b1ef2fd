"""Linear discriminant analysis, with 0/1 output scaling.

Capability parity with the reference scaled_lda.py: finds the linear
projection that best separates labeled classes, and (in the scaled
variant) maps the two class means exactly to 0 and 1 so the output can be
used directly as a label/probability axis.

TPU-first redesign: the reference solves the unsymmetric eigenproblem
eig(Sw^-1 Sb) (scaled_lda.py:196-197), which can produce complex
eigenvectors (hence its w_real/w_imag serialization). Here the scatter
matrices are built with one MXU pass each and the generalized symmetric
eigenproblem is solved via Cholesky whitening + eigh — all real, all on
device. The JSON parameter schema keeps the reference's re/im split
(w_imag = 0) so decoder_model.json files remain interchangeable.
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np


class LdaParams(NamedTuple):
    """Serializable LDA parameters (schema-compatible with the reference
    LdaParamsTuple, scaled_lda.py:30-33)."""

    w_real: Any
    w_imag: Any
    labels: Any
    mean_vectors: Any
    slope: Any
    intercept: Any


def _scatter_matrices(x: jnp.ndarray, onehot: jnp.ndarray):
    """Within/between class scatter from data and a [N, K] class onehot."""
    highest = jax.lax.Precision.HIGHEST
    counts = jnp.sum(onehot, axis=0)                      # [K]
    sums = jnp.matmul(onehot.T, x, precision=highest)     # [K, D]
    means = sums / counts[:, None]                        # [K, D]
    # Within-class scatter: sum_k sum_{i in k} (x - mu_k)(x - mu_k)^T
    #   = X^T X - sum_k n_k mu_k mu_k^T
    sxx = jnp.matmul(x.T, x, precision=highest)
    sw = sxx - jnp.matmul(means.T, means * counts[:, None],
                          precision=highest)
    overall = jnp.sum(sums, axis=0) / jnp.sum(counts)
    diff = means - overall[None, :]
    sb = jnp.matmul(diff.T, diff * counts[:, None], precision=highest)
    return sw, sb, means


# Distinct sample counts would each trigger a fresh XLA compile
# (5-60 s per compile through a remote TPU tunnel; LDA refits happen
# once per decoder in a cohort). Zero-padded rows with all-zero onehot
# contribute exactly nothing to counts/sums/sxx, so padding the sample
# axis to a bucket is exact and one compile serves every fit.
_LDA_SAMPLE_BUCKET = 2048


def _lda_fit_bucketed(x: jnp.ndarray, onehot: jnp.ndarray):
    n = x.shape[0]
    padded = max(-(-n // _LDA_SAMPLE_BUCKET) * _LDA_SAMPLE_BUCKET,
                 _LDA_SAMPLE_BUCKET)
    if padded != n:
        x = jnp.pad(x, ((0, padded - n), (0, 0)))
        onehot = jnp.pad(onehot, ((0, padded - n), (0, 0)))
    return _lda_fit_kernel(x, onehot)


@jax.jit
def _lda_fit_kernel(x: jnp.ndarray, onehot: jnp.ndarray):
    sw, sb, means = _scatter_matrices(x, onehot)
    d = x.shape[1]
    # Jitter keeps the Cholesky factorizable for near-singular scatter.
    jitter = 1e-6 * (jnp.trace(sw) / d + 1e-30)
    chol = jnp.linalg.cholesky(sw + jitter * jnp.eye(d, dtype=x.dtype))
    # Solve L M L^T = Sb -> M = L^-1 Sb L^-T (SPD-symmetrized problem).
    li_sb = jax.scipy.linalg.solve_triangular(chol, sb, lower=True)
    m = jax.scipy.linalg.solve_triangular(chol, li_sb.T, lower=True).T
    vals, vecs = jnp.linalg.eigh(0.5 * (m + m.T))
    # eigh is ascending; we want descending by eigenvalue magnitude.
    order = jnp.argsort(-jnp.abs(vals))
    vals = vals[order]
    vecs = vecs[:, order]
    # Back-transform: w = L^-T u.
    w = jax.scipy.linalg.solve_triangular(chol.T, vecs, lower=False)
    # Normalize columns (np.linalg.eig returns unit vectors; keeps scales
    # comparable though downstream slope fitting is scale-invariant).
    w = w / jnp.linalg.norm(w, axis=0, keepdims=True)
    return w, vals, means


class LinearDiscriminantAnalysis:
    """LDA with the reference's API: fit/transform/fit_transform."""

    def __init__(self):
        self._labels: List[Any] = []
        self._mean_vectors = []
        self._w: Optional[np.ndarray] = None
        self._eigen_vals: Optional[np.ndarray] = None

    @property
    def mean_vectors(self):
        return self._mean_vectors

    @property
    def coef_array(self):
        return self._w

    @property
    def labels(self):
        return self._labels

    @property
    def model_parameters(self) -> LdaParams:
        w = self._w
        return LdaParams(
            w_real=np.real(w) if w is not None else None,
            w_imag=np.imag(w) if w is not None else None,
            labels=self._labels,
            mean_vectors=self._mean_vectors,
            slope=None, intercept=None)

    @model_parameters.setter
    def model_parameters(self, values: LdaParams):
        self._set_parameters(values)

    def _set_parameters(self, values: LdaParams):
        values = LdaParams(*values)
        if values.w_real is not None:
            self._w = np.array(values.w_real) + 1j * np.array(values.w_imag)
            if np.all(np.imag(self._w) == 0):
                self._w = np.real(self._w)
        else:
            self._w = None
        self._labels = np.array(values.labels)
        self._mean_vectors = np.array(values.mean_vectors)

    @classmethod
    def from_fitted_data(cls, x, y) -> "LinearDiscriminantAnalysis":
        obj = cls()
        obj.fit(x, y)
        return obj

    @staticmethod
    def expand_dims(data: np.ndarray) -> np.ndarray:
        data = np.asarray(data)
        if data.ndim == 1:
            data = np.reshape(data, (-1, 1))
        return data

    def fit(self, x, y):
        x = self.expand_dims(x)
        y = np.asarray(y)
        self._labels = sorted(set(np.asarray(y).tolist()))
        onehot = np.stack([(y == label).astype(np.float32)
                           for label in self._labels], axis=1)
        w, vals, means = _lda_fit_bucketed(jnp.asarray(x, jnp.float32),
                                           jnp.asarray(onehot))
        means = np.asarray(means)
        self._mean_vectors = [means[i] for i in range(len(self._labels))]
        num_dims = x.shape[1]
        w = np.asarray(w)
        vals = np.abs(np.asarray(vals))
        if num_dims > 1:
            self._w = w[:, :2]
            self._eigen_vals = vals
        else:
            self._w = np.array([[1.0]])
            self._eigen_vals = np.ones((1,))

    def transform(self, x) -> np.ndarray:
        if self._w is None:
            raise ValueError("Must fit the model before transforming.")
        x = self.expand_dims(x)
        if np.ndim(x) != 2 or self._w.shape[0] != x.shape[1]:
            raise TypeError(
                "Inconsistent training and transform sizes. %s vs %s"
                % (x.shape, self._w.shape))
        return np.real(x.dot(self._w))

    def fit_transform(self, x, y) -> np.ndarray:
        self.fit(x, y)
        return self.transform(x)

    def explained_variance_ratio(self) -> np.ndarray:
        if self._w is None:
            raise ValueError("Must fit the model before transforming.")
        if self._eigen_vals is None:
            # A decoder restored via model_parameters carries only the
            # projection (the JSON schema has no eigenvalues); without
            # them the ratio is undefined — raise instead of
            # TypeError-ing on None / None.
            raise ValueError("Eigenvalues unavailable: this LDA was "
                             "restored from serialized parameters; "
                             "explained_variance_ratio needs a fit().")
        return self._eigen_vals / np.sum(self._eigen_vals)


class ScaledLinearDiscriminantAnalysis(LinearDiscriminantAnalysis):
    """LDA refined so the two class means map exactly to 0 and 1.

    Mirrors the reference ScaledLinearDiscriminantAnalysis
    (scaled_lda.py:249-355): after fitting the projection, a slope and
    intercept on the first LDA axis send the class means to the desired
    labels (0 and 1 by default).
    """

    def __init__(self):
        super().__init__()
        self._slope = 1.0
        self._intercept = 0.0

    @property
    def slope(self) -> float:
        return self._slope

    @property
    def intercept(self) -> float:
        return self._intercept

    @property
    def model_parameters(self) -> LdaParams:
        base = super().model_parameters
        return base._replace(slope=self._slope, intercept=self._intercept)

    @model_parameters.setter
    def model_parameters(self, values: LdaParams):
        self._set_parameters(values)

    def _set_parameters(self, values: LdaParams):
        values = LdaParams(*values)
        super()._set_parameters(values)
        self._slope = values.slope
        self._intercept = values.intercept

    def fit(self, x, y, y0: Union[float, np.ndarray] = 0,
            y1: Union[float, np.ndarray] = 1):
        x = self.expand_dims(x)
        super().fit(x, y)
        if len(self._labels) != 2:
            raise ValueError("Scaled LDA can only be done on two-class data.")
        x0 = super().transform(
            np.reshape(self._mean_vectors[0], (1, -1)))[0, 0]
        x1 = super().transform(
            np.reshape(self._mean_vectors[1], (1, -1)))[0, 0]
        if x0 == x1:
            raise ValueError(
                "X0 and X1 in Scaled LDA are identical (%g and %g)"
                % (x0, x1))
        self._slope = float((y0 - y1) / (x0 - x1))
        self._intercept = float(y0 - self._slope * x0)

    def fit_two_classes(self, class0, class1):
        """Fits from two arrays, class0 mapping to 0 and class1 to 1."""
        class0 = np.asarray(class0)
        class1 = np.asarray(class1)
        # Dim check before any shape[1] access: mixed 1-D/2-D inputs
        # must get the contract's ValueError, not an IndexError (the
        # reference's `ndim*ndim != 1 and shape[1] != shape[1]` check
        # trips exactly that on the 1-D operand).
        if class0.ndim != class1.ndim or (
                class0.ndim > 1 and class0.shape[1] != class1.shape[1]):
            raise ValueError(
                "Class 0 and Class1 must have the same number of "
                "dimensions (%s vs %s)." % (class0.shape, class1.shape))
        x = np.concatenate((class0, class1), axis=0)
        y = np.concatenate((np.zeros(class0.shape[0]),
                            np.ones(class1.shape[0])))
        self.fit(x, y)

    def transform(self, x) -> np.ndarray:
        x_lda = super().transform(x)
        return np.real(self._slope * x_lda + self._intercept)
