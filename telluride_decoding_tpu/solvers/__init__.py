"""Deterministic linear-algebra solvers (ridge, CCA, LDA) on device."""

from telluride_decoding_tpu.solvers.ridge import (
    RidgeSolution,
    solve_ridge_from_moments,
    calculate_linear_regressor_parameters,
)
from telluride_decoding_tpu.solvers.cca import (
    CcaSolution,
    solve_cca_from_moments,
    calculate_cca_parameters,
    cca_loss,
)
from telluride_decoding_tpu.solvers.lda import (
    LinearDiscriminantAnalysis,
    ScaledLinearDiscriminantAnalysis,
    LdaParams,
)
