"""Brain models: pure-pytree JAX models with deterministic or SGD fits."""

from telluride_decoding_tpu.models.brain_model import (
    BrainModel,
    BrainModelClassifier,
    BrainModelDNN,
    BrainModelLinearRegression,
    load_model,
    register_model,
)
from telluride_decoding_tpu.models.cca import (
    BrainModelCCA,
    BrainModelDCCA,
)
from telluride_decoding_tpu.models.migrate import (
    load_reference_saved_model,
)
