"""TPU-native auditory attention decoding (AAD) framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
google/telluride_decoding: ingest raw brain recordings, build decoding
models (ridge/TRF regression, CCA, DNN, deep CCA), decode windowed
attention likelihoods, and make attention decisions (WTA / stepped /
state-space) -- all as compiled XLA programs that scale over TPU meshes.

Subpackages
-----------
ops      : fused numeric primitives (pearson, covariance, lag-stacking)
solvers  : deterministic linear-algebra solvers (ridge, CCA, LDA)
models   : brain models (linear, CCA, DNN, classifier, DCCA)
data     : dataset assembly, TFRecord I/O (TF-free), file filtering
decode   : streaming correlation decoding + reductions + d'
decide   : attention decision (WTA, stepped, state-space)
signal   : preprocessing (IIR filters, resampling, audio features)
sweep    : mesh-parallel parameter searches (lambda grids, jackknife)
io       : raw-format ingest (EDF, BrainVision, WAV, MATLAB)
parallel : mesh/sharding utilities
cli      : command-line drivers compatible with the reference flags
utils    : results/CSV/plot helpers
"""

__version__ = "0.1.0"

_SUBPACKAGES = ('ops', 'solvers', 'models', 'data', 'decode', 'decide',
                'signal', 'io', 'sweep', 'parallel', 'cli', 'utils')


def __getattr__(name):
    """Lazy subpackage imports: `tdt.models` works without paying for
    every subpackage (and its jax imports) at package-import time."""
    if name in _SUBPACKAGES:
        import importlib
        module = importlib.import_module(
            'telluride_decoding_tpu.' + name)
        globals()[name] = module
        return module
    raise AttributeError('module %r has no attribute %r' %
                         (__name__, name))
