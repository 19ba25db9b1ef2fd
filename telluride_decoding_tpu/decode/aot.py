"""Ahead-of-time (AOT) serving artifacts: serialized StableHLO decoders.

Reference counterpart: the TF SavedModel is the reference's deployment
artifact — training saves it (reference decoding.py:571-576) and the
serving side reloads it through Keras with a custom-object scope
(reference infer_decoder.py:250-286), which drags the full Python
model zoo plus TensorFlow into every serving process. The TPU-native
equivalent exports the decoder's fused two-stream inference program
(Decoder._build_infer_pair_core: model weights, correlation statistics
and LDA parameters all baked in as compile-time constants) as
serialized StableHLO via jax.export, with a symbolic frame dimension
so one artifact serves any chunk length. Loading needs NO model
classes, no registry, and no retracing of Python code — the compiled
computation is pinned byte-for-byte, so every serving process runs the
identical program (the hermetic-deployment property SavedModel is used
for, without the TF runtime).

Artifacts are a directory:
  aot_manifest.json   widths, reduction, platforms, experiment params
  infer_pair.shlo     jax.export blob for the fused two-speaker program
  decoder_model.json  the standard wire-format decoder parameters
                      (redundant with the baked-in constants; kept so
                      downstream parity tooling can read the stats)

The serve driver auto-detects artifact directories (cli/serve.py), so
``tdt-serve --serve_model_dir <artifact>`` works unchanged. Export
with ``tdt-export-aot`` or export_decoder() below.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

MANIFEST_NAME = 'aot_manifest.json'
_BLOB_NAME = 'infer_pair.shlo'
_FORMAT_VERSION = 1


def is_aot_artifact(path: str) -> bool:
    """True when ``path`` is an exported AOT artifact directory."""
    return os.path.isfile(os.path.join(path, MANIFEST_NAME))


def export_decoder(decoder, artifact_dir: str, *,
                   platforms: Optional[Sequence[str]] = None,
                   input_widths: Optional[Tuple[int, int]] = None,
                   output_width: Optional[int] = None) -> Dict:
    """Exports a trained Decoder as an AOT serving artifact.

    Args:
      decoder: a decode.infer_decoder.Decoder whose decoding model is a
        jax pytree model (BrainModel); its correlation statistics and
        any LDA parameters must already be set (train or
        restore_parameters) — they are baked into the program.
      artifact_dir: output directory (created).
      platforms: lowering targets; defaults to ('tpu', 'cpu') so the
        same artifact serves on TPU and runs in CPU CI. Cross-platform
        lowering needs no TPU attached.
      input_widths / output_width: per-frame feature widths of
        (input_1, input_2) and the model output. Defaults come from the
        decoder's embedded telluride metadata (model_inputs /
        model_output); required explicitly when the decoder was built
        in-process without add_metadata.

    Returns:
      The manifest dict.
    """
    import jax
    from jax import export as jexport

    core = decoder._build_infer_pair_core()
    if core is None:
        raise ValueError(
            'export_decoder needs a jax pytree decoding model '
            '(BrainModel.apply + params); a plain python callable '
            'cannot be serialized.')
    if getattr(decoder, '_count', 0) == 0:
        # The artifact bakes the correlation statistics in as
        # compile-time constants; unlike a live Decoder it cannot be
        # trained after the fact, so exporting the reset-state scalars
        # (mean 0, power 1) would freeze meaningless normalization
        # into every non-LDA reduction forever. (The LDA reduction
        # already fails in _build_correlate_reduce.)
        raise ValueError(
            'export_decoder: the decoder has no correlation '
            'statistics (count == 0); train the decoder or '
            'restore_parameters first - the exported artifact bakes '
            'these statistics in permanently.')
    if input_widths is None:
        inputs = decoder.model_inputs
        if not inputs or 'input_1' not in inputs or 'input_2' not in inputs:
            raise ValueError(
                'Decoder has no embedded input metadata; pass '
                'input_widths=(w1, w2) explicitly.')
        input_widths = (int(inputs['input_1'][-1]),
                        int(inputs['input_2'][-1]))
    if output_width is None:
        if not decoder.model_output:
            raise ValueError(
                'Decoder has no embedded output metadata; pass '
                'output_width explicitly.')
        output_width = int(decoder.model_output[-1])
    if isinstance(platforms, str):
        # tuple('cpu') would iterate characters into ('c','p','u').
        platforms = (platforms,)
    platforms = tuple(platforms or ('tpu', 'cpu'))
    w1, w2 = int(input_widths[0]), int(input_widths[1])

    f32 = jax.numpy.float32
    args = (jax.ShapeDtypeStruct((1, w1), f32),
            jax.ShapeDtypeStruct((1, w2), f32),
            jax.ShapeDtypeStruct((1, w2), f32),
            jax.ShapeDtypeStruct((1, output_width), f32),
            jax.ShapeDtypeStruct((1, output_width), f32))
    # One symbolic frame count shared by every stream: chunk length is
    # a serve-time choice, and window sizes sweep at evaluation time.
    specs = jexport.symbolic_args_specs(args, ('n, _',) * 5)
    exported = jexport.export(core, platforms=list(platforms))(*specs)
    blob = exported.serialize()

    os.makedirs(artifact_dir, exist_ok=True)
    with open(os.path.join(artifact_dir, _BLOB_NAME), 'wb') as f:
        f.write(blob)
    decoder.save_parameters(os.path.join(artifact_dir,
                                         'decoder_model.json'))
    manifest = {
        'format_version': _FORMAT_VERSION,
        'program': _BLOB_NAME,
        'reduction': decoder._reduction,
        'input_1_width': w1,
        'input_2_width': w2,
        'output_width': int(output_width),
        'platforms': list(platforms),
        'model_params': decoder.decoding_model_params,
        'model_inputs': decoder.model_inputs,
        'model_output': decoder.model_output,
    }
    with open(os.path.join(artifact_dir, MANIFEST_NAME), 'w') as f:
        json.dump(manifest, f, indent=2)
    return manifest


class ExportedDecoder:
    """Serves an exported artifact with the Decoder serving interface.

    Provides exactly what the serving path consumes (cli/serve.py):
    ``infer_pair`` / ``infer_pair_async`` / ``infer_one`` plus the
    ``decoding_model_params`` metadata. Scoring state (correlation
    statistics, LDA) is already inside the compiled program; there is
    nothing to train or restore.
    """

    def __init__(self, artifact_dir: str):
        manifest_path = os.path.join(artifact_dir, MANIFEST_NAME)
        with open(manifest_path) as f:
            self._manifest = json.load(f)
        version = self._manifest.get('format_version')
        if version != _FORMAT_VERSION:
            raise ValueError('Unsupported AOT artifact version %r in %s '
                             '(this build reads version %d).'
                             % (version, manifest_path, _FORMAT_VERSION))
        blob_path = os.path.join(artifact_dir,
                                 self._manifest.get('program', _BLOB_NAME))
        with open(blob_path, 'rb') as f:
            blob = f.read()
        import jax
        from jax import export as jexport
        exported = jexport.deserialize(blob)
        # jit caches the per-shape executables across calls; the
        # symbolic frame axis means one compile per distinct chunk
        # length, same as the live Decoder.
        self._call = jax.jit(exported.call)
        self._jnp_f32 = jax.numpy.float32

    @property
    def manifest(self) -> Dict:
        return self._manifest

    @property
    def reduction(self) -> str:
        return self._manifest['reduction']

    @property
    def decoding_model_params(self) -> Dict:
        return self._manifest.get('model_params', {})

    @property
    def model_inputs(self) -> Dict:
        return self._manifest.get('model_inputs', {})

    @property
    def model_output(self) -> list:
        return self._manifest.get('model_output', [])

    def _as_f32(self, v):
        import jax.numpy as jnp
        return jnp.asarray(np.asarray(v), self._jnp_f32)

    def infer_pair(self, input_1, input_2a, input_2b, output_a,
                   output_b) -> Tuple[np.ndarray, np.ndarray]:
        sa, sb = self._call(self._as_f32(input_1), self._as_f32(input_2a),
                            self._as_f32(input_2b), self._as_f32(output_a),
                            self._as_f32(output_b))
        return np.asarray(sa), np.asarray(sb)

    def infer_pair_async(self, input_1, input_2a, input_2b, output_a,
                         output_b):
        """infer_pair without the host readback (in-flight device
        arrays; np.asarray harvests), mirroring
        Decoder.infer_pair_async for the pipelined serve loop."""
        return self._call(self._as_f32(input_1), self._as_f32(input_2a),
                          self._as_f32(input_2b), self._as_f32(output_a),
                          self._as_f32(output_b))

    def infer_one(self, input_dict, output) -> np.ndarray:
        """Single-stream scoring through the pair program (the second
        lane re-scores the same stream; XLA CSE makes the duplicate
        nearly free)."""
        sa, _ = self.infer_pair(input_dict['input_1'],
                                input_dict['input_2'],
                                input_dict['input_2'], output, output)
        return sa


def load_exported_decoder(artifact_dir: str) -> ExportedDecoder:
    """Loads an AOT artifact directory for serving."""
    return ExportedDecoder(artifact_dir)
