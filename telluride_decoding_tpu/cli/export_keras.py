"""Export a native trained model for TensorFlow/Keras consumers.

The inverse of migrate_saved_model: takes a native model directory
(model.json + weights.npz, written by tdt-decoding's
--saved_model_dir) and emits artifacts the reference's world loads
with stock TensorFlow calls — closing the loop on the reference's
save path (reference decoding.py:571-576):

  * ``<dst>.h5`` (or the given .h5 path): a Keras HDF5 model that
    ``tf.keras.models.load_model`` loads with ZERO custom objects
    (io/keras_h5.py builds the functional graph from stock layers).
  * with ``--saved-model``: a full SavedModel DIRECTORY —
    saved_model.pb + keras_metadata.pb + variables/ — the reference's
    native on-disk format, loadable by the same
    ``tf.keras.models.load_model`` call the reference uses
    (io/saved_model_pb.py; telluride metadata variables ride inside).
  * with ``--variables``: a ``variables/`` TensorBundle checkpoint
    (io/tf_checkpoint.write_tensor_bundle) carrying the weights and
    telluride metadata in the reference's fresh-checkpoint layout —
    for restoring into an existing TF model object via
    ``tf.train.load_checkpoint``.

A decoder_model.json next to the source copies through unchanged
(wire-compatible by design, reference infer_decoder.py:124).

Usage:
  python -m telluride_decoding_tpu.cli.export_keras SRC_DIR DST.h5
  python -m telluride_decoding_tpu.cli.export_keras --saved-model SRC DST_DIR
  python -m telluride_decoding_tpu.cli.export_keras --variables SRC DST
"""

from __future__ import annotations

import os
import shutil
import sys


def export(src_dir: str, dst: str, variables: bool = False,
           saved_model: bool = False) -> None:
    from telluride_decoding_tpu.models.brain_model import load_model
    model = load_model(src_dir)
    if saved_model:
        from telluride_decoding_tpu.io.saved_model_pb import (
            export_saved_model)
        export_saved_model(model, dst)
        print('Wrote SavedModel directory to %s' % dst)
        decoder_json = os.path.join(src_dir, 'decoder_model.json')
        if os.path.exists(decoder_json):
            shutil.copyfile(decoder_json,
                            os.path.join(dst, 'decoder_model.json'))
            print('Copied decoder parameters into %s' % dst)
        return
    if variables:
        from telluride_decoding_tpu.io.keras_h5 import (
            export_saved_model_variables)
        export_saved_model_variables(model,
                                     os.path.join(dst, 'variables'))
        print('Wrote TensorBundle checkpoint to %s/variables' % dst)
        decoder_json = os.path.join(src_dir, 'decoder_model.json')
        if os.path.exists(decoder_json):
            shutil.copyfile(decoder_json,
                            os.path.join(dst, 'decoder_model.json'))
        return
    from telluride_decoding_tpu.io.keras_h5 import export_keras_h5
    export_keras_h5(model, dst)
    print('Wrote Keras H5 model to %s' % dst)
    decoder_json = os.path.join(src_dir, 'decoder_model.json')
    if os.path.exists(decoder_json):
        sidecar = os.path.splitext(dst)[0] + '.decoder_model.json'
        shutil.copyfile(decoder_json, sidecar)
        print('Copied decoder parameters to %s' % sidecar)


def app_main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    variables = '--variables' in argv
    if variables:
        argv.remove('--variables')
    saved_model = '--saved-model' in argv
    if saved_model:
        argv.remove('--saved-model')
    if len(argv) != 2 or (variables and saved_model):
        raise SystemExit(
            'usage: export_keras [--saved-model | --variables] '
            'SRC_MODEL_DIR DST\n'
            '  DST is a .h5 path (default) or a directory '
            '(--saved-model / --variables).')
    src, dst = argv
    if not os.path.exists(os.path.join(src, 'model.json')):
        raise SystemExit('%s does not look like a native model '
                         'directory (no model.json).' % src)
    if variables:
        os.makedirs(dst, exist_ok=True)
    export(src, dst, variables=variables, saved_model=saved_model)


if __name__ == '__main__':
    app_main()
