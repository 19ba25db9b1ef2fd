"""Convert a reference TensorFlow SavedModel directory to native format.

The reference's trained artifact is a Keras SavedModel
(reference decoding.py:571-576). This tool reads it WITHOUT TensorFlow
(io/tf_checkpoint.py: snappy + SSTable + TensorBundle from scratch) and
writes the native model.json + weights.npz, preserving the embedded
telluride metadata; a decoder_model.json sitting next to the source is
copied through unchanged (it is wire-compatible by design).

Usage:
  python -m telluride_decoding_tpu.cli.migrate_saved_model SRC_DIR DST_DIR
"""

from __future__ import annotations

import os
import shutil
import sys


def migrate(src_dir: str, dst_dir: str) -> None:
    from telluride_decoding_tpu.models.migrate import (
        load_reference_saved_model)
    model = load_reference_saved_model(src_dir)
    model.save(dst_dir)
    decoder_json = os.path.join(src_dir, 'decoder_model.json')
    if os.path.exists(decoder_json):
        shutil.copyfile(decoder_json,
                        os.path.join(dst_dir, 'decoder_model.json'))
    print('Migrated %s -> %s' % (src_dir, dst_dir))


def app_main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2:
        raise SystemExit(
            'usage: migrate_saved_model SRC_SAVED_MODEL_DIR DST_DIR')
    src, dst = argv
    if not os.path.exists(os.path.join(src, 'saved_model.pb')):
        raise SystemExit('%s does not look like a SavedModel directory '
                         '(no saved_model.pb).' % src)
    migrate(src, dst)


if __name__ == '__main__':
    app_main()
