"""Generates a codelab-scale synthetic cohort as TFRecords on disk.

Reproduces the dataset behind the STATUS/performance.md end-to-end
driver measurement: N subjects x 40 ragged trials of 69-channel EEG
with a planted 37-lag temporal response function driving the
intensity target (the jens_memory corpus geometry,
reference doc/DecodingCodelab.md:204-226, without the 3.1 GB
download this environment cannot fetch). Drive it with:

    python examples/make_synthetic_cohort.py /tmp/jens_scale 22
    python -m telluride_decoding_tpu.cli.cohort \
        --cohort_dir /tmp/jens_scale \
        --input_field eeg --output_field intensity \
        --pre_context 0 --post_context 36 \
        --regularization_list 1e-6,1e-5,1e-4,1e-3,1e-2,1e-1,1,10,100 \
        --cohort_csv_file /tmp/jens_scale_out/cohort.csv

The planted decoder recovers at r ~ 0.95 with a visible lambda
roll-off; the full 22-subject run (908 MB on disk, 7,920 model fits)
measures 34-55 s end-to-end on one TPU v5e chip.
"""

import os
import sys
import time

import numpy as np

from telluride_decoding_tpu.data import records
from telluride_decoding_tpu.ops.lagstack import lag_stack_np

TRIALS, FRAMES, CHANS, LAGS = 40, 3300, 69, 37


def make_cohort(base: str, num_subjects: int,
                trials: int = TRIALS, frames: int = FRAMES,
                chans: int = CHANS, lags: int = LAGS) -> None:
    rng0 = np.random.RandomState(0)
    w = (rng0.randn(chans * lags, 1) /
         np.sqrt(chans * lags)).astype(np.float32)
    for s in range(num_subjects):
        d = os.path.join(base, 'subj%02d' % s)
        os.makedirs(d, exist_ok=True)
        rng = np.random.RandomState(100 + s)
        for tr in range(trials):
            fr = frames - (tr % 5) * lags   # Ragged trial lengths.
            eeg = rng.randn(fr, chans).astype(np.float32)
            intensity = (lag_stack_np(eeg, 0, lags - 1) @ w +
                         0.3 * rng.randn(fr, 1).astype(np.float32))
            records.convert_data_to_tfrecords(
                {'eeg': eeg, 'intensity': intensity},
                os.path.join(d, 'trial%02d.tfrecords' % tr))


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else '/tmp/jens_scale'
    num_subjects = int(sys.argv[2]) if len(sys.argv) > 2 else 22
    t0 = time.perf_counter()
    make_cohort(base, num_subjects)
    print('%d subjects x %d trials written to %s in %.1fs'
          % (num_subjects, TRIALS, base, time.perf_counter() - t0))


if __name__ == '__main__':
    main()
