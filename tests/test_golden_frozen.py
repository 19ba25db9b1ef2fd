"""Golden replication through the reference's frozen trained model.

The codelab's load-bearing quality numbers (corr 0.1702, d' 1.5728,
reference doc/DecodingCodelab.md:654-670) need the real jens corpus,
which is unavailable offline. This harness closes the quality-parity
loop the offline environment allows: the reference's actual frozen
SavedModel (test_data/linear_model, trained by the reference's own
pipeline) is migrated WITHOUT TensorFlow and driven through the full
infer harness — decoder creation, LDA training with the
train_lda_model class ordering (class 0 = unattended,
reference decoding.py:472-478), batched window evaluation, WTA
attention decisions, window accuracy — on synthetic two-speaker data
derived from the model's own predictions. Results are pinned against
stored goldens (tests/goldens/frozen_linear_model.json, mean +/- 4
sigma over 5 seeds) via the stats-bounds harness, so ANY numeric drift
in the snappy/SSTable/TensorBundle readers, the weight migration, or
the decode pipeline fails loudly.
"""

import os

import numpy as np
import pytest

from telluride_decoding_tpu.cli import infer as cli_infer
from telluride_decoding_tpu.data import brain_data, records
from telluride_decoding_tpu.decode import infer_decoder
from telluride_decoding_tpu.models.migrate import load_reference_saved_model
from telluride_decoding_tpu.ops.lagstack import lag_stack_np
from telluride_decoding_tpu.utils.stats_bounds import GoldenResults

FIXTURE = '/root/reference/test_data/linear_model'
GOLDENS = os.path.join(os.path.dirname(__file__), 'goldens',
                       'frozen_linear_model.json')


@pytest.fixture(scope='module')
def frozen_model():
    if not os.path.isdir(FIXTURE):
        pytest.skip('frozen SavedModel fixture missing')
    return load_reference_saved_model(FIXTURE)


def _make_trial(model, seed, n, switch_frac):
    """Two-speaker data the frozen model can decode: the attended
    loudness is the model's own prediction of the (lagged) EEG plus
    noise; the unattended stream is independent."""
    rng = np.random.RandomState(seed)
    eeg = rng.randn(n, 44).astype(np.float32)
    lagged = lag_stack_np(eeg, 0, 30)    # Metadata: pre 0, post 30.
    pred = np.asarray(model({'input_1': lagged}), np.float32)
    s = float(pred.std())
    decodable = pred + 0.3 * s * rng.randn(n, 1).astype(np.float32)
    d1 = s * rng.randn(n, 1).astype(np.float32)
    d2 = s * rng.randn(n, 1).astype(np.float32)
    attend = np.zeros((n, 1), np.float32)
    k = int(n * switch_frac)
    if k < n:
        attend[k:] = 1.0                 # 0 = speaker 1 attended.
    return {
        'eeg': eeg,
        'loudness': np.where(attend == 0, decodable, d1).astype(np.float32),
        'loudness2': np.where(attend == 1, decodable, d2).astype(np.float32),
        'attend': attend,
    }


def _speaker_data(tf_dir, audio_label):
    # The frozen signature expects input_2 [., 44] (it was trained with
    # input2_field=eeg); the linear decoder never consumes it.
    return brain_data.TFExampleData(
        'eeg', audio_label, 100, pre_context=0, post_context=30,
        in2_fields='eeg', attended_field='attend', final_batch_size=200,
        repeat_count=1, shuffle_buffer_size=0, data_dir=tf_dir,
        train_file_pattern='trial01', validate_file_pattern='',
        test_file_pattern='trial02')


class TestFrozenModelGoldens:

    def test_full_harness_within_golden_bounds(self, frozen_model,
                                               tmp_path):
        model_dir = str(tmp_path / 'model')
        tf_dir = str(tmp_path / 'tf')
        os.makedirs(tf_dir)
        frozen_model.save(model_dir)

        seed = 2026
        records.convert_data_to_tfrecords(
            _make_trial(frozen_model, seed, 4000, 1.1),
            os.path.join(tf_dir, 'trial01.tfrecords'))
        records.convert_data_to_tfrecords(
            _make_trial(frozen_model, seed + 1, 4000, 0.6),
            os.path.join(tf_dir, 'trial02.tfrecords'))

        bd1 = _speaker_data(tf_dir, 'loudness')
        bd2 = _speaker_data(tf_dir, 'loudness2')
        dec = infer_decoder.create_decoder(model_dir, reduction='lda')
        dec.load_decoding_model(model_dir)
        dec.check_model_and_data(bd1.create_dataset('train'))
        # train_lda_model ordering: class 0 = unattended (speaker 2
        # during the training trial), class 1 = attended.
        dprime = dec.train(bd2.create_dataset('train'),
                           bd1.create_dataset('train'))

        golden = GoldenResults(GOLDENS)
        assert golden.check('frozen_linear_dprime', dprime) is not None

        bd1_test = bd1.create_dataset('program_test')
        bd2_test = bd2.create_dataset('program_test')
        for w, name in ((100, 'frozen_linear_accuracy_w100'),
                        (400, 'frozen_linear_accuracy_w400')):
            d1, _ = cli_infer.regress_and_correlate(dec, bd1_test, w)
            d2, labels = cli_infer.regress_and_correlate(dec, bd2_test, w)
            d1 = np.asarray(d1)
            d2 = np.asarray(d2)
            labels = np.asarray(labels).reshape(-1, 1)
            att_to_1 = (d1 > d2).reshape(-1, 1)
            acc = float(np.logical_xor(att_to_1, labels).mean())
            assert golden.check(name, acc) is not None
            assert acc > 0.95
            if w == 100:
                score = float(d1[labels[:, 0] < 0.5].mean())
                assert golden.check(
                    'frozen_linear_attended_lda_score_w100',
                    score) is not None

    def test_raw_correlation_polarity(self, frozen_model, tmp_path):
        """With reduction='first' the attended-window correlation of the
        frozen model's predictions is near-perfect and the unattended
        near zero (drift here means the decode path broke)."""
        tf_dir = str(tmp_path / 'tf')
        model_dir = str(tmp_path / 'model')
        os.makedirs(tf_dir)
        frozen_model.save(model_dir)
        records.convert_data_to_tfrecords(
            _make_trial(frozen_model, 1, 4000, 1.1),
            os.path.join(tf_dir, 'trial01.tfrecords'))
        records.convert_data_to_tfrecords(
            _make_trial(frozen_model, 2, 4000, 0.6),
            os.path.join(tf_dir, 'trial02.tfrecords'))
        bd1 = _speaker_data(tf_dir, 'loudness')
        dec = infer_decoder.create_decoder(model_dir, reduction='first')
        dec.load_decoding_model(model_dir)
        dec.train(_speaker_data(tf_dir, 'loudness2')
                  .create_dataset('train'),
                  bd1.create_dataset('train'))
        d1, labels = cli_infer.regress_and_correlate(
            dec, bd1.create_dataset('program_test'), 100)
        d1 = np.asarray(d1)
        labels = np.asarray(labels)
        attended = d1[labels < 0.5].mean()
        unattended = d1[labels >= 0.5].mean()
        assert attended > 0.9
        assert abs(unattended) < 0.15
