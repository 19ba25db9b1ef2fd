"""End-to-end demo: simulate -> ingest -> train -> sweep -> stream.

Runs the whole framework on synthetic two-speaker data in a temp
directory (no downloads needed):

  1. simulate a TRF subject: EEG = speech envelope through random
     impulse responses, two speakers, attention switches;
  2. ingest trials to TFRecords through BrainExperiment;
  3. train a linear decoder + LDA stage with the decoding driver;
  4. cross-validate a lambda grid with the one-program sweep engine;
  5. stream windowed attention decisions with the state-space decoder.

    python examples/full_pipeline.py [workdir]
"""

import os
import sys
import tempfile

import numpy as np

try:
    import telluride_decoding_tpu  # noqa: F401
except ModuleNotFoundError:
    # Running from a source checkout without installation.
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

FRAME_RATE = 100.0
NUM_CHANNELS = 8
IR_FRAMES = 25


def simulate_subject(rng, num_trials=4, frames=3000):
    """Per-trial two-speaker data with a mid-trial attention switch."""
    t = np.arange(IR_FRAMES) / FRAME_RATE
    irs = (np.random.RandomState(7).randn(NUM_CHANNELS, IR_FRAMES) *
           (30 * t * np.exp(-30 * t))).astype(np.float32)

    def speech(n):
        raw = np.abs(rng.randn(n // 10 + 2))
        idx = np.linspace(0, raw.shape[0] - 1.001, n)
        low = idx.astype(int)
        frac = idx - low
        return ((1 - frac) * raw[low] +
                frac * raw[low + 1]).astype(np.float32)

    trials = []
    for k in range(num_trials):
        s1 = speech(frames)
        s2 = speech(frames)
        labels = np.zeros((frames, 1), np.float32)
        if k == num_trials - 1:          # Test trial: switch halfway.
            labels[frames // 2:] = 1.0
        attended = np.where(labels[:, 0] == 0, s1, s2)
        eeg = np.stack(
            [np.convolve(attended, irs[c], 'full')[:frames]
             for c in range(NUM_CHANNELS)], axis=1).astype(np.float32)
        eeg += 0.1 * rng.randn(*eeg.shape).astype(np.float32)
        trials.append((s1, s2, labels, eeg))
    return trials


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix='tdt_demo_')
    records_dir = os.path.join(workdir, 'records')
    model_dir = os.path.join(workdir, 'model')
    rng = np.random.RandomState(0)

    # -- 1+2: simulate and ingest ------------------------------------------
    from telluride_decoding_tpu.io import (BrainExperiment,
                                           MemoryBrainDataFile)
    trials = simulate_subject(rng)
    trial_dict = {}
    for k, (s1, s2, labels, eeg) in enumerate(trials):
        name = ('test_%02d' if k == len(trials) - 1 else
                'train_%02d') % k
        trial_dict[name] = [
            {'loudness': s1[:, None], 'loudness2': s2[:, None],
             'attend': labels},
            MemoryBrainDataFile({'eeg_data': eeg}, sr=FRAME_RATE)]
    exp = BrainExperiment(trial_dict, frame_rate=FRAME_RATE)
    exp.load_all_data()
    for trial in exp.iterate_trials():
        trial.assemble_brain_data('eeg_data')
    files = exp.write_all_data(records_dir)
    print('ingested %d trials -> %s' % (len(files), records_dir))

    # -- 3: train via the decoding driver -----------------------------------
    from telluride_decoding_tpu.cli import decoding
    flags = decoding.DecodingOptions().set_from_dict(dict(
        tfexample_dir=records_dir, input_field='eeg',
        output_field='loudness', attended_field='attend',
        frame_rate=FRAME_RATE, pre_context=0,
        post_context=IR_FRAMES - 1,
        dnn_regressor='linear', regularization_lambda=1e-3,
        batch_size=200, shuffle_buffer_size=0,
        train_file_pattern='train', validate_file_pattern='test',
        test_file_pattern='test',
        summary_dir=os.path.join(workdir, 'summary'),
        saved_model_dir=model_dir))
    _, test_results, dprime = decoding.run_decoding_experiment(flags)
    print('decoder: r=%.3f  dprime=%.2f' %
          (test_results['pearson_correlation_first'], dprime))

    # -- 4: lambda sweep in one program --------------------------------------
    from telluride_decoding_tpu.cli import regression
    obj = regression.RegressionLinear(flags)
    obj.my_flags.post_context = IR_FRAMES - 1
    obj.my_flags.output_field = 'loudness'
    results = obj.jackknife_over_regularizations(
        flags, np.logspace(-6, 1, 8),
        summary_base_dir=os.path.join(workdir, 'sweep'))
    best = max(results.items(), key=lambda kv: kv[1][0])
    print('sweep: best lambda=%.2g (r=%.3f over %d-file jackknife)' %
          (best[0], best[1][0], len(files)))

    # -- 5: streaming attention decisions -------------------------------------
    from telluride_decoding_tpu.cli import infer
    accuracy = infer.run_reduction_test(
        model_dir, records_dir, ['train'], ['test'],
        reduction='lda', decoder_type='ssd',
        audio_label_1='loudness', audio_label_2='loudness2',
        window_list=[100, 200])
    print('streaming attention accuracy (ssd): %s' % accuracy)
    print('artifacts in %s' % workdir)


if __name__ == '__main__':
    main()
