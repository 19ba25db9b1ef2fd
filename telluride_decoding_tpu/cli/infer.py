"""Streaming inference driver: attention-switch evaluation over windows.

Capability parity with the reference infer.py (flags :61-106,
create_brain_data :109-170, calculate_time_axis :175-196,
get_data_for_model :202-244, regress_and_correlate :247-266,
load_model :269-298, find_first_segment :301-324, run_reduction_test
:327-464, run_comparison_test :467-525). Window sizes are swept over
[10, 100, 200, 400, 700, 1000] frames; window accuracy comes from
XOR-ing decoder decisions with the embedded attention labels.
"""

from __future__ import annotations

import collections
import numbers
import os
from typing import Dict, List, Optional, Tuple, Union

from absl import app
from absl import flags
from absl import logging

import numpy as np

from telluride_decoding_tpu.data import brain_data
from telluride_decoding_tpu.decide import attention_decoder
from telluride_decoding_tpu.decode import infer_decoder

FLAGS = flags.FLAGS

allowable_decoder_types = ['wta', 'stepped', 'ssd']

WINDOW_LIST = [10, 100, 200, 400, 700, 1000]


def define_flags():
    if 'window_width' in FLAGS:
        return
    flags.DEFINE_string('tf_dir', None,
                        'Location of the data for evaluation.')
    flags.DEFINE_string('model_dir', None,
                        'Location of the saved BrainModel')
    flags.DEFINE_string('plot_dir', None, 'Where to store result plots')
    flags.DEFINE_string('save_results_csv', None,
                        'Path to results csv file')
    flags.DEFINE_multi_string('train_files', [],
                              'Training files for the decoding test.')
    flags.DEFINE_multi_string('test_files', [],
                              'Testing files for performance evaluation.')
    flags.DEFINE_integer('window_width', 1000,
                         'Frames of data per correlation estimate.')
    flags.DEFINE_integer('window_step', 500,
                         'Frames to step the correlation window.')
    flags.DEFINE_float('window_overlap', 0.5,
                       'Factor of window width for overlapping windows.')
    if 'frame_rate' not in FLAGS:
        flags.DEFINE_float('frame_rate', 100,
                           'EEG and audio frame rates in Hz.')
    flags.DEFINE_enum('reduction', 'lda',
                      ['first', 'second', 'lda', 'mean', 'mean-squared',
                       'all'],
                      'How to reduce decoder dimensionality to a scalar.')
    flags.DEFINE_enum('decoder', 'wta', allowable_decoder_types,
                      'How to summarize multiple correlation windows.')
    flags.DEFINE_bool('window_test', False,
                      'Run a test with different window sizes')
    flags.DEFINE_bool('comparison_test', False,
                      'Run a test with all decoders and infers')
    flags.DEFINE_string('audio_label', 'loudness',
                        'TFRecord field containing the audio signal. The '
                        'second speaker is this label with 2 appended.')


def create_brain_data(tf_dir: str, train_files, test_files,
                      params: Dict, audio_label: str
                      ) -> brain_data.BrainData:
    """Two-speaker dataset builder (reference infer.py:109-170);
    shuffle is disabled so test windows stay in temporal order."""
    if isinstance(train_files, str):
        train_files = [train_files]
    train_file_re = '|'.join(train_files)
    if isinstance(test_files, str):
        test_files = [test_files]
    test_file_re = '|'.join(test_files)
    attended = params.get('attended_field', 'attend') or 'attend'
    return brain_data.TFExampleData(
        params['input_field'],
        audio_label,
        100,
        pre_context=params['pre_context'],
        post_context=params['post_context'],
        in2_fields=audio_label,
        in2_pre_context=params['input2_pre_context'],
        in2_post_context=params['input2_post_context'],
        attended_field=attended,
        final_batch_size=200,
        repeat_count=1,
        shuffle_buffer_size=0,
        data_dir=tf_dir,
        data_pattern='',
        train_file_pattern=train_file_re,
        validate_file_pattern='',
        test_file_pattern=test_file_re)


def calculate_time_axis(data, window_step: int, window_width: int,
                        frame_rate: float) -> np.ndarray:
    """Window-center times in minutes for a windowed signal."""
    if isinstance(data, numbers.Number):
        num_points = int(data)
    elif isinstance(data, list):
        num_points = len(data)
    elif isinstance(data, np.ndarray):
        num_points = data.shape[0]
    else:
        raise TypeError('Unknown type passed as input argument.')
    return ((np.arange(num_points) * window_step + window_width / 2.0) /
            frame_rate / 60.0)


def get_data_for_model(tf_dir: str, train_files, test_files,
                       model_object: infer_decoder.Decoder,
                       audio_label_1: str, audio_label_2: str,
                       include_train: bool = True):
    """Train/test datasets for both speakers, checked against the model.

    include_train=False skips materializing the training corpora (a
    pretrained decoder never touches them; the default train pattern
    matches EVERY file, so eagerly decoding + context-stacking both
    speakers' full training sets costs GBs of host memory and minutes
    for nothing on inference-only runs).
    """
    brain_data_1 = create_brain_data(tf_dir, train_files, test_files,
                                     model_object.decoding_model_params,
                                     audio_label_1)
    brain_data_2 = create_brain_data(tf_dir, train_files, test_files,
                                     model_object.decoding_model_params,
                                     audio_label_2)
    bd1_test = brain_data_1.create_dataset(mode='program_test')
    bd2_test = brain_data_2.create_dataset(mode='program_test')
    model_object.check_model_and_data(bd1_test)
    model_object.check_model_and_data(bd2_test)
    bd1_train = bd2_train = None
    if include_train:
        bd1_train = brain_data_1.create_dataset(mode='train')
        bd2_train = brain_data_2.create_dataset(mode='train')
        model_object.check_model_and_data(bd1_train)
        model_object.check_model_and_data(bd2_train)
    return bd1_train, bd1_test, bd2_train, bd2_test


def regress_and_correlate(model_object: infer_decoder.Decoder, test_data,
                          window_size: int
                          ) -> Tuple[List[float], List[float]]:
    """Mean decoder score and mean label per analysis window.

    Runs the batched window evaluation (one device program for the
    whole dataset) — equivalent to iterating test_by_window and
    averaging each window, without the per-window host loop.
    """
    scores, labels = model_object.test_by_window_means(test_data,
                                                       window_size)
    return [float(s) for s in scores], [float(l) for l in labels]


def load_model(model_dir: str, reducer: str) -> infer_decoder.Decoder:
    """Loads the saved model + decoder params from a model directory."""
    model_object = infer_decoder.create_decoder(model_dir,
                                                reduction=reducer)
    model_object.load_decoding_model(model_dir)
    decoder_param_filename = os.path.join(model_dir, 'decoder_model.json')
    if os.path.exists(decoder_param_filename):
        model_object.restore_parameters(decoder_param_filename)
    else:
        raise IOError('Can not load decoder model parameters from %s' %
                      decoder_param_filename)
    return model_object


def find_first_segment(labels) -> int:
    """Frame count of the initial constant-attention segment."""
    if isinstance(labels, list):
        labels = np.asarray(labels)
    if not isinstance(labels, np.ndarray):
        raise TypeError('Labels input must be an ndarray, not %s' %
                        type(labels))
    if labels.ndim != 1:
        raise TypeError('Labels input must be one-dimensional, not %s' %
                        str(labels.shape))
    end_section = np.nonzero(np.logical_xor(labels, labels[0]))
    if end_section[0].shape[0]:
        return int(end_section[0][0])
    return 0


def run_reduction_test(model_dir: str, tf_dir: str, train_files,
                       test_files, reduction: str, decoder_type: str,
                       audio_label_1: str, audio_label_2: str,
                       plot_dir: Optional[str] = None,
                       frame_rate: float = 100.0,
                       window_list: Optional[List[int]] = None,
                       save_results_csv: Optional[str] = None
                       ) -> Dict[int, float]:
    """One full window-size sweep for a (reduction, decoder) pair."""
    model_object = load_model(model_dir, reduction)
    needs_train = not model_object.correlation_params.count
    bd1_train, bd1_test, bd2_train, bd2_test = get_data_for_model(
        tf_dir, train_files, test_files, model_object,
        audio_label_1, audio_label_2, include_train=needs_train)

    if needs_train:
        model_object.train(bd1_train, bd2_train)

    # Per-frame scores are window-size INDEPENDENT: decode each
    # speaker's corpus once and window the shared result per size
    # (the old per-size re-decode cost 2x len(window_list) full-corpus
    # device programs instead of 2).
    s1, l1 = model_object.frame_scores(bd1_test)
    s2, l2 = model_object.frame_scores(bd2_test)
    window_list = window_list or WINDOW_LIST
    window_results = []
    for window_size in window_list:
        window_step = window_size // 2
        d1_arr, _ = infer_decoder.Decoder.window_means(s1, l1,
                                                       window_size)
        d2_arr, lab_arr = infer_decoder.Decoder.window_means(
            s2, l2, window_size)
        d1_results = [float(v) for v in d1_arr]
        d2_results = [float(v) for v in d2_arr]
        labels = [float(v) for v in lab_arr]
        decoder = attention_decoder.create_attention_decoder(
            decoder_type, window_step=window_step, frame_rate=frame_rate)
        end_first_section = find_first_segment(np.asarray(labels))
        if end_first_section:
            decoder.tune(d1_results[:end_first_section],
                         d2_results[:end_first_section])
        attention = np.array([decoder.attention(c1, c2)
                              for c1, c2 in zip(d1_results, d2_results)],
                             dtype=np.float64)
        labels_col = np.reshape(np.asarray(labels), (-1, 1))
        correct = np.logical_xor(attention[:, 0:1] >= 0.5, labels_col)
        frac_correct = float(np.sum(correct)) / float(len(correct))
        window_results.append(frac_correct)

        if plot_dir:
            import matplotlib
            matplotlib.use('Agg')
            import matplotlib.pyplot as plt
            os.makedirs(plot_dir, exist_ok=True)
            d1 = np.reshape(np.asarray(d1_results), (-1,))
            d2 = np.reshape(np.asarray(d2_results), (-1,))
            t = calculate_time_axis(d1, window_step, window_size,
                                    frame_rate)
            plt.clf()
            attention_decoder.plot_aad_results(d1, t=t, linecolor='blue')
            attention_decoder.plot_aad_results(d2, t=t, linecolor='red')
            scale = max(float(np.max(d1)), float(np.max(d2)))
            attention_decoder.plot_aad_results(
                attention[:, 0] * scale / 2.0, t=t,
                attention_flag=np.reshape(labels_col, (-1,)),
                linecolor='green',
                title='AAD Correlation %gs windows %g%% accuracy.' %
                (window_size / frame_rate, frac_correct * 100.0))
            plt.savefig(os.path.join(
                plot_dir, 'test_results_%s_%s_%05d.png' %
                (reduction, decoder_type, window_size)))

    print('Infer classification result with %s and %s: %s' %
          (reduction, decoder_type, window_results))
    if save_results_csv:
        with open(save_results_csv, 'w') as f:
            f.write('Window size,Accuracy\n')
            for wl, wr in zip(window_list, window_results):
                f.write('{},{}\n'.format(wl, wr))
    if plot_dir:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        plt.clf()
        plt.semilogx(window_list, window_results)
        plt.xlabel('Window Size (frames)')
        plt.ylabel('Fraction correct')
        plt.title('Reducing with %s, decoding with %s' %
                  (reduction, decoder_type))
        plt.savefig(os.path.join(plot_dir, 'test_results_%s_%s.png' %
                                 (reduction, decoder_type)))
    return dict(zip(window_list, window_results))


def run_comparison_test(model_dir: str, tf_dir: str, train_files,
                        test_files, audio_label: str, audio_label_2: str,
                        plot_dir: Optional[str],
                        reduction_list: List[str],
                        decoder_list: Optional[List[str]] = None,
                        window_list: Optional[List[int]] = None,
                        frame_rate: float = 100.0
                        ) -> Dict:
    """Sweeps (reduction x decoder) pairs through run_reduction_test."""
    all_results = collections.OrderedDict()
    for reduction in reduction_list:
        for decoder in decoder_list or allowable_decoder_types:
            results = run_reduction_test(
                model_dir, tf_dir, train_files, test_files, reduction,
                decoder, audio_label, audio_label_2, plot_dir,
                frame_rate=frame_rate, window_list=window_list)
            all_results[(reduction, decoder)] = results
    if plot_dir:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        plt.clf()
        for reduction_decoder, results in all_results.items():
            style = '-' if reduction_decoder[0] == 'lda' else '--'
            sizes = sorted(results.keys())
            plt.semilogx(sizes, [results[s] for s in sizes], style,
                         label='%s %s' % reduction_decoder)
        plt.xlabel('Window Size (frames)')
        plt.ylabel('Fraction correct')
        plt.legend()
        plt.savefig(os.path.join(plot_dir, 'test_results-comparison.png'))
    return all_results


def main(argv):
    if len(argv) > 1:
        raise app.UsageError('Too many command-line arguments: %s.' % argv)
    from telluride_decoding_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache)
    enable_persistent_compilation_cache()
    if FLAGS.tf_dir and not os.path.exists(FLAGS.tf_dir):
        raise app.UsageError('Can not find tf_dir: %s' % FLAGS.tf_dir)
    if not FLAGS.model_dir or not os.path.exists(FLAGS.model_dir):
        raise app.UsageError('Can not find model_dir: %s' % FLAGS.model_dir)
    if FLAGS.comparison_test:
        run_comparison_test(FLAGS.model_dir, FLAGS.tf_dir,
                            FLAGS.train_files, FLAGS.test_files,
                            FLAGS.audio_label, FLAGS.audio_label + '2',
                            FLAGS.plot_dir, reduction_list=['first', 'lda'],
                            frame_rate=FLAGS.frame_rate)
    else:
        run_reduction_test(FLAGS.model_dir, FLAGS.tf_dir,
                           FLAGS.train_files, FLAGS.test_files,
                           FLAGS.reduction, FLAGS.decoder,
                           FLAGS.audio_label, FLAGS.audio_label + '2',
                           FLAGS.plot_dir, frame_rate=FLAGS.frame_rate,
                           save_results_csv=FLAGS.save_results_csv)


define_flags()


def app_main():
    app.run(main)


if __name__ == '__main__':
    app_main()
