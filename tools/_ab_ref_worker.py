"""Subprocess worker that drives the LIVE TensorFlow reference.

Executed by tools/ab_reference.py in a clean environment
(TF_USE_LEGACY_KERAS=1, no JAX) with the reference package
(/root/reference by default) on sys.path. Mirrors the reference's
run_decoding_experiment body (reference decoding.py:485-577) while
keeping handles to the dataset and model so it can additionally:

  * re-train the LDA stage under several TF seeds (d' samples for the
    +/-4 sigma statistical-bound comparison);
  * dump the trained model's weights and its predictions on the first
    ordered test batch (weight-level and prediction-level parity, and
    live validation of the rebuild's SavedModel migration reader).

Input: argv[1] = JSON config file with keys
  reference_path: str        directory containing telluride_decoding/
  flags: dict                DecodingOptions overrides
  seed: int                  tf.random seed before the experiment
  dprime_seeds: [int]        extra train_lda_model runs, one per seed
  out_json: str              where to write the result summary
  dump_npz: str|null         where to dump weights/predictions

This file intentionally has no dependency on telluride_decoding_tpu:
it runs in the reference's world.
"""

import json
import sys


def main(config_path: str) -> None:
    with open(config_path) as f:
        config = json.load(f)

    sys.path.insert(0, config['reference_path'])

    import numpy as np
    import tensorflow as tf

    from telluride_decoding import brain_data
    from telluride_decoding import decoding

    tf.random.set_seed(config.get('seed', 0))
    np.random.seed(config.get('seed', 0))

    if config.get('mode') == 'infer':
        return _run_infer(config)
    if config.get('mode') == 'regression':
        return _run_regression(config)

    my_flags = decoding.DecodingOptions().set_from_dict(config['flags'])

    if (my_flags.dnn_regressor == 'classifier' and
            isinstance(my_flags.hidden_units, str)):
        # FINDING (documented in docs/ab_report.md): the reference's
        # create_brain_model passes the raw hidden_units STRING to
        # BrainModelClassifier (reference decoding.py:291-295), whose
        # ctor requires a list (brain_model.py:578-580 raises
        # TypeError) — the reference driver cannot build its own
        # classifier. Minimal fix, mirroring the conversion the
        # 'fullyconnected' branch does a few lines up
        # (decoding.py:283-287): hand the options object the parsed
        # list (attrs does not re-validate assignment), so the
        # reference's own code runs otherwise untouched.
        my_flags.hidden_units = (
            [int(x) for x in my_flags.hidden_units.split('-')]
            if my_flags.hidden_units else [])

    # --- mirror of run_decoding_experiment (decoding.py:485-577) ---
    if (my_flags.pre_context + 1 + my_flags.post_context <
            my_flags.min_context):
        my_flags.post_context = (my_flags.min_context -
                                 (my_flags.pre_context + 1))
    if not my_flags.summary_dir.endswith('/'):
        my_flags.summary_dir = my_flags.summary_dir + '/'

    test_brain_data = brain_data.create_brain_dataset(
        my_flags.data, my_flags.input_field, my_flags.output_field,
        attended_field=my_flags.attended_field,
        frame_rate=my_flags.frame_rate,
        pre_context=my_flags.pre_context,
        post_context=my_flags.post_context,
        in2_fields=my_flags.input2_field,
        in2_pre_context=my_flags.input2_pre_context,
        in2_post_context=my_flags.input2_post_context,
        input_offset=my_flags.input_offset,
        final_batch_size=my_flags.batch_size,
        shuffle_buffer_size=my_flags.shuffle_buffer_size,
        data_dir=my_flags.tfexample_dir,
        data_pattern=my_flags.tfexample_pattern,
        train_file_pattern=my_flags.train_file_pattern,
        validate_file_pattern=my_flags.validate_file_pattern,
        test_file_pattern=my_flags.test_file_pattern)

    some_dataset = test_brain_data.create_dataset('train')
    test_model = decoding.create_brain_model(my_flags, some_dataset)
    train_results, test_results = decoding.train_and_test(
        my_flags, test_brain_data, test_model,
        epochs=my_flags.epoch_count)
    import attr
    test_model.add_metadata(attr.asdict(my_flags), dataset=some_dataset)

    dprimes = []
    first_decoder = None
    if config.get('skip_lda'):
        # The LDA stage is skipped for families the reference's
        # create_decoder cannot build (classifier) and for the
        # learning-regime A/B where d' is not the comparison target.
        dprimes = [0.0]
    else:
        for lda_seed in ([config.get('seed', 0)] +
                         list(config.get('dprime_seeds', []))):
            tf.random.set_seed(lda_seed)
            dprime, decoder = decoding.train_lda_model(
                test_brain_data, test_model, my_flags)
            dprimes.append(float(dprime))
            if first_decoder is None:
                first_decoder = decoder

    if my_flags.summary_dir:
        decoding.write_experiment_summary(
            my_flags, train_results, test_results, dprimes[0])

    if my_flags.saved_model_dir:
        test_model.save(my_flags.saved_model_dir)
        if first_decoder is not None:
            first_decoder.save_parameters(
                my_flags.saved_model_dir + '/decoder_model.json')

    if config.get('dump_npz'):
        # First ordered drop-remainder test batch ('program_test' never
        # shuffles, reference brain_data.py:358-359) — a deterministic
        # probe batch for cross-framework prediction parity.
        probe = test_brain_data.create_dataset('program_test')
        x1 = None
        for inputs, y in probe.take(1):
            x1 = inputs['input_1'].numpy()
            x2 = inputs['input_2'].numpy()
            att = inputs['attended_speaker'].numpy()
            y = y.numpy()
        if x1 is None:
            # drop_remainder yields ZERO batches when the test split
            # is shorter than batch_size — name the cause instead of
            # dying with a NameError below.
            raise ValueError(
                'probe dump: the drop-remainder test split produced '
                'no batches (test split shorter than batch_size=%d?)'
                % my_flags.batch_size)
        pred = test_model.predict(
            {'input_1': x1, 'input_2': x2, 'attended_speaker': att},
            verbose=0)
        arrays = {'x1': x1, 'x2': x2, 'attended': att, 'y': y,
                  'pred': np.asarray(pred)}
        for i, wt in enumerate(test_model.weights):
            arrays['weight_%d' % i] = wt.numpy()
        np.savez(config['dump_npz'], **arrays)

    def plain(d):
        if hasattr(d, 'history'):    # Keras History (SGD model fits).
            d = {k: v[-1] for k, v in d.history.items() if v}
        try:
            d = dict(d)
        except TypeError:
            return {}
        # Strings FIRST: np.isscalar('s') is True, so the isscalar
        # branch would route them into float() and raise.
        return {k: (str(v) if isinstance(v, (str, bytes))
                    else float(v) if np.isscalar(v) or hasattr(v, 'item')
                    else str(v)) for k, v in d.items()}

    with open(config['out_json'], 'w') as f:
        json.dump({
            'train_results': plain(train_results or {}),
            'test_results': plain(test_results or {}),
            'dprime': dprimes[0],
            'dprimes': dprimes,
            'summary_dir': my_flags.summary_dir,
            'n_weights': len(test_model.weights),
        }, f, indent=1)


def _run_infer(config) -> None:
    """Drives the reference's streaming-inference harness
    (reference infer.py:327-464): window-size sweep of attention
    accuracies on a trained model + two-speaker TFRecords."""
    import matplotlib
    matplotlib.use('agg')
    from absl import flags
    from telluride_decoding import brain_model
    from telluride_decoding import cca
    from telluride_decoding import infer
    from telluride_decoding import infer_decoder

    # run_reduction_test reads module flags (frame_rate,
    # save_results_csv, decoder); mark them parsed with defaults.
    flags.FLAGS(['_ab_ref_worker'])

    # FINDING (documented in docs/ab_report.md): the reference's
    # infer.load_model custom-object dict (infer.py:286-291) omits
    # pearson_correlation_first/_second, so under TF 2.21 + legacy
    # tf_keras the reference CANNOT load its own freshly-trained
    # linear model (MeanMetricWrapper revival fails). Patch in the
    # complete dict — the minimal fix the reference itself needs —
    # and keep the rest of its stack untouched.
    def fixed_load_model(model_dir, reducer):
        model_object = infer_decoder.create_decoder(
            model_dir.lower(), reduction=reducer)
        object_dict = {
            'pearson_correlation': brain_model.pearson_correlation,
            'pearson_correlation_first':
                brain_model.pearson_correlation_first,
            'pearson_correlation_second':
                brain_model.pearson_correlation_second,
            'BrainCcaLayer': cca.BrainCcaLayer,
            'cca_pearson_correlation_first':
                cca.cca_pearson_correlation_first,
        }
        model_object.load_decoding_model(model_dir, object_dict)
        import os
        param_file = os.path.join(model_dir, 'decoder_model.json')
        model_object.restore_parameters(param_file)
        return model_object

    infer.load_model = fixed_load_model

    results = infer.run_reduction_test(
        config['model_dir'], config['tf_dir'],
        config['train_files'], config['test_files'],
        config['reduction'], config['decoder_type'],
        config['audio_label_1'], config['audio_label_2'],
        plot_dir=None)
    with open(config['out_json'], 'w') as f:
        json.dump({'window_accuracy': {str(k): float(v)
                                       for k, v in results.items()}},
                  f, indent=1)


def _run_regression(config) -> None:
    """Drives the reference's jackknife sweep
    (reference regression.py:327-420): the full (lambda x held-out
    file) grid, serially re-training per cell as the reference does."""
    import matplotlib
    matplotlib.use('agg')
    from absl import flags
    from telluride_decoding import decoding
    from telluride_decoding import regression

    flags.FLAGS(['_ab_ref_worker'])
    my_flags = decoding.DecodingOptions().set_from_dict(config['flags'])
    reg = regression.Regression(my_flags)
    results = reg.jackknife_over_regularizations(
        my_flags, list(config['lambdas']),
        summary_base_dir=config['summary_base_dir'])
    with open(config['out_json'], 'w') as f:
        json.dump({'jackknife': {str(k): [float(v[0]), float(v[1])]
                                 for k, v in results.items()}},
                  f, indent=1)


if __name__ == '__main__':
    main(sys.argv[1])
