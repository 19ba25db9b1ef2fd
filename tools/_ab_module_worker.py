"""Subprocess worker: the reference's SUPPORT MODULES, run live.

The driver-level A/B (tools/ab_reference.py + tools/_ab_ref_worker.py)
reconciles the three CLI drivers end to end; the subsystems those
drivers do not fully exercise — ingest/z-scoring (reference
ingest.py), signal preprocessing (reference preprocess.py:81-755),
the attention decision decoders (reference attention_decoder.py),
scaled LDA (reference scaled_lda.py), the streaming result stores
(reference result_store.py), BrainVision parsing (reference
ingest_brainvision.py), the TF correlation-matrix utility (reference
utils.py), trigger injection (reference add_trigger.py), d-prime /
window averaging (reference infer_decoder.py:716-783) and CSV result
interchange (reference csv_util.py) — are A/B'd here at module level: this
worker runs the REFERENCE implementations on inputs staged in an .npz
by tools.ab_reference.run_modules_ab, in a clean subprocess (legacy-
keras TF env, no JAX hooks), and writes every output array to an .npz
the driver reconciles against this framework's outputs on the same
bytes.

pyedflib is not installed in this environment; the reference's
ingest.py imports it at module scope (ingest.py:80) but the A/B only
exercises MemoryBrainDataFile paths, so an import stub satisfies the
import without changing any behavior under test.

Input: argv[1] = JSON config with keys
  reference_path: str   directory containing telluride_decoding/
  inputs_npz: str       staged input arrays
  out_npz: str          where to write the outputs
  tf_dir: str           where the ingest task writes TFRecords

This file intentionally has no dependency on telluride_decoding_tpu:
it runs in the reference's world.
"""

import json
import sys
import types


def _stub_pyedflib() -> None:
    try:
        import pyedflib  # noqa: F401  (use the real one when present)
    except ImportError:
        stub = types.ModuleType('pyedflib')

        class _Unavailable:
            def __init__(self, *args, **kwargs):
                raise RuntimeError(
                    'pyedflib stub: EDF paths are not under A/B test.')

        stub.EdfReader = _Unavailable
        sys.modules['pyedflib'] = stub


def _stub_google3() -> None:
    """The reference's add_trigger.py imports the Google-internal
    `google3.pyglib.gfile` at module scope (reference add_trigger.py:44)
    — the module cannot even be imported in the open-source release.
    The A/B only exercises the pure-numpy event-injection math, so a
    named stub satisfies the import without changing behavior under
    test."""
    if 'google3' in sys.modules:
        return
    google3 = types.ModuleType('google3')
    pyglib = types.ModuleType('google3.pyglib')
    gfile = types.ModuleType('google3.pyglib.gfile')
    gfile.Open = open
    google3.pyglib = pyglib
    pyglib.gfile = gfile
    sys.modules['google3'] = google3
    sys.modules['google3.pyglib'] = pyglib
    sys.modules['google3.pyglib.gfile'] = gfile


def task_preprocess(inp, out, np):
    """Reference preprocess.Preprocessor/AudioFeatures on staged data
    (reference preprocess.py:81-548, 589-755)."""
    from telluride_decoding import preprocess

    eeg = inp['eeg']
    # Full-kwargs pipeline, fed in three uneven batches so the carried
    # filter/context state is under test (the streaming path).
    pp = preprocess.Preprocessor(
        'eeg', 100, 64, highpass_cutoff=2, highpass_order=4,
        lowpass_cutoff=20, lowpass_order=4, channel_numbers='0-2',
        data_mean=0.5, data_std=2.0, pre_context=2, post_context=1)
    parts = [pp.process(eeg[a:b])
             for a, b in ((0, 400), (400, 900), (900, eeg.shape[0]))]
    out['preprocess.batched'] = np.concatenate(
        [p for p in parts if p.size], axis=0)

    # Param-string grammar (reference preprocess.py:550-586), driven
    # POST-construction: the reference ctor calls init_from_string but
    # then unconditionally re-runs init_highpass/init_channel_numbers
    # with the kwarg defaults (preprocess.py:102-110), silently
    # discarding the parsed parameters — a live reference bug (the
    # rebuild's ctor honors the string). Calling init_from_string
    # directly puts the parsed grammar itself under test.
    pp2 = preprocess.Preprocessor('eeg2', 100, 100)
    pp2.init_from_string(
        100, 'eeg2(highpass_cutoff=1;highpass_order=2;'
        'channel_numbers=1-3)')
    out['preprocess.paramstring'] = pp2.process(eeg)

    # Grouped re-referencing (reference preprocess.py:407-430).
    pp3 = preprocess.Preprocessor('reref', 100, 100,
                                  ref_channels=[[0, 1], [2, 3]],
                                  channels_to_ref=[[2, 3], [0, 1]])
    out['preprocess.reref'] = pp3.process(eeg.copy())

    audio = inp['audio']
    af = preprocess.AudioFeatures('intensity', 1000, 100, window=1,
                                  exponent=float(np.log10(2)))
    out['preprocess.intensity'] = af.compute_intensity(audio)

    af2 = preprocess.AudioFeatures('loud', 1000, 64)
    out['preprocess.resampled'] = af2.audio_resample(audio)

    af3 = preprocess.AudioFeatures('spec', 16000, 100)
    spec, freqs = af3.compute_spectrogram(audio)
    out['preprocess.spectrogram'] = spec
    out['preprocess.spec_freqs'] = freqs

    # Windowed audio stores (reference preprocess_audio.py:34-49).
    from telluride_decoding import preprocess_audio
    store = preprocess_audio.AudioIntensityStore(window_step=100,
                                                 window_width=250)
    store.add_data(audio[:2000].reshape(-1, 1))
    out['preprocess.intensity_store'] = np.asarray(
        list(store.next_window()), np.float64)
    loud = preprocess_audio.AudioLoudnessMick(window_step=100,
                                              window_width=250)
    loud.add_data(audio[:2000].reshape(-1, 1))
    out['preprocess.loudness_store'] = np.asarray(
        list(loud.next_window()), np.float64)


def task_ingest(inp, out, np, tf_dir):
    """Reference BrainExperiment flow exactly as the Telluride4
    downloader drives it (reference regression_data.py:300-357):
    MemoryBrainDataFile trials -> load -> cross-trial z-score ->
    assemble -> TFRecords; plus the trigger-alignment estimators
    (reference ingest.py:168-269)."""
    _stub_pyedflib()
    # Reference bug under modern numpy: convert_data_to_tfrecords
    # tests `data.dtype == np.str` (reference ingest.py:1159), an
    # alias numpy removed in 1.24 — the reference's own ingest cannot
    # run here without this one-alias shim (recorded in
    # docs/ab_report.md alongside the infer custom-objects bug).
    if not hasattr(np, 'str'):
        np.str = str
    from telluride_decoding import ingest

    trial_dict = {}
    for t in ('trial_01', 'trial_02'):
        intensity = inp['ingest.%s.intensity' % t]
        sound_dict = {
            'intensity': intensity,
            'ones': np.ones(intensity.shape, dtype=intensity.dtype),
            'attended_speaker': np.zeros(intensity.shape,
                                         dtype=intensity.dtype),
        }
        eeg_dict = {'eeg_data': inp['ingest.%s.eeg' % t]}
        trial_dict[t] = [sound_dict,
                         ingest.MemoryBrainDataFile(eeg_dict, sr=64)]
    exp = ingest.BrainExperiment(trial_dict, '.', '.', frame_rate=64)
    exp.load_all_data()
    exp.z_score_all_data()
    for trial in exp.iterate_trials():
        trial.assemble_brain_data('eeg_data')
    exp.write_all_data(tf_dir)

    for trial in exp.iterate_trials():
        for key, value in trial.model_features.items():
            out['ingest.%s.%s' % (trial.trial_name, key)] = (
                np.asarray(value))
    for key, mean in exp._feature_mean.items():
        out['ingest.mean.%s' % key] = np.asarray(mean, np.float64)
        out['ingest.std.%s' % key] = np.asarray(exp._feature_std[key],
                                                np.float64)

    audio_t, eeg_t = inp['trig.audio'], inp['trig.eeg']
    intercept, outliers = ingest.find_temporal_offset_via_linear_regression(
        audio_t, eeg_t, verbose=False)
    out['ingest.lr'] = np.asarray([intercept, outliers], np.float64)
    out['ingest.mode'] = np.asarray(
        ingest.find_temporal_offset_via_mode_histogram(
            audio_t, eeg_t, max_time=5, fs=100.0), np.float64)
    out['ingest.close'] = np.asarray(
        ingest.remove_close_times(list(eeg_t), min_time=0.06),
        np.float64)


def task_attention(inp, out, np):
    """Reference WTA/stepped/SSD decoders on one correlation stream
    (reference attention_decoder.py:116-485)."""
    from telluride_decoding import attention_decoder

    r1, r2 = inp['att.r1'], inp['att.r2']
    tune_n = int(inp['att.tune_n'])
    for name in ('wta', 'stepped', 'ssd'):
        dec = attention_decoder.create_attention_decoder(
            name, window_step=100, frame_rate=100.0, ssd_offset=2.0)
        dec.tune(r1[:tune_n], r2[:tune_n])
        rows = []
        for i in range(r1.shape[0]):
            d, lo, hi = dec.attention(r1[i], r2[i])
            rows.append((float(d), float(lo), float(hi)))
        out['att.%s' % name] = np.asarray(rows, np.float64)


def task_lda(inp, out, np):
    """Reference scaled LDA on seeded Gaussian classes (reference
    scaled_lda.py:36-355)."""
    from telluride_decoding import scaled_lda

    c0, c1, x_test = inp['lda.c0'], inp['lda.c1'], inp['lda.x']
    slda = scaled_lda.ScaledLinearDiscriminantAnalysis()
    slda.fit_two_classes(c0, c1)
    out['lda.scaled_transform'] = np.asarray(slda.transform(x_test))
    # Axis 0 only: axis 1's eigenvalue is ~0 for two classes, so its
    # direction (hence projection) is mathematically non-unique.
    out['lda.scaled_means'] = np.asarray(
        slda.transform(np.stack([c0.mean(axis=0),
                                 c1.mean(axis=0)])))[:, 0]
    out['lda.explained'] = np.asarray(slda.explained_variance_ratio())

    x4, y4 = inp['lda.x4'], inp['lda.y4']
    lda = scaled_lda.LinearDiscriminantAnalysis()
    lda.fit_transform(x4, y4)
    out['lda.explained4'] = np.asarray(lda.explained_variance_ratio())


def task_result_store(inp, out, np):
    """Reference windowed result stores fed in ragged chunks
    (reference result_store.py:36-338)."""
    from telluride_decoding import result_store

    stream = inp['rs.stream']
    chunks = [int(c) for c in inp['rs.chunks']]
    store = result_store.WindowedDataStore(window_step=30,
                                           window_width=50,
                                           pre_context=7)
    windows = []
    start = 0
    for c in chunks:
        store.add_data(stream[start:start + c])
        start += c
        windows.extend(w.copy() for w in store.next_window())
    out['rs.windows'] = np.stack(windows)

    two = result_store.TwoResultStore(window_width=40, window_step=25)
    s1, s2 = inp['rs.s1'], inp['rs.s2']
    w1s, w2s = [], []
    start = 0
    for c in chunks:
        two.add_data(s1[start:start + c], s2[start:start + c])
        start += c
        for w1, w2 in two.next_window():
            w1s.append(np.asarray(w1).copy())
            w2s.append(np.asarray(w2).copy())
    out['rs.two1'] = np.stack(w1s)
    out['rs.two2'] = np.stack(w2s)


def task_misc(inp, out, np, config):
    """The remaining reference support modules, live: BrainVision
    parsing on the reference's own bundled fixture (reference
    ingest_brainvision.py:37-137), the TF correlation-matrix utility
    (reference utils.py:27-59), trigger injection (reference
    add_trigger.py:103-151), d-prime + window averaging (reference
    infer_decoder.py:716-783), and CSV result interchange in BOTH
    directions (reference csv_util.py:34-111)."""
    # BrainVision: both sides parse the SAME bundled .vhdr/.eeg bytes.
    from telluride_decoding import ingest_brainvision
    header, data = ingest_brainvision.read_bv_file(config['bv_header'])
    out['bv.data'] = np.asarray(data, np.float64)
    common = header['Common Infos']
    out['bv.meta'] = np.asarray(
        [float(common['NumberOfChannels']),
         1e6 / float(common['SamplingInterval'])], np.float64)

    # utils.pearson_correlation_graph: the TF graph implementation.
    import tensorflow as tf
    from telluride_decoding import utils
    out['utils.corrmat'] = np.asarray(
        utils.pearson_correlation_graph(
            tf.constant(inp['util.x'], tf.float32),
            tf.constant(inp['util.y'], tf.float32)), np.float64)

    # add_trigger: deterministic event injection given staged times.
    _stub_google3()   # Reference add_trigger.py:44 imports google3.
    from telluride_decoding import add_trigger
    audio = inp['trigger.audio']
    times = inp['trigger.times']
    out['trigger.pulse'] = add_trigger.add_events_to_audio(
        audio, times, fs=16000).astype(np.float64)
    out['trigger.tone'] = add_trigger.add_events_to_audio(
        audio, times, fs=16000, pulse_freq=440.0).astype(np.float64)

    # d-prime + LDA window averaging.
    from telluride_decoding import infer_decoder
    out['metrics.dprime'] = np.asarray(
        infer_decoder.calculate_dprime(inp['met.d1'], inp['met.d2']),
        np.float64)
    out['metrics.averaged'] = np.asarray(
        infer_decoder.average_data(inp['met.stream'], 24), np.float64)

    # CSV interchange. Direction 1: the reference PARSES the CSV this
    # framework wrote (config['csv_tdt']) — output what it read, the
    # driver compares against the staged ground truth.
    from telluride_decoding import csv_util
    got = csv_util._read_results(config['csv_tdt'])
    out['csv.ref_reads_tdt.lambdas'] = np.asarray(list(got), np.float64)
    out['csv.ref_reads_tdt.values'] = np.asarray(
        [got[k] for k in got], np.float64)
    # Direction 2: the reference WRITES a CSV from the staged values;
    # the rebuild parses it and must recover the same ground truth.
    csv_util.write_results(config['csv_ref'],
                           [float(l) for l in inp['csv.lambdas']],
                           inp['csv.values'].tolist())
    out['csv.tdt_reads_ref.lambdas'] = np.asarray(inp['csv.lambdas'],
                                                  np.float64)
    out['csv.tdt_reads_ref.values'] = np.asarray(inp['csv.values'],
                                                 np.float64)
    # Both sides parse the reference's BUNDLED stored sweep results
    # (test_data/csv_results; per-lambda values sorted because the
    # reference's directory listing order is platform-dependent).
    stored = csv_util.read_all_results_from_directory(
        config['csv_stored_dir'])
    out['csv.stored.lambdas'] = np.asarray(list(stored), np.float64)
    out['csv.stored.values'] = np.asarray(
        [sorted(stored[k]) for k in stored], np.float64)


def main(config_path: str) -> None:
    with open(config_path) as f:
        config = json.load(f)
    sys.path.insert(0, config['reference_path'])

    import matplotlib
    matplotlib.use('Agg')
    import numpy as np

    inputs = dict(np.load(config['inputs_npz']))
    out = {}
    task_preprocess(inputs, out, np)
    task_ingest(inputs, out, np, config['tf_dir'])
    task_attention(inputs, out, np)
    task_lda(inputs, out, np)
    task_result_store(inputs, out, np)
    task_misc(inputs, out, np, config)
    np.savez(config['out_npz'], **out)


if __name__ == '__main__':
    main(sys.argv[1])
