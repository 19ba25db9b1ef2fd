"""Round-5 post-review fixes (review pass over the long-lived runtime
files): serve stream-integrity guards (ragged chunks, zero-frame
first chunks), the TCP idle timeout for silently-dead peers, the
TDT_STREAMING_COHORT env knob actually reaching the tdt-cohort CLI,
and atomic sweep-checkpoint publishes."""

import io
import json
import os
import socket
import struct
import threading

import numpy as np
import pytest

from telluride_decoding_tpu.cli import serve
from test_serve import _toy_model_dir


class TestRaggedChunkGuard:
    """A chunk whose eeg/audio1/audio2 carry different frame counts
    must raise BEFORE any buffering (serve.py push): the streams
    buffer independently, so accepting it would silently skew every
    later window by the deficit for the rest of the session."""

    def test_push_raises_before_buffering(self, tmp_path, rng):
        from telluride_decoding_tpu.cli.infer import load_model
        model_dir, eeg, a1 = _toy_model_dir(tmp_path, rng)
        decoder = load_model(model_dir, 'first')
        server = serve.StreamingAttentionServer(
            decoder, eeg_channels=1, audio_channels=1,
            window_width=100, window_step=100)
        a2 = np.abs(rng.randn(eeg.shape[0], 1)).astype(np.float32)
        with pytest.raises(ValueError, match='same frame count'):
            server.push(eeg[:32], a1[:31], a2[:32])
        # Nothing buffered: the guard fired before any concatenate.
        for buf in (server._pend_eeg, server._pend_a1,
                    server._pend_a2, server._q1, server._q2):
            assert buf.shape[0] == 0
        # The session continues cleanly with aligned chunks.
        decisions = []
        for s in range(0, 300, 50):
            decisions.extend(server.push(eeg[s:s + 50], a1[s:s + 50],
                                         a2[s:s + 50]))
        decisions.extend(server.flush())   # Default pipeline=True:
        assert len(decisions) == 3         # last chunk is in flight.

    def test_serve_lines_skips_ragged_chunk_keeping_alignment(
            self, tmp_path, rng, capsys):
        """serve_lines drops the whole malformed chunk (all three
        streams together), so decisions afterwards equal a run that
        never saw it."""
        model_dir, eeg, a1 = _toy_model_dir(tmp_path, rng)
        a2 = np.abs(rng.randn(eeg.shape[0], 1)).astype(np.float32)

        def lines(with_ragged):
            out = []
            for s in range(0, 200, 50):
                out.append(json.dumps(
                    {'eeg': eeg[s:s + 50].tolist(),
                     'audio1': a1[s:s + 50].tolist(),
                     'audio2': a2[s:s + 50].tolist()}))
                if with_ragged and s == 50:
                    out.append(json.dumps(
                        {'eeg': eeg[200:232].tolist(),
                         'audio1': a1[200:231].tolist(),   # One short.
                         'audio2': a2[200:232].tolist()}))
            return '\n'.join(out) + '\n'

        got = serve.serve_lines(model_dir, io.StringIO(lines(True)),
                                reduction='first', window_width=100,
                                window_step=100)
        want = serve.serve_lines(model_dir, io.StringIO(lines(False)),
                                 reduction='first', window_width=100,
                                 window_step=100)
        assert 'skipping bad chunk' in capsys.readouterr().err
        assert [d['score1'] for d in got] == \
            [d['score1'] for d in want]


class TestEmptyFirstChunk:
    """A zero-frame first chunk must not lock in bogus channel counts
    (it orients to shape (0, 1) regardless of the stream's width) and
    wedge the whole session."""

    def _lines(self, eeg, a1, a2, prefix_lines):
        out = list(prefix_lines)
        for s in range(0, 200, 50):
            out.append(json.dumps({'eeg': eeg[s:s + 50].tolist(),
                                   'audio1': a1[s:s + 50].tolist(),
                                   'audio2': a2[s:s + 50].tolist()}))
        return '\n'.join(out) + '\n'

    def test_keepalive_first_chunk(self, tmp_path, rng):
        model_dir, eeg, a1 = _toy_model_dir(tmp_path, rng)
        a2 = np.abs(rng.randn(eeg.shape[0], 1)).astype(np.float32)
        keepalive = json.dumps({'eeg': [], 'audio1': [], 'audio2': []})
        got = serve.serve_lines(
            model_dir,
            io.StringIO(self._lines(eeg, a1, a2, [keepalive])),
            reduction='first', window_width=100, window_step=100)
        want = serve.serve_lines(
            model_dir, io.StringIO(self._lines(eeg, a1, a2, [])),
            reduction='first', window_width=100, window_step=100)
        assert len(got) == len(want) == 2
        assert [d['score1'] for d in got] == \
            [d['score1'] for d in want]

    def test_zero_frame_eeg_does_not_establish_channels(
            self, tmp_path, rng):
        # eeg empty but audio non-empty: not a pure keepalive, but the
        # server must still wait for a real chunk before fixing its
        # channel counts.
        model_dir, eeg, a1 = _toy_model_dir(tmp_path, rng)
        a2 = np.abs(rng.randn(eeg.shape[0], 1)).astype(np.float32)
        weird = json.dumps({'eeg': [], 'audio1': [[0.1]],
                            'audio2': [[0.2]]})
        got = serve.serve_lines(
            model_dir,
            io.StringIO(self._lines(eeg, a1, a2, [weird])),
            reduction='first', window_width=100, window_step=100)
        assert len(got) == 2


class TestIdleTimeout:
    """A client that vanishes without RST must not hang the serial
    listener forever when --serve_idle_timeout_s is set."""

    def test_silent_client_times_out(self, tmp_path, rng):
        from test_serve import TestServeSocket
        model_dir, eeg, a1 = _toy_model_dir(tmp_path, rng)
        host, port, t, box = TestServeSocket._start(
            model_dir, max_sessions=1, idle_timeout_s=0.3)
        # Connect and go silent (no data, no FIN) — the dead-peer
        # stand-in. The session must abort on the read timeout.
        c = socket.create_connection((host, port), timeout=30)
        try:
            t.join(timeout=30)
            assert not t.is_alive(), 'listener hung on a silent client'
        finally:
            c.close()
        assert box.get('counts') == [-1]   # Aborted session.


class TestStreamingCohortEnvKnob:
    """main() must not forward the flag DEFAULT (True) as an explicit
    streaming choice — that shadowed the documented
    TDT_STREAMING_COHORT env fallback inside run_cohort_sweep."""

    def _run_main(self, tmp_path, monkeypatch, flag_kwargs):
        from absl.testing import flagsaver
        from telluride_decoding_tpu.cli import cohort
        captured = {}

        def fake_sweep(my_flags, subjects, lambdas, **kw):
            captured.update(kw)
            return ({'s01': None},
                    (np.zeros(len(lambdas)), np.zeros(len(lambdas))))

        monkeypatch.setattr(cohort, 'run_cohort_sweep', fake_sweep)
        (tmp_path / 'cohort' / 's01').mkdir(parents=True, exist_ok=True)
        cohort.FLAGS(['prog'])
        with flagsaver.flagsaver(
                cohort_dir=str(tmp_path / 'cohort'),
                regularization_list='1e-4,1e-2', **flag_kwargs):
            cohort.main(['prog'])
        return captured

    def test_untouched_flag_defers_to_env(self, tmp_path, monkeypatch):
        captured = self._run_main(tmp_path, monkeypatch, {})
        assert captured['streaming'] is None   # env decides downstream

    def test_explicit_flag_wins(self, tmp_path, monkeypatch):
        captured = self._run_main(tmp_path, monkeypatch,
                                  {'streaming_cohort': False})
        assert captured['streaming'] is False


class TestAtomicCheckpointPublish:
    """Sweep-checkpoint tiles and the manifest publish atomically with
    pid-suffixed temp names (the repo convention): concurrent writers
    sharing a checkpoint_dir must never interleave one temp file, and
    a killed run must never leave a torn file at the final path."""

    def test_no_stray_temp_files_and_resume_works(self, tmp_path):
        from telluride_decoding_tpu.sweep.checkpoint import (
            SweepCheckpoint, run_sweep_with_checkpoints)
        calls = []

        def sweep_fn(lambdas, file_slice):
            calls.append(list(lambdas))
            return np.full((len(lambdas), 3), sum(lambdas))

        lambdas = [1e-4, 1e-2, 1.0]
        files = ['a', 'b', 'c']
        d = str(tmp_path / 'ck')
        got = run_sweep_with_checkpoints(sweep_fn, lambdas, files, d,
                                         lambda_block=2)
        assert len(calls) == 2
        # No temp droppings: every publish went through os.replace.
        stray = [f for f in os.listdir(d) if '.tmp' in f]
        assert not stray, stray
        # Resume: nothing recomputes, values identical.
        calls.clear()
        again = run_sweep_with_checkpoints(sweep_fn, lambdas, files, d,
                                           lambda_block=2)
        assert not calls
        np.testing.assert_array_equal(got, again)

    def test_tile_temp_name_is_pid_suffixed(self, tmp_path,
                                            monkeypatch):
        from telluride_decoding_tpu.sweep import checkpoint as ck
        seen = {}
        real_replace = os.replace

        def spy(src, dst):
            seen[dst] = src
            return real_replace(src, dst)

        monkeypatch.setattr(ck.os, 'replace', spy)
        c = ck.SweepCheckpoint(str(tmp_path), [1.0], ['f'])
        c.save_tile('l0-1', np.ones((1, 1)), slice(0, 1), slice(0, 1))
        pid = '.%d' % os.getpid()
        for dst, src in seen.items():
            assert ('-%d' % os.getpid()) in src or pid in src, (src,
                                                                dst)
