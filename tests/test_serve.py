"""Streaming attention server: chunked serving must equal offline
batch decoding, with carried lag context across chunk boundaries."""

import io
import json
import os

import numpy as np
import pytest

from telluride_decoding_tpu.cli import serve
from telluride_decoding_tpu.data.brain_data import TestBrainData
from telluride_decoding_tpu.decode import infer_decoder
from telluride_decoding_tpu.models.brain_model import (
    BrainModelLinearRegression)
from telluride_decoding_tpu.ops.lagstack import lag_stack_np


class TestContextBuffer:

    @pytest.mark.parametrize('pre,post,chunks',
                             [(0, 0, [7, 5, 9]),
                              (3, 0, [4, 4, 4, 4]),
                              (2, 4, [1, 9, 3, 8]),
                              (5, 5, [30])])
    def test_chunked_equals_offline_interior(self, rng, pre, post,
                                             chunks):
        n = sum(chunks)
        x = rng.randn(n, 3).astype(np.float32)
        buf = serve.ContextBuffer(3, pre, post)
        parts = []
        start = 0
        for c in chunks:
            parts.append(buf.push(x[start:start + c]))
            start += c
        got = np.concatenate(parts, axis=0)
        # Offline: zero-padded only at the stream start; the last
        # `post` frames are not emitted (no future context yet).
        want = lag_stack_np(x, pre, post)[:n - post]
        assert got.shape == want.shape
        np.testing.assert_array_equal(got, want)

    def test_emission_delay(self, rng):
        buf = serve.ContextBuffer(2, pre=1, post=3)
        assert buf.push(rng.randn(2, 2)).shape[0] == 0  # < post+1.
        assert buf.push(rng.randn(2, 2)).shape[0] == 1
        assert buf.delay_frames == 3


def _toy_model_dir(tmp_path, rng, pre=0, post=0):
    """Invertible toy: eeg predicts the attended intensity."""
    n = 3000
    a1 = np.abs(rng.randn(n, 1)).astype(np.float32)
    lagged_width = pre + 1 + post
    eeg = (2.0 * a1 - 1.0 + 0.01 * rng.randn(n, 1)).astype(np.float32)
    model = BrainModelLinearRegression(
        input_width=lagged_width, output_width=1,
        regularization_lambda=1e-4)
    bd = TestBrainData('input_1', 'output', 100.0, pre_context=pre,
                       post_context=post)
    bd.preserve_test_data(eeg, a1)
    model.fit(bd.create_dataset('train'))
    model.add_metadata({'pre_context': pre, 'post_context': post,
                        'input2_pre_context': 0,
                        'input2_post_context': 0,
                        'dnn_regressor': 'linear'}, dataset=None)
    d = str(tmp_path / 'model')
    model.save(d)
    dec = infer_decoder.create_decoder(d, reduction='first')
    dec.load_decoding_model(d)
    dec.add_data_correlator(a1, a1)
    dec.save_parameters(os.path.join(d, 'decoder_model.json'))
    return d, eeg, a1


class TestServeStream:

    def test_matches_offline_scores(self, tmp_path, rng):
        """Chunked streaming scores == offline whole-stream infer_one
        on the frames both can see (interior)."""
        model_dir, eeg, a1 = _toy_model_dir(tmp_path, rng, pre=2,
                                            post=3)
        a2 = np.abs(rng.randn(eeg.shape[0], 1)).astype(np.float32)
        decisions = serve.serve_stream(
            model_dir, eeg, a1, a2, chunk_size=37, reduction='first',
            decision='wta', window_width=100, window_step=100)
        assert len(decisions) == (eeg.shape[0] - 3) // 100
        # Offline: lag-stack the whole stream, decode, window-average.
        from telluride_decoding_tpu.cli.infer import load_model
        dec = load_model(model_dir, 'first')
        stacked = lag_stack_np(eeg, 2, 3)[:eeg.shape[0] - 3]
        scores = np.asarray(dec.infer_one(
            {'input_1': stacked, 'input_2': a1[:stacked.shape[0]]},
            a1[:stacked.shape[0]]))
        for k, d in enumerate(decisions):
            want = float(np.mean(scores[k * 100:(k + 1) * 100]))
            assert d['score1'] == pytest.approx(want, abs=1e-4)
            assert d['attend_speaker1']  # Speaker 1 is attended.

    def test_asymmetric_contexts_keep_streams_aligned(self, rng):
        """eeg post=3 vs audio post=0: the audio ContextBuffers
        complete rows 3 frames ahead of the eeg one, so surplus rows
        must queue until eeg catches up. (Regression: rows beyond
        min() across the three buffers were dropped, permanently
        misaligning input_2 for decoders that consume it.)"""

        class RecordingDecoder:
            decoding_model_params = {'pre_context': 2, 'post_context': 3,
                                     'input2_pre_context': 1,
                                     'input2_post_context': 0}

            def __init__(self):
                self.calls = []

            def infer_one(self, inputs, y):
                self.calls.append((inputs['input_1'], inputs['input_2'],
                                   y))
                return np.zeros((inputs['input_1'].shape[0],),
                                np.float32)

            def infer_pair(self, input_1, in2a, in2b, ya, yb):
                return (self.infer_one({'input_1': input_1,
                                        'input_2': in2a}, ya),
                        self.infer_one({'input_1': input_1,
                                        'input_2': in2b}, yb))

        dec = RecordingDecoder()
        server = serve.StreamingAttentionServer(
            dec, eeg_channels=2, audio_channels=1, window_width=50,
            window_step=50)
        n = 200
        eeg = rng.randn(n, 2).astype(np.float32)
        a1 = rng.randn(n, 1).astype(np.float32)
        a2 = rng.randn(n, 1).astype(np.float32)
        for start in range(0, n, 37):
            sl = slice(start, start + 37)
            server.push(eeg[sl], a1[sl], a2[sl])
        # Calls alternate speaker1/speaker2; both share input_1.
        got_in1 = np.concatenate([c[0] for c in dec.calls[0::2]])
        got_in2_s1 = np.concatenate([c[1] for c in dec.calls[0::2]])
        got_in2_s2 = np.concatenate([c[1] for c in dec.calls[1::2]])
        got_y1 = np.concatenate([c[2] for c in dec.calls[0::2]])
        m = n - 3  # The eeg post-context delays emission by 3 frames.
        np.testing.assert_array_equal(got_in1,
                                      lag_stack_np(eeg, 2, 3)[:m])
        np.testing.assert_array_equal(got_in2_s1,
                                      lag_stack_np(a1, 1, 0)[:m])
        np.testing.assert_array_equal(got_in2_s2,
                                      lag_stack_np(a2, 1, 0)[:m])
        np.testing.assert_array_equal(got_y1, a1[:m])

    def test_decisions_track_attention_switch(self, tmp_path, rng):
        model_dir, _, _ = _toy_model_dir(tmp_path, rng)
        n = 4000
        a1 = np.abs(rng.randn(n, 1)).astype(np.float32)
        a2 = np.abs(rng.randn(n, 1)).astype(np.float32)
        attend2 = np.arange(n) >= n // 2
        eeg = (2.0 * np.where(attend2[:, None], a2, a1) - 1.0 +
               0.05 * rng.randn(n, 1)).astype(np.float32)
        out = io.StringIO()
        decisions = serve.serve_stream(
            model_dir, eeg, a1, a2, chunk_size=64, reduction='first',
            decision='wta', window_width=100, window_step=100,
            out_stream=out)
        correct = sum(
            d['attend_speaker1'] != (d['time_s'] >= (n // 2) / 100.0)
            for d in decisions)
        assert correct / len(decisions) > 0.9
        lines = [json.loads(l) for l in out.getvalue().splitlines()]
        assert lines[-1].get('summary')
        assert lines[-1]['windows'] == len(decisions)

    def test_selftest_main(self, capsys):
        serve._selftest(io.StringIO())
        assert 'correct' in capsys.readouterr().err

    def test_serve_lines_matches_serve_stream(self, tmp_path, rng):
        """The stdin line protocol produces the same decisions as the
        npz replay path on identical data."""
        model_dir, eeg, a1 = _toy_model_dir(tmp_path, rng, pre=1,
                                            post=2)
        a2 = np.abs(rng.randn(eeg.shape[0], 1)).astype(np.float32)
        want = serve.serve_stream(
            model_dir, eeg, a1, a2, chunk_size=41, reduction='first',
            decision='wta', window_width=100, window_step=100)
        lines = []
        for start in range(0, eeg.shape[0], 41):
            sl = slice(start, start + 41)
            lines.append(json.dumps({'eeg': eeg[sl].tolist(),
                                     'audio1': a1[sl].tolist(),
                                     'audio2': a2[sl].tolist()}))
        out = io.StringIO()
        got = serve.serve_lines(
            model_dir, io.StringIO('\n'.join(lines) + '\n'),
            reduction='first', decision='wta', window_width=100,
            window_step=100, out_stream=out)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g['score1'] == w['score1']
            assert g['attend_speaker1'] == w['attend_speaker1']
        emitted = [json.loads(l) for l in out.getvalue().splitlines()]
        assert len(emitted) == len(want)

    def test_serve_lines_skips_bad_lines(self, tmp_path, rng, capsys):
        """Stray log lines / truncated JSON from the acquisition
        process must be skipped with a stderr note, not crash the
        live session."""
        model_dir, eeg, a1 = _toy_model_dir(tmp_path, rng)
        a2 = np.abs(rng.randn(eeg.shape[0], 1)).astype(np.float32)
        n = 200
        good = json.dumps({'eeg': eeg[:n].tolist(),
                           'audio1': a1[:n].tolist(),
                           'audio2': a2[:n].tolist()})
        stream = io.StringIO('starting up...\n'
                             '{"eeg": [[0.1,\n'      # Truncated JSON.
                             '{"audio1": [1.0]}\n'   # Missing fields.
                             + good + '\n')
        got = serve.serve_lines(model_dir, stream, reduction='first',
                                window_width=100, window_step=100)
        assert len(got) == 2                  # 200 frames / 100.
        err = capsys.readouterr().err
        assert err.count('skipping bad input line') == 3

    def test_serve_lines_flat_audio_single_frame_first_chunk(
            self, tmp_path, rng):
        """A FIRST chunk with one eeg frame and flat audio lists must
        not mint bogus audio channels (review finding: [1, N] flat
        audio used to set audio_channels=N and wedge the session).
        Flat lists are mono frames by protocol."""
        model_dir, eeg, a1 = _toy_model_dir(tmp_path, rng, pre=0,
                                            post=0)
        a2 = np.abs(rng.randn(eeg.shape[0], 1)).astype(np.float32)
        want = serve.serve_stream(
            model_dir, eeg, a1, a2, chunk_size=50, reduction='first',
            decision='wta', window_width=100, window_step=100)
        # Single-frame first chunk, then flat-list chunks of 50.
        lines = [json.dumps({'eeg': eeg[:1].tolist(),
                             'audio1': a1[:1, 0].tolist(),   # Flat [1]
                             'audio2': a2[:1, 0].tolist()})]
        for start in range(1, eeg.shape[0], 50):
            sl = slice(start, start + 50)
            lines.append(json.dumps({'eeg': eeg[sl].tolist(),
                                     'audio1': a1[sl, 0].tolist(),
                                     'audio2': a2[sl, 0].tolist()}))
        got = serve.serve_lines(
            model_dir, io.StringIO('\n'.join(lines) + '\n'),
            reduction='first', decision='wta', window_width=100,
            window_step=100)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g['score1'] == pytest.approx(w['score1'], abs=1e-5)

    def test_serve_lines_channel_major_audio_reoriented(
            self, tmp_path, rng):
        """2-D audio arriving [channels, frames] (channel-major) is
        transposed to match the chunk's eeg frame count."""
        model_dir, eeg, a1 = _toy_model_dir(tmp_path, rng, pre=0,
                                            post=0)
        a2 = np.abs(rng.randn(eeg.shape[0], 1)).astype(np.float32)
        want = serve.serve_stream(
            model_dir, eeg, a1, a2, chunk_size=40, reduction='first',
            decision='wta', window_width=100, window_step=100)
        lines = []
        for start in range(0, eeg.shape[0], 40):
            sl = slice(start, start + 40)
            lines.append(json.dumps({
                'eeg': eeg[sl].tolist(),
                'audio1': a1[sl].T.tolist(),     # [1, frames].
                'audio2': a2[sl].T.tolist()}))
        got = serve.serve_lines(
            model_dir, io.StringIO('\n'.join(lines) + '\n'),
            reduction='first', decision='wta', window_width=100,
            window_step=100)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g['score1'] == pytest.approx(w['score1'], abs=1e-5)

    def test_serve_lines_survives_mismatched_audio_line(
            self, tmp_path, rng, capsys):
        """A 2-D audio chunk matching NEITHER orientation must be
        skipped (stderr note), not crash the live session inside
        push() (review fix)."""
        model_dir, eeg, a1 = _toy_model_dir(tmp_path, rng, pre=0,
                                            post=0)
        a2 = np.abs(rng.randn(eeg.shape[0], 1)).astype(np.float32)
        n = 200
        good = lambda sl: json.dumps({'eeg': eeg[sl].tolist(),
                                      'audio1': a1[sl].tolist(),
                                      'audio2': a2[sl].tolist()})
        bad = json.dumps({'eeg': eeg[:50].tolist(),
                          'audio1': np.ones((3, 2)).tolist(),  # 2ch!?
                          'audio2': a2[:50].tolist()})
        bad_eeg = json.dumps({'eeg': np.ones((10, 7)).tolist(),  # 7ch
                              'audio1': a1[:10].tolist(),
                              'audio2': a2[:10].tolist()})
        stream = io.StringIO('\n'.join(
            [good(slice(0, n)), bad, bad_eeg, good(slice(n, 2 * n))])
            + '\n')
        got = serve.serve_lines(model_dir, stream, reduction='first',
                                window_width=100, window_step=100)
        assert len(got) == 4                  # 400 good frames / 100.
        err = capsys.readouterr().err
        assert err.count('skipping bad input line') == 2

    def test_long_stream_soak_bounded_memory(self, tmp_path, rng):
        """Production-serving soak: a long stream (1500 chunks) through
        the server must keep internal buffers bounded (pending/queue
        buffers drain every chunk; the window store advances) and keep
        producing correct decisions throughout."""
        import resource
        model_dir, eeg, a1 = _toy_model_dir(tmp_path, rng, pre=1,
                                            post=2)
        a2 = np.abs(rng.randn(eeg.shape[0], 1)).astype(np.float32)
        from telluride_decoding_tpu.cli.infer import load_model
        decoder = load_model(model_dir, 'first')
        server = serve.StreamingAttentionServer(
            decoder, eeg_channels=eeg.shape[1], audio_channels=1,
            window_width=100, window_step=50)
        rss_start = resource.getrusage(
            resource.RUSAGE_SELF).ru_maxrss / 1024.0
        decisions = []
        chunk = 37
        for start in range(1500):
            sl = np.arange(start * chunk,
                           (start + 1) * chunk) % eeg.shape[0]
            decisions.extend(server.push(eeg[sl], a1[sl], a2[sl]))
        # All internal buffers bounded by a window + a chunk.
        for buf in (server._pend_eeg, server._pend_a1, server._pend_a2,
                    server._q1, server._q2):
            assert buf.shape[0] < 200, buf.shape
        assert server._store._store1._count < 300
        assert len(decisions) == (1500 * chunk - 2) // 50 - 1
        # Speaker 1 (the real audio) wins essentially always.
        wins = np.mean([d['attend_speaker1'] for d in decisions])
        assert wins > 0.95, wins
        rss_end = resource.getrusage(
            resource.RUSAGE_SELF).ru_maxrss / 1024.0
        assert rss_end - rss_start < 300, (rss_start, rss_end)


class TestRoundFourSecondReview:

    def test_infer_pair_async_returns_device_arrays(self, tmp_path,
                                                    rng):
        """The pipelined serve path needs a dispatch WITHOUT the host
        readback (np.asarray blocks on the device round trip, which
        made the old double-buffering a no-op); values harvest
        identically."""
        import jax
        model_dir, eeg, a1 = _toy_model_dir(tmp_path, rng)
        from telluride_decoding_tpu.cli.infer import load_model
        dec = load_model(model_dir, 'first')
        a2 = np.abs(rng.randn(200, 1)).astype(np.float32)
        args = (eeg[:200], a1[:200], a2, a1[:200], a2)
        sync = dec.infer_pair(*args)
        async_ = dec.infer_pair_async(*args)
        assert all(isinstance(s, jax.Array) for s in async_)
        np.testing.assert_allclose(np.asarray(async_[0]), sync[0],
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(async_[1]), sync[1],
                                   rtol=1e-6)

    def test_pipelined_latency_counts_from_dispatch(self, tmp_path,
                                                    rng):
        """Pipelined decisions harvest one push later; latency_ms must
        count from the push that dispatched the windows' chunk, so it
        can never be (near-)zero-by-construction."""
        model_dir, eeg, a1 = _toy_model_dir(tmp_path, rng)
        a2 = np.abs(rng.randn(eeg.shape[0], 1)).astype(np.float32)
        decisions = serve.serve_stream(
            model_dir, eeg, a1, a2, chunk_size=150, reduction='first',
            window_width=100, window_step=100, pipeline=True)
        assert decisions
        assert all(d['latency_ms'] > 0 for d in decisions)
        # And the pipelined replay is value-identical to synchronous.
        sync = serve.serve_stream(
            model_dir, eeg, a1, a2, chunk_size=150, reduction='first',
            window_width=100, window_step=100, pipeline=False)
        assert [d['score1'] for d in decisions] == \
            [d['score1'] for d in sync]

    def test_serve_lines_flat_mono_eeg(self, tmp_path, rng):
        """Flat eeg lists are mono FRAMES (same protocol as audio);
        np.atleast_2d used to read them as [1, N] — N bogus channels —
        killing the first push."""
        model_dir, eeg, a1 = _toy_model_dir(tmp_path, rng)
        a2 = np.abs(rng.randn(eeg.shape[0], 1)).astype(np.float32)
        n = 200
        lines = []
        for start in range(0, n, 50):
            sl = slice(start, start + 50)
            lines.append(json.dumps({
                'eeg': eeg[sl].reshape(-1).tolist(),    # FLAT.
                'audio1': a1[sl].reshape(-1).tolist(),
                'audio2': a2[sl].reshape(-1).tolist()}))
        got = serve.serve_lines(
            model_dir, io.StringIO('\n'.join(lines) + '\n'),
            reduction='first', window_width=100, window_step=100)
        assert len(got) == 2
        want = serve.serve_stream(model_dir, eeg[:n], a1[:n], a2[:n],
                                  chunk_size=50, reduction='first',
                                  window_width=100, window_step=100)
        for g, w in zip(got, want):
            assert g['score1'] == pytest.approx(w['score1'], abs=1e-6)

    def test_serve_lines_survives_bad_eeg_width_chunk(self, tmp_path,
                                                      rng, capsys):
        """A parseable chunk whose eeg width matches neither
        orientation is skipped with a stderr note; the session keeps
        serving (it used to raise out of push() and die)."""
        model_dir, eeg, a1 = _toy_model_dir(tmp_path, rng)
        a2 = np.abs(rng.randn(eeg.shape[0], 1)).astype(np.float32)
        def line(sl):
            return json.dumps({'eeg': eeg[sl].tolist(),
                               'audio1': a1[sl].tolist(),
                               'audio2': a2[sl].tolist()})
        bad = json.dumps({'eeg': rng.randn(50, 3).tolist(),   # 3 ch.
                          'audio1': a1[:50].tolist(),
                          'audio2': a2[:50].tolist()})
        stream = io.StringIO(line(slice(0, 100)) + '\n' + bad + '\n'
                             + line(slice(100, 200)) + '\n')
        got = serve.serve_lines(model_dir, stream, reduction='first',
                                window_width=100, window_step=100)
        assert len(got) == 2
        assert 'skipping bad' in capsys.readouterr().err


class TestServeSocket:
    """TCP listener mode: same line protocol over a connection."""

    @staticmethod
    def _start(model_dir, max_sessions, address='tcp://127.0.0.1:0',
               **kw):
        """Runs serve_socket on a background thread; returns
        (host, port, thread, result_box)."""
        import queue
        import threading
        bound = queue.Queue()
        box = {}

        def run():
            try:
                box['counts'] = serve.serve_socket(
                    model_dir, address,
                    reduction='first', window_width=100,
                    window_step=100, max_sessions=max_sessions,
                    on_bound=lambda h, p: bound.put((h, p)), **kw)
            except BaseException as e:   # Surface in the test.
                box['error'] = e
                bound.put(None)

        t = threading.Thread(target=run, daemon=True)
        t.start()
        addr = bound.get(timeout=30)
        assert addr is not None, box.get('error')
        return addr[0], addr[1], t, box

    @staticmethod
    def _session(host, port, lines):
        """One client session: send lines, half-close, read decisions
        until the server finishes the session."""
        import socket
        with socket.create_connection((host, port), timeout=30) as c:
            c.sendall(('\n'.join(lines) + '\n').encode())
            c.shutdown(socket.SHUT_WR)
            out = b''
            while True:
                chunk = c.recv(65536)
                if not chunk:
                    break
                out += chunk
        return [json.loads(l) for l in out.decode().splitlines() if l]

    def test_round_trip_matches_serve_lines(self, tmp_path, rng):
        model_dir, eeg, a1 = _toy_model_dir(tmp_path, rng)
        a2 = np.abs(rng.randn(eeg.shape[0], 1)).astype(np.float32)
        n = 250
        lines = [json.dumps({'eeg': eeg[s:s + 50].tolist(),
                             'audio1': a1[s:s + 50].tolist(),
                             'audio2': a2[s:s + 50].tolist()})
                 for s in range(0, n, 50)]
        host, port, t, box = self._start(model_dir, max_sessions=1)
        got = self._session(host, port, lines)
        t.join(timeout=60)
        assert not t.is_alive() and box.get('counts') == [len(got)]
        want = serve.serve_lines(
            model_dir, io.StringIO('\n'.join(lines) + '\n'),
            reduction='first', window_width=100, window_step=100)
        assert len(got) == len(want) == 2
        for g, w in zip(got, want):
            assert g['score1'] == pytest.approx(w['score1'], abs=1e-6)
            assert g['attend_speaker1'] == w['attend_speaker1']

    def test_sessions_get_fresh_state(self, tmp_path, rng):
        """Two sequential sessions with identical input produce
        identical decisions — no context bleed between connections."""
        model_dir, eeg, a1 = _toy_model_dir(tmp_path, rng, pre=2,
                                            post=1)
        a2 = np.abs(rng.randn(eeg.shape[0], 1)).astype(np.float32)
        lines = [json.dumps({'eeg': eeg[s:s + 40].tolist(),
                             'audio1': a1[s:s + 40].tolist(),
                             'audio2': a2[s:s + 40].tolist()})
                 for s in range(0, 240, 40)]
        host, port, t, box = self._start(model_dir, max_sessions=2)
        first = self._session(host, port, lines)
        second = self._session(host, port, lines)
        t.join(timeout=60)
        assert not t.is_alive()
        assert box.get('counts') == [len(first), len(second)]
        assert len(first) >= 1
        assert [d['score1'] for d in first] == \
            [d['score1'] for d in second]

    def test_survives_client_reset_and_bad_lines(self, tmp_path, rng,
                                                 capsys):
        """An abrupt client disconnect is logged and the listener
        serves the next session; bad JSON lines are skipped."""
        import socket
        model_dir, eeg, a1 = _toy_model_dir(tmp_path, rng)
        a2 = np.abs(rng.randn(eeg.shape[0], 1)).astype(np.float32)
        host, port, t, box = self._start(model_dir, max_sessions=2)
        # Session 0: connect, send garbage, hard-reset the connection.
        s = socket.create_connection((host, port), timeout=30)
        s.sendall(b'not json\n')
        s.setsockopt(socket.SOL_SOCKET, socket.SO_LINGER,
                     __import__('struct').pack('ii', 1, 0))
        s.close()
        # Session 1 still works end to end.
        lines = [json.dumps({'eeg': eeg[s2:s2 + 50].tolist(),
                             'audio1': a1[s2:s2 + 50].tolist(),
                             'audio2': a2[s2:s2 + 50].tolist()})
                 for s2 in range(0, 150, 50)]
        got = self._session(host, port, lines)
        t.join(timeout=60)
        assert not t.is_alive()
        assert len(got) == 1
        assert box.get('counts', [None, None])[1] == 1

    def test_bad_address_rejected(self):
        for bad in ('tcp://nohost', 'tcp://h:notaport', 'tcp://:-5'):
            with pytest.raises(ValueError):
                serve._parse_tcp(bad)
        assert serve._parse_tcp('tcp://0.0.0.0:7355') == \
            ('0.0.0.0', 7355)
        # Bracketed IPv6 literals lose the brackets (the resolver
        # wants the bare address; serve_socket selects AF_INET6).
        assert serve._parse_tcp('tcp://[::1]:80') == ('::1', 80)

    def test_survives_binary_probe(self, tmp_path, rng):
        """A TLS probe / port scanner sending non-UTF-8 bytes must not
        kill the long-lived listener (the strict utf-8 reader raises
        UnicodeDecodeError, not a ConnectionError)."""
        import socket
        model_dir, eeg, a1 = _toy_model_dir(tmp_path, rng)
        a2 = np.abs(rng.randn(eeg.shape[0], 1)).astype(np.float32)
        host, port, t, box = self._start(model_dir, max_sessions=2)
        with socket.create_connection((host, port), timeout=30) as s:
            s.sendall(b'\x16\x03\x01\x02\x00\xff\xfe binary probe\n')
            s.shutdown(socket.SHUT_WR)
            while s.recv(65536):
                pass
        lines = [json.dumps({'eeg': eeg[st:st + 50].tolist(),
                             'audio1': a1[st:st + 50].tolist(),
                             'audio2': a2[st:st + 50].tolist()})
                 for st in range(0, 150, 50)]
        got = self._session(host, port, lines)
        t.join(timeout=60)
        assert not t.is_alive()
        assert 'error' not in box, box.get('error')
        assert len(got) == 1
        assert box.get('counts', [None, None])[0] == -1
        assert box['counts'][1] == 1

    def test_ipv6_listener(self, tmp_path, rng):
        """tcp://[::1]:PORT binds an AF_INET6 socket and serves the
        same line protocol (brackets stripped before the resolver)."""
        import socket
        if not socket.has_ipv6:
            pytest.skip('platform has no IPv6')
        try:
            probe = socket.socket(socket.AF_INET6, socket.SOCK_STREAM)
            probe.bind(('::1', 0))
            probe.close()
        except OSError:
            pytest.skip('IPv6 loopback unavailable')
        model_dir, eeg, a1 = _toy_model_dir(tmp_path, rng)
        a2 = np.abs(rng.randn(eeg.shape[0], 1)).astype(np.float32)
        host, port, t, box = self._start(model_dir, max_sessions=1,
                                         address='tcp://[::1]:0')
        lines = [json.dumps({'eeg': eeg[st:st + 50].tolist(),
                             'audio1': a1[st:st + 50].tolist(),
                             'audio2': a2[st:st + 50].tolist()})
                 for st in range(0, 150, 50)]
        got = self._session('::1', port, lines)
        t.join(timeout=60)
        assert not t.is_alive()
        assert 'error' not in box, box.get('error')
        assert box.get('counts') == [len(got)] and len(got) == 1

    def test_tcp_mode_does_not_truncate_serve_output(
            self, tmp_path, monkeypatch):
        """--serve_output is never written in TCP mode (decisions go
        back on each session's socket); launching the listener must
        not destroy an existing decisions file."""
        from absl.testing import flagsaver
        out = tmp_path / 'decisions.jsonl'
        out.write_text('{"precious": 1}\n')
        called = {}
        monkeypatch.setattr(
            serve, 'serve_socket',
            lambda *a, **k: called.setdefault('socket', (a, k)))
        serve.FLAGS(['prog'])
        with flagsaver.flagsaver(
                serve_model_dir=str(tmp_path),
                serve_input='tcp://127.0.0.1:0',
                serve_output=str(out)):
            serve.main(['prog'])
        assert 'socket' in called
        assert out.read_text() == '{"precious": 1}\n'

    def test_programmatic_serve_reduction_counts_as_explicit(
            self, tmp_path, monkeypatch):
        """Explicitness is detected via using_default_value, so an
        embedding caller assigning FLAGS.serve_reduction (no command
        line parse) is honored, not silently treated as unset."""
        from absl.testing import flagsaver
        called = {}
        monkeypatch.setattr(
            serve, 'serve_socket',
            lambda *a, **k: called.setdefault('kwargs', k))
        serve.FLAGS(['prog'])
        with flagsaver.flagsaver(
                serve_model_dir=str(tmp_path),
                serve_input='tcp://127.0.0.1:0',
                serve_reduction='first'):
            serve.main(['prog'])
        assert called['kwargs']['reduction'] == 'first'
        # And the flag default (untouched) still means "artifact
        # decides": reduction=None.
        called.clear()
        with flagsaver.flagsaver(
                serve_model_dir=str(tmp_path),
                serve_input='tcp://127.0.0.1:0'):
            serve.main(['prog'])
        assert called['kwargs']['reduction'] is None
