"""Real-time streaming attention server.

The reference stores decoder_model.json "so that the correlation
calculation can be restarted quickly, e.g. in real-time code"
(reference infer_decoder.py:124) — but never ships that real-time
code. This driver is it: frames arrive in chunks (replayed from a file
here; any acquisition loop can call StreamingAttentionServer.push),
lag context is carried across chunk boundaries, each chunk is ONE
device dispatch (both speakers fused, the shared eeg transform
computed once), and window decisions stream out as JSON lines with
per-window latency.

  python -m telluride_decoding_tpu.cli.serve \
      --model_dir /model --reduction lda --decoder wta \
      --input stream.npz --chunk_size 32 --window_width 100

stream.npz holds eeg [N, C], audio1 [N, 1], audio2 [N, 1] (field names
configurable). --serve_input - switches to a live line protocol: each
stdin line is a JSON chunk ({"eeg": [[...]], "audio1": ..., "audio2":
...}) from any acquisition process, and decisions flush out per chunk.
--serve_input tcp://HOST:PORT binds a TCP listener speaking the same
line protocol over the connection (chunks in, decisions out on the
same socket) — the deployment shape for an acquisition box on the
local network; the model loads once and sessions are served serially
(each connection gets fresh streaming state). --selftest builds a toy
invertible model + stream in a temp dir, serves it, and asserts the
decisions track the planted attention switch — an executable
end-to-end smoke test.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Dict, List, Optional

from absl import app
from absl import flags

import numpy as np

from telluride_decoding_tpu.decide import attention_decoder
from telluride_decoding_tpu.decode import infer_decoder
from telluride_decoding_tpu.decode.result_store import TwoResultStore
from telluride_decoding_tpu.ops.lagstack import lag_stack_np

FLAGS = flags.FLAGS


def _load_serving_decoder(model_dir: str, reduction: Optional[str]):
    """Loads either a model directory (live Decoder) or an AOT
    StableHLO artifact (decode.aot.ExportedDecoder) — tdt-serve points
    at either interchangeably. ``reduction=None`` means "no explicit
    request": AOT artifacts use the reduction baked in at export time
    (whatever it is), live model dirs use 'lda'. An EXPLICIT reduction
    conflicting with an AOT artifact's baked-in one is refused rather
    than silently ignored — the flag default must not trip this, so
    main() only forwards --serve_reduction when the user set it."""
    from telluride_decoding_tpu.decode import aot
    if aot.is_aot_artifact(model_dir):
        decoder = aot.load_exported_decoder(model_dir)
        if reduction is not None and reduction != decoder.reduction:
            raise ValueError(
                'AOT artifact %s was exported with reduction %r; '
                'requested %r. Pass --serve_reduction %s (or drop the '
                'flag), or re-export the artifact.'
                % (model_dir, decoder.reduction, reduction,
                   decoder.reduction))
        return decoder
    from telluride_decoding_tpu.cli.infer import load_model
    return load_model(model_dir, 'lda' if reduction is None else reduction)


def define_flags():
    if 'serve_input' in FLAGS:
        return
    flags.DEFINE_string('serve_model_dir', None, 'Trained model dir '
                        '(model.json + weights.npz + decoder_model.json).')
    flags.DEFINE_string('serve_input', None,
                        '.npz with eeg/audio1/audio2 arrays to replay, '
                        '"-" to read JSON chunk lines from stdin '
                        '({"eeg": [[...]], "audio1": ..., "audio2": '
                        '...} per line), or "tcp://HOST:PORT" to '
                        'listen for connections speaking the same '
                        'line protocol (decisions return on the '
                        'socket; --serve_output is ignored).')
    flags.DEFINE_string('serve_output', None,
                        'Where to write JSON-line decisions (default '
                        'stdout).')
    flags.DEFINE_integer('chunk_size', 32,
                         'Frames per push (simulated acquisition chunk).')
    flags.DEFINE_integer('serve_window_width', 100,
                         'Frames per correlation window.')
    flags.DEFINE_integer('serve_window_step', 50,
                         'Frames between window starts.')
    flags.DEFINE_enum('serve_reduction', 'lda',
                      ['first', 'second', 'mean', 'mean-squared', 'lda'],
                      'Correlation-to-scalar reduction.')
    flags.DEFINE_enum('serve_decoder', 'wta', ['wta', 'stepped', 'ssd'],
                      'Attention decision rule.')
    flags.DEFINE_float('serve_frame_rate', 100.0, 'Frames per second.')
    flags.DEFINE_bool('serve_pipeline', False,
                      'Double-buffer replay dispatches (infer_pair_'
                      'async). Off by default: measured chunk-'
                      'synchronous is as fast or faster both through '
                      'the relay tunnel and on CPU; enable on on-prem '
                      'attachments with async dispatch and heavy '
                      'per-chunk compute.')
    flags.DEFINE_bool('selftest', False,
                      'Build a toy model + stream and assert the served '
                      'decisions track the planted attention switch.')
    flags.DEFINE_float('serve_idle_timeout_s', 0.0,
                       'TCP mode: abort a session when no data arrives '
                       'for this many seconds (0 = wait forever). A '
                       'client that vanishes without sending RST (power '
                       'loss, network partition) otherwise blocks the '
                       'serial listener indefinitely; real-time '
                       'acquisition streams chunks continuously, so '
                       'even a modest timeout is safe. TCP keepalive '
                       'is enabled on every session regardless.')


class ContextBuffer:
    """Carries lag-window context across streaming chunk boundaries.

    Emits output frame t once frames up to t+post have arrived; frame
    t's row is [x[t-pre], ..., x[t+post]] with zeros only before the
    stream start — identical to the offline per-file lag stack, just
    incremental. (The emission delay is `post` frames, the price of
    future context in real time.)

    Deliberate tail semantics: at stream end the final `post` frames
    are never emitted — a real-time server has no future frames to
    complete them with, and fabricating zero future context would
    score those rows against data that never existed. An OFFLINE
    decode of the same recording zero-pads the tail and scores all N
    rows, so a replayed stream yields `post` fewer score frames than
    `tdt-infer` on the identical file (tests pin the interior rows
    value-identical; test_serve.py::test_matches_offline_scores).
    """

    def __init__(self, channels: int, pre: int, post: int):
        self._pre = pre
        self._post = post
        # Buffer holds frames starting at stream index emitted - pre
        # (zeros for negative indices).
        self._buf = np.zeros((pre, channels), np.float32)
        self._arrived = 0
        self._emitted = 0

    def push(self, frames: np.ndarray) -> np.ndarray:
        """Adds [n, C] frames; returns all newly-completable stacked
        rows [m, (pre+1+post)*C] (possibly empty)."""
        frames = np.atleast_2d(np.asarray(frames, np.float32))
        self._buf = np.concatenate([self._buf, frames], axis=0)
        self._arrived += frames.shape[0]
        avail = self._arrived - self._post - self._emitted
        if avail <= 0:
            return np.zeros(
                (0, (self._pre + 1 + self._post) * frames.shape[1]),
                np.float32)
        rows = self._buf[:avail + self._pre + self._post]
        stacked = lag_stack_np(rows, self._pre, self._post)
        out = stacked[self._pre:self._pre + avail]
        self._buf = self._buf[avail:]
        self._emitted += avail
        return out

    @property
    def delay_frames(self) -> int:
        return self._post


class StreamingAttentionServer:
    """Chunked two-speaker decode + windowed attention decisions."""

    def __init__(self, decoder: infer_decoder.Decoder,
                 eeg_channels: int, audio_channels: int = 1,
                 window_width: int = 100, window_step: int = 50,
                 decision: str = 'wta', frame_rate: float = 100.0,
                 pipeline: bool = True):
        self._decoder = decoder
        # Double-buffering: push() dispatches chunk k+1 BEFORE reading
        # back chunk k's scores, so the device round trip (~RTT-bound
        # through a tunnel, reference-free on-prem it's ~us) overlaps
        # the next chunk's acquisition + host prep. Decisions for a
        # chunk emerge one push later (call flush() at stream end);
        # scores and decisions are value-identical to the synchronous
        # path. pipeline=False restores chunk-synchronous behavior.
        self._pipeline = pipeline
        self._inflight = None
        self.audio_channels = audio_channels
        self.eeg_channels = eeg_channels
        params = decoder.decoding_model_params
        self._ctx_eeg = ContextBuffer(eeg_channels,
                                      int(params.get('pre_context', 0)),
                                      int(params.get('post_context', 0)))
        in2_pre = int(params.get('input2_pre_context', 0))
        in2_post = int(params.get('input2_post_context', 0))
        self._ctx_a1 = ContextBuffer(audio_channels, in2_pre, in2_post)
        self._ctx_a2 = ContextBuffer(audio_channels, in2_pre, in2_post)
        # Completed-but-not-consumed context rows per stream. The three
        # ContextBuffers complete rows at DIFFERENT rates when the eeg
        # and audio post-contexts differ (each is delayed by its own
        # `post`), so surplus rows must queue here until every stream
        # has caught up — consuming min() and dropping the rest would
        # misalign the streams permanently.
        eeg_pre = int(params.get('pre_context', 0))
        eeg_post = int(params.get('post_context', 0))
        self._pend_eeg = np.zeros(
            (0, (eeg_pre + 1 + eeg_post) * eeg_channels), np.float32)
        in2_width = (in2_pre + 1 + in2_post) * audio_channels
        self._pend_a1 = np.zeros((0, in2_width), np.float32)
        self._pend_a2 = np.zeros((0, in2_width), np.float32)
        # Raw audio queue for the `output` stream (no context, but the
        # eeg path delays emission by post frames — keep aligned).
        self._q1 = np.zeros((0, audio_channels), np.float32)
        self._q2 = np.zeros((0, audio_channels), np.float32)
        self._store = TwoResultStore(window_width=window_width,
                                     window_step=window_step)
        self._decide = attention_decoder.create_attention_decoder(
            decision, window_step=window_step, frame_rate=frame_rate)
        self._window_width = window_width
        self._window_step = window_step
        self._frame_rate = frame_rate
        self._windows_emitted = 0

    def push(self, eeg: np.ndarray, audio1: np.ndarray,
             audio2: np.ndarray) -> List[Dict]:
        """Feeds one acquisition chunk; returns completed decisions.

        The three fields of a chunk must carry the SAME frame count:
        the streams buffer independently, so a ragged chunk (one field
        short) would not error here or later — it would silently skew
        every subsequent window by the deficit for the rest of the
        session. Raising BEFORE any buffering lets serve_lines skip
        the whole malformed chunk with all three streams still
        aligned."""
        t0 = time.perf_counter()
        eeg = np.atleast_2d(np.asarray(eeg, np.float32))
        audio1 = np.atleast_2d(np.asarray(audio1, np.float32))
        audio2 = np.atleast_2d(np.asarray(audio2, np.float32))
        if not (eeg.shape[0] == audio1.shape[0] == audio2.shape[0]):
            raise ValueError(
                'push: eeg/audio1/audio2 chunks must carry the same '
                'frame count, got %d/%d/%d (a ragged chunk would '
                'desynchronize the streams permanently).'
                % (eeg.shape[0], audio1.shape[0], audio2.shape[0]))
        self._pend_eeg = np.concatenate(
            [self._pend_eeg, self._ctx_eeg.push(eeg)])
        self._pend_a1 = np.concatenate(
            [self._pend_a1, self._ctx_a1.push(audio1)])
        self._pend_a2 = np.concatenate(
            [self._pend_a2, self._ctx_a2.push(audio2)])
        self._q1 = np.concatenate(
            [self._q1, np.atleast_2d(np.asarray(audio1, np.float32))])
        self._q2 = np.concatenate(
            [self._q2, np.atleast_2d(np.asarray(audio2, np.float32))])
        n = min(self._pend_eeg.shape[0], self._pend_a1.shape[0],
                self._pend_a2.shape[0], self._q1.shape[0],
                self._q2.shape[0])
        prev = self._inflight
        if n:
            stacked, self._pend_eeg = (self._pend_eeg[:n],
                                       self._pend_eeg[n:])
            a1_ctx, self._pend_a1 = self._pend_a1[:n], self._pend_a1[n:]
            a2_ctx, self._pend_a2 = self._pend_a2[:n], self._pend_a2[n:]
            y1, self._q1 = self._q1[:n], self._q1[n:]
            y2, self._q2 = self._q2[:n], self._q2[n:]
            # Both speakers in ONE device dispatch: the shared eeg
            # transform computes once and the chunk pays one dispatch
            # round trip instead of two. The pipelined path uses the
            # ASYNC variant (device arrays, NO host readback — the
            # blocking np.asarray happens one push later, on a result
            # that has had a whole chunk period to complete in
            # flight); the synchronous path reads back immediately.
            if self._pipeline:
                # Duck-typed decoders without the async variant still
                # pipeline (their dispatch just blocks, as before).
                dispatch = getattr(self._decoder, 'infer_pair_async',
                                   self._decoder.infer_pair)
                self._inflight = (dispatch(stacked, a1_ctx, a2_ctx,
                                           y1, y2), t0)
            else:
                prev = (self._decoder.infer_pair(stacked, a1_ctx,
                                                 a2_ctx, y1, y2), t0)
                self._inflight = None
        elif self._pipeline:
            self._inflight = None
        if prev is not None:
            (s1, s2), t_dispatch = prev
            self._store.add_data(np.asarray(s1).reshape(-1, 1),
                                 np.asarray(s2).reshape(-1, 1))
            # Latency counts from the push that DISPATCHED the chunk
            # these windows came from, not from the harvesting push —
            # otherwise the pipelined path under-reports by one chunk
            # period.
            return self._drain(t_dispatch)
        return self._drain(t0)

    def flush(self) -> List[Dict]:
        """Harvests the in-flight chunk at stream end (pipelined mode
        defers each chunk's readback by one push)."""
        t0 = time.perf_counter()
        if self._inflight is not None:
            (s1, s2), t0 = self._inflight
            self._inflight = None
            self._store.add_data(np.asarray(s1).reshape(-1, 1),
                                 np.asarray(s2).reshape(-1, 1))
        return self._drain(t0)

    def _drain(self, t0: float) -> List[Dict]:
        decisions = []
        for w1, w2 in self._store.next_window():
            if w1 is None:
                break
            c1 = float(np.mean(w1))
            c2 = float(np.mean(w2))
            att = self._decide.attention(c1, c2)
            center = (self._windows_emitted * self._window_step +
                      self._window_width / 2.0)
            decisions.append({
                'window': self._windows_emitted,
                'time_s': round(center / self._frame_rate, 4),
                'score1': round(c1, 6),
                'score2': round(c2, 6),
                'attend_speaker1': bool(np.asarray(att[0]).reshape(-1)[0]
                                        >= 0.5),
                'latency_ms': round((time.perf_counter() - t0) * 1e3, 3),
            })
            self._windows_emitted += 1
        return decisions


def serve_stream(model_dir: str, eeg: np.ndarray, audio1: np.ndarray,
                 audio2: np.ndarray, *, chunk_size: int = 32,
                 reduction: Optional[str] = None, decision: str = 'wta',
                 window_width: int = 100, window_step: int = 50,
                 frame_rate: float = 100.0,
                 out_stream=None, pipeline: bool = False) -> List[Dict]:
    """Replays a recorded stream through the server; returns decisions.

    pipeline=True double-buffers dispatches through infer_pair_async
    (chunk k+1 dispatched before chunk k's readback). Measured on both
    available backends it does NOT pay — the relay tunnel serializes
    remote dispatches (sync 72 vs pipelined 83 ms/chunk) and on CPU
    the toy compute is dispatch-dominated (1.25 vs 1.40 ms/chunk) — so
    replay defaults to chunk-synchronous; the knob exists for on-prem
    attachments with genuinely async dispatch and heavier per-chunk
    compute. Decisions are value-identical either way.
    """
    decoder = _load_serving_decoder(model_dir, reduction)
    def orient(a):
        # Each array independently: an npz with audio1 stored [N, 1]
        # but audio2 stored flat [N] used to leave audio2 as [1, N]
        # and crash the server mid-stream.
        a = np.atleast_2d(np.asarray(a, np.float32))
        return a.T if a.shape[0] == 1 else a
    audio1 = orient(audio1)
    audio2 = orient(audio2)
    server = StreamingAttentionServer(
        decoder, eeg_channels=eeg.shape[1],
        audio_channels=audio1.shape[1], window_width=window_width,
        window_step=window_step, decision=decision,
        frame_rate=frame_rate, pipeline=pipeline)
    all_decisions = []
    for start in range(0, eeg.shape[0], chunk_size):
        sl = slice(start, start + chunk_size)
        for record in server.push(eeg[sl], audio1[sl], audio2[sl]):
            all_decisions.append(record)
            if out_stream is not None:
                out_stream.write(json.dumps(record) + '\n')
    for record in server.flush():
        all_decisions.append(record)
        if out_stream is not None:
            out_stream.write(json.dumps(record) + '\n')
    if all_decisions and out_stream is not None:
        lat = np.asarray([d['latency_ms'] for d in all_decisions])
        out_stream.write(json.dumps({
            'summary': True, 'windows': len(all_decisions),
            'latency_p50_ms': round(float(np.percentile(lat, 50)), 3),
            'latency_p95_ms': round(float(np.percentile(lat, 95)), 3),
        }) + '\n')
    return all_decisions


def serve_lines(model_dir: str, in_stream, *,
                reduction: Optional[str] = None, decision: str = 'wta',
                window_width: int = 100, window_step: int = 50,
                frame_rate: float = 100.0,
                out_stream=None, decoder=None) -> List[Dict]:
    """Line-protocol serving: JSON chunks in, JSON decisions out.

    Each input line is one acquisition chunk:
      {"eeg": [[ch...], ...], "audio1": [[a], ...], "audio2": [[a], ...]}
    A FLAT audio list is always mono frames ([N] -> [N, 1], never N
    channels); 2-D audio is [frames, channels], transposed when only
    the transpose matches the chunk's eeg frame count (and, after the
    first chunk, the server's established channel count). Decisions
    stream to out_stream as they complete, one JSON object per line,
    flushed per chunk — so an external acquisition process can drive
    the decoder with
      acquisition | tdt-serve --serve_model_dir M --serve_input -
    EOF ends the stream; returns all decisions.

    ``decoder`` short-circuits the per-call model load (the socket
    listener loads once and serves many sessions); streaming state is
    still per-call (a fresh StreamingAttentionServer per session).
    """
    if decoder is None:
        decoder = _load_serving_decoder(model_dir, reduction)
    server = None
    decisions: List[Dict] = []

    def orient_audio(raw, eeg_frames, known_channels):
        a = np.asarray(raw, np.float32)
        if a.ndim <= 1:
            # Flat list = mono frames. (Previously a flat multi-sample
            # list in a single-eeg-frame FIRST chunk was kept as [1, N]
            # — N bogus channels — wedging every later chunk.)
            a = a.reshape(-1, 1)
        elif known_channels is not None:
            if a.shape[1] != known_channels and \
                    a.shape[0] == known_channels:
                a = a.T
        elif a.shape[0] != eeg_frames and a.shape[1] == eeg_frames:
            a = a.T
        if known_channels is not None and a.shape[1] != known_channels:
            # Raised inside the caller's try block -> skip the line. A
            # shape that matches neither orientation must not reach
            # push(), where a concatenate error would kill the session.
            raise ValueError('audio shape %s does not match the '
                             'established %d channel(s)' %
                             (a.shape, known_channels))
        return a

    def orient_eeg(raw, known_channels):
        e = np.asarray(raw, np.float32)
        if e.ndim <= 1:
            # Flat list = mono frames, the same convention as the
            # audio fields. (np.atleast_2d would make it [1, N] — N
            # bogus channels — crashing the first push or wedging
            # every later chunk against the established channel
            # count.)
            e = e.reshape(-1, 1)
        elif known_channels is not None and \
                e.shape[1] != known_channels and \
                e.shape[0] == known_channels:
            e = e.T
        if known_channels is not None and e.shape[1] != known_channels:
            raise ValueError('eeg has %d channels, server expects %d'
                             % (e.shape[1], known_channels))
        return e

    for line in in_stream:
        line = line.strip()
        if not line:
            continue
        try:
            chunk = json.loads(line)
            if (isinstance(chunk, dict) and not chunk.get('eeg')
                    and not chunk.get('audio1')
                    and not chunk.get('audio2')):
                # Empty warmup/keepalive chunk. Skipping it BEFORE the
                # server is established matters: a zero-frame first
                # chunk orients to shape (0, 1) and would lock in
                # eeg_channels=1, wedging every real chunk of the
                # session against the wrong channel count.
                continue
            eeg = orient_eeg(chunk['eeg'],
                             None if server is None
                             else server.eeg_channels)
            known = None if server is None else server.audio_channels
            a1 = orient_audio(chunk['audio1'], eeg.shape[0], known)
            a2 = orient_audio(chunk['audio2'], eeg.shape[0], known)
        except Exception as error:
            # A live session must survive stray log lines / truncated
            # chunks from the acquisition process: report and skip.
            print('serve: skipping bad input line (%s): %.80s' %
                  (error, line), file=sys.stderr)
            continue
        if server is None and eeg.shape[0] == 0:
            # No frames yet: channel counts cannot be established from
            # a zero-frame chunk (it oriented to (0, 1) regardless of
            # the stream's real width) — wait for a real chunk.
            continue
        if server is None:
            # Live mode chases decision FRESHNESS: pipelining would
            # defer each chunk's decision until the NEXT chunk arrives
            # (a whole acquisition period, e.g. 320 ms at
            # chunk_size=32 / 100 Hz) to save one dispatch RTT —
            # the wrong trade for real-time feedback, so the live
            # protocol stays chunk-synchronous.
            server = StreamingAttentionServer(
                decoder, eeg_channels=eeg.shape[1],
                audio_channels=a1.shape[1],
                window_width=window_width, window_step=window_step,
                decision=decision, frame_rate=frame_rate,
                pipeline=False)
        try:
            records = server.push(eeg, a1, a2)
        except Exception as error:
            # A malformed-but-parseable chunk (e.g. a width the model
            # wasn't trained for) must not kill the live session
            # either: report, skip, keep serving.
            print('serve: skipping bad chunk (%s): %.80s' %
                  (error, line), file=sys.stderr)
            continue
        for record in records:
            decisions.append(record)
            if out_stream is not None:
                out_stream.write(json.dumps(record) + '\n')
                out_stream.flush()
    if server is not None:
        for record in server.flush():
            decisions.append(record)
            if out_stream is not None:
                out_stream.write(json.dumps(record) + '\n')
                out_stream.flush()
    return decisions


def _parse_tcp(address: str) -> tuple:
    """'tcp://HOST:PORT' -> (host, port). Empty host binds all
    interfaces; port 0 asks the OS for a free one (tests)."""
    rest = address[len('tcp://'):]
    host, sep, port = rest.rpartition(':')
    if not sep or not port.isdigit():
        raise ValueError(
            'serve: bad TCP address %r (want tcp://HOST:PORT, e.g. '
            'tcp://0.0.0.0:7355)' % address)
    # RFC 3986 bracketed IPv6 literal: tcp://[::1]:7355. The brackets
    # are address-syntax only — the resolver wants the bare address.
    if host.startswith('[') and host.endswith(']'):
        host = host[1:-1]
    return host, int(port)


def serve_socket(model_dir: str, address: str, *,
                 reduction: Optional[str] = None, decision: str = 'wta',
                 window_width: int = 100, window_step: int = 50,
                 frame_rate: float = 100.0,
                 max_sessions: Optional[int] = None,
                 idle_timeout_s: float = 0.0,
                 on_bound=None) -> List[int]:
    """TCP listener speaking the line protocol over each connection.

    The deployment shape for a networked acquisition box: the model
    loads ONCE, then connections are accepted serially — sessions
    share one decoder (and one device) so interleaving them would
    interleave their dispatches without speeding either up, and each
    session gets FRESH streaming state (context buffers, window
    stores, decision rule), exactly as if it were its own
    ``--serve_input -`` run. Chunks arrive as JSON lines on the
    socket; decisions return on the same socket, flushed per chunk. A
    client half-close (shutdown(SHUT_WR)) ends its session cleanly
    and flushes the remaining windows; an abrupt disconnect is logged
    and the listener keeps serving.

    ``max_sessions`` bounds how many connections are served (None =
    forever); ``on_bound(host, port)`` reports the actual listening
    address (port 0 binds an OS-assigned one). Returns the per-session
    decision counts (for tests/monitoring).

    A client that disappears WITHOUT sending RST (power loss, network
    partition) would block the serial listener's readline() forever —
    no OSError arrives for a silently dead peer. Every session gets
    TCP keepalive, and ``idle_timeout_s`` > 0 (--serve_idle_timeout_s)
    additionally aborts a session when no data arrives for that long
    (socket.timeout is an OSError, so it rides the existing
    abort-and-keep-serving path).
    """
    import socket
    host, port = _parse_tcp(address)
    decoder = _load_serving_decoder(model_dir, reduction)
    if ':' in host:
        # IPv6 literal: create_server only speaks AF_INET by default.
        srv = socket.create_server((host, port),
                                   family=socket.AF_INET6)
    else:
        srv = socket.create_server((host, port))
    try:
        bound_host, bound_port = srv.getsockname()[:2]
        print('serve: listening on %s:%d' % (bound_host, bound_port),
              file=sys.stderr)
        if on_bound is not None:
            on_bound(bound_host, bound_port)
        counts: List[int] = []
        while max_sessions is None or len(counts) < max_sessions:
            conn, peer = srv.accept()
            print('serve: session %d from %s:%d' %
                  (len(counts), peer[0], peer[1]), file=sys.stderr)
            try:
                with conn:
                    conn.setsockopt(socket.SOL_SOCKET,
                                    socket.SO_KEEPALIVE, 1)
                    if idle_timeout_s > 0:
                        conn.settimeout(idle_timeout_s)
                    reader = conn.makefile('r', encoding='utf-8',
                                           newline='\n')
                    writer = conn.makefile('w', encoding='utf-8',
                                           newline='\n')
                    try:
                        decisions = serve_lines(
                            model_dir, reader, reduction=reduction,
                            decision=decision,
                            window_width=window_width,
                            window_step=window_step,
                            frame_rate=frame_rate,
                            out_stream=writer, decoder=decoder)
                    finally:
                        # makefile objects hold a reference on the
                        # socket: until BOTH close, conn.close() never
                        # sends FIN and the client waits for EOF
                        # forever while this loop accepts the next
                        # session.
                        for f in (writer, reader):
                            try:
                                f.close()
                            except OSError:
                                pass
                    counts.append(len(decisions))
            except (OSError, UnicodeDecodeError) as error:
                # A misbehaving client must not kill the long-lived
                # listener: disconnects (BrokenPipe/ConnectionReset/
                # ETIMEDOUT are all OSErrors) and non-UTF-8 bytes from
                # a port scanner or TLS probe (the strict utf-8 reader
                # raises UnicodeDecodeError). Bad JSON and bad chunks
                # are already skipped per line inside serve_lines.
                # The partial session still counts.
                print('serve: session %d aborted (%s)' %
                      (len(counts), error), file=sys.stderr)
                counts.append(-1)
        return counts
    finally:
        srv.close()


def _selftest(out_stream) -> None:
    """Toy invertible model end to end: decisions must track the
    planted attention switch (>90% of unambiguous windows)."""
    import tempfile
    from telluride_decoding_tpu.data.brain_data import TestBrainData
    from telluride_decoding_tpu.models.brain_model import (
        BrainModelLinearRegression)

    rng = np.random.RandomState(42)
    n = 6000
    a1 = np.abs(rng.randn(n, 1)).astype(np.float32)
    a2 = np.abs(rng.randn(n, 1)).astype(np.float32)
    attend = (np.arange(n) >= n // 2)           # Switch at midpoint.
    attended = np.where(attend[:, None], a2, a1)
    eeg = (attended * 2.0 - 1.0 +
           0.05 * rng.randn(n, 1)).astype(np.float32)

    model = BrainModelLinearRegression(input_width=1, output_width=1,
                                       regularization_lambda=1e-4)
    bd = TestBrainData('input_1', 'output', 100.0)
    bd.preserve_test_data(eeg[:n // 2], a1[:n // 2])
    model.fit(bd.create_dataset('train'))
    model.add_metadata({'pre_context': 0, 'post_context': 0,
                        'input2_pre_context': 0,
                        'input2_post_context': 0,
                        'dnn_regressor': 'linear'}, dataset=None)
    tmp = tempfile.mkdtemp()
    model.save(tmp)
    dec = infer_decoder.create_decoder(tmp, reduction='first')
    dec.load_decoding_model(tmp)
    dec.add_data_correlator(a1[:n // 2], a1[:n // 2])
    dec.save_parameters(os.path.join(tmp, 'decoder_model.json'))

    decisions = serve_stream(tmp, eeg, a1, a2, chunk_size=64,
                             reduction='first', decision='wta',
                             window_width=100, window_step=100,
                             out_stream=out_stream)
    correct = sum(
        d['attend_speaker1'] != (d['time_s'] >= (n // 2) / 100.0)
        for d in decisions)
    frac = correct / max(len(decisions), 1)
    print('selftest: %d windows, %.1f%% correct' %
          (len(decisions), 100 * frac), file=sys.stderr)
    if frac <= 0.9:
        raise SystemExit('selftest FAILED: %.3f <= 0.9' % frac)


def main(argv):
    if len(argv) > 1:
        raise app.UsageError('Too many command-line arguments: %s.' % argv)
    from telluride_decoding_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache)
    enable_persistent_compilation_cache()
    tcp_mode = bool(FLAGS.serve_input
                    and FLAGS.serve_input.startswith('tcp://')
                    and not FLAGS.selftest)
    # TCP mode writes decisions back on each client's socket and never
    # touches --serve_output; opening it eagerly would truncate an
    # existing decisions file for nothing.
    out = (open(FLAGS.serve_output, 'w')
           if FLAGS.serve_output and not tcp_mode else sys.stdout)
    if tcp_mode and FLAGS.serve_output:
        print('serve: --serve_output is ignored in TCP mode '
              '(decisions return on each session socket)',
              file=sys.stderr)
    if FLAGS.selftest:
        _selftest(out)
        return
    if not FLAGS.serve_model_dir or not FLAGS.serve_input:
        raise app.UsageError('Need --serve_model_dir and --serve_input '
                             '(or --selftest).')
    # Only an EXPLICIT --serve_reduction is a request; the flag default
    # must not conflict with an AOT artifact's baked-in reduction (None
    # lets the artifact decide; live model dirs fall back to 'lda').
    # using_default_value (not .present) so programmatic assignment by
    # embedding callers of main() counts as explicit too.
    reduction = (FLAGS.serve_reduction
                 if not FLAGS['serve_reduction'].using_default_value
                 else None)
    if tcp_mode:
        # Networked line protocol: acquisition boxes connect and push
        # JSON chunks; decisions return on the socket.
        serve_socket(FLAGS.serve_model_dir, FLAGS.serve_input,
                     reduction=reduction,
                     decision=FLAGS.serve_decoder,
                     window_width=FLAGS.serve_window_width,
                     window_step=FLAGS.serve_window_step,
                     frame_rate=FLAGS.serve_frame_rate,
                     idle_timeout_s=FLAGS.serve_idle_timeout_s)
        return
    if FLAGS.serve_input == '-':
        # Live line protocol: an external acquisition loop pipes JSON
        # chunks in; decisions stream out per chunk.
        serve_lines(FLAGS.serve_model_dir, sys.stdin,
                    reduction=reduction,
                    decision=FLAGS.serve_decoder,
                    window_width=FLAGS.serve_window_width,
                    window_step=FLAGS.serve_window_step,
                    frame_rate=FLAGS.serve_frame_rate, out_stream=out)
        return
    data = np.load(FLAGS.serve_input)
    serve_stream(FLAGS.serve_model_dir, data['eeg'], data['audio1'],
                 data['audio2'], chunk_size=FLAGS.chunk_size,
                 reduction=reduction,
                 decision=FLAGS.serve_decoder,
                 window_width=FLAGS.serve_window_width,
                 window_step=FLAGS.serve_window_step,
                 frame_rate=FLAGS.serve_frame_rate, out_stream=out,
                 pipeline=FLAGS.serve_pipeline)


define_flags()


def app_main():
    app.run(main)


if __name__ == '__main__':
    app_main()
