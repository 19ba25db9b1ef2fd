"""Trigger authoring tool: inject event pulses into a wav's 2nd channel.

Capability parity with the reference add_trigger.py (random event times
with minimum-interval rejection :57-100, pulse/tone injection :103-151,
wav I/O :154-177). The reference's broken google3.pyglib.gfile import
(:44) is replaced with plain local file I/O. The sampler uses the
exact spacing construction with a seedable RNG (one draw, succeeds
whenever the constraint is feasible; the reference's prune-and-retry
loop can return None at high event densities).
"""

from __future__ import annotations

from typing import Optional

from absl import app
from absl import flags
from absl import logging

import numpy as np
import scipy.io.wavfile

FLAGS = flags.FLAGS


def define_flags():
    if 'input_filename' in FLAGS:
        return
    flags.DEFINE_string('input_filename', None, 'Input audio filename')
    flags.DEFINE_string('output_filename', None, 'Output audio filename')
    flags.DEFINE_integer('number_of_events', -1,
                         'Number of events to add (-X for 1 per X '
                         'seconds.)')
    flags.DEFINE_boolean('verbose', False, 'Show log messages.')
    flags.DEFINE_float('pulse_length', 0.1, 'Length of the pulse (seconds)')
    flags.DEFINE_float('pulse_freq', 0, 'Frequency of the pulse (Hz)')


def random_times(duration: float, number: int,
                 minimum_interval: float = 0.5,
                 include_zero: bool = True,
                 rng: Optional[np.random.RandomState] = None):
    """Sorted random event times with a guaranteed minimum spacing.

    Exact spacing construction: subtracting i * minimum_interval from
    the i-th sorted event maps the constrained space onto plain sorted
    uniforms, so one draw always succeeds when the constraint is
    feasible. (The reference's retry sampler — and a naive
    draw-and-check — fail outright at the default 1-event/s density,
    where the probability of all gaps clearing 0.5 s is vanishing.)
    """
    if (number - 1) * minimum_interval > duration:
        raise ValueError('Not enough time for %d events with %gs between '
                         'them in %gs.' % (number, minimum_interval,
                                           duration))
    number = int(number)
    rng = rng or np.random.RandomState()
    if number <= 0:
        return np.zeros((0,), np.float64)
    free = duration - (number - 1) * minimum_interval
    if include_zero:
        u = (np.sort(rng.uniform(0, free, size=number - 1))
             if number > 1 else np.zeros((0,)))
        return np.concatenate(
            [[0.0], u + minimum_interval * np.arange(1, number)])
    u = np.sort(rng.uniform(0, free, size=number))
    return u + minimum_interval * np.arange(number)


def add_events_to_audio(audio_signal: np.ndarray, event_times,
                        fs: float = 16000, pulse_length: float = 0.1,
                        pulse_freq: float = 0) -> np.ndarray:
    """Returns stereo int16 audio: original in ch 0, pulses in ch 1."""
    if not isinstance(audio_signal, np.ndarray):
        raise TypeError('audio signal must be an np.ndarray')
    audio_signal = audio_signal.astype(np.int16).squeeze()
    if audio_signal.ndim > 1:
        audio_signal = np.mean(
            audio_signal, axis=tuple(range(1, audio_signal.ndim)))
    if audio_signal.ndim != 1:
        raise TypeError('audio signal (after squeezing) must be '
                        '1-dimensional.')
    if fs < 8000.0:
        raise ValueError('Sampling rate is generally > 8000Hz.')
    if not isinstance(event_times, (list, np.ndarray)) or \
            len(event_times) < 3:
        raise ValueError('event_times must be a list of at least 3 '
                         'elements.')
    audio_length = audio_signal.shape[0]
    new_channel = np.zeros((audio_length, 1), dtype=np.float64)
    for t in np.asarray(event_times) * fs:
        t = int(t)
        new_channel[t:t + int(fs * pulse_length)] = 32767
    if pulse_freq > 0:
        phase = np.arange(audio_length).reshape(-1, 1) / float(fs)
        new_channel = new_channel * np.sin(2 * np.pi * pulse_freq * phase)
    return np.concatenate(
        (audio_signal.reshape(-1, 1), new_channel.reshape(-1, 1)),
        axis=1).astype(np.int16)


def read_audio_wave_file(audio_filename: str):
    if not isinstance(audio_filename, str):
        raise TypeError('audio_filename must be a string.')
    fs, audio_signal = scipy.io.wavfile.read(audio_filename)
    return fs, audio_signal


def write_audio_wave_file(audio_filename: str, audio_signal: np.ndarray,
                          fs: float):
    if not isinstance(audio_filename, str):
        raise TypeError('audio_filename must be a string.')
    if not isinstance(audio_signal, np.ndarray):
        raise TypeError('audio_signal must be an np.ndarray')
    scipy.io.wavfile.write(audio_filename, int(fs), audio_signal)


def main(_):
    if FLAGS.verbose:
        logging.set_verbosity(logging.INFO)
    if FLAGS.pulse_length <= 0.0:
        raise ValueError('Pulse length (%g) must be greater than 0.' %
                         FLAGS.pulse_length)
    audio_fs, audio_signal = read_audio_wave_file(FLAGS.input_filename)
    audio_seconds = audio_signal.shape[0] / float(audio_fs)
    if FLAGS.number_of_events < 0:
        number = int(audio_seconds) // (-FLAGS.number_of_events)
    elif FLAGS.number_of_events == 0:
        raise ValueError('Can not add 0 events.')
    else:
        number = FLAGS.number_of_events
    event_times = random_times(audio_seconds - 2 * FLAGS.pulse_length,
                               number=number, minimum_interval=0.5,
                               include_zero=True)
    stereo = add_events_to_audio(audio_signal, event_times, audio_fs,
                                 pulse_length=FLAGS.pulse_length,
                                 pulse_freq=FLAGS.pulse_freq)
    write_audio_wave_file(FLAGS.output_filename, stereo, audio_fs)
    print('Wrote %d events to %s.' % (len(event_times),
                                      FLAGS.output_filename))


define_flags()


def app_main():
    flags.mark_flags_as_required(['input_filename', 'output_filename'])
    app.run(main)


if __name__ == '__main__':
    app_main()
