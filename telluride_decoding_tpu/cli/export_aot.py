"""Export a trained model directory as an AOT StableHLO serving artifact.

The reference deploys by reloading its Keras SavedModel in every
serving process (reference infer_decoder.py:250-286), which requires
TensorFlow plus the model zoo at the serving site. This tool instead
serializes the decoder's fused two-speaker inference program — weights,
correlation statistics and LDA parameters baked in — via jax.export
(decode/aot.py); `tdt-serve` detects and serves the artifact directly,
with no model classes and no retracing.

Usage:
  tdt-export-aot MODEL_DIR ARTIFACT_DIR [--reduction lda]
                 [--platforms tpu,cpu] [--input_widths W1,W2]
                 [--output_width W]

Widths default to the telluride metadata embedded by tdt-decoding;
the explicit flags cover models saved without shape metadata.
"""

from __future__ import annotations

import sys


def export(model_dir: str, artifact_dir: str, *,
           reduction: str = 'lda', platforms=('tpu', 'cpu'),
           input_widths=None, output_width=None) -> None:
    from telluride_decoding_tpu.cli.infer import load_model
    from telluride_decoding_tpu.decode import aot
    decoder = load_model(model_dir, reduction)
    manifest = aot.export_decoder(decoder, artifact_dir,
                                  platforms=platforms,
                                  input_widths=input_widths,
                                  output_width=output_width)
    print('Exported %s -> %s (reduction=%s, platforms=%s, '
          'input widths %d/%d)'
          % (model_dir, artifact_dir, manifest['reduction'],
             ','.join(manifest['platforms']), manifest['input_1_width'],
             manifest['input_2_width']))


_USAGE = ('usage: export_aot MODEL_DIR ARTIFACT_DIR '
          '[--reduction lda] [--platforms tpu,cpu] '
          '[--input_widths W1,W2] [--output_width W]')


def app_main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    opts = {'reduction': 'lda', 'platforms': 'tpu,cpu',
            'input_widths': None, 'output_width': None}
    positional = []
    i = 0
    while i < len(argv):
        arg = argv[i]
        name = arg[2:].split('=', 1)[0] if arg.startswith('--') else None
        if name in opts:
            if '=' in arg:
                opts[name] = arg.split('=', 1)[1]
                i += 1
            else:
                if i + 1 >= len(argv):
                    raise SystemExit('--%s needs a value\n%s'
                                     % (name, _USAGE))
                opts[name] = argv[i + 1]
                i += 2
        else:
            positional.append(arg)
            i += 1
    if len(positional) != 2:
        raise SystemExit(_USAGE)
    input_widths = None
    if opts['input_widths']:
        try:
            input_widths = tuple(
                int(w) for w in opts['input_widths'].split(','))
        except ValueError:
            raise SystemExit('--input_widths must be two integers '
                             'W1,W2 (got %r)\n%s'
                             % (opts['input_widths'], _USAGE))
        if len(input_widths) != 2:
            raise SystemExit('--input_widths must be exactly two '
                             'integers W1,W2 (got %r)\n%s'
                             % (opts['input_widths'], _USAGE))
    try:
        output_width = (int(opts['output_width'])
                        if opts['output_width'] else None)
    except ValueError:
        raise SystemExit('--output_width must be an integer (got %r)\n%s'
                         % (opts['output_width'], _USAGE))
    platforms = tuple(p.strip() for p in opts['platforms'].split(',')
                      if p.strip())
    known = ('tpu', 'cpu', 'cuda', 'rocm')
    bad = [p for p in platforms if p not in known]
    if (not platforms or bad
            or len(set(platforms)) != len(platforms)):
        raise SystemExit('--platforms must be a comma list of DISTINCT '
                         'names drawn from %s (got %r)\n%s'
                         % (','.join(known), opts['platforms'], _USAGE))
    export(positional[0], positional[1], reduction=opts['reduction'],
           platforms=platforms,
           input_widths=input_widths, output_width=output_width)


if __name__ == '__main__':
    app_main()
