"""The public flag surface is a superset of the reference's.

VERDICT/README claim exact flag compatibility per driver; this pins it
mechanically against the reference sources (skipped when the read-only
reference checkout is not present, e.g. for end users).
"""

import os
import re

import pytest

REF = '/root/reference/telluride_decoding'
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason='reference checkout not present')

HERE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'telluride_decoding_tpu', 'cli')

_DEFINE = re.compile(r"flags\.DEFINE_\w+\(\s*'(\w+)'")


def _flags_of(path):
    return set(_DEFINE.findall(open(path).read()))


@pytest.mark.parametrize('ref_file,our_file', [
    ('decoding.py', 'decoding.py'),
    ('infer.py', 'infer.py'),
    ('regression.py', 'regression.py'),
    ('regression_data.py', 'regression_data.py'),
    ('add_trigger.py', 'add_trigger.py'),
])
def test_flag_surface_is_superset(ref_file, our_file):
    ref = _flags_of(os.path.join(REF, ref_file))
    ours = _flags_of(os.path.join(HERE, our_file))
    # regression.py shares decoding.py's surface via define_flags();
    # include it when comparing (the reference defines flags at module
    # scope and imports decoding's).
    if our_file == 'regression.py':
        ours |= _flags_of(os.path.join(HERE, 'decoding.py'))
        ref -= _flags_of(os.path.join(REF, 'decoding.py'))
    missing = ref - ours
    assert not missing, ('reference flags missing from %s: %s' %
                         (our_file, sorted(missing)))


def test_decoding_flag_count_sanity():
    # The reference defines ~35-41 decoding flags; a regex regression
    # that suddenly collects none would make the superset test pass
    # vacuously.
    assert len(_flags_of(os.path.join(REF, 'decoding.py'))) >= 30
    assert len(_flags_of(os.path.join(HERE, 'decoding.py'))) >= 30
