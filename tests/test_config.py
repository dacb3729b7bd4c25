"""Config-schema round-trip over every reference control file.

The reference's own config test deserializes every yaml one level under
``test/`` through its pydantic model (``troute-config/test/test_config.py:
13-21``); this is the same contract against our schema, extended to the
six NWM operational configs.
"""

from pathlib import Path

import pytest

from troute_tpu.config import load_config

REF_TEST = Path("/root/reference/test")

pytestmark = pytest.mark.skipif(not REF_TEST.exists(),
                                reason="reference test dir not available")


def _control_files():
    # same glob depth as the reference test: control files live one level
    # under test/, domain/crosswalk yamls live deeper and are excluded
    files = sorted(REF_TEST.glob("*/*.yaml"))
    files += sorted(REF_TEST.glob("operational_configurations/*.yaml"))
    return sorted(set(files))


@pytest.mark.parametrize("file", _control_files(), ids=lambda p: p.name)
def test_reference_config_round_trip(file):
    cfg = load_config(file)
    # every control file carries the core blocks our CLI routes from
    assert cfg.compute_parameters is not None
    fp = cfg.compute_parameters.forcing_parameters
    assert fp.dt > 0 and fp.qts_subdivisions >= 1
