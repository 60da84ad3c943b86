import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from kgforge.conf import get_spark  # noqa: E402
from kgforge.synth import write_fixture  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    sp = get_spark("kgforge-tests", cpus=8, shuffle_partitions=8)
    yield sp


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("kgf_fixture")
    write_fixture(str(out), n_pages=200, seed=42)
    return str(out)


@pytest.fixture(scope="session")
def sf001():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf01():
    return "/root/testdata/sf0.01"
