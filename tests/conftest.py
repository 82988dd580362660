"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real-TPU behavior is exercised by bench.py and the driver's graft entry;
the test suite validates numerics and sharding on host CPU devices
(fast, deterministic, no tunnel needed).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax

# The image's sitecustomize pins JAX_PLATFORMS=axon (the tunneled TPU);
# the config update below still wins as long as no computation ran yet.
jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="session")
def fixtures_dir() -> pathlib.Path:
    return FIXTURES


def fixture_streams(prefix: str = "", codec: str = "vp9"):
    """(name, ivf_path, md5_path) for every checked-in fixture stream.

    VP8 fixtures use the `v8` name prefix and are excluded from the VP9
    sweeps (and vice versa)."""
    out = []
    for ivf in sorted(FIXTURES.glob(f"{prefix}*.ivf")):
        is_vp8 = ivf.stem.startswith("v8")
        if (codec == "vp8") != is_vp8:
            continue
        md5 = ivf.with_suffix(".md5")
        out.append((ivf.stem, ivf, md5))
    return out


# ---- normative-decoder oracle (libavcodec vp9) for encoder round-trips

import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))

from make_fixtures import ORACLE_BIN  # noqa: E402


def build_oracle_or_skip():
    import make_fixtures
    try:
        make_fixtures.build_oracle()
    except Exception as e:  # no libavcodec dev env
        pytest.skip(f"oracle tool unavailable: {e}")
