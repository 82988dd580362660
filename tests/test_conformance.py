"""Bitstream conformance: per-frame MD5 against the normative decoder.

The analog of the reference's test_vector_test.cc MD5Match
(libvpx/test/test_vector_test.cc:112) over the checked-in fixture corpus.
"""

import os

import pytest

from cuda_vp9_tpu.decoder.frame import (decode_stream_md5,
                                        native_decode_stream_md5)

from conftest import fixture_streams

FAST_FRAMES = int(os.environ.get("CONFORMANCE_FRAMES", "4"))

# xl* (2560x1440 / 3840x2176 north-star geometries) skip the fast tier:
# a 4-frame host-oracle decode at 4K costs minutes.  They run in the
# slow tier and through the fused device suite (test_fused_recon).
FAST_STREAMS = [s for s in fixture_streams()
                if not s[0].startswith("xl")]


@pytest.mark.parametrize("name,ivf,md5", FAST_STREAMS,
                         ids=[s[0] for s in FAST_STREAMS])
def test_md5_match_fast(name, ivf, md5):
    golden = [line.split()[0] for line in md5.read_text().splitlines()]
    n = 0
    for i, digest in decode_stream_md5(str(ivf), max_frames=FAST_FRAMES):
        assert digest == golden[i], f"{name} frame {i} MD5 mismatch"
        n += 1
    assert n > 0


@pytest.mark.parametrize("name,ivf,md5", FAST_STREAMS,
                         ids=[s[0] for s in FAST_STREAMS])
def test_native_md5_match_fast(name, ivf, md5):
    """The C++ parser is the decoder the public codec API prefers — gate
    its bitstream correctness in the default (fast) tier, NumPy recon."""
    golden = [line.split()[0] for line in md5.read_text().splitlines()]
    n = 0
    for i, digest in native_decode_stream_md5(str(ivf),
                                              max_frames=FAST_FRAMES):
        assert digest == golden[i], f"{name} frame {i} MD5 mismatch (native)"
        n += 1
    assert n > 0


@pytest.mark.slow
@pytest.mark.parametrize("name,ivf,md5", fixture_streams(),
                         ids=[s[0] for s in fixture_streams()])
def test_md5_match_full(name, ivf, md5):
    golden = [line.split()[0] for line in md5.read_text().splitlines()]
    n = 0
    for i, digest in decode_stream_md5(str(ivf)):
        assert digest == golden[i], f"{name} frame {i} MD5 mismatch"
        n += 1
    assert n == len(golden)
