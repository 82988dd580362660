"""Native-parser memory safety: an ASAN-instrumented truncation and
corruption sweep over real fixture packets (libvpx invalid_file_test.cc
analog, run under AddressSanitizer).

Catches the class of bug where an untrusted bitstream size field
(e.g. compressed_size, a raw 16-bit header field) drives reads past the
frame buffer."""

import pathlib
import subprocess

import pytest

from cuda_vp9_tpu.containers import IvfReader

from conftest import fixture_streams

HERE = pathlib.Path(__file__).parent
NATIVE = HERE.parent / "cuda_vp9_tpu" / "native"


@pytest.fixture(scope="module")
def asan_binary(tmp_path_factory):
    out = tmp_path_factory.mktemp("asan") / "native_trunc_check"
    subprocess.check_call(
        ["g++", "-O1", "-g", "-fsanitize=address", "-fno-omit-frame-pointer",
         "-o", str(out), str(HERE / "native_trunc_main.cpp"),
         str(NATIVE / "vp9host.cpp"), "-I", str(NATIVE)])
    return out


@pytest.mark.parametrize("name", ["kf02_176x144", "in01_176x144",
                                  "tl01_640x360_t2"])
def test_asan_truncation_sweep(asan_binary, tmp_path, name):
    fix = {s[0]: s for s in fixture_streams()}
    _, ivf, _ = fix[name]
    pkt_files = []
    with IvfReader(str(ivf)) as r:
        for i, (data, _pts) in enumerate(r):
            if i >= 3:
                break
            p = tmp_path / f"pkt{i}.bin"
            p.write_bytes(data)
            pkt_files.append(str(p))
    res = subprocess.run([str(asan_binary)] + pkt_files,
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, \
        f"ASAN sweep failed:\n{res.stdout}\n{res.stderr[-4000:]}"
    assert "OK" in res.stdout
