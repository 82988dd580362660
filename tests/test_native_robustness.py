"""Native-parser memory safety: an ASAN-instrumented truncation and
corruption sweep over real fixture packets (libvpx invalid_file_test.cc
analog, run under AddressSanitizer).

Catches the class of bug where an untrusted bitstream size field
(e.g. compressed_size, a raw 16-bit header field) drives reads past the
frame buffer."""

import pathlib
import subprocess
import sys

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
    # scrub any inherited LD_PRELOAD (e.g. stdbuf's libstdbuf.so): a
    # foreign preload loads before the shared ASan runtime and aborts it
    import os
    env = {k: v for k, v in os.environ.items() if k != "LD_PRELOAD"}
    res = subprocess.run([str(asan_binary)] + pkt_files,
                         capture_output=True, text=True, timeout=600,
                         env=env)
    assert res.returncode == 0, \
        f"ASAN sweep failed:\n{res.stdout}\n{res.stderr[-4000:]}"
    assert "OK" in res.stdout


@pytest.fixture(scope="module")
def asan_so(tmp_path_factory):
    """libvp9host.so built with AddressSanitizer (loaded via ctypes in
    a subprocess with libasan preloaded)."""
    out = tmp_path_factory.mktemp("asan_so") / "libvp9host.so"
    subprocess.check_call(
        ["g++", "-O1", "-g", "-shared", "-fPIC", "-pthread",
         "-fsanitize=address", "-fno-omit-frame-pointer",
         "-o", str(out), str(NATIVE / "vp9host.cpp")])
    libasan = subprocess.check_output(
        ["g++", "-print-file-name=libasan.so"], text=True).strip()
    return out, libasan


@pytest.mark.parametrize("case", [(2, 5), (1, 2), (3, 9), (4, 0)])
def test_asan_bitflip_pack_sweep(asan_so, tmp_path, case):
    """Bitflipped-but-parseable streams must drive the native PACKER
    without any out-of-bounds access (this caught a heap overflow in
    the intra wave-map fill for tx blocks straddling the frame edge).
    Runs in a subprocess: the instrumented .so is staged over the
    production one via a bind-style copy in a temp package view."""
    import os
    import shutil
    so, libasan = asan_so
    fix = {s[0]: s for s in fixture_streams()}
    _, ivf, _ = fix["in01_176x144"]
    # stage the instrumented library where the package loads it from,
    # restore afterwards.  MUST be an atomic rename, never a copy-over:
    # copy2 truncates the existing inode, corrupting the mapping any
    # already-loaded CDLL in THIS process points at (segfaults later)
    prod = NATIVE / "libvp9host.so"
    backup = tmp_path / "prod.so"
    shutil.copy2(prod, backup)
    stage = NATIVE / f".asan_stage.{os.getpid()}"
    shutil.copy2(so, stage)
    os.replace(stage, prod)
    try:
        env = dict(os.environ, LD_PRELOAD=libasan,
                   ASAN_OPTIONS="detect_leaks=0",
                   PYTHONPATH=str(HERE.parent))
        env.pop("PALLAS_AXON_POOL_IPS", None)
        r = subprocess.run(
            [sys.executable, str(HERE / "fuzz_pack_worker.py"),
             str(ivf), str(case[0]), str(case[1])],
            capture_output=True, text=True, timeout=600, env=env)
        assert r.returncode == 0 and "ok" in r.stdout, \
            (r.stdout[-500:], r.stderr[-3000:])
    finally:
        stage = NATIVE / f".asan_restore.{os.getpid()}"
        shutil.copy2(backup, stage)
        os.replace(stage, prod)
