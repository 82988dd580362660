import sys, time
import os
_root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
sys.path.insert(0, _root)
sys.path.insert(0, os.path.join(_root, "tools"))
os.chdir(_root)
import make_fixtures, subprocess, os
os.makedirs(".bench", exist_ok=True)
ivf = ".bench/bench_3840x2176.ivf"
if not os.path.exists(ivf):
    make_fixtures.build_oracle()
    yuv = ".bench/4k.yuv"
    with open(yuv, "wb") as f:
        f.write(make_fixtures.synth_video(3840, 2176, 6))
    subprocess.check_call([make_fixtures.ORACLE_BIN, "encode", "3840", "2176",
                           yuv, ivf, "gop=9999", "crf=34", "cpu_used=5"])
    os.unlink(yuv)
    print("4K stream generated", flush=True)

from cuda_vp9_tpu.containers import IvfReader
from cuda_vp9_tpu.decoder.frame import NativeVp9Decoder
from cuda_vp9_tpu.runtime.pipeline import TpuReconFused

with IvfReader(ivf) as r:
    packets = [d for d, _ in r]
print(f"{len(packets)} packets", flush=True)
recon = TpuReconFused()
dec = NativeVp9Decoder(recon_fn=recon)
frames = []
t0 = time.time()
for i, p in enumerate(packets):
    t1 = time.time()
    dec.decode(p)
    frames.extend(dec.frames())
    print(f"pkt {i}: {time.time()-t1:.1f}s", flush=True)
t_decode = time.time() - t0
for f in frames:
    f.visible_planes()
print(f"4K: {len(frames)} frames decoded+fetched in {time.time()-t0:.1f}s "
      f"(decode {t_decode:.1f}s) dev={recon.frames_on_device} host={recon.frames_on_host}", flush=True)
# second pass timed (compiles cached)
recon2 = TpuReconFused()
dec2 = NativeVp9Decoder(recon_fn=recon2)
t0 = time.time()
frames = []
for p in packets:
    dec2.decode(p)
    frames.extend(dec2.frames())
for f in frames:
    f.visible_planes()
dt = time.time() - t0
print(f"4K steady: {len(frames)} frames {dt:.2f}s = {len(frames)/dt:.2f} fps", flush=True)
