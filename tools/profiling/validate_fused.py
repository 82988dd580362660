import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..'))
os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..'))
import os, glob, sys
from cuda_vp9_tpu.decoder.frame import native_decode_stream_md5
from cuda_vp9_tpu.runtime.pipeline import TpuReconFused

nf = int(os.environ.get("NF", "8"))
fails = 0
for ivf in sorted(glob.glob("tests/fixtures/*.ivf")):
    name = os.path.basename(ivf)[:-4]
    want = [l.split()[0] for l in open(ivf[:-4] + ".md5").read().splitlines()]
    recon = TpuReconFused()
    got = []
    try:
        for i, md5 in native_decode_stream_md5(ivf, max_frames=nf, recon_fn=recon):
            got.append(md5)
    except Exception as e:
        import traceback; traceback.print_exc()
        print(f"{name}: EXC {type(e).__name__}: {e}", flush=True)
        fails += 1
        continue
    n = len(got)
    if got != want[:n]:
        bad = [i for i in range(n) if got[i] != want[i]]
        print(f"{name}: MISMATCH frames {bad} (dev={recon.frames_on_device} host={recon.frames_on_host})", flush=True)
        fails += 1
    else:
        print(f"{name}: ok {n} (dev={recon.frames_on_device} host={recon.frames_on_host})", flush=True)
print("FAILS:", fails)
