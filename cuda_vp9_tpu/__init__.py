"""cuda_vp9_tpu — a TPU-native VP9 video decoder framework.

Built from scratch with the capability surface of RomBik17/CUDA-VP9 (a
CUDA-accelerated fork of libvpx v1.9; see SURVEY.md).  The serial bitstream
work (header parse, bool/range entropy decode of modes, motion vectors and
transform coefficients) runs on the TPU-VM host and emits dense per-frame
tensors; the whole reconstruction stage (inverse DCT/ADST/WHT transforms,
8-tap sub-pel motion compensation, the 10 intra prediction modes, and the
deblocking loop filter) runs as batched JAX/Pallas kernels on TPU.

Package layout:
  codec/       public codec API (vpx_codec_dec_init/decode/get_frame parity)
  containers/  IVF / WebM stream I/O; Y4M + raw YUV input for encoding
  decoder/     host bitstream layer: bool decoder, headers, modes, tokens
  encoder/     VP9 encoder: intra-only fixed-QP bitstream writer (vpxenc)
  models/      VP9 normative entropy models: trees, default probs, adaptation
  ops/ref/     bit-exact NumPy reference DSP (oracle for every kernel)
  ops/        JAX / Pallas TPU kernels (idct, intra, inter MC, loop filter)
  parallel/    device mesh, multi-stream batching, spatial sharding
  runtime/     per-frame device pipeline, HBM reference-frame pool
  utils/       md5, timing, profiling helpers
  tools/       vpxdec / decode_to_md5 CLI ports
"""

__version__ = "0.1.0"
