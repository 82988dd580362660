"""VP8 codec (RFC 6386).

Full decode path of the reference's vp8/ codec (SURVEY S18): host
entropy parse + NumPy reconstruction of key AND inter frames
(last/golden/altref references, NEAREST/NEAR/ZERO/NEW/SPLIT motion,
six-tap and bilinear sub-pel MC), validated per-frame against
libavcodec's normative `vp8` decoder MD5s.  Plus a VP8 encoder
(vp8/encoder.py): keyframe intra + ZEROMV P-frames with loop filter
and one-pass rate control, whose in-loop reconstruction is
bit-identical to the decoder by construction.
"""

from .decoder import Vp8Decoder, Vp8Error, Vp8KeyframeDecoder  # noqa: F401
from .encoder import Vp8Encoder  # noqa: F401


class Vp8StreamDecoder:
    """Stream-level VP8 decoder with the same decode()/frames() surface
    as NativeVp9Decoder (so the codec API and vpxdec work unchanged).

    With `use_postproc` (VPX_CODEC_USE_POSTPROC) shown frames pass
    through vp8_post_proc_frame (vp8/postproc.py); `postproc_cfg`
    defaults to DEBLOCK|DEMACROBLOCK at deblocking_level 4 like the
    reference (vp8_dx_iface.c:343-349) until VP8_SET_POSTPROC
    overrides it."""

    def __init__(self, recon_fn=None, ec_enabled: bool = False,
                 use_postproc: bool = False):
        self._dec = Vp8Decoder(ec_enabled=ec_enabled)
        self._out = []
        self.use_postproc = use_postproc
        self.postproc_cfg = None   # (flags, deblocking_level, noise_level)
        self._noise = None

    @property
    def frame_corrupt(self) -> bool:
        return self._dec.frame_corrupt

    def _postproc(self, hdr, planes):
        from . import postproc as pp
        if self.postproc_cfg is None:
            flags = pp.VP8D_DEBLOCK | pp.VP8D_DEMACROBLOCK
            deblock_level, noise_level = 4, 0
        else:
            flags, deblock_level, noise_level = self.postproc_cfg
        if not flags:
            return planes
        if self._noise is None:
            self._noise = pp.NoiseState()
        return pp.post_proc_frame(
            self._dec.pp_planes, self._dec.pp_skip,
            self._dec.pp_filter_level, flags, deblock_level,
            noise_level, hdr.width, hdr.height, self._noise)

    def decode(self, data: bytes) -> None:
        from ..decoder.frame import DecodedFrame
        hdr, planes = self._dec.decode(data)
        if hdr.show_frame:
            if self.use_postproc:
                planes = self._postproc(hdr, planes)
            self._out.append(DecodedFrame(
                list(planes), hdr.width, hdr.height, 8, 1, 1))

    def frames(self):
        out, self._out = self._out, []
        return out
