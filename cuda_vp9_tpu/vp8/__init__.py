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
    as NativeVp9Decoder (so the codec API and vpxdec work unchanged)."""

    def __init__(self, recon_fn=None, ec_enabled: bool = False):
        self._dec = Vp8Decoder(ec_enabled=ec_enabled)
        self._out = []

    @property
    def frame_corrupt(self) -> bool:
        return self._dec.frame_corrupt

    def decode(self, data: bytes) -> None:
        from ..decoder.frame import DecodedFrame
        hdr, planes = self._dec.decode(data)
        if hdr.show_frame:
            self._out.append(DecodedFrame(
                list(planes), hdr.width, hdr.height, 8, 1, 1))

    def frames(self):
        out, self._out = self._out, []
        return out
