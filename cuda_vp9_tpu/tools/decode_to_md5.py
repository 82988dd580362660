"""decode_to_md5 example parity (libvpx/examples/decode_to_md5.c).

Prints one `<md5>  img-WxH-NNNN.i420` line per shown frame — the format
the conformance fixtures' .md5 files use.
"""

from __future__ import annotations

import sys

from .vpxdec import main as _vpxdec_main


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    return _vpxdec_main(argv + ["--md5"])


if __name__ == "__main__":
    sys.exit(main())
