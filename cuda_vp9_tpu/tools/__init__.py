"""Command-line tools (vpxdec / example parity)."""
