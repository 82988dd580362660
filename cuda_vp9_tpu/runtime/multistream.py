"""Multi-stream batched decode (SURVEY.md P7; BASELINE config 5).

The reference decodes a single stream; the TPU design scales throughput by
decoding many independent streams per chip.  Two levels:

1. `MultiStreamDecoder` (this module, single chip): N independent decoder
   pipelines interleaved round-robin.  Every stream's fused frame step is
   dispatched asynchronously, so while stream i's frame executes on the
   device, streams i+1..N parse/pack on the host — host work and device
   work overlap across streams, and streams with the same frame geometry
   share one compiled step (module-level cache).  Output rings keep
   device->host fetches batched per stream.

2. `parallel/sharded.py` (multi-chip): independent streams sharded over
   the 'data' mesh axis with `shard_map`.

Usage:
    msd = MultiStreamDecoder(n_streams=4)
    while feeding:
        msd.put(stream_idx, packet)     # one compressed chunk
        for idx, frame in msd.ready():  # DecodedFrames, decode order
            ...
    for idx, frame in msd.flush():
        ...
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

from ..decoder.frame import NativeVp9Decoder
from .pipeline import TpuReconFused


class MultiStreamDecoder:
    """Round-robin multi-stream decoder with per-stream device pipelines."""

    def __init__(self, n_streams: int, lag: int = 32,
                 recon_factory=TpuReconFused):
        self.n = n_streams
        self.lag = lag
        self.recons = [recon_factory() for _ in range(n_streams)]
        self.decs = [NativeVp9Decoder(recon_fn=r) for r in self.recons]
        self._q: List[List] = [[] for _ in range(n_streams)]

    def put(self, stream: int, packet: bytes) -> None:
        """Feed one compressed chunk to a stream (dispatches its frame
        step(s) asynchronously)."""
        dec = self.decs[stream]
        dec.decode(packet)
        self._q[stream].extend(dec.frames())

    def ready(self) -> Iterator[Tuple[int, object]]:
        """Yield (stream, frame) pairs that are at least `lag` frames
        behind each stream's decode front (keeps output fetches batched)."""
        for s in range(self.n):
            while len(self._q[s]) > self.lag:
                yield s, self._q[s].pop(0)

    def flush(self) -> Iterator[Tuple[int, object]]:
        """Drain all pending frames (end of streams)."""
        for s in range(self.n):
            while self._q[s]:
                yield s, self._q[s].pop(0)

    def stats(self):
        return [{"device": r.frames_on_device, "host": r.frames_on_host}
                for r in self.recons]
