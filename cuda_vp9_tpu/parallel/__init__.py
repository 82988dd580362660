"""Multi-chip scale-out helpers.

The production multi-chip path is runtime/multistream.BatchedFusedDecoder:
independent streams stacked on a leading axis, the full fused frame step
vmapped over it, jitted with the stream axis sharded over a
jax.sharding.Mesh 'data' axis (pure data parallelism — streams never
communicate, so scaling rides ICI with zero collectives; see SURVEY.md
P7/P8).  __graft_entry__.dryrun_multichip drives it end-to-end on a
virtual mesh and asserts golden MD5s.
"""

from __future__ import annotations


def data_mesh(n_devices: int | None = None):
    """A 1-D `jax.sharding.Mesh` over the first `n_devices` devices with
    the 'data' axis the batched decoder shards streams over.  Defaults
    to every visible device."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), ("data",))


def stream_sharding(mesh):
    """(per-stream, replicated) NamedShardings for batched-decoder state:
    pool/ring/payload carry a leading stream axis sharded over 'data';
    filter kernels and the shared trip counts replicate."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P("data")), NamedSharding(mesh, P())
