"""Multi-chip scale-out.

The production multi-chip path is runtime/multistream.BatchedFusedDecoder:
independent streams stacked on a leading axis, the full fused frame step
vmapped over it, jitted with the stream axis sharded over a
jax.sharding.Mesh 'data' axis (pure data parallelism — streams never
communicate, so scaling rides ICI with zero collectives; see SURVEY.md
P7/P8).  __graft_entry__.dryrun_multichip drives it end-to-end on a
virtual mesh and asserts golden MD5s.
"""
