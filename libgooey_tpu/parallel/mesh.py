"""Multi-chip scaling: shard the voice axis over an ICI mesh.

The reference is a single-audio-thread engine; its only cross-voice
communication is the final additive mix (SURVEY.md §2.10).  The TPU-native
scaling story is therefore pure data parallelism over voices:

* every per-voice array in the engine state is sharded on a 1-D ``voices``
  mesh axis;
* the per-block render is embarrassingly parallel until the mix;
* the stereo mix-down ``[2, V] @ [V, B]`` contracts over the sharded axis —
  XLA turns it into a local partial mix + ``psum`` over ICI (one [2, B]
  vector per block: negligible traffic);
* bus effects (global FX chain) run replicated after the reduction.

Control (sequencer events, parameter targets) is broadcast from the host;
event arrays are ``[V]``-sharded like the state.

IMPORTANT: sharded renders must pass ``fused_banks=False`` to the engine
(``engine._render_all``) — the fused Pallas instrument-bank kernels do not
partition under GSPMD; the voice-parallel XLA path is what the mesh shards.
``tests/test_parallel.py`` and ``__graft_entry__.dryrun_multichip`` pin the
sharded==single-device equality for the full kit (kick/snare/hihat2/tom2/
bass), the replicated bus chain after the psum, and sharded granulator /
sampler arena reads.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

VOICE_AXIS = "voices"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """A 1-D mesh over the voice axis."""
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devices), (VOICE_AXIS,))


def voice_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for arrays whose leading axis is the voice axis."""
    return NamedSharding(mesh, P(VOICE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_voice_tree(tree, mesh: Mesh):
    """Place a state pytree on the mesh: arrays with a leading voice axis are
    sharded on it, scalars/others replicated.

    Heuristic: every array in an instrument bank state has the voice axis
    leading (by construction of ``init_state``); smoother banks are
    ``[V, P]``; scalar transports are 0-d.
    """
    vs = voice_sharding(mesh)
    rep = replicated(mesh)

    def place(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 1 and x.shape[0] % mesh.devices.size == 0 and x.shape[0] > 1:
            return jax.device_put(x, vs)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(place, tree)
