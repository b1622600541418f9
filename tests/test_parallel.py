"""Multi-device voice sharding: the sharded render must match the
single-device render (8 virtual CPU devices, conftest sets the flag)."""

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from libgooey_tpu.core.smoother import smoothing_coeff
from libgooey_tpu.engine import engine as eng
from libgooey_tpu.instruments import kick as kick_mod
from libgooey_tpu.core.smoother import SmootherBank
from libgooey_tpu.parallel import mesh as pmesh

SR, B = 44100.0, 256


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_sharded_render_matches_single_device():
    V = 64  # 8 voices per device
    state = {
        "kick": kick_mod.init_state(V, kick_mod.KickConfig.punch_preset()),
        "pan": SmootherBank.init(np.linspace(0.1, 0.9, V).astype(np.float32)),
        "gain": SmootherBank.init(np.full(V, 1.0 / V, np.float32)),
        "master": SmootherBank.init(np.float32(0.5)),
    }
    offs = np.random.RandomState(0).randint(0, B, V).astype(np.int32)
    vels = np.random.RandomState(1).uniform(0.3, 1.0, V).astype(np.float32)
    static = dict(
        kinds=("kick",), sample_rate=SR, block_size=B,
        smooth_coeff=smoothing_coeff(SR), limiter_threshold=1.0,
        family_static=(("kick", (("feedback_path", False),
                                 ("max_harmonics", 0))),),
    )

    def run(st, off, vel):
        events = {"kick_off": off, "kick_vel": vel,
                  "block_start": np.int32(0)}
        outs = []
        for i in range(3):
            events = dict(events, block_start=np.int32(i * B))
            if i > 0:
                events["kick_off"] = np.full(V, B, np.int32)
                events["kick_vel"] = np.zeros(V, np.float32)
            st, out, mono = eng._render_all_jit(
                st, {k: jax.numpy.asarray(v) for k, v in events.items()},
                **static)
            outs.append(np.asarray(out))
        return np.concatenate(outs, axis=-1)

    ref = run(state, offs, vels)

    mesh = pmesh.make_mesh(8)
    vspec = NamedSharding(mesh, P(pmesh.VOICE_AXIS))
    st_sharded = pmesh.shard_voice_tree(state, mesh)
    offs_s = jax.device_put(offs, vspec)
    vels_s = jax.device_put(vels, vspec)
    got = run(st_sharded, offs_s, vels_s)

    # identical math, different reduction layout → f32 reassociation only
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)
    assert np.abs(ref).max() > 1e-3
