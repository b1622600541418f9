"""Batched device-resident WSOLA rendering for PreservePitch loop channels.

Host glue around :mod:`libgooey_tpu.ops.wsola_stream`: maps the
``WsolaHost`` scheduler state onto the device scan, renders ``K`` blocks
in ONE dispatch (partial-hop prefix + ``n_hops`` full hops + gain/chain
scan), and writes the final hop state back so the host scheduler can
continue seamlessly — per-block rendering, another batch, or a queued
swap all pick up exactly where the device left off.

Engages from :meth:`Mixer.render_blocks` when a channel is PreservePitch
with the device search enabled, has no pending swap, and the clip-grid
transport is idle (grid actions need the per-block host path).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from libgooey_tpu.core.smoother import smooth_block
from libgooey_tpu.mixer import chain as chain_mod
from libgooey_tpu.mixer import wsola
from libgooey_tpu.mixer.loop_channel import PITCH_PRESERVE
from libgooey_tpu.mixer.stereo_buffer import read_cubic
from libgooey_tpu.ops import wsola_stream as dws


@partial(jax.jit, static_argnames=("cfg", "n_hops", "K", "B", "wrap_read",
                                   "chain_key", "sample_rate", "coeff"))
def _stream_channel(buf2, prefix_pos, prefix_w, r0, cur_i, cur_f, have_prev,
                    ref_tail, ptail_pos, ptail_valid, w1, w2, targets_seq,
                    gain_bank, chain_states, chain_targets, *, cfg, n_hops: int,
                    K: int, B: int, wrap_read: bool, chain_key,
                    sample_rate: float, coeff: float):
    """One dispatch: prefix + hop scan + slice + per-block gain/chain."""
    rows = jnp.concatenate([(buf2[0] + buf2[1])[None, :], buf2], axis=0)
    P3 = dws.pad_buffer(rows, cfg)
    pre = (
        read_cubic(buf2, prefix_pos[0], wrap_read) * prefix_w[0][None, :]
        + read_cubic(buf2, prefix_pos[1], wrap_read) * prefix_w[1][None, :]
    )
    ptail = read_cubic(buf2, ptail_pos, wrap_read) * w2[None, :] * ptail_valid
    state = dws.state_tuple((cur_i, cur_f, have_prev, ref_tail, ptail))
    carry, bi, bf, hps, ys = dws.stream_hops(
        P3, w1, w2, state, n_hops=n_hops, cfg=cfg)
    full = jnp.concatenate([pre, ys.transpose(1, 0, 2).reshape(2, -1)], axis=1)
    out = jax.lax.dynamic_slice(
        full, (0, (cfg.hop - r0).astype(jnp.int32)), (2, K * B))
    dry = out.reshape(2, K, B).transpose(1, 0, 2)

    def body(c, xs):
        bank, states = c
        d, tg = xs
        bank = bank.with_targets(tg)
        bank, traj = smooth_block(bank, coeff, B)
        gained = d * traj[0][None, :]
        states, wet = chain_mod.process_chain(
            states, gained, chain_targets, chain_key, sample_rate=sample_rate
        )
        return (bank, tuple(states)), wet * traj[1][None, :]

    (bank, states), wets = jax.lax.scan(
        body, (gain_bank, tuple(chain_states)), (dry, targets_seq))
    _cur, _hp, ref_out, _pt = carry
    # pack the host write-back into ONE small array so the scheduler
    # update costs a single download (a tunnel round trip), not four
    f32 = jnp.float32
    z = f32(0.0)
    wb = jnp.concatenate([
        ref_out,
        jnp.stack([bi[-1], bf[-1],
                   bi[-2] if n_hops >= 2 else z,
                   bf[-2] if n_hops >= 2 else z,
                   hps[-1].astype(f32)]),
    ])
    return bank, states, wets, wb


def stream_config(mixer, i):
    """Static stream config for channel ``i``, or None if ineligible."""
    ch = mixer.channels[i]
    if (
        not ch.playing
        or ch.buffer is None
        or ch.pitch_mode != PITCH_PRESERVE
        or ch.speed < 0.0
        or ch.pending is not None
        or mixer.clip_grid.transport_running
    ):
        return None
    use_dev = (ch._stretcher.use_device if ch._stretcher is not None
               else wsola.USE_DEVICE_SEARCH)
    if not use_dev:
        return None
    L = len(ch.buffer)
    w = ch.window(float(L))
    return dws.make_config(mixer.sr, ch.buffer.sample_rate, L, w.lo, w.span,
                           w.wraps, ch.speed, ch.warp_ratio())


def render_stream_channel(mixer, i, K: int, targets_np, cfg):
    """Dispatch K blocks of channel ``i`` through the device hop scan.

    Returns ``(wets, wb, finalize)`` — the wet ``[K, 2, B]`` device
    array, the packed scheduler write-back (device array), and a closure
    ``finalize(wb_host)`` that applies it — or None when the batch is
    shorter than the current hop remainder (caller falls back to the
    host-planned path).  Callers dispatch every channel first and
    materialize the (small) write-backs afterwards, so the downloads
    overlap the other channels' device compute instead of serializing
    one tunnel round trip per array per channel.
    """
    ch = mixer.channels[i]
    B = mixer.block
    T = K * B
    host = ch._stretcher
    if host is None:
        host = ch._stretcher = wsola.WsolaHost(mixer.sr, ch.cursor)
    hop = cfg.hop
    r0 = hop - host.drain_idx if host.drain_idx < hop else 0
    if T <= r0:
        return None

    L = float(len(ch.buffer))
    w = ch.window(L)
    ratio = ch.buffer.sample_rate / max(mixer.sr, 1.0)
    warp = ch.warp_ratio()

    ppos = np.zeros((2, hop), np.float64)
    pw = np.zeros((2, hop), np.float32)
    if r0:
        pos, wts, _cur = host.plan_block(r0, ch.buffer, w, ratio, ch.speed,
                                         warp)
        ppos[:, hop - r0:] = pos
        pw[:, hop - r0:] = wts
    n_hops = -(-(T - r0) // hop)

    v = (w.to_virtual(host.analysis_cursor) if w.wraps
         else (host.analysis_cursor - w.lo))
    have_prev = bool(host.have_prev)
    ref_tail = (np.asarray(host.prev_tail_mono, np.float32) if have_prev
                else np.zeros(hop, np.float32))
    if have_prev:
        idx = np.arange(hop)
        pos_v = np.clip(host.cur_start_v + (hop + idx) * host.cur_step,
                        0.0, w.span)
        ptail_pos = (np.mod(w.lo + pos_v, w.len) if w.wraps
                     else (w.lo + pos_v))
        pvalid = 1.0
    else:
        ptail_pos = np.zeros(hop, np.float64)
        pvalid = 0.0

    mixer._upload_if_dirty(i)
    base = ch.active_region * mixer.capacity
    buf2 = mixer._dev_buffers[i][:, base:base + int(L)]
    bank, new_states, wets, wb = _stream_channel(
        buf2, jnp.asarray(ppos), jnp.asarray(pw), jnp.int32(r0),
        jnp.float32(np.floor(v)), jnp.float32(v - np.floor(v)),
        jnp.asarray(have_prev), jnp.asarray(ref_tail),
        jnp.asarray(ptail_pos), jnp.float32(pvalid),
        jnp.asarray(host.window[:hop]), jnp.asarray(host.window[hop:]),
        jnp.asarray(targets_np), mixer._gain_banks[i],
        tuple(ch.chain.states), tuple(ch.chain.targets_list()),
        cfg=cfg, n_hops=n_hops, K=K, B=B, wrap_read=bool(w.wraps),
        chain_key=ch.chain.static_key(), sample_rate=mixer.sr,
        coeff=mixer._coeff,
    )
    mixer._gain_banks[i] = bank
    ch.chain.states = list(new_states)
    prev_cur_start = getattr(host, "cur_start_v", None)
    prev_cur_step = getattr(host, "cur_step", cfg.step)

    def finalize(wb_host):
        wb_host = np.asarray(wb_host, np.float64)
        ref_out = wb_host[:hop].astype(np.float32)
        last_i, last_f, prev_i, prev_f, last_hp = wb_host[hop:hop + 5]
        best_last = last_i + last_f
        if n_hops >= 2:
            host.prev_start_v = prev_i + prev_f
            host.prev_step = cfg.step
        else:
            host.prev_start_v = (prev_cur_start if prev_cur_start is not None
                                 else best_last)
            host.prev_step = float(prev_cur_step)
        host.cur_start_v = best_last
        host.cur_step = cfg.step
        host.had_prev_for_cur = bool(last_hp > 0.5)
        host.have_prev = True
        host.prev_tail_mono = ref_out
        host.analysis_cursor = float(
            np.mod(w.lo + best_last, w.len) if w.wraps
            else (w.lo + best_last))
        host.drain_idx = int((T - r0) - (n_hops - 1) * hop)
        host._buffer_sr = ch.buffer.sample_rate
        ch.cursor = host.analysis_cursor

    return wets, wb, finalize
