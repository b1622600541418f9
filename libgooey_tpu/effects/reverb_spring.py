"""Spring reverb: series allpass chain with global damped feedback.

Behavioral reference: src/effects/reverb.rs (235 LoC).  Per channel:

    signal = input + fb_prev
    signal = AP_1..AP_6(signal)            (Schroeder, prime delays, gains
                                            0.70..0.58; L/R use different
                                            prime tables for decorrelation)
    damp' = signal*(1-damping) + damp*damping
    fb    = damp' * (decay^0.4 * 0.95)     (used next sample)
    out   = input*(1-mix) + signal*mix

TPU mapping: each allpass is affine in its input given its (≥127-sample-old)
delayed reads, so a whole chunk of C ≤ min-delay samples collapses: the
chain is ``signal → alpha*signal + beta[n]`` with alpha = Π gains, and the
only true recurrence is the damping one-pole coupled to the one-sample
feedback — a single first-order linear scan:

    d[n] = (damping[n] + (1-damping[n])*alpha*fb_gain[n-1]) * d[n-1]
         + (1-damping[n]) * (alpha*x[n] + beta[n])
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from libgooey_tpu.core.smoother import SmootherBank, smoothing_coeff
from libgooey_tpu.ops import ringbuf, scan as gscan
from libgooey_tpu.ops.filters import _shift1

NUM_ALLPASSES = 6
DELAYS_44100_L = (131, 251, 389, 521, 617, 787)
DELAYS_44100_R = (127, 263, 397, 541, 631, 797)
GAINS = (0.70, 0.68, 0.65, 0.62, 0.60, 0.58)
MAX_FEEDBACK = 0.95

PARAM_DECAY, PARAM_MIX, PARAM_DAMPING = range(3)


class SpringState(NamedTuple):
    rings: Tuple[ringbuf.Ring, ...]  # 12 rings: 6 per channel (L then R)
    fb: jnp.ndarray                  # [2] feedback sample
    damp: jnp.ndarray                # [2] damping filter state
    smooth: SmootherBank             # [2, 3]: decay, mix, damping


def delay_lengths(sample_rate: float):
    scale = sample_rate / 44100.0
    mk = lambda tbl: tuple(max(int(d * scale), 1) for d in tbl)
    return mk(DELAYS_44100_L), mk(DELAYS_44100_R)


def init_state(sample_rate: float, decay: float = 0.5, mix: float = 0.3,
               damping: float = 0.5) -> SpringState:
    dl, dr = delay_lengths(sample_rate)
    # +2 headroom: read_frac clamps offsets to L-2 (time-indexed slots make
    # any L >= delay+2 equivalent to the reference's exact-length buffer)
    rings = tuple(ringbuf.Ring.init(n + 2) for n in dl + dr)
    init = np.array(
        [[np.clip(decay, 0, 1), np.clip(mix, 0, 1), np.clip(damping, 0, 1)]] * 2,
        np.float32,
    )
    return SpringState(
        rings=rings,
        fb=jnp.zeros(2, jnp.float32),
        damp=jnp.zeros(2, jnp.float32),
        smooth=SmootherBank.init(init),
    )


def chunk_size(sample_rate: float, block_size: int) -> int:
    """Largest divisor of the block not exceeding the min allpass delay."""
    min_delay = min(delay_lengths(sample_rate)[1])
    c = block_size
    while c > min_delay:
        c //= 2
    return max(c, 1)


def process_block(
    state: SpringState,
    x,           # [2, B]
    targets,     # [3]: decay, mix, damping
    *,
    sample_rate: float,
):
    """One block of the stereo spring reverb → ``(new_state, out[2, B])``."""
    B = x.shape[-1]
    C = chunk_size(sample_rate, B)
    n_chunks = B // C
    x = jnp.where(jnp.isfinite(x), x, 0.0)

    coeff = smoothing_coeff(sample_rate)
    bank = state.smooth.with_targets(
        jnp.broadcast_to(jnp.asarray(targets, jnp.float32), (2, 3))
    )
    powers = jnp.power(np.float32(1.0 - coeff), jnp.arange(1, B + 1, dtype=jnp.float32))

    def traj(idx):
        tgt = bank.target[:, idx, None]
        delta = (bank.current[:, idx] - bank.target[:, idx])[:, None]
        d = delta * powers
        return tgt + jnp.where(jnp.abs(d) < 1e-4, 0.0, d)

    decay_t = traj(PARAM_DECAY)
    mix_t = traj(PARAM_MIX)
    damping_t = traj(PARAM_DAMPING)
    fb_gain_t = jnp.power(jnp.maximum(decay_t, 0.0), 0.4) * MAX_FEEDBACK

    alpha = float(np.prod(GAINS))
    outs = []
    rings = list(state.rings)
    fb0 = state.fb
    damp0 = state.damp

    for k in range(n_chunks):
        sl = slice(k * C, (k + 1) * C)
        xk = x[:, sl]
        damp1 = damping_t[:, sl]
        damp2 = 1.0 - damp1
        fbg = fb_gain_t[:, sl]

        chunk_out = []
        new_fb = []
        new_damp = []
        for ch in range(2):
            ring_idx = [ch * NUM_ALLPASSES + i for i in range(NUM_ALLPASSES)]
            ch_rings = [rings[i] for i in ring_idx]
            offs = [
                jnp.full((C,), float(d), jnp.float32)
                for d in delay_lengths(sample_rate)[ch]
            ]
            a, beta, stage_dir, stage_add, delayed = ringbuf.affine_allpass_reads(
                ch_rings, GAINS, offs
            )
            # damp recurrence with the one-sample feedback folded in:
            #   d[n] = (damp1[n] + damp2[n]*a*fbg[n-1]) * d[n-1]
            #        + damp2[n]*(a*x[n] + beta[n])
            # The carried state.fb already includes its feedback gain
            # (reverb.rs stores fb = damp*feedback), so at n=0 it enters
            # additively instead of through the coefficient.
            fbg_prev = jnp.concatenate([jnp.ones((1,), jnp.float32), fbg[ch][:-1]])
            A = damp1[ch] + damp2[ch] * a * fbg_prev
            A = A.at[0].set(damp1[ch][0])
            Bv = damp2[ch] * (a * xk[ch] + beta)
            Bv = Bv.at[0].add(damp2[ch][0] * a * fb0[ch])
            d_traj = gscan.linrec1(A, Bv, damp0[ch])
            fb_in = jnp.concatenate(
                [fb0[ch][None], (fbg[ch] * d_traj)[:-1]], axis=0
            )
            signal_in = xk[ch] + fb_in
            sig_out = a * signal_in + beta
            # reconstruct every stage's write: v_i = in_i - g_i * delayed_i
            for i, (g, ring_i) in enumerate(zip(GAINS, ch_rings)):
                in_i = stage_dir[i] * signal_in + stage_add[i]
                v_i = in_i - g * delayed[i]
                rings[ring_idx[i]] = ringbuf.write_block(ring_i, v_i)
            chunk_out.append(xk[ch] * (1.0 - mix_t[ch, sl]) + sig_out * mix_t[ch, sl])
            new_fb.append(fbg[ch][-1] * d_traj[-1])
            new_damp.append(d_traj[-1])
        fb0 = jnp.stack(new_fb)
        damp0 = jnp.stack(new_damp)
        outs.append(jnp.stack(chunk_out))

    out = jnp.concatenate(outs, axis=-1)
    new_state = SpringState(
        rings=tuple(rings),
        fb=fb0,
        damp=damp0,
        smooth=SmootherBank(
            current=jnp.stack([decay_t[:, -1], mix_t[:, -1], damping_t[:, -1]], axis=-1),
            target=bank.target,
        ),
    )
    return new_state, out
