"""Dattorro plate reverb: figure-eight tank with modulated allpasses.

Behavioral reference: src/effects/plate_reverb.rs (765 LoC) — Jon Dattorro's
"Effect Design Part 1" plate: predelay (0-200 ms) → input bandwidth one-pole
(0.9995) → 4 input-diffusion allpasses → two cross-coupled branches, each

    modulated allpass (gain 0.70, LFO 0.50/0.71 Hz, ±16-sample excursion)
    → delay → damping one-pole → * decay → allpass(dd2) → delay → cross-feed

with a 7-tap output matrix per channel across both branches, mid/side width,
and a size knob (0.25x-2x) rescaling all tank delays through fractional
reads.  The tank is shared: stereo input is mono-summed (plate_reverb.rs:
551-563).

TPU mapping: in chunks no longer than the shortest tank lag (~150 samples at
min size), every delay/allpass read references pre-chunk data, so a chunk is
pure gathers + elementwise math; the only true recurrences — input
bandwidth and the two damping one-poles — are first-order linear scans.
The branch cross-feeds read tank delays ≥ 700 samples old, so they are
plain gathers too.  Output taps may read samples written within the chunk;
taps therefore gather *after* the chunk's writes land.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from libgooey_tpu.core.smoother import SmootherBank, smoothing_coeff
from libgooey_tpu.ops import ringbuf, scan as gscan

DATTORRO_SR = 29_761.0
INPUT_AP_DELAYS = (142.0, 107.0, 379.0, 277.0)
INPUT_AP_GAINS = (0.750, 0.750, 0.625, 0.625)
TANK_AP1_A, TANK_DELAY1_A, TANK_AP2_A, TANK_DELAY2_A = 672.0, 4453.0, 1800.0, 3720.0
TANK_AP1_B, TANK_DELAY1_B, TANK_AP2_B, TANK_DELAY2_B = 908.0, 4217.0, 2656.0, 3163.0
DECAY_DIFFUSION_1 = 0.70
EXCURSION = 16.0
LFO_RATE_A, LFO_RATE_B = 0.50, 0.71
INPUT_BANDWIDTH = 0.9995
MAX_DECAY = 0.95
MAX_PREDELAY_MS = 200.0
OUTPUT_SCALE = 0.6
MAX_SIZE_SCALE = 2.0

# left taps: (line, offset at 29761 Hz, sign); lines: d1a,d1b,ap2a,ap2b,d2a,d2b
LEFT_TAPS = (
    ("d1b", 266.0, +1.0), ("d1b", 2974.0, +1.0), ("ap2b", 1913.0, -1.0),
    ("d2b", 1996.0, +1.0), ("d1a", 1990.0, -1.0), ("ap2a", 187.0, -1.0),
    ("d2a", 1066.0, -1.0),
)
RIGHT_TAPS = (
    ("d1a", 353.0, +1.0), ("d1a", 3627.0, +1.0), ("ap2a", 1228.0, -1.0),
    ("d2a", 2673.0, +1.0), ("d1b", 2111.0, -1.0), ("ap2b", 335.0, -1.0),
    ("d2b", 121.0, -1.0),
)

PARAMS = ("decay", "mix", "damping", "predelay", "width", "size")
P_DECAY, P_MIX, P_DAMPING, P_PREDELAY, P_WIDTH, P_SIZE = range(6)


def size_to_scale(size):
    """0 → 0.25x, 0.5 → 1x, 1 → 2x (plate_reverb.rs:83-90)."""
    return jnp.where(
        size <= 0.5,
        jnp.power(4.0, 2.0 * size - 1.0),
        jnp.power(2.0, 2.0 * size - 1.0),
    )


class PlateState(NamedTuple):
    predelay: ringbuf.Ring
    input_aps: tuple            # 4 rings
    mod_ap_a: ringbuf.Ring
    delay1_a: ringbuf.Ring
    ap2_a: ringbuf.Ring
    delay2_a: ringbuf.Ring
    mod_ap_b: ringbuf.Ring
    delay1_b: ringbuf.Ring
    ap2_b: ringbuf.Ring
    delay2_b: ringbuf.Ring
    bandwidth: jnp.ndarray      # scalar one-pole state
    damp_a: jnp.ndarray
    damp_b: jnp.ndarray
    fb_a: jnp.ndarray           # cross-feed carries
    fb_b: jnp.ndarray
    lfo_phase: jnp.ndarray      # [2]
    smooth: SmootherBank        # [6]


def init_state(sample_rate: float, decay: float = 0.5, mix: float = 0.3,
               damping: float = 0.5, predelay: float = 0.0, width: float = 1.0,
               size: float = 0.5) -> PlateState:
    srs = sample_rate / DATTORRO_SR
    exc = EXCURSION * srs
    fixed = lambda base: ringbuf.Ring.init(int(np.ceil(base * srs)) + 4)
    sized = lambda base, head: ringbuf.Ring.init(
        int(np.ceil(base * MAX_SIZE_SCALE * srs + head)) + 4
    )
    return PlateState(
        predelay=ringbuf.Ring.init(int(np.ceil(MAX_PREDELAY_MS * 0.001 * sample_rate)) + 8),
        input_aps=tuple(fixed(d) for d in INPUT_AP_DELAYS),
        mod_ap_a=sized(TANK_AP1_A, exc),
        delay1_a=sized(TANK_DELAY1_A, 0.0),
        ap2_a=sized(TANK_AP2_A, 0.0),
        delay2_a=sized(TANK_DELAY2_A, 0.0),
        mod_ap_b=sized(TANK_AP1_B, exc),
        delay1_b=sized(TANK_DELAY1_B, 0.0),
        ap2_b=sized(TANK_AP2_B, 0.0),
        delay2_b=sized(TANK_DELAY2_B, 0.0),
        bandwidth=jnp.zeros((), jnp.float32),
        damp_a=jnp.zeros((), jnp.float32),
        damp_b=jnp.zeros((), jnp.float32),
        fb_a=jnp.zeros((), jnp.float32),
        fb_b=jnp.zeros((), jnp.float32),
        lfo_phase=jnp.zeros(2, jnp.float32),
        smooth=SmootherBank.init(
            np.clip(
                np.array([decay, mix, damping, predelay, width, size], np.float32),
                0.0, 1.0,
            )
        ),
    )


def chunk_size(sample_rate: float, block_size: int) -> int:
    """Chunk must not exceed the shortest *chunk-processed* lag at minimum
    size (0.25x): the input-diffusion and modulated allpasses.  All other
    tank lags exceed :func:`min_tank_lag` and are read at block level."""
    srs = sample_rate / DATTORRO_SR
    min_lag = min(
        min(INPUT_AP_DELAYS) * srs,
        TANK_AP1_A * 0.25 * srs - EXCURSION * srs,
        TANK_AP1_B * 0.25 * srs - EXCURSION * srs,
    )
    c = block_size
    while c > min_lag:
        c //= 2
    return max(c, 1)


def min_tank_lag(sample_rate: float) -> int:
    """Shortest possible non-chunked tank lag (ap2_a at 0.25x size)."""
    srs = sample_rate / DATTORRO_SR
    return int(min(TANK_AP2_A, TANK_AP2_B, TANK_DELAY1_A, TANK_DELAY1_B,
                   TANK_DELAY2_A, TANK_DELAY2_B) * 0.25 * srs)


def process_block(
    state: PlateState,
    x,             # [2, B]
    targets,       # [6]: decay, mix, damping, predelay, width, size (0-1)
    *,
    sample_rate: float,
):
    """One block of the plate → ``(new_state, out[2, B])``."""
    B = x.shape[-1]
    C = chunk_size(sample_rate, B)
    srs = sample_rate / DATTORRO_SR
    exc = EXCURSION * srs
    x = jnp.where(jnp.isfinite(x), x, 0.0)
    mono_in = 0.5 * (x[0] + x[1])

    coeff = smoothing_coeff(sample_rate)
    bank = state.smooth.with_targets(jnp.asarray(targets, jnp.float32))
    powers = jnp.power(np.float32(1.0 - coeff), jnp.arange(1, B + 1, dtype=jnp.float32))

    def traj(idx):
        tgt = bank.target[idx]
        delta = bank.current[idx] - tgt
        d = delta * powers
        return tgt + jnp.where(jnp.abs(d) < 1e-4, 0.0, d)

    raw = [traj(i) for i in range(len(PARAMS))]
    decay_t = raw[P_DECAY] * MAX_DECAY
    mix_t = raw[P_MIX]
    damping_t = raw[P_DAMPING] * 0.95
    predelay_t = raw[P_PREDELAY] * (MAX_PREDELAY_MS * 0.001 * sample_rate)
    width_t = raw[P_WIDTH]
    size_t = size_to_scale(raw[P_SIZE])
    dd2_t = jnp.clip(decay_t + 0.15, 0.25, 0.50)

    # free-running LFOs (advance-then-use)
    n_idx = jnp.arange(1, B + 1, dtype=jnp.float32)
    ph_a = jnp.mod(state.lfo_phase[0] + n_idx * (LFO_RATE_A / sample_rate), 1.0)
    ph_b = jnp.mod(state.lfo_phase[1] + n_idx * (LFO_RATE_B / sample_rate), 1.0)
    lfo_a_t = jnp.sin(2.0 * np.pi * ph_a)
    lfo_b_t = jnp.sin(2.0 * np.pi * ph_b)

    s = state

    # Every non-chunked tank lag is >= min_tank_lag (ap2_a at 0.25x size =
    # ~666 samples at 44.1 kHz), so for B <= that bound a read at sample n
    # only ever touches pre-block history: those reads, the damping scans,
    # the ap2 allpasses and the cross-feeds all hoist to BLOCK level.  Only
    # the input-diffusion chain and the two modulated allpasses (lags that
    # can dip to ~158/~213 samples) stay in the chunk loop.
    assert B <= min_tank_lag(sample_rate), (
        "block exceeds the shortest block-level tank lag; lower block_size"
    )

    # --- predelay (post-write fractional tap), block level ------------------
    pre_ring = ringbuf.write_block(s.predelay, mono_in)
    delayed_in = ringbuf.tap_frac(pre_ring, predelay_t, B)

    # --- input bandwidth one-pole, block level ------------------------------
    bw_full = gscan.linrec1(
        jnp.full((B,), 1.0 - INPUT_BANDWIDTH, jnp.float32),
        INPUT_BANDWIDTH * delayed_in,
        s.bandwidth,
    )
    bw0 = bw_full[-1]

    # --- block-level tank reads (pre-write rings: exact, lags >= B) ---------
    d2a_read = ringbuf.read_frac(s.delay2_a, TANK_DELAY2_A * srs * size_t)
    d2b_read = ringbuf.read_frac(s.delay2_b, TANK_DELAY2_B * srs * size_t)
    fb_a_t = jnp.concatenate([s.fb_a[None], (d2a_read * decay_t)[:-1]])
    fb_b_t = jnp.concatenate([s.fb_b[None], (d2b_read * decay_t)[:-1]])

    d1a_read = ringbuf.read_frac(s.delay1_a, TANK_DELAY1_A * srs * size_t)
    d1b_read = ringbuf.read_frac(s.delay1_b, TANK_DELAY1_B * srs * size_t)
    da = gscan.linrec1(damping_t, d1a_read * (1.0 - damping_t), s.damp_a)
    db = gscan.linrec1(damping_t, d1b_read * (1.0 - damping_t), s.damp_b)
    da0, db0 = da[-1], db[-1]

    del_ap2a = ringbuf.read_frac(s.ap2_a, TANK_AP2_A * srs * size_t)
    v2a = da * decay_t - dd2_t * del_ap2a
    a2 = dd2_t * v2a + del_ap2a
    del_ap2b = ringbuf.read_frac(s.ap2_b, TANK_AP2_B * srs * size_t)
    v2b = db * decay_t - dd2_t * del_ap2b
    b2 = dd2_t * v2b + del_ap2b

    # --- chunk loop: input diffusion + modulated allpasses only -------------
    input_aps = list(s.input_aps)
    mod_ap_a, mod_ap_b = s.mod_ap_a, s.mod_ap_b
    a1_parts, b1_parts = [], []
    for k in range(B // C):
        sl = slice(k * C, (k + 1) * C)
        size = size_t[sl]
        bw = bw_full[sl]

        in_offs = [jnp.full((C,), max(d * srs, 1.0), jnp.float32) for d in INPUT_AP_DELAYS]
        a_in, beta_in, sdir, sadd, sdel = ringbuf.affine_allpass_reads(
            input_aps, INPUT_AP_GAINS, in_offs
        )
        sig = a_in * bw + beta_in
        for i, (g, ring_i) in enumerate(zip(INPUT_AP_GAINS, input_aps)):
            v_i = (sdir[i] * bw + sadd[i]) - g * sdel[i]
            input_aps[i] = ringbuf.write_block(ring_i, v_i)

        in_a = sig + fb_b_t[sl]
        in_b = sig + fb_a_t[sl]

        del_ap1a = ringbuf.read_frac(
            mod_ap_a, TANK_AP1_A * srs * size + lfo_a_t[sl] * exc
        )
        v_a = in_a - DECAY_DIFFUSION_1 * del_ap1a
        a1_parts.append(DECAY_DIFFUSION_1 * v_a + del_ap1a)
        mod_ap_a = ringbuf.write_block(mod_ap_a, v_a)

        del_ap1b = ringbuf.read_frac(
            mod_ap_b, TANK_AP1_B * srs * size + lfo_b_t[sl] * exc
        )
        v_b = in_b - DECAY_DIFFUSION_1 * del_ap1b
        b1_parts.append(DECAY_DIFFUSION_1 * v_b + del_ap1b)
        mod_ap_b = ringbuf.write_block(mod_ap_b, v_b)

    a1 = jnp.concatenate(a1_parts)
    b1 = jnp.concatenate(b1_parts)

    # --- block-level tank writes, then post-write taps ----------------------
    delay1_a = ringbuf.write_block(s.delay1_a, a1)
    delay1_b = ringbuf.write_block(s.delay1_b, b1)
    ap2_a = ringbuf.write_block(s.ap2_a, v2a)
    ap2_b = ringbuf.write_block(s.ap2_b, v2b)
    delay2_a = ringbuf.write_block(s.delay2_a, a2)
    delay2_b = ringbuf.write_block(s.delay2_b, b2)

    lines = {
        "d1a": delay1_a, "d1b": delay1_b, "ap2a": ap2_a, "ap2b": ap2_b,
        "d2a": delay2_a, "d2b": delay2_b,
    }
    tap_scale = srs * size_t

    def taps(table):
        acc = 0.0
        for line, off, sign in table:
            acc = acc + sign * ringbuf.tap_frac(lines[line], off * tap_scale, B)
        return OUTPUT_SCALE * acc

    yl = taps(LEFT_TAPS)
    yr = taps(RIGHT_TAPS)
    mid = 0.5 * (yl + yr)
    side = 0.5 * (yl - yr) * width_t
    wet_l = mid + side
    wet_r = mid - side

    s = s._replace(
        predelay=pre_ring, input_aps=tuple(input_aps),
        mod_ap_a=mod_ap_a, delay1_a=delay1_a, ap2_a=ap2_a, delay2_a=delay2_a,
        mod_ap_b=mod_ap_b, delay1_b=delay1_b, ap2_b=ap2_b, delay2_b=delay2_b,
        fb_a=d2a_read[-1] * decay_t[-1], fb_b=d2b_read[-1] * decay_t[-1],
    )
    out = jnp.stack(
        [x[0] * (1.0 - mix_t) + wet_l * mix_t, x[1] * (1.0 - mix_t) + wet_r * mix_t]
    )
    out = jnp.where(jnp.isfinite(out), out, x)

    new_state = s._replace(
        bandwidth=bw0,
        damp_a=da0,
        damp_b=db0,
        lfo_phase=jnp.stack([ph_a[-1], ph_b[-1]]),
        smooth=SmootherBank(
            current=jnp.stack([r[-1] for r in raw]),
            target=bank.target,
        ),
    )
    return new_state, out
