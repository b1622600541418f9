/* test_shim.c — C smoke test for the native ABI (mirrors tests/ffi_stereo.rs:
 * engine lifecycle, param round-trip, trigger, stereo render contract). */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>

#include "gooey_tpu.h"

#define CHECK(cond, msg)                                      \
  do {                                                        \
    if (!(cond)) {                                            \
      char err[1024];                                         \
      gooey_engine_last_error(h, err, sizeof err);            \
      fprintf(stderr, "FAIL: %s (%s)\n", msg, err);           \
      return 1;                                               \
    }                                                         \
  } while (0)

int main(int argc, char **argv) {
  if (argc > 1) gooey_set_module_path(argv[1]);

  gooey_handle h = 0;
  h = gooey_engine_new(44100.0);
  CHECK(h > 0, "engine_new");

  /* param round-trip through the integer-id surface */
  CHECK(gooey_engine_set_channel_param(h, 0, GOOEY_KICK_PARAM_FREQUENCY, 0.42),
        "set_channel_param");
  double v = gooey_engine_get_channel_param(h, 0, GOOEY_KICK_PARAM_FREQUENCY);
  CHECK(fabs(v - 0.42) < 1e-6, "get_channel_param round-trip");

  /* invalid id rejected */
  CHECK(gooey_engine_set_channel_param(h, 0, 99, 0.5) == 0, "bad id rejected");

  /* hot-swap */
  CHECK(gooey_engine_set_channel_instrument(h, 1, GOOEY_INSTRUMENT_KICK),
        "set_channel_instrument");
  CHECK(gooey_engine_get_channel_instrument(h, 1) == GOOEY_INSTRUMENT_KICK,
        "get_channel_instrument");

  /* trigger + render: stereo, finite, audible, center-panned */
  gooey_engine_trigger_channel_with_velocity(h, 0, 1.0);
  enum { FRAMES = 2048 };
  static float out[FRAMES * 2];
  CHECK(gooey_engine_render(h, out, FRAMES) == 0, "render rc");
  double peak = 0.0, lr_diff = 0.0;
  for (int i = 0; i < FRAMES; i++) {
    float l = out[2 * i], r = out[2 * i + 1];
    if (!isfinite(l) || !isfinite(r)) {
      fprintf(stderr, "FAIL: non-finite sample at %d\n", i);
      return 1;
    }
    if (fabs(l) > peak) peak = fabs(l);
    if (fabs(l - r) > lr_diff) lr_diff = fabs(l - r);
  }
  CHECK(peak > 1e-4, "render audible");
  CHECK(lr_diff < 1e-5, "kick center-panned");

  /* peak meter + error state */
  CHECK(gooey_engine_take_channel_peak(h, 0) > 0.0, "peak meter");
  char err[256];
  CHECK(gooey_engine_last_error(h, err, sizeof err) == 0, "no error latched");

  /* ---- generated scalar wrappers across families ---- */
  gooey_engine_set_bpm(h, 150.0);
  CHECK(fabs(gooey_engine_get_bpm(h) - 150.0) < 1e-9, "bpm round-trip");
  CHECK(gooey_engine_set_kick_param(h, 0, GOOEY_KICK_PARAM_PUNCH, 0.8),
        "typed kick param");
  CHECK(fabs(gooey_engine_get_kick_param(h, 0, GOOEY_KICK_PARAM_PUNCH) - 0.8)
            < 1e-6, "typed kick get");
  CHECK(gooey_engine_kick_param_count(h) == 8, "kick param count");
  gooey_engine_sequencer_set_instrument_step_with_settings(h, 0, 2, 1, 0.9);
  CHECK(gooey_engine_sequencer_get_instrument_step_enabled(h, 0, 2) == 1,
        "seq step round-trip");
  CHECK(gooey_engine_set_lfo_timing(h, 0, 2), "lfo timing");
  CHECK(gooey_engine_add_lfo_route(h, 0, 0, GOOEY_KICK_PARAM_FREQUENCY, 1.0),
        "lfo route");
  CHECK(gooey_engine_get_lfo_route_count(h, 0) == 1, "lfo route count");
  CHECK(gooey_engine_blend_enable(h, 0), "blend enable");
  CHECK(gooey_engine_blend_set_position(h, 0, 1.0, 0.0), "blend position");
  CHECK(gooey_engine_mixer_get_track_count(h) == 4, "default tracks");
  int t = gooey_engine_mixer_add_track(h, "Aux");
  char name[32];
  CHECK(gooey_engine_mixer_get_track_name(h, t, name, sizeof name) == 3 &&
            name[0] == 'A', "track name");
  CHECK(gooey_engine_track_effect_add(h, t, GOOEY_EFFECT_LOWPASS_FILTER),
        "track effect");

  /* loop load (stereo ramp) + clip grid state */
  enum { LFRAMES = 1000 };
  static float loop_pcm[LFRAMES * 2];
  for (int i = 0; i < LFRAMES * 2; i++) loop_pcm[i] = 0.5f;
  CHECK(gooey_engine_loop_load(h, 0, loop_pcm, LFRAMES, 2, 44100.0, 120.0),
        "loop load");
  CHECK(gooey_engine_clip_load(h, 0, 0, loop_pcm, LFRAMES, 2, 44100.0, 120.0),
        "clip load");
  CHECK(gooey_engine_clip_get_state(h, 0, 0) & 1, "clip loaded state");

  /* sampler rack through the buffer + out-param paths */
  int rack = gooey_engine_sampler_register(h);
  CHECK(rack == 0, "sampler register");
  CHECK(gooey_engine_sampler_set_slot_buffer(h, 0, 1, loop_pcm, LFRAMES, 2,
                                             44100.0),
        "sampler slot buffer");
  CHECK(gooey_engine_sampler_set_step(h, 0, 0, 1, 1, 0.7), "sampler step");
  int32_t en, slot;
  double svel;
  CHECK(gooey_engine_sampler_get_step(h, 0, 0, &en, &slot, &svel) && en == 1 &&
            slot == 1 && fabs(svel - 0.7) < 1e-6, "sampler step out-params");

  /* peaks array + bounce */
  float peaks[5];
  CHECK(gooey_engine_get_channel_peaks(h, peaks, 5) == 5, "peaks array");
  static float bounce[256 * 2];
  gooey_engine_trigger_channel_with_velocity(h, 0, 1.0);
  CHECK(gooey_engine_bounce_to_buffer(h, bounce, 256) == 0, "bounce");

  gooey_engine_free(h);
  printf("OK peak=%.4f\n", peak);
  return 0;
}
