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

  gooey_engine_free(h);
  printf("OK peak=%.4f\n", peak);
  return 0;
}
