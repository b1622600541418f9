// gooey_shim.cpp — native C ABI over the TPU engine via embedded CPython.
//
// Behavioral reference: src/ffi.rs — the `gooey_engine_*` functions the iOS
// host links against, including the panic fence that latches any internal
// failure into a terminal error + silence (ffi.rs:2086-2122).  Here the
// fence is the Python-exception → error-string conversion in call_*().
//
// Design: one process-wide embedded interpreter; every entry point takes
// the GIL (PyGILState_Ensure), forwards to libgooey_tpu.capi, and never
// lets an exception cross the C boundary.  Heavy DSP runs inside jax/XLA —
// this layer is control-plane only, so the GIL is not on the audio hot
// path (XLA releases it during execution).

#include "../include/gooey_tpu.h"

#include <Python.h>

#include <cstring>
#include <mutex>
#include <string>
#include <vector>

namespace {

std::mutex g_init_mutex;
std::vector<std::string> g_module_paths;
PyObject *g_capi = nullptr;         // libgooey_tpu.capi module (owned)
std::string g_boot_error;           // init failure (handle 0)
bool g_we_initialized = false;

// Fetch the current Python exception as a string and clear it.
std::string take_exception() {
  PyObject *type = nullptr, *value = nullptr, *tb = nullptr;
  PyErr_Fetch(&type, &value, &tb);
  PyErr_NormalizeException(&type, &value, &tb);
  std::string msg = "unknown python error";
  if (value) {
    PyObject *s = PyObject_Str(value);
    if (s) {
      const char *c = PyUnicode_AsUTF8(s);
      if (c) msg = c;
      Py_DECREF(s);
    }
  }
  Py_XDECREF(type);
  Py_XDECREF(value);
  Py_XDECREF(tb);
  return msg;
}

// Ensure the interpreter is up and capi is imported.  Returns false and
// sets g_boot_error on failure.  Caller must NOT hold the GIL.
bool ensure_runtime() {
  std::lock_guard<std::mutex> lock(g_init_mutex);
  if (g_capi) return true;
  if (!Py_IsInitialized()) {
    Py_InitializeEx(0);  // skip signal handlers: we're a library
    g_we_initialized = true;
  }
  PyGILState_STATE gil = PyGILState_Ensure();
  bool ok = false;
  do {
    PyObject *sys_path = PySys_GetObject("path");  // borrowed
    if (sys_path) {
      for (const std::string &p : g_module_paths) {
        PyObject *str = PyUnicode_FromString(p.c_str());
        if (str) {
          PyList_Insert(sys_path, 0, str);
          Py_DECREF(str);
        }
      }
    }
    PyObject *mod = PyImport_ImportModule("libgooey_tpu.capi");
    if (!mod) {
      g_boot_error = "import libgooey_tpu.capi failed: " + take_exception();
      break;
    }
    g_capi = mod;
    ok = true;
  } while (false);
  PyGILState_Release(gil);
  // Release the GIL acquired implicitly by Py_InitializeEx on the boot
  // thread so other threads can take it via PyGILState_Ensure.
  if (g_we_initialized) {
    static PyThreadState *main_state = nullptr;
    if (!main_state && ok) main_state = PyEval_SaveThread();
    (void)main_state;
    g_we_initialized = false;
  }
  return ok;
}

// RAII GIL holder.
struct Gil {
  PyGILState_STATE state;
  Gil() : state(PyGILState_Ensure()) {}
  ~Gil() { PyGILState_Release(state); }
};

// Per-handle error latched by failed shim calls (engine-internal render
// errors live Python-side; this covers marshalling/dispatch failures).
std::mutex g_err_mutex;
std::string g_last_error;

void set_error(const std::string &msg) {
  std::lock_guard<std::mutex> lock(g_err_mutex);
  g_last_error = msg;
}

// Call capi.<name>(fmt, ...) and return the result (new ref) or nullptr
// with the error latched.  GIL must be held.
PyObject *call(const char *name, const char *fmt, ...) {
  PyObject *fn = PyObject_GetAttrString(g_capi, name);
  if (!fn) {
    set_error(std::string("no capi function ") + name);
    PyErr_Clear();
    return nullptr;
  }
  va_list va;
  va_start(va, fmt);
  PyObject *args = Py_VaBuildValue(fmt, va);
  va_end(va);
  PyObject *res = nullptr;
  if (args) {
    res = PyObject_CallObject(fn, args);
    Py_DECREF(args);
  }
  Py_DECREF(fn);
  if (!res) set_error(std::string(name) + ": " + take_exception());
  return res;
}

double as_double(PyObject *o, double fallback) {
  if (!o) return fallback;
  double v = PyFloat_AsDouble(o);
  if (PyErr_Occurred()) {
    PyErr_Clear();
    v = fallback;
  }
  Py_DECREF(o);
  return v;
}

int64_t as_int(PyObject *o, int64_t fallback) {
  if (!o) return fallback;
  int64_t v = PyLong_AsLongLong(o);
  if (PyErr_Occurred()) {
    PyErr_Clear();
    v = fallback;
  }
  Py_DECREF(o);
  return v;
}

void drop(PyObject *o) { Py_XDECREF(o); }

}  // namespace

extern "C" {

void gooey_set_module_path(const char *path) {
  std::lock_guard<std::mutex> lock(g_init_mutex);
  if (path && !g_capi) g_module_paths.emplace_back(path);
}

gooey_handle gooey_engine_new(double sample_rate) {
  if (!ensure_runtime()) {
    set_error(g_boot_error);
    return 0;
  }
  Gil gil;
  return as_int(call("engine_new", "(d)", sample_rate), 0);
}

void gooey_engine_free(gooey_handle h) {
  if (!g_capi) return;
  Gil gil;
  drop(call("engine_free", "(L)", (long long)h));
}

int32_t gooey_engine_render(gooey_handle h, float *out, int64_t frames) {
  if (frames <= 0) return 0;
  const size_t n = (size_t)frames * 2;
  std::memset(out, 0, n * sizeof(float));
  if (!g_capi) return -1;
  Gil gil;
  PyObject *arr = call("engine_render", "(Ln)", (long long)h, (Py_ssize_t)frames);
  if (!arr) return -1;
  Py_buffer view;
  if (PyObject_GetBuffer(arr, &view, PyBUF_CONTIG_RO) != 0) {
    PyErr_Clear();
    set_error("engine_render: result has no contiguous buffer");
    Py_DECREF(arr);
    return -1;
  }
  int32_t rc = 0;
  if ((size_t)view.len >= n * sizeof(float) &&
      view.itemsize == (Py_ssize_t)sizeof(float)) {
    std::memcpy(out, view.buf, n * sizeof(float));
  } else {
    set_error("engine_render: unexpected buffer shape");
    rc = -1;
  }
  PyBuffer_Release(&view);
  Py_DECREF(arr);
  return rc;
}

int64_t gooey_engine_last_error(gooey_handle h, char *buf, int64_t buf_len) {
  std::string msg;
  if (g_capi && h > 0) {
    Gil gil;
    PyObject *s = call("engine_last_error", "(L)", (long long)h);
    if (s) {
      const char *c = PyUnicode_AsUTF8(s);
      if (c) msg = c;
      Py_DECREF(s);
    }
  }
  if (msg.empty()) {
    std::lock_guard<std::mutex> lock(g_err_mutex);
    msg = (h == 0) ? g_boot_error : g_last_error;
  }
  if (buf && buf_len > 0) {
    const int64_t k =
        (int64_t)msg.size() < buf_len - 1 ? (int64_t)msg.size() : buf_len - 1;
    std::memcpy(buf, msg.data(), (size_t)k);
    buf[k] = '\0';
  }
  return (int64_t)msg.size();
}

void gooey_engine_set_bpm(gooey_handle h, double bpm) {
  if (!g_capi) return;
  Gil gil;
  drop(call("engine_set_bpm", "(Ld)", (long long)h, bpm));
}

void gooey_engine_set_master_gain(gooey_handle h, double gain) {
  if (!g_capi) return;
  Gil gil;
  drop(call("engine_set_master_gain", "(Ld)", (long long)h, gain));
}

double gooey_engine_transport_beat(gooey_handle h) {
  if (!g_capi) return 0.0;
  Gil gil;
  return as_double(call("engine_transport_beat", "(L)", (long long)h), 0.0);
}

void gooey_engine_trigger_channel_with_velocity(gooey_handle h, int32_t channel,
                                                double velocity) {
  if (!g_capi) return;
  Gil gil;
  drop(call("engine_trigger_channel_with_velocity", "(Lid)", (long long)h,
            (int)channel, velocity));
}

int32_t gooey_engine_set_channel_instrument(gooey_handle h, int32_t channel,
                                            int32_t instrument) {
  if (!g_capi) return 0;
  Gil gil;
  return (int32_t)as_int(call("engine_set_channel_instrument", "(Lii)",
                              (long long)h, (int)channel, (int)instrument),
                         0);
}

int32_t gooey_engine_get_channel_instrument(gooey_handle h, int32_t channel) {
  if (!g_capi) return -1;
  Gil gil;
  return (int32_t)as_int(
      call("engine_get_channel_instrument", "(Li)", (long long)h, (int)channel),
      -1);
}

int32_t gooey_engine_set_channel_param(gooey_handle h, int32_t channel,
                                       int32_t param_id, double value) {
  if (!g_capi) return 0;
  Gil gil;
  return (int32_t)as_int(call("engine_set_channel_param", "(Liid)", (long long)h,
                              (int)channel, (int)param_id, value),
                         0);
}

double gooey_engine_get_channel_param(gooey_handle h, int32_t channel,
                                      int32_t param_id) {
  if (!g_capi) return 0.0;
  Gil gil;
  return as_double(call("engine_get_channel_param", "(Lii)", (long long)h,
                        (int)channel, (int)param_id),
                   0.0);
}

double gooey_engine_take_channel_peak(gooey_handle h, int32_t channel) {
  if (!g_capi) return 0.0;
  Gil gil;
  return as_double(
      call("engine_take_channel_peak", "(Li)", (long long)h, (int)channel), 0.0);
}

void gooey_engine_sequencer_set_step(gooey_handle h, int32_t channel,
                                     int32_t step, int32_t enabled,
                                     double velocity) {
  if (!g_capi) return;
  Gil gil;
  drop(call("engine_sequencer_set_step", "(Liiid)", (long long)h, (int)channel,
            (int)step, (int)enabled, velocity));
}

void gooey_engine_sequencer_set_step_note(gooey_handle h, int32_t channel,
                                          int32_t step, int32_t note) {
  if (!g_capi) return;
  Gil gil;
  drop(call("engine_sequencer_set_step_note", "(Liii)", (long long)h,
            (int)channel, (int)step, (int)note));
}

void gooey_engine_sequencer_set_swing(gooey_handle h, int32_t channel,
                                      double swing) {
  if (!g_capi) return;
  Gil gil;
  drop(call("engine_sequencer_set_swing", "(Lid)", (long long)h, (int)channel,
            swing));
}

void gooey_engine_sequencer_start(gooey_handle h, int32_t channel) {
  if (!g_capi) return;
  Gil gil;
  drop(call("engine_sequencer_start", "(Li)", (long long)h, (int)channel));
}

void gooey_engine_sequencer_stop(gooey_handle h, int32_t channel) {
  if (!g_capi) return;
  Gil gil;
  drop(call("engine_sequencer_stop", "(Li)", (long long)h, (int)channel));
}

void gooey_engine_set_effect_enabled(gooey_handle h, int32_t effect_id,
                                     int32_t enabled) {
  if (!g_capi) return;
  Gil gil;
  drop(call("engine_set_effect_enabled", "(Lii)", (long long)h, (int)effect_id,
            (int)enabled));
}

int32_t gooey_engine_set_effect_param(gooey_handle h, int32_t effect_id,
                                      int32_t param, double value) {
  if (!g_capi) return 0;
  Gil gil;
  return (int32_t)as_int(call("engine_set_effect_param", "(Liid)", (long long)h,
                              (int)effect_id, (int)param, value),
                         0);
}

double gooey_engine_get_effect_param(gooey_handle h, int32_t effect_id,
                                     int32_t param) {
  if (!g_capi) return 0.0;
  Gil gil;
  return as_double(call("engine_get_effect_param", "(Lii)", (long long)h,
                        (int)effect_id, (int)param),
                   0.0);
}

int32_t gooey_engine_granulator_set_param(gooey_handle h, int32_t param_id,
                                          double value) {
  if (!g_capi) return 0;
  Gil gil;
  return (int32_t)as_int(call("engine_granulator_set_param", "(Lid)",
                              (long long)h, (int)param_id, value),
                         0);
}

void gooey_engine_granulator_trigger(gooey_handle h, double velocity) {
  if (!g_capi) return;
  Gil gil;
  drop(call("engine_granulator_trigger", "(Ld)", (long long)h, velocity));
}

int32_t gooey_engine_granulator_load(gooey_handle h, const float *samples,
                                     int64_t count, double sample_rate) {
  if (!g_capi || count <= 0) return 0;
  Gil gil;
  // Build a numpy array from the raw buffer without linking numpy's C API:
  // np.frombuffer(bytes, dtype=np.float32).
  PyObject *np = PyImport_ImportModule("numpy");
  if (!np) {
    set_error("granulator_load: " + take_exception());
    return 0;
  }
  PyObject *bytes =
      PyBytes_FromStringAndSize((const char *)samples, count * sizeof(float));
  PyObject *arr =
      bytes ? PyObject_CallMethod(np, "frombuffer", "(Os)", bytes, "float32")
            : nullptr;
  Py_XDECREF(bytes);
  Py_DECREF(np);
  if (!arr) {
    set_error("granulator_load: " + take_exception());
    return 0;
  }
  PyObject *res = call("engine_granulator_load", "(LOd)", (long long)h, arr,
                       sample_rate);
  Py_DECREF(arr);
  if (!res) return 0;
  Py_DECREF(res);
  return 1;
}

}  // extern "C"
