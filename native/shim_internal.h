// shim_internal.h — shared plumbing between the hand-written shim core
// (gooey_shim.cpp) and the generated scalar wrappers (gooey_shim_gen.cpp).
#ifndef GOOEY_SHIM_INTERNAL_H
#define GOOEY_SHIM_INTERNAL_H

#include <Python.h>

#include <string>

namespace gooey_shim {

// Defined in gooey_shim.cpp.
extern PyObject *g_capi;

bool ensure_runtime();                    // boot interpreter + import capi
void set_error(const std::string &msg);   // latch a dispatch error
std::string take_exception();             // fetch+clear the Python exception

// RAII GIL holder.
struct Gil {
  PyGILState_STATE state;
  Gil() : state(PyGILState_Ensure()) {}
  ~Gil() { PyGILState_Release(state); }
};

// Call capi.<name>(fmt, ...) → new ref or nullptr (error latched).
PyObject *call(const char *name, const char *fmt, ...);

double as_double(PyObject *o, double fallback);
long long as_int(PyObject *o, long long fallback);
void drop(PyObject *o);

}  // namespace gooey_shim

#endif  // GOOEY_SHIM_INTERNAL_H
