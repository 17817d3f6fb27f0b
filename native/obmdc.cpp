// obmdc — the C library API of the engine (the reference's library.cpp
// analogue: lammps_open / lammps_command / lammps_file /
// lammps_get_natoms / lammps_gather_atoms / extract-thermo surface).
//
// The engine is a Python/JAX package; this ABI embeds CPython and drives
// the deck-front-end Interpreter, so C and Fortran programs can run
// decks exactly like the reference's C API clients do.  Build with
// `make -C native libobmdc.so`; clients link -lobmdc -lpython3.12.
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstring>
#include <string>

namespace {

struct Handle {
  PyObject* ns = nullptr;  // per-handle namespace dict
  std::string err;
};

const char* kBootstrap = R"PY(
import os
os.environ.setdefault("JAX_PLATFORMS", os.environ.get("OBMD_PLATFORM", "cpu"))
import jax
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"].split(",")[0])
import numpy as _np
import obmd_tpu.io.script as _S

_h = _S.Interpreter(log_fn=lambda *a: None)

def _command(line):
    _h.one(line)

def _file(path):
    _h.run_file(path)

def _natoms():
    if _h.state is None:
        return 0
    return int(_np.asarray(_h.state.alive).sum())

def _thermo(what):
    if _h.cfg is None:
        raise RuntimeError("no system built yet (run a deck first)")
    from obmd_tpu.observe import make_thermo_fn
    th = make_thermo_fn(_h.cfg)(_h.state)
    return float({"step": th.step, "temp": th.temp, "natoms": th.natoms,
                  "pe": th.pe, "ke": th.ke, "press": th.pressure}[what])

def _gather(name):
    st = _h.state
    alive = _np.asarray(st.alive)
    tags = _np.asarray(st.tag)[alive]
    order = _np.argsort(tags)
    arr = {"x": st.x, "v": st.v, "f": st.f}[name]
    out = _np.asarray(arr)[alive][order]
    return _np.ascontiguousarray(out, dtype=_np.float64).tobytes()

def _gather_int(name):
    st = _h.state
    alive = _np.asarray(st.alive)
    tags = _np.asarray(st.tag)[alive]
    order = _np.argsort(tags)
    if name == "id":
        out = tags[order]
    elif name == "type":
        # 1-based like the reference's per-atom type array
        out = _np.asarray(st.type)[alive][order] + 1
    elif name == "mol":
        out = _np.asarray(st.mol)[alive][order]
    else:
        raise KeyError(name)
    return _np.ascontiguousarray(out, dtype=_np.int64).tobytes()

def _scatter(name, buf):
    # lammps_scatter_atoms analogue: write a tag-ordered [natoms,3] field
    # back into the live slots; positions invalidate neighbor structures,
    # so rebuild them (the checkpoint-restore path).
    st = _h.state
    alive = _np.asarray(st.alive)
    rows = _np.where(alive)[0][_np.argsort(_np.asarray(st.tag)[alive])]
    vals = _np.frombuffer(buf, dtype=_np.float64).reshape(-1, 3)
    if vals.shape[0] != rows.shape[0]:
        raise ValueError(f"scatter {name}: got {vals.shape[0]} rows, "
                         f"system has {rows.shape[0]} atoms")
    import jax.numpy as _jnp
    full = _np.asarray(getattr(st, name)).copy()
    full[rows] = vals.astype(full.dtype)
    _h.state = st.replace(**{name: _jnp.asarray(full)})
    if name == "x":
        from obmd_tpu.integrate import rebuild_neighbors
        _h.state = rebuild_neighbors(_h.cfg, _h.state)
)PY";

bool ensure_python() {
  if (!Py_IsInitialized()) Py_InitializeEx(0);
  return Py_IsInitialized();
}

void capture_error(Handle* h) {
  PyObject *type, *value, *tb;
  PyErr_Fetch(&type, &value, &tb);
  if (value) {
    PyObject* s = PyObject_Str(value);
    h->err = s ? PyUnicode_AsUTF8(s) : "unknown python error";
    Py_XDECREF(s);
  } else {
    h->err = "unknown error";
  }
  Py_XDECREF(type);
  Py_XDECREF(value);
  Py_XDECREF(tb);
}

PyObject* call(Handle* h, const char* fn, PyObject* args) {
  PyObject* f = PyDict_GetItemString(h->ns, fn);  // borrowed
  if (!f) {
    h->err = std::string("missing bootstrap function ") + fn;
    Py_XDECREF(args);
    return nullptr;
  }
  PyObject* r = PyObject_CallObject(f, args);
  Py_XDECREF(args);
  if (!r) capture_error(h);
  return r;
}

}  // namespace

extern "C" {

void* obmd_open(void) {
  if (!ensure_python()) return nullptr;
  auto* h = new Handle();
  h->ns = PyDict_New();
  PyDict_SetItemString(h->ns, "__builtins__", PyEval_GetBuiltins());
  PyObject* r = PyRun_String(kBootstrap, Py_file_input, h->ns, h->ns);
  if (!r) {
    capture_error(h);
    return h;  // error readable via obmd_last_error
  }
  Py_DECREF(r);
  return h;
}

const char* obmd_last_error(void* vh) {
  auto* h = static_cast<Handle*>(vh);
  return h->err.empty() ? nullptr : h->err.c_str();
}

int obmd_command(void* vh, const char* line) {
  auto* h = static_cast<Handle*>(vh);
  h->err.clear();
  PyObject* r = call(h, "_command", Py_BuildValue("(s)", line));
  if (!r) return -1;
  Py_DECREF(r);
  return 0;
}

int obmd_file(void* vh, const char* path) {
  auto* h = static_cast<Handle*>(vh);
  h->err.clear();
  PyObject* r = call(h, "_file", Py_BuildValue("(s)", path));
  if (!r) return -1;
  Py_DECREF(r);
  return 0;
}

long long obmd_get_natoms(void* vh) {
  auto* h = static_cast<Handle*>(vh);
  h->err.clear();
  PyObject* r = call(h, "_natoms", PyTuple_New(0));
  if (!r) return -1;
  long long n = PyLong_AsLongLong(r);
  Py_DECREF(r);
  return n;
}

double obmd_get_thermo(void* vh, const char* what) {
  auto* h = static_cast<Handle*>(vh);
  h->err.clear();
  PyObject* r = call(h, "_thermo", Py_BuildValue("(s)", what));
  if (!r) return -1.0;
  double v = PyFloat_AsDouble(r);
  Py_DECREF(r);
  return v;
}

// Gather a per-atom [natoms, 3] field ("x", "v", "f") in ascending-tag
// order into `out` (caller allocates 3*natoms doubles) — the
// lammps_gather_atoms analogue.
int obmd_gather(void* vh, const char* name, double* out) {
  auto* h = static_cast<Handle*>(vh);
  h->err.clear();
  PyObject* r = call(h, "_gather", Py_BuildValue("(s)", name));
  if (!r) return -1;
  char* buf = nullptr;
  Py_ssize_t len = 0;
  if (PyBytes_AsStringAndSize(r, &buf, &len) != 0) {
    capture_error(h);
    Py_DECREF(r);
    return -1;
  }
  memcpy(out, buf, len);
  Py_DECREF(r);
  return 0;
}

// Gather a per-atom integer field ("id", "type" (1-based), "mol") in
// ascending-tag order into `out` (caller allocates natoms int64s).
int obmd_gather_int(void* vh, const char* name, long long* out) {
  auto* h = static_cast<Handle*>(vh);
  h->err.clear();
  PyObject* r = call(h, "_gather_int", Py_BuildValue("(s)", name));
  if (!r) return -1;
  char* buf = nullptr;
  Py_ssize_t len = 0;
  if (PyBytes_AsStringAndSize(r, &buf, &len) != 0) {
    capture_error(h);
    Py_DECREF(r);
    return -1;
  }
  memcpy(out, buf, len);
  Py_DECREF(r);
  return 0;
}

// Scatter a per-atom [natoms, 3] field ("x", "v", "f") from ascending-tag
// order back into the system — the lammps_scatter_atoms analogue.
// Scattering "x" rebuilds the neighbor structures.
int obmd_scatter(void* vh, const char* name, const double* in,
                 long long natoms) {
  auto* h = static_cast<Handle*>(vh);
  h->err.clear();
  PyObject* r = call(h, "_scatter",
                     Py_BuildValue("(sy#)", name, (const char*)in,
                                   (Py_ssize_t)(3 * natoms * sizeof(double))));
  if (!r) return -1;
  Py_DECREF(r);
  return 0;
}

void obmd_close(void* vh) {
  auto* h = static_cast<Handle*>(vh);
  Py_XDECREF(h->ns);
  delete h;
}

}  // extern "C"
