"""The C library API (native/obmdc.cpp — the reference library.cpp
analogue): a C client opens the engine, runs a deck, queries thermo, and
gathers per-atom positions through the C ABI."""
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CLIENT_C = r"""
#include <stdio.h>
#include <stdlib.h>
extern void* obmd_open(void);
extern int obmd_file(void*, const char*);
extern long long obmd_get_natoms(void*);
extern double obmd_get_thermo(void*, const char*);
extern int obmd_gather(void*, const char*, double*);
extern int obmd_gather_int(void*, const char*, long long*);
extern int obmd_scatter(void*, const char*, const double*, long long);
extern int obmd_command(void*, const char*);
extern const char* obmd_last_error(void*);
extern void obmd_close(void*);
int main(int argc, char** argv) {
  void* h = obmd_open();
  const char* e = obmd_last_error(h);
  if (e) { fprintf(stderr, "open: %s\n", e); return 1; }
  if (obmd_file(h, argv[1]) != 0) {
    fprintf(stderr, "file: %s\n", obmd_last_error(h)); return 1; }
  long long n = obmd_get_natoms(h);
  double T = obmd_get_thermo(h, "temp");
  double step = obmd_get_thermo(h, "step");
  double* x = malloc(3 * n * sizeof(double));
  if (obmd_gather(h, "x", x) != 0) {
    fprintf(stderr, "gather: %s\n", obmd_last_error(h)); return 1; }
  /* typed id gather: ascending tags 1..n */
  long long* ids = malloc(n * sizeof(long long));
  if (obmd_gather_int(h, "id", ids) != 0) {
    fprintf(stderr, "gather_int: %s\n", obmd_last_error(h)); return 1; }
  int ids_ok = (ids[0] == 1 && ids[n - 1] == n);
  for (long long i = 1; i < n; i++) if (ids[i] <= ids[i - 1]) ids_ok = 0;
  /* scatter/gather pairing: halve all velocities, read them back */
  double* v = malloc(3 * n * sizeof(double));
  if (obmd_gather(h, "v", v) != 0) {
    fprintf(stderr, "gather v: %s\n", obmd_last_error(h)); return 1; }
  double v00 = v[0];
  for (long long i = 0; i < 3 * n; i++) v[i] *= 0.5;
  if (obmd_scatter(h, "v", v, n) != 0) {
    fprintf(stderr, "scatter: %s\n", obmd_last_error(h)); return 1; }
  if (obmd_gather(h, "v", v) != 0) {
    fprintf(stderr, "regather: %s\n", obmd_last_error(h)); return 1; }
  int v_ok = (v00 == 0.0) ? 1 : (v[0] / v00 > 0.49 && v[0] / v00 < 0.51);
  /* scatter x (triggers a neighbor rebuild) and keep running */
  if (obmd_scatter(h, "x", x, n) != 0) {
    fprintf(stderr, "scatter x: %s\n", obmd_last_error(h)); return 1; }
  if (obmd_command(h, "run 5") != 0) {
    fprintf(stderr, "run: %s\n", obmd_last_error(h)); return 1; }
  double step2 = obmd_get_thermo(h, "step");
  printf("natoms=%lld temp=%.4f step=%.0f x0=%.4f ids_ok=%d v_ok=%d "
         "step2=%.0f\n", n, T, step, x[0], ids_ok, v_ok, step2);
  obmd_close(h);
  return 0;
}
"""


def test_c_api_runs_deck(tmp_path):
    lib = os.path.join(ROOT, "native", "libobmdc.so")
    if not os.path.exists(lib):
        r = subprocess.run(["make", "-C", os.path.join(ROOT, "native"),
                            "libobmdc.so"], capture_output=True)
        if r.returncode != 0 or not os.path.exists(lib):
            pytest.skip("libobmdc.so not buildable here")
    gcc = shutil.which("gcc") or shutil.which("cc")
    if gcc is None:
        pytest.skip("no C compiler")
    import sysconfig
    libdir = sysconfig.get_config_var("LIBDIR")
    src = tmp_path / "client.c"
    src.write_text(CLIENT_C)
    exe = tmp_path / "client"
    subprocess.run(
        [gcc, str(src), "-o", str(exe), "-L" + os.path.join(ROOT, "native"),
         "-lobmdc", "-L" + libdir,
         "-lpython%d.%d" % sys.version_info[:2],
         "-Wl,-rpath," + os.path.join(ROOT, "native"),
         "-Wl,-rpath," + libdir], check=True)

    from obmd_tpu.io.lammps_data import DataFile, write_data
    r = np.random.RandomState(2)
    n = 150
    df = DataFile(natoms=n, ntypes=1, box_lo=np.zeros(3),
                  box_hi=np.full(3, 6.0), masses=np.ones(1),
                  x=r.uniform(0.2, 5.8, (n, 3)), types=np.zeros(n, int),
                  tags=np.arange(1, n + 1), v=r.normal(0, 1, (n, 3)))
    data = tmp_path / "s.data"
    write_data(str(data), df)
    deck = tmp_path / "in.deck"
    deck.write_text(f"""
units lj
boundary p p p
atom_style atomic
read_data {data}
pair_style dpd 1.0 1.0 7
pair_coeff 1 1 25.0 4.5
fix 1 all nve
timestep 0.01
run 30
""")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=ROOT + os.pathsep
               + os.environ.get("PYTHONPATH", ""))
    p = subprocess.run([str(exe), str(deck)], env=env, capture_output=True,
                       text=True, timeout=600)
    assert p.returncode == 0, p.stderr[-500:]
    out = p.stdout.strip().splitlines()[-1]
    assert "natoms=150" in out and "step=30" in out, out
    assert "ids_ok=1" in out and "v_ok=1" in out and "step2=35" in out, out
