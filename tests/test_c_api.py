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
  printf("natoms=%lld temp=%.4f step=%.0f x0=%.4f\n", n, T, step, x[0]);
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
