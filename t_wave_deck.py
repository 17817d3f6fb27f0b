"""Drive a time-dependent v_ pressure deck end-to-end on TPU."""
import numpy as np, tempfile, os
from obmd_tpu.io import lammps_data
from obmd_tpu.io.script import Interpreter

td = tempfile.mkdtemp()
r = np.random.default_rng(0)
n = 400; box = (8.0, 4.0, 4.0)
df = lammps_data.DataFile(natoms=n, ntypes=1, box_lo=np.zeros(3),
                          box_hi=np.asarray(box), masses=np.asarray([1.0]),
                          x=r.uniform([0,0,0], box, (n,3)),
                          types=np.zeros(n, np.int32),
                          tags=np.arange(1, n+1, dtype=np.int32),
                          v=r.normal(0,1,(n,3)))
data = os.path.join(td, "f.data")
lammps_data.write_data(data, df)
deck = f"""
units lj
boundary f p p
atom_style atomic
region leftB block 0.0 1.6 0.0 4.0 0.0 4.0
region rightB block 6.4 8.0 0.0 4.0 0.0 4.0
region zs block 0.0 0.0 0.0 0.0 0.0 0.0
pair_style dpd 1.0 1.0 4321
read_data {data}
pair_coeff * * 25.0 4.5 1.0
timestep 0.01
variable p equal 10+5*sin(2*PI*2*time)
fix 1 all nve
fix 2 all obmd 1 1 987 v_p 0.0 0.0 0.0 0.0 0.7 0.01 130 &
    region1 leftB region2 rightB region3 zs region4 zs &
    region5 leftB region6 rightB buffersize 1.6 near 1 0.5
thermo 10
run 30
"""
out = []
it = Interpreter(log_fn=out.append)
it.run_lines(deck.splitlines())
mf = np.asarray(it.state.obmd.momentum_force_left)
t = float(it.state.sim_time)
want = (10 + 5*np.sin(4*np.pi*t)) * 16.0
print("step", int(it.state.step), "natoms", int(it.state.natoms))
print("mf_left[0]", mf[0], "expected ~pxx*A + dp/dt term; pxx*A =", want)
print("WAVE DECK TPU OK")
