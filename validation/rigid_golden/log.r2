LAMMPS (7 Feb 2024 - Development)
OMP_NUM_THREADS environment is not set. Defaulting to 1 thread. (src/comm.cpp:98)
  using 1 OpenMP thread(s) per MPI task
units lj
dimension 3
boundary p p p
atom_style molecular
read_data /root/repo/validation/rigid_golden/trimers.data
Reading data file ...
  orthogonal box = (0 0 0) to (12 12 12)
  1 by 1 by 1 MPI processor grid
  reading atoms ...
  24 atoms
  reading velocities ...
  24 velocities
Finding 1-2 1-3 1-4 neighbors ...
  special bond factors lj:    0        0        0       
  special bond factors coul:  0        0        0       
     0 = max # of 1-2 neighbors
     0 = max # of 1-3 neighbors
     0 = max # of 1-4 neighbors
     1 = max # of special neighbors
  special bonds CPU = 0.000 seconds
  read_data CPU = 0.002 seconds
pair_style zero 1.0
pair_coeff * *
fix 1 all rigid/small molecule
  create bodies CPU = 0.000 seconds
  8 rigid bodies with 24 atoms
  0.64031242 = max distance from body owner to body atom
timestep 0.004
dump 1 all custom 40 /root/repo/validation/rigid_golden/dump.rv id x y z vx vy vz
dump_modify 1 format float %.14g sort id
run 40
Generated 0 of 0 mixed pair_coeff terms from geometric mixing rule
Neighbor list info ...
  update: every = 1 steps, delay = 0 steps, check = yes
  max neighbors/atom: 2000, page size: 100000
  master list distance cutoff = 1.3
  ghost atom cutoff = 1.3
  binsize = 0.65, bins = 19 19 19
  1 neighbor lists, perpetual/occasional/extra = 1 0 0
  (1) pair zero, perpetual
      attributes: half, newton on
      pair build: half/bin/newton
      stencil: half/bin/3d
      bin: standard
Per MPI rank memory allocation (min/avg/max) = 10.98 | 10.98 | 10.98 Mbytes
   Step          Temp          E_pair         E_mol          TotEng         Press     
         0   0.45004779     0              0              0.4219198      0.0039066648 
        40   0.4500478      0              0              0.42191981     0.00089971281
Loop time of 0.000203046 on 1 procs for 40 steps with 24 atoms

Performance: 68083094.471 tau/day, 196999.695 timesteps/s, 4.728 Matom-step/s
100.0% CPU use with 1 MPI tasks x 1 OpenMP threads

MPI task timing breakdown:
Section |  min time  |  avg time  |  max time  |%varavg| %total
---------------------------------------------------------------
Pair    | 2.185e-06  | 2.185e-06  | 2.185e-06  |   0.0 |  1.08
Bond    | 1.67e-06   | 1.67e-06   | 1.67e-06   |   0.0 |  0.82
Neigh   | 1.3462e-05 | 1.3462e-05 | 1.3462e-05 |   0.0 |  6.63
Comm    | 4.966e-06  | 4.966e-06  | 4.966e-06  |   0.0 |  2.45
Output  | 7.4176e-05 | 7.4176e-05 | 7.4176e-05 |   0.0 | 36.53
Modify  | 6.9011e-05 | 6.9011e-05 | 6.9011e-05 |   0.0 | 33.99
Other   |            | 3.758e-05  |            |       | 18.51

Nlocal:             24 ave          24 max          24 min
Histogram: 1 0 0 0 0 0 0 0 0 0
Nghost:              0 ave           0 max           0 min
Histogram: 1 0 0 0 0 0 0 0 0 0
Neighs:             24 ave          24 max          24 min
Histogram: 1 0 0 0 0 0 0 0 0 0

Total # of neighbors = 24
Ave neighs/atom = 1
Ave special neighs/atom = 0
Neighbor list builds = 1
Dangerous builds = 0
Total wall time: 0:00:00
