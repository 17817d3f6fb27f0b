units lj
dimension 3
boundary p p p
atom_style molecular
read_data /root/repo/validation/rigid_golden/trimers.data
pair_style zero 1.0
pair_coeff * *
fix 1 all rigid/small molecule
timestep 0.004
dump 1 all custom 40 /root/repo/validation/rigid_golden/dump.rv id x y z vx vy vz
dump_modify 1 format float %.14g sort id
run 40
