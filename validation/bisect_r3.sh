#!/bin/bash
# Round-3 drift bisect: four 120k-step legs, sequentially (one TPU process
# at a time).  Each saves a full profile time series for offline windowing.
cd /root/repo/validation
set -x
python run_ours.py usher bisect_base.npz 120000 \
    2>&1 | tail -6 | tee bisect_base.log
python run_ours.py usher bisect_r1.npz 120000 --rebuild-every 1 \
    2>&1 | tail -6 | tee bisect_r1.log
OBMD_TPU_XLA_USHER=1 python run_ours.py usher bisect_xla.npz 120000 \
    2>&1 | tail -6 | tee bisect_xla.log
python run_ours.py near bisect_near.npz 120000 \
    2>&1 | tail -6 | tee bisect_near.log
echo ALL-LEGS-DONE
