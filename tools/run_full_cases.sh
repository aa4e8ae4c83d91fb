#!/bin/bash
# Full-length runs of the shipped cases at reference schedules (VERDICT #4):
# dam to EndTime=1.0 (10,000 steps), bar to 0.3, gate to 0.5, on the TPU.
set -x
cd /root/repo/cases/dam && ./generate.sh && timeout 5400 ./execute.sh
echo "DAM_RC=$?"
cd /root/repo/cases/bar && ./generate.sh && timeout 5400 ./execute.sh
echo "BAR_RC=$?"
cd /root/repo/cases/fsi_gate && ./generate.sh && timeout 5400 ./execute.sh
echo "GATE_RC=$?"
echo FULL_CASES_DONE
