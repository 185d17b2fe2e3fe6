#!/bin/sh
# round_close.sh 12 --sf1, with the stage-cache env scoped CORRECTLY:
# unset for the sf0.01 steps (a wrong-scale cache binding hard-errors,
# by design), exported only for the sf1 segmented gate.
set -e
cd /root/repo
unset VERIFY_ORACLE_STAGE_DIR

python -m pytest tests/ -q
python tools/verify_local.py --out CORRECTNESS_LOCAL_r12.json /root/testdata/sf0.01
python tools/plan_audit.py /root/testdata/sf0.01
python bench.py > BENCH_local_r12.json
echo "local artifacts done"

export VERIFY_ORACLE_STAGE_DIR=.localdata/oracle_cache/sf1
python tools/verify_segmented.py .localdata/sf1 --out CORRECTNESS_SF1_r12.json
echo "sf1 gate artifact: CORRECTNESS_SF1_r12.json"

unset VERIFY_ORACLE_STAGE_DIR
python tools/drain_jvms.py --wait 600 --kill
echo ROUND_CLOSE_R12_DONE
